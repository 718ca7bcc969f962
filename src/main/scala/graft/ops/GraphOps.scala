package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._

/** Iterative graph analytics over a relational-derived graph — the
  * bulk-synchronous join/aggregate pattern (Pregel's compute model restated
  * as DataFrames) that covers PageRank, label propagation, and friends
  * without a graph engine. The graph is the customer↔supplier bipartite
  * trading network induced by orders ⋈ lineitem (who bought from whom),
  * nodes encoded into one keyspace by parity: customer c → 2c,
  * supplier s → 2s+1.
  *
  * Numeric discipline: ranks are integer parts-per-billion of the total
  * mass and every step is integer arithmetic — contribution = rank DIV
  * out-degree, damping = (85 · Σ) DIV 100 — so iteration results are
  * order-free and bit-identical in any engine (float PageRank sums are
  * associativity-sensitive and can never be hash-compared cross-engine).
  * The quantization error this introduces is ≤ 1 ppb per term, far below
  * anything a ranking consumer can observe.
  *
  * At 100 TB: the edge list is the big relation — it is shuffled ONCE onto
  * its join key (`repartition(src)` + persist) and every iteration reuses
  * that partitioning for the rank join (co-partitioned, no re-shuffle of
  * the edges); the per-iteration cost is the node-sized rank table's
  * shuffle plus one aggregation by dst, which is the BSP lower bound. The
  * three iterations are unrolled into one Catalyst plan — fine for small
  * fixed iteration counts; [[pagerankDeep]] is the n-round solver, with
  * lineage cuts every `checkpointInterval` rounds and an optional integer
  * L1 convergence stop. Power-law hub nodes in the per-round rank join are
  * AQE-skew-join territory (mechanism spec-proven in KnnHubSkewSpec /
  * AqeSkewJoinSpec). The expensive shared relations (edges, degrees, kNN
  * panel graph) live in [[RelCache]] under the `graph/` tag namespace, so
  * their persisted blocks are LRU-bounded and releasable via
  * `RelCache.clear(session, "graph/")` instead of leaking per call.
  */
object GraphOps {

  /** Undirected (both-direction) distinct edge set of the trading graph.
    * Distinct BEFORE the union: dedup shuffles the half-sized directed
    * pair set once instead of the doubled set. */
  private def edges(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).select(col("o_orderkey").as("ok"), col("o_custkey").as("c"))
    val l = lineitem(s, d).select(col("l_orderkey").as("ok"), col("l_suppkey").as("sp"))
    val cs = o.join(l, "ok")
      .select((col("c") * 2).as("u"), (col("sp") * 2 + 1).as("v"))
      .distinct()
    cs.select(col("u").as("src"), col("v").as("dst"))
      .unionByName(cs.select(col("v").as("src"), col("u").as("dst")))
  }

  /** The edge relation shuffled ONCE onto its join key and shared through
    * [[RelCache]] (tag namespace `graph/`) — every graph entry reads this
    * one persisted artifact instead of re-deriving orders ⋈ lineitem, and
    * the cache's LRU/clear lifecycle releases the blocks (the earlier
    * per-call `.persist()` leaked MEMORY_AND_DISK relations into every
    * later query of a long session). */
  private def edgesShared(s: SparkSession, d: String): DataFrame =
    RelCache.shared(s, d, "graph/edges")(edges(s, d).repartition(col("src")))

  /** Out-degree relation over [[edgesShared]] — resolved OUTSIDE the cache
    * lambda per the RelCache recursive-update rule. */
  private def degShared(s: SparkSession, d: String): DataFrame = {
    val e = edgesShared(s, d)
    RelCache.shared(s, d, "graph/deg")(
      e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")))
  }

  /** Degree audit per node class — the sanity pass a pipeline runs before
    * paying for iteration: bipartite symmetry (customer edge count ==
    * supplier edge count), hub skew (max_deg vs avg), node counts. */
  def graphDegreeStats(s: SparkSession, d: String): DataFrame =
    degShared(s, d)
      .select(col("src"), col("outdeg").as("deg"))
      .groupBy(when(col("src") % 2 === 0, lit("customer"))
        .otherwise(lit("supplier")).as("node_type"))
      .agg(
        count(lit(1)).as("n_nodes"),
        sum(col("deg")).as("n_edges"),
        min(col("deg")).as("min_deg"),
        max(col("deg")).as("max_deg"))

  /** Three integer-exact PageRank iterations (damping 0.85), top 15 nodes.
    * Every node in the edge set has out-degree ≥ 1 by construction
    * (undirected), so there is no dangling-mass term; nodes outside the
    * edge set (customers with no orders) hold no rank, matching the usual
    * practice of ranking the observed graph. */
  def graphPagerank(s: SparkSession, d: String): DataFrame = {
    val e = edgesShared(s, d)
    val deg = degShared(s, d)
    // One control-plane scalar (the node count) parameterizes the teleport
    // literals; the oracle re-derives it from the same edge set.
    val n = deg.count()
    val teleport = 150000000L / n
    // Distinct column names per role (node/gnode/src/dst) keep every join in
    // the unrolled loop free of same-lineage attribute ambiguity. NOTE
    // (r19): this unrolled loop deliberately KEEPS the per-round degN join
    // that [[pagerankLoop]] optimized away by carrying outdeg in the rank
    // state — the loop version's state is a materialized checkpoint, so
    // referencing it twice per round (contribution arm + join left side)
    // reads cached blocks; HERE the state is an unrolled plan subtree, and
    // referencing it twice would double the plan per round (2^3 copies of
    // the scan by round 3). The linear degN shape is the cheaper plan for
    // a small fixed unroll.
    val degN = deg.select(col("src").as("gnode"), col("outdeg"))
    var ranks = degN.select(col("gnode").as("node"), lit(1000000000L / n).as("r"))
    (1 to 3).foreach { _ =>
      val give = ranks.join(degN, col("node") === col("gnode"))
        .select(col("node").as("src"), expr("r div outdeg").as("give"))
      val got = e.join(give, "src")
        .groupBy(col("dst")).agg(sum(col("give")).as("got"))
      ranks = degN.select(col("gnode").as("node"))
        .join(got, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(teleport) + expr("(85 * coalesce(got, 0L)) div 100")).as("r"))
    }
    ranks
      .select(
        when(col("node") % 2 === 0, lit("customer")).otherwise(lit("supplier"))
          .as("node_type"),
        expr("node div 2").as("entity_id"),
        col("r").cast("long").as("rank_ppb"),
        col("node"))
      .orderBy(col("rank_ppb").desc, col("node"))
      .limit(15)
      .select(col("node_type"), col("entity_id"), col("rank_ppb"))
  }

  /** The n-round PageRank solver the 3-round catalog entry's scaladoc
    * promised: same integer-exact arithmetic (teleport = 0.15·10⁹/n,
    * damped sum = (85·Σ) div 100, rank state in ppb), generalized to
    *
    *   - an arbitrary (src, dst) long edge relation (the catalog entry
    *     passes the trading graph; the spec plants a chain graph),
    *   - ANY round count, with LINEAGE CUTS every `checkpointInterval`
    *     rounds — an unrolled n-round Catalyst plan grows linearly in n
    *     and re-optimizes superlinearly; past ~5 rounds the driver, not
    *     the cluster, becomes the bottleneck. With `checkpointDir` set the
    *     cut is a RELIABLE checkpoint (same trade as
    *     [[Dedup.connectedComponents]]: survives executor loss at
    *     billion-edge scale); default is `localCheckpoint` (fastest, but
    *     the truncated lineage's only copy lives on executors),
    *   - an optional CONVERGENCE stop: when `convergedBelowPpb > 0` each
    *     round also measures the integer L1 rank movement Σ|r_t − r_{t−1}|
    *     and the loop exits once movement ≤ the bound. The movement is
    *     tallied by an ACCUMULATOR inside the round's single materializing
    *     job (the previous ranks ride along through one node-keyed join),
    *     not by a separate aggregate job — convergence mode pays one extra
    *     node-sized join per round over the fixed-round loop, nothing
    *     else. A task retry can only OVER-count the tally, which at worst
    *     delays the exit by a round; it can never change any round's ranks
    *     (each emitted state is the exact round-t solution).
    *
    * `checkpointDir` is a DEFAULT, not an override: the checkpoint
    * directory is session-global state, so it is applied only when the
    * session has none set — an earlier caller's configured dir (e.g.
    * [[Dedup.connectedComponents]]'s) wins, and this call's reliable
    * checkpoints land there. A caller that needs its cuts in a SPECIFIC
    * directory (durability/lifecycle reasons) must set
    * `sparkContext.setCheckpointDir` itself before calling.
    *
    * Per-round cost is the BSP lower bound: edges persisted and shuffled
    * once onto src up front, each round shuffles only the node-sized rank
    * relation. Returns (final ranks (node, r), rounds actually run). */
  def pagerankDeep(edgeRel: DataFrame, maxRounds: Int, checkpointInterval: Int = 5,
      checkpointDir: Option[String] = None, convergedBelowPpb: Long = 0L): (DataFrame, Int) = {
    val e = edgeRel.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try pagerankLoop(e, deg, maxRounds, checkpointInterval, checkpointDir, convergedBelowPpb)
    finally {
      // The returned relation is always materialized (every loop exit path
      // checkpoints), so releasing the working copies here cannot trigger
      // a recompute in the caller.
      e.unpersist(blocking = false)
      deg.unpersist(blocking = false)
    }
  }

  /** The solver loop over ALREADY-PREPARED relations: `e` a (src, dst)
    * edge set partitioned on src, `deg` its (src, outdeg) — both expected
    * persisted by the caller (who also owns their release). The catalog
    * entry calls this directly on the `graph/` RelCache relations:
    * duplicating the edge relation per call (what [[pagerankDeep]]'s
    * convenience prep does) doubled the biggest persisted footprint in the
    * 219-entry bench session and tipped sf5 over the execution-memory
    * edge. */
  private[ops] def pagerankLoop(e: DataFrame, deg: DataFrame, maxRounds: Int,
      checkpointInterval: Int, checkpointDir: Option[String],
      convergedBelowPpb: Long,
      onCut: DataFrame => Unit = _ => (),
      tallyPadPpb: Long = 0L): (DataFrame, Int) = {
    require(maxRounds >= 1, "maxRounds must be >= 1")
    require(checkpointInterval >= 1, "checkpointInterval must be >= 1")
    val s = e.sparkSession
    // Only set the checkpoint dir when the session has none: the dir is
    // SESSION-GLOBAL, and clobbering it here would silently redirect every
    // later reliable checkpoint (e.g. Dedup.connectedComponents) to this
    // solver's possibly-temporary dir — same guard discipline as
    // connectedComponents.
    checkpointDir.foreach { dir =>
      if (s.sparkContext.getCheckpointDir.isEmpty) s.sparkContext.setCheckpointDir(dir)
    }
    val n = deg.count()
    val teleport = 150000000L / n
    val degN = deg.select(col("src").as("gnode"), col("outdeg"))
    // The rank STATE carries outdeg (r19, guide §2.4 remove-shuffles /
    // r18 verdict #5): outdeg is constant per node across rounds, so
    // joining ranks back to degN every round to compute each node's
    // contribution was a whole node×node join — one exchange plus, under
    // AQE, its own stage-jobs — per round, paid only to re-attach a column
    // the state could simply keep. With (node, r, outdeg) as the state,
    // `give` is a pure projection and the round's only joins are the
    // edge⋈give contribution join and ONE node-keyed left join that
    // produces the next state — which in convergence mode ALSO carries the
    // previous rank for the L1 tally, fusing away the separate next⋈prev
    // movement join r18 shipped with. Net: 3 joins/round → 2 (fixed-round
    // mode: 2 → 1), measured 69 → ~40 AQE stage-jobs for the converged
    // entry. (An AQE-off bracket was tried first per the verdict's
    // suggestion and REJECTED on measurement: without runtime size stats
    // the static planner sort-merge-joins the node-sized state against the
    // edge relation — taskRun 83 s → 149 s warm. AQE's runtime broadcasts
    // are the right plan at bench scale and degrade gracefully at 100 TB.)
    //
    // Round-0 state is a constant projection of deg — cut its lineage too
    // so the first convergence join never re-plans the edge build.
    var ranks = degN.select(col("gnode").as("node"),
        lit(1000000000L / n).as("r"), col("outdeg"))
      .localCheckpoint()
    // The previous MATERIALIZED cut. Each localCheckpoint materializes a
    // node-sized relation whose blocks would otherwise live until
    // ContextCleaner GC — unbounded at deep round counts. Once cut N is
    // materialized (and the convergence join over the last pre-cut state
    // has run), no later plan references cut N−1, so its blocks are
    // released eagerly. NEVER released: the cut the caller receives.
    var lastCut: DataFrame = ranks
    onCut(ranks)
    var round = 0
    var converged = false
    var materialized = true
    // Convergence mode only: the round's rank relation persisted so its
    // full materialization is REUSED by the next round's lineage (and by
    // the NEXT round's prev side) instead of recomputed — without this
    // every non-cut round's rank step executed 2-3 times, measured 78 s
    // for the 8-round sf5 entry vs ~2x the fixed-round solver expected.
    // Released on the same safe-point schedule as the cuts (plain persist
    // keeps lineage, so unlike a cut an early release could only cost a
    // recompute).
    var prevPersisted: Option[DataFrame] = None
    while (round < maxRounds && !converged) {
      round += 1
      // `give` is now a pure projection of the state (outdeg rides along),
      // and the SINGLE node-keyed left join below both attaches the new
      // contributions and carries everything the branch-specific step
      // needs: the previous rank (for the convergence tally) and outdeg
      // (for the next state). `got` only exposes (dst, got), so the state
      // appearing on both sides of the join (once inside give's lineage)
      // is attribute-unambiguous.
      val give = ranks.select(col("node").as("src"), expr("r div outdeg").as("give"))
      val got = e.join(give, "src")
        .groupBy(col("dst")).agg(sum(col("give")).as("got"))
      val joined = ranks.join(got, col("node") === col("dst"), "left")
      val next = joined.select(col("node"),
        (lit(teleport) + expr("(85 * coalesce(got, 0L)) div 100")).as("r"),
        col("outdeg"))
      val cut = round % checkpointInterval == 0
      // Plan-evidence seam (r19): the loop's per-round joins never appear
      // in the entry's outside explain (every exit path is a checkpointed
      // LogicalRDD), so dump round 1's plan on request — zero cost unset.
      if (round == 1 && sys.env.contains("SPARK_GRAFT_PR_EXPLAIN"))
        println(next.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      if (convergedBelowPpb > 0L) {
        // Integer L1 movement Σ|r_t − r_{t−1}| tallied INSIDE the round's
        // one materializing job via an accumulator (the same trick
        // [[Dedup.connectedComponents]] uses for its changed-label count)
        // instead of a separate aggregate job per round. Since the state
        // itself is the left side of the round's one join, the previous
        // rank is ALREADY on the joined row — no second node-keyed join
        // (the r18 shape paid one), no second scan, no aggregate exchange;
        // the per-partition tally map emits the (node, r, outdeg) rows the
        // next round consumes.
        //
        // Accumulator semantics under failure: a task RETRY re-adds its
        // partition's movement, so the tally can only OVER-count — which
        // can only delay the exit by a round (movement shrinks round over
        // round), never change any round's ranks: each emitted rank state
        // is still exactly the round-t solution of the deterministic
        // recurrence. Benign in the same way cc's changed-count is
        // (spec-pinned by GraphOpsSpec's tally-overcount test via the
        // tallyPadPpb test seam, which simulates a retry's inflation).
        val acc = s.sparkContext.longAccumulator(s"pagerank-l1-round-$round")
        import s.implicits._
        val fused = joined.select(col("node"),
            (lit(teleport) + expr("(85 * coalesce(got, 0L)) div 100")).as("r2"),
            col("r").as("pr"), col("outdeg"))
          .as[(Long, Long, Long, Long)]
          .mapPartitions { it =>
            it.map { case (nd, r2, p2, od) => acc.add(math.abs(r2 - p2)); (nd, r2, od) }
          }
          .toDF("node", "r", "outdeg")
        // Persist FIRST even on cut rounds: a reliable checkpoint's write
        // pass recomputes the RDD, and without the cache that second pass
        // would re-add every partition's movement (systematic 2× tally).
        // With the plan cached, the write pass reads blocks — the tally
        // fills exactly once, in the first materializing job.
        fused.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nextM =
          if (!cut) {
            fused.foreachPartition((_: Iterator[org.apache.spark.sql.Row]) => ())
            fused
          } else {
            val m = if (checkpointDir.isDefined) fused.checkpoint() else fused.localCheckpoint()
            fused.unpersist(blocking = false) // blocks now live in the checkpoint
            m
          }
        materialized = cut
        // tallyPadPpb is a TEST SEAM: a deterministic stand-in for a task
        // retry's over-count, so the benignity claim above is provable
        // without fault injection. Production callers leave it 0.
        converged = acc.value + tallyPadPpb <= convergedBelowPpb
        // nextM is materialized; the previous round's persisted copy has
        // served its two readers (this round's lineage + this round's
        // fused prev side) and is released.
        prevPersisted.foreach(_.unpersist(blocking = false))
        prevPersisted = if (!cut) Some(nextM) else None
        if (cut) {
          // Safe point: nextM is materialized and the fused movement join
          // (the last reader of lineage over the previous cut) has run.
          releaseCut(lastCut)
          lastCut = nextM
          onCut(nextM)
        }
        ranks = nextM
      } else {
        val nextM =
          if (!cut) next
          else if (checkpointDir.isDefined) next.checkpoint() else next.localCheckpoint()
        materialized = cut
        if (cut) {
          releaseCut(lastCut)
          lastCut = nextM
          onCut(nextM)
        }
        ranks = nextM
      }
    }
    // The loop's final round may leave its persisted copy behind — the
    // caller's relation is `out` (materialized below), so release it once
    // out exists. If out IS that copy (converged on a plain round), the
    // localCheckpoint below materializes out's blocks first.
    val lastPersisted = prevPersisted
    // Hand back a materialized relation so the caller may release the
    // edge/degree blocks immediately.
    val out = if (materialized) ranks else ranks.localCheckpoint()
    if (out ne lastCut) { onCut(out); releaseCut(lastCut) }
    lastPersisted.foreach(_.unpersist(blocking = false))
    // Callers' contract is (node, r): the carried outdeg is working state,
    // projected away here (a Project over the materialized cut — free).
    (out.select(col("node"), col("r")), round)
  }

  /** Release the persisted blocks behind a checkpointed rank relation. A
    * `localCheckpoint` truncates lineage, so an unpersisted cut cannot be
    * recomputed — callers release a cut ONLY once nothing references it
    * (enforced by [[pagerankLoop]]'s schedule). Reliable checkpoints keep
    * their files on the checkpoint dir (owned by the dir's lifecycle);
    * this drops only block-manager state, which for them is a no-op. */
  private def releaseCut(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Rounds of the DEEP catalog entry — past the unrolled entry's 3, so
    * the solver's lineage cut (checkpointInterval 3 → two cuts) executes
    * under the DuckDB oracle, not only under the spec. */
  private val DEEP_ROUNDS = 6

  /** Catalog face of [[pagerankDeep]] (`x_graph_pagerank_deep`): 6
    * checkpointed rounds over the trading graph, top 15 — same integer
    * law as [[graphPagerank]], but run through the n-round solver so a
    * mid-plan lineage cut (a `localCheckpoint` at rounds 3 and 6) sits
    * between the oracle and the answer. Runs [[pagerankLoop]] DIRECTLY on
    * the shared `graph/` relations — no per-call duplicate of the edge
    * relation, which is both the cheaper plan (no extra edge shuffle) and
    * what kept the sf5 219-entry bench session inside its execution-memory
    * budget. */
  def graphPagerankDeep(s: SparkSession, d: String): DataFrame = {
    val (ranks, _) = pagerankLoop(edgesShared(s, d), degShared(s, d),
      maxRounds = DEEP_ROUNDS, checkpointInterval = 3,
      checkpointDir = None, convergedBelowPpb = 0L)
    ranks
      .select(
        when(col("node") % 2 === 0, lit("customer")).otherwise(lit("supplier"))
          .as("node_type"),
        expr("node div 2").as("entity_id"),
        col("r").cast("long").as("rank_ppb"),
        col("node"))
      .orderBy(col("rank_ppb").desc, col("node"))
      .limit(15)
      .select(col("node_type"), col("entity_id"), col("rank_ppb"))
  }

  /** Convergence bound of the CONVERGED catalog entry, in ppb of L1 rank
    * movement. The damped chain contracts movement by ≤0.85 per round from
    * ~1.5·10⁹ initial, and the sequence is mass-normalized (measured
    * byte-stable across sf0.001→0.1: round 7 ≈ 5.61·10⁸, round 8 ≈
    * 4.77·10⁸), so 5·10⁸ stops at round 8 with >10% margin on both sides —
    * and even off this graph the entry cannot diverge from its oracle,
    * because BOTH engines replay the same integer stopping law rather than
    * a pinned round count. */
  private val CONV_BOUND_PPB = 500000000L

  /** Round cap of the CONVERGED entry — the safety rail every production
    * convergence loop carries; replayed verbatim in the oracle's recursive
    * WHERE, so a cap-hit is equal on both engines too. */
  private val CONV_MAX_ROUNDS = 12

  /** Catalog face of the CONVERGENCE-STOPPED solver
    * (`x_graph_pagerank_converged`, r15 verdict #8): [[pagerankLoop]] with
    * the integer-L1 stop active — each round pays the movement join
    * Σ|r_t − r_{t−1}| and the loop exits at the FIRST round at or under
    * [[CONV_BOUND_PPB]] (or the [[CONV_MAX_ROUNDS]] cap). The round count
    * rides in the output as `n_rounds`, so the DuckDB hash compare asserts
    * the stop round itself — the oracle is a recursive CTE that replays
    * the identical integer law AND the identical stopping rule (movement
    * carried per iteration, recursion continues only while movement
    * exceeds the bound), proving the convergence join is answer-invisible
    * and the exit deterministic. Lineage cuts at rounds 3 and 6 run under
    * the oracle as in the deep entry; the shared `graph/` relations keep
    * the per-call cost at the BSP lower bound. */
  def graphPagerankConverged(s: SparkSession, d: String): DataFrame = {
    val (ranks, rounds) = pagerankLoop(edgesShared(s, d), degShared(s, d),
      maxRounds = CONV_MAX_ROUNDS, checkpointInterval = 3,
      checkpointDir = None, convergedBelowPpb = CONV_BOUND_PPB)
    ranks
      .select(
        when(col("node") % 2 === 0, lit("customer")).otherwise(lit("supplier"))
          .as("node_type"),
        expr("node div 2").as("entity_id"),
        col("r").cast("long").as("rank_ppb"),
        col("node"))
      .orderBy(col("rank_ppb").desc, col("node"))
      .limit(15)
      .select(col("node_type"), col("entity_id"), col("rank_ppb"),
        lit(rounds).as("n_rounds"))
  }

  /** Panel size of the kNN-graph diagnostic: brute-force exact top-3 on a
    * fixed id-prefix sample (1000² = 10⁶ cosine dots at any scale). */
  private[ops] val KNN_PANEL = 1000L

  /** Structural diagnostics of the embedding space's kNN graph —
    * reciprocity (how many top-3 edges are mutual) and triangle count
    * (local clustering): the intrinsic-dimensionality / hubness health
    * check run before trusting an ANN index, phrased entirely as joins
    * over a graph that is SPARSE BY CONSTRUCTION (≤ 3 directed edges per
    * node, so the triangle join's cost is Σdeg² over small degrees, never
    * a dense-graph explosion — the co-purchase projection of this corpus,
    * by contrast, is near-complete and was rejected for exactly that
    * reason). The panel's top-3 is exact brute force over 1000 vectors
    * (a fixed-size diagnostic sample — scale-invariant cost); on a full
    * corpus the edge list would come from the ANN index instead and the
    * graph math below is unchanged. In-degree is unbounded for hub
    * vectors (the thing this diagnostic measures), which at 100 TB is
    * AQE-skew-join territory on the triangle join's build side. Cosine
    * ordering is the strict-left-fold float64 dot both engines share, so
    * the graph — and every count — is deterministic. */
  /** The panel's exact directed top-3 kNN graph `(a_id, b_id)` — shared
    * (RelCache) between the structural diagnostics below and the
    * beam-search ANN probe (`Similarity.annBeam`), which walks it. The
    * vector dependency is resolved OUTSIDE the cache lambda (RelCache
    * recursive-update rule). */
  private[ops] def knnTop3(s: SparkSession, d: String): DataFrame = {
    val panel = Similarity.vectors(s, d).filter(col("vec_id") < KNN_PANEL)
    RelCache.shared(s, d, "graph/knnTop3") {
      val q = panel.select(col("vec_id").as("a_id"), col("v").as("av"), col("nrm").as("an"))
      val pairs = q.join(panel, col("vec_id") =!= col("a_id"))
        .select(col("a_id"), col("vec_id").as("b_id"),
          (Similarity.dot(col("av"), col("v")) / (col("an") * col("nrm"))).as("sim"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("a_id")).orderBy(col("sim").desc, col("b_id"))
      pairs.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3).select(col("a_id"), col("b_id"))
    }
  }

  def graphKnnStats(s: SparkSession, d: String): DataFrame = {
    // top3 and the undirected edge set are shared through the cache so
    // repeated invocations neither recompute the 10⁶ dots nor leak
    // unmanaged persisted blocks.
    val top3 = knnTop3(s, d)
    val panel = Similarity.vectors(s, d).filter(col("vec_id") < KNN_PANEL)
    val e = RelCache.shared(s, d, "graph/knnEdges")(
      top3.select(least(col("a_id"), col("b_id")).as("u"),
        greatest(col("a_id"), col("b_id")).as("v")).distinct())
    val nNodes = panel.agg(count(lit(1)).as("n_nodes"))
    val nEdges = e.agg(count(lit(1)).as("n_edges"))
    val nMutual = top3.select(col("a_id").as("m1"), col("b_id").as("m2"))
      .intersect(top3.select(col("b_id").as("m1"), col("a_id").as("m2")))
      .filter(col("m1") < col("m2"))
      .agg(count(lit(1)).as("n_mutual"))
    nNodes.crossJoin(nEdges).crossJoin(nMutual).crossJoin(triangleJoin(e))
  }

  /** Triangle count of a canonical undirected edge set `(u, v), u < v` as
    * the two-join wedge closure. The wedge join's key is the MIDDLE node,
    * so a hub vector (unbounded kNN in-degree) concentrates one shuffle
    * partition — AQE-skew-join territory at scale: the split mechanism is
    * proven to fire on exactly this join, with a planted hub and unchanged
    * counts, in KnnHubSkewSpec. */
  private[ops] def triangleJoin(e: DataFrame): DataFrame =
    e.select(col("u").as("x1"), col("v").as("x2"))
      .join(e.select(col("u").as("y1"), col("v").as("y2")), col("x2") === col("y1"))
      .join(e.select(col("u").as("z1"), col("v").as("z2")),
        col("x1") === col("z1") && col("y2") === col("z2"))
      .agg(count(lit(1)).as("n_triangles"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_graph_degree" -> (graphDegreeStats _),
    "x_graph_pagerank" -> (graphPagerank _),
    "x_graph_pagerank_deep" -> (graphPagerankDeep _),
    "x_graph_pagerank_converged" -> (graphPagerankConverged _),
    "x_graph_knn_stats" -> (graphKnnStats _))

  private val edgeCtes: String =
    """e0 AS (SELECT DISTINCT o.o_custkey * 2 AS u, l.l_suppkey * 2 + 1 AS v
      |       FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
      |e AS (SELECT u AS src, v AS dst FROM e0
      |      UNION ALL SELECT v AS src, u AS dst FROM e0),
      |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src)""".stripMargin

  /** One PageRank round as CTE text: contributions gathered by dst, then
    * teleport + damped sum — `//` (DuckDB floor division) ≡ Spark `div`
    * on the non-negative integers both engines see. */
  private def prRound(prev: String, cur: String): String =
    s"""c$cur AS (SELECT e.dst, sum($prev.r // d.outdeg) AS got
       |          FROM e JOIN $prev ON $prev.node = e.src
       |                 JOIN deg d ON d.src = e.src
       |          GROUP BY e.dst),
       |$cur AS (SELECT $prev.node,
       |                150000000 // (SELECT n FROM nn)
       |                  + (85 * coalesce(c$cur.got, 0)) // 100 AS r
       |         FROM $prev LEFT JOIN c$cur ON c$cur.dst = $prev.node)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "x_graph_degree" ->
      s"""WITH $edgeCtes
         |SELECT CASE WHEN src % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
         |       count(*) AS n_nodes,
         |       CAST(sum(outdeg) AS BIGINT) AS n_edges,
         |       min(outdeg) AS min_deg, max(outdeg) AS max_deg
         |FROM deg GROUP BY 1""".stripMargin,
    "x_graph_knn_stats" ->
      s"""WITH t AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |           FROM embeddings WHERE vec_id < $KNN_PANEL),
         |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM t),
         |p AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |             list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS sim
         |      FROM n a, n b WHERE b.vec_id <> a.vec_id),
         |top3 AS (SELECT a_id, b_id FROM (
         |           SELECT a_id, b_id,
         |                  row_number() OVER (PARTITION BY a_id ORDER BY sim DESC, b_id) AS rnk
         |           FROM p)
         |         WHERE rnk <= 3),
         |e AS (SELECT DISTINCT least(a_id, b_id) AS u, greatest(a_id, b_id) AS v FROM top3),
         |nn AS (SELECT count(*) AS n_nodes FROM n),
         |ee AS (SELECT count(*) AS n_edges FROM e),
         |mut AS (SELECT count(*) AS n_mutual FROM top3 x
         |        JOIN top3 y ON x.a_id = y.b_id AND x.b_id = y.a_id
         |        WHERE x.a_id < x.b_id),
         |tri AS (SELECT count(*) AS n_triangles FROM e e1
         |        JOIN e e2 ON e1.v = e2.u
         |        JOIN e e3 ON e1.u = e3.u AND e2.v = e3.v)
         |SELECT n_nodes, n_edges, n_mutual, n_triangles FROM nn, ee, mut, tri""".stripMargin,
    "x_graph_pagerank" ->
      s"""WITH $edgeCtes,
         |nn AS (SELECT count(*) AS n FROM deg),
         |r0 AS (SELECT src AS node, 1000000000 // (SELECT n FROM nn) AS r FROM deg),
         |${prRound("r0", "r1")},
         |${prRound("r1", "r2")},
         |${prRound("r2", "r3")}
         |SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
         |       node // 2 AS entity_id,
         |       CAST(r AS BIGINT) AS rank_ppb
         |FROM r3 ORDER BY r DESC, node LIMIT 15""".stripMargin,
    // The deep solver under the oracle: the same integer round law chained
    // DEEP_ROUNDS times in SQL, while the Spark side runs pagerankDeep with
    // lineage cuts at rounds 3 and 6 — a checkpoint must be invisible to
    // the answer, and the hash compare proves it.
    "x_graph_pagerank_deep" ->
      s"""WITH $edgeCtes,
         |nn AS (SELECT count(*) AS n FROM deg),
         |r0 AS (SELECT src AS node, 1000000000 // (SELECT n FROM nn) AS r FROM deg),
         |${(1 to DEEP_ROUNDS).map(i => prRound(s"r${i - 1}", s"r$i")).mkString(",\n")}
         |SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
         |       node // 2 AS entity_id,
         |       CAST(r AS BIGINT) AS rank_ppb
         |FROM r$DEEP_ROUNDS ORDER BY r DESC, node LIMIT 15""".stripMargin,
    // The convergence-stopped solver under the oracle: a RECURSIVE CTE
    // carries (node, rank, this-iteration's L1 movement, round) and the
    // recursive term fires only while movement exceeds the bound (NULL =
    // round 0, always continue) and the cap is unreached — the exact
    // stopping law the Spark loop runs, so the hash compare pins not just
    // the final ranks but the round the loop exited (n_rounds).
    "x_graph_pagerank_converged" ->
      s"""WITH RECURSIVE $edgeCtes,
         |nn AS (SELECT count(*) AS n FROM deg),
         |pr(node, r, mv, rnd) AS (
         |  SELECT src, 1000000000 // (SELECT n FROM nn), NULL::BIGINT, 0 FROM deg
         |  UNION ALL
         |  SELECT x.node, x.r2, CAST(sum(abs(x.r2 - x.r)) OVER () AS BIGINT), x.rnd + 1
         |  FROM (
         |    SELECT cur.node, cur.r, cur.rnd,
         |           150000000 // (SELECT n FROM nn)
         |             + (85 * coalesce(g.got, 0)) // 100 AS r2
         |    FROM pr cur
         |    LEFT JOIN (SELECT e.dst, sum(c2.r // d.outdeg) AS got
         |               FROM e JOIN pr c2 ON c2.node = e.src
         |                      JOIN deg d ON d.src = e.src
         |               GROUP BY e.dst) g ON g.dst = cur.node
         |    WHERE (cur.mv IS NULL OR cur.mv > $CONV_BOUND_PPB)
         |      AND cur.rnd < $CONV_MAX_ROUNDS
         |  ) x
         |),
         |fin AS (SELECT node, r, rnd FROM pr WHERE rnd = (SELECT max(rnd) FROM pr))
         |SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
         |       node // 2 AS entity_id,
         |       CAST(r AS BIGINT) AS rank_ppb,
         |       CAST(rnd AS INTEGER) AS n_rounds
         |FROM fin ORDER BY r DESC, node LIMIT 15""".stripMargin)
}
