package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import Tables._

/** Similarity search over the embeddings table (`Array[Float]`, dim 64):
  * brute-force cosine top-k as the exact baseline, multi-table
  * hyperplane-LSH, IVF (deterministic k-means-lite + nprobe), and product
  * quantization (per-subspace codebooks + ADC scan + exact rerank) as the
  * scale paths, embedding-cosine near-dup pairs, a 5-NN label-vote eval,
  * and exact recall audits of every sketch against the brute-force truth.
  *
  * Numeric discipline: floats are cast to double BEFORE any arithmetic and
  * every reduction is an explicit left fold (the native DotProduct
  * expression ≡ `aggregate(zip_with(...))`), so results are bit-identical
  * to any engine that folds left in float64 — which is what makes the
  * DuckDB `list_dot_product` oracles exact (including the fully unrolled
  * Lloyd training loop), not approximate.
  *
  * At 100 TB: brute force is O(Q*N*dim) — correct but only for reranking;
  * LSH hashes each vector once (no shuffle wider than (id, table, bits))
  * and joins within buckets; IVF swaps the bucket function for data-
  * adaptive centroid assignment — candidate count ~ nprobe/k of the
  * corpus, same equi-join shape.
  *
  * NO HNSW/NSW family, deliberately: a graph-traversal index is a
  * stateful greedy pointer-chase with sequential hop dependencies —
  * per-partition sub-indexes lose the global graph (recall collapses as
  * partitions grow), and a faithful distributed walk costs one BSP
  * shuffle PER HOP (20-50 per query batch), strictly worse than the one
  * probe shuffle IVF(-PQ) pays. The candidate-generation story at scale
  * is IVF(-PQ)/banded-LSH/Hamming here, with `x_shard_balanced` +
  * `x_ann_ivfpq_persisted` as the build-side composition for serving
  * stacks that run HNSW per shard OUTSIDE the engine. The traversal
  * SHAPE, where it is expressible, is implemented: [[annBeam]] runs
  * LSH-seeded beam search as frontier-joins over the panel's kNN-graph
  * RELATION (the `pagerankDeep` loop shape), oracled hop by hop, with
  * [[annBeamRecall]] quantifying the trade against the exact truth.
  */
object Similarity {

  /** Dot product of two double-array columns: the native codegen'd
    * expression (see org.apache.spark.sql.graftbridge.DotProduct). Same
    * strict left-fold float64 semantics as [[dotHof]], which it replaced
    * after measuring ~interpreted-lambda overhead in the ANN hot path. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.dotProduct(a, b)

  /** The equivalent higher-order-function fold — kept as the semantic
    * reference implementation (a test asserts bit-equality with [[dot]]). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Session-scoped cache plumbing. A DataFrame (and anything trained by
    * collecting one) is bound to the SparkSession that built it, so every
    * cache below keys by (session, key): a second session in the same JVM
    * — typical in test harnesses and notebook re-runs — rebuilds instead
    * of inheriting a plan bound to a possibly-stopped session. Entries
    * whose session has stopped are evicted on access (their persisted
    * blocks died with the context, so dropping the entry leaks nothing).
    * Tuple equality is reference equality on the session (SparkSession
    * doesn't override equals), which is exactly the scoping we want. */
  private type SessionCache[V] =
    java.util.concurrent.ConcurrentHashMap[(SparkSession, String), V]

  private def cached[V](cache: SessionCache[V], s: SparkSession, key: String)(
      build: => V): V = {
    cache.keySet.removeIf(k => k._1.sparkContext.isStopped)
    cache.computeIfAbsent((s, key), _ => build)
  }

  /** The float64 view of the corpus (id, widened vector, norm) feeds five
    * catalog queries (brute force, LSH/IVF rerank, embedding dedup, the
    * exact ground truths); persist one copy per data directory — at scale
    * this is the normalized vector table a production pipeline materializes
    * once, not a per-query recomputation of the cast + norm pass. */
  private val vectorCache = new SessionCache[DataFrame]()

  private[graft] def vectors(s: SparkSession, d: String): DataFrame =
    cached(vectorCache, s, d) {
      // Spread the persisted copy to a COMPUTE-sized width: this table is
      // compute-dense — downstream stages run O(k·dim) FLOPs per ROW
      // (centroid argmax, banded dots), so bytes-proportional file splits
      // under-parallelize it badly (a 26 MB sf5 file is 1-2 splits, which
      // serialized millions of dot products on one core). Width is sized
      // to the data, not blindly to the session: ~1k vectors per partition
      // (≈10⁸ FLOPs per task at demo k), capped at session parallelism —
      // a 2k-vector gate corpus stays at 1-2 partitions (32 near-empty
      // cached partitions taxed EVERY downstream job ~0.5 s in scheduling,
      // measured at sf0.1), while a 100k-vector corpus fans out to full
      // width. The count is footer-driven and runs once per (session, dir).
      // At 100 TB the same sizing is done against the cluster's core
      // count, not against parquet bytes.
      val n = embeddings(s, d).count()
      val width = math.max(1L, math.min(
        s.sparkContext.defaultParallelism.toLong, n / 1000L)).toInt
      embeddings(s, d).select(col("vec_id"), asDouble(col("embedding")).as("v"))
        .repartition(width, col("vec_id"))
        .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  /** Exact cosine top-3 neighbors for the first 50 query vectors. */
  def annBruteforce(s: SparkSession, d: String): DataFrame = {
    val all = vectors(s, d)
    val q = all.filter(col("vec_id") < 50)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    // Broadcast the 50-row QUERY side and stream the corpus past it: at any
    // real corpus size the other orientation ships the whole embedding table
    // to every executor. Same result, opposite scale behavior.
    val pairs = broadcast(q).join(all, col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("nn_id"),
        (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("nn_id"))
    pairs.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("q_id"), col("nn_id"), col("rnk"), col("sim"))
  }

  // ---------------------------------------------------------------------
  // Beam-search ANN probe over the panel's exact kNN graph — the
  // DataFrame-shaped TRAVERSAL index probe the HNSW trade-off note
  // promised (SURVEY §2.3): the graph-walk semantics expressed as k
  // frontier-joins over a precomputed kNN-graph RELATION instead of a
  // stateful pointer-chase. Every query starts from the same fixed entry
  // set (the HNSW global-entry-point shape), each hop expands the frontier
  // through the directed top-3 edges, rescores the candidate set against
  // the query, and keeps the best BEAM_W; after BEAM_HOPS hops the top-3
  // of the final frontier is the answer. Everything is deterministic
  // (ties by id, strict-left-fold float64 dots), so the DuckDB oracle
  // replays the entire walk hop by hop and the hash compare pins the
  // traversal itself. The recall audit quantifies the trade honestly
  // against the exact brute-force truth — on a 3-NN graph with a single
  // entry region the walk misses what greedy routing cannot reach, which
  // is exactly the measurement that justifies IVF-PQ as the production
  // candidate generator here (the scaladoc at the top of this object).
  // Plan shape at scale: the walk itself is O(Q·BEAM·(3+1)) rows per hop —
  // trivially broadcast-able; the honest cost is BUILDING the graph
  // relation, which at 100 TB comes from the ANN index composition, not
  // from the panel's brute force.
  // ---------------------------------------------------------------------

  private[ops] val BEAM_W = 16 // frontier width per query
  private[ops] val BEAM_HOPS = 6 // expansion rounds after seeding
  private[ops] val BEAM_SEEDS = 8L // fixed entry set: panel ids < 8
  private[ops] val BEAM_QMOD = 29L // query set: vec_id % 29 == 3

  /** Query-batch broadcast bound (rows): the batch is hinted as a
    * broadcast build side only when its MEASURED row count is under this —
    * ~1M rows of (id, vector, norm) is hundreds of MB framed, comfortably
    * inside driver/executor budgets; past it the hint is dropped and the
    * planner falls back to a shuffle join instead of aborting on the 8 GB
    * broadcast cap (r18 ADVICE: the batch is corpus/29, NOT control-plane
    * sized by construction). */
  private[ops] val BEAM_BCAST_MAX_Q = 1L << 20

  /** One scored frontier expansion: candidates joined to the panel
    * vectors and the query vectors, self excluded, ranked per query by
    * (sim desc, id). `cand` is (q_id, c_id).
    *
    * Hints are the CALLER's call (r19, r18 ADVICE + verdict #8): the hop
    * loop passes `hintCand = true` because its cand is the rank-capped
    * Q×4W frontier literal — control-plane sized by construction; the seed
    * call passes false because ITS cand is the LSH bucket-mate join output
    * (corpus-derived, skew-dependent), where a forced broadcast could
    * abort at scale where the planner would have degraded gracefully. The
    * query batch arrives pre-hinted by the caller under the measured-size
    * bound above. `windowParts` narrows the rank window's exchange to the
    * frontier-derived width via an EXPLICIT repartition — the r18 shape
    * mutated session-global spark.sql.shuffle.partitions around the walk,
    * which a concurrent batch query on the same session would silently
    * inherit. */
  private def beamRank(cand: DataFrame, panel: DataFrame, q: DataFrame,
      hintCand: Boolean, windowParts: Option[Int]): DataFrame = {
    val candSide = if (hintCand) broadcast(cand) else cand
    val scored = candSide
      .join(panel.select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn")), "c_id")
      .join(q, "q_id")
      .filter(col("c_id") =!= col("q_id"))
      .select(col("q_id"), col("c_id"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("c_id"))
    val pre = windowParts.map(n => scored.repartition(n, col("q_id"))).getOrElse(scored)
    pre.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= BEAM_W)
  }

  /** Beam-search top-3 (catalog `x_ann_beam`): the walk described above,
    * answered from the panel corpus (`vec_id < GraphOps.KNN_PANEL`).
    * SEEDING is the hybrid production shape — the query's LSH bucket
    * mates (multi-entry, the hash-seeded NSW pattern: the walk starts
    * where the hash index already thinks the neighborhood is, then the
    * graph refines), unioned with a fixed entry set so a query with no
    * panel bucket mate still walks from somewhere. The recall audit
    * therefore measures hash-seeding + graph-refinement jointly, against
    * plain LSH's own audited recall. */
  def annBeam(s: SparkSession, d: String): DataFrame = {
    val all = vectors(s, d)
    val panel = all.filter(col("vec_id") < GraphOps.KNN_PANEL)
    val top3 = GraphOps.knnTop3(s, d)
    val q = all.filter(col("vec_id") % BEAM_QMOD === 3)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    // Bounded cross join BY CONSTRUCTION: |q| × BEAM_SEEDS rows — the
    // fixed-entry fallback arm of the seed set.
    val fixedSeeds = q.select(col("q_id")).crossJoin(
      panel.filter(col("vec_id") < BEAM_SEEDS).select(col("vec_id").as("c_id")))
    val bk = lshBuckets(s, d)
    val qBuckets = bk.join(q.select(col("q_id")), bk("vec_id") === col("q_id"))
      .select(col("q_id"), col("tbl"), col("bucket"))
    val mates = qBuckets.join(
        bk.select(col("vec_id").as("c_id"), col("tbl"), col("bucket")),
        Seq("tbl", "bucket"))
      .filter(col("c_id") =!= col("q_id") && col("c_id") < GraphOps.KNN_PANEL)
      .select(col("q_id"), col("c_id"))
    val seeds = mates.unionByName(fixedSeeds).distinct()
    // Each hop references the previous frontier TWICE (carry arm + expand
    // arm), so an uncut unrolled walk doubles its plan tree per hop —
    // measured 24.7 s of pure driver/codegen time for 4 hops over ~50
    // queries. The frontier is Q×BEAM_W rows BY CONSTRUCTION (rank-capped
    // per query), so the cut is a driver-held LITERAL relation, not a
    // checkpoint: collect the ranked frontier and re-enter the next hop
    // from a LocalRelation. Constant plan depth like a localCheckpoint cut,
    // plus two properties the r17 per-hop localCheckpoint lacked:
    //   - CLUSTER DURABILITY: no hop depends on executor-resident blocks,
    //     so losing an executor mid-walk costs one stateless hop re-run,
    //     never the whole query (localCheckpoint truncates lineage INTO
    //     executor storage — one lost executor is unrecoverable);
    //   - NO RESIDUE: nothing persists after the walk (the r17 shape left
    //     seed + 6 hop frontiers cached until ContextCleaner GC, doubled
    //     when the recall audit re-ran the walk).
    // The driver pull is Q×BEAM_W small rows per hop — control-plane sized
    // at any corpus scale because it grows with the QUERY batch, not the
    // corpus — and the literal broadcasts into the next hop's joins.
    var frontierRows = 0 // set by every frontierLiteral pull (driver-local)
    def frontierLiteral(df: DataFrame): DataFrame = {
      import s.implicits._
      val rows = df.select(col("q_id"), col("c_id"), col("sim"), col("rnk"))
        .as[(Long, Long, Double, Int)].collect().toIndexedSeq
      frontierRows = rows.size
      rows.toDF("q_id", "c_id", "sim", "rnk")
    }
    // The query batch is broadcast only under a MEASURED row bound (one
    // cheap count over the persisted vector relation): at bench scales it
    // always broadcasts (same plan as r18 — panel streams, batch builds);
    // at a scale where corpus/29 outgrows the bound the hint is dropped
    // and the planner may shuffle instead of aborting on the broadcast cap.
    val qHinted = if (q.count() <= BEAM_BCAST_MAX_Q) broadcast(q) else q
    // Seed call: cand is the corpus-derived LSH bucket-mate set — NOT
    // hinted (r18 ADVICE); the rank window runs at session width since the
    // seed set is skew-dependent.
    var ranked = frontierLiteral(beamRank(seeds, panel, qHinted,
      hintCand = false, windowParts = None))
    // The hop loop's only exchanges are the per-hop rank window and the
    // frontier-expansion distinct — both over ≤ Q×4W rows by construction
    // (query-batch sized at ANY corpus scale). Run them at a width derived
    // from the MEASURED seed-frontier size (the literal's length is already
    // on the driver — no extra job) instead of the session width: 7
    // sequential hops × 32 near-empty reduce tasks was pure scheduling/
    // shuffle-file overhead. The width rides EXPLICIT repartitions on the
    // two hop exchanges (r19, verdict #8) — no session-conf mutation, so a
    // concurrent query on the same session can no longer inherit the
    // narrowed width mid-walk.
    val sessionParts = s.conf.get("spark.sql.shuffle.partitions").toLong
    val walkParts = math.max(2L, math.min(sessionParts, frontierRows / 1000L + 1L)).toInt
    (1 to BEAM_HOPS).foreach { hop =>
      val f = ranked.select(col("q_id"), col("c_id"))
      val expanded = f.unionByName(
        f.join(top3, f("c_id") === top3("a_id"))
          .select(col("q_id"), col("b_id").as("c_id")))
        .repartition(walkParts, col("q_id"), col("c_id"))
        .distinct()
      val hopFrame = beamRank(expanded, panel, qHinted,
        hintCand = true, windowParts = Some(walkParts))
      // Plan-evidence seam: the entry's RETURNED frame is a driver
      // literal (LocalTableScan), so the hop joins this walk actually
      // runs are invisible to an outside explain — dump hop 1's plan on
      // request (plans/r18 evidence; zero cost when unset).
      if (hop == 1 && sys.env.contains("SPARK_GRAFT_BEAM_EXPLAIN"))
        println(hopFrame.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      ranked = frontierLiteral(hopFrame)
    }
    ranked.filter(col("rnk") <= 3)
      .select(col("q_id"), col("c_id").as("nn_id"), col("rnk"), col("sim"))
  }

  /** Recall audit of the beam walk vs the exact brute-force truth over the
    * same panel (catalog `x_ann_beam_recall`): per-query hit counts
    * histogrammed — integral end to end, so the oracle is hash-exact. */
  def annBeamRecall(s: SparkSession, d: String): DataFrame = {
    val all = vectors(s, d)
    val panel = all.filter(col("vec_id") < GraphOps.KNN_PANEL)
    val q = all.filter(col("vec_id") % BEAM_QMOD === 3)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val truthPairs = broadcast(q).join(panel, col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("nn_id"),
        (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("nn_id"))
    val truth = truthPairs.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3).select(col("q_id"), col("nn_id"))
    val hits = annBeam(s, d).select(col("q_id"), col("nn_id"))
      .join(truth, Seq("q_id", "nn_id"))
      .groupBy(col("q_id")).agg(count(lit(1)).as("h"))
    q.select(col("q_id")).join(hits, Seq("q_id"), "left")
      .select(coalesce(col("h"), lit(0L)).as("n_hits"))
      .groupBy(col("n_hits")).agg(count(lit(1)).as("n_queries"))
  }

  // ---------------------------------------------------------------------
  // Matryoshka-style truncated-dimension ANN: score the SHORTLIST pass on
  // only the leading MAT_DIM of the 64 dims (MRL-trained embedding
  // families front-load information exactly so prefixes work as cheap
  // coarse scorers), then rerank the <= MAT_SHORTLIST survivors per query
  // with the full vector. The scale arithmetic: the coarse scan touches
  // dim/4 of the bytes — on a 100 TB embedding corpus that is the
  // difference between streaming 25 TB and 100 TB per query batch — and
  // the full vectors are fetched ONLY for Q x shortlist candidates via an
  // id equi-join against the corpus (never carried through the coarse
  // window). Same broadcast-the-queries orientation as [[annBruteforce]].
  // ---------------------------------------------------------------------
  private val MAT_DIM = 16
  private val MAT_SHORTLIST = 20

  def annMatryoshka(s: SparkSession, d: String): DataFrame = {
    val all = vectors(s, d)
    val trunc = all.select(col("vec_id"), slice(col("v"), 1, MAT_DIM).as("vt"))
      .withColumn("nt", sqrt(dot(col("vt"), col("vt"))))
    val q = trunc.filter(col("vec_id") < 50)
      .select(col("vec_id").as("q_id"), col("vt").as("qvt"), col("nt").as("qnt"))
    val wT = Window.partitionBy(col("q_id")).orderBy(col("tsim").desc, col("nn_id"))
    val shortlist = broadcast(q).join(trunc, col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("nn_id"),
        (dot(col("qvt"), col("vt")) / (col("qnt") * col("nt"))).as("tsim"))
      .withColumn("trnk", row_number().over(wT))
      .filter(col("trnk") <= MAT_SHORTLIST)
      .select(col("q_id"), col("nn_id"))
    val rer = shortlist
      .join(all.select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn")), "q_id")
      .join(all.select(col("vec_id").as("nn_id"), col("v").as("nv"), col("nrm").as("nnrm")), "nn_id")
      .select(col("q_id"), col("nn_id"),
        (dot(col("qv"), col("nv")) / (col("qn") * col("nnrm"))).as("sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("nn_id"))
    rer.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("q_id"), col("nn_id"), col("rnk"), col("sim"))
  }

  def annMatryoshkaRecall(s: SparkSession, d: String): DataFrame =
    recallAgainstExact(annMatryoshka(s, d), exactTop3(s, d, 200))

  // ---------------------------------------------------------------------
  // 1-bit (binary) embedding quantization + Hamming-distance ANN: keep only
  // the SIGN of every dimension, packed 64 dims per long. The scale
  // arithmetic is the whole point — float32x64 = 256 bytes/vector becomes
  // 8 bytes/vector, a 32x reduction, and the distance kernel collapses to
  // XOR + popcount (both single CPU instructions, both codegen'd by Spark's
  // built-in `^` and `bit_count`). On a 100 TB float corpus the binary view
  // is ~3 TB — the difference between an index that must be probed and one
  // that can be SCANNED per query batch; production retrieval stacks run
  // exactly this as the coarse pass and rerank survivors with full floats.
  // Packing is write-once (a corpus materialization, not per-query work),
  // and every number downstream is an integer — no float-determinism
  // caveats anywhere in the family, so the oracles are hash-exact.
  // ---------------------------------------------------------------------

  /** `array<bigint>` of ceil(dim/64) words; bit b of word w is set iff
    * dimension 64w+b is strictly positive. Width-generic (derives the word
    * count from `size(v)`), so a different embedding column needs no code
    * change. A sign threshold at 0 is the standard choice for centered
    * embeddings; dimensions equal to 0 quantize to the 0 bit on both
    * engines (DuckDB mirrors the same `> 0` predicate). */
  private val PACK_BITS_SQL =
    """transform(sequence(0, CAST(ceil(size(v) / 64.0) AS INT) - 1), w ->
      |  aggregate(sequence(w * 64, least(w * 64 + 63, size(v) - 1)), 0L,
      |    (acc, b) -> CASE WHEN element_at(v, b + 1) > 0D
      |                THEN acc | shiftleft(1L, b - w * 64) ELSE acc END))""".stripMargin

  /** The packed binary view of the corpus: (vec_id, label, bits, pop).
    * Persisted once per (session, directory) like [[vectors]] — at scale
    * this is the materialized binary index, not per-query recomputation. */
  private val binaryCache = new SessionCache[DataFrame]()

  private def binaryVectors(s: SparkSession, d: String): DataFrame =
    cached(binaryCache, s, d) {
      embeddings(s, d)
        .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
        .select(col("vec_id"), col("label"), expr(PACK_BITS_SQL).as("bits"))
        .withColumn("pop",
          expr("aggregate(transform(bits, x -> bit_count(x)), 0, (acc, h) -> acc + h)"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  /** Quantization audit per label: vector counts, total/min/max set bits.
    * A healthy centered embedding family sits near pop = dim/2 (maximum
    * sign entropy); a label whose popcounts collapse toward 0 or dim has
    * lost most of its Hamming resolution — the audit a pipeline runs
    * BEFORE trusting the binary index. */
  def embedBinaryAudit(s: SparkSession, d: String): DataFrame =
    binaryVectors(s, d)
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vecs"),
        sum(col("pop")).as("total_set_bits"),
        min(col("pop")).as("min_pop"),
        max(col("pop")).as("max_pop"))

  /** Hamming top-3 for the first 50 queries over the packed signatures.
    * Same broadcast-the-queries orientation as [[annBruteforce]], but the
    * streamed side is the 8-byte binary view, not the 512-byte float
    * vectors, and the per-pair kernel is XOR+popcount instead of a 64-term
    * float fold. Ties broken by nn_id — fully deterministic (integers). */
  def annHamming(s: SparkSession, d: String): DataFrame = {
    val all = binaryVectors(s, d).select(col("vec_id"), col("bits"))
    val q = all.filter(col("vec_id") < 50)
      .select(col("vec_id").as("q_id"), col("bits").as("qbits"))
    val pairs = broadcast(q).join(all, col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("nn_id"),
        expr("aggregate(zip_with(qbits, bits, (x, y) -> bit_count(x ^ y)), 0, (acc, h) -> acc + h)")
          .as("ham"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("ham").asc, col("nn_id"))
    pairs.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("q_id"), col("nn_id"), col("rnk"), col("ham"))
  }

  /** What 1-bit quantization costs in answer quality: the binary top-3
    * scored against the exact float cosine truth — exact integer hit
    * counts, same audit shape as every other sketch family. */
  def annHammingRecall(s: SparkSession, d: String): DataFrame =
    recallAgainstExact(annHamming(s, d), exactTop3(s, d, 200))

  private val LSH_TABLES = 16
  private val LSH_BITS = 6

  /** Dedup runs its own plane family at a HIGHER-precision operating point:
    * 12-bit tables (4096 buckets) instead of the ANN path's 6-bit (64).
    * Bucket occupancy — and with it the candidate-pair space of the
    * bucket self-join — is n/2^bits per table, so the 6-bit tables that
    * maximize ANN recall turn quadratic as the corpus grows (measured at
    * sf1: 53 s in the pair join). At 12 bits genuine near-duplicates
    * (cos >= 0.95) still collide in at least one of 16 tables with
    * p > 0.98, while random-tail pairs are pruned ~30x harder; at real
    * scale, bits grows ~ log2(corpus / target bucket size) — measured
    * three times now: 6 bits went quadratic at 10k vectors, 12 bits at
    * 100k (sf1), and 14 bits at 500k (sf5: ~30 entries/bucket -> ~117M
    * candidate pairs -> 16 s in the distinct+rerank). 16 bits holds sf5
    * occupancy at ~8 (~26M pairs); true near-dups (cos >= 0.98) still
    * collide in >= 1 of 16 tables with p > 0.999. Bits is compile-time
    * because the DuckDB oracle inlines the plane family literals — a
    * production deployment would derive it from the corpus count at plan
    * time with the same log2 rule. */
  private val DEDUP_TABLES = 16
  private val DEDUP_BITS = 16

  /** Deterministic pseudo-random hyperplanes for `nPlanes` sign-bit
    * hashes. Weights derive from a splitmix-style integer mix of
    * (plane + salt, dim), then are QUANTIZED to 6 decimals by a text
    * round-trip: the decimal literal is the cross-engine source of truth
    * (the DuckDB oracle inlines the same text), so both engines hold
    * bit-identical doubles. */
  private[ops] def planeFamily(nPlanes: Int, dim: Int, salt: Long): Array[Array[Double]] =
    Array.tabulate(nPlanes, dim) { (p, j) =>
      var z = (p.toLong + salt) * 64 + j + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      f"${z.toDouble / Long.MaxValue.toDouble}%.6f".toDouble // in [-1, 1]
    }

  /** The ANN family (salt 0 keeps round-2 plane values verbatim). */
  private[ops] def planeWeights(dim: Int): Array[Array[Double]] =
    planeFamily(LSH_TABLES * LSH_BITS, dim, 0L)

  /** The dedup family — independent planes (disjoint salt range). */
  private[ops] def dedupPlaneWeights(dim: Int): Array[Array[Double]] =
    planeFamily(DEDUP_TABLES * DEDUP_BITS, dim, 4096L)

  /** (vec_id, tbl, bucket) hash-table entries: LSH_TABLES independent
    * LSH_BITS-bit sign hashes per vector, computed by the native
    * [[org.apache.spark.sql.graftbridge.LshBuckets]] expression — one
    * codegen'd pass per vector, NO shuffle (the previous declarative shape
    * exploded 96 plane-sims per row and re-assembled them with a groupBy;
    * the expression also widens the float embedding to double once instead
    * of once per plane). Bucket ids are bit-identical, so the DuckDB
    * oracle is unchanged. */
  private def lshBucketsPlan(s: SparkSession, d: String,
      planes: Array[Array[Double]], bits: Int): DataFrame =
    embeddings(s, d)
      .select(col("vec_id"),
        posexplode(org.apache.spark.sql.graftbridge.lshBuckets(col("embedding"), planes, bits))
          .as(Seq("tbl", "bucket")))

  /** A bucket table is a pure function of (data directory, plane family)
    * and is consumed by multiple catalog queries (x_ann_lsh + its recall
    * audit share the ANN family; x_dedup_embedding has its own) — persist
    * one copy per key for the session, the same amortization pattern as
    * [[centroidCache]]. (vec_id, tbl, bucket) is ~20 bytes/row × tables:
    * at 100 TB this is the bucket INDEX a production pipeline would
    * materialize to storage once and reuse; MEMORY_AND_DISK spills
    * gracefully if it outgrows executors. */
  private val lshBucketCache = new SessionCache[DataFrame]()

  private def lshBuckets(s: SparkSession, d: String): DataFrame =
    cached(lshBucketCache, s, s"$d#ann") {
      lshBucketsPlan(s, d, planeWeights(64), LSH_BITS)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  private def dedupBuckets(s: SparkSession, d: String): DataFrame =
    cached(lshBucketCache, s, s"$d#dedup") {
      lshBucketsPlan(s, d, dedupPlaneWeights(64), DEDUP_BITS)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  /** Multi-table LSH approximate top-1 neighbor: candidates = union over
    * LSH_TABLES hash tables of same-bucket ids, dedup'd, then exact-cosine
    * reranked (fetch vectors back by id — candidate generation never
    * shuffles vector payloads). Recall/cost is tuned by (TABLES, BITS):
    * on THIS corpus (random embeddings, no planted near-neighbors — the
    * worst case for LSH) 16x6 measures recall@1 = 0.58 and top-3 rate =
    * 0.92 while scanning ~23% of the corpus per query; sweep: 8x6 -> 0.37 /
    * 0.72 @ 12%, 16x8 -> 0.30 / 0.58 @ 7%. Corpora with genuine near-dup
    * structure sit far above these numbers at the same parameters. The
    * x_ann_lsh_recall audit query reports the exact hit counts. */
  def annLsh(s: SparkSession, d: String): DataFrame = {
    val bk = lshBuckets(s, d)
    val cand = bk.as("a").filter(col("a.vec_id") < 200)
      .join(bk.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
          col("b.vec_id") =!= col("a.vec_id"))
      .select(col("a.vec_id").as("q_id"), col("b.vec_id").as("nn_id"))
      .distinct()
    val n = vectors(s, d)
    val scored = cand
      .join(n.as("qa"), col("q_id") === col("qa.vec_id"))
      .join(n.as("qb"), col("nn_id") === col("qb.vec_id"))
      .select(col("q_id"), col("nn_id"),
        (dot(col("qa.v"), col("qb.v")) / (col("qa.nrm") * col("qb.nrm"))).as("sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("nn_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("q_id"), col("nn_id"), col("sim"))
  }

  private val IVF_K = 16
  private val IVF_ITERS = 3
  /** Probes per query — the recall/cost knob. Measured on this corpus
    * (random embeddings, worst case): nprobe 2 -> recall@1 0.42 / top-3
    * 0.76; 4 -> 0.63 / 0.95; 8 -> 0.82 / 0.995 (half the clusters). 4 is
    * the balanced default; the x_ann_ivf_recall audit reports exact counts. */
  private val IVF_NPROBE = 4
  /** LCG hash-sample parameters for centroid training (see [[ivfTrainSet]]):
    * keep (id*MULT + ADD) mod MOD < KEEP, i.e. a deterministic 50% sample.
    * Raising the corpus 1000x, you'd lower KEEP instead of paying more
    * full-corpus Lloyd passes — centroid quality is set by the sample SIZE,
    * not the sampling RATE. */
  private val IVF_TRAIN_MULT = 1103515245L
  private val IVF_TRAIN_ADD = 12345L
  private val IVF_TRAIN_MOD = 2048L
  private val IVF_TRAIN_KEEP = 1024L

  /** Centroids as ONE 2D array literal. Inlining k separate 64-double
    * literals into the expression tree made every training job pay seconds
    * of codegen for the giant constant-folded source; a single Literal
    * serializes once and the per-element work runs through the (already
    * interpreted-safe) DotProduct eval. */
  private def centsLit(cents: Array[Array[Double]]): Column =
    typedLit(cents.map(_.toSeq).toSeq)

  /** Similarity of `v` to each centroid, as an array aligned with cluster ids. */
  private def centroidSims(v: Column, cents: Array[Array[Double]]): Column =
    transform(centsLit(cents), c => org.apache.spark.sql.graftbridge.dotProduct(v, c))

  /** Nearest-centroid id: argmax similarity, ties to the lowest cluster
    * index — the native NearestCentroid expression (one JIT'd two-level
    * loop). The HOF formulation it replaced ([[assignClusterViaHof]],
    * spec-pinned identical) pays an interpreted lambda call per CENTROID
    * per row: at the occupancy-targeted k the auto-k entry trains
    * (k=4000 at sf5) that was ~60 s of the operator's 68 s cold run. */
  private[graft] def assignCluster(v: Column, cents: Array[Array[Double]]): Column =
    org.apache.spark.sql.graftbridge.nearestCentroid(v, cents)

  /** The transform/array_position formulation [[assignCluster]] replaced —
    * retained as the independent parity reference its spec pins the native
    * expression against (the simhashSignaturesViaExplode discipline). */
  private[graft] def assignClusterViaHof(v: Column, cents: Array[Array[Double]]): Column = {
    val sims = centroidSims(v, cents)
    (array_position(sims, array_max(sims)) - 1).cast("int")
  }

  /** Deterministic k-means-lite: centroids seeded from evenly-strided
    * vec_ids, refined with a few Lloyd iterations. Centroid means use exact
    * DECIMAL sums (a raw-double avg varies with partition order, which would
    * make cluster assignments — and therefore query results — flap between
    * runs). Returns driver-side centroids; k*dim is tiny at any data scale.
    */
  /** Training is a pure function of the data directory (deterministic
    * seeds, deterministic arithmetic), so one memoized result serves every
    * query in the session — x_ann_ivf and x_ann_ivf_recall share it
    * instead of re-running three Lloyd jobs each. */
  private val centroidCache = new SessionCache[Array[Array[Double]]]()

  private[graft] def trainIvfCentroids(s: SparkSession, d: String,
      k: Int = IVF_K): Array[Array[Double]] =
    cached(centroidCache, s, s"$d#k=$k")(trainIvfCentroidsUncached(s, d, k))

  /** Deterministic hash-sample the Lloyd passes train on. At 100 TB you do
    * not run k-means over the corpus — centroid quality converges on a
    * sample long before the corpus is exhausted, and each avoided pass is a
    * full-corpus scan. The predicate is a fixed LCG mix of the key in plain
    * 64-bit arithmetic (no overflow at any realistic id, no engine-specific
    * hash), so the DuckDB oracle inlines the SAME filter and the
    * correctness gate stays exact. */
  private[ops] def ivfTrainSet(s: SparkSession, d: String): DataFrame =
    vectors(s, d).select(col("vec_id"), col("v")).filter(
      (col("vec_id") * lit(IVF_TRAIN_MULT) + lit(IVF_TRAIN_ADD)) % lit(IVF_TRAIN_MOD)
        < lit(IVF_TRAIN_KEEP))

  private[ops] def trainIvfCentroidsUncached(s: SparkSession, d: String,
      k: Int = IVF_K): Array[Array[Double]] = {
    // Training is eager (each Lloyd iteration collects centroid sums), so a
    // persist here genuinely caches across iterations — without it every
    // iteration re-reads the parquet and re-derives the projection.
    // Seeding stays full-corpus (one cheap IN-pushdown scan, no iteration);
    // only the repeated Lloyd passes read the sample.
    val vecs = vectors(s, d).select(col("vec_id"), col("v"))
    val train = ivfTrainSet(s, d).persist()
    val n = vecs.count()
    val stride = math.max(1L, n / k)
    val seedIds = (0 until k).map(i => i * stride)
    var cents: Array[Array[Double]] = vecs
      .filter(col("vec_id").isin(seedIds: _*))
      .orderBy(col("vec_id")).limit(k)
      .collect().map(_.getSeq[Double](1).toArray)
    for (_ <- 1 to IVF_ITERS) {
      val assigned = train.withColumn("cluster", assignCluster(col("v"), cents))
      val sums = assigned
        .select(col("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cluster"), col("pos"))
        .agg(sum(col("x").cast(DecimalType(28, 12))).as("sx"), count(lit(1)).as("cn"))
        .collect()
      val byCluster = sums.groupBy(_.getInt(0))
      cents = Array.tabulate(k) { c =>
        byCluster.get(c) match {
          case Some(rows) =>
            val dim = rows.map(_.getInt(1)).max + 1
            val arr = new Array[Double](dim)
            // Exact decimal sum, then decimal->double cast BEFORE the
            // divide: `CAST(sum AS DOUBLE) / count` is replicable in any
            // engine's SQL verbatim, which is what lets the DuckDB oracle
            // re-run the whole Lloyd loop bit-for-bit. (A BigDecimal
            // division here would bake JVM-only MathContext semantics into
            // the centroids.)
            rows.foreach(r => arr(r.getInt(1)) = r.getDecimal(2).doubleValue / r.getLong(3))
            arr
          case None => cents(c) // empty cluster keeps its centroid
        }
      }
    }
    train.unpersist(blocking = false)
    cents
  }

  /** IVF-bucketed approximate top-1 neighbor: assign every vector to its
    * nearest trained centroid (one narrow shuffle on cluster id), probe the
    * NPROBE nearest clusters per query, exact cosine inside the probed
    * buckets only. The scale path for ANN beyond LSH: candidate count ~
    * nprobe/k of the corpus, and the bucket function adapts to the data
    * distribution (unlike fixed hyperplanes). */
  /** Cluster-assigned corpus, persisted per data directory: x_ann_ivf and
    * its recall audit share one assignment pass (16 centroid dots per
    * vector), the same amortization as the bucket/centroid caches. */
  private val ivfAssignedCache = new SessionCache[DataFrame]()

  private[graft] def ivfAssigned(s: SparkSession, d: String, k: Int = IVF_K): DataFrame =
    cached(ivfAssignedCache, s, s"$d#k=$k") {
      vectors(s, d).withColumn("cluster", assignCluster(col("v"), trainIvfCentroids(s, d, k)))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  def annIvf(s: SparkSession, d: String): DataFrame = {
    val cents = trainIvfCentroids(s, d)
    val all = ivfAssigned(s, d)
    // per-query probe list: the NPROBE nearest centroids
    val simStructs = transform(centroidSims(col("qv"), cents),
      (sim, i) => struct(sim.as("sim"), i.as("cl")))
    val q = all.filter(col("vec_id") < 200)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
      .withColumn("probes", slice(reverse(array_sort(simStructs)), 1, IVF_NPROBE))
      .select(col("q_id"), col("qv"), col("qn"), explode(col("probes.cl")).as("cluster"))
    val pairs = q.join(all, Seq("cluster"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("nn_id"),
        (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("nn_id"))
    pairs.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("q_id"), col("nn_id"), col("sim"))
  }

  /** Exact cosine top-3 for the first `nq` query vectors — the ground truth
    * the sketch audits compare against (same plan shape as
    * [[annBruteforce]]: broadcast the query side, stream the corpus).
    * Persisted per (directory, nq): the LSH and IVF recall audits share one
    * brute-force pass instead of each paying the full corpus scan. */
  private val exactTop3Cache = new SessionCache[DataFrame]()

  private def exactTop3(s: SparkSession, d: String, nq: Int): DataFrame =
    cached(exactTop3Cache, s, s"$d#$nq") {
      exactTop3Plan(s, d, nq).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  private def exactTop3Plan(s: SparkSession, d: String, nq: Int): DataFrame = {
    val all = vectors(s, d)
    val q = all.filter(col("vec_id") < nq)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val pairs = broadcast(q).join(all, col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("nn_id"),
        (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("nn_id"))
    pairs.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
      .select(col("q_id"), col("nn_id"), col("rnk"))
  }

  /** Exact hit counts of a sketch's top-1 answers against the exact top-3:
    * recall@1 = n_top1/n_results, within-top-3 rate = n_top3/n_results.
    * Deterministic integers — hash-oracle-able, unlike a float recall. */
  private def recallAgainstExact(sketch: DataFrame, exact3: DataFrame): DataFrame =
    sketch.select(col("q_id"), col("nn_id"))
      .join(exact3, Seq("q_id", "nn_id"), "left")
      .agg(
        count(lit(1)).as("n_results"),
        sum(when(col("rnk") === 1, 1L).otherwise(0L)).as("n_top1"),
        sum(when(col("rnk").isNotNull, 1L).otherwise(0L)).as("n_top3"))

  /** Embedding-cosine near-duplicate pairs (the dedup flavor of ANN):
    * multi-table LSH candidates from the HIGH-PRECISION 16×12-bit family
    * (see [[DEDUP_BITS]]), exact cosine-threshold verification — never the
    * O(n^2) pair space. On real near-duplicates (cos >= 0.95) a pair
    * collides in at least one of the 16 tables with p > 0.99; THIS corpus
    * is random with max pair cosine ~0.5-0.6, so the demo threshold is 0.5
    * (top of the distribution), where 12-bit recall is deliberately low
    * (~0.12) — random-tail pairs are exactly what a dedup pass should
    * prune. The oracle mirrors the same candidate generation, so the
    * result is exactly verifiable either way. */
  def dedupEmbedding(s: SparkSession, d: String): DataFrame = {
    val bk = dedupBuckets(s, d)
    val cand = bk.as("a")
      .join(bk.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .distinct()
    val n = vectors(s, d)
    cand
      .join(n.as("qa"), col("id_a") === col("qa.vec_id"))
      .join(n.as("qb"), col("id_b") === col("qb.vec_id"))
      .select(col("id_a"), col("id_b"),
        (dot(col("qa.v"), col("qb.v")) / (col("qa.nrm") * col("qb.nrm"))).as("cos"))
      .filter(col("cos") >= 0.5)
  }

  /** Cosine threshold for the semantic (cluster-bucketed) dedup. This
    * corpus is random with max pair cosine ~0.5-0.6, so 0.4 sits at the
    * top of the distribution — high enough to prune the random mass,
    * low enough that the demo keeps a verifiable nonempty pair set. A
    * real near-dup deployment runs 0.9+. */
  private[graft] val SEM_TAU = 0.4

  /** Semantic near-duplicate dedup, SemDeDup shape (Abbas et al. 2023 —
    * see PAPERS.md): bucket the corpus by nearest trained k-means
    * centroid, compare pairs ONLY within a cluster, and mark a vector a
    * duplicate when a LOWER-id vector in its cluster clears the cosine
    * threshold — the greedy keep-first rule, reported as
    * (vec_id, cluster, dup_of = smallest qualifying keeper, cos of that
    * pair). Complements the LSH family with a DATA-ADAPTIVE bucket
    * function: hyperplanes are oblivious to the corpus distribution,
    * centroids follow it, which is why this is the published shape for
    * pruning semantically-redundant web-scale training data.
    *
    * Scale: candidate space is Σ_c n_c² — with k grown ~ corpus/target
    * cluster size (same log-rule regime the LSH families measure for
    * bits) the per-cluster quadratic term stays bounded and total work
    * stays ~linear; the cluster equi-join shuffles only (id, cluster,
    * vec). Training reuses the shared deterministic Lloyd sample
    * ([[trainIvfCentroids]]) so the DuckDB oracle replays everything —
    * training, assignment, pairing — bit-for-bit. */
  /** Cluster count of the FINE semantic-dedup family — the scale knob.
    * Intra-cluster pair count is Σ_c n_c² ≈ n²/k, so k grows linearly
    * with the corpus to hold per-cluster occupancy (and with it total
    * pair work) at a constant multiple of n: k ≈ n / target_occupancy.
    * 16 clusters (the ANN default, occupancy ~31 at sf0.01) is the
    * oracled default; 64 is the demo fine configuration (occupancy ~8),
    * oracled END-TO-END by the same unrolled-Lloyd SQL with k=64
    * literals. Recall trade: a true near-dup pair can straddle a finer
    * boundary — SemDeDup accepts this (its published deployments run
    * k in the tens of thousands over 10⁸+ docs for exactly this cost
    * rule). */
  private val SEM_FINE_K = 64

  /** Pair-space bound of the fixed-k pin entries — ≥ every gate scale's
    * corpus (so the oracled rows are exactly the historical ones) and
    * fixed thereafter (so the pins are scale-flat). See [[dedupSemantic]]. */
  private val SEM_PIN_MAX_ID = 2000L

  /** `maxVecId` bounds the PAIR-SPACE input (training and assignment stay
    * corpus-wide — they are linear): the fixed-k catalog entries pass
    * Some(2000) so the k=16/64 REGRESSION PINS — whose whole point is
    * pinning the machinery at a fixed knob, not surviving growth — stop
    * being the catalog's one quadratic curve (fixed k=16 measured 69× for
    * 50× data corpus-wide; at a fixed 2000-vector sample it is
    * scale-flat). The bound is a no-op at both correctness-gate scales
    * (sf0.01 has 500 vectors, sf0.1 exactly 2000), so the pins' oracled
    * rows are unchanged; the production path at ANY size remains
    * [[dedupSemanticAuto]], same discipline as the maxDocId-bounded
    * SimHash/Jaccard audits. */
  def dedupSemantic(s: SparkSession, d: String, k: Int = IVF_K,
      maxVecId: Option[Long] = None): DataFrame = {
    val a = maxVecId.foldLeft(ivfAssigned(s, d, k))(
      (df, m) => df.filter(col("vec_id") < m))
    val pairs = a.as("x")
      .join(a.as("y"),
        col("x.cluster") === col("y.cluster") && col("y.vec_id") < col("x.vec_id"))
      .select(col("x.vec_id").as("vec_id"), col("x.cluster").as("cluster"),
        col("y.vec_id").as("dup_of"),
        (dot(col("x.v"), col("y.v")) / (col("x.nrm") * col("y.nrm"))).as("cos"))
      .filter(col("cos") >= SEM_TAU)
    val w = Window.partitionBy(col("vec_id")).orderBy(col("dup_of"))
    pairs.withColumn("rnk", row_number().over(w)).filter(col("rnk") === 1)
      .select(col("vec_id"), col("cluster"), col("dup_of"), col("cos"))
  }

  /** Occupancy-targeted SemDeDup: [[dedupSemantic]] with the cluster count
    * picked BY THE SIZING RULE instead of by hand — k = max(16,
    * ceil(n / targetOccupancy)), so expected per-cluster occupancy (and
    * with it the intra-cluster pair space Σn_c² ≈ n·occupancy) stays
    * constant as the corpus grows and total pair work stays ~linear.
    * Measured on the r10 bench artifacts: fixed k=16 grew 69× for 50×
    * data (quadratic onset — the same fixed-knob failure mode the narrow
    * simhash band space showed), k=64 grew 4.7×; this wrapper is the
    * production entry point that makes the knob a non-decision.
    *
    * The corpus count is one control-plane aggregate riding the same
    * eager-at-construction regime as the Lloyd training jobs ([[
    * trainIvfCentroids]]); like them it snapshots the corpus at build
    * time. Catalog entry `x_dedup_semantic_auto` gates this path: the
    * driver-computed k is RECORDED at query-construction time and inlined
    * into the generated oracle SQL (exactly how [[ivfAssignCtes]] already
    * inlines the fixed families' k literals) — the count probe is
    * deterministic per sf directory, so DuckDB replays training,
    * assignment, and pairing at the same k, end-to-end. The k=16 and
    * k=64 fixed entries stay as regression pins.
    *
    * Honest cost regime: with k ≈ n/occupancy, flat k-means TRAINING and
    * ASSIGNMENT are n·k = n²/occupancy flops — the quadratic moves from
    * the pair space into the quantizer. The native
    * [[org.apache.spark.sql.graftbridge.NearestCentroid]] loop keeps the
    * constant small enough that the measured curve stays sublinear
    * through sf5 (9.4 s at 100k vectors / k=4000, 8.3× for 50× data),
    * and the Lloyd passes read only the hash sample; past ~10⁷ vectors
    * the production move is a two-level (coarse √k × fine √k) quantizer —
    * n·2√k assignment — which composes here by swapping
    * [[trainIvfCentroids]]/[[ivfAssigned]], the single seam every
    * consumer already goes through. */
  def dedupSemanticAuto(s: SparkSession, d: String,
      targetOccupancy: Long = 512L): DataFrame = {
    require(targetOccupancy >= 1, "targetOccupancy must be >= 1")
    val n = vectors(s, d).count()
    // toIntExact: for corpus counts where ceil(n/occupancy) exceeds Int a
    // silent truncation would train a garbage (possibly negative) cluster
    // count — fail loudly instead (k > 2^31 also means the caller wants a
    // hierarchical index, not flat k-means).
    val k = math.max(IVF_K,
      math.toIntExact((n + targetOccupancy - 1) / targetOccupancy))
    dedupSemantic(s, d, k)
  }

  /** Demo occupancy of the `x_dedup_semantic_auto` catalog entry: small
    * enough that the data-driven k is NON-TRIVIAL at the correctness-gate
    * scales (k=20 at sf0.01's 500 vectors, k=80 at sf0.1's 2000 — neither
    * equals the fixed 16/64 pins, so the gate genuinely exercises the
    * probe→inline machinery), large enough that the sf5 bench point stays
    * sane (k=4000 over 100k vectors — assignment n·k bounded, pair space
    * n·occupancy). Production default stays 512. */
  private val AUTO_DEMO_OCCUPANCY = 25L

  /** Incremental (delta-vs-index) SEMANTIC dedup — the embedding-space
    * sibling of [[graft.ops.Dedup.dedupIncremental]], completing the
    * incremental family (exact and MinHash already have one): a new batch
    * of vectors is checked against the EXISTING corpus without re-deduping
    * the corpus. Same demo split (odd `vec_id` = incoming delta, even =
    * persisted index) and the same INDEX-FRESHNESS CONTRACT, restated
    * against its spec (IncrementalSemanticSpec): delta-vs-index matches
    * FOUND; delta-vs-delta NOT (the batch self-dedups with
    * [[dedupSemanticAuto]] over the delta alone); index-vs-index assumed
    * handled at index build; batches probe-then-append so cross-batch
    * pairs are found by the later batch.
    *
    * Probe shape: assign each delta vector to its nearest trained
    * centroid (native [[org.apache.spark.sql.graftbridge.NearestCentroid]]
    * argmax — delta·k dots), then an equi-join on the cluster key against
    * ONLY that cluster's index members, exact cosine ≥ [[SEM_TAU]] inside
    * the bucket. With the occupancy sizing rule (k ≈ n/occupancy, the
    * same [[AUTO_DEMO_OCCUPANCY]] knob as the auto entry so the two gates
    * share k) per-delta-probe work is ~occupancy index rows — O(delta)
    * per run, never O(corpus), exactly the minhash probe's cost contract.
    * In production the centroids and the assigned index are PERSISTED
    * artifacts of the index build (the demo recomputes both from the
    * day-0 snapshot so the DuckDB oracle can replay training end-to-end);
    * the per-run job reads them, so the corpus is never rescanned.
    *
    * Output mirrors the minhash probe: each matching delta vector, its
    * cluster, its canonical match (min index vec_id clearing τ), and the
    * match count — ALL INTEGRAL columns (§8.4 new-entry rule; the cosine
    * stays internal to the threshold predicate, a class-B per-row
    * raw-vector fold on both engines). */
  def dedupSemanticIncremental(s: SparkSession, d: String,
      targetOccupancy: Long = 512L): DataFrame = {
    require(targetOccupancy >= 1, "targetOccupancy must be >= 1")
    val n = vectors(s, d).count()
    val k = math.max(IVF_K,
      math.toIntExact((n + targetOccupancy - 1) / targetOccupancy))
    val a = ivfAssigned(s, d, k)
    val delta = a.filter(col("vec_id") % 2 === 1)
    val index = a.filter(col("vec_id") % 2 === 0)
    delta.as("x")
      .join(index.as("y"), col("x.cluster") === col("y.cluster"))
      .select(col("x.vec_id").as("vec_id"), col("x.cluster").as("cluster"),
        col("y.vec_id").as("match_vec"),
        (dot(col("x.v"), col("y.v")) / (col("x.nrm") * col("y.nrm"))).as("cos"))
      .filter(col("cos") >= SEM_TAU)
      .groupBy(col("vec_id"), col("cluster"))
      .agg(min(col("match_vec")).as("match_id"), count(lit(1)).as("n_matches"))
      .orderBy(col("vec_id"))
  }

  /** The incremental semantic probe run as a REAL Structured Streaming
    * query — [[graft.streaming.SemanticStream]]'s parity-theorem demo
    * (self ∪ probe tiles the one-shot same-cluster τ-pair set; contract
    * and 100 TB story in its scaladoc). Centroids are trained once from
    * the day-0 snapshot with the auto entry's occupancy sizing law and
    * PINNED across batches; the corpus is staged as three files (one
    * micro-batch each, `vec_id` mod 3) and drained with AvailableNow.
    * Output is the accumulated undirected pair set — all integral
    * columns, gated by the one-shot pair-set oracle. */
  def dedupSemanticStreamIncremental(s: SparkSession, d: String,
      targetOccupancy: Long = 512L): DataFrame = {
    require(targetOccupancy >= 1, "targetOccupancy must be >= 1")
    val n = vectors(s, d).count()
    val k = math.max(IVF_K,
      math.toIntExact((n + targetOccupancy - 1) / targetOccupancy))
    val cents = trainIvfCentroids(s, d, k)
    val work = graft.ops.Scratch.dir("graft_stream_sem")
    val stage = s"$work/stage"
    val vecs = vectors(s, d).select(col("vec_id"), col("v"), col("nrm"))
    (0 until 3).foreach { b =>
      vecs.filter(col("vec_id") % 3 === b)
        .coalesce(1).write.mode("append").parquet(stage)
    }
    graft.streaming.SemanticStream.runIncremental(s, stage, work,
        v => assignCluster(v, cents), SEM_TAU)
      .select(col("vec_a"), col("vec_b"), col("cluster"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** The maintenance lifecycle of the SEMANTIC streaming sink (catalog
    * `x_stream_semantic_compacted`) — the embedding-space twin of
    * [[graft.ops.Dedup.dedupStreamCompacted]], proving SinkRetention's
    * "applies verbatim to the other sinks" claim on a sink whose payload is
    * vectors + a pinned cluster assignment instead of minhash arrays: drain
    * half the backlog, STOP, compact the vector index at the committed
    * watermark and prune the consumed match partitions, then resume from
    * the checkpoint over the rest. Compaction folds partitions without
    * changing index content, so the resumed batches' cluster-keyed probes
    * see exactly the same assigned vectors and the final match union still
    * tiles the one-shot same-cluster τ-pair set — the oracle is the SAME
    * replayed-Lloyd CTE pile as `x_stream_semantic_incremental`: the parity
    * theorem asserted ACROSS a compaction boundary. (The pruned match
    * partitions are re-derived for the final result from the collected
    * early matches — retention assumes downstream consumed them, and this
    * entry IS that consumer.) */
  def dedupSemanticStreamCompacted(s: SparkSession, d: String,
      targetOccupancy: Long = 512L): DataFrame = {
    require(targetOccupancy >= 1, "targetOccupancy must be >= 1")
    val n = vectors(s, d).count()
    val k = math.max(IVF_K,
      math.toIntExact((n + targetOccupancy - 1) / targetOccupancy))
    val cents = trainIvfCentroids(s, d, k)
    val work = graft.ops.Scratch.dir("graft_stream_sem_c")
    val stage = s"$work/stage"
    val vecs = vectors(s, d).select(col("vec_id"), col("v"), col("nrm"))
    // First backlog: two files -> committed micro-batches 0 and 1.
    (0 until 2).foreach { b =>
      vecs.filter(col("vec_id") % 4 === b)
        .coalesce(1).write.mode("append").parquet(stage)
    }
    val firstHalf = graft.streaming.SemanticStream.runIncremental(s, stage, work,
        v => assignCluster(v, cents), SEM_TAU)
      .select(col("vec_a"), col("vec_b"), col("cluster"))
      .collect() // consume the early matches BEFORE retention drops them
    // Maintenance window: the stream is stopped; batch 1 is committed.
    graft.streaming.SemanticStream.compactIndex(s, s"$work/vec_index", watermark = 1L)
    graft.streaming.SemanticStream.pruneMatches(s, s"$work/matches", keepFrom = 2L)
    // Second backlog: the checkpoint resumes at batch 2; batches 2 and 3
    // probe the COMPACTED index.
    (2 until 4).foreach { b =>
      vecs.filter(col("vec_id") % 4 === b)
        .coalesce(1).write.mode("append").parquet(stage)
    }
    val lateMatches = graft.streaming.SemanticStream.runIncremental(s, stage, work,
        v => assignCluster(v, cents), SEM_TAU)
      .select(col("vec_a"), col("vec_b"), col("cluster"))
    import s.implicits._
    lateMatches
      .unionByName(firstHalf.toSeq.map(r =>
        (r.getLong(0), r.getLong(1), r.getInt(2))).toDF("vec_a", "vec_b", "cluster"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** The OBJECT-STORE maintenance lifecycle on the SEMANTIC sink (catalog
    * `x_stream_semantic_manifest`) — the embedding-space twin of
    * [[graft.ops.Dedup.dedupStreamManifest]], closing the one asymmetry the
    * r15 verdict called out: `SemanticStream.compactIndexManifest` was
    * spec-proven but never ran under the DuckDB oracle. Same
    * stop-compact-resume window as [[dedupSemanticStreamCompacted]], but
    * the fold publishes through the MANIFEST-POINTER commit
    * ([[graft.streaming.SinkRetention.compactIndexManifest]]) — an atomic
    * single-file creation instead of a directory rename, the variant a
    * deployment runs when the vector index lives on S3-class storage. The
    * resumed batches resolve the index through `SinkRetention.readLive`
    * (the probe's standing read seam), picking the folded generation up
    * from the manifest; content is unchanged by the fold, so the final
    * match union still tiles the one-shot same-cluster τ-pair set and the
    * oracle is STILL the replayed-Lloyd CTE pile of
    * `x_stream_semantic_incremental` — the parity theorem asserted across
    * a manifest-committed compaction boundary. */
  def dedupSemanticStreamManifest(s: SparkSession, d: String,
      targetOccupancy: Long = 512L): DataFrame = {
    require(targetOccupancy >= 1, "targetOccupancy must be >= 1")
    val n = vectors(s, d).count()
    val k = math.max(IVF_K,
      math.toIntExact((n + targetOccupancy - 1) / targetOccupancy))
    val cents = trainIvfCentroids(s, d, k)
    val work = graft.ops.Scratch.dir("graft_stream_sem_m")
    val stage = s"$work/stage"
    val vecs = vectors(s, d).select(col("vec_id"), col("v"), col("nrm"))
    (0 until 2).foreach { b =>
      vecs.filter(col("vec_id") % 4 === b)
        .coalesce(1).write.mode("append").parquet(stage)
    }
    val firstHalf = graft.streaming.SemanticStream.runIncremental(s, stage, work,
        v => assignCluster(v, cents), SEM_TAU)
      .select(col("vec_a"), col("vec_b"), col("cluster"))
      .collect() // consume the early matches BEFORE retention drops them
    // Maintenance window: stream stopped, batch 1 committed — manifest fold.
    graft.streaming.SemanticStream.compactIndexManifest(s, s"$work/vec_index", watermark = 1L)
    graft.streaming.SemanticStream.pruneMatches(s, s"$work/matches", keepFrom = 2L)
    // The checkpoint resumes at batch 2; batches 2 and 3 probe the folded
    // index THROUGH the manifest (their strictly-earlier reads resolve via
    // readLive, which the incrementalBatch body already routes through).
    (2 until 4).foreach { b =>
      vecs.filter(col("vec_id") % 4 === b)
        .coalesce(1).write.mode("append").parquet(stage)
    }
    val lateMatches = graft.streaming.SemanticStream.runIncremental(s, stage, work,
        v => assignCluster(v, cents), SEM_TAU)
      .select(col("vec_a"), col("vec_b"), col("cluster"))
    import s.implicits._
    lateMatches
      .unionByName(firstHalf.toSeq.map(r =>
        (r.getLong(0), r.getLong(1), r.getInt(2))).toDF("vec_a", "vec_b", "cluster"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** The amortized maintenance schedule on the SEMANTIC sink (catalog
    * `x_stream_semantic_tiered`) — the embedding-space twin of
    * [[graft.ops.Dedup.dedupStreamTiered]], proving the threshold gate's
    * "applies verbatim to the other sinks" claim: a below-threshold window
    * that must leave the vector index byte-untouched (2 foldable
    * partitions < K=3), then an at-threshold window that folds, with
    * resumed micro-batches probing the result of each. The oracle stays
    * the one-shot same-cluster τ-pair set (the parity theorem across a
    * no-op window AND a fold window). */
  def dedupSemanticStreamTiered(s: SparkSession, d: String,
      targetOccupancy: Long = 512L): DataFrame = {
    require(targetOccupancy >= 1, "targetOccupancy must be >= 1")
    val n = vectors(s, d).count()
    val k = math.max(IVF_K,
      math.toIntExact((n + targetOccupancy - 1) / targetOccupancy))
    val cents = trainIvfCentroids(s, d, k)
    val work = graft.ops.Scratch.dir("graft_stream_sem_t")
    val stage = s"$work/stage"
    val idx = s"$work/vec_index"
    val vecs = vectors(s, d).select(col("vec_id"), col("v"), col("nrm"))
    // Backlog 1: micro-batches 0 and 1 commit.
    (0 until 2).foreach { b =>
      vecs.filter(col("vec_id") % 4 === b)
        .coalesce(1).write.mode("append").parquet(stage)
    }
    graft.streaming.SemanticStream.runIncremental(s, stage, work,
      v => assignCluster(v, cents), SEM_TAU).count()
    // Maintenance window A — BELOW threshold: no-op, index byte-untouched.
    val ranA = graft.streaming.SemanticStream.compactIndexIfNeeded(s, idx,
      watermark = 1L, minFolded = 3)
    require(!ranA, "2 foldable partitions must not trigger a minFolded=3 fold")
    // Backlog 2: batch 2 probes the untouched index.
    vecs.filter(col("vec_id") % 4 === 2).coalesce(1).write.mode("append").parquet(stage)
    graft.streaming.SemanticStream.runIncremental(s, stage, work,
      v => assignCluster(v, cents), SEM_TAU).count()
    // Maintenance window B — AT threshold: 3 foldable partitions, folds.
    val ranB = graft.streaming.SemanticStream.compactIndexIfNeeded(s, idx,
      watermark = 2L, minFolded = 3)
    require(ranB, "3 foldable partitions must trigger a minFolded=3 fold")
    // Backlog 3: batch 3 probes the folded index; the match sink (never
    // pruned here) accumulates every batch's pairs.
    vecs.filter(col("vec_id") % 4 === 3).coalesce(1).write.mode("append").parquet(stage)
    graft.streaming.SemanticStream.runIncremental(s, stage, work,
        v => assignCluster(v, cents), SEM_TAU)
      .select(col("vec_a"), col("vec_b"), col("cluster"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** The eval-set stand-in for semantic decontamination — same convention
    * as the lexical decontam family's benchmark split (sized at 50 so the
    * fixture exercises multi-hit aggregation at every gate scale). */
  private val SEM_EVAL_MAX = 50L

  /** SEMANTIC decontamination — the paraphrase face of the decontam family
    * (exact 4-gram, Bloom-prefiltered, and span-scrub are its lexical
    * siblings in ops/TextAnalysis): flag corpus vectors whose embedding
    * clears τ against ANY eval-set vector, catching benchmark leakage that
    * survives rewording and therefore never shares a 4-gram. The probe is
    * the index shape, asymmetric: the tiny eval set (broadcast) joins the
    * cluster-assigned corpus on the cluster key, exact cosine inside the
    * shared bucket — the corpus is never shuffled and never compared
    * all-pairs, so at 100 TB this costs one corpus scan against a
    * broadcast eval side, same as the lexical family's broadcast-hash
    * gram join. Output is integral (flagged vec_id, hit count, canonical
    * lowest eval id) per the §8.4 new-entry rule. */
  def decontamSemantic(s: SparkSession, d: String,
      targetOccupancy: Long = 512L): DataFrame = {
    require(targetOccupancy >= 1, "targetOccupancy must be >= 1")
    val n = vectors(s, d).count()
    val k = math.max(IVF_K,
      math.toIntExact((n + targetOccupancy - 1) / targetOccupancy))
    val a = ivfAssigned(s, d, k)
    val eval = a.filter(col("vec_id") < SEM_EVAL_MAX)
    val corpus = a.filter(col("vec_id") >= SEM_EVAL_MAX)
    corpus.as("x").join(broadcast(eval.as("y")),
        col("x.cluster") === col("y.cluster"))
      .filter(dot(col("x.v"), col("y.v")) / (col("x.nrm") * col("y.nrm")) >= SEM_TAU)
      .groupBy(col("x.vec_id").as("vec_id"))
      .agg(count(lit(1)).as("n_eval_hits"), min(col("y.vec_id")).as("eval_id"))
      .orderBy(col("vec_id"))
  }

  /** Ensemble (lexical ∪ semantic) near-dup — the two detectors a real
    * dedup pass runs TOGETHER, because each catches what the other misses:
    * MinHash-LSH flags near-verbatim copies (shared shingles) but is blind
    * to paraphrase; embedding-space SemDeDup flags paraphrase (close in
    * meaning space) but is blind to short verbatim overlap that barely
    * moves a document's embedding. The entry joins the two pair sets FULL
    * OUTER on the shared id space (`vec_id` i is document i's embedding —
    * the corpus convention every embedding-side entry uses) and labels each
    * pair with which detector(s) fired — the drop-list builder unions them,
    * the audit reads the disagreement rows. Both constituent pair sets are
    * the EXACT catalog relations (`x_dedup_minhash`'s candidates and the
    * streaming entry's one-shot same-cluster τ-set), so the composed oracle
    * is their CTE chains FULL JOINed — nothing re-derived, nothing sampled.
    *
    * At 100 TB: cost is the two detectors' own banded/bucketed costs (both
    * pair-space-bounded, see their entries) plus a pair-keyed join of two
    * pair sets — each tiny relative to the corpus. The detectors share no
    * shuffle, so they pipeline independently until the final join. */
  def dedupEnsemble(s: SparkSession, d: String,
      targetOccupancy: Long = 512L): DataFrame = {
    require(targetOccupancy >= 1, "targetOccupancy must be >= 1")
    val lex = Dedup.dedupMinhashLsh(s, d)
      .select(col("doc_a"), col("doc_b"), lit(1).as("via_lexical"))
    val n = vectors(s, d).count()
    val k = math.max(IVF_K,
      math.toIntExact((n + targetOccupancy - 1) / targetOccupancy))
    val a = ivfAssigned(s, d, k)
    val sem = a.as("x").join(a.as("y"),
        col("x.cluster") === col("y.cluster") &&
          col("x.vec_id") < col("y.vec_id"))
      .filter(dot(col("x.v"), col("y.v")) / (col("x.nrm") * col("y.nrm")) >= SEM_TAU)
      .select(col("x.vec_id").as("doc_a"), col("y.vec_id").as("doc_b"),
        lit(1).as("via_semantic"))
    lex.join(sem, Seq("doc_a", "doc_b"), "full_outer")
      .select(col("doc_a"), col("doc_b"),
        coalesce(col("via_lexical"), lit(0)).as("via_lexical"),
        coalesce(col("via_semantic"), lit(0)).as("via_semantic"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ---- Two-level (coarse × fine) quantizer ---------------------------------
  //
  // The scale seam every flat-k-means comment in this file points at: with
  // the occupancy rule, flat k ≈ n/occupancy makes TRAINING and ASSIGNMENT
  // n·k = n²/occupancy flops — the honest quadratic the sf5 bench charges
  // the auto entry (13.1 s at k=4000 over 100k vectors). The two-level
  // quantizer trains k coarse cells and k fine cells INSIDE each coarse
  // cell (k = ceil(sqrt(cells)), cells = ceil(n/occupancy)), so assignment
  // is n·2k = n·2√cells — at the sf5 point that is 100k·18 vs 100k·4000
  // dots, and at 10⁹ vectors (k ≈ 6325 flat) it is the difference between
  // an index build that finishes and one that doesn't. Pair space is
  // unchanged (Σ n_cell² ≈ n·occupancy over k² cells). This is exactly
  // FAISS's IVF-with-two-level-coarse-quantizer composition.

  /** Demo occupancy matches the flat auto entry so the two paths are
    * directly comparable at every bench scale. */
  private val L2_OCCUPANCY = 25L
  private val L2_FINE_ITERS = 2

  /** Side length: k1 = k2 = max(2, ceil(sqrt(ceil(n/occupancy)))) — integer
    * sqrt-of-integer double math, replayed verbatim by the DuckDB oracle's
    * `kk` CTE (IEEE sqrt of an exact integer is correctly rounded in both
    * engines). */
  private def twoLevelK(n: Long, occupancy: Long): Int = {
    val cells = (n + occupancy - 1) / occupancy
    math.max(2, math.ceil(math.sqrt(cells.toDouble)).toInt)
  }

  private val twoLevelCache =
    new SessionCache[(Array[Array[Double]], Array[Array[Double]], Int)]()

  /** Train the two-level quantizer: coarse = the SHARED deterministic Lloyd
    * ([[trainIvfCentroids]] at k), then k fine centroids per coarse cell,
    * trained by a GROUPED Lloyd over the same hash sample — every
    * iteration is ONE distributed job for all k² fine cells (assignment
    * via the native [[org.apache.spark.sql.graftbridge.NearestCentroidSlice]]
    * — each row scans only its own cell's k candidates — and one exact
    * DECIMAL recompute grouped by (c1, c2)), never a per-cell loop.
    * Fine seeds are per-cell strided sample members (row_number within
    * cell / stride); cells thinner than k keep the coarse centroid in
    * their unseeded slots, and empty fine cells keep their previous
    * centroid — the same conventions as the flat trainer, so the oracle
    * replays bit-for-bit. Returns (coarse k×dim, fine flat k²×dim, k). */
  private[ops] def trainTwoLevel(s: SparkSession, d: String)
      : (Array[Array[Double]], Array[Array[Double]], Int) =
    cached(twoLevelCache, s, d) {
      val n = vectors(s, d).count()
      val k = twoLevelK(n, L2_OCCUPANCY)
      val coarse = trainIvfCentroids(s, d, k)
      val sa = ivfTrainSet(s, d)
        .withColumn("c1", assignCluster(col("v"), coarse))
        .persist()
      val seedRows = {
        val wCell = Window.partitionBy(col("c1")).orderBy(col("vec_id"))
        sa.withColumn("rn", row_number().over(wCell).cast("long") - 1)
          .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("c1"))))
          .withColumn("stride", expr(s"greatest(1, cnt div $k)"))
          .filter(expr("rn % stride = 0") && expr(s"rn div stride < $k"))
          .select(col("c1"), expr("CAST(rn div stride AS INT)").as("c2"), col("v"))
          .collect()
      }
      var fine = Array.tabulate(k * k)(i => coarse(i / k).clone())
      seedRows.foreach(r =>
        fine(r.getInt(0) * k + r.getInt(1)) = r.getSeq[Double](2).toArray)
      for (_ <- 1 to L2_FINE_ITERS) {
        val assigned = sa.withColumn("c2",
          org.apache.spark.sql.graftbridge.nearestCentroidSlice(
            col("v"), col("c1"), fine, k))
        val sums = assigned
          .select(col("c1"), col("c2"), posexplode(col("v")).as(Seq("pos", "x")))
          .groupBy(col("c1"), col("c2"), col("pos"))
          .agg(sum(col("x").cast(DecimalType(28, 12))).as("sx"),
            count(lit(1)).as("cn"))
          .collect()
        val next = fine.map(_.clone())
        sums.groupBy(r => (r.getInt(0), r.getInt(1))).foreach {
          case ((c1, c2), rows) =>
            val dim = rows.map(_.getInt(2)).max + 1
            val arr = new Array[Double](dim)
            rows.foreach(r =>
              arr(r.getInt(2)) = r.getDecimal(3).doubleValue / r.getLong(4))
            next(c1 * k + c2) = arr
        }
        fine = next
      }
      sa.unpersist(blocking = false)
      (coarse, fine, k)
    }

  /** Full-corpus two-level assignment `(vec_id, v, nrm, c1, c2)` — n·2k
    * native-codegen dots per vector, one persisted pass per directory. */
  private val twoLevelAssignedCache = new SessionCache[DataFrame]()

  private def twoLevelAssigned(s: SparkSession, d: String): DataFrame =
    cached(twoLevelAssignedCache, s, d) {
      val (coarse, fine, k) = trainTwoLevel(s, d)
      vectors(s, d)
        .withColumn("c1", assignCluster(col("v"), coarse))
        .withColumn("c2", org.apache.spark.sql.graftbridge.nearestCentroidSlice(
          col("v"), col("c1"), fine, k))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  /** SemDeDup over the two-level quantizer (catalog
    * `x_dedup_semantic_2level`): same pair semantics as [[dedupSemantic]]
    * — nearest same-cell earlier neighbor at cos ≥ SEM_TAU — but the cell
    * is the composite (c1, c2) fine cell, i.e. the production shape whose
    * quantizer cost stays n·2√cells as the corpus grows. One shuffle on
    * the composite cell id; cos is a class-B per-row raw-vector fold
    * (SURVEY §8.4). */
  def dedupSemantic2Level(s: SparkSession, d: String): DataFrame = {
    val a = twoLevelAssigned(s, d)
    val pairs = a.as("x")
      .join(a.as("y"),
        col("x.c1") === col("y.c1") && col("x.c2") === col("y.c2") &&
          col("y.vec_id") < col("x.vec_id"))
      .select(col("x.vec_id").as("vec_id"), col("x.c1").as("c1"),
        col("x.c2").as("c2"), col("y.vec_id").as("dup_of"),
        (dot(col("x.v"), col("y.v")) / (col("x.nrm") * col("y.nrm"))).as("cos"))
      .filter(col("cos") >= SEM_TAU)
    val w = Window.partitionBy(col("vec_id")).orderBy(col("dup_of"))
    pairs.withColumn("rnk", row_number().over(w)).filter(col("rnk") === 1)
      .select(col("vec_id"), col("c1"), col("c2"), col("dup_of"), col("cos"))
  }

  /** Cluster-coverage representatives (catalog `x_cluster_medoids`): for
    * each trained k-means cluster, the member closest to the centroid
    * (max cosine at ppm granularity, ties to the lowest vec_id) plus the
    * cluster's size —
    * the diversity-sampling primitive: k medoids summarize the corpus's
    * modes, and sampling budgets allocated per cluster (instead of
    * uniformly) keep rare modes represented. Reuses the shared
    * deterministic Lloyd training, so the DuckDB oracle replays
    * training, assignment, and selection end-to-end.
    *
    * At 100 TB: one shuffle on the cluster id; each window partition is
    * one cluster, bounded by the occupancy rule (pick k via the same
    * sizing law as [[dedupSemanticAuto]]). */
  def clusterMedoids(s: SparkSession, d: String): DataFrame = {
    val cents = trainIvfCentroids(s, d)
    val cos = org.apache.spark.sql.graftbridge.dotProduct(
      col("v"), element_at(centsLit(cents), col("cluster") + 1)) / col("nrm")
    // The score is emitted AND ordered as integral ppm (catalog float
    // discipline, same as x_lm_bigram_score): the raw double is not
    // bit-stable cross-engine here — the centroid literal passes through a
    // decimal→double conversion that DuckDB's CAST(…)/cn composes in a
    // different association, and at sf0.1 the difference reaches the last
    // ~3 ulps (round-10 verdict, cluster 14). Quantizing BOTH the output
    // and the ORDER BY key makes the medoid choice and the gated value
    // depend only on ppm-scale geometry, never on fold order.
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col("cos_ppm").desc, col("vec_id"))
    ivfAssigned(s, d)
      .withColumn("cos_ppm", floor(cos * lit(1000000d)).cast("long"))
      .withColumn("csize", count(lit(1)).over(Window.partitionBy(col("cluster"))))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("cluster"), col("vec_id").as("medoid_id"), col("csize"),
        col("cos_ppm"))
  }

  /** 5-NN majority-vote label prediction audited against the true labels —
    * the standard embedding-quality eval, as a confusion summary. Votes
    * tie-break to the smallest label; all counts exact. */
  def knnLabelVote(s: SparkSession, d: String): DataFrame = {
    val all = embeddings(s, d)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"), col("label"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val q = all.filter(col("vec_id") < 200)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"),
        col("label").as("true_label"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("nn_id"))
    val top5 = broadcast(q).join(all, col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("true_label"), col("vec_id").as("nn_id"), col("label"),
        (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("sim"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
    val wv = Window.partitionBy(col("q_id")).orderBy(col("votes").desc, col("label"))
    top5
      .groupBy(col("q_id"), col("true_label"), col("label"))
      .agg(count(lit(1)).as("votes"))
      .withColumn("vr", row_number().over(wv))
      .filter(col("vr") === 1)
      .groupBy(col("true_label"), col("label").as("predicted"))
      .agg(count(lit(1)).as("n"))
  }

  /** 5-NN majority vote THROUGH the IVF index (catalog `x_knn_vote_ivf`):
    * the same eval as [[knnLabelVote]] but with candidates generated by
    * probing the top-[[IVF_NPROBE]] trained clusters instead of scanning
    * the corpus — the index actually USED for a task, not just
    * recall-audited. Probe construction is bit-identical to [[annIvf]]'s
    * (same tie order), so the oracle replays training → probes → top-5 →
    * vote end-to-end. A query whose probed clusters hold no other vector
    * casts no vote (the honest ANN behavior; the spec pins conservation
    * against the voted-query count).
    *
    * At 100 TB: the query side is eval-sized and broadcast; the corpus
    * side is touched once via the cluster equi-join, candidates per query
    * bounded by NPROBE × occupancy. */
  def knnLabelVoteIvf(s: SparkSession, d: String): DataFrame = {
    val cents = trainIvfCentroids(s, d)
    val lab = ivfAssigned(s, d)
      .join(embeddings(s, d).select(col("vec_id"), col("label")), "vec_id")
    val simStructs = transform(centroidSims(col("qv"), cents),
      (sim, i) => struct(sim.as("sim"), i.as("cl")))
    val q = lab.filter(col("vec_id") < 200)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"),
        col("label").as("true_label"))
      .withColumn("probes", slice(reverse(array_sort(simStructs)), 1, IVF_NPROBE))
      .select(col("q_id"), col("qv"), col("qn"), col("true_label"),
        explode(col("probes.cl")).as("cluster"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("nn_id"))
    val top5 = q.join(lab, Seq("cluster"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("true_label"), col("vec_id").as("nn_id"), col("label"),
        (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("sim"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
    val wv = Window.partitionBy(col("q_id")).orderBy(col("votes").desc, col("label"))
    top5
      .groupBy(col("q_id"), col("true_label"), col("label"))
      .agg(count(lit(1)).as("votes"))
      .withColumn("vr", row_number().over(wv))
      .filter(col("vr") === 1)
      .groupBy(col("true_label"), col("label").as("predicted"))
      .agg(count(lit(1)).as("n"))
  }

  private val ANN_FILTER_LABEL = 1

  /** Filtered vector search (catalog `x_ann_ivf_filtered`): top-3 cosine
    * among corpus vectors satisfying a metadata predicate (here label =
    * [[ANN_FILTER_LABEL]]), candidates from the probed IVF cells with the
    * predicate applied to the POSTING side before the rerank — the
    * pre-filter strategy. This is the production face of vector search
    * ("neighbors, but only docs in my tenant / language / license
    * bucket"): post-filtering a fixed-k result list starves queries whose
    * neighbors are mostly filtered out, while pre-filtering keeps the
    * top-k drawn entirely from eligible vectors at the price of scanning
    * the probed cells' ineligible rows once (a predicate on a scanned
    * column — free at Parquet speed; at 100 TB the label rides the
    * posting lists as metadata exactly like FAISS's IDSelector). Same
    * probe plan as [[annIvf]]; only the posting side is filtered. */
  def annIvfFiltered(s: SparkSession, d: String): DataFrame = {
    val cents = trainIvfCentroids(s, d)
    val all = ivfAssigned(s, d)
    val filteredIndex = all
      .join(embeddings(s, d).select(col("vec_id"), col("label")), "vec_id")
      .filter(col("label") === ANN_FILTER_LABEL)
    val simStructs = transform(centroidSims(col("qv"), cents),
      (sim, i) => struct(sim.as("sim"), i.as("cl")))
    val q = all.filter(col("vec_id") < 200)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
      .withColumn("probes", slice(reverse(array_sort(simStructs)), 1, IVF_NPROBE))
      .select(col("q_id"), col("qv"), col("qn"), explode(col("probes.cl")).as("cluster"))
    val pairs = q.join(filteredIndex, Seq("cluster"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("nn_id"),
        (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("nn_id"))
    pairs.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("q_id"), col("nn_id"), col("rnk"), col("sim"))
  }

  def annLshRecall(s: SparkSession, d: String): DataFrame =
    recallAgainstExact(annLsh(s, d), exactTop3(s, d, 200))

  def annIvfRecall(s: SparkSession, d: String): DataFrame =
    recallAgainstExact(annIvf(s, d), exactTop3(s, d, 200))

  // ---------------------------------------------------------------------
  // Product quantization (PQ): the memory-bounded ANN scale path. The
  // 64-dim normalized vector is cut into PQ_M = 8 subspaces of 8 dims;
  // each subspace gets its own PQ_K = 16 codebook (per-subspace Lloyd on
  // the shared deterministic train sample, exact DECIMAL means like IVF),
  // and every corpus vector is stored as 8 four-bit codes — 4 bytes
  // instead of 512: the representation that lets a 100 TB corpus' index
  // fit in cluster memory. Queries score by ASYMMETRIC DISTANCE (ADC):
  // the query's exact subvectors dot the centroid each code names, summed
  // in fixed subspace order — so the whole scan is 8 table lookups + adds
  // per candidate, no full-vector arithmetic. Cosine comes out directly
  // because codes are built over norm-1 vectors. Training, encoding, and
  // ADC are all replayed by the DuckDB oracle (same Lloyd seeding/decimal
  // arithmetic contract as [[trainIvfCentroidsUncached]]).
  // ---------------------------------------------------------------------
  private val PQ_M = 8
  private val PQ_SUBDIM = 8
  private val PQ_K = 16
  private val PQ_ITERS = 2

  /** Elementwise v / ||v||: PQ codes quantize the unit sphere, so ADC's
    * inner product IS cosine. Plain IEEE division — oracle-replicable. */
  private def unit(v: Column, nrm: Column): Column = transform(v, x => x / nrm)

  private def unitVectors(s: SparkSession, d: String): DataFrame =
    vectors(s, d).select(col("vec_id"), unit(col("v"), col("nrm")).as("w"))

  /** Nearest sub-centroid of subspace `m`, ties to the lowest code — the
    * same native argmax expression as [[assignCluster]], over the sliced
    * subvector. */
  private def assignSubCluster(w: Column, books: Array[Array[Array[Double]]], m: Int): Column = {
    val sub = slice(w, m * PQ_SUBDIM + 1, PQ_SUBDIM)
    org.apache.spark.sql.graftbridge.nearestCentroid(sub, books(m))
  }

  private val pqBookCache = new SessionCache[Array[Array[Array[Double]]]]()

  /** Per-subspace codebooks `[m][code][subdim]`, trained like the IVF
    * centroids (strided seeds over the corpus, Lloyd on the hash sample,
    * decimal-exact means) but per subspace — ONE assignment+sum job per
    * iteration covers all 8 subspaces at once. */
  private[ops] def trainPqCodebooks(s: SparkSession, d: String): Array[Array[Array[Double]]] =
    cached(pqBookCache, s, d) {
      val nv = unitVectors(s, d)
      val train = nv.filter(
        (col("vec_id") * lit(IVF_TRAIN_MULT) + lit(IVF_TRAIN_ADD)) % lit(IVF_TRAIN_MOD)
          < lit(IVF_TRAIN_KEEP)).persist()
      val n = nv.count()
      val stride = math.max(1L, n / PQ_K)
      val seedIds = (0 until PQ_K).map(i => i * stride)
      val seedRows = nv.filter(col("vec_id").isin(seedIds: _*))
        .orderBy(col("vec_id")).limit(PQ_K)
        .collect().map(_.getSeq[Double](1).toArray)
      // fail fast instead of an index error from the empty-cluster
      // fallback below — a corpus this small has no business being PQ'd
      require(seedRows.length == PQ_K,
        s"PQ needs at least $PQ_K vectors to seed its codebooks; found ${seedRows.length}")
      var books: Array[Array[Array[Double]]] = Array.tabulate(PQ_M)(m =>
        seedRows.map(_.slice(m * PQ_SUBDIM, (m + 1) * PQ_SUBDIM)))
      for (_ <- 1 to PQ_ITERS) {
        val codeCols = (0 until PQ_M).map(m => assignSubCluster(col("w"), books, m).as(s"c$m"))
        val assigned = train.select(col("w") +: codeCols: _*)
        val sums = assigned
          .select(array((0 until PQ_M).map(m => col(s"c$m")): _*).as("cs"),
            posexplode(col("w")).as(Seq("pos", "x")))
          .withColumn("m", (col("pos") / PQ_SUBDIM).cast("int"))
          .withColumn("cl", element_at(col("cs"), col("m") + 1))
          .groupBy(col("m"), col("cl"), col("pos"))
          .agg(sum(col("x").cast(DecimalType(28, 12))).as("sx"), count(lit(1)).as("cn"))
          .collect()
        val byKey = sums.groupBy(r => (r.getInt(0), r.getInt(1)))
        books = Array.tabulate(PQ_M) { m =>
          Array.tabulate(PQ_K) { c =>
            byKey.get((m, c)) match {
              case Some(rows) =>
                val arr = new Array[Double](PQ_SUBDIM)
                rows.foreach(r =>
                  arr(r.getInt(2) - m * PQ_SUBDIM) = r.getDecimal(3).doubleValue / r.getLong(4))
                arr
              case None => books(m)(c) // empty cluster keeps its centroid
            }
          }
        }
      }
      train.unpersist(blocking = false)
      books
    }

  /** Corpus encoded as 8 sub-codes, persisted per directory: x_ann_pq and
    * its recall audit share one encoding pass. At scale this IS the index
    * a deployment materializes — 4 bytes/vector + the 8×16×8 codebook. */
  private val pqCodesCache = new SessionCache[DataFrame]()

  private[ops] def pqCodes(s: SparkSession, d: String): DataFrame =
    cached(pqCodesCache, s, d) {
      val books = trainPqCodebooks(s, d)
      unitVectors(s, d).select(
          col("vec_id") +: (0 until PQ_M).map(m => assignSubCluster(col("w"), books, m).as(s"c$m")): _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  /** ADC top-`k` per query: 8 codebook lookups + a fixed-order sum per
    * candidate row — the PQ scan. Queries keep exact subvectors (the
    * asymmetric side). */
  private[ops] def pqTopK(s: SparkSession, d: String, k: Int): DataFrame = {
    val books = trainPqCodebooks(s, d)
    val codes = pqCodes(s, d)
    // The ADC lookup table, built ONCE per query row before the join: 128
    // entries = dot(query subvector m, codebook m entry c) for every
    // (m, c). Candidates then score with 8 array lookups + adds instead
    // of 8 8-dim dot products — the standard production ADC shape (the
    // table is what FAISS calls precomputed distance tables). Same
    // values bit-for-bit: each dot is computed once instead of once per
    // candidate, and the per-candidate sum keeps the fixed subspace
    // order.
    val adcTab = array((0 until PQ_M).flatMap { m =>
      (0 until PQ_K).map { c =>
        org.apache.spark.sql.graftbridge.dotProduct(
          slice(col("qw"), m * PQ_SUBDIM + 1, PQ_SUBDIM),
          typedLit(books(m)(c).toSeq))
      }
    }: _*)
    val q = unitVectors(s, d).filter(col("vec_id") < 200)
      .select(col("vec_id").as("q_id"), col("w").as("qw"))
      .withColumn("tab", adcTab)
      .select(col("q_id"), col("tab"))
    val sim = (0 until PQ_M).map { m =>
      element_at(col("tab"), lit(m * PQ_K) + col(s"c$m") + 1)
    }.reduceLeft(_ + _)
    val w = Window.partitionBy(col("q_id")).orderBy(col("approx_sim").desc, col("nn_id"))
    broadcast(q).join(codes, col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("nn_id"), sim.as("approx_sim"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** ADC-shortlist size for the exact rerank — the knob trading recall
    * against full-vector reads per query. */
  private val PQ_RERANK = 16

  /** PQ nearest neighbor, production shape: the 4-byte-code ADC scan
    * shortlists PQ_RERANK candidates per query, then ONLY those rows'
    * full vectors are read for an exact cosine rerank — the 100 TB
    * pattern where the corpus index lives in memory as codes and the
    * full-precision vectors stay on cheap storage, touched
    * 16-rows-per-query. (Pure ADC top-1 on THIS corpus — random vectors,
    * near-tied cosines — lands ~11% recall@1: 32-bit codes cannot
    * separate near-ties, which is exactly why the rerank stage exists.) */
  def annPq(s: SparkSession, d: String): DataFrame = {
    val short = pqTopK(s, d, PQ_RERANK).select(col("q_id"), col("nn_id"))
    val all = vectors(s, d)
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("nn_id"))
    short
      .join(all.select(col("vec_id").as("nn_id"), col("v").as("bv"), col("nrm").as("bn")), "nn_id")
      .join(all.select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn")), "q_id")
      .select(col("q_id"), col("nn_id"),
        (dot(col("qv"), col("bv")) / (col("qn") * col("bn"))).as("sim"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("q_id"), col("nn_id"), col("sim"))
  }

  /** PQ recall audit: the reranked top-1 scored against the exact cosine
    * top-3 — measures whether the true neighbor survives into the ADC
    * shortlist. */
  def annPqRecall(s: SparkSession, d: String): DataFrame =
    recallAgainstExact(annPq(s, d), exactTop3(s, d, 200))

  /** IVF-PQ — the two scale paths composed into the production index
    * shape (what FAISS deploys as IVFx,PQy): the IVF coarse quantizer
    * prunes the corpus to NPROBE clusters per query (candidate count ~
    * nprobe/k of the corpus), the 4-byte PQ codes score those candidates
    * by ADC table lookups (no full-vector reads in the scan), and the
    * exact rerank touches full vectors for only the <= PQ_RERANK
    * survivors. At 100 TB this is the memory arithmetic that works:
    * centroids + codebooks broadcast, codes ~ 4 B/vector in memory,
    * full-precision vectors on cold storage touched 16 rows/query. Every
    * stage (probe order, ADC fixed-order sums, rerank ties) keeps the
    * deterministic contracts of its parent operators, so the composition
    * is oracle-exact end-to-end. */
  def annIvfPq(s: SparkSession, d: String): DataFrame =
    ivfPqProbe(s, d, trainIvfCentroids(s, d), trainPqCodebooks(s, d),
      pqCodes(s, d)
        .join(ivfAssigned(s, d).select(col("vec_id"), col("cluster")), "vec_id"))

  /** The probe half of IVF-PQ, parameterized by the three index artifacts
    * (coarse centroids, PQ codebooks, coded+assigned corpus) — the seam
    * between the INDEX BUILD job and the PER-RUN query job. [[annIvfPq]]
    * feeds it the freshly trained artifacts; [[annIvfPqPersisted]] feeds it
    * artifacts round-tripped through parquet, proving the deployment shape
    * (build once, persist, probe many) is bit-identical to build-and-probe
    * in one job. */
  private def ivfPqProbe(s: SparkSession, d: String,
      cents: Array[Array[Double]], books: Array[Array[Array[Double]]],
      codes: DataFrame): DataFrame = {
    val adcTab = array((0 until PQ_M).flatMap { m =>
      (0 until PQ_K).map { c =>
        org.apache.spark.sql.graftbridge.dotProduct(
          slice(col("qw"), m * PQ_SUBDIM + 1, PQ_SUBDIM),
          typedLit(books(m)(c).toSeq))
      }
    }: _*)
    val simStructs = transform(centroidSims(col("qv"), cents),
      (sim, i) => struct(sim.as("sim"), i.as("cl")))
    val q = vectors(s, d).filter(col("vec_id") < 200)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
      .withColumn("qw", transform(col("qv"), x => x / col("qn")))
      .withColumn("tab", adcTab)
      .withColumn("probes", slice(reverse(array_sort(simStructs)), 1, IVF_NPROBE))
      .select(col("q_id"), col("tab"), explode(col("probes.cl")).as("cluster"))
    val adcSim = (0 until PQ_M).map { m =>
      element_at(col("tab"), lit(m * PQ_K) + col(s"c$m") + 1)
    }.reduceLeft(_ + _)
    val wAdc = Window.partitionBy(col("q_id")).orderBy(col("approx_sim").desc, col("nn_id"))
    val short = broadcast(q).join(codes, Seq("cluster"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("nn_id"), adcSim.as("approx_sim"))
      .withColumn("rnk", row_number().over(wAdc))
      .filter(col("rnk") <= PQ_RERANK)
      .select(col("q_id"), col("nn_id"))
    val all = vectors(s, d)
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("nn_id"))
    short
      .join(all.select(col("vec_id").as("nn_id"), col("v").as("bv"), col("nrm").as("bn")), "nn_id")
      .join(all.select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn")), "q_id")
      .select(col("q_id"), col("nn_id"),
        (dot(col("qv"), col("bv")) / (col("qn") * col("bn"))).as("sim"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("q_id"), col("nn_id"), col("sim"))
  }

  /** IVF-PQ recall audit against the exact top-3 — what the probe-prune
    * AND the code quantization jointly cost. */
  def annIvfPqRecall(s: SparkSession, d: String): DataFrame =
    recallAgainstExact(annIvfPq(s, d), exactTop3(s, d, 200))

  /** IVF-PQ probed from PERSISTED index artifacts — the deployment shape
    * every index docstring in this file points at, demonstrated end to
    * end: the BUILD job trains and writes three parquet artifacts
    * (coarse centroids k×64, PQ codebooks 8×16×8, the coded+assigned
    * corpus at ~4 B + 4 B cluster per vector), and the PER-RUN job reads
    * them back and probes WITHOUT retraining or rescanning the corpus —
    * only the rerank touches full vectors, 16 rows per query, exactly as
    * in [[annIvfPq]]. Doubles and ints round-trip parquet bit-exactly, so
    * the output is bit-identical to the build-and-probe-in-one-job entry
    * and shares its oracle verbatim (spec additionally pins result
    * equality and the artifact shapes).
    *
    * At 100 TB this seam is the whole point of the index family: training
    * cost is paid once per index generation, probes are jobs that read
    * broadcast-sized artifacts (centroids + codebooks) plus the code
    * table, and index refresh is a REBUILD into fresh artifact paths —
    * never a mutation the probes could race with. */
  def annIvfPqPersisted(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val work = graft.ops.Scratch.dir("graft_index_persist")
    // BUILD: train, encode, assign — then persist the three artifacts.
    trainIvfCentroids(s, d).zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cl", "cent").write.parquet(s"$work/centroids")
    trainPqCodebooks(s, d).zipWithIndex
      .flatMap { case (book, m) => book.zipWithIndex.map { case (c, ci) => (m, ci, c.toSeq) } }
      .toSeq.toDF("m", "c", "cent").write.parquet(s"$work/codebooks")
    pqCodes(s, d)
      .join(ivfAssigned(s, d).select(col("vec_id"), col("cluster")), "vec_id")
      .write.parquet(s"$work/codes")
    // PROBE: load the artifacts and query — no training state crosses the
    // seam (the loaded arrays are rebuilt from parquet rows alone).
    val centsL = s.read.parquet(s"$work/centroids").collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).map(_._2)
    val booksL = s.read.parquet(s"$work/codebooks").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
      .groupBy(_._1).toArray.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3))
    ivfPqProbe(s, d, centsL, booksL, s.read.parquet(s"$work/codes"))
  }

  /** Hard-negative mining (catalog `x_hard_negatives`): for each query
    * vector, the top-3 most-similar vectors with a DIFFERENT label — the
    * mining step of contrastive/retrieval training (hard negatives are
    * what make the margin informative; random negatives are trivially
    * separable). Same broadcast-the-query-side orientation as
    * [[annBruteforce]]; the label inequality rides the join condition, so
    * same-label pairs are dropped before any scoring. `rank <= 3`
    * compiles to the two-level WindowGroupLimit (partial per-partition
    * top-3 BEFORE the shuffle). At 100 TB the scan side would be an ANN
    * shortlist (LSH/IVF/PQ above) instead of the full corpus — the
    * mining logic is unchanged. */
  def hardNegatives(s: SparkSession, d: String): DataFrame = {
    val all = embeddings(s, d)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"), col("label"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val q = all.filter(col("vec_id") < 100)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"),
        col("label").as("q_label"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("neg_id"))
    broadcast(q).join(all, col("label") =!= col("q_label"))
      .select(col("q_id"), col("q_label"), col("vec_id").as("neg_id"),
        col("label").as("neg_label"),
        (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("sim"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("q_id"), col("q_label"), col("neg_id"), col("neg_label"),
        col("rnk"), col("sim"))
  }

  /** Symmetric per-dimension int8 scalar quantization + exact
    * reconstruction-error audit (catalog `x_embed_int8`): the OTHER
    * memory-bounded embedding representation production systems ship
    * (alongside PQ above) — 1 byte/dim, dequantized as code·s/127.
    * Per-dim scale s = max |x| over the corpus: ONE tiny aggregate (64
    * rows) broadcast back onto the exploded value stream, then one
    * scan-speed pass quantizes and measures. Rounding is
    * floor(x/s·127 + 0.5) — identical IEEE arithmetic in any engine
    * (`round()` half-away/half-even semantics differ across engines;
    * floor does not). The audit reports, per label: vectors, saturated
    * codes (|code| = 127 — exactly the per-dim max elements under
    * symmetric scaling), and total/max absolute reconstruction error —
    * the total as an exact DECIMAL sum of per-element doubles, so the
    * number is order-free and oracle-replicable bit-for-bit. */
  def embedInt8Audit(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
      .select(col("vec_id"), col("label"),
        posexplode(asDouble(col("embedding"))).as(Seq("dim", "x")))
    val scales = e.groupBy(col("dim")).agg(max(abs(col("x"))).as("s"))
    val q = e.join(broadcast(scales), "dim")
      .withColumn("code",
        when(col("s") === 0, 0L)
          .otherwise(floor(col("x") / col("s") * 127 + 0.5)).cast("int"))
      .withColumn("err", abs(col("x") - col("code") * col("s") / 127))
    // n_vecs rides the same aggregate: every non-empty vector contributes
    // exactly one dim-0 row, so counting those avoids a third full scan
    // of the embeddings table (+ a join) just for the denominator.
    q.groupBy(col("label")).agg(
      sum(when(col("dim") === 0, 1).otherwise(0)).cast("long").as("n_vecs"),
      sum(when(abs(col("code")) === 127, 1).otherwise(0)).as("sat_codes"),
      sum(col("err").cast(DecimalType(28, 12))).cast("double").as("total_abs_err"),
      max(col("err")).as("max_abs_err"))
      .select(col("label"), col("n_vecs"), col("sat_codes"),
        col("total_abs_err"), col("max_abs_err"))
  }

  /** Embedding-hygiene audit (catalog `x_embed_outliers`): the QA pass a
    * pipeline runs over a fresh embedding batch before indexing it —
    * per label: vector count, wrong-dimension vectors, exact-zero
    * vectors, and out-of-band norms (norm² outside [0.81, 1.21], i.e.
    * norm outside [0.9, 1.1] — embedding services contract unit norms,
    * and a drifting encoder shows up here first). Norm² is the same
    * strict-left-fold [[dot]] the ANN family scores with, so the
    * threshold comparisons are bit-identical in the oracle; the corpus
    * norm mass rides along as an exact DECIMAL sum (order-free, like the
    * int8 audit's error total). One scan, one bounded aggregate — no
    * shuffle beyond the per-label rollup. */
  def embedOutliers(s: SparkSession, d: String): DataFrame = {
    val n2s = embeddings(s, d)
      .select(col("label"),
        size(col("embedding")).as("dims"),
        dot(asDouble(col("embedding")), asDouble(col("embedding"))).as("n2"))
    n2s.groupBy(col("label")).agg(
      count(lit(1)).as("n_vecs"),
      sum(when(col("dims") =!= 64, 1L).otherwise(0L)).as("n_bad_dim"),
      sum(when(col("n2") === 0.0, 1L).otherwise(0L)).as("n_zero"),
      sum(when(col("n2") > 0.0 && col("n2") < 0.81, 1L).otherwise(0L)).as("n_low_norm"),
      sum(when(col("n2") > 1.21, 1L).otherwise(0L)).as("n_high_norm"),
      sum(col("n2").cast(DecimalType(28, 12))).cast("double").as("sum_sq"))
  }

  /** Per-dimension whitening audit (catalog `x_embed_whiten`) — the
    * standardization pass embedding pipelines run before distance-based
    * indexing when dimensions carry unequal scales (z-score per dim:
    * w = (x − mean)/std). Stats come from floor-quantized INTEGER sums
    * (ppb for x, ppt for x² — exact 64-bit arithmetic, order-free, so
    * the oracle replays them bit-for-bit; a double→DECIMAL cast here hit
    * engine rounding-mode knife-edges at the 12th digit, the same defect
    * class the r11 medoid ppm fix closed), cast to double ONCE for the
    * mean/variance; the per-element whiten is then identical IEEE
    * arithmetic in any engine. Output per dim is ALL INTEGRAL (§8.4
    * new-entry rule): ppb-quantized pre-stats plus floor-quantized post
    * sums — Σ⌊w·10⁶⌋ ≈ 0 (within the ≤n floor bias) and Σ⌊w²·10⁶⌋ ≈
    * n·10⁶, so the gate verifies the TRANSFORM, not a summary. Plan:
    * one explode, a dims-sized stats aggregate broadcast back, one
    * scan-speed whiten pass — the int8-audit shape. */
  def embedWhiten(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
      .select(col("vec_id"), posexplode(asDouble(col("embedding"))).as(Seq("dim", "x")))
    val st = e.groupBy(col("dim")).agg(
      count(lit(1)).as("n"),
      sum(floor(col("x") * lit(1e9)).cast("long")).as("sx9"),
      sum(floor(col("x") * col("x") * lit(1e12)).cast("long")).as("sxx12"))
    val mean = (col("sx9").cast("double") / lit(1e9)) / col("n")
    val variance = (col("sxx12").cast("double") / lit(1e12)) / col("n") -
      ((col("sx9").cast("double") / lit(1e9)) / col("n")) *
      ((col("sx9").cast("double") / lit(1e9)) / col("n"))
    val ms = st.select(col("dim"), col("n"),
      mean.as("mean"), variance.as("variance"))
    e.join(broadcast(ms), "dim")
      .withColumn("w", when(col("variance") <= 0, lit(0.0))
        .otherwise((col("x") - col("mean")) / sqrt(col("variance"))))
      .groupBy(col("dim"), col("n"), col("mean"), col("variance"))
      .agg(
        sum(floor(col("w") * lit(1e6)).cast("long")).as("post_sum_w_ppm"),
        sum(floor(col("w") * col("w") * lit(1e6)).cast("long")).as("post_sum_w2_ppm"))
      .select(col("dim"), col("n"),
        floor(col("mean") * lit(1e9)).cast("long").as("mean_ppb"),
        floor(col("variance") * lit(1e9)).cast("long").as("var_ppb"),
        col("post_sum_w_ppm"), col("post_sum_w2_ppm"))
      .orderBy(col("dim"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_embed_whiten" -> (embedWhiten _),
    "x_ann_bruteforce" -> (annBruteforce _),
    "x_ann_beam" -> (annBeam _),
    "x_ann_beam_recall" -> (annBeamRecall _),
    "x_hard_negatives" -> (hardNegatives _),
    "x_embed_int8" -> (embedInt8Audit _),
    "x_embed_outliers" -> (embedOutliers _),
    "x_ann_lsh" -> (annLsh _),
    "x_ann_ivf" -> (annIvf _),
    "x_ann_ivf_filtered" -> (annIvfFiltered _),
    "x_ann_lsh_recall" -> (annLshRecall _),
    "x_ann_ivf_recall" -> (annIvfRecall _),
    "x_ann_pq" -> (annPq _),
    "x_ann_pq_recall" -> (annPqRecall _),
    "x_dedup_embedding" -> (dedupEmbedding _),
    "x_dedup_semantic" -> ((s: SparkSession, d: String) =>
      dedupSemantic(s, d, maxVecId = Some(SEM_PIN_MAX_ID))),
    "x_dedup_semantic_fine" -> ((s: SparkSession, d: String) =>
      dedupSemantic(s, d, SEM_FINE_K, maxVecId = Some(SEM_PIN_MAX_ID))),
    "x_dedup_semantic_auto" -> ((s: SparkSession, d: String) =>
      dedupSemanticAuto(s, d, AUTO_DEMO_OCCUPANCY)),
    "x_dedup_semantic_incremental" -> ((s: SparkSession, d: String) =>
      dedupSemanticIncremental(s, d, AUTO_DEMO_OCCUPANCY)),
    "x_stream_semantic_incremental" -> ((s: SparkSession, d: String) =>
      dedupSemanticStreamIncremental(s, d, AUTO_DEMO_OCCUPANCY)),
    "x_stream_semantic_compacted" -> ((s: SparkSession, d: String) =>
      dedupSemanticStreamCompacted(s, d, AUTO_DEMO_OCCUPANCY)),
    "x_stream_semantic_tiered" -> ((s: SparkSession, d: String) =>
      dedupSemanticStreamTiered(s, d, AUTO_DEMO_OCCUPANCY)),
    "x_stream_semantic_manifest" -> ((s: SparkSession, d: String) =>
      dedupSemanticStreamManifest(s, d, AUTO_DEMO_OCCUPANCY)),
    "x_dedup_ensemble" -> ((s: SparkSession, d: String) =>
      dedupEnsemble(s, d, AUTO_DEMO_OCCUPANCY)),
    "x_decontam_semantic" -> ((s: SparkSession, d: String) =>
      decontamSemantic(s, d, AUTO_DEMO_OCCUPANCY)),
    "x_dedup_semantic_2level" -> (dedupSemantic2Level _),
    "x_knn_label_vote" -> (knnLabelVote _),
    "x_knn_vote_ivf" -> (knnLabelVoteIvf _),
    "x_cluster_medoids" -> (clusterMedoids _),
    "x_ann_matryoshka" -> (annMatryoshka _),
    "x_ann_matryoshka_recall" -> (annMatryoshkaRecall _),
    "x_embed_binary" -> (embedBinaryAudit _),
    "x_ann_hamming" -> (annHamming _),
    "x_ann_hamming_recall" -> (annHammingRecall _),
    "x_ann_ivfpq" -> (annIvfPq _),
    "x_ann_ivfpq_recall" -> (annIvfPqRecall _),
    "x_ann_ivfpq_persisted" -> (annIvfPqPersisted _)
  )

  // ---- DuckDB oracle twins -------------------------------------------------
  // Every query here is now EXACTLY replicable in SQL: the hyperplane
  // weights are deterministic Scala doubles inlined as literals, and the IVF
  // training loop (deterministic seeds + 3 Lloyd iterations with exact
  // decimal centroid sums) is unrolled into CTEs. Dot products are strict
  // left folds in both engines (graftbridge.DotProduct ≡ list_dot_product),
  // which is what makes float equality — and therefore bucket/cluster
  // membership and final hashes — line up bit-for-bit.

  private def baseCtes: String =
    """t AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |n AS MATERIALIZED (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM t)""".stripMargin

  /** Shared CTEs of the beam-walk oracles: the panel, its exact directed
    * top-3 graph (same text as the x_graph_knn_stats oracle), the query
    * set, the LSH-seeded + fixed-entry seed set, and the seeded frontier
    * `f0` (ranked, rnk <= BEAM_W). The bucket arms are the SAME generated
    * sign-bit assembly the x_ann_lsh oracle uses, so the seed set is
    * bit-identical to the Spark side's bucket join. */
  private def beamCtes: String =
    s"""pan AS MATERIALIZED (SELECT vec_id, v, nrm FROM n WHERE vec_id < ${GraphOps.KNN_PANEL}),
       |ptop3 AS MATERIALIZED (SELECT a_id, b_id FROM (
       |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       |         row_number() OVER (PARTITION BY a.vec_id
       |           ORDER BY list_dot_product(a.v, b.v) / (a.nrm * b.nrm) DESC, b.vec_id) AS rnk
       |  FROM pan a, pan b WHERE b.vec_id <> a.vec_id)
       |  WHERE rnk <= 3),
       |qs AS (SELECT vec_id, v, nrm FROM n WHERE vec_id % $BEAM_QMOD = 3),
       |bbk AS (
       |${bucketArmsSql(planeWeights(64), LSH_TABLES, LSH_BITS)}),
       |seeds AS (SELECT q.vec_id AS q_id, b.vec_id AS c_id
       |          FROM bbk a JOIN qs q ON q.vec_id = a.vec_id
       |               JOIN bbk b ON b.tbl = a.tbl AND b.bucket = a.bucket
       |          WHERE b.vec_id <> q.vec_id AND b.vec_id < ${GraphOps.KNN_PANEL}
       |          UNION
       |          SELECT q.vec_id, p.vec_id FROM qs q, pan p
       |          WHERE p.vec_id < $BEAM_SEEDS AND p.vec_id <> q.vec_id),
       |f0 AS (SELECT q_id, c_id, sim,
       |              CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS INTEGER) AS rnk
       |       FROM (SELECT s.q_id, s.c_id,
       |                    list_dot_product(q.v, p.v) / (q.nrm * p.nrm) AS sim
       |             FROM seeds s JOIN pan p ON p.vec_id = s.c_id
       |                  JOIN qs q ON q.vec_id = s.q_id)
       |       QUALIFY rnk <= $BEAM_W)""".stripMargin

  /** One beam hop as CTE text: expand `prev`'s frontier through the
    * directed top-3 edges (UNION dedups, mirroring Spark's distinct),
    * rescore against the query, keep the best BEAM_W. */
  private def beamHop(prev: String, cur: String): String =
    s"""${cur}c AS (SELECT q_id, c_id FROM $prev
       |           UNION
       |           SELECT f.q_id, t.b_id AS c_id FROM $prev f JOIN ptop3 t ON t.a_id = f.c_id),
       |$cur AS (SELECT q_id, c_id, sim,
       |                CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS INTEGER) AS rnk
       |         FROM (SELECT c.q_id, c.c_id,
       |                      list_dot_product(q.v, p.v) / (q.nrm * p.nrm) AS sim
       |               FROM ${cur}c c JOIN pan p ON p.vec_id = c.c_id
       |                    JOIN qs q ON q.vec_id = c.q_id
       |               WHERE c.c_id <> c.q_id)
       |         QUALIFY rnk <= $BEAM_W)""".stripMargin

  private def beamWalkCtes: String =
    s"""$beamCtes,
       |${(1 to BEAM_HOPS).map(i => beamHop(s"f${i - 1}", s"f$i")).mkString(",\n")}""".stripMargin

  /** One UNION ALL arm per hash table: the same sign-bit bucket assembly
    * the [[org.apache.spark.sql.graftbridge.LshBuckets]] expression runs,
    * with the quantized plane weights inlined as list literals. */
  private def bucketArmsSql(planes: Array[Array[Double]], tables: Int, bits: Int): String =
    (0 until tables).map { l =>
      val terms = (0 until bits).map { j =>
        val arr = planes(l * bits + j).map(w => f"$w%.6f").mkString("[", ",", "]")
        s"(CASE WHEN list_dot_product(v, $arr) > 0 THEN ${1L << j} ELSE 0 END)"
      }.mkString("\n     + ")
      s"SELECT vec_id, $l AS tbl,\n       $terms AS bucket FROM n"
    }.mkString("\nUNION ALL\n")

  private def lshCtes: String = {
    val arms = bucketArmsSql(planeWeights(64), LSH_TABLES, LSH_BITS)
    s"""$baseCtes,
       |bk AS (
       |$arms),
       |cand AS (SELECT DISTINCT a.vec_id AS q_id, b.vec_id AS nn_id
       |         FROM bk a JOIN bk b
       |           ON a.tbl = b.tbl AND a.bucket = b.bucket AND b.vec_id <> a.vec_id
       |         WHERE a.vec_id < 200),
       |lsh AS (
       |  SELECT q_id, nn_id, sim FROM (
       |    SELECT c.q_id, c.nn_id,
       |           list_dot_product(qa.v, qb.v) / (qa.nrm * qb.nrm) AS sim,
       |           row_number() OVER (PARTITION BY c.q_id
       |             ORDER BY list_dot_product(qa.v, qb.v) / (qa.nrm * qb.nrm) DESC, c.nn_id) AS rnk
       |    FROM cand c JOIN n qa ON qa.vec_id = c.q_id JOIN n qb ON qb.vec_id = c.nn_id)
       |  WHERE rnk = 1)""".stripMargin
  }

  /** Unrolled Lloyd loop: c0 = strided seeds, a{t} = argmax-sim assignment
    * (ties to the lowest cluster id, like array_position), c{t} = exact
    * DECIMAL(28,12) per-dimension sums cast to double THEN divided — the
    * same arithmetic trainIvfCentroids performs. Training iterations read
    * the SAME deterministic LCG hash-sample (`ts`) the Spark trainer reads;
    * the final assignment covers the full corpus. Empty clusters keep
    * their previous centroid. */
  /** Training + full-corpus assignment prefix of [[ivfCtes]], ending at
    * `af(vec_id, v, nrm, cl)` — shared by the ANN probe path and the
    * semantic dedup oracle. */
  private def ivfAssignCtes: String = ivfAssignCtes(IVF_K)

  /** The semantic-dedup oracle at cluster count `k`: the SAME SQL text
    * modulo the Lloyd literals — both the default and the fine family are
    * replayed end-to-end. */
  private def semanticOracleSql(k: Int, maxVecId: Option[Long] = None): String =
    semanticOracleSqlExpr(k.toString, "", maxVecId)

  /** The AUTO-k semantic oracle: instead of smuggling the trained k out of
    * the Spark session, the DuckDB twin derives it from the SAME count
    * probe and sizing law ([[dedupSemanticAuto]]: max(IVF_K,
    * ceil(n/occupancy)) as integer arithmetic) in a scalar `kk` CTE — the
    * SQL text is deterministic for any corpus directory, so a parallel
    * Verify, a multi-directory session, or a dump-before-construct path
    * all emit the correct oracle. */
  private def semanticOracleSqlAuto(occupancy: Long): String =
    semanticOracleSqlExpr("(SELECT k FROM kk)",
      s"""kk AS (SELECT greatest($IVF_K,
         |  CAST((count(*) + ${occupancy - 1}) // $occupancy AS INT)) AS k FROM n),
         |""".stripMargin,
      None)

  /** The two-level oracle: the coarse phase reuses the expression-k
    * unrolled-Lloyd machinery verbatim (side length derived in the `kk`
    * CTE by the same sqrt-of-ceil law [[twoLevelK]] computes), then the
    * fine phase replays the grouped Lloyd — per-cell strided seeds with
    * coarse-centroid fallback, [[L2_FINE_ITERS]] unrolled
    * assign/recompute rounds restricted to each row's own cell, exact
    * DECIMAL(28,12) means, empty cells keeping their previous centroid —
    * and finally the full-corpus composite assignment and the SemDeDup
    * pair selection, all in one statement.
    *
    * Every multiply-referenced CTE is `AS MATERIALIZED`: DuckDB inlines
    * plain CTEs per reference, and this statement references the coarse
    * chain from four places and each fine round from three — inlining
    * compounds MULTIPLICATIVELY through the unrolled rounds (the first
    * draft ran >17 min of DuckDB CPU at sf0.01; materialized it is
    * seconds). `cn`/`afm` snapshot the shared coarse-Lloyd chain once so
    * no downstream reference re-expands it. */
  private def semantic2LevelOracleSql(occupancy: Long): String = {
    val kE = "(SELECT k FROM kk)"
    val kk =
      s"""kk AS MATERIALIZED (SELECT greatest(2,
         |  CAST(ceil(sqrt((count(*) + ${occupancy - 1}) // $occupancy)) AS INT)) AS k FROM n),
         |""".stripMargin
    val fineIters = (1 to L2_FINE_ITERS).map { i =>
      s"""fa$i AS MATERIALIZED (SELECT vec_id, v, c1, c2 FROM (
         |  SELECT t.vec_id, t.v, t.c1, f.c2,
         |         row_number() OVER (PARTITION BY t.vec_id
         |           ORDER BY list_dot_product(t.v, f.cent) DESC, f.c2) AS rn
         |  FROM tsa t JOIN f${i - 1} f ON f.c1 = t.c1) WHERE rn = 1),
         |f$i AS MATERIALIZED (
         |  SELECT c1, c2, list(cv ORDER BY pos) AS cent FROM (
         |    SELECT c1, c2, pos.p AS pos,
         |           CAST(SUM(CAST(v[pos.p] AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS cv
         |    FROM fa$i, (SELECT unnest(range(1,65)) AS p) pos
         |    GROUP BY c1, c2, pos.p) GROUP BY c1, c2
         |  UNION ALL
         |  SELECT f.c1, f.c2, f.cent FROM f${i - 1} f
         |  WHERE NOT EXISTS (SELECT 1 FROM fa$i a WHERE a.c1 = f.c1 AND a.c2 = f.c2))"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH ${ivfAssignCtes(kE, kk)},
       |cn AS MATERIALIZED (SELECT cl, cent FROM c$IVF_ITERS),
       |afm AS MATERIALIZED (SELECT vec_id, v, nrm, cl FROM af),
       |tsa AS MATERIALIZED (SELECT vec_id, v, c1 FROM (
       |  SELECT n.vec_id, n.v, c.cl AS c1,
       |         row_number() OVER (PARTITION BY n.vec_id
       |           ORDER BY list_dot_product(n.v, c.cent) DESC, c.cl) AS rn
       |  FROM ts n, cn c) WHERE rn = 1),
       |tsr AS (SELECT vec_id, v, c1,
       |         row_number() OVER (PARTITION BY c1 ORDER BY vec_id) - 1 AS rn,
       |         count(*) OVER (PARTITION BY c1) AS cnt FROM tsa),
       |fseed AS (SELECT c1, CAST(rn // greatest(1, cnt // $kE) AS INT) AS c2, v AS cent
       |          FROM tsr WHERE rn % greatest(1, cnt // $kE) = 0
       |            AND rn // greatest(1, cnt // $kE) < $kE),
       |slots AS (SELECT c.cl AS c1, j.j AS c2
       |          FROM cn c, (SELECT unnest(range(0,$kE)) AS j) j),
       |f0 AS MATERIALIZED (SELECT s.c1, CAST(s.c2 AS INT) AS c2, COALESCE(fs.cent, cc.cent) AS cent
       |       FROM slots s
       |       LEFT JOIN fseed fs ON fs.c1 = s.c1 AND fs.c2 = s.c2
       |       JOIN cn cc ON cc.cl = s.c1),
       |$fineIters,
       |vaf AS MATERIALIZED (SELECT vec_id, v, nrm, c1, c2 FROM (
       |  SELECT a.vec_id, a.v, a.nrm, a.cl AS c1, f.c2,
       |         row_number() OVER (PARTITION BY a.vec_id
       |           ORDER BY list_dot_product(a.v, f.cent) DESC, f.c2) AS rn
       |  FROM afm a JOIN f$L2_FINE_ITERS f ON f.c1 = a.cl) WHERE rn = 1),
       |sp AS (
       |  SELECT a.vec_id, a.c1, a.c2, b.vec_id AS dup_of,
       |         list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos
       |  FROM vaf a JOIN vaf b ON b.c1 = a.c1 AND b.c2 = a.c2 AND b.vec_id < a.vec_id
       |  WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= $SEM_TAU)
       |SELECT vec_id, CAST(c1 AS INTEGER) AS c1, CAST(c2 AS INTEGER) AS c2, dup_of, cos FROM (
       |  SELECT vec_id, c1, c2, dup_of, cos,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY dup_of) AS rnk
       |  FROM sp)
       |WHERE rnk = 1""".stripMargin
  }

  /** The incremental-probe oracle: the SAME auto-k `kk` count probe and
    * unrolled-Lloyd assignment chain as [[semanticOracleSqlAuto]], then the
    * asymmetric delta(odd)-vs-index(even) cluster-bucketed threshold join
    * and the canonical-match aggregate — all-integral output per the §8.4
    * new-entry rule (the cosine lives only inside the predicate, a
    * class-B per-row raw-vector fold in both engines). */
  private def semanticIncrementalOracleSql(occupancy: Long): String = {
    val kk =
      s"""kk AS (SELECT greatest($IVF_K,
         |  CAST((count(*) + ${occupancy - 1}) // $occupancy AS INT)) AS k FROM n),
         |""".stripMargin
    s"""WITH ${ivfAssignCtes("(SELECT k FROM kk)", kk)},
       |m AS (
       |  SELECT a.vec_id AS vec_id, a.cl AS cluster, b.vec_id AS match_vec
       |  FROM af a JOIN af b ON b.cl = a.cl
       |    AND a.vec_id % 2 = 1 AND b.vec_id % 2 = 0
       |  WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= $SEM_TAU)
       |SELECT vec_id, CAST(cluster AS INTEGER) AS cluster,
       |       min(match_vec) AS match_id, CAST(count(*) AS BIGINT) AS n_matches
       |FROM m GROUP BY vec_id, cluster""".stripMargin
  }

  /** The streaming parity entry's oracle: the ONE-SHOT same-cluster τ-pair
    * set (undirected, `vec_a < vec_b`) over the same auto-k assignment
    * chain — the parity theorem says the stream's self ∪ probe union must
    * equal exactly this, so the oracle IS the theorem's right-hand side. */
  private def semanticStreamOracleSql(occupancy: Long): String = {
    val kk =
      s"""kk AS (SELECT greatest($IVF_K,
         |  CAST((count(*) + ${occupancy - 1}) // $occupancy AS INT)) AS k FROM n),
         |""".stripMargin
    s"""WITH ${ivfAssignCtes("(SELECT k FROM kk)", kk)},
       |m AS (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.cl AS cluster
       |  FROM af a JOIN af b ON b.cl = a.cl AND a.vec_id < b.vec_id
       |  WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= $SEM_TAU)
       |SELECT vec_a, vec_b, CAST(cluster AS INTEGER) AS cluster FROM m""".stripMargin
  }

  /** The semantic-decontam oracle: same assignment chain, asymmetric
    * eval-vs-corpus threshold join inside the shared cluster. */
  private def decontamSemanticOracleSql(occupancy: Long): String = {
    val kk =
      s"""kk AS (SELECT greatest($IVF_K,
         |  CAST((count(*) + ${occupancy - 1}) // $occupancy AS INT)) AS k FROM n),
         |""".stripMargin
    s"""WITH ${ivfAssignCtes("(SELECT k FROM kk)", kk)},
       |m AS (
       |  SELECT a.vec_id AS vec_id, b.vec_id AS eval_vec
       |  FROM af a JOIN af b ON b.cl = a.cl
       |    AND a.vec_id >= $SEM_EVAL_MAX AND b.vec_id < $SEM_EVAL_MAX
       |  WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= $SEM_TAU)
       |SELECT vec_id, CAST(count(*) AS BIGINT) AS n_eval_hits,
       |       min(eval_vec) AS eval_id
       |FROM m GROUP BY vec_id""".stripMargin
  }

  /** The ensemble oracle: the minhash candidate chain and the semantic
    * assignment chain spliced into ONE WITH clause (disjoint CTE name
    * spaces by construction), FULL JOINed on the canonical pair key. */
  private def ensembleOracleSql(occupancy: Long): String = {
    val kk =
      s"""kk AS (SELECT greatest($IVF_K,
         |  CAST((count(*) + ${occupancy - 1}) // $occupancy AS INT)) AS k FROM n),
         |""".stripMargin
    s"""WITH ${Dedup.minhashCtes()},
       |${ivfAssignCtes("(SELECT k FROM kk)", kk)},
       |sp AS (
       |  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
       |  FROM af a JOIN af b ON b.cl = a.cl AND a.vec_id < b.vec_id
       |  WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= $SEM_TAU)
       |SELECT COALESCE(c.doc_a, sp.doc_a) AS doc_a,
       |       COALESCE(c.doc_b, sp.doc_b) AS doc_b,
       |       CAST(CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END AS INTEGER) AS via_lexical,
       |       CAST(CASE WHEN sp.doc_a IS NOT NULL THEN 1 ELSE 0 END AS INTEGER) AS via_semantic
       |FROM cand c FULL JOIN sp ON c.doc_a = sp.doc_a AND c.doc_b = sp.doc_b""".stripMargin
  }

  private def semanticOracleSqlExpr(kExpr: String, preCtes: String,
      maxVecId: Option[Long]): String = {
    val bound = maxVecId.map(m => s" AND a.vec_id < $m AND b.vec_id < $m").getOrElse("")
    s"""WITH ${ivfAssignCtes(kExpr, preCtes)},
       |sp AS (
       |  SELECT a.vec_id AS vec_id, a.cl AS cluster, b.vec_id AS dup_of,
       |         list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos
       |  FROM af a JOIN af b ON b.cl = a.cl AND b.vec_id < a.vec_id$bound
       |  WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= $SEM_TAU)
       |SELECT vec_id, CAST(cluster AS INTEGER) AS cluster, dup_of, cos FROM (
       |  SELECT vec_id, cluster, dup_of, cos,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY dup_of) AS rnk
       |  FROM sp)
       |WHERE rnk = 1""".stripMargin
  }

  private def ivfAssignCtes(k: Int): String = ivfAssignCtes(k.toString, "")

  /** `kExpr` is any scalar SQL expression — an integer literal for the
    * fixed families, a scalar subquery over a `preCtes`-defined relation
    * for the auto entry. `preCtes` is spliced after the base CTEs (so it
    * may reference `n`) and must end with ",\n" when non-empty.
    *
    * Every multiply-referenced CTE is `AS MATERIALIZED` (same fix as the
    * two-level oracle): DuckDB inlines plain CTEs, so the unrolled Lloyd
    * chain — each `c$i` referencing `a$i` twice and `c${i-1}` twice —
    * re-evaluates earlier rounds multiplicatively. At the auto entry's
    * sf1 point (k=800) the inlined form exhausted >76 GB of DuckDB temp
    * before failing; materialized it completes in seconds. */
  private def ivfAssignCtes(kExpr: String, preCtes: String): String = {
    def assign(cPrev: String, aName: String, extra: String = "", from: String = "n") =
      s"""$aName AS MATERIALIZED (SELECT vec_id, v,$extra cl FROM (
         |  SELECT n.vec_id, n.v,$extra c.cl,
         |         row_number() OVER (PARTITION BY n.vec_id
         |           ORDER BY list_dot_product(n.v, c.cent) DESC, c.cl) AS rn
         |  FROM $from n, $cPrev c) WHERE rn = 1)""".stripMargin
    def recompute(aName: String, cPrev: String, cName: String) =
      s"""$cName AS MATERIALIZED (
         |  SELECT cl, list(cv ORDER BY pos) AS cent FROM (
         |    SELECT cl, pos.p AS pos,
         |           CAST(SUM(CAST(v[pos.p] AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS cv
         |    FROM $aName, (SELECT unnest(range(1,65)) AS p) pos
         |    GROUP BY cl, pos.p) GROUP BY cl
         |  UNION ALL
         |  SELECT cl, cent FROM $cPrev WHERE cl NOT IN (SELECT DISTINCT cl FROM $aName))""".stripMargin
    val iters = (1 to IVF_ITERS).map { i =>
      assign(s"c${i - 1}", s"a$i", from = "ts") + ",\n" +
        recompute(s"a$i", s"c${i - 1}", s"c$i")
    }.mkString(",\n")
    s"""$baseCtes,
       |${preCtes}ts AS MATERIALIZED (SELECT vec_id, v FROM n
       |       WHERE (vec_id * $IVF_TRAIN_MULT + $IVF_TRAIN_ADD) % $IVF_TRAIN_MOD < $IVF_TRAIN_KEEP),
       |c0 AS MATERIALIZED (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cl, v AS cent
       |       FROM n WHERE vec_id IN (
       |         SELECT i.i * (SELECT greatest(1, count(*) // ($kExpr)) FROM n)
       |         FROM (SELECT unnest(range(0,($kExpr))) AS i) i)
       |       ORDER BY vec_id LIMIT ($kExpr)),
       |$iters,
       |${assign(s"c$IVF_ITERS", "af", " nrm,")}""".stripMargin
  }

  private def ivfCtes: String = {
    s"""$ivfAssignCtes,
       |pr AS (SELECT q_id, cl AS cluster FROM (
       |    SELECT n.vec_id AS q_id, c.cl,
       |           row_number() OVER (PARTITION BY n.vec_id
       |             ORDER BY list_dot_product(n.v, c.cent) DESC, c.cl DESC) AS rn
       |    FROM n, c$IVF_ITERS c WHERE n.vec_id < 200) WHERE rn <= $IVF_NPROBE),
       |ivf AS (SELECT q_id, nn_id, sim FROM (
       |    SELECT p.q_id, b.vec_id AS nn_id,
       |           list_dot_product(q.v, b.v) / (q.nrm * b.nrm) AS sim,
       |           row_number() OVER (PARTITION BY p.q_id
       |             ORDER BY list_dot_product(q.v, b.v) / (q.nrm * b.nrm) DESC, b.vec_id) AS rnk
       |    FROM pr p JOIN n q ON q.vec_id = p.q_id
       |              JOIN af b ON b.cl = p.cluster AND b.vec_id <> p.q_id)
       |  WHERE rnk = 1)""".stripMargin
  }

  /** Exact top-3 CTE over the first 200 queries (depends on CTE `n`). */
  private def exactTop3Cte: String =
    """ex AS (
      |  SELECT q_id, nn_id, rnk FROM (
      |    SELECT a.vec_id AS q_id, b.vec_id AS nn_id,
      |           row_number() OVER (PARTITION BY a.vec_id
      |             ORDER BY list_dot_product(a.v, b.v) / (a.nrm * b.nrm) DESC, b.vec_id) AS rnk
      |    FROM n a, n b WHERE a.vec_id < 200 AND b.vec_id <> a.vec_id)
      |  WHERE rnk <= 3)""".stripMargin

  /** The truncated-shortlist + full-rerank pipeline as CTEs: `v[1:16]` is
    * the same prefix `slice` takes, and both engines left-fold the dot
    * products, so the coarse ordering — and with it the shortlist cut —
    * is bit-identical. */
  private def matryoshkaCtes: String =
    s"""$baseCtes,
       |tt AS (SELECT vec_id, v[1:$MAT_DIM] AS vt,
       |              sqrt(list_dot_product(v[1:$MAT_DIM], v[1:$MAT_DIM])) AS nt
       |       FROM n),
       |sp AS (SELECT a.vec_id AS q_id, b.vec_id AS nn_id,
       |              list_dot_product(a.vt, b.vt) / (a.nt * b.nt) AS tsim
       |       FROM tt a, tt b WHERE a.vec_id < 50 AND b.vec_id <> a.vec_id),
       |sl AS (SELECT q_id, nn_id FROM (
       |         SELECT q_id, nn_id,
       |                row_number() OVER (PARTITION BY q_id ORDER BY tsim DESC, nn_id) AS trnk
       |         FROM sp)
       |       WHERE trnk <= $MAT_SHORTLIST),
       |mr AS (SELECT sl.q_id, sl.nn_id,
       |              list_dot_product(qa.v, qb.v) / (qa.nrm * qb.nrm) AS sim
       |       FROM sl JOIN n qa ON sl.q_id = qa.vec_id
       |               JOIN n qb ON sl.nn_id = qb.vec_id),
       |mat AS (SELECT q_id, nn_id, rnk, sim FROM (
       |          SELECT q_id, nn_id, sim,
       |                 CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, nn_id) AS INTEGER) AS rnk
       |          FROM mr)
       |        WHERE rnk <= 3)""".stripMargin

  private def recallSelect(sketchCte: String): String =
    s"""SELECT count(*) AS n_results,
       |       CAST(SUM(CASE WHEN rnk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_top1,
       |       CAST(SUM(CASE WHEN rnk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_top3
       |FROM $sketchCte LEFT JOIN ex USING (q_id, nn_id)""".stripMargin

  /** Static twins plus the auto-k semantic entry, whose oracle DERIVES k
    * from the same count probe and sizing law the Spark construction runs
    * ([[semanticOracleSqlAuto]]) — deterministic SQL text, no shared
    * driver state, so the data-driven production path is replayed
    * end-to-end for any directory. */
  def oracleSql: Map[String, String] =
    staticOracleSql +
      ("x_dedup_semantic_auto" -> semanticOracleSqlAuto(AUTO_DEMO_OCCUPANCY)) +
      ("x_dedup_semantic_incremental" ->
        semanticIncrementalOracleSql(AUTO_DEMO_OCCUPANCY)) +
      ("x_stream_semantic_incremental" ->
        semanticStreamOracleSql(AUTO_DEMO_OCCUPANCY)) +
      // The parity theorem across the compaction boundary: any slicing of
      // the corpus (including a stop-compact-resume window in the middle)
      // accumulates exactly the one-shot same-cluster τ-pair set, so the
      // compacted entry's oracle IS the incremental entry's oracle.
      ("x_stream_semantic_compacted" ->
        semanticStreamOracleSql(AUTO_DEMO_OCCUPANCY)) +
      // ...and across the threshold-gated maintenance schedule: a no-op
      // below-threshold window and an at-threshold fold both preserve
      // index content, so the one-shot pair set is still the oracle.
      ("x_stream_semantic_tiered" ->
        semanticStreamOracleSql(AUTO_DEMO_OCCUPANCY)) +
      // ...and across the MANIFEST-POINTER fold: the commit changes only
      // how the folded generation is published (single-file manifest vs
      // directory rename), never index content, so the one-shot pair set
      // is still the oracle — the parity theorem across an object-store
      // maintenance window.
      ("x_stream_semantic_manifest" ->
        semanticStreamOracleSql(AUTO_DEMO_OCCUPANCY)) +
      ("x_dedup_ensemble" -> ensembleOracleSql(AUTO_DEMO_OCCUPANCY)) +
      ("x_decontam_semantic" -> decontamSemanticOracleSql(AUTO_DEMO_OCCUPANCY)) +
      ("x_dedup_semantic_2level" -> semantic2LevelOracleSql(L2_OCCUPANCY))

  private val staticOracleSql: Map[String, String] = Map(
    // The binary family is integer-only end to end: DuckDB never packs —
    // it counts sign bits / sign mismatches directly over the double view,
    // which is definitionally what the packed popcount/XOR computes, so a
    // value match proves the bit-packing round trip.
    "x_embed_binary" ->
      """WITH t AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |p AS (SELECT vec_id, label,
        |             CAST(list_sum(list_transform(v, x -> CASE WHEN x > 0 THEN 1 ELSE 0 END)) AS INTEGER) AS pop
        |      FROM t)
        |SELECT label, count(*) AS n_vecs,
        |       CAST(sum(pop) AS BIGINT) AS total_set_bits,
        |       min(pop) AS min_pop, max(pop) AS max_pop
        |FROM p GROUP BY label""".stripMargin,
    "x_ann_hamming" ->
      """WITH t AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |hb AS (SELECT a.vec_id AS q_id, b.vec_id AS nn_id,
        |              CAST(list_sum(list_transform(range(1, len(a.v) + 1),
        |                i -> CASE WHEN (a.v[i] > 0) <> (b.v[i] > 0) THEN 1 ELSE 0 END)) AS INTEGER) AS ham
        |       FROM t a, t b WHERE a.vec_id < 50 AND b.vec_id <> a.vec_id),
        |r AS (SELECT q_id, nn_id, ham,
        |             CAST(row_number() OVER (PARTITION BY q_id ORDER BY ham, nn_id) AS INTEGER) AS rnk
        |      FROM hb)
        |SELECT q_id, nn_id, rnk, ham FROM r WHERE rnk <= 3""".stripMargin,
    "x_ann_hamming_recall" ->
      s"""WITH $baseCtes,
         |hb AS (SELECT a.vec_id AS q_id, b.vec_id AS nn_id,
         |              CAST(list_sum(list_transform(range(1, len(a.v) + 1),
         |                i -> CASE WHEN (a.v[i] > 0) <> (b.v[i] > 0) THEN 1 ELSE 0 END)) AS INTEGER) AS ham
         |       FROM n a, n b WHERE a.vec_id < 50 AND b.vec_id <> a.vec_id),
         |hr AS (SELECT q_id, nn_id FROM (
         |         SELECT q_id, nn_id,
         |                row_number() OVER (PARTITION BY q_id ORDER BY ham, nn_id) AS rnk
         |         FROM hb)
         |       WHERE rnk <= 3),
         |$exactTop3Cte
         |${recallSelect("hr")}""".stripMargin,
    // Whitening audit: floor-quantized integer sums (exact, order-free)
    // -> double stats computed in the same expression order as Spark ->
    // identical IEEE per-element whiten -> floor-quantized post sums.
    "x_embed_whiten" ->
      """WITH t AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |e AS (SELECT vec_id, unnest(range(0, len(v))) AS dim, unnest(v) AS x FROM t),
        |st AS (SELECT dim, count(*) AS n,
        |         CAST(SUM(CAST(floor(x * 1e9) AS BIGINT)) AS BIGINT) AS sx9,
        |         CAST(SUM(CAST(floor(x * x * 1e12) AS BIGINT)) AS BIGINT) AS sxx12
        |       FROM e GROUP BY dim),
        |ms AS (SELECT dim, n,
        |         (CAST(sx9 AS DOUBLE) / 1e9) / n AS mean,
        |         (CAST(sxx12 AS DOUBLE) / 1e12) / n -
        |           ((CAST(sx9 AS DOUBLE) / 1e9) / n) * ((CAST(sx9 AS DOUBLE) / 1e9) / n) AS variance
        |       FROM st),
        |w AS (SELECT e.dim,
        |        CASE WHEN ms.variance <= 0 THEN 0.0
        |             ELSE (e.x - ms.mean) / sqrt(ms.variance) END AS w
        |      FROM e JOIN ms USING (dim))
        |SELECT ms.dim, CAST(ms.n AS BIGINT) AS n,
        |       CAST(floor(ms.mean * 1e9) AS BIGINT) AS mean_ppb,
        |       CAST(floor(ms.variance * 1e9) AS BIGINT) AS var_ppb,
        |       CAST(SUM(CAST(floor(w.w * 1e6) AS BIGINT)) AS BIGINT) AS post_sum_w_ppm,
        |       CAST(SUM(CAST(floor(w.w * w.w * 1e6) AS BIGINT)) AS BIGINT) AS post_sum_w2_ppm
        |FROM w JOIN ms USING (dim)
        |GROUP BY ms.dim, ms.n, ms.mean, ms.variance""".stripMargin,
    // Same trained assignment relation as the ANN/semantic oracles; the
    // medoid is row 1 of a per-cluster cosine-to-final-centroid order.
    "x_cluster_medoids" ->
      s"""WITH ${ivfAssignCtes(IVF_K)}
         |SELECT CAST(cluster AS INTEGER) AS cluster, medoid_id, csize, cos_ppm FROM (
         |  SELECT a.cl AS cluster, a.vec_id AS medoid_id,
         |         count(*) OVER (PARTITION BY a.cl) AS csize,
         |         CAST(floor(list_dot_product(a.v, c.cent) / a.nrm * 1000000) AS BIGINT) AS cos_ppm,
         |         row_number() OVER (PARTITION BY a.cl
         |           ORDER BY CAST(floor(list_dot_product(a.v, c.cent) / a.nrm * 1000000) AS BIGINT) DESC,
         |                    a.vec_id) AS rn
         |  FROM af a JOIN c$IVF_ITERS c ON c.cl = a.cl)
         |WHERE rn = 1""".stripMargin,
    "x_ann_bruteforce" ->
      s"""WITH $baseCtes,
         |p AS (SELECT a.vec_id AS q_id, b.vec_id AS nn_id,
         |             list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS sim
         |      FROM n a, n b WHERE a.vec_id < 50 AND b.vec_id <> a.vec_id),
         |r AS (SELECT q_id, nn_id, sim,
         |             CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, nn_id) AS INTEGER) AS rnk
         |      FROM p)
         |SELECT q_id, nn_id, rnk, sim FROM r WHERE rnk <= 3""".stripMargin,
    // The beam walk replayed hop by hop: seeding, BEAM_HOPS frontier
    // expansions through the directed top-3 graph, final top-3 of the last
    // ranked frontier — the hash compare pins the traversal itself.
    "x_ann_beam" ->
      s"""WITH $baseCtes,
         |$beamWalkCtes
         |SELECT q_id, c_id AS nn_id, rnk, sim FROM f$BEAM_HOPS WHERE rnk <= 3""".stripMargin,
    "x_ann_beam_recall" ->
      s"""WITH $baseCtes,
         |$beamWalkCtes,
         |beam3 AS (SELECT q_id, c_id AS nn_id FROM f$BEAM_HOPS WHERE rnk <= 3),
         |truth3 AS (SELECT q_id, nn_id FROM (
         |  SELECT q.vec_id AS q_id, p.vec_id AS nn_id,
         |         row_number() OVER (PARTITION BY q.vec_id
         |           ORDER BY list_dot_product(q.v, p.v) / (q.nrm * p.nrm) DESC, p.vec_id) AS rnk
         |  FROM qs q, pan p WHERE p.vec_id <> q.vec_id)
         |  WHERE rnk <= 3),
         |bh AS (SELECT b.q_id, count(*) AS h FROM beam3 b
         |       JOIN truth3 t ON t.q_id = b.q_id AND t.nn_id = b.nn_id
         |       GROUP BY b.q_id),
         |per AS (SELECT q.vec_id AS q_id, coalesce(bh.h, 0) AS n_hits
         |        FROM qs q LEFT JOIN bh ON bh.q_id = q.vec_id)
         |SELECT n_hits, count(*) AS n_queries FROM per GROUP BY n_hits""".stripMargin,
    "x_hard_negatives" ->
      """WITH t AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
        |n AS (SELECT vec_id, v, label, sqrt(list_dot_product(v, v)) AS nrm FROM t),
        |p AS (SELECT a.vec_id AS q_id, a.label AS q_label,
        |             b.vec_id AS neg_id, b.label AS neg_label,
        |             list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS sim
        |      FROM n a, n b WHERE a.vec_id < 100 AND b.label <> a.label),
        |r AS (SELECT q_id, q_label, neg_id, neg_label, sim,
        |             CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, neg_id) AS INTEGER) AS rnk
        |      FROM p)
        |SELECT q_id, q_label, neg_id, neg_label, rnk, sim FROM r WHERE rnk <= 3""".stripMargin,
    "x_embed_int8" ->
      """WITH t AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |e AS (SELECT vec_id, label,
        |             unnest(range(0, len(v))) AS dim,
        |             unnest(v) AS x
        |      FROM t),
        |sc AS (SELECT dim, max(abs(x)) AS s FROM e GROUP BY dim),
        |q AS (SELECT e.vec_id, e.label, e.dim, e.x, sc.s,
        |             CASE WHEN sc.s = 0 THEN 0
        |                  ELSE CAST(floor(e.x / sc.s * 127 + 0.5) AS INTEGER) END AS code
        |      FROM e JOIN sc USING (dim))
        |SELECT label,
        |       CAST(SUM(CASE WHEN dim = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_vecs,
        |       CAST(SUM(CASE WHEN abs(code) = 127 THEN 1 ELSE 0 END) AS BIGINT) AS sat_codes,
        |       CAST(SUM(CAST(abs(x - code * s / 127) AS DECIMAL(28,12))) AS DOUBLE) AS total_abs_err,
        |       max(abs(x - code * s / 127)) AS max_abs_err
        |FROM q GROUP BY label""".stripMargin,
    "x_embed_outliers" ->
      """WITH t AS (SELECT label, embedding,
        |             list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |                              list_transform(embedding, x -> CAST(x AS DOUBLE))) AS n2
        |      FROM embeddings)
        |SELECT label, count(*) AS n_vecs,
        |       CAST(sum(CASE WHEN len(embedding) <> 64 THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_dim,
        |       CAST(sum(CASE WHEN n2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
        |       CAST(sum(CASE WHEN n2 > 0 AND n2 < 0.81 THEN 1 ELSE 0 END) AS BIGINT) AS n_low_norm,
        |       CAST(sum(CASE WHEN n2 > 1.21 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_norm,
        |       CAST(sum(CAST(n2 AS DECIMAL(28,12))) AS DOUBLE) AS sum_sq
        |FROM t GROUP BY label""".stripMargin,
    "x_ann_lsh" ->
      s"""WITH $lshCtes
         |SELECT q_id, nn_id, sim FROM lsh""".stripMargin,
    "x_ann_ivf" ->
      s"""WITH $ivfCtes
         |SELECT q_id, nn_id, sim FROM ivf""".stripMargin,
    // Same trained assignment + probe CTEs as the IVF oracle; only the
    // posting side carries the metadata predicate (pre-filter strategy).
    "x_ann_ivf_filtered" ->
      s"""WITH ${ivfAssignCtes(IVF_K)},
         |pr AS (SELECT q_id, cl AS cluster FROM (
         |    SELECT n.vec_id AS q_id, c.cl,
         |           row_number() OVER (PARTITION BY n.vec_id
         |             ORDER BY list_dot_product(n.v, c.cent) DESC, c.cl DESC) AS rn
         |    FROM n, c$IVF_ITERS c WHERE n.vec_id < 200) WHERE rn <= $IVF_NPROBE),
         |flab AS (SELECT af.vec_id, af.v, af.nrm, af.cl
         |         FROM af JOIN embeddings e ON e.vec_id = af.vec_id
         |         WHERE e.label = $ANN_FILTER_LABEL),
         |fcand AS (SELECT p.q_id, b.vec_id AS nn_id,
         |                 list_dot_product(q.v, b.v) / (q.nrm * b.nrm) AS sim
         |          FROM pr p JOIN n q ON q.vec_id = p.q_id
         |                    JOIN flab b ON b.cl = p.cluster AND b.vec_id <> p.q_id),
         |fr AS (SELECT q_id, nn_id, sim,
         |              CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, nn_id) AS INTEGER) AS rnk
         |       FROM fcand)
         |SELECT q_id, nn_id, rnk, sim FROM fr WHERE rnk <= 3""".stripMargin,
    "x_dedup_embedding" ->
      s"""WITH $baseCtes,
         |dbk AS (
         |${bucketArmsSql(dedupPlaneWeights(64), DEDUP_TABLES, DEDUP_BITS)}),
         |ecand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |          FROM dbk a JOIN dbk b
         |            ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
         |SELECT id_a, id_b,
         |       list_dot_product(qa.v, qb.v) / (qa.nrm * qb.nrm) AS cos
         |FROM ecand c JOIN n qa ON qa.vec_id = c.id_a JOIN n qb ON qb.vec_id = c.id_b
         |WHERE list_dot_product(qa.v, qb.v) / (qa.nrm * qb.nrm) >= 0.5""".stripMargin,
    "x_dedup_semantic" -> semanticOracleSql(IVF_K, Some(SEM_PIN_MAX_ID)),
    "x_dedup_semantic_fine" -> semanticOracleSql(SEM_FINE_K, Some(SEM_PIN_MAX_ID)),
    // Same trained assignment + probe CTEs as the ANN oracle, then the
    // knn-vote chain over IVF candidates instead of the full corpus.
    "x_knn_vote_ivf" ->
      s"""WITH ${ivfAssignCtes(IVF_K)},
         |lab AS (SELECT af.vec_id, af.v, af.nrm, af.cl, e.label
         |        FROM af JOIN embeddings e ON e.vec_id = af.vec_id),
         |pr AS (SELECT q_id, cl AS cluster FROM (
         |    SELECT n.vec_id AS q_id, c.cl,
         |           row_number() OVER (PARTITION BY n.vec_id
         |             ORDER BY list_dot_product(n.v, c.cent) DESC, c.cl DESC) AS rn
         |    FROM n, c$IVF_ITERS c WHERE n.vec_id < 200) WHERE rn <= $IVF_NPROBE),
         |top5 AS (SELECT q_id, true_label, label FROM (
         |    SELECT p.q_id, q.label AS true_label, b.label,
         |           row_number() OVER (PARTITION BY p.q_id
         |             ORDER BY list_dot_product(q.v, b.v) / (q.nrm * b.nrm) DESC, b.vec_id) AS rnk
         |    FROM pr p JOIN lab q ON q.vec_id = p.q_id
         |              JOIN lab b ON b.cl = p.cluster AND b.vec_id <> p.q_id)
         |  WHERE rnk <= 5),
         |votes AS (
         |  SELECT q_id, true_label, label, count(*) AS votes
         |  FROM top5 GROUP BY q_id, true_label, label),
         |winner AS (
         |  SELECT q_id, true_label, label FROM (
         |    SELECT q_id, true_label, label,
         |           row_number() OVER (PARTITION BY q_id ORDER BY votes DESC, label) AS vr
         |    FROM votes)
         |  WHERE vr = 1)
         |SELECT true_label, label AS predicted, count(*) AS n
         |FROM winner GROUP BY true_label, label""".stripMargin,
    "x_knn_label_vote" ->
      s"""WITH $baseCtes,
         |l AS (SELECT n.vec_id, n.v, n.nrm, e.label
         |      FROM n JOIN embeddings e ON e.vec_id = n.vec_id),
         |top5 AS (
         |  SELECT q_id, true_label, label FROM (
         |    SELECT a.vec_id AS q_id, a.label AS true_label, b.label,
         |           row_number() OVER (PARTITION BY a.vec_id
         |             ORDER BY list_dot_product(a.v, b.v) / (a.nrm * b.nrm) DESC, b.vec_id) AS rnk
         |    FROM l a, l b WHERE a.vec_id < 200 AND b.vec_id <> a.vec_id)
         |  WHERE rnk <= 5),
         |votes AS (
         |  SELECT q_id, true_label, label, count(*) AS votes
         |  FROM top5 GROUP BY q_id, true_label, label),
         |winner AS (
         |  SELECT q_id, true_label, label FROM (
         |    SELECT q_id, true_label, label,
         |           row_number() OVER (PARTITION BY q_id ORDER BY votes DESC, label) AS vr
         |    FROM votes)
         |  WHERE vr = 1)
         |SELECT true_label, label AS predicted, count(*) AS n
         |FROM winner GROUP BY true_label, label""".stripMargin,
    "x_ann_matryoshka" ->
      s"""WITH $matryoshkaCtes
         |SELECT q_id, nn_id, rnk, sim FROM mat""".stripMargin,
    "x_ann_matryoshka_recall" ->
      s"""WITH $matryoshkaCtes,
         |matl AS (SELECT q_id, nn_id FROM mat),
         |$exactTop3Cte
         |${recallSelect("matl")}""".stripMargin,
    "x_ann_lsh_recall" ->
      s"""WITH $lshCtes,
         |$exactTop3Cte
         |${recallSelect("lsh")}""".stripMargin,
    "x_ann_ivf_recall" ->
      s"""WITH $ivfCtes,
         |$exactTop3Cte
         |${recallSelect("ivf")}""".stripMargin,
    "x_ann_pq" ->
      s"""WITH $pqCtes
         |SELECT q_id, nn_id, sim FROM rr WHERE rrnk = 1""".stripMargin,
    "x_ann_pq_recall" ->
      s"""WITH $pqCtes,
         |pq AS (SELECT q_id, nn_id FROM rr WHERE rrnk = 1),
         |$exactTop3Cte
         |${recallSelect("pq")}""".stripMargin,
    "x_ann_ivfpq" ->
      s"""WITH $ivfPqCtes
         |SELECT q_id, nn_id, sim FROM rr WHERE rrnk = 1""".stripMargin,
    // The persisted-artifact probe is bit-identical to the in-job build
    // (doubles/ints round-trip parquet exactly), so the oracle IS the
    // x_ann_ivfpq oracle — which is the entry's point.
    "x_ann_ivfpq_persisted" ->
      s"""WITH $ivfPqCtes
         |SELECT q_id, nn_id, sim FROM rr WHERE rrnk = 1""".stripMargin,
    "x_ann_ivfpq_recall" ->
      s"""WITH $ivfPqCtes,
         |ivfpq AS (SELECT q_id, nn_id FROM rr WHERE rrnk = 1),
         |$exactTop3Cte
         |${recallSelect("ivfpq")}""".stripMargin
  )

  /** PQ training + full-corpus encoding as CTEs, parameterized by the
    * name given to the unit-vector training sample (the composed IVF-PQ
    * oracle renames it to avoid the IVF chain's own `ts`). Requires
    * `nv(vec_id, w)` upstream; emits `sd`, `pc0..pc$PQ_ITERS` (final
    * codebooks), `codes`, and `cw(vec_id, k0..k7)` — same
    * seeding/decimal-Lloyd contract as [[ivfAssignCtes]]. */
  private def pqEncodeCtes(tsName: String): String = {
    def sub(rel: String, m: String) = s"$rel.w[$m*$PQ_SUBDIM+1 : $m*$PQ_SUBDIM+$PQ_SUBDIM]"
    def assign(cPrev: String, aName: String, from: String) =
      s"""$aName AS MATERIALIZED (SELECT vec_id, m, cl FROM (
         |  SELECT s.vec_id, c.m, c.cl,
         |         row_number() OVER (PARTITION BY s.vec_id, c.m
         |           ORDER BY list_dot_product(${sub("s", "c.m")}, c.cent) DESC, c.cl) AS rn
         |  FROM $from s, $cPrev c) WHERE rn = 1)""".stripMargin
    def recompute(aName: String, cPrev: String, cName: String) =
      s"""$cName AS MATERIALIZED (
         |  SELECT m, cl, list(cv ORDER BY pos) AS cent FROM (
         |    SELECT a.m, a.cl, p.p AS pos,
         |           CAST(SUM(CAST(s.w[a.m*$PQ_SUBDIM + p.p] AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS cv
         |    FROM $aName a JOIN $tsName s USING (vec_id), (SELECT unnest(range(1,${PQ_SUBDIM + 1})) AS p) p
         |    GROUP BY a.m, a.cl, p.p) GROUP BY m, cl
         |  UNION ALL
         |  SELECT c.m, c.cl, c.cent FROM $cPrev c
         |  WHERE NOT EXISTS (SELECT 1 FROM $aName a WHERE a.m = c.m AND a.cl = c.cl))""".stripMargin
    val iters = (1 to PQ_ITERS).map { i =>
      assign(s"pc${i - 1}", s"pa$i", tsName) + ",\n" + recompute(s"pa$i", s"pc${i - 1}", s"pc$i")
    }.mkString(",\n")
    val pivot = (0 until PQ_M).map(m =>
      s"MAX(CASE WHEN m = $m THEN cl END) AS k$m").mkString(",\n         ")
    s"""$tsName AS MATERIALIZED (SELECT vec_id, w FROM nv
       |       WHERE (vec_id * $IVF_TRAIN_MULT + $IVF_TRAIN_ADD) % $IVF_TRAIN_MOD < $IVF_TRAIN_KEEP),
       |sd AS MATERIALIZED (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cl, w
       |       FROM nv WHERE vec_id IN (
       |         SELECT i.i * (SELECT greatest(1, count(*) // $PQ_K) FROM nv)
       |         FROM (SELECT unnest(range(0,$PQ_K)) AS i) i)
       |       ORDER BY vec_id LIMIT $PQ_K),
       |pc0 AS MATERIALIZED (SELECT m.m AS m, cl, ${sub("sd", "m.m").replace("sd.w", "w")} AS cent
       |        FROM sd, (SELECT unnest(range(0,$PQ_M)) AS m) m),
       |$iters,
       |${assign(s"pc$PQ_ITERS", "codes", "nv")},
       |cw AS (SELECT vec_id,
       |         $pivot
       |       FROM codes GROUP BY vec_id)""".stripMargin
  }

  /** The eight-term fixed-order ADC sum (`q` = unit query row, `f0..f7`
    * the joined codebook entries) and the code joins that bind them. */
  private def pqAdcSumSql: String = (0 until PQ_M).map(m =>
    s"list_dot_product(q.w[${m * PQ_SUBDIM + 1}:${(m + 1) * PQ_SUBDIM}], f$m.cent)").mkString("\n         + ")

  private def pqCodeJoinsSql: String = (0 until PQ_M).map(m =>
    s"JOIN pc$PQ_ITERS f$m ON f$m.m = $m AND f$m.cl = x.k$m").mkString("\n  ")

  /** The reranked tail shared by the flat-PQ and IVF-PQ oracles: window
    * the ADC scores, exact-rerank the <= PQ_RERANK shortlist. Ends at
    * `rr(q_id, nn_id, sim, rrnk)`. */
  private def pqRerankCtes: String =
    s"""pqr AS (SELECT q_id, nn_id, approx_sim,
       |               row_number() OVER (PARTITION BY q_id
       |                 ORDER BY approx_sim DESC, nn_id) AS rnk
       |        FROM adc),
       |rr AS (SELECT q_id, nn_id, sim,
       |              row_number() OVER (PARTITION BY q_id
       |                ORDER BY sim DESC, nn_id) AS rrnk FROM (
       |  SELECT p.q_id, p.nn_id,
       |         list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS sim
       |  FROM pqr p JOIN n a ON a.vec_id = p.q_id
       |             JOIN n b ON b.vec_id = p.nn_id
       |  WHERE p.rnk <= $PQ_RERANK))""".stripMargin

  /** PQ oracle: re-runs per-subspace Lloyd (same seeding/decimal contract
    * as [[ivfCtes]]), encodes the corpus, and scores ADC with the same
    * fixed-order eight-term sum the Spark side uses. Ends at
    * `rr(q_id, nn_id, sim, rrnk)`. */
  private def pqCtes: String =
    s"""$baseCtes,
       |nv AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS w FROM n),
       |${pqEncodeCtes("ts")},
       |adc AS (
       |  SELECT q.vec_id AS q_id, x.vec_id AS nn_id,
       |         $pqAdcSumSql AS approx_sim
       |  FROM nv q
       |  JOIN cw x ON x.vec_id <> q.vec_id
       |  $pqCodeJoinsSql
       |  WHERE q.vec_id < 200),
       |$pqRerankCtes""".stripMargin

  /** The composed IVF-PQ oracle: the IVF chain's trained centroids pick
    * per-query probe clusters (same DESC,cl DESC probe order as
    * [[ivfCtes]]), the PQ chain's codes score ONLY vectors inside probed
    * clusters, and the exact rerank finishes. The two training chains
    * coexist by renaming PQ's sample CTE. */
  private def ivfPqCtes: String =
    s"""$ivfAssignCtes,
       |nv AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS w FROM n),
       |${pqEncodeCtes("pts")},
       |pr AS (SELECT q_id, cl AS cluster FROM (
       |    SELECT n.vec_id AS q_id, c.cl,
       |           row_number() OVER (PARTITION BY n.vec_id
       |             ORDER BY list_dot_product(n.v, c.cent) DESC, c.cl DESC) AS rn
       |    FROM n, c$IVF_ITERS c WHERE n.vec_id < 200) WHERE rn <= $IVF_NPROBE),
       |adc AS (
       |  SELECT p.q_id, x.vec_id AS nn_id,
       |         $pqAdcSumSql AS approx_sim
       |  FROM pr p
       |  JOIN nv q ON q.vec_id = p.q_id
       |  JOIN af b ON b.cl = p.cluster AND b.vec_id <> p.q_id
       |  JOIN cw x ON x.vec_id = b.vec_id
       |  $pqCodeJoinsSql),
       |$pqRerankCtes""".stripMargin
}
