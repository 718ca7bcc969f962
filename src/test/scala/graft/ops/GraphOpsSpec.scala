package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Integer-exact PageRank over the relational trading graph: the whole
  * point of the ppb fixed-point design is that every iteration is
  * bit-reproducible, so the spec can hand-compute the expected ranks of a
  * tiny graph with plain Long arithmetic and demand equality — no epsilon.
  */
class GraphOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** 2 customers, 2 suppliers: c1-{s1,s2}, c2-{s2}. Hand-iterated:
    * N=4, init=250_000_000, teleport=37_500_000, three rounds of
    * contrib = r div deg, r' = teleport + (85 * Σ) div 100. */
  private lazy val tinyDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graph-tiny").toString
    Seq((1L, 1L), (2L, 2L)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 1L), (1L, 2L), (2L, 2L)).toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("pagerank on the tiny graph equals the hand-computed integer iteration") {
    val got = GraphOps.graphPagerank(spark, tinyDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // Ties (c1/s2 and s1/c2 are symmetric) break by encoded node id asc.
    val expected = Seq(
      ("customer", 1L, 330285156L),
      ("supplier", 2L, 330285156L),
      ("supplier", 1L, 169714843L),
      ("customer", 2L, 169714843L))
    assert(got == expected)
  }

  test("tiny-graph degree stats: bipartite edge symmetry and exact degrees") {
    val rows = GraphOps.graphDegreeStats(spark, tinyDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows("customer") == ((2L, 3L, 1L, 2L))) // c1 deg 2, c2 deg 1
    assert(rows("supplier") == ((2L, 3L, 1L, 2L))) // s1 deg 1, s2 deg 2
  }

  /** Driver-side exact replay of the integer PageRank law over an explicit
    * edge list: r₀ = 10⁹/n; per round give = r div outdeg, gathered by dst,
    * r' = 0.15·10⁹/n + (85·Σ) div 100. Returns the per-round states. */
  private def simulate(edges: Seq[(Long, Long)], rounds: Int): Seq[Map[Long, Long]] = {
    val out = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = out.keySet
    val n = nodes.size
    val teleport = 150000000L / n
    var r = nodes.map(_ -> 1000000000L / n).toMap
    (1 to rounds).map { _ =>
      val got = scala.collection.mutable.Map.empty[Long, Long]
      edges.foreach { case (s, dst) =>
        got(dst) = got.getOrElse(dst, 0L) + r(s) / out(s)
      }
      r = nodes.map(v => v -> (teleport + 85L * got.getOrElse(v, 0L) / 100L)).toMap
      r
    }
  }

  /** Undirected chain 0—1—…—(m-1) as a directed both-ways edge list. */
  private def chain(m: Int): Seq[(Long, Long)] =
    (0 until m - 1).flatMap(i => Seq((i.toLong, i + 1L), (i + 1L, i.toLong)))

  test("pagerankDeep: 12 checkpointed rounds on a chain graph equal the exact driver replay") {
    import spark.implicits._
    val edges = chain(30)
    val (ranks, rounds) = GraphOps.pagerankDeep(
      edges.toDF("src", "dst"), maxRounds = 12, checkpointInterval = 4)
    assert(rounds == 12)
    val got = ranks.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == simulate(edges, 12).last,
      "deep solver diverged from the exact integer iteration")
    // total mass stays bounded by the teleport/damping contraction
    assert(got.values.sum <= 1000000000L)
  }

  test("pagerankDeep: reliable-checkpoint path returns the identical fixed point") {
    import spark.implicits._
    val edges = chain(12)
    val dir = java.nio.file.Files.createTempDirectory("pr-ckpt").toString
    // The dir is session-global and pagerankLoop only sets it when UNSET
    // (see the clobber test below) — pin it explicitly so this test's
    // file-landing assertion is independent of suite ordering.
    val sc = spark.sparkContext
    val before = sc.getCheckpointDir
    try {
      sc.setCheckpointDir(dir)
      val (ranks, _) = GraphOps.pagerankDeep(edges.toDF("src", "dst"),
        maxRounds = 10, checkpointInterval = 3, checkpointDir = Some(dir))
      val got = ranks.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == simulate(edges, 10).last)
      assert(new java.io.File(dir).listFiles().nonEmpty, "reliable checkpoint wrote nothing")
    } finally sc.setCheckpointDir(before.orNull)
  }

  test("pagerankDeep: the convergence accumulator stops the loop at the exact L1 bound") {
    import spark.implicits._
    val edges = chain(12)
    // 0.85-contraction from an ~10⁸ ppb initial movement: ≤ 10⁷ lands
    // around round 14 — early enough to prove the stop, late enough that
    // several checkpoint intervals elapse first.
    val tol = 10000000L
    val (ranks, rounds) = GraphOps.pagerankDeep(edges.toDF("src", "dst"),
      maxRounds = 60, checkpointInterval = 5, convergedBelowPpb = tol)
    assert(rounds < 60, "expected early convergence on a 12-node chain")
    val states = simulate(edges, rounds + 1)
    def l1(a: Map[Long, Long], b: Map[Long, Long]): Long =
      a.keys.toSeq.map(k => math.abs(a(k) - b(k))).sum // toSeq: Set would collapse equal diffs
    // the stop round is the FIRST whose movement is within the bound
    val init = edges.map(_._1).distinct.map(_ -> 1000000000L / 12).toMap
    val moves = (init +: states).sliding(2).map(p => l1(p(0), p(1))).toSeq
    assert(moves(rounds - 1) <= tol, "loop stopped before reaching the bound")
    assert(moves.take(rounds - 1).forall(_ > tol), "loop overshot the first converged round")
    val got = ranks.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == states(rounds - 1))
  }

  test("convergence tally over-count (retry simulation) delays the exit by a round, never changes ranks") {
    // r16 verdict #3: the L1 movement is tallied by an accumulator inside
    // the round's materializing job, and a task RETRY re-adds its
    // partition's movement — the tally can only OVER-count. The benignity
    // claim: an inflated tally can only DELAY the exit (movement shrinks
    // round over round), and every emitted rank state is still the exact
    // round-t solution of the deterministic recurrence. tallyPadPpb is the
    // deterministic stand-in for the retry's inflation.
    import spark.implicits._
    val edges = chain(12)
    val e = edges.toDF("src", "dst").repartition(col("src")).persist()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")).persist()
    val tol = 10000000L
    val (r0, t0) = GraphOps.pagerankLoop(e, deg, maxRounds = 60,
      checkpointInterval = 5, checkpointDir = None, convergedBelowPpb = tol)
    assert(t0 < 60)
    val states = simulate(edges, t0 + 1)
    val init = edges.map(_._1).distinct.map(_ -> 1000000000L / 12).toMap
    def l1(a: Map[Long, Long], b: Map[Long, Long]): Long =
      a.keys.toSeq.map(k => math.abs(a(k) - b(k))).sum
    val moves = (init +: states).sliding(2).map(p => l1(p(0), p(1))).toSeq
    // Pad chosen so the healthy stop round t0 JUST fails the bound: the
    // padded run must go exactly one round further (movement strictly
    // decreases under the 0.85 contraction, so round t0+1 passes even
    // with the pad).
    val pad = tol - moves(t0 - 1) + 1
    assert(pad > 0 && moves(t0) + pad <= tol, "test premise: one extra round absorbs the pad")
    val (r1, t1) = GraphOps.pagerankLoop(e, deg, maxRounds = 60,
      checkpointInterval = 5, checkpointDir = None, convergedBelowPpb = tol,
      tallyPadPpb = pad)
    assert(t1 == t0 + 1, s"over-count should add exactly one round: $t0 -> $t1")
    val got0 = r0.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got1 = r1.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got0 == states(t0 - 1), "healthy run diverged from the exact iteration")
    assert(got1 == states(t0), "padded run must emit the exact round-(t0+1) solution")
    // The TRUE movement at the padded exit still satisfies the stop law —
    // a delayed exit is deeper into convergence, never out of it.
    assert(moves(t1 - 1) <= tol)
    e.unpersist(); deg.unpersist()
  }

  test("pagerankLoop releases each intermediate cut once the next one materializes") {
    // r15 verdict: every lineage cut materializes a node-sized relation
    // whose blocks lived until ContextCleaner GC — unbounded at deep round
    // counts. The law now: at any point in the solve, at most TWO
    // graft-owned cut relations hold storage (the one just materialized
    // and, for one instant before its release, its predecessor — observed
    // here AFTER release, so the bound reads: previous cuts are NONE).
    import spark.implicits._
    def cutRdds(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.analyzed.collectLeaves().collect {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
      }
    val edges = chain(20)
    val e = edges.toDF("src", "dst").repartition(col("src")).persist()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")).persist()
    val seen = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.rdd.RDD[_]]
    val alivePerCut = scala.collection.mutable.ArrayBuffer.empty[Int]
    val (ranks, rounds) = GraphOps.pagerankLoop(e, deg, maxRounds = 12,
      checkpointInterval = 1, checkpointDir = None, convergedBelowPpb = 0L,
      onCut = df => {
        seen ++= cutRdds(df)
        alivePerCut += seen.count(r =>
          r.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE)
      })
    assert(rounds == 12)
    // 12 cut rounds + the round-0 cut: 13 observations, every one bounded.
    assert(alivePerCut.size == 13, s"expected 13 cut observations, got $alivePerCut")
    assert(alivePerCut.forall(_ <= 2),
      s"released cuts still hold storage mid-run: $alivePerCut")
    // After the run exactly ONE cut relation (the returned one) is alive.
    val aliveAfter = seen.count(_.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE)
    assert(aliveAfter == 1, s"expected only the returned cut alive, got $aliveAfter")
    // ...and releasing eagerly changed no answer.
    val got = ranks.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == simulate(edges, 12).last)
    e.unpersist(); deg.unpersist()
  }

  test("pagerankLoop leaves a pre-set session checkpoint dir untouched") {
    // ADVICE r15: an unconditional setCheckpointDir clobbered the session-
    // global dir for every LATER reliable checkpoint (connectedComponents'
    // guard discipline, now shared).
    import spark.implicits._
    val sc = spark.sparkContext
    val before = sc.getCheckpointDir
    val preset = java.nio.file.Files.createTempDirectory("pr-preset").toString
    try {
      sc.setCheckpointDir(preset)
      val other = java.nio.file.Files.createTempDirectory("pr-clobber").toString
      GraphOps.pagerankDeep(chain(8).toDF("src", "dst"),
        maxRounds = 4, checkpointInterval = 2, checkpointDir = Some(other))
      assert(sc.getCheckpointDir.exists(_.contains(new java.io.File(preset).getName)),
        s"pagerank clobbered the session checkpoint dir: ${sc.getCheckpointDir}")
    } finally sc.setCheckpointDir(before.orNull)
  }

  test("graph relations live in RelCache under graph/ and release on clear") {
    // tinyDir is private to this suite, so concurrent suites can neither
    // rebuild nor re-touch its entries between the assertions below.
    GraphOps.graphPagerank(spark, tinyDir).collect()
    val owned = RelCache.entries(spark, "graph/").filter(_._1 == tinyDir)
    assert(owned.map(_._2).toSet == Set("graph/edges", "graph/deg"),
      s"expected exactly edge+degree relations under graph/, got ${owned.map(_._2)}")
    owned.foreach { case (_, tag, df) =>
      assert(df.storageLevel != org.apache.spark.storage.StorageLevel.NONE,
        s"$tag not persisted while cached")
    }
    RelCache.clear(spark, "graph/")
    assert(RelCache.entries(spark, "graph/").forall(_._1 != tinyDir),
      "clear left graph/ entries behind")
    owned.foreach { case (_, tag, df) =>
      assert(df.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
        s"$tag still persisted after clear — leaked block")
    }
  }

  test("real-corpus invariants: mass bound, edge symmetry, rank positivity") {
    val deg = GraphOps.graphDegreeStats(spark, SparkTestSession.sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // Undirected bipartite graph: both classes see the same edge count.
    assert(deg("customer")._2 == deg("supplier")._2)
    val top = GraphOps.graphPagerank(spark, SparkTestSession.sfDir).collect()
    assert(top.length == 15)
    val ranks = top.map(_.getLong(2))
    // Sorted descending, strictly positive, and no single node holds more
    // than the whole mass (1e9 ppb).
    assert(ranks.toSeq == ranks.sortBy(-_).toSeq)
    assert(ranks.forall(r => r > 0 && r < 1000000000L))
  }
}
