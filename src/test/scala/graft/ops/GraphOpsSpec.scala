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
