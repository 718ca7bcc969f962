package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Semantics of hard-negative mining (x_hard_negatives) and int8 scalar
  * quantization (x_embed_int8): planted geometry must beat proximity, and
  * the quantizer's saturation/error laws must hold exactly.
  */
class EmbedOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def embDir(rows: Seq[(Long, Seq[Float], Int)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("embops").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("hardNegatives: picks the closest DIFFERENT-label vector even when a same-label one is closer") {
    // query 0 (label 1) at e1; vec 1 (label 1) nearly identical — the
    // nearest neighbor, but same label, so it must NOT be mined; vec 2
    // (label 2) at 45° is the true hard negative; vec 3 (label 2)
    // orthogonal is the easy negative and must rank below vec 2.
    val d = embDir(Seq(
      (0L, Seq(1f, 0f, 0f, 0f), 1),
      (1L, Seq(0.99f, 0.01f, 0f, 0f), 1),
      (2L, Seq(1f, 1f, 0f, 0f), 2),
      (3L, Seq(0f, 0f, 1f, 0f), 2)))
    val got = Similarity.hardNegatives(spark, d)
      .filter(col("q_id") === 0)
      .orderBy(col("rnk"))
      .collect().map(r => (r.getLong(2), r.getInt(3), r.getInt(4)))
    assert(got.map(_._1).toSeq == Seq(2L, 3L), s"got ${got.toSeq}")
    assert(got.forall(_._2 == 2), "every mined negative must carry a different label")
  }

  test("hardNegatives on the real corpus: labels always differ, 3 per query, ranked by sim") {
    val out = Similarity.hardNegatives(spark, SparkTestSession.sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getInt(1) != r.getInt(3)), "same-label pair mined")
    val byQ = out.groupBy(_.getLong(0))
    byQ.values.foreach { rs =>
      assert(rs.length == 3)
      val sims = rs.sortBy(_.getInt(4)).map(_.getDouble(5))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b }, "ranks out of sim order")
    }
  }

  test("embedInt8Audit: exact codes on a planted table, saturation and error laws") {
    // dim scales: s0 = 2 (from vec 10), s1 = 1 (from vec 11).
    val d = embDir(Seq(
      (10L, Seq(2f, 0.5f), 7),
      (11L, Seq(-1f, 1f), 7),
      (12L, Seq(0.5f, -0.25f), 8)))
    val out = Similarity.embedInt8Audit(spark, d)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // label 7 codes: vec10 -> (127, floor(0.5*127+0.5)=64), vec11 ->
    // (floor(-63.5+0.5)=-63, 127): two saturated codes.
    assert(out(7)._1 == 2L && out(7)._2 == 2L)
    // label 8: (floor(31.75+0.5)=32, floor(-31.75+0.5)=-32) — none saturated.
    assert(out(8)._1 == 1L && out(8)._2 == 0L)
    // error law: every |err| <= s/(2*127) + float noise; max over dims s=2
    val bound = 2.0 / 254 + 1e-12
    assert(out.values.forall(_._4 <= bound), s"max err exceeds half-step bound: $out")
    // exact check of one reconstruction: label 8 dim0 err = |0.5 - 32*2/127|
    val err0 = math.abs(0.5 - 32.0 * 2 / 127)
    val err1 = math.abs(-0.25 - (-32.0) * 1 / 127)
    assert(math.abs(out(8)._3 - (err0 + err1)) < 1e-9)
  }

  test("plan laws: int8 broadcasts its dim scales; mining broadcasts the query side with grouped limits") {
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}
    import org.apache.spark.sql.execution.window.WindowGroupLimitExec
    def nodes(df: org.apache.spark.sql.DataFrame) = graft.PlanTest.executedNodes(df)
    // int8: the 64-row dim-scale aggregate must reach the exploded value
    // stream as a BROADCAST — shuffling the corpus by dim instead would
    // move the biggest relation in the plan for a 64-row lookup.
    val int8 = nodes(Similarity.embedInt8Audit(spark, SparkTestSession.sfDir))
    assert(int8.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "dim scales must broadcast onto the exploded stream")
    // mining: the ≤100-row query side must be the broadcast build side of
    // the nested-loop join (the label inequality makes it non-equi), and
    // rank<=3 must compile to grouped limits (partial top-k BEFORE the
    // window shuffle, so the full scored cross product never moves).
    val hn = nodes(Similarity.hardNegatives(spark, SparkTestSession.sfDir))
    assert(hn.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "query side must broadcast against the corpus scan")
    assert(hn.count(_.isInstanceOf[WindowGroupLimitExec]) == 2,
      "rank<=3 must compile to the two-level WindowGroupLimit")
  }

  test("embedInt8Audit on the real corpus: every dim's max element saturates") {
    val out = Similarity.embedInt8Audit(spark, SparkTestSession.sfDir).collect()
    val sat = out.map(_.getLong(2)).sum
    // symmetric per-dim scaling makes each dim's |max| element hit ±127;
    // 64 dims → at least 64 saturated codes corpus-wide
    assert(sat >= 64, s"expected >= 64 saturated codes, got $sat")
    assert(out.forall(_.getDouble(4) > 0), "quantization with zero error is not quantization")
  }
}
