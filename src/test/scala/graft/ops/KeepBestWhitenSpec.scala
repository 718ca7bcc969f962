package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Laws of the two round-13 audit operators, checked against independent
  * formulations on the real testdata:
  *
  *  - x_dedup_keep_best: per multi-doc near-dup cluster, the kept member
  *    is the token-count argmax with min-doc_id tie-break, members and
  *    token mass tile the cluster — verified against the independently
  *    gated `dedupClusters` labeling.
  *  - x_embed_whiten: per dimension, the quantized pre-stats match a
  *    plain float aggregate within quantization error, and the
  *    post-whitening sums obey Σ⌊w·10⁶⌋ ≈ 0 and Σ⌊w²·10⁶⌋ ≈ n·10⁶ within
  *    the floor-bias bound — the z-score contract, not just row parity.
  */
class KeepBestWhitenSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = SparkTestSession.sfDir

  test("keep-best picks the token-argmax (min-id tie-break) of every multi-doc cluster") {
    val clusters = Dedup.dedupClusters(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val byCluster = clusters.groupBy(_._2).filter(_._2.length > 1)
      .map { case (c, ms) => c -> ms.map(_._1).toSet }
    val toks = Tables.documents(spark, d)
      .select(col("doc_id"), TextAnalysis.tokenCountCol(col("text")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out = Dedup.dedupKeepBest(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out.keySet == byCluster.keySet,
      "keep-best must emit exactly the multi-doc clusters")
    byCluster.foreach { case (c, members) =>
      val (keepId, keptTokens, nMembers, totalTokens) = out(c)
      assert(members.contains(keepId), s"cluster $c kept a non-member")
      val best = members.toSeq.map(id => (toks(id), -id)).max
      assert((keptTokens, -keepId) == best,
        s"cluster $c kept $keepId/$keptTokens, expected argmax $best")
      assert(nMembers == members.size)
      assert(totalTokens == members.toSeq.map(toks).sum)
    }
  }

  test("plan shape: keep-best is one aggregate — no per-cluster window, no sort before the argmax") {
    val plan = Dedup.dedupKeepBest(spark, d).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(1500))
  }

  test("whitening audit: quantized pre-stats match a float aggregate; post sums obey the z-score law") {
    val rows = Similarity.queries("x_embed_whiten")(spark, d).collect()
    assert(rows.length == 64, "one audit row per dimension")
    // independent pre-stats: plain double avg/var_pop per dim
    val ref = Tables.embeddings(spark, d)
      .select(posexplode(transform(col("embedding"), x => x.cast("double"))).as(Seq("dim", "x")))
      .groupBy(col("dim"))
      .agg(avg(col("x")).as("m"), var_pop(col("x")).as("v"))
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    rows.foreach { r =>
      val (dim, n) = (r.getInt(0), r.getLong(1))
      val (meanPpb, varPpb) = (r.getLong(2), r.getLong(3))
      val (sw, sw2) = (r.getLong(4), r.getLong(5))
      val (m, v) = ref(dim)
      assert(math.abs(meanPpb / 1e9 - m) < 1e-6, s"dim $dim mean drifted")
      assert(math.abs(varPpb / 1e9 - v) < 1e-6, s"dim $dim variance drifted")
      // floor bias: each element loses [0,1) ppm; quantized-stats skew is
      // orders below n — so Σ⌊w⌋ sits in (-2n, n) and Σ⌊w²⌋ within 3n of n·10⁶
      assert(math.abs(sw) <= 2 * n, s"dim $dim post mean law broken: $sw")
      assert(math.abs(sw2 - n * 1000000L) <= 3 * n,
        s"dim $dim post variance law broken: $sw2 vs ${n * 1000000L}")
    }
  }
}
