package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** The binary-embedding family: the packed-word popcounts must agree with
  * a direct sign count over the float view (proving the bit packing), and
  * the Hamming top-3 must agree with a driver-side brute force over the
  * unpacked signs (proving the XOR+popcount kernel and the tie order).
  */
class HammingAnnSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = SparkTestSession.sfDir

  private lazy val signs: Map[Long, Array[Boolean]] =
    spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_ > 0f).toArray)
      .toMap

  test("per-label audit popcounts equal direct sign counts over the floats") {
    val audit = Similarity.embedBinaryAudit(spark, d)
      .agg(sum(col("n_vecs")), sum(col("total_set_bits"))).collect().head
    assert(audit.getLong(0) == signs.size)
    assert(audit.getLong(1) == signs.values.map(_.count(identity).toLong).sum)
  }

  test("Hamming top-3 equals a driver-side brute force with (ham, nn_id) order") {
    def ham(a: Array[Boolean], b: Array[Boolean]): Int =
      a.zip(b).count { case (x, y) => x != y }
    val expected = signs.keys.filter(_ < 50).toSeq.sorted.flatMap { q =>
      signs.keys.filter(_ != q).toSeq
        .map(c => (c, ham(signs(q), signs(c))))
        .sortBy { case (c, h) => (h, c) }
        .take(3).zipWithIndex
        .map { case ((c, h), i) => (q, c, i + 1, h) }
    }.toSet
    val got = Similarity.annHamming(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
    assert(got == expected)
  }

  test("recall audit counts are consistent: 0 <= n_top1 <= n_top3 <= n_results") {
    val r = Similarity.annHammingRecall(spark, d).collect().head
    val (n, t1, t3) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(n == 150) // 50 queries x top-3
    assert(0 <= t1 && t1 <= t3 && t3 <= n)
  }
}
