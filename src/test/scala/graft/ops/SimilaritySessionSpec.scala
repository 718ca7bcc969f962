package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The Similarity caches (normalized vectors, LSH bucket tables, IVF
  * centroids/assignments, exact ground truths) are keyed by
  * (SparkSession, data dir): a second session over the same directory must
  * rebuild its own plans — a DataFrame is bound to the session that built
  * it, and handing session B a plan persisted under session A is exactly
  * the stale-cache hazard in multi-session JVMs (test harnesses, notebook
  * re-runs, long-lived servers).
  */
class SimilaritySessionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("two sequential sessions over the same dir produce identical results") {
    val r1 = Similarity.annLsh(spark, dir).collect().map(_.toString).sorted
    val c1 = Similarity.trainIvfCentroids(spark, dir)

    val s2 = spark.newSession()
    val r2 = Similarity.annLsh(s2, dir).collect().map(_.toString).sorted
    val c2 = Similarity.trainIvfCentroids(s2, dir)

    assert(r1.nonEmpty)
    assert(r1.toSeq == r2.toSeq)
    // Training is deterministic, so the second session's independently
    // rebuilt centroids are bit-identical.
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
  }
}
