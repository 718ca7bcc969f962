package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Product-quantization invariants on the real sf0.001 embeddings: codebook
  * shape and code range, one reranked answer per query, and the rerank
  * stage's value over the pure ADC answer measured against the exact truth.
  */
class SimilarityPqSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir

  test("codebooks: 8 subspaces x 16 codes x 8 dims, finite values") {
    val books = Similarity.trainPqCodebooks(spark, dir)
    assert(books.length == 8)
    books.foreach { b =>
      assert(b.length == 16)
      b.foreach { c =>
        assert(c.length == 8)
        assert(c.forall(x => !x.isNaN && !x.isInfinite))
      }
    }
  }

  test("codes: one row per vector, every sub-code within [0, 16)") {
    val codes = Similarity.pqCodes(spark, dir)
    val nVecs = Tables.embeddings(spark, dir).count()
    assert(codes.count() == nVecs)
    (0 until 8).foreach { m =>
      val bad = codes.filter(col(s"c$m") < 0 || col(s"c$m") >= 16).count()
      assert(bad == 0, s"subspace $m has out-of-range codes")
    }
  }

  test("reranked PQ: exactly one neighbor per query, never the query itself") {
    val out = Similarity.annPq(spark, dir)
    val n = out.count()
    assert(out.select(col("q_id")).distinct().count() == n)
    assert(out.filter(col("q_id") === col("nn_id")).count() == 0)
    assert(n > 0)
  }

  test("the exact rerank over the ADC shortlist finds at least as many true neighbors as pure ADC top-1") {
    import org.apache.spark.sql.DataFrame
    // exact top-1 per query over the same query set
    val all = Tables.embeddings(spark, dir)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(Similarity.dot(col("v"), col("v"))))
    val q = all.filter(col("vec_id") < 200)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("sim").desc, col("nn_id"))
    val exact1 = broadcast(q).join(all, col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("nn_id"),
        (Similarity.dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("sim"))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") === 1)
      .select(col("q_id"), col("nn_id"))

    def hits(ans: DataFrame): Long =
      ans.select(col("q_id"), col("nn_id")).join(exact1, Seq("q_id", "nn_id")).count()

    val adcHits = hits(Similarity.pqTopK(spark, dir, 1))
    val rerankHits = hits(Similarity.annPq(spark, dir))
    assert(rerankHits >= adcHits, s"rerank $rerankHits < adc $adcHits")
    assert(rerankHits > 0, "rerank must find at least one true neighbor on the fixture")
  }
}
