package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Semantics of the per-source length calibration (x_source_outliers):
  * the z-score is computed against each doc's OWN source distribution,
  * so a doc can be a 2σ outlier inside its source while being perfectly
  * ordinary corpus-wide — the case an absolute threshold cannot express.
  */
class SourceOutliersSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("srcoutlier").toString
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def doc(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")

  test("a doc normal corpus-wide is flagged when anomalous for its own source") {
    // source sA: nine 10-token docs + one 50-token doc (its outlier).
    // source sB: docs of 40..58 tokens — 50 tokens is MID-range there.
    val a = (1L to 9L).map(i => (i, doc(10), "sA")) :+ ((10L, doc(50), "sA"))
    val b = (11L to 20L).map(i => (i, doc(40 + 2 * (i - 11).toInt), "sB"))
    val res = TextAnalysis.sourceOutliers(spark, docsDir(a ++ b))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (nA, sumA, gt1A, gt2A) = res("sA")
    assert((nA, sumA) == ((10L, 140L)))
    // mean 14, var = (9*100+2500)/10 - 196 = 144, std 12: the 50-token doc
    // is z=3 -> counted in both bands; the 10-token docs are z=1/3.
    assert(gt1A == 1L && gt2A == 1L, s"sA bands: gt1=$gt1A gt2=$gt2A")
    val (_, _, gt1B, gt2B) = res("sB")
    // sB is a flat ramp: its extremes sit near 1.6 sigma, nothing at 2.
    assert(gt2B == 0L, s"the 50-token doc must NOT be an outlier by sB's scale (gt2=$gt2B)")
  }

  test("zero-variance source flags nothing") {
    val rows = (1L to 5L).map(i => (i, doc(12), "sC"))
    val res = TextAnalysis.sourceOutliers(spark, docsDir(rows)).collect()
    assert(res.length == 1)
    assert(res.head.getLong(3) == 0L && res.head.getLong(4) == 0L)
  }
}
