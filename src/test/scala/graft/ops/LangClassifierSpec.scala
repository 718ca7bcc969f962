package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Structural laws of the learned language classifier
  * (`x_lang_classifier`) beyond the oracle's end-to-end hash: the
  * confusion matrix must PARTITION the held-out split (every held-out doc
  * classified exactly once), predictions must come from the trained label
  * set, and the integral scorer must be invocation-deterministic (the
  * whole design rides on exact ppb arithmetic — a float scorer would make
  * argmax ties engine- and partitioning-dependent).
  */
class LangClassifierSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = SparkTestSession.sfDir

  test("confusion matrix partitions the held-out split over trained labels") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val held = docs.filter(col("doc_id") % 5 === 0).count()
    val cm = TextAnalysis.langClassifier(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(cm.map(_._3).sum == held, "every held-out doc must be classified exactly once")
    val langs = docs.select(col("lang")).distinct().collect().map(_.getString(0)).toSet
    assert(cm.forall { case (a, p, _) => langs(a) && langs(p) })
  }

  test("the scorer is deterministic across invocations") {
    def run() = TextAnalysis.langClassifier(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).sortBy(t => (t._1, t._2)).toSeq
    assert(run() == run())
  }
}
