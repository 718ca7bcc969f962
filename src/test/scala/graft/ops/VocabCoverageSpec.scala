package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import graft.{PlanTest, SparkTestSession}

/** Vocabulary-coverage audit: known-answer OOV accounting on a fixture
  * whose vocab cut is hand-checkable, the deterministic tie-break at the
  * cut, and the plan laws — top-k vocab via TakeOrderedAndProject (heaps,
  * no global sort) and a broadcast left join for the coverage pass.
  */
class VocabCoverageSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("OOV counts and the lexicographic tie-break at the vocab cut") {
    // counts: aa x4, bb x3, cc x3, dd x1 -> top-2 vocab = {aa, bb} (bb < cc at the tie)
    val rows = Seq(
      (1L, "aa aa bb cc", "en"),
      (2L, "aa aa bb bb cc cc dd", "de"))
    val dir = java.nio.file.Files.createTempDirectory("vocab").toString
    rows.toDF("doc_id", "text", "lang")
      .withColumn("source", lit("t")).withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.vocabCoverage(spark, dir, vocabSize = 2)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // en: 4 tokens, cc is OOV -> 1; de: 7 tokens, cc cc dd -> 3
    assert(out("en") == ((4L, 1L, 250000L)), s"en: ${out("en")}")
    assert(out("de") == ((7L, 3L, 428571L)), s"de: ${out("de")}")
  }

  test("vocab plans as TakeOrderedAndProject; coverage joins by broadcast") {
    val nodes = PlanTest.executedNodes(
      TextAnalysis.vocabCoverage(spark, SparkTestSession.sfDir))
    assert(nodes.exists(_.isInstanceOf[TakeOrderedAndProjectExec]),
      "top-k vocab must plan as TakeOrderedAndProject, not a global sort")
    assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "coverage pass must join the broadcast vocab")
  }
}
