package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import graft.{PlanTest, SparkTestSession}

/** The per-language CDF quality gate: threshold semantics on a known
  * distribution, the strict-greater-than keep contract on a degenerate one,
  * and the plan law that makes it scale — the percentile window runs over
  * the (lang, n_tokens) histogram aggregate, never over the corpus, and the
  * thresholds come back via a broadcast join.
  */
class QualityGateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String, Int)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("qgate").toString
    rows.map { case (id, lang, nTok) => (id, Seq.fill(nTok)("w").mkString(" "), lang) }
      .toDF("doc_id", "text", "lang")
      .withColumn("source", lit("t")).withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("threshold is the exact bottom-decile cap; gate keeps strictly above it") {
    // en: token counts 1..20 -> n=20, ceil(n/10)=2 -> thr = 2, kept = 18
    // de: all four docs have 5 tokens -> thr = 5, strict > keeps none
    val rows = (1 to 20).map(i => (i.toLong, "en", i)) ++
      (101 to 104).map(i => (i.toLong, "de", 5))
    val out = TextAnalysis.qualityGateCdf(spark, docsDir(rows))
      .collect().map(r => r.getString(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("en") == ((2, 20L, 18L, (3 to 20).sum.toLong)), s"en row: ${out("en")}")
    assert(out("de") == ((5, 4L, 0L, 0L)), s"de row: ${out("de")}")
  }

  test("percentile window runs over the histogram aggregate, thresholds broadcast back") {
    val nodes = PlanTest.executedNodes(
      TextAnalysis.qualityGateCdf(spark, SparkTestSession.sfDir))
    val windows = nodes.collect { case w: WindowExec => w }
    assert(windows.nonEmpty, "expected the CDF window in the executed plan")
    def hasAggBelow(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      PlanTest.subtree(p).exists {
        case _: HashAggregateExec | _: ObjectHashAggregateExec | _: SortAggregateExec => true
        case _ => false
      }
    windows.foreach { w =>
      assert(w.children.forall(hasAggBelow),
        s"window must consume the (lang, n_tokens) histogram aggregate, not the raw scan:\n$w")
    }
    assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "thresholds must rejoin the corpus via a broadcast hash join")
  }
}
