package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import graft.{PlanTest, SparkTestSession}

/** The char-bigram LM typicality scorer: hand-computed known answers, the
  * gibberish-scores-lower property, and the plan law that the model joins
  * by broadcast with no shuffle below it (the corpus bigram stream runs at
  * scan speed).
  */
class LmBigramSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def write(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("lmbg").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("known answers: counts, freq sums, and integral ppm on a 2-doc corpus") {
    // model over both docs: "abab" -> ab:2, ba:1; "zq" -> zq:1; total 4
    val out = TextAnalysis.lmBigramScore(spark, write(Seq(1L -> "abab", 2L -> "zq")))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1: 3 bigrams, freq_sum = 2+1+2 = 5, ppm = 5_000_000 div 12
    assert(out(1L) == ((3L, 5L, 416666L)), s"doc1: ${out(1L)}")
    // doc 2: 1 bigram, freq_sum = 1, ppm = 1_000_000 div 4
    assert(out(2L) == ((1L, 1L, 250000L)), s"doc2: ${out(2L)}")
  }

  test("gibberish scores below corpus-typical text") {
    val typical = "the table the table the table"
    val rows = (1L to 8L).map(i => i -> typical) :+ (9L -> "qzxjvkwpfy qzxjvkwpfy")
    val out = TextAnalysis.lmBigramScore(spark, write(rows))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(9L) < out(1L),
      s"gibberish ppm ${out(9L)} must be below typical ppm ${out(1L)}")
  }

  test("model joins by broadcast; only the per-doc rollup crosses the wire") {
    val nodes = PlanTest.executedNodes(
      TextAnalysis.lmBigramScore(spark, SparkTestSession.sfDir))
    val joins = nodes.collect { case j: BroadcastHashJoinExec => j }
    assert(joins.nonEmpty, "expected the broadcast model join")
    // The streamed side is the per-(doc, bigram) COUNT rollup, not the
    // instance stream: any exchange below the model join must sit above a
    // partial hash aggregate (map-side combine), so what crosses the wire
    // is alphabet²-bounded per document — never one row per character
    // position.
    val bigramJoin = joins.find(_.leftKeys.exists(_.references.exists(_.name == "bg")))
      .orElse(joins.headOption).get
    val sub = PlanTest.subtree(bigramJoin.left)
    val readsCachedRollup =
      sub.exists(_.getClass.getSimpleName.contains("InMemoryTableScan"))
    val streamedShuffles = sub.collect { case e: ShuffleExchangeExec => e }
    assert(readsCachedRollup || streamedShuffles.nonEmpty,
      "expected the cached rollup scan or its exchange on the streamed side")
    streamedShuffles.foreach { e =>
      val childStr = e.child.toString
      assert(childStr.contains("HashAggregate") && childStr.contains("partial"),
        s"every streamed-side exchange must carry a partial aggregate, not raw instances:\n$e")
    }
  }
}
