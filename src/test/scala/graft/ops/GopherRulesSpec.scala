package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Semantics of the Gopher rule battery (x_gopher_rules): each planted
  * document fails exactly one rule, the audit counts them independently,
  * and a clean document passes all five.
  */
class GopherRulesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("gopher").toString
    rows.toDF("doc_id", "lang", "text")
      .withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("each planted violation fails exactly its rule; the clean doc passes all") {
    val passAll = "the brown fox jumps over a fence and then wanders back home again today" // 14 words
    val failWords = "the and word word word" // 5 words < 10, everything else fine
    val failMeanLen = "the a ab cd ef gh ij kl mn op qr st" // mean word length 2 < 3
    val failAlpha = "the a apple banana cherry durian 1111 2222 3333 4444" // 6/10 alpha < 80%
    val failSymbol = "the a tree bush plant grass stone river cloud storm " +
      "light sound mouse horse sheep goat goose # # #" // 3 '#' over 20 words > 10%
    val failStop = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mude oops pods" // 0 stopwords
    val d = docsDir(Seq(
      (1L, "en", passAll), (2L, "en", failWords), (3L, "en", failMeanLen),
      (4L, "en", failAlpha), (5L, "en", failSymbol), (6L, "en", failStop),
      (7L, "fr", passAll)))
    val rows = TextAnalysis.gopherRules(spark, d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    assert(rows("en") == ((6L, 1L, 1L, 1L, 1L, 1L, 1L)),
      s"en audit was ${rows("en")}: (n_docs, fail_word_count, fail_word_len, " +
        "fail_alpha, fail_symbol, fail_stop, n_pass)")
    assert(rows("fr") == ((1L, 0L, 0L, 0L, 0L, 0L, 1L)))
  }

  test("a document failing several rules counts once per failed rule, never in n_pass") {
    // 5 two-char words, no stopwords: fails word count, mean length, and stopwords
    val d = docsDir(Seq((1L, "en", "ab cd ef gh ij")))
    val r = TextAnalysis.gopherRules(spark, d).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(6), r.getLong(7)) ==
      ((1L, 1L, 1L, 1L, 0L)))
  }
}
