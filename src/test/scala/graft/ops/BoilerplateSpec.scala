package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Semantics of per-source frequency-thresholded boilerplate detection
  * (x_boilerplate_grams / x_boilerplate_scrub): a 3-gram is boilerplate
  * iff ≥3 DISTINCT documents of the SAME source carry it; the scrub
  * removes EVERY covered position (no canonical keeper — contrast the
  * dup-span scrub's keep-first rule).
  */
class BoilerplateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("boilerspec").toString
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def toks(prefix: String, n: Int): Seq[String] =
    (1 to n).map(i => s"$prefix$i")

  // "header one two" is the planted 3-token template.
  private val tpl = Seq("header", "one", "two")

  test("a 3-gram in >=3 docs of one source is boilerplate there; 2 docs is not") {
    val rows = Seq(
      (1L, (tpl ++ toks("a", 5)).mkString(" "), "sA"),
      (2L, (toks("b", 4) ++ tpl).mkString(" "), "sA"),
      (3L, (tpl ++ toks("c", 6)).mkString(" "), "sA"),
      // only two sB docs carry the template: below the floor
      (4L, (tpl ++ toks("d", 5)).mkString(" "), "sB"),
      (5L, (tpl ++ toks("e", 5)).mkString(" "), "sB"),
      (6L, toks("f", 9).mkString(" "), "sB"))
    val out = Dedup.boilerplateGrams(spark, docsDir(rows))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // Only "header one two" recurs in >=3 sA docs (once per doc); the two
    // sB occurrences are below the floor, so sB emits no row at all.
    assert(out == Set(("sA", 1L, 3L, 3L)))
  }

  test("per-source scoping: 2+2 occurrences across two sources never clear the floor") {
    val rows = Seq(
      (1L, (tpl ++ toks("a", 5)).mkString(" "), "sA"),
      (2L, (tpl ++ toks("b", 5)).mkString(" "), "sA"),
      (3L, (tpl ++ toks("c", 5)).mkString(" "), "sB"),
      (4L, (tpl ++ toks("d", 5)).mkString(" "), "sB"))
    assert(Dedup.boilerplateGrams(spark, docsDir(rows)).count() == 0,
      "4 corpus-wide occurrences split 2+2 across sources must not be boilerplate")
  }

  test("within-doc repetition does not clear the floor: distinct DOCS, not occurrences") {
    val rows = Seq(
      (1L, (tpl ++ toks("x", 4) ++ tpl ++ toks("y", 4) ++ tpl).mkString(" "), "sA"),
      (2L, (tpl ++ toks("z", 6)).mkString(" "), "sA"),
      (3L, toks("w", 9).mkString(" "), "sA"))
    assert(Dedup.boilerplateGrams(spark, docsDir(rows)).count() == 0,
      "five occurrences in two docs must not clear the 3-doc floor")
  }

  test("scrub removes every covered position — including the first occurrence — and only affected docs surface") {
    val rows = Seq(
      (1L, (tpl ++ toks("a", 5)).mkString(" "), "sA"),
      (2L, (toks("b", 4) ++ tpl).mkString(" "), "sA"),
      (3L, (tpl ++ toks("c", 6)).mkString(" "), "sA"),
      (4L, toks("u", 7).mkString(" "), "sA"))
    val out = Dedup.boilerplateScrub(spark, docsDir(rows))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    assert(out.keySet == Set(1L, 2L, 3L), "unaffected doc 4 must not surface")
    // every doc loses exactly the 3 template tokens — doc 1 keeps a1..a5
    assert(out(1L)._1 == 8 && out(1L)._2 == 5)
    assert(out(2L)._1 == 7 && out(2L)._2 == 4)
    assert(out(3L)._1 == 9 && out(3L)._2 == 6)
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String) =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(1L)._3 == md5hex(toks("a", 5).mkString(" ")),
      "surviving stream must be exactly the non-template tokens, in order")
  }

  test("plan shape: the floored gram set broadcasts onto the position stream") {
    val plan = Dedup.boilerplateGrams(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    assert(!plan.contains("SortMergeJoin"), plan.take(1500))
  }

  test("overlapping template occurrences merge into one island (coverage, not per-gram subtraction)") {
    // "header one two header one two" back-to-back in 3 docs: grams at
    // positions 0..3 are all boilerplate; coverage is tokens [0,5] — 6
    // tokens, not 4 grams x 3 tokens.
    val dbl = tpl ++ tpl
    val rows = Seq(
      (1L, (dbl ++ toks("a", 4)).mkString(" "), "sA"),
      (2L, (dbl ++ toks("b", 4)).mkString(" "), "sA"),
      (3L, (dbl ++ toks("c", 4)).mkString(" "), "sA"))
    val out = Dedup.boilerplateScrub(spark, docsDir(rows))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(out(1L) == ((10, 4)), s"expected 6 covered tokens, got ${out(1L)}")
  }
}
