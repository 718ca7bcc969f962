package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Span-level decontamination (x_decontam_scrub): the benchmark passage is
  * excised exactly — planted range, verified rewrite hash — and clean
  * documents never appear in the output.
  */
class DecontamScrubSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("descrub").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def toks(prefix: String, n: Int): Seq[String] =
    (1 to n).map(i => s"$prefix$i")

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("the planted benchmark passage is excised exactly; clean docs stay out") {
    val passage = toks("bench", 6)
    val before = toks("pre", 7)
    val after = toks("post", 5)
    val contaminated = (before ++ passage ++ after).mkString(" ")
    val clean = toks("clean", 20).mkString(" ")
    // doc 1 IS the benchmark set (doc_id < 10); 100/101 are the corpus.
    val d = docsDir(Seq(
      (1L, passage.mkString(" ")), (100L, contaminated), (101L, clean)))
    val rows = TextAnalysis.decontamScrub(spark, d).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(100L))
    val r = rows.head
    assert(r.getInt(1) == 18 && r.getInt(2) == 12)
    assert(r.getString(3) == md5Hex((before ++ after).mkString(" ")))
  }

  test("a corpus doc equal to the benchmark text scrubs to the empty stream") {
    val passage = toks("exact", 9)
    val d = docsDir(Seq((2L, passage.mkString(" ")), (150L, passage.mkString(" "))))
    val r = TextAnalysis.decontamScrub(spark, d).collect().head
    assert(r.getLong(0) == 150L && r.getInt(1) == 9 && r.getInt(2) == 0)
    assert(r.getString(3) == md5Hex(""))
  }

  test("two separated benchmark hits excise as two spans, keeping the gap") {
    val p1 = toks("one", 5)
    val p2 = toks("two", 5)
    val gap = toks("gap", 8) // > gram size 4, so the islands stay separate
    val head = toks("head", 3)
    val d = docsDir(Seq(
      (1L, p1.mkString(" ")), (2L, p2.mkString(" ")),
      (200L, (head ++ p1 ++ gap ++ p2).mkString(" "))))
    val r = TextAnalysis.decontamScrub(spark, d).collect().head
    assert(r.getLong(0) == 200L && r.getInt(1) == 21 && r.getInt(2) == 11)
    assert(r.getString(3) == md5Hex((head ++ gap).mkString(" ")))
  }
}
