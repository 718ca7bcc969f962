package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the native one-pass [[org.apache.spark.sql.graftbridge.CharBigrams]]
  * expression element-for-element to the transform+substr formulation it
  * replaced in the LM bigram model build (the independent parity reference,
  * same discipline as NgramMd5's spec). */
class CharBigramsSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private def reference = (t: org.apache.spark.sql.Column) =>
    transform(sequence(lit(1), length(t) - 1), i => t.substr(i, lit(2)))

  test("CharBigrams equals the substr formulation on real corpus text") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(lower(col("text")).as("t")).filter(length(col("t")) >= 2)
    val mismatches = docs.select(
        org.apache.spark.sql.graftbridge.charBigrams(col("t")).as("fast"),
        reference(col("t")).as("ref"))
      .filter(col("fast") =!= col("ref"))
      .count()
    assert(mismatches == 0)
  }

  test("CharBigrams: empty, single-char, multi-byte, and non-BMP strings") {
    val rows = Seq("", "a", "ab", "abc", "héllo", "日本語テスト", "a😀b😀", "😀😀")
      .toDF("t")
    // Parity vs the substr reference only where the reference is defined:
    // on len < 2 the transform+substr shape degenerates (sequence(1, 0)
    // DESCENDS), which is why the production consumer filters length >= 2
    // before it — CharBigrams returns the sane empty array there instead,
    // pinned by the shape law below.
    val bad = rows.filter(length(col("t")) >= 2).select(col("t"),
        org.apache.spark.sql.graftbridge.charBigrams(col("t")).as("fast"),
        reference(col("t")).as("ref"))
      .filter(col("fast") =!= col("ref"))
      .collect()
    assert(bad.isEmpty, bad.mkString(", "))
    // Shape law: max(0, numChars - 1) bigrams of 2 codepoints each.
    val shape = rows.select(length(col("t")).as("n"),
        size(org.apache.spark.sql.graftbridge.charBigrams(col("t"))).as("k"))
      .collect()
    shape.foreach(r => assert(r.getInt(1) == math.max(0, r.getInt(0) - 1)))
  }
}
