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

  test("CharBigrams: malformed UTF-8 (truncated multi-byte tails) clamps, never reads past the string") {
    // r18 ADVICE asked this divergence to be pinned or documented. It is a
    // DOCUMENTED DIVERGENCE: on a final codepoint that CLAIMS more bytes
    // than remain, CharBigrams clamps the end offset to the byte length,
    // while Spark's own substr walk advances past it and copies through
    // the unclamped offset — i.e. UTF8String.substring reads bytes BEYOND
    // the string's logical bounds out of the shared backing array
    // (measured here: substr's last "bigram" of [61 62 E6] carried two
    // neighbouring buffer bytes). The clamp is the sane behavior, so the
    // law pinned on malformed input is CharBigrams' own: the shape law
    // holds, and every emitted bigram is a byte-contiguous slice OF THE
    // INPUT (contains/endsWith are byte-wise, so they fail on any
    // overrun). Production consumers only feed valid UTF-8 (lowercased
    // corpus text), where the element-for-element parity suites above
    // apply; malformed strings are built by casting raw binary — Spark
    // performs no UTF-8 validation on the cast.
    val fixtures: Seq[Array[Byte]] = Seq(
      Array('a'.toByte, 'b'.toByte, 0xE6.toByte), // 3-byte lead, 0 continuation bytes
      Array('a'.toByte, 0xC3.toByte), // 2-byte lead, truncated at end
      Array(0xC3.toByte, 0x28.toByte), // invalid continuation byte
      Array(0xF0.toByte, 0x9F.toByte), // 4-byte lead, half missing
      Array(0xE6.toByte), // lone lead byte
      Array('x'.toByte, 0xE6.toByte, 0x97.toByte)) // 3-byte lead, 1 of 2 continuations
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(fixtures.map(Row(_)), 1),
      StructType(Seq(StructField("b", BinaryType))))
      .select(col("b").cast("string").as("t"))
      .withColumn("fast", org.apache.spark.sql.graftbridge.charBigrams(col("t")))
    // Shape law holds on malformed bytes too (length() uses the same walk).
    val shape = df.select(length(col("t")).as("n"), size(col("fast")).as("k")).collect()
    shape.foreach(r => assert(r.getInt(1) == math.max(0, r.getInt(0) - 1)))
    // No overrun: every bigram's bytes occur inside the input, and the
    // final bigram is a byte-suffix of it (the clamp at work).
    val overruns = df.filter(size(col("fast")) > 0).filter(
        exists(col("fast"), bg => !col("t").contains(bg)) ||
          !col("t").endsWith(element_at(col("fast"), -1)))
      .collect()
    assert(overruns.isEmpty, overruns.mkString(", "))
  }
}
