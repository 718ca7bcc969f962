package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ngramMd5
import graft.SparkTestSession

/** Pins the native NgramMd5 byte-pass expression to the reference
  * transform+slice+md5 formulation — the contract that keeps every gram
  * consumer (x_dup_spans, x_decontam) exactly DuckDB-replicable.
  */
class NgramMd5Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def reference(toks: org.apache.spark.sql.Column, n: Int) =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => md5(concat_ws(" ", slice(toks, i + 1, lit(n))))))

  test("parity with the HOF formulation on the real corpus, n=4 and n=8") {
    val toks = regexp_extract_all(lower(col("text")), lit("\\S+"), lit(0))
    val docs = spark.read.parquet(s"${SparkTestSession.sfDir}/documents.parquet")
      .select(col("doc_id"), toks.as("toks"))
    Seq(4, 8).foreach { n =>
      val diff = docs.select(
          ngramMd5(col("toks"), n).as("fast"), reference(col("toks"), n).as("ref"))
        .filter(col("fast") =!= col("ref"))
      assert(diff.count() == 0, s"n=$n")
    }
  }

  test("edge cases: short docs, exact-length docs, multibyte tokens, repeated separators") {
    val rows = Seq(
      "a b c",                       // shorter than n=4 -> no grams
      "a b c d",                     // exactly n -> one gram
      "héllo wörld ünïcode tøkens x",// multibyte UTF-8 bytes must hash identically
      "a a a a a a"                  // identical tokens, overlapping grams
    ).toDF("text")
      .select(regexp_extract_all(col("text"), lit("\\S+"), lit(0)).as("toks"))
    val got = rows.select(ngramMd5(col("toks"), 4).as("fast"), reference(col("toks"), 4).as("ref"))
      .collect()
    got.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
    assert(got(0).getSeq[String](0).isEmpty)
    assert(got(1).getSeq[String](0).size == 1)
  }

  test("null elements follow concat_ws semantics — token and separator vanish, slot remains") {
    val rows = spark.range(1).select(
      array(lit("a"), lit(null).cast("string"), lit("b"), lit("c"), lit(null).cast("string"))
        .as("toks"))
    Seq(2, 3, 4).foreach { n =>
      val got = rows.select(ngramMd5(col("toks"), n).as("fast"), reference(col("toks"), n).as("ref"))
        .collect()(0)
      assert(got.getSeq[String](0) == got.getSeq[String](1), s"n=$n")
    }
  }

  test("the digest matches java's own md5 of the joined gram text") {
    val toks = Seq("alpha", "beta", "gamma", "delta").toDF("t")
      .agg(collect_list(col("t")).as("toks"))
    val hex = toks.select(ngramMd5(col("toks"), 4)).collect()(0).getSeq[String](0).head
    val md = java.security.MessageDigest.getInstance("MD5")
    val want = md.digest("alpha beta gamma delta".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    assert(hex == want)
  }
}
