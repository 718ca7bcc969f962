package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Largest-remainder stratified sampling (x_stratified_sample): quotas
  * follow the Hamilton allocation exactly, the sample hits the budget
  * exactly, membership is deterministic, and remainder seats go to the
  * largest fractional remainders.
  */
class StratifiedSampleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** strata: (lang, source, n_docs); doc_ids assigned sequentially. */
  private def docsDir(strata: Seq[(String, String, Int)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("strat").toString
    var id = 0L
    val rows = strata.flatMap { case (l, src, n) =>
      (1 to n).map { _ => id += 1; (id, l, src) }
    }
    rows.toDF("doc_id", "lang", "source")
      .withColumn("text", concat(lit("doc "), col("doc_id").cast("string")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("exact Hamilton allocation: floors plus one seat to the largest remainder") {
    // N=100, T=10: quotas 4.7 / 3.3 / 2.0 -> floors 4/3/2, one leftover
    // seat to the .7 remainder -> 5/3/2.
    val d = docsDir(Seq(("en", "s0", 47), ("en", "s1", 33), ("fr", "s0", 20)))
    val got = TextAnalysis.stratifiedSample(spark, d, t = 10)
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("k"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("en", "s0") -> 5L, ("en", "s1") -> 3L, ("fr", "s0") -> 2L))
  }

  test("sample size is exactly T and membership is deterministic across runs") {
    val d = docsDir(Seq(("en", "s0", 40), ("en", "s1", 25), ("fr", "s0", 20), ("zh", "s2", 15)))
    val a = TextAnalysis.stratifiedSample(spark, d, t = 17)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val b = TextAnalysis.stratifiedSample(spark, d, t = 17)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(a.size == 17)
    assert(a == b)
  }

  test("remainder ties break by stratum key (deterministic, not arbitrary)") {
    // Four equal strata of 5, T=2: bases all 0, remainders all equal ->
    // both seats go to the two lexicographically-smallest strata.
    val d = docsDir(Seq(("de", "s0", 5), ("en", "s0", 5), ("fr", "s0", 5), ("zh", "s0", 5)))
    val got = TextAnalysis.stratifiedSample(spark, d, t = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("de", "s0"), ("en", "s0")))
  }
}
