package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Runtime bloom-filter join pruning: when a shuffle join's small side
  * carries a selective predicate, Spark can build a bloom filter over its
  * join keys at runtime and inject `bloom_filter_might_contain` into the
  * BIG side's scan — rows that cannot match are dropped before the shuffle.
  * At 100 TB this is the difference between shuffling the whole fact table
  * and shuffling the ~matching slice; nothing in user code changes.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("a selective dimension filter injects a bloom filter into the fact-side scan") {
    val dir = java.nio.file.Files.createTempDirectory("bloom").toString
    spark.range(0, 200000)
      .select(col("id").as("k"), (col("id") * 2).as("payload"))
      .write.mode("overwrite").parquet(s"$dir/fact")
    spark.range(0, 20000)
      .select(col("id").as("k2"), (col("id") % 97).as("attr"))
      .write.mode("overwrite").parquet(s"$dir/dim")
    val fact = spark.read.parquet(s"$dir/fact")
    val dim = spark.read.parquet(s"$dir/dim").filter(col("attr") === 7) // selective

    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") { // shuffle join, so pruning pays
      val j = fact.join(dim, col("k") === col("k2")).agg(count(lit(1)), sum(col("payload")))
      val row = j.collect().head
      // correctness: every dim row with attr=7 exists in fact exactly once
      val expected = dim.count()
      assert(row.getLong(0) == expected)
      val optimized = j.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"no runtime bloom filter injected:\n$optimized")
    }
  }
}
