package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: time one catalog query N times in a fresh session —
  * separates true (warm) operator cost from one-time codegen/JIT cost,
  * which bench-session numbers conflate (that distinction is how the
  * codegen-cache eviction at 115 queries was isolated).
  * Usage: Test/runMain graft.tools.TimeOne <sfDir> <name> [reps] */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val name = args(1)
    val n = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new org.apache.spark.sql.graftbridge.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      println(f"TIMEONE $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
