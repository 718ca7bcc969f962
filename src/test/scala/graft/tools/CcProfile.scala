package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiler for the CC entry's phase costs: whole entry (cold/warm) vs
  * the underlying sketch — the delta is the clustering kernel's overhead.
  * Usage: sbt "Test/runMain graft.tools.CcProfile [sfDir]" */
object CcProfile {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new org.apache.spark.sql.graftbridge.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    t("whole entry cold") { graft.ops.Dedup.queries("x_dedup_cc")(spark, d).count() }
    t("whole entry warm") { graft.ops.Dedup.queries("x_dedup_cc")(spark, d).count() }
    t("simhash pairs only") { graft.ops.Dedup.queries("x_dedup_simhash")(spark, d).count() }
    spark.stop()
  }
}
