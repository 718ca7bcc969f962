package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: print the formatted physical plan of one catalog entry —
  * the .explain feedback loop for checking pushdown, broadcast choices,
  * and exchange reuse without editing code.
  *
  * Usage: sbt "Test/runMain graft.tools.ExplainOne q_name [sfDir]"
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new org.apache.spark.sql.graftbridge.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries(args(0))(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
