package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness (r18): dump `.explain("formatted")` for a list of catalog
  * entries to files — the committed plans/r18/<name>_{before,after}.txt
  * evidence. Building an entry's frame RUNS any eager lifecycle inside it
  * (streams, DML), so the dumped plan is the entry's declared final frame,
  * exactly what the driver's Verify materializes.
  * Usage: Test/runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> <n1,n2,...>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val suffix = args(2)
    val names = args(3).split(",").toSeq
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new org.apache.spark.sql.graftbridge.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), plan)
      println(s"PLANDUMP wrote ${name}_$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
