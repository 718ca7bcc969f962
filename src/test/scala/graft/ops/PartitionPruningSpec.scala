package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import graft.SparkTestSession

/** Hive-style partitioned layout + partition pruning: at 100 TB the
  * difference between scanning one date partition and scanning the table is
  * the whole game, and it only works if (a) the writer lays out
  * `col=value/` directories and (b) the reader turns the filter into a
  * PartitionFilter (directory-level skip) instead of a data filter
  * (row-level skip after reading everything).
  */
class PartitionPruningSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("a filter on the partition column prunes directories, not rows") {
    val dir = java.nio.file.Files.createTempDirectory("part-prune").toString
    spark.read.parquet(s"${SparkTestSession.sfDir}/orders.parquet")
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(s"$dir/orders_by_year")

    val table = spark.read.parquet(s"$dir/orders_by_year")
    val years = table.select(col("o_year")).distinct().collect().map(_.getInt(0)).sorted
    assert(years.length > 1, "need multiple partitions for the test to mean anything")
    val target = years.head

    val q = table.filter(col("o_year") === target).agg(count(lit(1)))
    val expected = q.collect().head.getLong(0)
    assert(expected > 0)

    // query stages are leaf nodes to collect(); recurse through them
    def findScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case f: FileSourceScanExec => Seq(f)
      case a: AdaptiveSparkPlanExec => findScans(a.executedPlan)
      case qs: QueryStageExec => findScans(qs.plan)
      case other => other.children.flatMap(findScans)
    }
    val plan = q.queryExecution.executedPlan
    val scans = findScans(plan)
    assert(scans.nonEmpty, s"no file scan found in:\n$plan")
    val scan = scans.head
    // the filter must land on the PARTITION side of the scan...
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "o_year")),
      s"o_year filter not applied as a partition filter: ${scan.partitionFilters}")
    // ...and the scan must actually have skipped the other directories
    val filesRead = scan.metrics("numFiles").value
    val allFiles = new java.io.File(s"$dir/orders_by_year").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("o_year="))
      .flatMap(_.listFiles()).count(_.getName.endsWith(".parquet"))
    assert(filesRead < allFiles,
      s"scan read $filesRead of $allFiles files - no pruning happened")
    // dynamic check: the unpartitioned data filter is gone (nothing to
    // re-filter row-wise once the directory is selected)
    assert(scan.dataFilters.isEmpty, s"unexpected data filters: ${scan.dataFilters}")
  }
}
