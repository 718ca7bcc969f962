package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for all suites (sbt forks one test JVM). */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet stores TIMESTAMP(NANOS); Tables.events is read-only
      // and requires this at session build.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(new org.apache.spark.sql.graftbridge.GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}
