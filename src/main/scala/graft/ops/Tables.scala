package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table access for the operator catalog. Reads are schema-on-read
  * with column pruning + predicate pushdown left to Catalyst; at 100 TB these
  * tables would be partitioned/bucketed, but the reading code is identical.
  */
object Tables {
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  /** The events table stores TIMESTAMP(NANOS) which Spark's parquet reader
    * rejects by default; with `spark.sql.legacy.parquet.nanosAsLong=true`
    * (set at session build — see Verify/Bench and the test fixtures; this
    * reader is deliberately side-effect free) nanos arrive as longs and are
    * converted to a micros timestamp with exact integer division (a double
    * division would lose precision: 2026-epoch nanos ~ 1.8e18 >> 2^53).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df =
      try t(s, d, "events")
      catch { case e: org.apache.spark.sql.AnalysisException =>
        throw new IllegalStateException(
          "reading the events table requires spark.sql.legacy.parquet.nanosAsLong=true " +
            "at session build (static for the parquet schema converter)", e)
      }
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // nanos read as long
        df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // Files written with a session-local (NTZ) timestamp — e.g. by
        // engines whose plain TIMESTAMP is timezone-free. unix_millis and
        // friends reject NTZ; with the engine's session timezone pinned to
        // UTC the cast is wall-time-identical, so every downstream
        // epoch-math and formatting path behaves exactly as for the
        // driver-written nanos tables.
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case _ => df // already a proper timestamp column
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
