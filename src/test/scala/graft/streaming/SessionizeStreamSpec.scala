package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Parity theorem for the REAL streaming sessionizer: running
  * [[EventStream.runSessionizeFileStream]] (file source, one micro-batch per
  * event-time slice, event-time-timeout flush) over the sf0.001 events table
  * must reproduce the batch lag/cumsum formulation (`q_sessionize_batch`)
  * row-for-row — and must do so for ANY slice count, since the slices are
  * contiguous in event time and the watermark only ever advances.
  */
class SessionizeStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir

  private def batchKey(): Set[(Long, Long, Long, Long)] =
    graft.ops.MoreQueries.qSessionizeBatch(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  private def streamKey(slices: Int): Set[(Long, Long, Long, Long)] = {
    import org.apache.spark.sql.expressions.Window
    val work = java.nio.file.Files.createTempDirectory(s"graft_sessionize_spec_$slices").toString
    val sessions = EventStream.runSessionizeFileStream(
      spark, graft.ops.Tables.events(spark, dir), work, slices = slices)
    val w = Window.partitionBy(col("user_id")).orderBy(col("first_ms"))
    sessions.select(
        col("user_id"),
        row_number().over(w).cast("long").as("sess_idx"),
        col("n_events"),
        (col("last_ms") - col("first_ms")).as("duration_ms"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
  }

  test("file-stream sessionization equals the batch window formulation (3 slices)") {
    val b = batchKey()
    val s = streamKey(3)
    assert(s == b, s"stream-only=${(s -- b).take(3)} batch-only=${(b -- s).take(3)}")
  }

  test("slice count does not change the result (1 slice = whole table in one batch)") {
    assert(streamKey(1) == batchKey())
  }
}
