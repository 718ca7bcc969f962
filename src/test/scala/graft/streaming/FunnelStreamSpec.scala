package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** The streaming funnel equals the batch funnel EXACTLY — for any slice
  * count (slice boundaries move which micro-batch sees which event, but
  * the strictly-after fold over time-ordered arrival is slice-invariant),
  * and every user is flushed exactly once by the end-of-stream timeout.
  */
class FunnelStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir

  private def batch = graft.ops.MoreQueries.qFunnelSteps(spark, dir)

  private def stream(slices: Int) = {
    val work = java.nio.file.Files.createTempDirectory(s"funnel_spec_$slices").toString
    EventStream.runFunnelFileStream(spark,
      graft.ops.Tables.events(spark, dir), work, slices = slices)
  }

  test("stream output equals the batch funnel for 3 and 5 slices") {
    val expected = batch.collect().map(r => (r.getInt(0), r.getLong(2))).toMap
    for (slices <- Seq(3, 5)) {
      val st = stream(slices).cache()
      val got = Map(
        1 -> st.filter(col("t1") >= 0).count(),
        2 -> st.filter(col("t2") >= 0).count(),
        3 -> st.filter(col("t3") >= 0).count())
      assert(got == expected, s"slices=$slices: $got vs $expected")
      // exactly-once flush: one row per user that has any event
      val users = graft.ops.Tables.events(spark, dir)
        .select(col("user_id")).distinct().count()
      assert(st.count() == users)
      assert(st.select(col("user_id")).distinct().count() == users)
    }
  }

  test("transition stream equals the batch lead-window matrix at 3 and 5 slices") {
    val expected = graft.ops.MoreQueries.qEventTransitions(spark, dir)
    for (slices <- Seq(3, 5)) {
      val work = java.nio.file.Files.createTempDirectory(s"trans_spec_$slices").toString
      val got = EventStream.runTransitionFileStream(spark,
          graft.ops.Tables.events(spark, dir), work, slices = slices)
        .groupBy(col("event_type"), col("next_type"))
        .agg(count(lit(1)).as("n"))
      assert(got.exceptAll(expected).count() == 0 &&
        expected.exceptAll(got).count() == 0, s"slices=$slices diverged")
    }
  }

  test("stage ordering invariant: t1 <= t2 <= t3 wherever set, strictly after") {
    val st = stream(4)
    assert(st.filter(col("t2") >= 0 && col("t2") <= col("t1")).count() == 0)
    assert(st.filter(col("t3") >= 0 && col("t3") <= col("t2")).count() == 0)
    assert(st.filter(col("t2") >= 0 && col("t1") < 0).count() == 0,
      "a click stage without a view stage")
    assert(st.filter(col("t3") >= 0 && col("t2") < 0).count() == 0,
      "a purchase stage without a click stage")
  }
}
