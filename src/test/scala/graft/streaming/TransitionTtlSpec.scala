package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkTestSession

/** The idle-TTL transition stream: emissions are UNCHANGED for every pair
  * whose gap stays inside the horizon, pairs straddling an expired idle gap
  * are dropped (separate visits), and the state store is bounded — every
  * user idle past the horizon is evicted, so a long replay ends with zero
  * carried state instead of one row per user-ever.
  *
  * Fixture: three users over a 50-minute span —
  *   u1: view@0, click@1, purchase@2        (gaps ≤ 1 min)
  *   u2: view@0, click@50                   (one 50-min idle gap)
  *   u3: view every 5 min, 0..50 (11 events) — the "watermark clock" that
  *       keeps event time advancing between u2's two visits.
  * With a 10-minute TTL, u2's cross-gap (view→click) is the only pair the
  * horizon drops: 12 pairs instead of the batch matrix's 13.
  */
class TransitionTtlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val baseMs = 1700000000000L // fixed epoch base, minute-aligned

  private def ts(minute: Int) = new java.sql.Timestamp(baseMs + minute * 60000L)

  private lazy val fixture: DataFrame = {
    import spark.implicits._
    val rows = Seq(
      (1L, ts(0), "view", 100L), (1L, ts(1), "click", 101L), (1L, ts(2), "purchase", 102L),
      (2L, ts(0), "view", 200L), (2L, ts(50), "click", 201L)
    ) ++ (0 to 10).map(i => (3L, ts(i * 5), "view", 300L + i))
    rows.toDF("user_id", "ts", "event_type", "event_id")
  }

  /** Stage → stream → collect, returning the emitted pairs and the state
    * rows reported by the LAST progress that carries state metrics. */
  private def run(idleTtlMs: Option[Long], slices: Int = 6): (DataFrame, Long) = {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("trans_ttl").toString
    assert(EventStream.stageEventTimeSlices(spark, fixture, work, slices).nonEmpty)
    val src = spark.readStream
      .schema(StructType(Seq(
        StructField("user_id", LongType),
        StructField("ts", TimestampType),
        StructField("event_type", StringType),
        StructField("event_id", LongType))))
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$work/stage")
      .withWatermark("ts", "1 minute")
      .as[EventStream.TransInput]
    val out = idleTtlMs.fold(EventStream.transitionStream(src))(
      EventStream.transitionStreamTtl(src, _))
    val q = out.writeStream
      .format("parquet")
      .option("path", s"$work/out")
      .option("checkpointLocation", s"$work/ckpt")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val stateRows = q.recentProgress.reverse
      .find(_.stateOperators.nonEmpty)
      .map(_.stateOperators.head.numRowsTotal)
      .getOrElse(-1L)
    (spark.read.parquet(s"$work/out").filter(col("user_id") >= 0), stateRows)
  }

  private def pairs(df: DataFrame): Set[(Long, String, String)] =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet

  private val allPairs: Set[(Long, String, String)] =
    Set((1L, "view", "click"), (1L, "click", "purchase"), (2L, "view", "click")) ++
      (0 until 10).map(_ => (3L, "view", "view"))

  test("in-horizon pairs are all emitted; the cross-gap pair is dropped; state drains to zero") {
    val (out, stateRows) = run(Some(10 * 60000L))
    assert(pairs(out) == allPairs - ((2L, "view", "click")))
    // u3 emits one row per 5-min step even though the SET collapses them
    assert(out.filter(col("user_id") === 3).count() == 10)
    // every user's last event is > TTL before the fire sentinel's
    // watermark, so the final batch evicts everything
    assert(stateRows == 0L, s"expected drained state, got $stateRows rows")
  }

  test("a horizon wider than every gap reproduces the NoTimeout output exactly") {
    val (ttlOut, _) = run(Some(60 * 60000L)) // 60 min > the 50-min span
    val (rawOut, rawState) = run(None)
    assert(pairs(ttlOut) == allPairs && pairs(rawOut) == allPairs)
    assert(ttlOut.count() == rawOut.count())
    // the NoTimeout variant is the one that carries state forever
    assert(rawState == 3L, s"NoTimeout should hold one row per user, got $rawState")
  }

  test("slice boundaries do not change TTL semantics") {
    for (slices <- Seq(3, 9)) {
      val (out, _) = run(Some(10 * 60000L), slices)
      assert(pairs(out) == allPairs - ((2L, "view", "click")), s"slices=$slices")
    }
  }
}
