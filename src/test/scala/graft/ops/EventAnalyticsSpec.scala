package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Invariants of the funnel and retention operators on the real sf0.001
  * events: funnel step counts are monotone non-increasing and bounded by
  * the user population; retention's offset-0 diagonal is exactly each
  * cohort's size; and the funnel plans one shuffle for all three staged
  * windows plus one for the final global tally.
  */
class EventAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir

  test("funnel steps are monotone and bounded by the user population") {
    val byStep = MoreQueries.qFunnelSteps(spark, dir)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    val nUsers = Tables.events(spark, dir)
      .select(col("user_id")).distinct().count()
    assert(byStep.keySet == Set(1, 2, 3))
    assert(byStep(1) >= byStep(2) && byStep(2) >= byStep(3))
    assert(byStep(1) <= nUsers)
    assert(byStep(3) > 0, "fixture must carry users through the whole funnel")
    // step 1 is exactly the users with at least one view — ties the
    // funnel to the raw stream, independent of the oracle formulation
    val viewers = Tables.events(spark, dir)
      .filter(col("event_type") === "view")
      .select(col("user_id")).distinct().count()
    assert(byStep(1) == viewers)
  }

  test("retention offset-0 equals each cohort's size; later days never exceed it") {
    val ret = MoreQueries.qRetentionCohort(spark, dir).cache()
    val day0 = ret.filter(col("day_offset") === 0)
      .select(col("cohort_day"), col("n_users").as("c0"))
    val cohorts = Tables.events(spark, dir)
      .groupBy(col("user_id")).agg(min(to_date(col("ts"))).as("cohort_day"))
      .groupBy(col("cohort_day")).agg(count(lit(1)).as("n"))
    assert(day0.join(cohorts, "cohort_day")
      .filter(col("c0") =!= col("n")).count() == 0)
    assert(ret.join(day0, "cohort_day")
      .filter(col("n_users") > col("c0")).count() == 0)
    assert(ret.filter(col("day_offset") > 0).count() > 0,
      "fixture must have users returning after day 0")
  }

  test("transition matrix conserves mass: sum = events - users-with-events") {
    // Every user's n-event stream contributes exactly n-1 transitions.
    val total = MoreQueries.qEventTransitions(spark, dir)
      .agg(sum(col("n"))).head().getLong(0)
    val e = Tables.events(spark, dir)
    val expected = e.count() - e.select(col("user_id")).distinct().count()
    assert(total == expected)
    val types = MoreQueries.qEventTransitions(spark, dir)
      .filter(col("event_type") === col("next_type")).count()
    assert(types > 0, "fixture must contain self-transitions")
  }

  test("attribution tiles the purchases; touches are only view/click/none") {
    val att = MoreQueries.qAttributionLastTouch(spark, dir).cache()
    val nPurch = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase").count()
    assert(att.agg(sum(col("n_purchases"))).head().getLong(0) == nPurch)
    val types = att.select(col("touch_type")).collect().map(_.getString(0)).toSet
    assert(types.subsetOf(Set("view", "click", "none")))
    assert((types - "none").nonEmpty, "fixture must attribute some purchases")
  }

  test("funnel plan law: one user shuffle + one global tally, no joins") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
    val nodes = graft.PlanTest.executedNodes(MoreQueries.qFunnelSteps(spark, dir))
    val shuffles = nodes.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.size <= 2, s"expected <=2 shuffles, got ${shuffles.size}")
    assert(!nodes.exists {
      case _: BroadcastHashJoinExec | _: SortMergeJoinExec => true
      case _ => false
    }, "the staged-window funnel must not plan joins")
  }
}
