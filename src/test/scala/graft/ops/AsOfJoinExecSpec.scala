package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.AsOf
import graft.SparkTestSession

/** The custom AS-OF physical operator (AsOfJoinPlan/AsOfJoinExec via
  * SparkSessionExtensions) must agree row-for-row with the union+window
  * composition the catalog ships (`q_asof_join`) — two implementations,
  * one semantics.
  */
class AsOfJoinExecSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("custom operator output equals the union+window composition on real events") {
    val d = SparkTestSession.sfDir
    val e = Tables.events(spark, d)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_millis(col("ts")).as("p_ms"), col("event_id").as("purchase_id"))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), unix_millis(col("ts")).as("v_ms"), col("event_id").as("view_id"))

    val custom = AsOf.join(purchases, views, "user_id", "p_ms", "v_ms", "view_id")
      .toDF("u1", "p_ms", "purchase_id", "u2", "v_ms", "view_id")
      .select(col("purchase_id"), col("view_id"))
    // the exec actually planned it
    assert(custom.queryExecution.executedPlan.toString.contains("AsOfJoin"),
      custom.queryExecution.executedPlan.toString)

    val got = custom.collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val composed = graft.ops.ExtraQueries.qAsofJoin(spark, d).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got.size == composed.size)
    assert(got == composed, {
      val diff = (got.keySet ++ composed.keySet).filter(k => got.get(k) != composed.get(k)).take(5)
      s"first diffs: ${diff.map(k => (k, got.get(k), composed.get(k)))}"
    })
    // sanity: both matched and unmatched purchases exist in the fixture
    assert(got.values.exists(_.isDefined) && got.values.exists(_.isEmpty))
  }

  test("ties and strict before-semantics: equal timestamps match, later views don't") {
    import spark.implicits._
    val purchases = Seq((1L, 100L, 10L), (1L, 50L, 11L), (2L, 10L, 12L))
      .toDF("user_id", "p_ms", "purchase_id")
    val views = Seq(
      (1L, 100L, 20L), (1L, 100L, 21L), // two views AT the purchase time: highest id wins
      (1L, 40L, 22L),                   // earlier view for purchase 11
      (2L, 11L, 23L))                   // view AFTER purchase 12: no match
      .toDF("user_id", "v_ms", "view_id")
    val out = AsOf.join(purchases, views, "user_id", "p_ms", "v_ms", "view_id")
      .toDF("u1", "p_ms", "purchase_id", "u2", "v_ms", "view_id")
      .select(col("purchase_id"), col("view_id"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out == Map(10L -> Some(21L), 11L -> Some(22L), 12L -> None), out.toString)
  }

  test("empty right side yields all-null matches; empty left yields no rows") {
    import spark.implicits._
    val purchases = Seq((1L, 100L, 10L)).toDF("user_id", "p_ms", "purchase_id")
    val noViews = Seq.empty[(Long, Long, Long)].toDF("user_id", "v_ms", "view_id")
    val a = AsOf.join(purchases, noViews, "user_id", "p_ms", "v_ms", "view_id")
      .toDF("u1", "p_ms", "purchase_id", "u2", "v_ms", "view_id").collect()
    assert(a.length == 1 && a.head.isNullAt(5))

    val noPurchases = Seq.empty[(Long, Long, Long)].toDF("user_id", "p_ms", "purchase_id")
    val views = Seq((1L, 50L, 20L)).toDF("user_id", "v_ms", "view_id")
    val b = AsOf.join(noPurchases, views, "user_id", "p_ms", "v_ms", "view_id").collect()
    assert(b.isEmpty)
  }
}
