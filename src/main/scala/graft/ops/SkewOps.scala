package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Tables._

/** Skew-handling patterns: at 100 TB a hot key (one user generating 10% of
  * all events) turns a single groupBy into one straggler task. Salting
  * splits each hot key across SALT buckets for the wide partial aggregation,
  * then a second cheap aggregation over at most `keys x SALT` rows merges
  * the partials. Same result as the direct groupBy — the oracle proves it —
  * but the heavy shuffle is uniform.
  *
  * (Spark's AQE skew-join handles the JOIN flavor of this automatically;
  * salting is the aggregation-side tool, and the one you need when a single
  * GROUP BY key exceeds one task's memory.)
  */
object SkewOps {

  private val SALT = 16

  /** Two-phase salted aggregation over events by user: phase 1 groups on
    * (user, hash-salt) — uniform load even if one user dominates; phase 2
    * merges the ≤16 partials per user. Decimal sums make the two-phase
    * split exactly associative. */
  def saltedUserAgg(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("salt", pmod(xxhash64(col("event_id")), lit(SALT)))
      .groupBy(col("user_id"), col("salt"))
      .agg(count(lit(1)).as("pn"),
        sum(col("value").cast(DecimalType(18, 4))).as("pv"))
      .groupBy(col("user_id"))
      .agg(sum(col("pn")).as("n_events"),
        sum(col("pv")).cast(DoubleType).as("total_value"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_skew_salted_agg" -> (saltedUserAgg _)
  )

  /** The oracle is the UNsalted aggregation — equality is the whole point. */
  val oracleSql: Map[String, String] = Map(
    "q_skew_salted_agg" ->
      """SELECT user_id, count(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        |FROM events GROUP BY user_id""".stripMargin
  )
}
