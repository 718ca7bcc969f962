package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Invariants of the mixture budget/epochs audit on the real sf0.001
  * corpus: the audit tiles the sources, draws tile the 2×-corpus budget
  * up to floor loss, and temperature upsampling points the right way —
  * the smallest source repeats at least as hard as the largest.
  */
class MixEpochsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir

  private lazy val audit = TextAnalysis.mixEpochs(spark, dir).cache()

  test("one row per source; doc and token counts match the table") {
    val expected = Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCountCol(col("text")).cast("long")).as("n_tokens"))
    val got = audit.select(col("source"), col("n_docs"), col("n_tokens"))
    assert(got.exceptAll(expected).count() == 0 &&
      expected.exceptAll(got).count() == 0)
  }

  test("draws tile the 2x-corpus budget up to per-source floor loss") {
    val r = audit.agg(
      sum(col("draw_tokens")).as("drawn"),
      sum(col("n_tokens")).as("tot"),
      count(lit(1)).as("k")).head()
    val (drawn, budget, k) = (r.getLong(0), 2 * r.getLong(1), r.getLong(2))
    assert(drawn <= budget && drawn > budget - k,
      s"drawn=$drawn budget=$budget sources=$k")
  }

  test("temperature points the right way: smallest source repeats hardest") {
    val rows = audit.select(col("n_tokens"), col("epochs_ppm"),
      col("repeats_data")).collect()
    assert(rows.length >= 2)
    rows.foreach(r => assert(r.getLong(1) > 0L))
    val smallest = rows.minBy(_.getLong(0))
    val largest = rows.maxBy(_.getLong(0))
    assert(smallest.getLong(1) >= largest.getLong(1))
    // the flag is literally epochs > 1e6, and the fixture exercises it
    rows.foreach(r => assert(r.getBoolean(2) == (r.getLong(1) > 1000000L)))
    assert(rows.exists(_.getBoolean(2)), "2x budget must make some source repeat")
  }
}
