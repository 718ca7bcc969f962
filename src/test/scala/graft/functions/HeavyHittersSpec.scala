package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Spark end-to-end for the Misra-Gries heavy-hitters sketch: sketch-prune +
  * exact-verify on a cardinality >> k stream (evictions and cross-partition
  * merges genuinely exercised). The sketch-theory guarantees are
  * property-proven in [[HeavyHittersProps]]. */
class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("Spark end-to-end: sketch-prune + exact-verify equals the exact heavy-hitter set") {
    import spark.implicits._
    val K = 8
    // cardinality 1000 >> k = 8, with two planted heavy items — evictions
    // and the merge rule genuinely exercised across partitions
    val rows = (1 to 3000).map(i => s"tail${i % 1000}") ++
      Seq.fill(600)("alpha") ++ Seq.fill(500)("beta")
    val df = new scala.util.Random(42).shuffle(rows.toList).toDF("tok").repartition(8)
    val hh = udaf(HeavyHittersAggregator(K))
    val cands = df.agg(hh(col("tok")).as("sk"))
      .select(explode(col("sk")).as(Seq("tok", "lb")))
    val exact = df.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val n = rows.size
    val found = cands.join(exact, "tok")
      .filter(col("cnt") * (K + 1) > n)
      .select(col("tok"), col("cnt")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(found == Set(("alpha", 600L), ("beta", 500L)),
      s"sketch-prune + exact-verify diverged: $found")
  }
}
