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
    // The production shape (same as TextAnalysis.heavyHitters): one sketch
    // job nominates candidates + N, then the exact pass aggregates ONLY the
    // broadcast candidate set — never the full vocabulary.
    val sk = df.agg(hh(col("tok")).as("sk"), count(lit(1)).as("n")).head()
    val n = sk.getLong(1)
    val cands = sk.getMap[String, Long](0).keys.toSeq.toDF("tok")
    val verified = df.join(broadcast(cands), Seq("tok"), "left_semi")
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * (K + 1) > n)
    val found = verified.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(found == Set(("alpha", 600L), ("beta", 500L)),
      s"sketch-prune + exact-verify diverged: $found")
    assert(n == rows.size.toLong)
  }

  test("catalog x_heavy_hitters: exact pass aggregates only the broadcast candidates (plan-pinned)") {
    val d = "/root/testdata/sf0.001"
    val out = graft.ops.TextAnalysis.heavyHitters(spark, d)
    // Plan law: a broadcast LEFT SEMI join sits BELOW the exact aggregate —
    // the groupBy never sees non-candidate tokens, so the full vocabulary
    // is never shuffled (the Aggregator's own no-full-cardinality contract).
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import graft.PlanTest.subtree
    val plan = out.queryExecution.executedPlan
    val aggsOverSemiJoin = subtree(plan).collect {
      case agg: HashAggregateExec if subtree(agg).exists {
        case j: BroadcastHashJoinExec => j.joinType.sql.toUpperCase.contains("SEMI")
        case _ => false
      } => agg
    }
    assert(aggsOverSemiJoin.nonEmpty,
      s"expected the exact aggregate above a broadcast semi-join; plan:\n$plan")
    // Output law: equals the exact heavy-hitter set computed the naive way.
    import org.apache.spark.sql.functions.{lower => lcase}
    val toks = graft.ops.Tables.documents(spark, d)
      .select(explode(graft.ops.TextAnalysis.tokensCol(lcase(col("text")))).as("tok"))
    val nTotal = toks.count()
    val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 65 > nTotal)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = out.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == exact, s"catalog heavy hitters diverged from exact: got=$got exact=$exact")
  }
}
