package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FilterExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import graft.{PlanTest, SparkTestSession}

/** The Bloom-prefiltered decontamination: output parity with the exact
  * entry (the Bloom contract — no false negatives, and false positives die
  * in the exact verify), the no-false-negative property of the bridge
  * expressions themselves, and the plan law that the codegen'd
  * `might_contain` predicate sits BELOW the exact join — pruning at scan
  * speed is the whole point.
  */
class BloomDecontamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sfDir = SparkTestSession.sfDir

  test("bloom-prefiltered decontam is row-identical to the exact entry") {
    val exact = TextAnalysis.decontam(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bloomed = TextAnalysis.decontamBloom(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bloomed == exact, s"bloom path diverged: ${bloomed.diff(exact)} / ${exact.diff(bloomed)}")
    assert(exact.nonEmpty, "fixture should flag at least one contaminated doc")
  }

  test("bloomFilterAgg + bloomMightContain never drop a member (no false negatives)") {
    val members = (1 to 500).map(i => s"member_$i").toDF("v")
    val bf = members.agg(org.apache.spark.sql.graftbridge.bloomFilterAgg(col("v"), 500L))
      .head().getAs[Array[Byte]](0)
    val dropped = members
      .filter(!org.apache.spark.sql.graftbridge.bloomMightContain(bf, col("v")))
      .count()
    assert(dropped == 0, s"$dropped members rejected by their own bloom filter")
  }

  test("might_contain filters the gram stream below the exact broadcast join") {
    val nodes = PlanTest.executedNodes(TextAnalysis.decontamBloom(spark, sfDir))
    val joins = nodes.collect { case j: BroadcastHashJoinExec => j }
    assert(joins.nonEmpty, "expected the exact-verify broadcast join")
    val bloomFilters = nodes.collect {
      case f: FilterExec if f.condition.exists(_.isInstanceOf[BloomFilterMightContain]) => f
    }
    assert(bloomFilters.nonEmpty, "expected a BloomFilterMightContain predicate in the executed plan")
    // the bloom filter must sit on the corpus (streamed) side of a join,
    // i.e. some join's subtree contains it
    assert(joins.exists(j => PlanTest.subtree(j).exists {
      case f: FilterExec => f.condition.exists(_.isInstanceOf[BloomFilterMightContain])
      case _ => false
    }), "bloom prune must run below the exact join, not above it")
  }
}
