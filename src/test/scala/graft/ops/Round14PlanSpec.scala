package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, CartesianProductExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.window.WindowExec
import graft.{PlanTest, SparkTestSession}

/** Plan-shape laws of the round-14 operators — the SURVEY claims pinned as
  * regressions, not manual `.explain` checks:
  *  - the Hamming scan broadcasts the 50-row QUERY side and streams the
  *    corpus (never a shuffle of the corpus onto pair keys);
  *  - PageRank never degenerates to a cartesian product, and its per-query
  *    plan reuses the persisted edge relation instead of recomputing the
  *    orders ⋈ lineitem dedup per iteration;
  *  - the Count-Min probe joins the cell relation broadcast (the sketch is
  *    control-plane-sized by construction, d·w cells).
  */
class Round14PlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = SparkTestSession.sfDir

  test("annHamming broadcasts the query side; corpus is never pair-shuffled") {
    val nodes = PlanTest.executedNodes(Similarity.annHamming(spark, d))
    val smj = nodes.collect { case j: SortMergeJoinExec => j }
    assert(smj.isEmpty, "pair generation must not sort-merge the corpus")
    // The non-equi (vec_id =!= q_id) pair join plans as a broadcast
    // nested-loop; whatever the join flavor, no exchange may repartition
    // the corpus by anything but the final window's q_id.
    val shuffles = nodes.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.forall(_.outputPartitioning.toString.contains("q_id")),
      s"only the top-3 window may shuffle (on q_id): ${shuffles.map(_.outputPartitioning)}")
    assert(nodes.exists(_.nodeName.contains("BroadcastNestedLoopJoin")) ||
      nodes.collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
      "the 50-row query side must broadcast")
  }

  test("graphPagerank: no cartesian product; edges come from the persisted relation") {
    val nodes = PlanTest.executedNodes(GraphOps.graphPagerank(spark, d))
    assert(nodes.collect { case c: CartesianProductExec => c }.isEmpty,
      "rank propagation must stay an equi-join")
    val cached = nodes.filter(_.nodeName.contains("InMemoryTableScan"))
    assert(cached.size >= 3,
      s"each of the 3 iterations must read the persisted edge relation, got ${cached.size}")
    // ranks are node-sized: no window over the full rank relation; the
    // top-15 must be a TakeOrdered, not a global sort
    assert(nodes.collect { case w: WindowExec => w }.isEmpty, "no rank window")
    assert(nodes.exists(_.nodeName.contains("TakeOrderedAndProject")),
      "top-15 must plan as TakeOrdered")
  }

  test("countMinAudit: the cell relation joins broadcast; truth top-20 is TakeOrdered") {
    val nodes = PlanTest.executedNodes(TextAnalysis.countMinAudit(spark, d))
    assert(nodes.exists(_.nodeName.contains("TakeOrderedAndProject")),
      "ground-truth top-20 must plan as TakeOrdered, not a global sort")
    val smj = nodes.collect { case j: SortMergeJoinExec => j }
    assert(smj.isEmpty, s"probe must join the d*w cells broadcast, got sort-merge")
  }
}
