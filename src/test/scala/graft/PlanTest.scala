package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Shared plan-pinning support: one traversal that sees through AQE.
  * Finalized adaptive plans hide their materialized exchanges inside
  * query stages (leaf nodes of the outer plan), so a naive
  * `children`-walk reports zero shuffles — every plan-law spec must
  * descend into both `AdaptiveSparkPlanExec.executedPlan` and
  * `QueryStageExec.plan` or it asserts against an empty skeleton.
  */
object PlanTest {

  /** All nodes of the EXECUTED plan, descending through AQE wrappers.
    * Collects the frame via an action first so AQE has finalized. */
  def executedNodes(df: DataFrame): Seq[SparkPlan] = {
    df.collect()
    subtree(df.queryExecution.executedPlan)
  }

  def subtree(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
    case a: AdaptiveSparkPlanExec => subtree(a.executedPlan)
    case s: QueryStageExec => subtree(s.plan)
    case _ => p.children.flatMap(subtree)
  })
}
