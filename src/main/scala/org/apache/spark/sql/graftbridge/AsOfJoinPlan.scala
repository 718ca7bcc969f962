package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Whole-operator escalation demo (the (c) rung of the extension ladder):
  * an AS-OF join as a first-class logical node + planner strategy +
  * physical sort-merge operator, registered via SparkSessionExtensions.
  *
  * Semantics: for each left row, attach the LAST right row of the same
  * key with `rightTime <= leftTime` (ties on time broken by the highest
  * `rightTie`), or nulls when none exists — identical to the union+window
  * composition in ops (`q_asof_join`), which a spec asserts row-for-row.
  *
  * The composed formulation remains the production default (it reuses
  * stock operators and AQE knows them); this operator exists to
  * demonstrate the mechanism the engine would use when an operator
  * GENUINELY cannot be composed: requiredChildDistribution co-partitions
  * both sides on the key (one shuffle each, exactly like a sort-merge
  * join), requiredChildOrdering sorts within partitions, and doExecute
  * runs an O(n) forward-only merge per partition — no buffering beyond
  * one candidate row, no driver involvement.
  *
  * Keys/times/tiebreak are LongType by contract (ids and epoch millis —
  * the shapes the engine actually uses); generalizing to arbitrary
  * orderable types means swapping the ordinal getters for BoundReference
  * comparators, nothing structural.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    rightTie: Attribute)
    extends BinaryNode {
  // right side is nullable in the output: unmatched left rows pad with null
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tie) =>
      AsOfJoinExec(lk, rk, lt, rt, tie, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** DataFrame-level entry point: `AsOf.join(purchases, views, ...)`. */
object AsOf {
  def join(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightTie: String): DataFrame = {
    val lp = left.queryExecution.analyzed
    // Re-alias the right side with FRESH exprIds: when both inputs derive
    // from the same scan (the usual case — one events table filtered two
    // ways), their attributes share ids, and the analyzer's
    // DeduplicateRelations only repairs node types it knows about — a
    // custom node with duplicate ids across children confuses column
    // pruning into dropping the "other" side's key.
    val rp0 = right.queryExecution.analyzed
    val rp = org.apache.spark.sql.catalyst.plans.logical.Project(
      rp0.output.map(a => org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()), rp0)
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found in ${p.output.map(_.name)}"))
    org.apache.spark.sql.classic.Dataset.ofRows(
      left.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      AsOfJoinPlan(lp, rp,
        attr(lp, key), attr(rp, key), attr(lp, leftTime), attr(rp, rightTime), attr(rp, rightTie)))
  }
}

case class AsOfJoinExec(
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    rightTie: Attribute,
    left: SparkPlan,
    right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // co-partition both sides on the key (one shuffle each, like SMJ)...
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // ...and sort within partitions so the merge is forward-only
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending), SortOrder(rightTie, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyIdx = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lTimeIdx = left.output.indexWhere(_.exprId == leftTime.exprId)
    val rKeyIdx = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTimeIdx = right.output.indexWhere(_.exprId == rightTime.exprId)
    require(lKeyIdx >= 0 && lTimeIdx >= 0 && rKeyIdx >= 0 && rTimeIdx >= 0,
      "as-of join keys/times must be direct child columns")
    val rightWidth = right.output.size
    val outputAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      val project = UnsafeProjection.create(outputAttrs.map(_.dataType).toArray)
      var candidate: InternalRow = null
      var candidateKey = 0L
      var rHead: InternalRow = null

      lIter.map { lRow =>
        val lk = lRow.getLong(lKeyIdx)
        val lt = lRow.getLong(lTimeIdx)
        // advance the right side through every row usable by (lk, lt)
        var advancing = true
        while (advancing) {
          if (rHead == null && rIter.hasNext) rHead = rIter.next()
          if (rHead == null) advancing = false
          else {
            val rk = rHead.getLong(rKeyIdx)
            val rt = rHead.getLong(rTimeIdx)
            if (rk < lk || (rk == lk && rt <= lt)) {
              if (rk == lk) {
                // rows from sorted iterators are reused buffers: copy.
                // InternalRow.copy (not an UnsafeRow cast) — a child that
                // already satisfies the required ordering (e.g. a cached
                // in-memory relation) can emit non-Unsafe row classes.
                candidate = rHead.copy()
                candidateKey = rk
              }
              rHead = null // consumed
            } else advancing = false
          }
        }
        val matched = candidate != null && candidateKey == lk
        project(joined(lRow, if (matched) candidate else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
