package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions installer: makes graft's native expressions
  * callable from SQL text (`SELECT graft_dot(a, b)`), for sessions built
  * with `.config("spark.sql.extensions", "org.apache.spark.sql.graftbridge.GraftExtensions")`
  * or `.withExtensions(new GraftExtensions)`.
  *
  * The DataFrame API path (graftbridge.dotProduct / sortedIntersectCount)
  * needs NO registration — it builds Column objects directly and works in
  * any session; this installer exists for the SQL-string surface only.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // Optimizer rule: size(regexp_extract_all(x, '\S+', 0)) -> TokenCount(x)
    // (single byte-scan, no regex, no array). The catalog keeps the
    // declarative idiom; sessions built with these extensions run it fast.
    ext.injectOptimizerRule(_ => RewriteTokenCount)
    // Whole-operator extension (ladder rung c): the AS-OF join planner
    // strategy — see AsOfJoinPlan/AsOfJoinExec.
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectFunction((
      new FunctionIdentifier("graft_token_count"),
      new ExpressionInfo(classOf[TokenCount].getName, "graft_token_count"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_token_count(str) takes exactly 1 argument")
        TokenCount(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dot(arrayA, arrayB) takes exactly 2 arguments")
        DotProduct(args.head, args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "graft_sorted_intersect_count"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_sorted_intersect_count(arrayA, arrayB) takes exactly 2 arguments")
        SortedIntersectCount(args.head, args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash_bits"),
      new ExpressionInfo(classOf[SimhashBits].getName, "graft_simhash_bits"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_simhash_bits(tokens) takes exactly 1 argument")
        SimhashBits(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_max_element_count"),
      new ExpressionInfo(classOf[MaxElementCount].getName, "graft_max_element_count"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_max_element_count(array) takes exactly 1 argument")
        MaxElementCount(args.head)
      }))
  }
}
