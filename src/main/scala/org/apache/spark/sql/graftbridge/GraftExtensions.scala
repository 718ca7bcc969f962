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
  }
}
