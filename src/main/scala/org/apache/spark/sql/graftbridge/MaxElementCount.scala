package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, StringType}

/** Native Catalyst expression: the maximum multiplicity of any element in
  * an `array<string>` column — the mode count behind the top-bigram
  * repetition signal.
  *
  * The `aggregate(sort_array(bg), ...)` run-length formulation it replaces
  * is a HigherOrderFunction, which is CodegenFallback in Spark: every row
  * pays interpreted lambda dispatch per element PLUS the O(n log n) sort.
  * This expression is one O(n) hash-counting pass in a static helper,
  * invoked from generated code, so the surrounding projection stays inside
  * whole-stage codegen. */
case class MaxElementCount(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_max_element_count"

  override protected def nullSafeEval(a: Any): Any =
    MaxElementCount.maxCount(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graftbridge.MaxElementCount.maxCount($c)")

  override protected def withNewChildInternal(newChild: Expression): MaxElementCount =
    copy(child = newChild)
}

object MaxElementCount {
  /** One hash pass; UTF8String keys hash/compare by bytes, no decode. */
  def maxCount(arr: ArrayData): Int = {
    val n = arr.numElements()
    if (n == 0) return 0
    val counts = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer](n * 2)
    var best = 0
    var i = 0
    while (i < n) {
      val k = arr.getUTF8String(i)
      val prev = counts.get(k)
      val c = if (prev == null) 1 else prev.intValue() + 1
      counts.put(k, Integer.valueOf(c))
      if (c > best) best = c
      i += 1
    }
    best
  }
}
