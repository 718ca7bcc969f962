package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** All `planes.length / bits` hyperplane-LSH bucket hashes of one embedding,
  * in a single pass: widen the vector to float64 once, then for each table
  * fold `bits` sign-bit dot products into one long bucket id.
  *
  * Replaces the declarative shape
  * `posexplode(transform(planesLit, w => dot(asDouble(embedding), w)))`
  * + `groupBy(vec_id, tbl).agg(sum(shiftleft...))`, which paid for
  *  (a) re-evaluating the float→double cast of the embedding once per plane
  *      (96× per row: `transform` lambdas re-run their body's subtree per
  *      element), and
  *  (b) an explode to 96 rows per vector followed by a re-assembly shuffle.
  * This expression does the cast once, keeps everything row-local (the
  * bucket table needs NO shuffle at all), and runs inside whole-stage
  * codegen.
  *
  * Bit-for-bit identical bucket ids: the per-plane dot product is the same
  * strict left fold in float64 as [[DotProduct]] (null elements contribute
  * 0), and the bucket assembly `Σ (1L << j) for sims[j] > 0` matches the
  * SQL the DuckDB oracle runs — the oracle is unchanged by this rewrite.
  *
  * `planes` rides along as a reference object (k·dim doubles — control
  * plane), not as a child Literal: codegen indexes a plain `double[][]`
  * instead of walking nested ArrayData.
  */
case class LshBuckets(child: Expression, planes: Array[Array[Double]], bits: Int)
    extends UnaryExpression {

  private val nTables: Int = planes.length / bits

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lsh_buckets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<float> or array<double>, got ${t.sql}")
  }

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val dim = math.min(arr.numElements(), planes(0).length)
    val v = new Array[Double](dim)
    var k = 0
    while (k < dim) {
      if (!arr.isNullAt(k)) v(k) = if (elemIsFloat) arr.getFloat(k).toDouble else arr.getDouble(k)
      k += 1
    }
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var j = 0
      while (j < bits) {
        val w = planes(t * bits + j)
        var acc = 0.0
        var i = 0
        while (i < dim) { acc += v(i) * w(i); i += 1 }
        if (acc > 0) bucket |= (1L << j)
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    val getter = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, c => {
      val dim = ctx.freshName("dim")
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val acc = ctx.freshName("acc")
      val w = ctx.freshName("w")
      val bucket = ctx.freshName("bucket")
      s"""
         |int $dim = java.lang.Math.min($c.numElements(), $planesRef[0].length);
         |double[] $v = new double[$dim];
         |for (int $k = 0; $k < $dim; $k++) {
         |  if (!$c.isNullAt($k)) $v[$k] = (double) $c.$getter($k);
         |}
         |long[] $out = new long[$nTables];
         |for (int $t = 0; $t < $nTables; $t++) {
         |  long $bucket = 0L;
         |  for (int $j = 0; $j < $bits; $j++) {
         |    double[] $w = $planesRef[$t * $bits + $j];
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) { $acc += $v[$i] * $w[$i]; }
         |    if ($acc > 0) $bucket |= (1L << $j);
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}
