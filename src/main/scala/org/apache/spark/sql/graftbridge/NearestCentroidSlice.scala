package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression: argmax-similarity centroid WITHIN A SLICE of
  * a flat centroid table — the fine-assignment step of a two-level
  * (coarse × fine) quantizer. The row's coarse cell id (right child)
  * selects the candidate range `[cell*sliceLen, (cell+1)*sliceLen)` of the
  * referenced `double[][]`; the result is the LOCAL index (0-based within
  * the slice), ties to the lowest index — the same strict left-fold dots
  * and first-match tie rule as [[NearestCentroid]], so a DuckDB
  * `row_number() OVER (PARTITION BY vec ORDER BY sim DESC, idx)` replay
  * stays bit-exact.
  *
  * Why a separate expression instead of one [[NearestCentroid]] per cell:
  * the fine candidate set varies PER ROW (each row scans only its own
  * cell's `sliceLen` centroids — the n·(k1+k2) assignment arithmetic that
  * makes the two-level shape the production move past ~10⁷ vectors), so a
  * per-cell expression would need a k1-way CASE over k1 filtered plans.
  * Out-of-range cell ids (negative, or past the table) return -1 rather
  * than reading out of bounds. */
case class NearestCentroidSlice(left: Expression, right: Expression,
    centroids: Seq[Seq[Double]], sliceLen: Int)
    extends BinaryExpression with ExpectsInputTypes {

  require(sliceLen > 0, "sliceLen must be positive")
  require(centroids.nonEmpty && centroids.length % sliceLen == 0,
    "centroid table length must be a positive multiple of sliceLen")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), IntegerType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_nearest_centroid_slice"

  @transient private lazy val cents: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  override protected def nullSafeEval(input1: Any, input2: Any): Any = {
    val v = input1.asInstanceOf[ArrayData]
    val cell = input2.asInstanceOf[Int]
    val start = cell.toLong * sliceLen
    if (cell < 0 || start + sliceLen > cents.length) return -1
    var best = -1
    var bestSim = Double.NegativeInfinity
    var j = 0
    while (j < sliceLen) {
      val ct = cents(start.toInt + j)
      val n = math.min(v.numElements(), ct.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (!v.isNullAt(i)) acc += v.getDouble(i) * ct(i)
        i += 1
      }
      if (acc > bestSim) { bestSim = acc; best = j }
      j += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    nullSafeCodeGen(ctx, ev, (v, cell) => {
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val ct = ctx.freshName("ct")
      val acc = ctx.freshName("acc")
      val best = ctx.freshName("best")
      val bestSim = ctx.freshName("bestSim")
      val start = ctx.freshName("start")
      s"""
         |int $best = -1;
         |long $start = (long) $cell * $sliceLen;
         |if ($cell >= 0 && $start + $sliceLen <= $centsRef.length) {
         |  double $bestSim = Double.NEGATIVE_INFINITY;
         |  for (int $j = 0; $j < $sliceLen; $j++) {
         |    double[] $ct = $centsRef[(int) $start + $j];
         |    int $n = java.lang.Math.min($v.numElements(), $ct.length);
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      if (!$v.isNullAt($i)) {
         |        $acc += $v.getDouble($i) * $ct[$i];
         |      }
         |    }
         |    if ($acc > $bestSim) { $bestSim = $acc; $best = $j; }
         |  }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroidSlice =
    copy(left = newLeft, right = newRight)
}
