package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression: index (0-based) of the nearest centroid to an
  * `array<double>` vector by dot-product similarity, ties to the LOWEST
  * index.
  *
  * Replaces `array_position(transform(centroidsLit, c -> graft_dot(v, c)),
  * array_max(...)) - 1` in the k-means assignment hot path. `transform` is a
  * HigherOrderFunction — interpreted per-element lambda dispatch — so the
  * HOF formulation costs an interpreted call per CENTROID per row: at the
  * occupancy-targeted cluster counts the auto-k semantic dedup trains
  * (k ≈ n/occupancy, measured k=4000 at the sf5 bench point) that is the
  * dominant cost of the whole operator (~60 s of a 68 s cold run). This
  * expression generates one tight two-level primitive loop over a
  * referenced `double[][]` — the same escalation [[DotProduct]] documents,
  * one level up.
  *
  * Semantics are IDENTICAL to the HOF formulation, which is kept in
  * ops/Similarity as the spec-pinned parity reference: per-centroid sims
  * are strict left-to-right float64 folds over min(len(v), dim) elements
  * (null vector elements contribute 0), and `sim > best` keeps the FIRST
  * index attaining the maximum — exactly array_position's first-match rule.
  * The DuckDB oracle's unrolled-Lloyd SQL orders ties the same way
  * (`ORDER BY sim DESC, cl` with row_number), so hashes stay bit-exact.
  *
  * Centroids ride the expression as a `Seq[Seq[Double]]` constructor field
  * (structural equality keeps plan canonicalization sound) and reach
  * generated code via `addReferenceObj` — a shared immutable array, not a
  * k×dim literal tree.
  */
case class NearestCentroid(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression with ExpectsInputTypes {

  require(centroids.nonEmpty, "NearestCentroid needs at least one centroid")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_nearest_centroid"

  @transient private lazy val cents: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    var best = -1
    var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val ct = cents(c)
      val n = math.min(v.numElements(), ct.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (!v.isNullAt(i)) acc += v.getDouble(i) * ct(i)
        i += 1
      }
      if (acc > bestSim) { bestSim = acc; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val ct = ctx.freshName("ct")
      val acc = ctx.freshName("acc")
      val best = ctx.freshName("best")
      val bestSim = ctx.freshName("bestSim")
      s"""
         |int $best = -1;
         |double $bestSim = Double.NEGATIVE_INFINITY;
         |for (int $c = 0; $c < $centsRef.length; $c++) {
         |  double[] $ct = $centsRef[$c];
         |  int $n = java.lang.Math.min($v.numElements(), $ct.length);
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$v.isNullAt($i)) {
         |      $acc += $v.getDouble($i) * $ct[$i];
         |    }
         |  }
         |  if ($acc > $bestSim) { $bestSim = $acc; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}
