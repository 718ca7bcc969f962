package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF example: per-group (min, max, count) over a double column in a
  * single pass — the `Aggregator[IN, BUF, OUT]` surface from SURVEY.md §2.2,
  * registered via `functions.udaf`. The buffer is a flat case class, so
  * partial aggregation (map-side combine) and the merge path work exactly
  * like a built-in agg; results are exact and therefore oracled.
  *
  * (A custom Aggregator is the right tool when one pass must compute a
  * compound state no single built-in covers — sketches, reservoir samples,
  * custom moments. min/max/count is deliberately simple so the oracle can
  * verify the full partial/merge/finish cycle.)
  */
object RangeStatsAggregator extends Aggregator[Double, RangeStatsBuf, RangeStats] {
  override def zero: RangeStatsBuf = RangeStatsBuf(Double.PositiveInfinity, Double.NegativeInfinity, 0L)

  override def reduce(b: RangeStatsBuf, x: Double): RangeStatsBuf =
    RangeStatsBuf(math.min(b.mn, x), math.max(b.mx, x), b.n + 1)

  override def merge(a: RangeStatsBuf, b: RangeStatsBuf): RangeStatsBuf =
    RangeStatsBuf(math.min(a.mn, b.mn), math.max(a.mx, b.mx), a.n + b.n)

  override def finish(b: RangeStatsBuf): RangeStats =
    RangeStats(b.mn, b.mx, b.n)

  override def bufferEncoder: Encoder[RangeStatsBuf] = Encoders.product[RangeStatsBuf]
  override def outputEncoder: Encoder[RangeStats] = Encoders.product[RangeStats]
}

final case class RangeStatsBuf(mn: Double, mx: Double, n: Long)
final case class RangeStats(mn: Double, mx: Double, n: Long)
