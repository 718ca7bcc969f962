package graft.functions

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** The Misra-Gries guarantees, proven over random streams AND random merge
  * trees: bounded state (<= k counters), lower-bound estimates (never
  * overcounts), and completeness (every item with count > N/(k+1) survives
  * ANY merge order) — mergeability is what licenses running the sketch as a
  * partial-aggregated Spark UDAF.
  */
object HeavyHittersProps extends Properties("HeavyHitters") {

  private val streamGen: Gen[List[String]] = for {
    n <- Gen.choose(1, 2000)
    // skewed alphabet: a few hot items over a long tail — the regime the
    // sketch exists for
    items <- Gen.listOfN(n, Gen.frequency(
      5 -> Gen.oneOf("hot1", "hot2", "hot3"),
      3 -> Gen.oneOf((1 to 20).map(i => s"warm$i")),
      2 -> Gen.choose(1, 100000).map(i => s"cold$i")))
  } yield items

  private def runSketch(agg: HeavyHittersAggregator, stream: List[String],
      splits: List[Int]): Map[String, Long] = {
    // split the stream at random points and merge the partials — every
    // split vector is a different merge tree over the same data
    val parts = splits.distinct.sorted.foldRight(List(stream)) { (at, acc) =>
      val (a, b) = acc.head.splitAt(at min acc.head.length)
      a :: b :: acc.tail
    }
    parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
      .foldLeft(agg.zero)(agg.merge)
  }

  property("bounded state, lower bounds, heavy hitters always survive") =
    forAll(streamGen, Gen.choose(1, 16), Gen.listOf(Gen.choose(0, 2000))) {
      (stream: List[String], k: Int, splits: List[Int]) =>
        val agg = HeavyHittersAggregator(k)
        val sketch = runSketch(agg, stream, splits)
        val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val n = stream.size.toLong
        val bounded = sketch.size <= k
        val lower = sketch.forall { case (t, est) => est <= exact(t) }
        val complete = exact.forall { case (t, c) =>
          c * (k + 1) <= n || sketch.contains(t)
        }
        (Prop(bounded) :| s"state ${sketch.size} > k=$k") &&
          (Prop(lower) :| "sketch overcounts some item") &&
          (Prop(complete) :| s"a heavy hitter was evicted (k=$k, n=$n)")
    }
}
