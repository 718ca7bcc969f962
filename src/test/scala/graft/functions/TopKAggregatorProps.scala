package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property suite: the bounded-heap top-k aggregator returns the true
  * top-k under ANY partitioning of the input and ANY merge tree shape —
  * the invariant Spark's partial aggregation actually relies on (map-side
  * combines happen in arbitrary splits and orders).
  */
object TopKAggregatorProps extends Properties("TopKAggregator") {

  private val genRows: Gen[List[TopKIn]] = for {
    n <- Gen.choose(0, 200)
    // coarse value space on purpose: forces ties, exercising the id tiebreak
    rows <- Gen.listOfN(n, for {
      v <- Gen.choose(0, 20).map(_.toDouble)
      id <- Gen.choose(0L, 500L)
    } yield TopKIn(v, id))
  } yield rows

  private val genK: Gen[Int] = Gen.choose(1, 7)

  // duplicates are real rows — no distinct, exactly like the aggregator
  private def truth(rows: List[TopKIn], k: Int): Seq[TopKIn] =
    rows.sortBy(r => (-r.v, r.id)).take(k)

  property("arbitrary splits + sequential reduce + merge == exact top-k") =
    forAll(genRows, genK, Gen.choose(1, 8)) { (rows, k, nParts) =>
      val agg = new TopKAggregator(k)
      // partition the rows arbitrarily (round-robin by hash), reduce each
      // partition, then merge partials left-to-right
      val parts = rows.zipWithIndex.groupBy(_._2 % nParts).values
        .map(_.map(_._1)).toList
      val partials = parts.map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = partials.foldLeft(agg.zero)(agg.merge)
      agg.finish(merged) == truth(rows, k)
    }

  property("merge is order-insensitive (reversed merge tree agrees)") =
    forAll(genRows, genK) { (rows, k) =>
      val agg = new TopKAggregator(k)
      val parts = rows.grouped(math.max(1, rows.size / 3)).toList
      val partials = parts.map(_.foldLeft(agg.zero)(agg.reduce))
      val a = agg.finish(partials.foldLeft(agg.zero)(agg.merge))
      val b = agg.finish(partials.reverse.foldLeft(agg.zero)(agg.merge))
      a == b && a == truth(rows, k)
    }
}
