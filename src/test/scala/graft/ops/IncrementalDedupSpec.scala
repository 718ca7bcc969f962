package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** The incremental (delta-vs-index) dedup's index-freshness contract on
  * real corpus data: what the asymmetric probe finds, what it by design
  * does not, and that the documented composition (batch self-dedup +
  * probe) recovers exactly the full batch sketch's pair set.
  */
class IncrementalDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val d = "/root/testdata/sf0.001"

  test("freshness contract: probe finds delta-vs-index only; delta self-dedup recovers the rest") {
    // Ground truth: the full batch sketch over the whole corpus.
    val allPairs = Dedup.dedupMinhashLsh(spark, d)
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val crossPairs = allPairs.filter { case (a, b) => a % 2 != b % 2 }
    val intraDelta = allPairs.filter { case (a, b) => a % 2 == 1 && b % 2 == 1 }
    assert(crossPairs.nonEmpty && intraDelta.nonEmpty,
      s"test premise: corpus must hold both cross (${crossPairs.size}) and " +
        s"intra-delta (${intraDelta.size}) near-dup pairs")

    // The probe (odd = delta, even = index): every reported match is
    // against the INDEX — never a fellow delta doc.
    val probed = Dedup.dedupIncremental(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(probed.nonEmpty)
    probed.foreach { case (incoming, matchId) =>
      assert(incoming % 2 == 1 && matchId % 2 == 0,
        s"probe reported a non-delta-vs-index match: $incoming -> $matchId")
    }
    // Completeness on its own territory: every delta doc with a cross
    // pair is reported (banding is shared with the batch sketch, so the
    // probe loses nothing the sketch finds).
    val deltaWithCross = crossPairs.map { case (a, b) => if (a % 2 == 1) a else b }
    assert(deltaWithCross == probed.keySet,
      s"probe missed ${(deltaWithCross -- probed.keySet).size} cross-pair delta docs")
    // The documented blind spot: intra-delta pairs are NOT found.
    val intraOnlyDocs = intraDelta.flatMap { case (a, b) => Seq(a, b) } -- deltaWithCross
    assert(intraOnlyDocs.nonEmpty, "test premise: some delta doc near-dups ONLY the delta")
    intraOnlyDocs.foreach(id =>
      assert(!probed.contains(id), s"probe claims intra-delta-only doc $id — contract drift"))

    // The prescribed composition: batch self-dedup over the delta alone
    // finds exactly the intra-delta pairs, so probe + self-dedup covers
    // every pair involving the delta.
    val deltaSelf = Dedup.dedupMinhashLshOver(
        Tables.documents(spark, d).filter(col("doc_id") % 2 === 1))
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(deltaSelf == intraDelta,
      s"delta self-dedup found ${deltaSelf.size} pairs, expected exactly the " +
        s"${intraDelta.size} intra-delta pairs of the full sketch")
  }
}
