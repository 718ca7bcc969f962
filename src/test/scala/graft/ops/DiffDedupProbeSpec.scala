package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** The composed lifecycle flow: snapshot diff → near-dup probe of the
  * delta against the v1 index. The fixture makes the expected match set
  * closed-form: changed docs are minor revisions (they near-dup their own
  * previous version), added docs are md5-fresh (they match nothing). */
class DiffDedupProbeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = SparkTestSession.sfDir

  private lazy val rows = TextAnalysis.diffDedupProbe(spark, sfDir)
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("only changed docs hit the index; fresh additions never do") {
    // added docs live at id + 4e7 with unique md5-derived text — a probe
    // hit for one would mean the banded join matched unrelated content
    assert(rows.nonEmpty)
    assert(rows.forall(_._1 < 40000000L))
    assert(rows.forall(_._1 % 10 == 3))
  }

  test("every minor revision near-dups its own previous version") {
    // the re-embed/re-dedup decision signal: a changed doc's probe match
    // set contains its own id, and the canonical match is <= itself.
    // The ' rev2 <md5>' suffix adds exactly 2 word bigrams, so a changed
    // doc's true Jaccard vs its v1 self is n/(n+2) for n original
    // bigrams — the 0.5 est-Jaccard gate is only GUARANTEED (with margin
    // for the minhash estimate) above a few bigrams. Assert the
    // self-match law for docs with >= 4 tokens (n >= 3, true J >= 0.6)
    // so a future fixture with very short docs can't silently break the
    // contract; shorter changed docs may or may not clear the gate.
    val longEnough = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 10 === 3)
      .filter(size(split(trim(col("text")), "\\s+")) >= 4)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(longEnough.nonEmpty, "fixture must contain non-trivial changed docs")
    assert(longEnough.subsetOf(rows.map(_._1).toSet),
      "every changed doc above the bigram threshold must self-match (minor revision)")
    rows.foreach { case (id, matchId, n) =>
      assert(matchId <= id && n >= 1L)
    }
  }
}
