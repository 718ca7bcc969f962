package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Containment — the asymmetric near-dup measure: a doc fully embedded in
  * a wrapper has containment 1.0 while Jaccard dilutes below every lexical
  * gate. The spec pins the planted-fixture algebra (the oracle gates the
  * values; these are the properties the SQL twin can't express as laws).
  */
class ContainmentPairsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = SparkTestSession.sfDir

  private lazy val pairs = Dedup.containmentPairs(spark, sfDir)
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))

  test("every planted wrapper pair is recovered at containment exactly 1.0") {
    // Wrapper text = original ++ pads, so every original bigram survives:
    // containment(orig in wrapper) = |A|/|A| = 1.0 by construction — a
    // planted pair below the ceiling is a defect, not a budget miss.
    val docs = Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 300 && col("doc_id") % 9 === 4)
      // a wrapped doc only pairs if the original has >= 1 bigram
      .filter(size(split(col("text"), " ")) >= 2)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    // exact planted pairs only — near-identical ORIGINALS can legitimately
    // produce cross pairs (orig_i vs wrapper_j, wrapper_i vs wrapper_j)
    val planted = pairs.filter(p => p._2 == p._1 + 50000000L)
    assert(planted.map(_._1).toSet == docs, "planted recall must be exact")
    assert(planted.forall(_._6 == 1000000L),
      "containment of a full embedding must be exactly 1e6 ppm")
  }

  test("containment catches what the Jaccard gate misses") {
    // The measure's reason to exist: wrapper pairs sit at containment 1.0
    // but Jaccard |A|/(|A|+~81) — for the fixture's doc lengths, below the
    // lexical family's 0.5 gate.
    val planted = pairs.filter(p => p._2 == p._1 + 50000000L)
    val missedByJaccard = planted.filter(_._7 < 500000L)
    assert(missedByJaccard.nonEmpty,
      "at least one planted wrapper must fall below the 0.5 Jaccard gate")
  }

  test("set algebra holds on every emitted pair") {
    pairs.foreach { case (a, b, shared, na, nb, cont, jac) =>
      assert(a < b && shared <= math.min(na, nb))
      assert(cont == shared * 1000000L / math.min(na, nb))
      assert(jac == shared * 1000000L / (na + nb - shared))
      assert(cont >= 800000L && jac <= cont)
    }
  }
}
