package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Structural laws of the LSH-seeded beam walk (`x_ann_beam`) that the
  * DuckDB oracle's end-to-end replay doesn't state explicitly:
  * best-so-far monotonicity (the carry arm means the walk can never LOSE
  * its best candidate), panel membership, per-query ordering, and
  * determinism across invocations (the whole design rides on ties-by-id
  * plus strict-left-fold dots — a nondeterministic walk would be
  * un-oracle-able).
  */
class BeamSearchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = SparkTestSession.sfDir

  private def collectBeam() =
    Similarity.annBeam(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._3))

  test("beam results are panel members, never the query, ranked by (sim desc, id)") {
    val rows = collectBeam()
    assert(rows.nonEmpty)
    assert(rows.forall { case (q, nn, _, _) => nn < GraphOps.KNN_PANEL && nn != q })
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val byRank = rs.sortBy(_._3)
      assert(byRank.map(_._3).toSeq == (1 to byRank.size), s"ranks not dense for q=$q")
      byRank.sliding(2).foreach {
        case Array((_, n1, _, s1), (_, n2, _, s2)) =>
          assert(s1 > s2 || (s1 == s2 && n1 < n2), s"order violated for q=$q")
        case _ => ()
      }
    }
  }

  test("best-so-far monotonicity: the final top-1 never loses to any fixed entry seed") {
    // The fixed entry set is ALWAYS part of the initial frontier, and the
    // carry arm + rank-1 survival means the frontier's max-sim member can
    // never drop out — so each query's final top-1 sim must be >= the best
    // fixed seed's sim, computed here driver-side with the same strict
    // left-fold float64 dot the engine uses.
    val vecs = Similarity.vectors(spark, sfDir)
      .select(col("vec_id"), col("v"), col("nrm"))
      .collect()
      .map(r => r.getLong(0) -> (r.getSeq[Double](1).toArray, r.getDouble(2)))
      .toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val top1 = collectBeam().filter(_._3 == 1).map(t => t._1 -> t._4).toMap
    val seeds = vecs.keys.filter(_ < Similarity.BEAM_SEEDS).toSeq.sorted
    assert(seeds.nonEmpty)
    top1.foreach { case (q, best) =>
      val (qv, qn) = vecs(q)
      val seedBest = seeds.filter(_ != q).map { sId =>
        val (sv, sn) = vecs(sId)
        dot(qv, sv) / (qn * sn)
      }.max
      assert(best >= seedBest,
        s"q=$q final top-1 $best lost to a fixed seed at $seedBest")
    }
  }

  test("the walk is deterministic: two invocations return identical rows") {
    assert(collectBeam().toSeq == collectBeam().toSeq)
  }

  test("hop lineage is driver-held: literal-only final plan, zero executor-resident residue") {
    // Cluster-durability law (r17 verdict #4): the per-hop cut must NOT
    // live in executor storage (r17's localCheckpoint frontier made an
    // executor loss mid-walk unrecoverable and leaked 7 cached frontiers
    // per invocation). First invocation warms the RelCache-shared graph /
    // bucket relations; the second must add NO persisted blocks, and its
    // result plan must read only driver-held literal relations — re-running
    // it can never depend on executor-resident state.
    collectBeam()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = Similarity.annBeam(spark, sfDir)
    assert(out.count() > 0)
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.isEmpty, s"walk left executor-resident blocks: $added")
    val leaves = out.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.nonEmpty && leaves.forall(
      _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]),
      s"final hop must be answerable from the driver-held literal, got: " +
        leaves.map(_.getClass.getSimpleName).mkString(","))
  }
}
