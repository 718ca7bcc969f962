package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Invariants of SoftDeDup-style duplicate down-weighting on the real
  * sf0.001 corpus: the audit tiles the corpus, weighting only ever
  * deflates token mass (equality exactly when a source has no dup
  * clusters), and each near-dup cluster contributes one document's worth
  * of ppm mass (up to integer-division truncation).
  */
class SoftWeightsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir

  private lazy val audit = Dedup.dedupSoftWeights(spark, dir).cache()

  test("audit tiles the corpus: per-source doc counts match the table") {
    val expected = Tables.documents(spark, dir)
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val got = audit.select(col("source"), col("n_docs"))
    assert(got.exceptAll(expected).count() == 0 &&
      expected.exceptAll(got).count() == 0)
  }

  test("weighting only deflates; sources with no dup clusters keep full mass") {
    val rows = audit.select(col("source"), col("n_in_dup_clusters"),
      col("raw_tokens"), col("weighted_tokens")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // mass accumulates as DECIMAL(38,0) internally but is EMITTED as
      // whole tokens (ppm sum div 1e6) — BIGINT, hash-stable
      val (nd, raw, w) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(w <= raw, s"${r.getString(0)}: inflated mass")
      if (nd == 0L) assert(w == raw,
        s"${r.getString(0)}: no dup clusters but mass deflated")
    }
    // the fixture must actually exercise the deflation path
    assert(rows.map(_.getLong(1)).sum > 0, "fixture has no dup clusters")
  }

  test("Over form on synthetic inputs: exact ppm weights by hand") {
    import spark.implicits._
    // docs 1-2-3 one chain cluster (csize 3 -> 333333 ppm each), 4 alone.
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val docs = Seq((1L, "a", 100L), (2L, "a", 50L), (3L, "b", 10L),
      (4L, "b", 7L)).toDF("doc_id", "source", "n_tokens")
    val got = Dedup.dedupSoftWeightsOver(pairs, docs)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    // ppm sums before the div-1e6 emission: a = 150*333333 = 49,999,950
    // -> 49 tokens; b = 10*333333 + 7*1000000 = 10,333,330 -> 10 tokens.
    assert(got("a") == ((2L, 2L, 150L, 49L)))
    assert(got("b") == ((2L, 1L, 17L, 10L)))
  }

  test("cross-entry consistency: dup-cluster membership equals the pair relation's support") {
    // Docs counted in multi-doc clusters are exactly the docs appearing in
    // at least one near-dup pair — ties the audit to the candidate
    // relation it is derived from.
    val inClusters = audit.agg(sum(col("n_in_dup_clusters"))).head().getLong(0)
    val pairs = Dedup.dedupSimhash(spark, dir)
    val support = pairs.select(col("doc_a").as("d"))
      .union(pairs.select(col("doc_b").as("d"))).distinct().count()
    assert(inClusters == support, s"audit $inClusters vs pair support $support")
  }

  test("each dup cluster contributes ~1e6 ppm of document mass") {
    // Recompute the same cluster relation the operator weights on and
    // check: sum of per-doc weight_ppm within a cluster of size k is
    // k * (1000000 div k) — within (1e6 - k, 1e6].
    val labels = Dedup.connectedComponents(
        Dedup.dedupSimhash(spark, dir).select(col("doc_a"), col("doc_b")))
      .select(col("id"), col("label"))
    val bad = labels.groupBy(col("label")).agg(count(lit(1)).as("k"))
      .withColumn("mass_ppm", col("k") * expr("1000000 div k"))
      .filter(col("mass_ppm") <= lit(1000000L) - col("k") ||
        col("mass_ppm") > 1000000L)
      .count()
    assert(bad == 0L)
    assert(labels.count() > 0, "fixture must contain clustered docs")
  }
}
