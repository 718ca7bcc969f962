package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Invariants of the leakage-safe split on the real sf0.001 corpus:
  * near-dup pairs never straddle a split boundary, assignment tiles the
  * corpus exactly once and is deterministic, and the hash residues follow
  * the 80/10/10 law at CLUSTER granularity.
  */
class LeakageSafeSplitSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir

  private lazy val split = Dedup.leakageSafeSplit(spark, dir).cache()

  test("assignment tiles the corpus: every doc exactly once, split non-null") {
    val nDocs = Tables.documents(spark, dir).count()
    assert(split.count() == nDocs)
    assert(split.select(col("doc_id")).distinct().count() == nDocs)
    assert(split.filter(col("split").isNull).count() == 0)
  }

  test("no near-dup candidate pair straddles a split boundary") {
    // Recompute the same candidate relation the operator clusters on (the
    // WIDE family) and join each endpoint to its split: a pair with two
    // different splits is exactly an eval-set leak.
    val pairs = Dedup.simhashBandedPairs(
      Dedup.simhashWideSignatures(spark, dir), words = 2, bandBits = 15, maxHamming = 7)
    val sa = split.select(col("doc_id").as("doc_a"), col("split").as("split_a"))
    val sb = split.select(col("doc_id").as("doc_b"), col("split").as("split_b"))
    val straddling = pairs.join(sa, "doc_a").join(sb, "doc_b")
      .filter(col("split_a") =!= col("split_b"))
      .count()
    assert(straddling == 0L, s"$straddling near-dup pairs straddle splits")
    assert(pairs.count() > 0, "fixture must actually contain near-dup pairs")
  }

  test("split is a pure function of the cluster id (deterministic across runs)") {
    val again = Dedup.leakageSafeSplit(spark, dir)
    assert(split.exceptAll(again).count() == 0 && again.exceptAll(split).count() == 0)
    // one split per cluster, by construction AND by data
    val multi = split.groupBy(col("cluster_id"))
      .agg(countDistinct(col("split")).as("k")).filter(col("k") > 1).count()
    assert(multi == 0L)
  }

  test("residue law: cluster-level proportions approximate 80/10/10") {
    val perCluster = split.select(col("cluster_id"), col("split")).distinct()
    val n = perCluster.count().toDouble
    val frac = perCluster.groupBy(col("split")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1) / n).toMap
    // sf0.001 has few hundred clusters — loose but directional bounds
    assert(frac("train") > 0.65 && frac("train") < 0.95, frac.toString)
    assert(frac.getOrElse("valid", 0.0) + frac.getOrElse("test", 0.0) > 0.05, frac.toString)
  }
}
