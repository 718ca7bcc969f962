package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Invariants of the cluster-size histogram on the real sf0.001 corpus:
  * the histogram's mass tiles the corpus exactly, CC clusters are never
  * size 1 (labels only come from pairs), and the removable-doc count it
  * implies matches the CC entry's non-canonical count.
  */
class ClusterSizesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir

  private lazy val hist = Dedup.dupClusterSizes(spark, dir).cache()

  test("histogram mass tiles the corpus exactly") {
    val mass = hist.agg(sum(col("csize") * col("n_clusters"))).head().getLong(0)
    assert(mass == Tables.documents(spark, dir).count())
  }

  test("every non-singleton bucket has size >= 2; fixture has both kinds") {
    assert(hist.filter(col("csize") < 1).count() == 0)
    assert(hist.filter(col("csize") === 1).count() == 1)
    assert(hist.filter(col("csize") >= 2).count() > 0,
      "fixture must contain multi-doc clusters")
  }

  test("implied removable docs equals the CC entry's non-canonical count") {
    val removable = hist.filter(col("csize") >= 2)
      .agg(sum((col("csize") - 1) * col("n_clusters"))).head().getLong(0)
    val nonCanonical = Dedup.dedupClusters(spark, dir)
      .filter(col("is_canonical") === 0).count()
    assert(removable == nonCanonical)
  }
}
