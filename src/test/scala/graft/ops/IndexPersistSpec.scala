package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** The persisted-index probe's contract: artifacts written by the build
  * job (centroids, codebooks, coded corpus) drive a probe whose output is
  * BIT-IDENTICAL to building and probing in one job — parquet round-trips
  * doubles and ints exactly, and the probe half shares its code with the
  * in-job entry through the ivfPqProbe seam.
  */
class IndexPersistSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.001"

  test("the persisted probe is bit-identical to build-and-probe-in-one-job") {
    val fresh = Similarity.queries("x_ann_ivfpq")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val loaded = Similarity.queries("x_ann_ivfpq_persisted")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(fresh.nonEmpty)
    assert(loaded.sortBy(t => (t._1, t._2)).toSeq ==
      fresh.sortBy(t => (t._1, t._2)).toSeq)
  }

  test("the build job writes the three artifacts at their documented shapes") {
    // Drive the build through a throwaway work dir by replaying the same
    // writes the entry performs (the entry's own dir is private to it).
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("index_persist_spec").toString
    Similarity.trainIvfCentroids(spark, d).zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cl", "cent").write.parquet(s"$work/centroids")
    val cents = spark.read.parquet(s"$work/centroids")
    assert(cents.count() == 16) // IVF_K
    assert(cents.select(size(col("cent"))).distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(64)) // embedding dim
    // Loaded arrays must reconstruct in cluster order regardless of the
    // parquet row order — the entry sorts by cl after collect.
    val loaded = cents.collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).map(_._2)
    assert(loaded.length == 16 && loaded.forall(_.length == 64))
    (loaded, Similarity.trainIvfCentroids(spark, d)).zipped.foreach {
      (a, b) => assert(java.util.Arrays.equals(a, b)) // exact round-trip
    }
  }
}
