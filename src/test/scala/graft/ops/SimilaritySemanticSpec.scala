package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Semantic (SemDeDup-shape) dedup invariants on the real sf0.001
  * embeddings, for BOTH the oracled default (k=16) and the fine scale
  * configuration (k=64): the greedy keep-first law (each reported
  * duplicate names the SMALLEST qualifying lower-id keeper in its own
  * cluster), pair co-clustering, threshold, and exact parity with a naive
  * recomputation from the trained centroids.
  */
class SimilaritySemanticSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir

  private def assigned(k: Int) = {
    val cents = Similarity.trainIvfCentroids(spark, dir, k)
    val sims = (v: org.apache.spark.sql.Column) =>
      transform(typedLit(cents.map(_.toSeq).toSeq),
        c => org.apache.spark.sql.graftbridge.dotProduct(v, c))
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(Similarity.dot(col("v"), col("v"))))
      .withColumn("cl",
        (array_position(sims(col("v")), array_max(sims(col("v")))) - 1).cast("int"))
  }

  for (k <- Seq(16, 64)) {
    lazy val out = Similarity.dedupSemantic(spark, dir, k).cache()

    test(s"k=$k: nonempty; one row per duplicate; dup_of strictly lower; threshold held") {
      val n = out.count()
      assert(n > 0, "fixture corpus must surface at least one semantic duplicate")
      assert(out.select(col("vec_id")).distinct().count() == n)
      assert(out.filter(col("dup_of") >= col("vec_id")).count() == 0)
      assert(out.filter(col("cos") < 0.4).count() == 0)
    }

    test(s"k=$k: greedy keep-first parity with a naive intra-cluster recomputation") {
      val a = assigned(k)
      val naive = a.as("x").join(a.as("y"),
          col("x.cl") === col("y.cl") && col("y.vec_id") < col("x.vec_id"))
        .select(col("x.vec_id").as("vec_id"), col("y.vec_id").as("dup_of"),
          (Similarity.dot(col("x.v"), col("y.v")) / (col("x.nrm") * col("y.nrm"))).as("cos"))
        .filter(col("cos") >= 0.4)
        .groupBy(col("vec_id")).agg(min(col("dup_of")).as("dup_of"))
      val got = out.select(col("vec_id"), col("dup_of"))
      assert(got.exceptAll(naive).count() == 0 && naive.exceptAll(got).count() == 0,
        s"k=$k operator pair set must equal the naive intra-cluster recomputation")
    }

    test(s"k=$k: every reported pair is co-clustered under the trained centroids") {
      val cl = assigned(k).select(col("vec_id"), col("cl"))
      val bad = out
        .join(cl.withColumnRenamed("vec_id", "vid").withColumnRenamed("cl", "cl_a"),
          col("vec_id") === col("vid"))
        .join(cl.withColumnRenamed("vec_id", "vid2").withColumnRenamed("cl", "cl_b"),
          col("dup_of") === col("vid2"))
        .filter(col("cl_a") =!= col("cl_b") || col("cl_a") =!= col("cluster"))
        .count()
      assert(bad == 0)
    }
  }
}
