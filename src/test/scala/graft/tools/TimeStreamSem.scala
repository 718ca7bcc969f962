package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: phase-level timing of the x_stream_semantic_incremental
  * body (train / stage / stream / read-back), to attribute its sf5 bench
  * cost before optimizing. Usage: Test/runMain graft.tools.TimeStreamSem <sfDir> */
object TimeStreamSem {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new org.apache.spark.sql.graftbridge.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import graft.ops.Similarity
    val n = t("count")(Similarity.vectors(spark, d).count())
    val k = math.max(16, math.toIntExact((n + 24) / 25))
    val cents = t("train")(Similarity.trainIvfCentroids(spark, d, k))
    val work = java.nio.file.Files.createTempDirectory("graft_tss").toString
    val stage = s"$work/stage"
    val vecs = Similarity.vectors(spark, d).select(col("vec_id"), col("v"), col("nrm"))
    t("stage") {
      (0 until 3).foreach { b =>
        vecs.filter(col("vec_id") % 3 === b)
          .coalesce(1).write.mode("append").parquet(stage)
      }
    }
    // Drive the batch body DIRECTLY (no streaming machinery) to attribute
    // per-batch cost, then the real stream for the machinery delta.
    val indexDir = s"$work/direct_index"; val matchesDir = s"$work/direct_matches"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(indexDir))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(matchesDir))
    (0 until 3).foreach { b =>
      t(s"direct_batch$b") {
        val batch = vecs.filter(col("vec_id") % 3 === b)
        graft.streaming.SemanticStream.incrementalBatch(
          v => Similarity.assignCluster(v, cents), Similarity.SEM_TAU,
          indexDir, matchesDir)(batch, b.toLong)
      }
    }
    val matches = t("stream") {
      graft.streaming.SemanticStream.runIncremental(spark, stage, work,
        v => Similarity.assignCluster(v, cents), Similarity.SEM_TAU)
    }
    t("readback")(matches.select(col("vec_a"), col("vec_b"), col("cluster"))
      .orderBy(col("vec_a"), col("vec_b")).count())
    spark.stop()
  }
}
