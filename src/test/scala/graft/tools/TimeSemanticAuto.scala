package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures the occupancy-targeted semantic dedup against the fixed-k
  * catalog entry at one scale point — the evidence behind the sizing-rule
  * claim in SURVEY §8 (fixed k=16 grows quadratically in intra-cluster
  * pairs; rule-picked k holds the curve ~flat). Emits one JSON line per
  * variant; BENCH_semantic_auto.json collects the three scale points.
  *
  * Usage: sbt "Test/runMain graft.tools.TimeSemanticAuto <sfDir>"
  */
object TimeSemanticAuto {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.cache.maxEntries", "1000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new org.apache.spark.sql.graftbridge.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    // auto FIRST so both variants pay cold centroid training (the shared
    // Lloyd cache would otherwise flatter whichever runs second).
    for ((label, fn) <- Seq(
        "auto_occ512" -> (() => graft.ops.Similarity.dedupSemanticAuto(spark, dir)),
        "fixed_k16" -> (() => graft.ops.Similarity.dedupSemantic(spark, dir)))) {
      val t0 = System.nanoTime()
      val rows = fn().count()
      val t = (System.nanoTime - t0) / 1e9
      println(f"""{"tool":"semantic_auto","variant":"$label","sf_dir":"$dir","n_vectors":$n,"rows":$rows,"sec":$t%.2f}""")
    }
    spark.stop()
  }
}
