package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import graft.chunker.{BatchChunker, ChunkerConfig}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: the reference's bread-and-butter workload — a chunked batch
    * operation over a big table (reference examples/basic.pl:21-31), Spark
    * style. The adaptive chunk loop walks the lineitem keyspace and each
    * chunk's aggregate is a pushdown-pruned Spark action; the result is a
    * per-chunk audit DataFrame (driver smoke-checks rows > 0).
    */
  def entry(spark: SparkSession): DataFrame = {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val bc = new BatchChunker(li, "l_orderkey",
      ChunkerConfig(chunkSize = BigInt(256), targetTime = 0, sleep = 0,
        minChunkPercent = 0.5, log = _ => ()))
    bc.calculateRanges()
    // Each chunk's one-row audit aggregate goes straight to a parquet sink —
    // the driver never accumulates per-chunk rows (with chunkSize=256 over a
    // 100× keyspace a driver-side buffer would grow without bound; the sink
    // holds one tiny file per chunk instead, and the readback is itself a
    // distributed scan).
    val auditDir = graft.ops.Scratch.dir("graft_entry_audit")
    bc.foreachChunk { chunk =>
      chunk.agg(
          min(col("l_orderkey")).as("first_key"),
          max(col("l_orderkey")).as("last_key"),
          count(lit(1)).as("n_rows"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(DecimalType(18, 4)))
            .cast(DoubleType).as("revenue"))
        .filter(col("n_rows") > 0) // empty chunks audit nothing (schema still lands)
        .write.mode("append").parquet(auditDir)
    }
    // Readback compaction: one tiny file per chunk is the right write path
    // (no driver buffer), but at a 100x keyspace the audit dir becomes its
    // own small-files problem — so the readback coalesces into ~128 MB
    // target files when the chunk count is nontrivial. Both the audit
    // writes and the compaction are distributed jobs; rows are unchanged.
    val auditPath = new org.apache.hadoop.fs.Path(auditDir)
    val fs = auditPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataFiles = fs.listStatus(auditPath)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    val raw = spark.read.parquet(auditDir)
    if (dataFiles.length <= 16) raw
    else {
      val targetFiles = math.max(1, (dataFiles.map(_.getLen).sum / (128L << 20)).toInt)
      val compactDir = graft.ops.Scratch.dir("graft_entry_audit_c")
      raw.coalesce(targetFiles).write.mode("overwrite").parquet(compactDir)
      spark.read.parquet(compactDir)
    }
  }

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * training-data-pipeline extensions (dedup, similarity, text analysis,
    * multimodal). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.ops.CoreQueries.queries ++
      graft.ops.SkewOps.queries ++
      graft.ops.MoreQueries.queries ++
      graft.ops.ExtraQueries.queries ++
      graft.ops.GraphOps.queries ++
      graft.ops.TextAnalysis.queries ++
      graft.ops.Dedup.queries ++
      graft.ops.Similarity.queries ++
      graft.ops.Multimodal.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops (sketches:
    * minhash/simhash/LSH) — those get the driver's rows-only check. */
  def oracleSql: Map[String, String] =
    graft.ops.CoreQueries.oracleSql ++
      graft.ops.SkewOps.oracleSql ++
      graft.ops.MoreQueries.oracleSql ++
      graft.ops.ExtraQueries.oracleSql ++
      graft.ops.GraphOps.oracleSql ++
      graft.ops.TextAnalysis.oracleSql ++
      graft.ops.Dedup.oracleSql ++
      graft.ops.Similarity.oracleSql ++
      graft.ops.Multimodal.oracleSql
}
