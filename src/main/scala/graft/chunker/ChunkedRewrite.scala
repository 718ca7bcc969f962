package graft.chunker

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Chunked DML over immutable storage — the reference's bread-and-butter
  * (chunked UPDATE/DELETE against a live RDBMS,
  * reference lib/DBIx/BatchChunker.pm:116-131, examples/basic.pl:21-31)
  * re-expressed as per-chunk copy-on-write:
  *
  *  - DELETE = anti-filter: each chunk writes only the rows that survive;
  *  - UPDATE = column rewrite: each chunk writes its transformed rows;
  *  - each chunk STAGES its output under a dot-prefixed scratch directory
  *    and then RENAMES it into its range-keyed final directory — the
  *    moral equivalent of the reference's per-chunk transaction commit
  *    (lib/DBIx/BatchChunker.pm:1305-1327): a reader listing `chunk_*`
  *    never observes a half-written chunk (dot-dirs are invisible to the
  *    glob AND to Spark's file-index, which skips `.`/`_` paths), a
  *    failed/retried chunk re-stages and re-renames idempotently, and a
  *    crashed run resumes from the engine's resume point without
  *    double-writing earlier chunks.
  *
  * The semantic difference from a real transaction (readers can observe a
  * half-rewritten TABLE across chunk boundaries, never within one chunk) is
  * inherent to file storage and documented here on purpose — the reference
  * has the same visibility story across chunks, since each chunk commits
  * independently.
  *
  * At scale: every chunk write is a distributed job over only that chunk's
  * row-group-pruned slice; output directory count = chunk count, so size
  * chunks for sane file counts (targetTime does this automatically when the
  * per-chunk work is timed).
  */
object ChunkedRewrite {

  /** Run `transform` over each chunk of `df` and write the results under
    * `outDir/chunk_<start>_<end>/`. Returns the execution report (chunk
    * stats, resume point).
    */
  def rewrite(
      df: DataFrame,
      idColumn: String,
      cfg: ChunkerConfig,
      outDir: String
  )(transform: DataFrame => DataFrame): ExecutionReport = {
    val bc = new BatchChunker(df, idColumn, cfg)
    bc.calculateRanges()
    val hconf = df.sparkSession.sparkContext.hadoopConfiguration
    bc.foreachChunkWithRange { (chunk, chunkDf) =>
      val staging = new org.apache.hadoop.fs.Path(
        s"$outDir/.staging_chunk_${chunk.start}_${chunk.end}")
      val finalDir = new org.apache.hadoop.fs.Path(
        s"$outDir/chunk_${chunk.start}_${chunk.end}")
      val fs = finalDir.getFileSystem(hconf)
      transform(chunkDf).write.mode("overwrite").parquet(staging.toString)
      // Commit = swap the fully-written staging dir in. The only
      // non-atomic instant is between delete and rename, during which the
      // chunk is ABSENT (a reader skips it), never partial.
      if (fs.exists(finalDir)) fs.delete(finalDir, true)
      if (!fs.rename(staging, finalDir))
        throw new java.io.IOException(s"commit rename failed for $finalDir")
    }
  }

  /** Read the rewritten table back as one DataFrame. */
  def readBack(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/chunk_*")
}
