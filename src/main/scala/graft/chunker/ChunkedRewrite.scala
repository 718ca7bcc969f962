package graft.chunker

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Chunked DML over immutable storage — the reference's bread-and-butter
  * (chunked UPDATE/DELETE against a live RDBMS,
  * reference lib/DBIx/BatchChunker.pm:116-131, examples/basic.pl:21-31)
  * re-expressed as per-chunk copy-on-write:
  *
  *  - DELETE = anti-filter: each chunk writes only the rows that survive;
  *  - UPDATE = column rewrite: each chunk writes its transformed rows;
  *  - each chunk's output goes to its own range-keyed subdirectory with
  *    `Overwrite` mode, which stands in for the reference's per-chunk
  *    transaction: a failed/retried chunk simply re-overwrites its own
  *    directory, so retries are idempotent and a crashed run resumes from
  *    the engine's resume point without double-writing earlier chunks.
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
    bc.foreachChunkWithRange { (chunk, chunkDf) =>
      transform(chunkDf)
        .write.mode("overwrite")
        .parquet(s"$outDir/chunk_${chunk.start}_${chunk.end}")
    }
  }

  /** Read the rewritten table back as one DataFrame. */
  def readBack(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/chunk_*")
}
