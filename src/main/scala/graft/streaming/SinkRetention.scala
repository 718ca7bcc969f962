package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Shared maintenance ops for the batch_id-partitioned streaming sinks —
  * the day-2 face of the exactly-once sink contract, factored out of
  * [[DedupStream]] so every sink family (lexical signature index, semantic
  * vector index, sketch state) runs the SAME fold instead of a per-family
  * re-implementation. The contract, restated from DedupStream.compactIndex
  * where it was first proven (spec DedupStreamSpec, catalog
  * `x_stream_dedup_compacted`; the semantic twin is SemanticStreamSpec /
  * `x_stream_semantic_compacted`; the crash windows are exhaustively
  * injected in SinkRetentionSpec):
  *
  *   - CONTENT UNCHANGED: compaction folds every partition with
  *     `batch_id <= watermark` into THE single partition
  *     `batch_id = watermark`. The payload rows are untouched, so the
  *     strictly-earlier probe predicate `batch_id < b` of any future batch
  *     `b > watermark` reads exactly the same rows and the parity theorem
  *     is preserved across the fold.
  *   - MAINTENANCE WINDOW: must run with the stream stopped and
  *     `watermark <=` the last COMMITTED batch id — Structured Streaming
  *     only ever replays the in-flight batch, whose id is strictly greater
  *     than every committed one, so a replay never overwrites or re-probes
  *     a compacted partition.
  *   - CRASH SAFETY, stage-then-publish with ONE atomic rename: (1) the
  *     fold is staged next to the sink; Spark's own `_SUCCESS` marker
  *     gates stage completeness — a crash mid-stage leaves the live sink
  *     untouched and the next run rebuilds the stage from it; (2) only
  *     after the marker exists are the folded partitions dropped, and the
  *     publish is a SINGLE directory rename of the whole stage onto
  *     `batch_id=<watermark>` (the marker rides along inside the
  *     partition; parquet readers ignore underscore-prefixed files).
  *     A re-run with the same watermark recovers EVERY crash point:
  *       - mid-stage (no marker): the stage is rebuilt; the sink was
  *         never touched.
  *       - mid-drop (marker present, some folded partitions already
  *         deleted): re-staging is SKIPPED — essential, because the sink
  *         is now partial while the completed stage still holds every
  *         folded row — the remaining drops run and the rename publishes.
  *       - post-drop / pre-rename: drops no-op, the rename publishes.
  *       - post-rename: the stage (and its marker) moved away with the
  *         publish, so a re-run re-stages from the already-folded index
  *         and re-publishes the identical content — idempotent.
  *     There is deliberately NO per-file move phase: the earlier
  *     file-at-a-time swap had an unrecoverable window (a crash between
  *     two moves left rows that existed in neither the stage nor the
  *     target once the re-run's drop loop re-cleared the target).
  *     The rename is atomic on POSIX filesystems and HDFS; an object
  *     store without atomic directory rename (S3) should run the sink on
  *     a transactional table format instead — this is the plain-parquet
  *     contract.
  *   - REWRITE AMPLIFICATION: one fold rewrites every `<= watermark` byte
  *     once. Folding every maintenance window therefore rewrites the
  *     whole index per window — quadratic in sink lifetime. Use
  *     [[compactIndexIfNeeded]] with threshold K: the fold runs only when
  *     at least K partitions are foldable, so each index byte is
  *     rewritten once per K windows (amortized bytes/window ≈ |index|/K)
  *     while the partition count — what probe-side file listing and
  *     partition pruning actually pay for — stays bounded by
  *     K + in-flight batches. K ≈ sqrt(|index| / |window delta|)
  *     balances rewrite amortization against listing cost.
  */
object SinkRetention {

  /** Fold every `batch_id <= watermark` partition of a batch_id-partitioned
    * parquet sink into the single `batch_id = watermark` partition.
    * `readSchema` is the sink's full schema INCLUDING batch_id;
    * `payloadCols` the data columns to carry (everything but batch_id). */
  def compactIndex(s: SparkSession, indexDir: String, watermark: Long,
      readSchema: StructType, payloadCols: Seq[String]): Unit =
    compactIndexImpl(s, indexDir, watermark, readSchema, payloadCols, _ => ())

  /** Threshold-gated fold (see REWRITE AMPLIFICATION above): compact only
    * when at least `minFolded` partitions satisfy `batch_id <= watermark`,
    * otherwise leave the sink untouched. Returns whether a fold ran, so a
    * maintenance driver can log/observe its amortization schedule. */
  def compactIndexIfNeeded(s: SparkSession, indexDir: String, watermark: Long,
      readSchema: StructType, payloadCols: Seq[String], minFolded: Int): Boolean = {
    val (fs, index) = resolve(s, indexDir)
    val foldable = partitionsAtOrBelow(fs, index, watermark).size
    val run = foldable >= minFolded
    if (run) compactIndex(s, indexDir, watermark, readSchema, payloadCols)
    run
  }

  /** The fold with a phase hook between its crash-relevant steps — the
    * spec seam SinkRetentionSpec uses to inject a crash at every window
    * and prove the re-run contract. `onPhase` receives, in order:
    * "staged", then "dropped:batch_id=<id>" after EACH partition delete,
    * then "dropped-all", then "published". Production path passes a no-op. */
  private[streaming] def compactIndexImpl(s: SparkSession, indexDir: String,
      watermark: Long, readSchema: StructType, payloadCols: Seq[String],
      onPhase: String => Unit): Unit = {
    val (fs, index) = resolve(s, indexDir)
    val stage = new Path(s"${indexDir}_compact_stage")
    val marker = new Path(stage, "_SUCCESS")

    if (!fs.exists(marker)) {
      // partial stage from a crashed run: rebuild from the (still intact)
      // live sink. A marker-less stage can only coexist with a complete
      // sink — drops start strictly after the marker exists.
      if (fs.exists(stage)) fs.delete(stage, true)
      s.read.schema(readSchema).parquet(indexDir)
        .filter(col("batch_id") <= watermark)
        .select(payloadCols.map(col): _*)
        .write.mode("overwrite").parquet(stage.toString)
      require(fs.exists(marker), s"staged compaction missing _SUCCESS under $stage")
    }
    onPhase("staged")
    // Drop every folded partition (the watermark partition included — the
    // publish rename needs a free target). Safe at any crash point in this
    // loop: the complete, marker-gated stage still holds every folded row,
    // and a re-run skips straight here.
    partitionsAtOrBelow(fs, index, watermark).foreach { p =>
      fs.delete(p, true)
      onPhase(s"dropped:${p.getName}")
    }
    onPhase("dropped-all")
    // Publish: ONE atomic rename of the whole stage onto the watermark
    // partition. The _SUCCESS marker moves inside it (ignored by readers)
    // and with it the "stage is complete" signal — exactly right, because
    // after this instant a re-run must re-stage, not reuse.
    val target = new Path(index, s"batch_id=$watermark")
    require(!fs.exists(target), s"publish target $target still exists after the drop phase")
    require(fs.rename(stage, target), s"atomic publish rename $stage -> $target failed")
    onPhase("published")
  }

  /** Retention for a result sink: drop every partition with
    * `batch_id < keepFrom`. Results are consumed downstream as each batch
    * lands, so retention is a plain partition drop, not a fold; nothing
    * later reads them back (probes read the index, never the result sink). */
  def prunePartitions(s: SparkSession, dir: String, keepFrom: Long): Unit = {
    val (fs, root) = resolve(s, dir)
    listDir(fs, root).foreach { p =>
      batchIdOf(p).filter(_ < keepFrom).foreach(_ => fs.delete(p, true))
    }
  }

  private def resolve(s: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(s.sparkContext.hadoopConfiguration), p)
  }

  private def batchIdOf(p: Path): Option[Long] = {
    val n = p.getName
    if (n.startsWith("batch_id=")) Some(n.drop("batch_id=".length).toLong) else None
  }

  private def partitionsAtOrBelow(fs: FileSystem, index: Path, watermark: Long): Seq[Path] =
    listDir(fs, index).filter(p => batchIdOf(p).exists(_ <= watermark))

  private def listDir(fs: FileSystem, p: Path): Seq[Path] =
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toIndexedSeq.map(_.getPath).sortBy(_.getName)
}
