package graft.streaming

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
  * `x_stream_semantic_compacted`):
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
  *   - CRASH SAFETY, stage-then-swap: (1) the fold is staged next to the
  *     sink with a `_SUCCESS` marker — a crash mid-stage leaves the live
  *     sink untouched and the next run rebuilds the stage; (2) only after
  *     the marker exists are the folded partitions dropped and the staged
  *     files published as the watermark partition — a crash mid-swap is
  *     recovered by RE-RUNNING with the same watermark (the completed
  *     stage is detected and the swap resumes). A deployment on a
  *     transactional table format gets the swap atomically instead; this
  *     is the plain-parquet contract.
  */
object SinkRetention {

  /** Fold every `batch_id <= watermark` partition of a batch_id-partitioned
    * parquet sink into the single `batch_id = watermark` partition.
    * `readSchema` is the sink's full schema INCLUDING batch_id;
    * `payloadCols` the data columns to carry (everything but batch_id). */
  def compactIndex(s: SparkSession, indexDir: String, watermark: Long,
      readSchema: StructType, payloadCols: Seq[String]): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val stage = Paths.get(s"${indexDir}_compact_stage")
    val marker = stage.resolve("_SUCCESS")

    if (!Files.exists(marker)) {
      deleteTree(stage) // partial stage from a crashed run: rebuild
      s.read.schema(readSchema).parquet(indexDir)
        .filter(col("batch_id") <= watermark)
        .select(payloadCols.map(col): _*)
        .write.mode("overwrite").parquet(stage.toString)
      require(Files.exists(marker), s"staged compaction missing _SUCCESS under $stage")
    }
    // Swap: drop every folded partition, publish the stage as the
    // watermark partition. Recovery of a crash here = re-run (stage kept).
    listDir(Paths.get(indexDir)).foreach { p =>
      val n = p.getFileName.toString
      if (n.startsWith("batch_id=") && n.drop("batch_id=".length).toLong <= watermark)
        deleteTree(p)
    }
    val target = Paths.get(indexDir, s"batch_id=$watermark")
    Files.createDirectories(target)
    listDir(stage).foreach { f =>
      val n = f.getFileName.toString
      if (n.startsWith("part-"))
        Files.move(f, target.resolve(n), StandardCopyOption.REPLACE_EXISTING)
    }
    deleteTree(stage)
  }

  /** Retention for a result sink: drop every partition with
    * `batch_id < keepFrom`. Results are consumed downstream as each batch
    * lands, so retention is a plain partition drop, not a fold; nothing
    * later reads them back (probes read the index, never the result sink). */
  def prunePartitions(dir: String, keepFrom: Long): Unit = {
    import java.nio.file.Paths
    listDir(Paths.get(dir)).foreach { p =>
      val n = p.getFileName.toString
      if (n.startsWith("batch_id=") && n.drop("batch_id=".length).toLong < keepFrom)
        deleteTree(p)
    }
  }

  private[streaming] def listDir(p: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val st = java.nio.file.Files.list(p)
    try {
      import scala.jdk.CollectionConverters._
      st.iterator().asScala.toVector
    } finally st.close()
  }

  private[streaming] def deleteTree(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      val st = java.nio.file.Files.walk(p)
      try {
        import scala.jdk.CollectionConverters._
        st.iterator().asScala.toVector.sortBy(_.toString).reverse
          .foreach(java.nio.file.Files.delete)
      } finally st.close()
    }
}
