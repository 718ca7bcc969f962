package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.SparkTestSession

/** The compaction fold's crash contract, proven by INJECTING a crash at
  * every phase boundary the implementation exposes and re-running — the
  * contract is "a crash at any point is recovered by re-running with the
  * same watermark", so each test kills the fold at one window, re-runs,
  * and asserts the index is byte-complete (exact multiset of rows) with
  * the folded single-partition layout.
  *
  * The round-13 implementation failed exactly this: its per-file move
  * phase had a window (crash between two moves) where a re-run's drop
  * loop deleted already-moved files that no longer existed in the stage —
  * silent row loss. The atomic-rename publish removes the window; the
  * "dropped:" injections here are the regression pin.
  */
class SinkRetentionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val schema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("mh", LongType, nullable = false),
    StructField("batch_id", LongType, nullable = false)))
  private val payload = Seq("doc_id", "mh")

  /** A 3-partition batch_id sink with 4 known rows per partition. */
  private def mkIndex(): (String, Set[(Long, Long)]) = {
    val dir = java.nio.file.Files.createTempDirectory("sink_retention_spec").toString
    val rows = for (b <- 0L until 3L; i <- 0L until 4L) yield (b * 100 + i, b * 7 + i, b)
    import spark.implicits._
    rows.toDF("doc_id", "mh", "batch_id")
      .write.partitionBy("batch_id").mode("overwrite").parquet(dir)
    (dir, rows.map(r => (r._1, r._2)).toSet)
  }

  private def partitions(dir: String): Seq[String] =
    new java.io.File(dir).list().filter(_.startsWith("batch_id=")).sorted.toSeq

  private def content(dir: String): Set[(Long, Long)] =
    spark.read.schema(schema).parquet(dir)
      .select(col("doc_id"), col("mh"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private case class Crash(phase: String) extends RuntimeException(phase)

  /** Run the fold, killing it the moment `onPhase` reports `at`; then
    * re-run the production entry point and check full recovery. */
  private def crashAtThenRecover(at: String): Unit = {
    val (dir, want) = mkIndex()
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    val ex = intercept[Crash] {
      SinkRetention.compactIndexImpl(spark, dir, watermark = 1L, schema, payload,
        p => { seen += p; if (p == at) throw Crash(p) })
    }
    assert(ex.phase == at)
    SinkRetention.compactIndex(spark, dir, watermark = 1L, schema, payload)
    assert(partitions(dir) == Seq("batch_id=1", "batch_id=2"),
      s"crash at '$at': layout ${partitions(dir)}")
    assert(content(dir) == want, s"crash at '$at' lost or duplicated rows")
    assert(!new java.io.File(s"${dir}_compact_stage").exists(),
      s"crash at '$at': stage not cleaned up by the recovery run")
  }

  test("fold with no crash: folds <=watermark into one partition, content unchanged") {
    val (dir, want) = mkIndex()
    SinkRetention.compactIndex(spark, dir, watermark = 1L, schema, payload)
    assert(partitions(dir) == Seq("batch_id=1", "batch_id=2"))
    assert(content(dir) == want)
    // idempotent: re-running with the same watermark is a content no-op
    SinkRetention.compactIndex(spark, dir, watermark = 1L, schema, payload)
    assert(partitions(dir) == Seq("batch_id=1", "batch_id=2"))
    assert(content(dir) == want)
  }

  test("crash after staging, before any drop: re-run recovers") {
    crashAtThenRecover("staged")
  }

  test("crash BETWEEN two partition drops: re-run recovers (the round-13 loss window)") {
    crashAtThenRecover("dropped:batch_id=0")
  }

  test("crash after all drops, before the publish rename: re-run recovers") {
    crashAtThenRecover("dropped-all")
  }

  test("crash immediately after publish: re-run is a clean idempotent fold") {
    crashAtThenRecover("published")
  }

  test("a marker-less partial stage is rebuilt, never trusted") {
    val (dir, want) = mkIndex()
    // fabricate a corrupt partial stage with NO _SUCCESS: one bogus file
    val stage = java.nio.file.Paths.get(s"${dir}_compact_stage")
    java.nio.file.Files.createDirectories(stage)
    java.nio.file.Files.write(stage.resolve("part-corrupt.parquet"), Array[Byte](1, 2, 3))
    SinkRetention.compactIndex(spark, dir, watermark = 1L, schema, payload)
    assert(partitions(dir) == Seq("batch_id=1", "batch_id=2"))
    assert(content(dir) == want)
  }

  test("threshold-gated fold: below threshold no-ops, at threshold folds") {
    val (dir, want) = mkIndex()
    val ran0 = SinkRetention.compactIndexIfNeeded(spark, dir, watermark = 1L,
      schema, payload, minFolded = 3)
    assert(!ran0, "2 foldable partitions must not trigger a minFolded=3 fold")
    assert(partitions(dir) == Seq("batch_id=0", "batch_id=1", "batch_id=2"),
      "a skipped fold must leave the sink byte-untouched")
    val ran1 = SinkRetention.compactIndexIfNeeded(spark, dir, watermark = 2L,
      schema, payload, minFolded = 3)
    assert(ran1, "3 foldable partitions must trigger a minFolded=3 fold")
    assert(partitions(dir) == Seq("batch_id=2"))
    assert(content(dir) == want)
  }
}
