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

  // ---- Manifest-pointer publish: the object-store-safe protocol ----------

  /** Rename-refusing FileSystem: what an S3-class store looks like to the
    * maintenance path. Every protocol FS call in the manifest matrix below
    * routes through this shim, so a protocol that renamed ANYTHING —
    * directory or file — would fail its crash matrix outright. */
  private class NoRenameFs(underlying: org.apache.hadoop.fs.FileSystem)
      extends org.apache.hadoop.fs.FilterFileSystem(underlying) {
    override def rename(src: org.apache.hadoop.fs.Path,
        dst: org.apache.hadoop.fs.Path): Boolean =
      throw new AssertionError(s"object-store shim: rename($src -> $dst) is not available")
  }

  private def shim(dir: String): org.apache.hadoop.fs.FileSystem =
    new NoRenameFs(new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration))

  private def liveContent(dir: String,
      fs: org.apache.hadoop.fs.FileSystem): Set[(Long, Long)] =
    SinkRetention.readLiveImpl(spark, dir, schema, Some(fs))
      .select(col("doc_id"), col("mh"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  /** Kill the manifest fold at phase `at` (through the no-rename shim),
    * re-run the production path (same shim), and demand full recovery:
    * folded rows live behind the manifest, plain layout holds only the
    * above-watermark partition, exactly one fold generation and one valid
    * manifest remain. */
  private def manifestCrashAtThenRecover(at: String): Unit = {
    val (dir, want) = mkIndex()
    val fs = shim(dir)
    val ex = intercept[Crash] {
      SinkRetention.compactIndexManifestImpl(spark, dir, 1L, schema, payload,
        p => if (p == at) throw Crash(p) else (), Some(fs))
    }
    assert(ex.phase == at)
    SinkRetention.compactIndexManifestImpl(spark, dir, 1L, schema, payload, _ => (), Some(fs))
    assert(partitions(dir) == Seq("batch_id=2"),
      s"crash at '$at': plain partition layout ${partitions(dir)}")
    assert(liveContent(dir, fs) == want, s"crash at '$at' lost or duplicated rows")
    val names = new java.io.File(dir).list().toSeq
    assert(names.count(_.startsWith("_fold_")) == 1,
      s"crash at '$at': stale fold generations in $names")
    assert(names.count(_.startsWith("_MANIFEST-")) == 1,
      s"crash at '$at': stale manifests in $names")
  }

  test("manifest fold, no crash: plain layout keeps only >watermark, readLive content unchanged") {
    val (dir, want) = mkIndex()
    val fs = shim(dir)
    SinkRetention.compactIndexManifestImpl(spark, dir, 1L, schema, payload, _ => (), Some(fs))
    assert(partitions(dir) == Seq("batch_id=2"))
    assert(liveContent(dir, fs) == want)
    // idempotent re-run: GC-only path, content untouched, no new version
    SinkRetention.compactIndexManifestImpl(spark, dir, 1L, schema, payload, _ => (), Some(fs))
    assert(liveContent(dir, fs) == want)
    assert(new java.io.File(dir).list().count(_.startsWith("_MANIFEST-")) == 1)
  }

  test("manifest crash after staging, before the commit: re-run reuses the stage (no-rename FS)") {
    manifestCrashAtThenRecover("staged")
  }

  test("manifest crash after the commit, before any GC: re-run sweeps (no-rename FS)") {
    manifestCrashAtThenRecover("published")
  }

  test("manifest crash BETWEEN two GC deletes: re-run recovers (no-rename FS)") {
    manifestCrashAtThenRecover("gc:batch_id=0")
  }

  test("manifest crash after gc-done: re-run is a clean idempotent no-op (no-rename FS)") {
    manifestCrashAtThenRecover("gc-done")
  }

  test("a marker-less partial fold generation is rebuilt, never trusted") {
    val (dir, want) = mkIndex()
    val fs = shim(dir)
    val stage = java.nio.file.Paths.get(s"$dir/_fold_w1_g1")
    java.nio.file.Files.createDirectories(stage)
    java.nio.file.Files.write(stage.resolve("part-corrupt.parquet"), Array[Byte](1, 2, 3))
    SinkRetention.compactIndexManifestImpl(spark, dir, 1L, schema, payload, _ => (), Some(fs))
    assert(liveContent(dir, fs) == want)
  }

  test("a torn manifest is ignored by resolution and swept by the next commit") {
    val (dir, want) = mkIndex()
    val fs = shim(dir)
    SinkRetention.compactIndexManifestImpl(spark, dir, 1L, schema, payload, _ => (), Some(fs))
    // fabricate a TORN higher-version manifest (no #END terminator): a
    // crash mid-create on a POSIX store leaves exactly this prefix
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/_MANIFEST-000000002"),
      "graft-sink-manifest v1\nwatermark=99\nfold=_fold_w99_g1\n".getBytes("UTF-8"))
    assert(liveContent(dir, fs) == want, "a torn manifest must not change resolution")
    assert(partitions(dir) == Seq("batch_id=2"))
    // the next maintenance window folds at watermark 2 and must commit
    // version 2 over the torn file's carcass
    SinkRetention.compactIndexManifestImpl(spark, dir, 2L, schema, payload, _ => (), Some(fs))
    assert(liveContent(dir, fs) == want)
    assert(partitions(dir) == Seq.empty, "everything <= watermark 2 folds away")
  }

  test("every strict byte-prefix of a manifest either fails validation or carries the exact content") {
    // The #END-terminator design's torn-write theorem, enumerated: a crash
    // mid-create leaves a byte PREFIX. Because #END is the LAST line, a
    // prefix either lacks a complete terminator (rejected — resolution
    // falls back to the previous version) or contains the COMPLETE
    // watermark and fold lines (only the trailing newline may be missing),
    // in which case resolving it is harmless: identical committed state.
    // No prefix may ever resolve to a THIRD state.
    val (dir, want) = mkIndex()
    val fs = shim(dir)
    SinkRetention.compactIndexManifestImpl(spark, dir, 1L, schema, payload, _ => (), Some(fs))
    val v1 = java.nio.file.Paths.get(s"$dir/_MANIFEST-000000001")
    val bytes = java.nio.file.Files.readAllBytes(v1)
    val full = SinkRetention.currentManifest(fs, new org.apache.hadoop.fs.Path(dir))
      .getOrElse(fail("complete manifest must resolve"))
    val torn = java.nio.file.Paths.get(s"$dir/_MANIFEST-000000002")
    (0 until bytes.length).foreach { n =>
      java.nio.file.Files.write(torn, bytes.take(n))
      val cur = SinkRetention.currentManifest(fs, new org.apache.hadoop.fs.Path(dir))
        .getOrElse(fail(s"resolution must not go blank on a $n-byte torn v2"))
      assert((cur.watermark, cur.foldDir) == ((full.watermark, full.foldDir)),
        s"a $n-byte prefix resolved to a DIFFERENT state: $cur vs $full")
      if (cur.version == 2L)
        assert(n >= bytes.length - 1,
          s"a $n-byte prefix (of ${bytes.length}) validated without a complete #END line")
    }
    java.nio.file.Files.delete(torn)
    assert(liveContent(dir, fs) == want)
  }

  test("successive manifest folds while the stream appends: content tracks, layout stays bounded") {
    val (dir, want0) = mkIndex()
    val fs = shim(dir)
    SinkRetention.compactIndexManifestImpl(spark, dir, 1L, schema, payload, _ => (), Some(fs))
    // the resumed stream appends a new committed partition
    import spark.implicits._
    val extra = Seq((300L, 21L, 3L), (301L, 22L, 3L))
    extra.toDF("doc_id", "mh", "batch_id")
      .write.partitionBy("batch_id").mode("append").parquet(dir)
    val want = want0 ++ extra.map(r => (r._1, r._2))
    assert(liveContent(dir, fs) == want, "append after a fold must be visible")
    // next window folds through the previous fold + batch 2
    SinkRetention.compactIndexManifestImpl(spark, dir, 2L, schema, payload, _ => (), Some(fs))
    assert(liveContent(dir, fs) == want)
    assert(partitions(dir) == Seq("batch_id=3"))
    val names = new java.io.File(dir).list().toSeq
    assert(names.count(_.startsWith("_fold_")) == 1, s"stale folds: $names")
  }

  test("manifest lifecycle soak: five crash-interrupted maintenance windows over a growing sink") {
    // The long-haul composition the single-window matrix can't see: a sink
    // that alternates appends (the resumed stream) with manifest folds at
    // advancing watermarks, EVERY window first killed at a rotating phase
    // and then recovered by the production re-run. Content must track the
    // full append history at every step; layout must stay bounded at one
    // fold generation + above-watermark partitions.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sink_manifest_soak").toString
    val fs = shim(dir)
    var want = Set.empty[(Long, Long)]
    def append(b: Long): Unit = {
      val rows = (0L until 3L).map(i => (b * 100 + i, b * 7 + i, b))
      rows.toDF("doc_id", "mh", "batch_id")
        .write.partitionBy("batch_id").mode("append").parquet(dir)
      want ++= rows.map(r => (r._1, r._2))
    }
    val phases = Seq("staged", "published", "gc-done", "staged", "published")
    (0 until 5).foreach { w =>
      append(2L * w); append(2L * w + 1)
      val watermark = 2L * w + 1
      val ex = intercept[Crash] {
        SinkRetention.compactIndexManifestImpl(spark, dir, watermark, schema, payload,
          p => if (p == phases(w)) throw Crash(p) else (), Some(fs))
      }
      assert(ex.phase == phases(w))
      SinkRetention.compactIndexManifestImpl(spark, dir, watermark, schema, payload,
        _ => (), Some(fs))
      assert(liveContent(dir, fs) == want,
        s"window $w (crash at ${phases(w)}): content diverged from the append history")
      assert(partitions(dir).isEmpty,
        s"window $w: everything <= watermark must leave the plain layout")
      val names = new java.io.File(dir).list().toSeq
      assert(names.count(_.startsWith("_fold_")) == 1, s"window $w: stale folds in $names")
    }
    // after five windows the sink still takes appends and reads coherently
    append(10L)
    assert(liveContent(dir, fs) == want)
    assert(partitions(dir) == Seq("batch_id=10"))
  }

  test("gc keeps exactly the live manifest, and a torn later version still resolves to it") {
    // The r15 layout kept manifest V−1 "as a fallback" while deleting the
    // fold generation it pointed at — an unserviceable pointer. The choice
    // now (documented on gc): sweep ALL older manifests. Safe because gc
    // only runs after commitManifest(V) returned, so V is complete on
    // disk, and a torn file can only exist at a version ABOVE the last
    // complete one — where #END validation rejects it and resolution falls
    // back to V, whose fold gc always retains.
    val (dir, want) = mkIndex()
    val fs = shim(dir)
    SinkRetention.compactIndexManifestImpl(spark, dir, 1L, schema, payload, _ => (), Some(fs))
    SinkRetention.compactIndexManifestImpl(spark, dir, 2L, schema, payload, _ => (), Some(fs))
    val names = new java.io.File(dir).list().toSeq
    assert(names.count(_.startsWith("_MANIFEST-")) == 1,
      s"gc must keep exactly the live manifest: $names")
    assert(names.count(_.startsWith("_fold_")) == 1, s"stale folds: $names")
    // A later commit tears mid-create: resolution must land on the live
    // version and its retained, readable fold — the serviceability law.
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/_MANIFEST-000000003"),
      "graft-sink-manifest v1\nwatermark=9".getBytes("UTF-8"))
    val cur = SinkRetention.currentManifest(fs, new org.apache.hadoop.fs.Path(dir))
      .getOrElse(fail("resolution went blank behind a torn commit"))
    assert(cur.version == 2L && cur.watermark == 2L)
    assert(liveContent(dir, fs) == want, "fallback manifest must resolve to readable content")
  }

  /** FS shim counting the protocol's listStatus and open calls — the
    * instrument for readLive's steady-state resolution cost. */
  private class CountingFs(underlying: org.apache.hadoop.fs.FileSystem)
      extends org.apache.hadoop.fs.FilterFileSystem(underlying) {
    val lists = new java.util.concurrent.atomic.AtomicInteger(0)
    val opens = new java.util.concurrent.atomic.AtomicInteger(0)
    override def listStatus(p: org.apache.hadoop.fs.Path): Array[org.apache.hadoop.fs.FileStatus] = {
      lists.incrementAndGet(); super.listStatus(p)
    }
    override def open(p: org.apache.hadoop.fs.Path, bufferSize: Int): org.apache.hadoop.fs.FSDataInputStream = {
      opens.incrementAndGet(); super.open(p, bufferSize)
    }
  }

  test("steady-state readLive resolution costs one LIST and zero GETs per probe") {
    // The read seam sits inside per-micro-batch probes: on an object store
    // an uncached resolution is a LIST + GET + parse per batch per query
    // (r15 verdict #4). The manifest cache must bring the steady state to
    // exactly one LIST (freshness check) and no manifest re-read.
    val (dir, want) = mkIndex()
    SinkRetention.compactIndexManifestImpl(spark, dir, 1L, schema, payload, _ => (), None)
    val counting = new CountingFs(new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration))
    // Warm resolution: the post-commit state may not be cached yet — this
    // probe may pay the one GET+parse that populates the cache.
    assert(liveContent(dir, counting) == want)
    counting.lists.set(0); counting.opens.set(0)
    (1 to 3).foreach { _ => assert(liveContent(dir, counting) == want) }
    assert(counting.lists.get() <= 3,
      s"steady-state probes must pay at most one LIST each: ${counting.lists.get()}")
    assert(counting.opens.get() == 0,
      s"steady-state probes must not re-read the manifest: ${counting.opens.get()}")
    // ...and the cache must NOT hide a new commit: the next fold bumps the
    // token, resolution re-parses once and serves the new watermark.
    SinkRetention.compactIndexManifestImpl(spark, dir, 2L, schema, payload, _ => (), None)
    assert(liveContent(dir, counting) == want, "a fresh commit must be visible immediately")
    val cur = SinkRetention.currentManifest(counting, new org.apache.hadoop.fs.Path(dir))
    assert(cur.exists(_.watermark == 2L), s"stale manifest served from cache: $cur")
  }

  test("manifest cache is per-FileSystem-instance: a second fs is never served the first's parse") {
    // r16 ADVICE: the cache was keyed by the path STRING alone, so a parse
    // performed through one FileSystem (e.g. a shim) was served to
    // resolutions through another fs for the same path — benign only while
    // every fs presents the same view. The key now carries the fs
    // identity; the observable law: the FIRST resolution through a fresh
    // fs instance pays its own GET+parse (it would pay zero if the entry
    // were shared by path string).
    val (dir, want) = mkIndex()
    SinkRetention.compactIndexManifestImpl(spark, dir, 1L, schema, payload, _ => (), None)
    val real = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fsA = new CountingFs(real)
    val fsB = new CountingFs(real)
    assert(liveContent(dir, fsA) == want)
    fsA.opens.set(0)
    assert(liveContent(dir, fsA) == want)
    assert(fsA.opens.get() == 0, "fsA's second resolution must be served from its cache entry")
    assert(liveContent(dir, fsB) == want)
    assert(fsB.opens.get() > 0,
      "fsB's first resolution must pay its own parse — a path-string-keyed " +
        "cache would have served it fsA's")
  }

  test("readLive on a manifest-less sink is exactly the plain partitioned read") {
    val (dir, want) = mkIndex()
    val fs = shim(dir)
    assert(liveContent(dir, fs) == want)
    assert(partitions(dir) == Seq("batch_id=0", "batch_id=1", "batch_id=2"),
      "no maintenance ran: the sink must be byte-untouched")
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
