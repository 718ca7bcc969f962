package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.ops.Similarity

/** The streaming incremental SEMANTIC dedup's parity theorem and contract
  * on real corpus vectors: the union of per-micro-batch self-pairs and
  * index-probe pairs equals the one-shot same-cluster τ-pair set — for more
  * than one slicing of the corpus into batches — each pair found exactly
  * once and attributed to the side the index-freshness contract prescribes,
  * and a replayed micro-batch leaves both sinks unchanged.
  *
  * Ground truth is rebuilt IN THE TEST from the shared cluster assignment
  * (`Similarity.ivfAssigned` — pinned by SemanticAutoSpec and replayed
  * end-to-end by the DuckDB oracle tallies) with independent
  * join/filter logic, so the stream's pairing is checked against a second
  * formulation rather than against the operator under test.
  */
class SemanticStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.001"

  private val TAU = 0.4
  private lazy val k: Int = { // the catalog entry's occupancy-25 sizing law
    val n = graft.ops.Tables.embeddings(spark, d).count()
    math.max(16, ((n + 24) / 25).toInt)
  }

  /** One-shot same-cluster τ-pair set (vec_a < vec_b) with cluster ids. */
  private lazy val oneShot: Set[(Long, Long, Int)] = {
    val a = Similarity.ivfAssigned(spark, d, k)
      .select(col("vec_id"), col("cluster"), col("v"), col("nrm"))
    a.as("p").join(a.as("q"),
        col("p.cluster") === col("q.cluster") &&
          col("p.vec_id") < col("q.vec_id"))
      .filter(aggregate(zip_with(col("p.v"), col("q.v"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x) / (col("p.nrm") * col("q.nrm")) >= TAU)
      .select(col("p.vec_id"), col("q.vec_id"), col("p.cluster"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("streamed self + probe pairs tile the one-shot pair set exactly once") {
    val out = Similarity.queries("x_stream_semantic_incremental")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(oneShot.nonEmpty, "test premise: the fixture has τ-pairs")
    assert(out.length == out.toSet.size, "a pair surfaced twice")
    assert(out.toSet == oneShot)
  }

  test("attribution and slicing-invariance: an uneven 2-way split converges to the same set") {
    val work = java.nio.file.Files.createTempDirectory("sem_stream_spec").toString
    val vecs = Similarity.ivfAssigned(spark, d, k)
      .select(col("vec_id"), col("v"), col("nrm"))
    Seq(col("vec_id") < 100, col("vec_id") >= 100).foreach { p =>
      vecs.filter(p).coalesce(1).write.mode("append").parquet(s"$work/stage")
    }
    val cents = Similarity.trainIvfCentroids(spark, d, k)
    val m = SemanticStream.runIncremental(spark, s"$work/stage", work,
      v => Similarity.assignClusterViaHof(v, cents), TAU).collect()
    val pairs = m.map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.length == pairs.toSet.size)
    assert(pairs.toSet == oneShot)
    // Attribution follows the contract: self pairs have both sides in the
    // same staged file, probe pairs cross the boundary.
    val byVia = m.groupBy(_.getString(3))
    byVia.getOrElse("self", Array.empty).foreach(r =>
      assert((r.getLong(0) < 100) == (r.getLong(1) < 100)))
    byVia.getOrElse("probe", Array.empty).foreach(r =>
      assert((r.getLong(0) < 100) != (r.getLong(1) < 100)))
    // maxFilesPerTrigger=1 really sliced the run into micro-batches.
    assert(m.map(_.getAs[Number]("batch_id").longValue()).distinct.length >= 2)
  }

  test("a replayed micro-batch leaves both sinks unchanged — exactly-once under at-least-once execution") {
    val work = java.nio.file.Files.createTempDirectory("sem_stream_spec").toString
    val (indexDir, matchesDir) = (s"$work/vec_index", s"$work/matches")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(indexDir))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(matchesDir))
    val vecs = Similarity.ivfAssigned(spark, d, k)
      .select(col("vec_id"), col("v"), col("nrm"))
    val cents = Similarity.trainIvfCentroids(spark, d, k)
    val body = SemanticStream.incrementalBatch(
      v => Similarity.assignClusterViaHof(v, cents), TAU, indexDir, matchesDir) _
    body(vecs.filter(col("vec_id") % 2 === 0), 0L)
    body(vecs.filter(col("vec_id") % 2 === 1), 1L)
    def matches() = spark.read.parquet(matchesDir).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"),
        r.getAs[String]("via"))).sortBy(identity)
    def index() = spark.read.parquet(indexDir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Number]("batch_id").longValue()))
      .sortBy(identity)
    val (m1, i1) = (matches(), index())
    // The worst replay: batch 1 re-runs AFTER its index append landed.
    // Without the strictly-earlier probe cut it would re-find every batch-1
    // intra-batch pair through the index; without partition overwrite it
    // would append everything twice.
    body(vecs.filter(col("vec_id") % 2 === 1), 1L)
    assert(matches().toSeq == m1.toSeq)
    assert(index().toSeq == i1.toSeq)
    assert(m1.map(p => (p._1, p._2)).toSet ==
      oneShot.map(p => (p._1, p._2)))
    // The index ends complete: one assigned row per corpus vector.
    assert(i1.length == vecs.count())
  }

  test("vector-index compaction folds partitions, preserves content, and parity survives the window") {
    val work = java.nio.file.Files.createTempDirectory("sem_stream_compact_spec").toString
    val vecs = graft.ops.Tables.embeddings(spark, d)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(aggregate(col("v"), lit(0.0), (a, x) => a + x * x)))
    val cents = Similarity.trainIvfCentroids(spark, d, k)
    (0 until 2).foreach { b =>
      vecs.filter(col("vec_id") % 4 === b).coalesce(1).write.mode("append").parquet(s"$work/stage")
    }
    val early = SemanticStream.runIncremental(spark, s"$work/stage", work,
        v => Similarity.assignClusterViaHof(v, cents), TAU)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val idx = s"$work/vec_index"
    def partitions = new java.io.File(idx).list().filter(_.startsWith("batch_id=")).sorted.toSeq
    assert(partitions == Seq("batch_id=0", "batch_id=1"))
    // pin the PRE-compaction content on the driver — a lazy DataFrame over
    // the index dir would re-list files after the fold
    val beforeRows = spark.read.parquet(idx)
      .select(col("vec_id"), col("cluster"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq

    SemanticStream.compactIndex(spark, idx, watermark = 1L)
    // layout folded to the single watermark partition...
    assert(partitions == Seq("batch_id=1"), s"got $partitions")
    // ...but content identical (the parity theorem's precondition)
    val afterRows = spark.read.parquet(idx)
      .select(col("vec_id"), col("cluster"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(afterRows == beforeRows)
    // re-running with the same watermark is a no-op fold (crash-recovery
    // entry point)
    SemanticStream.compactIndex(spark, idx, watermark = 1L)
    assert(partitions == Seq("batch_id=1"))
    assert(spark.read.parquet(idx).count() == beforeRows.size)

    // retention: early match partitions drop; resume over the rest —
    // batches 2/3 probe the COMPACTED index and the union tiles the
    // one-shot pair set
    SemanticStream.pruneMatches(spark, s"$work/matches", keepFrom = 2L)
    (2 until 4).foreach { b =>
      vecs.filter(col("vec_id") % 4 === b).coalesce(1).write.mode("append").parquet(s"$work/stage")
    }
    val lateRows = SemanticStream.runIncremental(spark, s"$work/stage", work,
        v => Similarity.assignClusterViaHof(v, cents), TAU).collect()
    assert(lateRows.map(_.getAs[Number]("batch_id").longValue()).forall(_ >= 2L),
      "pruned partitions must stay gone")
    val late = lateRows.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(late.intersect(early).isEmpty, "late batches must not re-find consumed pairs")
    assert((late ++ early) == oneShot,
      "resumed batches over the compacted index must complete the one-shot pair set")
  }

  test("manifest-pointer fold on the vector index: parity survives the object-store window") {
    val work = java.nio.file.Files.createTempDirectory("sem_stream_manifest_spec").toString
    val vecs = graft.ops.Tables.embeddings(spark, d)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(aggregate(col("v"), lit(0.0), (a, x) => a + x * x)))
    val cents = Similarity.trainIvfCentroids(spark, d, k)
    (0 until 2).foreach { b =>
      vecs.filter(col("vec_id") % 4 === b).coalesce(1).write.mode("append").parquet(s"$work/stage")
    }
    val early = SemanticStream.runIncremental(spark, s"$work/stage", work,
        v => Similarity.assignClusterViaHof(v, cents), TAU)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val idx = s"$work/vec_index"
    val beforeRows = spark.read.parquet(idx)
      .select(col("vec_id"), col("cluster"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq

    // the OBJECT-STORE maintenance window: single-file manifest commit,
    // folded partitions leave the plain layout entirely
    SemanticStream.compactIndexManifest(spark, idx, watermark = 1L)
    val names = new java.io.File(idx).list().toSeq
    assert(!names.exists(_.startsWith("batch_id=")), s"folded partitions remain: $names")
    assert(names.count(_.startsWith("_MANIFEST-")) == 1 &&
      names.count(_.startsWith("_fold_")) == 1, s"unexpected layout: $names")
    // content resolves ONLY through the manifest-aware read seam
    val afterRows = SinkRetention.readLiveImpl(spark, idx,
        org.apache.spark.sql.types.StructType.fromDDL(
          "vec_id LONG, v ARRAY<DOUBLE>, nrm DOUBLE, cluster INT, batch_id LONG"), None)
      .select(col("vec_id"), col("cluster"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(afterRows == beforeRows, "the manifest fold must preserve index content")

    // resumed batches probe THROUGH the manifest and complete the pair set
    SemanticStream.pruneMatches(spark, s"$work/matches", keepFrom = 2L)
    (2 until 4).foreach { b =>
      vecs.filter(col("vec_id") % 4 === b).coalesce(1).write.mode("append").parquet(s"$work/stage")
    }
    val late = SemanticStream.runIncremental(spark, s"$work/stage", work,
        v => Similarity.assignClusterViaHof(v, cents), TAU)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(late.intersect(early).isEmpty, "late batches must not re-find consumed pairs")
    assert((late ++ early) == oneShot,
      "resumed batches over the manifest-folded index must complete the one-shot pair set")
  }

  test("oracle derives k in-SQL and the entry emits only integral columns") {
    val sql = Similarity.oracleSql("x_stream_semantic_incremental")
    assert(sql.contains("kk AS (SELECT greatest(16,") &&
      sql.contains("// 25 AS INT)) AS k FROM n)"),
      "oracle SQL does not derive k via the sizing-law CTE")
    val df = Similarity.queries("x_stream_semantic_incremental")(spark, d)
    val types = df.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(types == Map("vec_a" -> "long", "vec_b" -> "long",
      "cluster" -> "integer"), s"non-integral or drifted schema: $types")
  }
}
