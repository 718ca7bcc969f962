package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** The streaming heavy-hitters fold: parity with the one-shot batch entry
  * on the real corpus, replay idempotence of the state sink, and the ≤k+1
  * state bound per batch.
  */
class SketchStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir
  private val K = 64

  private def docs = graft.ops.Tables.documents(spark, dir)
    .select(col("doc_id"), col("text"))

  private def foldSlices(slices: Seq[org.apache.spark.sql.DataFrame],
      work: String): (Map[String, Long], Long) = {
    val stateDir = s"$work/hh_state"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(stateDir))
    slices.zipWithIndex.foreach { case (b, i) =>
      SketchStream.sketchBatch(K, stateDir)(b, i.toLong)
    }
    val state = spark.read.parquet(stateDir)
      .withColumn("batch_id", col("batch_id").cast("long"))
    val last = state.agg(max(col("batch_id"))).head().getLong(0)
    val rows = state.filter(col("batch_id") === last).collect()
    (rows.filter(!_.isNullAt(0)).map(r => r.getString(0) -> r.getLong(1)).toMap,
      rows.find(_.isNullAt(0)).map(_.getLong(1)).getOrElse(0L))
  }

  test("streamed fold output equals the batch heavy-hitters entry (file stream, 3 slices)") {
    val streamed = graft.ops.TextAnalysis.heavyHittersStream(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val batch = graft.ops.TextAnalysis.heavyHitters(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty, "fixture must actually contain heavy hitters")
  }

  test("pruning the audit trail mid-stream leaves the resumed fold and final output unchanged") {
    val out = graft.ops.TextAnalysis.heavyHittersStreamPruned(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val batch = graft.ops.TextAnalysis.heavyHitters(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out == batch,
      "state-chain prune must not change the running sketch the resumed batches fold from")
  }

  test("pruneState drops links strictly below keepFrom and keeps the fold state readable") {
    val work = java.nio.file.Files.createTempDirectory("graft_hh_prune").toString
    val stateDir = s"$work/hh_state"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(stateDir))
    (0 until 3).foreach { i =>
      SketchStream.sketchBatch(K, stateDir)(docs.filter(col("doc_id") % 3 === i), i.toLong)
    }
    def partitions = new java.io.File(stateDir).list().filter(_.startsWith("batch_id=")).sorted.toSeq
    assert(partitions == Seq("batch_id=0", "batch_id=1", "batch_id=2"))
    val lastBefore = spark.read.parquet(stateDir)
      .filter(col("batch_id") === 2).collect()
      .map(r => (Option(r.getString(0)), r.getLong(1))).sortBy(_.toString).toSeq
    SketchStream.pruneState(spark, stateDir, keepFrom = 2L)
    assert(partitions == Seq("batch_id=2"), s"got $partitions")
    val lastAfter = spark.read.parquet(stateDir)
      .filter(col("batch_id") === 2).collect()
      .map(r => (Option(r.getString(0)), r.getLong(1))).sortBy(_.toString).toSeq
    assert(lastAfter == lastBefore, "the kept link must be byte-identical fold state")
    // a batch resumed after the prune folds from the kept link exactly as
    // it would have before: run batch 3 and check it reads state 2
    SketchStream.sketchBatch(K, stateDir)(docs.filter(col("doc_id") % 3 === 0), 3L)
    val n3 = spark.read.parquet(stateDir).filter(col("batch_id") === 3)
      .filter(col("term").isNull).head().getLong(1)
    val n2 = lastBefore.collectFirst { case (None, n) => n }.get
    val b3 = docs.filter(col("doc_id") % 3 === 0)
      .select(explode(graft.ops.TextAnalysis.tokensCol(lower(col("text"))))).count()
    assert(n3 == n2 + b3, "resumed stream length must extend the kept link's count")
  }

  test("candidate completeness holds under an uneven slicing (direct fold)") {
    val work = java.nio.file.Files.createTempDirectory("graft_hh_uneven").toString
    val slices = Seq(
      docs.filter(col("doc_id") % 7 === 0),       // small slice
      docs.filter(col("doc_id") % 7 =!= 0 && col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 7 =!= 0 && col("doc_id") % 2 === 1))
    val (sketch, nTotal) = foldSlices(slices, work)
    assert(nTotal == docs.select(explode(graft.ops.TextAnalysis.tokensCol(
      lower(col("text"))))).count())
    // every true heavy hitter must be among the candidates
    val trueHH = docs.select(explode(graft.ops.TextAnalysis.tokensCol(
        lower(col("text")))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .filter(col("c") * (K + 1) > nTotal)
      .collect().map(_.getString(0)).toSet
    assert(trueHH.nonEmpty && trueHH.subsetOf(sketch.keySet),
      s"missing: ${trueHH -- sketch.keySet}")
  }

  test("a replayed batch body rewrites its own partition bit-identically and state stays <= k+1 rows") {
    val work = java.nio.file.Files.createTempDirectory("graft_hh_replay").toString
    val stateDir = s"$work/hh_state"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(stateDir))
    val slices = Seq(docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 === 1))
    slices.zipWithIndex.foreach { case (b, i) => SketchStream.sketchBatch(K, stateDir)(b, i.toLong) }
    def snapshot() = spark.read.parquet(stateDir)
      .withColumn("batch_id", col("batch_id").cast("long")).collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2))).toSet
    val before = snapshot()
    // worst-case replay: batch 1 re-runs AFTER its state already landed
    SketchStream.sketchBatch(K, stateDir)(slices(1), 1L)
    val after = snapshot()
    assert(after == before)
    (0 to 1).foreach { b =>
      val n = spark.read.parquet(stateDir).filter(col("batch_id") === b).count()
      assert(n <= K + 1, s"batch $b state has $n rows")
    }
  }
}
