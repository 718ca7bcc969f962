package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.ops.Dedup

/** The streaming incremental dedup's parity theorem and contract, on real
  * corpus data: the union of per-micro-batch self-pairs and index-probe
  * pairs equals the one-shot batch LSH pair set — for more than one way of
  * slicing the corpus into batches — with each pair found exactly once and
  * attributed to the side the index-freshness contract says must find it.
  */
class DedupStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = SparkTestSession.sfDir

  /** Stage `documents` as one parquet file per predicate and run the real
    * streaming query over them; returns the matches frame (with via /
    * batch_id audit columns). */
  private def runStaged(splits: Seq[org.apache.spark.sql.Column]): org.apache.spark.sql.DataFrame = {
    val work = java.nio.file.Files.createTempDirectory("dedup_stream_spec").toString
    val docs = graft.ops.Tables.documents(spark, d).select(col("doc_id"), col("text"))
    splits.foreach { p =>
      docs.filter(p).coalesce(1).write.mode("append").parquet(s"$work/stage")
    }
    DedupStream.runIncremental(spark, s"$work/stage", work)
  }

  private lazy val batchPairs: Set[(Long, Long, Double)] =
    Dedup.dedupMinhashLsh(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("streamed self-pairs + probe-pairs tile the one-shot batch pair set exactly once") {
    val m = runStaged(Seq(col("doc_id") % 3 === 0, col("doc_id") % 3 === 1, col("doc_id") % 3 === 2))
      .collect()
    val streamed = m.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // Exactly once: no pair is found by both its batch's self-join and a
    // later probe (the append-after-probe order makes them disjoint).
    assert(streamed.length == streamed.toSet.size, "a pair surfaced twice")
    assert(streamed.toSet == batchPairs)
    assert(batchPairs.nonEmpty) // the corpus has planted near-dups
    // Attribution follows the contract: intra-batch pairs are the self-join's
    // (same doc_id residue, both sides staged into the same file), cross-batch
    // pairs are the probe's.
    val byVia = m.groupBy(_.getString(3))
    assert(byVia.keySet == Set("self", "probe"))
    byVia("self").foreach(r => assert(r.getLong(0) % 3 == r.getLong(1) % 3))
    byVia("probe").foreach(r => assert(r.getLong(0) % 3 != r.getLong(1) % 3))
    // maxFilesPerTrigger=1 really did slice the run into micro-batches.
    assert(m.map(_.getLong(4)).distinct.length >= 2)
  }

  test("the pair set is invariant to how the stream slices the corpus into batches") {
    // A completely different (uneven, 2-way) slicing must converge to the
    // same union — the theorem's independence-of-trigger-boundaries claim.
    val m = runStaged(Seq(col("doc_id") < 100, col("doc_id") >= 100))
      .select(col("doc_a"), col("doc_b"), col("est_jaccard")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(m.length == m.toSet.size)
    assert(m.toSet == batchPairs)
  }

  test("the signature index ends complete: one signature per shingled document") {
    val work = java.nio.file.Files.createTempDirectory("dedup_stream_spec").toString
    val docs = graft.ops.Tables.documents(spark, d).select(col("doc_id"), col("text"))
    Seq(0, 1).foreach { b =>
      docs.filter(col("doc_id") % 2 === b).coalesce(1).write.mode("append").parquet(s"$work/stage")
    }
    DedupStream.runIncremental(spark, s"$work/stage", work)
    val index = spark.read.parquet(s"$work/sig_index")
    val expected = Dedup.minhashSignatures(spark, d)
    assert(index.count() == expected.count())
    assert(index.select("doc_id").distinct().count() == index.count())
  }

  test("a replayed micro-batch leaves both sinks unchanged — exactly-once under at-least-once execution") {
    val work = java.nio.file.Files.createTempDirectory("dedup_stream_spec").toString
    val (indexDir, matchesDir) = (s"$work/sig_index", s"$work/matches")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(indexDir))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(matchesDir))
    val docs = graft.ops.Tables.documents(spark, d).select(col("doc_id"), col("text"))
    val body = DedupStream.incrementalBatch(indexDir, matchesDir) _
    body(docs.filter(col("doc_id") % 2 === 0), 0L)
    body(docs.filter(col("doc_id") % 2 === 1), 1L)
    def matches() = spark.read.parquet(matchesDir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("est_jaccard"), r.getAs[String]("via"))).sortBy(p => (p._1, p._2))
    def index() = spark.read.parquet(indexDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Number]("batch_id").longValue())).sortBy(identity)
    val (m1, i1) = (matches(), index())
    // The worst replay: batch 1 re-runs AFTER its signature append landed.
    // Without the strictly-earlier probe cut it would re-find every batch-1
    // intra-batch pair through the index; without partition overwrite it
    // would append everything twice.
    body(docs.filter(col("doc_id") % 2 === 1), 1L)
    assert(matches().toSeq == m1.toSeq)
    assert(index().toSeq == i1.toSeq)
    // And the replayed run still tiles the one-shot pair set.
    assert(m1.map(p => (p._1, p._2, p._3)).toSet == batchPairs)
  }

  test("the probe plan broadcasts the delta and never shuffles the index") {
    val sigs = Dedup.minhashSignatures(spark, d)
    val plan = Dedup.lshCrossPairs(
        Dedup.mhBands(sigs.filter(col("doc_id") % 2 === 1)),
        Dedup.mhBands(sigs.filter(col("doc_id") % 2 === 0)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }

  test("index compaction folds partitions, preserves content, and parity survives the window") {
    val work = java.nio.file.Files.createTempDirectory("dedup_stream_compact_spec").toString
    val docs = graft.ops.Tables.documents(spark, d).select(col("doc_id"), col("text"))
    (0 until 2).foreach { b =>
      docs.filter(col("doc_id") % 4 === b).coalesce(1).write.mode("append").parquet(s"$work/stage")
    }
    DedupStream.runIncremental(spark, s"$work/stage", work)
    val idx = s"$work/sig_index"
    def partitions = new java.io.File(idx).list().filter(_.startsWith("batch_id=")).sorted.toSeq
    assert(partitions == Seq("batch_id=0", "batch_id=1"))
    // pin the PRE-compaction content on the driver — a lazy DataFrame over
    // the index dir would re-list files after the fold and compare
    // post-with-post
    val preRead = spark.read.parquet(idx).select(col("doc_id"), col("mh"))
    val beforeRows = preRead.collect().toSeq
    val before = spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(beforeRows: _*)), preRead.schema)

    DedupStream.compactIndex(spark, idx, watermark = 1L)
    // layout folded to the single watermark partition...
    assert(partitions == Seq("batch_id=1"), s"got $partitions")
    val after = spark.read.parquet(idx).select(col("doc_id"), col("mh"))
    // ...but content identical (the parity theorem's precondition)
    assert(after.count() == beforeRows.size)
    assert(after.exceptAll(before).count() == 0 && before.exceptAll(after).count() == 0)
    // re-running with the same watermark is a no-op fold (crash-recovery
    // entry point): same single partition, same content
    DedupStream.compactIndex(spark, idx, watermark = 1L)
    assert(partitions == Seq("batch_id=1"))
    assert(spark.read.parquet(idx).count() == beforeRows.size)

    // retention: early match partitions drop, later ones stay readable
    DedupStream.pruneMatches(spark, s"$work/matches", keepFrom = 2L)
    // resume the stream over the rest of the corpus: batches 2/3 probe the
    // COMPACTED index and the full union still tiles the one-shot pair set
    (2 until 4).foreach { b =>
      docs.filter(col("doc_id") % 4 === b).coalesce(1).write.mode("append").parquet(s"$work/stage")
    }
    val late = DedupStream.runIncremental(spark, s"$work/stage", work).collect()
    assert(late.map(_.getLong(4)).forall(_ >= 2L), "pruned partitions must stay gone")
    val all = late.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val early = batchPairs.filter { case (a, b2, _) => a % 4 < 2 && b2 % 4 < 2 }
    assert(all.intersect(early).isEmpty, "late batches must not re-find consumed pairs")
    assert((all ++ early) == batchPairs,
      "resumed batches over the compacted index must complete the one-shot pair set")
  }
}
