package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** The full-pipeline composition: stage-consistency laws that the oracle's
  * value equality cannot express on its own.
  */
class PipelineFullSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir

  test("scrubbedTokenCounts equals the rewrite's n_tokens_after exactly") {
    // The count shortcut (n_before - sum of disjoint island spans) must be
    // the size of the array the full scrub actually builds.
    val counts = Dedup.scrubbedTokenCounts(spark, dir)
    val rewrite = Dedup.dupSpanScrub(spark, dir)
      .select(col("doc_id"), col("n_tokens_after").cast("long").as("n_tokens"))
    assert(counts.exceptAll(rewrite).count() == 0 &&
      rewrite.exceptAll(counts).count() == 0)
  }

  test("manifest invariants: exact budget, contiguous shards, balance law") {
    val rows = TextAnalysis.pipelineFull(spark, dir)
      .orderBy(col("shard_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // the sample budget is hit exactly (population exceeds PIPE_T here)
    assert(rows.map(_._2).sum == TextAnalysis.PIPE_T)
    // shard ids are 0..k contiguous
    assert(rows.map(_._1).toSeq == (0L until rows.length))
    // every shard except the last carries at least the 2048-token budget
    // minus one document (the straddling doc lands in the next shard), and
    // no shard exceeds budget + the largest single document
    val maxDoc = Dedup.scrubbedTokenCounts(spark, dir)
      .agg(max(col("n_tokens"))).head().getLong(0)
    rows.init.foreach { case (id, _, tok) =>
      assert(tok >= 2048 - maxDoc && tok <= 2048 + maxDoc, s"shard $id: $tok tokens")
    }
  }

  test("multimodal manifest: gate drops exactly the corrupt tenth, shards balance pixels") {
    val rows = Multimodal.pipelineMultimodal(spark, dir)
      .orderBy(col("shard_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).toSeq == (0L until rows.length)) // contiguous ids
    // population = docs passing the header gate (doc_id % 10 != 0 by the
    // synthesis law) minus the greedy image-dedup drops — never more than
    // the gated count, and the gate must have dropped the corrupt tenth
    val n = Tables.documents(spark, dir).count()
    val gated = Tables.documents(spark, dir).filter(col("doc_id") % 10 =!= 0).count()
    assert(gated < n)
    val images = rows.map(_._2).sum
    assert(images <= gated && images > gated * 9 / 10, s"$images of $gated survived")
    // every full shard is within one image's pixels of the 4M budget
    val maxPx = 224L * 224L
    rows.init.foreach { case (id, _, px) =>
      assert(px >= (1L << 22) - maxPx && px <= (1L << 22) + maxPx, s"shard $id: $px px")
    }
  }
}
