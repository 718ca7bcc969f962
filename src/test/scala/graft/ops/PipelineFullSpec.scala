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
}
