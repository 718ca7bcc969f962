package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** The image family's delta-vs-index probe — completes the per-family
  * incremental contract (lexical, semantic, audio, video, image). Same
  * laws as the audio twin: the probe finds exactly the delta-vs-index
  * restriction of the one-shot self-join, and recall over the planted
  * clones is exact for hamming <= 3 (pigeonhole over 4×15-bit bands). */
class ImageIncrementalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = SparkTestSession.sfDir
  private val off = 10000000L // IMG_CLONE_OFFSET: clones live at doc_id + off

  test("incremental probe agrees with the self-join restricted to delta-vs-index pairs") {
    val self = Multimodal.dedupImage(spark, sfDir)
      .filter(col("doc_b") >= off && col("doc_a") < off)
      .select(col("doc_b").as("doc_id"), col("doc_a").as("match_id"), col("hamming"))
    val inc = Multimodal.dedupImageIncremental(spark, sfDir)
    assert(inc.filter(col("doc_id") < off || col("match_id") >= off).count() == 0)
    assert(inc.exceptAll(self).count() == 0 && self.exceptAll(inc).count() == 0)
  }

  test("every in-budget planted clone self-matches through the probe") {
    // Signature-derived recall (the fixture-independent form): a clone
    // probes back to its OWN original iff their dHash hamming is within
    // budget — <= 3 guarantees a shared exact band (pigeonhole), and the
    // probe's output filter re-verifies the distance, so the two sets are
    // EQUAL, not merely overlapping. Clones with more perturbed pixels
    // can exceed the budget; those are the family's documented honest
    // misses, derived here from the measured signatures, not assumed.
    val sigs = Multimodal.imageSignatures(spark, sfDir)
    val orig = sigs.filter(col("doc_id") < off)
    val clones = sigs.filter(col("doc_id") >= off)
      .select((col("doc_id") - off).as("doc_id"), col("w0").as("cw0"))
    val inBudget = orig.join(clones, "doc_id")
      .filter(bit_count(col("w0").bitwiseXOR(col("cw0"))) <= 3)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(inBudget.nonEmpty)
    val found = Multimodal.dedupImageIncremental(spark, sfDir)
      .filter(col("match_id") === col("doc_id") - off)
      .select((col("doc_id") - off).as("id")).collect().map(_.getLong(0)).toSet
    assert(found == inBudget,
      s"probe self-matches must equal the in-budget planted set: " +
        s"missed ${inBudget -- found}, spurious ${found -- inBudget}")
  }
}
