package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** The REAL-codec image family's delta-vs-index probe — the round-15 gap
  * closure: the stub image family had an incremental entry, the real-PNG
  * family stopped at precision. Same laws as the stub twin
  * ([[ImageIncrementalSpec]]), but every grid on both sides of the probe is
  * EARNED through the PNG encode + `javax.imageio` decode: the probe output
  * equals the one-shot real-codec self-join restricted to delta-vs-index
  * pairs, and clone self-recall is exactly the signature-derived in-budget
  * set. */
class ImageRealIncrementalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = SparkTestSession.sfDir
  private val off = 10000000L // IMG_CLONE_OFFSET: clones live at doc_id + off

  test("real-codec incremental probe equals the self-join restricted to delta-vs-index") {
    val self = Multimodal.dedupImageReal(spark, sfDir)
      .filter(col("doc_b") >= off && col("doc_a") < off)
      .select(col("doc_b").as("doc_id"), col("doc_a").as("match_id"), col("hamming"))
    val inc = Multimodal.dedupImageRealIncremental(spark, sfDir)
    assert(inc.filter(col("doc_id") < off || col("match_id") >= off).count() == 0,
      "probe output must pair delta against index only")
    assert(inc.exceptAll(self).count() == 0 && self.exceptAll(inc).count() == 0,
      "probe must tile exactly the delta-vs-index restriction of the self-join")
  }

  test("every in-budget real-codec clone self-matches through the probe") {
    // Signature-derived recall over the DECODED grids: a clone probes back
    // to its own original iff their dHash hamming is within the band
    // budget (<= 3 of 4×15-bit bands shares an exact band by pigeonhole);
    // clones whose perturbed pixels flipped more bits are the documented
    // honest misses, derived from the measured signatures, not assumed.
    val sigs = Multimodal.imageSignaturesDecoded(
      Multimodal.pngFixtureCorpus(spark, sfDir), "doc_id", "png")
    val orig = sigs.filter(col("doc_id") < off)
    val clones = sigs.filter(col("doc_id") >= off)
      .select((col("doc_id") - off).as("doc_id"), col("w0").as("cw0"))
    val inBudget = orig.join(clones, "doc_id")
      .filter(bit_count(col("w0").bitwiseXOR(col("cw0"))) <= 3)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(inBudget.nonEmpty)
    val found = Multimodal.dedupImageRealIncremental(spark, sfDir)
      .filter(col("match_id") === col("doc_id") - off)
      .select((col("doc_id") - off).as("id")).collect().map(_.getLong(0)).toSet
    assert(found == inBudget,
      s"probe self-matches must equal the in-budget planted set: " +
        s"missed ${inBudget -- found}, spurious ${found -- inBudget}")
  }
}
