package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** The REAL-codec video family's delta-vs-index probe — the round-16 gap
  * closure (r15 verdict #3): every other near-dup family already had its
  * incremental entry; the real-GIF family stopped at precision. Same laws
  * as the stub twin's probe inside [[Multimodal.dedupVideoIncremental]],
  * but every frame hash on both sides is EARNED through the animated-GIF
  * encode + per-frame `javax.imageio` decode: the probe output equals the
  * one-shot real-codec self-join restricted to delta-vs-index pairs, and
  * clone self-recall is exact (the planted trim+replace worst case clears
  * the gate by construction).
  */
class VideoRealIncrementalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = SparkTestSession.sfDir
  // The production constants themselves (private[ops]), not local copies:
  // a drift in Multimodal now fails here at compile time.
  private val off = Multimodal.VID_REAL_CLONE_OFFSET // clones at doc_id + off
  private val mod = Multimodal.VID_CLONE_MOD.toLong // every mod-th doc gets a planted clone

  test("real-codec incremental probe equals the self-join restricted to delta-vs-index") {
    val self = Multimodal.dedupVideoReal(spark, sfDir)
      .filter(col("doc_b") >= off && col("doc_a") < off)
      .select(col("doc_b").as("doc_id"), col("doc_a").as("match_id"),
        col("n_shared"), col("n_union"), col("jaccard_ppm"))
    val inc = Multimodal.dedupVideoRealIncremental(spark, sfDir)
    assert(inc.filter(col("doc_id") < off || col("match_id") >= off).count() == 0,
      "probe output must pair delta against index only")
    assert(inc.exceptAll(self).count() == 0 && self.exceptAll(inc).count() == 0,
      "probe must tile exactly the delta-vs-index restriction of the self-join")
  }

  test("every planted trimmed/re-cut GIF clone self-matches through the probe") {
    // Recall is exact by construction for this family (worst-case planted
    // Jaccard 647059 ppm > the 600000 gate — see the family scaladoc), so
    // unlike the banded image probe there is no honest-miss set: a missed
    // clone is a defect of the decode, the shingling, or the probe join.
    val planted = graft.ops.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % mod === 0)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(planted.nonEmpty)
    val found = Multimodal.dedupVideoRealIncremental(spark, sfDir)
      .filter(col("match_id") === col("doc_id") - off)
      .select((col("doc_id") - off).as("id")).collect().map(_.getLong(0)).toSet
    assert(found == planted,
      s"probe self-matches must equal the planted set: " +
        s"missed ${planted -- found}, spurious ${found -- planted}")
  }
}
