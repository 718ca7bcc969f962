package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** The parameterized wide SimHash family end-to-end on real corpus data:
  * word-0 compatibility with the oracled 60-bit default, pigeonhole
  * completeness of the wider band space against a brute-force all-pairs
  * scan, the candidate-volume reduction that motivates the width, and the
  * fail-fast sizing validation.
  */
class SimhashWideSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val d = "/root/testdata/sf0.001"

  test("word 0 of the wide signature is bit-identical to the 60-bit default signature") {
    // The wide family must coexist with the oracled default: word 0 comes
    // from the same hex chars (1-15 of md5), so a pipeline can widen
    // without invalidating persisted 60-bit signatures.
    val narrow = Dedup.simhashSignatures(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wide = Dedup.simhashWideSignatures(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(wide.nonEmpty)
    wide.foreach { case (id, w0, _) =>
      assert(w0 == narrow(id), f"doc $id: wide w0 $w0%x != narrow ${narrow(id)}%x")
    }
    assert(wide.map(_._1).toSet == narrow.keySet)
  }

  test("wide banding is pigeonhole-complete: banded candidates == brute-force pairs at hamming <= 7") {
    val sigs = Dedup.simhashWideSignatures(spark, d)
    val banded = Dedup.simhashBandedPairs(sigs,
      Dedup.SIMHASH_WIDE_WORDS, Dedup.SIMHASH_WIDE_BAND_BITS, Dedup.SIMHASH_WIDE_MAX_HAMMING)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // Brute force: every unordered signature pair, no banding.
    val brute = sigs.as("a").join(sigs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        (bit_count(col("a.w0").bitwiseXOR(col("b.w0"))) +
          bit_count(col("a.w1").bitwiseXOR(col("b.w1")))).as("hamming"))
      .filter(col("hamming") <= Dedup.SIMHASH_WIDE_MAX_HAMMING)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(brute.nonEmpty, "test premise: the corpus holds near-dup pairs")
    assert(banded == brute,
      s"banding lost ${(brute -- banded).size} pairs / invented ${(banded -- brute).size}")
  }

  test("the wider band space strictly prunes candidates vs the 60-bit default (the scale motivation)") {
    // Candidate volume BEFORE the hamming verify is what grows n^2/2^bandBits;
    // count raw banded join hits (distinct pairs, no hamming filter) per family.
    val narrow = Dedup.simhashSignatures(spark, d).withColumnRenamed("simhash", "w0")
    def rawCandidates(sigs: org.apache.spark.sql.DataFrame, words: Int, bandBits: Int): Long = {
      val bandsPerWord = 60 / bandBits
      val mask = (1L << bandBits) - 1
      val bandExprs = for { w <- 0 until words; b <- 0 until bandsPerWord }
        yield shiftright(col(s"w$w"), b * bandBits).bitwiseAND(mask)
      val bands = sigs.select(col("doc_id"),
        posexplode(array(bandExprs: _*)).as(Seq("band_idx", "band_val")))
      bands.as("a").join(bands.as("b"),
          col("a.band_idx") === col("b.band_idx") &&
            col("a.band_val") === col("b.band_val") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
    }
    val nNarrow = rawCandidates(narrow, 1, 10)
    val nWide = rawCandidates(Dedup.simhashWideSignatures(spark, d), 2, 15)
    assert(nWide < nNarrow,
      s"wide bands produced $nWide candidates vs narrow $nNarrow — no pruning?")
  }

  test("mis-sized banding fails fast instead of silently losing recall") {
    val sigs = Dedup.simhashWideSignatures(spark, d)
    // bands < maxHamming + 1: pigeonhole broken (4 bands of 30 bits over 2
    // words = 4 bands < 8).
    val e1 = intercept[IllegalArgumentException] {
      Dedup.simhashBandedPairs(sigs, words = 2, bandBits = 30, maxHamming = 7)
    }
    assert(e1.getMessage.contains("recall"))
    // bandBits not dividing 60: a band would straddle a word boundary.
    val e2 = intercept[IllegalArgumentException] {
      Dedup.simhashBandedPairs(sigs, words = 2, bandBits = 13, maxHamming = 3)
    }
    assert(e2.getMessage.contains("divide"))
  }
}
