package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** The REAL-codec image path: actual PNG/JPEG bytes decoded via
  * `javax.imageio`, box-averaged to the family's 6×11 grayscale grid, and
  * run through the SAME dHash + banded kernel as the stub fixture — the
  * one-seam codec swap [[Multimodal.imageSignatures]] documents.
  *
  * Images are CRAFTED cell-aligned (44×24: each grid cell covers a uniform
  * 4×4 block), so the integer box average reproduces the planted gray
  * levels exactly and every assertion is against exact ground truth.
  */
class ImageDecodeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val Rows = 6
  private val Cols = 11

  /** Planted gray level of cell (idx) for image `seed` — a murmur-style
    * scramble so different seeds give DECORRELATED grids (a linear
    * formula leaves adjacent-cell comparisons nearly seed-invariant and
    * unrelated images collide in hamming space); kept in [10, 245] so a
    * +16 perturbation can never clamp. */
  private def gray(seed: Int, idx: Int): Int = {
    var h = seed * 1000003 + idx
    h ^= h >>> 13
    h *= 0x5bd1e995
    h ^= h >>> 15
    math.floorMod(h, 236) + 10
  }

  /** 44×24 image whose 4×4 cell blocks are uniform planted grays;
    * `bump` cells get +16 (the clone perturbation). */
  private def mkImage(seed: Int, bump: Set[Int] = Set.empty): BufferedImage = {
    val img = new BufferedImage(44, 24, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 24; x <- 0 until 44) {
      val idx = (y / 4) * Cols + (x / 4)
      val v = gray(seed, idx) + (if (bump(idx)) 16 else 0)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, bos), s"JDK cannot write $fmt")
    bos.toByteArray
  }

  private lazy val corpus = {
    import spark.implicits._
    val base = (0 until 20).map(i => (i.toLong, encode(mkImage(i), "png")))
    val clone = Seq((100L, encode(mkImage(0, bump = Set(7)), "png")))
    val reenc = Seq((101L, encode(mkImage(1), "png"))) // byte-identical pixels
    val garbage = Seq((999L, Array.tabulate[Byte](64)(_.toByte)))
    (base ++ clone ++ reenc ++ garbage).toDF("doc_id", "payload")
  }

  test("decoded grid reproduces the planted cell grays exactly") {
    val g = Multimodal.decodedGrids(corpus, "doc_id", "payload")
      .filter(col("doc_id") === 3L)
      .select(col("g")).head().getSeq[Long](0)
    val expected = (0 until Rows * Cols).map(i => gray(3, i).toLong)
    assert(g == expected,
      "box average over uniform cell blocks must be the planted gray")
  }

  test("undecodable payloads are dropped, every real image decodes") {
    val ids = Multimodal.decodedGrids(corpus, "doc_id", "payload")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(!ids.contains(999L), "garbage bytes must be dropped, not nulled")
    assert(ids.size == 22, s"all 22 real images must decode, got ${ids.size}")
  }

  test("banded kernel over decoded signatures finds exactly the planted near-dups") {
    val pairs = Multimodal.dedupImageDecoded(corpus, "doc_id", "payload")
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // one-cell +16 bump damages at most the 2 comparisons adjacent to the
    // cell -> hamming <= 2 <= maxHamming 3; identical pixels -> hamming 0
    assert(pairs.contains((0L, 100L)), "perturbed clone must pair with its original")
    assert(pairs.contains((1L, 101L)), "re-encoded identical image must pair")
    // distinct seeds give effectively random 60-bit hashes: none should
    // land within hamming 3 (deterministic fixture, so this is a fixed fact)
    val planted = Set((0L, 100L), (1L, 101L))
    assert(pairs == planted, s"unexpected extra pairs: ${pairs -- planted}")
  }

  test("a JPEG re-encode decodes through the JDK codec and stays hash-near") {
    import spark.implicits._
    val jpegBytes = encode(mkImage(1), "jpg")
    val two = Seq((1L, encode(mkImage(1), "png")), (2L, jpegBytes)).toDF("doc_id", "payload")
    val sigs = Multimodal.imageSignaturesDecoded(two, "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs.size == 2, "the JDK JPEG codec must decode the re-encode")
    val ham = java.lang.Long.bitCount(sigs(1L) ^ sigs(2L))
    // lossy compression of uniform 4x4 blocks perturbs cell averages by a
    // few gray levels; dHash damage stays far below the 60-bit hash size
    assert(ham <= 10, s"JPEG re-encode moved $ham dHash bits")
  }
}
