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

  // ---- The ORACLED real-PNG fixture family (x_image_real_roundtrip /
  // x_dedup_image_real): decoded grids must equal the '#q' generator
  // formula byte-for-byte — recomputed here independently via
  // MessageDigest, the same ground truth the DuckDB oracle states in SQL.

  private def plantedGray(text: String, j: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(text.getBytes("UTF-8")); md.update("#q".getBytes("UTF-8"))
    md.update(String.valueOf(j).getBytes("UTF-8"))
    (md.digest()(0) & 0xFF).toLong
  }

  test("real-PNG fixture: decoded grid equals the generator formula, originals and clones") {
    val dir = "/root/testdata/sf0.001"
    val texts = graft.ops.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val grids = Multimodal.decodedGrids(
        Multimodal.pngFixtureCorpus(spark, dir), "doc_id", "png")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val nClones = texts.keys.count(_ % 5 == 0)
    assert(grids.size == texts.size + nClones,
      "every fixture PNG (originals + planted clones) must decode")
    // originals: grid j = first md5 byte of (text, '#q', j)
    val someId = texts.keys.min
    assert(grids(someId) == (0 until 66).map(j => plantedGray(texts(someId), j)),
      "decoded original grid must equal the planted formula")
    // clones: nPert cells bumped +16 mod 256 at (j*7 + id) % 66 < nPert
    val cloneBase = texts.keys.filter(id => id % 5 == 0 && (id / 5) % 4 == 3).head
    val expected = (0 until 66).map { j =>
      val v = plantedGray(texts(cloneBase), j)
      if ((j * 7 + cloneBase) % 66 < 3) (v + 16) % 256 else v
    }
    assert(grids(cloneBase + 10000000L) == expected,
      "decoded clone grid must equal the perturbed formula")
  }

  test("real-PNG near-dup: unperturbed clones always pair at hamming 0") {
    val dir = "/root/testdata/sf0.001"
    val pairs = Multimodal.dedupImageReal(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val ids = graft.ops.Tables.documents(spark, dir)
      .select(col("doc_id")).collect().map(_.getLong(0))
    // nPert = (id/5) % 4 == 0 -> the clone is byte-identical pixels:
    // banding MUST find it (pigeonhole) at hamming exactly 0
    val identical = ids.filter(id => id % 5 == 0 && (id / 5) % 4 == 0)
    assert(identical.nonEmpty)
    identical.foreach { id =>
      assert(pairs.get((id, id + 10000000L)).contains(0),
        s"identical-pixel clone of $id must pair at hamming 0")
    }
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
