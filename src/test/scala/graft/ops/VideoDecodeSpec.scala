package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** The ORACLED real-GIF video family (x_video_real_roundtrip /
  * x_dedup_video_real): animated-GIF bytes decoded frame-by-frame must
  * reproduce the '#w'/'#x' generator formula exactly — recomputed here
  * independently via MessageDigest, the same ground truth the DuckDB
  * oracle states in SQL — and the trim+replace clone model must give the
  * exact-recall guarantee the precision entry's scaladoc claims.
  */
class VideoDecodeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"
  private val Frames = 16
  private val Cells = 66
  private val CloneOff = 40000000L

  private def plantedGray(text: String, seed: String, i: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(text.getBytes("UTF-8")); md.update(seed.getBytes("UTF-8"))
    md.update(String.valueOf(i).getBytes("UTF-8"))
    (md.digest()(0) & 0xFF).toLong
  }

  private lazy val texts = Tables.documents(spark, dir)
    .select(col("doc_id"), col("text")).collect()
    .map(r => r.getLong(0) -> r.getString(1)).toMap

  private lazy val grids = Multimodal.decodedFrameGrids(
      Multimodal.gifFixtureCorpus(spark, dir), "doc_id", "gif")
    .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getSeq[Long](2)).toMap

  test("every GIF decodes to its full frame sequence, originals and clones") {
    val perDoc = grids.keys.groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
    texts.keys.foreach { id =>
      assert(perDoc(id) == (0 until Frames), s"original $id frame set")
    }
    texts.keys.filter(_ % 6 == 0).foreach { id =>
      val k = ((id / 6) % 3).toInt
      assert(perDoc(id + CloneOff) == (0 until Frames - k),
        s"clone of $id must be trimmed by k=$k frames")
    }
  }

  test("decoded frame grids equal the generator formula — trim AND replace arithmetic") {
    val someId = texts.keys.min
    (0 until Frames).foreach { f =>
      assert(grids((someId, f)) == (0 until Cells).map(j =>
        plantedGray(texts(someId), "#w", f * Cells + j)),
        s"original frame $f")
    }
    // a clone with a nonzero trim: k = (id/6)%3 == 2, mid-sequence replace
    val cid = texts.keys.filter(id => id % 6 == 0 && (id / 6) % 3 == 2).head
    val k = 2
    val r = ((cid / 6) % (Frames - k)).toInt
    (0 until Frames - k).foreach { p =>
      val want =
        if (p == r) (0 until Cells).map(j => plantedGray(texts(cid), "#x", p * Cells + j))
        else (0 until Cells).map(j => plantedGray(texts(cid), "#w", (p + k) * Cells + j))
      assert(grids((cid + CloneOff, p)) == want,
        s"clone frame $p (k=$k, r=$r) of doc $cid")
    }
  }

  test("planted recall is exact: every edited copy pairs with its original above the gate") {
    val pairs = Multimodal.dedupVideoReal(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
    val planted = texts.keys.filter(_ % 6 == 0)
    assert(planted.nonEmpty)
    planted.foreach { id =>
      val ppm = pairs.get((id, id + CloneOff))
      assert(ppm.exists(_ >= 600000L),
        s"clone of $id must pair above the 600000 ppm gate, got $ppm")
    }
  }
}
