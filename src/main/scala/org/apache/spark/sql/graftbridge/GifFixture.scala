package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the video family's REAL-codec fixture —
  * `(text, doc_id) -> binary` animated-GIF bytes (the only multi-frame
  * container the JDK codecs read AND write), one pass per row; the video
  * twin of [[PngFixtureImage]].
  *
  * Frame f is cell-aligned like the PNG fixture: `rows × cols` uniform
  * `cellPx × cellPx` gray blocks, cell j's gray = first md5 byte of
  * `utf8(text) ++ seed ++ utf8(f·rows·cols + j)`. GIF stores each frame
  * behind a ≤256-color palette — a gray-valued frame has at most 256
  * distinct colors, so the JDK's writer encodes it LOSSLESSLY and the
  * decode must return the planted grays exactly (spec-pinned; the same
  * exactness argument as the PNG fixture, plus the palette bound).
  *
  * Clone mode models an EDITED COPY, the stub video family's semantics
  * over real bytes: TRIM the first k = (doc_id / cloneMod) % 3 frames
  * (intro cut / re-sync) and REPLACE the surviving frame at position
  * r = (doc_id / cloneMod) % (frames - k) with fresh content (ad/logo
  * insertion; its grays come from `replaceSeed` at the CLONE-local frame
  * position). Everything is pure doc_id arithmetic, so a DuckDB oracle
  * restates the entire clone construction.
  */
case class GifFixtureVideo(
    text: Expression,
    docId: Expression,
    frames: Int,
    rows: Int,
    cols: Int,
    cellPx: Int,
    seed: String,
    replaceSeed: String,
    asClone: Boolean,
    cloneMod: Int)
  extends BinaryExpression with ExpectsInputTypes {

  override def left: Expression = text
  override def right: Expression = docId
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, LongType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_gif_fixture_video"

  override protected def nullSafeEval(t: Any, id: Any): Any =
    GifFixtureVideo.gif(t.asInstanceOf[UTF8String], id.asInstanceOf[Long],
      frames, rows, cols, cellPx, seed, replaceSeed, asClone, cloneMod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedRef = ctx.addReferenceObj("gifSeed", seed, "java.lang.String")
    val replRef = ctx.addReferenceObj("gifReplaceSeed", replaceSeed, "java.lang.String")
    defineCodeGen(ctx, ev, (t, id) =>
      s"org.apache.spark.sql.graftbridge.GifFixtureVideo.gif($t, $id, $frames, $rows, " +
        s"$cols, $cellPx, $seedRef, $replRef, $asClone, $cloneMod)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GifFixtureVideo =
    copy(text = newLeft, docId = newRight)
}

object GifFixtureVideo {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def gif(text: UTF8String, docId: Long, frames: Int, rows: Int, cols: Int,
      cellPx: Int, seed: String, replaceSeed: String,
      asClone: Boolean, cloneMod: Int): Array[Byte] = {
    val textBytes = text.getBytes
    val cells = rows * cols
    val k = if (asClone) ((docId / cloneMod) % 3).toInt else 0
    val m = frames - k
    val r = if (asClone) ((docId / cloneMod) % m).toInt else -1

    val md = digest.get()
    GrayFixtureCodec.encodeGif((0 until m).iterator.map { p =>
      // clone position p shows original frame p+k, except the replaced
      // one, whose grays come from replaceSeed at the CLONE-local index
      val (s, fi) = if (asClone && p == r) (replaceSeed, p) else (seed, p + k)
      GrayFixtureCodec.cellImage(rows, cols, cellPx, { j =>
        md.reset()
        md.update(textBytes)
        md.update(s.getBytes("UTF-8"))
        md.update(String.valueOf(fi * cells + j).getBytes("UTF-8"))
        md.digest()(0) & 0xFF
      })
    })
  }
}
