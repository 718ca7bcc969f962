package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the image family's REAL-codec fixture —
  * `(text, doc_id) -> binary` PNG bytes — in one pass per row; the image
  * twin of [[WavFixtureClip]] (same structure, same clone contract).
  *
  * The image is CELL-ALIGNED: `rows × cols` grid cells, each rendered as a
  * uniform `cellPx × cellPx` gray block, written as TRUECOLOR R=G=B=v (see
  * [[GrayFixtureCodec.cellImageRgb]] for why the PNG path must not use a
  * gray palette or BYTE_GRAY). Cell j's planted gray is the first md5 byte of
  * `utf8(text) ++ seed ++ utf8(j)` — the SAME derivation discipline as the
  * stub grid and the WAV frames, so a DuckDB oracle restates it as
  * `CAST('0x' || substring(md5(text || seed || j), 1, 2) AS BIGINT)`.
  *
  * Why this oracles the whole codec round-trip: PNG is lossless and the
  * decode side's integer pipeline is exact on this fixture — BT.601 gray
  * of (v,v,v) is (299v+587v+114v)/1000 = v, and the box average of a
  * uniform cell block is the cell value itself — so the decoded grid MUST
  * equal the generator formula byte-for-byte. Any deviation anywhere in
  * encode → PNG bytes → `javax.imageio` decode → box-average downscale
  * shifts a planted gray and fails the oracle hash.
  *
  * Clone mode (`asClone`) perturbs n_pert = (doc_id / cloneMod) % 4 cells
  * at positions (j·7 + doc_id) % (rows·cols) < n_pert (7 coprime to 66 →
  * exactly n_pert distinct cells) by `(v + pertDelta) % 256` — the stub
  * family's bump, wrapped to stay a valid 8-bit sample.
  *
  * The PNG bytes themselves are NOT required to be stable across JVMs —
  * only the decoded pixels are (lossless round-trip), and nothing
  * downstream hashes the encoded bytes.
  */
case class PngFixtureImage(
    text: Expression,
    docId: Expression,
    rows: Int,
    cols: Int,
    cellPx: Int,
    seed: String,
    asClone: Boolean,
    cloneMod: Int,
    pertDelta: Int)
  extends BinaryExpression with ExpectsInputTypes {

  override def left: Expression = text
  override def right: Expression = docId
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, LongType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_png_fixture_image"

  override protected def nullSafeEval(t: Any, id: Any): Any =
    PngFixtureImage.png(t.asInstanceOf[UTF8String], id.asInstanceOf[Long],
      rows, cols, cellPx, seed, asClone, cloneMod, pertDelta)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedRef = ctx.addReferenceObj("pngSeed", seed, "java.lang.String")
    defineCodeGen(ctx, ev, (t, id) =>
      s"org.apache.spark.sql.graftbridge.PngFixtureImage.png($t, $id, $rows, $cols, " +
        s"$cellPx, $seedRef, $asClone, $cloneMod, $pertDelta)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PngFixtureImage =
    copy(text = newLeft, docId = newRight)
}

object PngFixtureImage {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def png(text: UTF8String, docId: Long, rows: Int, cols: Int, cellPx: Int,
      seed: String, asClone: Boolean, cloneMod: Int, pertDelta: Int): Array[Byte] = {
    val textBytes = text.getBytes
    val seedBytes = seed.getBytes("UTF-8")
    val cells = rows * cols
    val nPert = if (asClone) (docId / cloneMod) % 4 else 0L
    val md = digest.get()
    val img = GrayFixtureCodec.cellImageRgb(rows, cols, cellPx, { j =>
      md.reset()
      md.update(textBytes)
      md.update(seedBytes)
      md.update(String.valueOf(j).getBytes("UTF-8"))
      val v = md.digest()(0) & 0xFF
      if (asClone && (j * 7L + docId) % cells < nPert) (v + pertDelta) % 256 else v
    })
    GrayFixtureCodec.encodePng(img)
  }
}
