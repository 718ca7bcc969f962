package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the audio family's fixture clip —
  * `(text, doc_id) -> binary` WAV bytes — in ONE pass per row.
  *
  * Semantically identical to the column formulation (61 ×
  * `unhex(md5(concat(text, seed, f)))` concatenated behind a header
  * literal, spec-pinned bit-equal), but those 61 inlined md5 chains
  * overflow Janino's 64 KB method limit inside whole-stage codegen — the
  * projection can't split a single concat tree, so the WHOLE stage fell
  * back to interpreted mode (observed: `Code grows beyond 64 KB`, ~2× on
  * the signature relation). Here the build is a tight static loop with a
  * thread-local digest, and the generated code is one call.
  *
  * `unhex(md5hex)` is just the raw digest, so no hex round-trip happens:
  * frame f's 16 bytes = MD5(utf8(text) ++ utf8(seed) ++ utf8(f)).
  * Clone mode (`asClone`) perturbs n_pert = (doc_id / cloneMod) % 4
  * frames at positions (f·5 + doc_id) % frames < n_pert by bumping the
  * frame's first byte +`pertDelta` mod 256 — byte-for-byte the column
  * formulation's `(b0 + delta) % 256` low-byte bump.
  *
  * The header rides as an immutable `Seq[Byte]` so case-class equality
  * (and with it Catalyst canonicalization / subexpression elimination) is
  * STRUCTURAL — an `Array[Byte]` param compares by reference, so two
  * semantically identical clip expressions built from distinct arrays
  * would never dedup. The seed reaches generated Java via
  * `addReferenceObj`, never spliced into source (a seed containing `"` or
  * `\` must not break — or worse, rewrite — the generated code).
  */
case class WavFixtureClip(
    text: Expression,
    docId: Expression,
    header: Seq[Byte],
    frames: Int,
    seed: String,
    asClone: Boolean,
    cloneMod: Int,
    pertDelta: Int)
  extends BinaryExpression with ExpectsInputTypes {

  @transient private lazy val headerArr: Array[Byte] = header.toArray

  override def left: Expression = text
  override def right: Expression = docId
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, LongType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_wav_fixture_clip"

  override protected def nullSafeEval(t: Any, id: Any): Any =
    WavFixtureClip.clip(t.asInstanceOf[UTF8String], id.asInstanceOf[Long],
      headerArr, frames, seed, asClone, cloneMod, pertDelta)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val headerRef = ctx.addReferenceObj("wavHeader", headerArr, "byte[]")
    val seedRef = ctx.addReferenceObj("wavSeed", seed, "java.lang.String")
    defineCodeGen(ctx, ev, (t, id) =>
      s"org.apache.spark.sql.graftbridge.WavFixtureClip.clip($t, $id, $headerRef, " +
        s"$frames, $seedRef, $asClone, $cloneMod, $pertDelta)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WavFixtureClip =
    copy(text = newLeft, docId = newRight)
}

object WavFixtureClip {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def clip(text: UTF8String, docId: Long, header: Array[Byte], frames: Int,
      seed: String, asClone: Boolean, cloneMod: Int, pertDelta: Int): Array[Byte] = {
    val textBytes = text.getBytes
    val seedBytes = seed.getBytes("UTF-8")
    val out = new Array[Byte](header.length + frames * 16)
    System.arraycopy(header, 0, out, 0, header.length)
    val nPert = if (asClone) (docId / cloneMod) % 4 else 0L
    val md = digest.get()
    var f = 0
    var p = header.length
    while (f < frames) {
      md.reset()
      md.update(textBytes)
      md.update(seedBytes)
      md.update(String.valueOf(f).getBytes("UTF-8"))
      val d = md.digest()
      if (asClone && (f * 5L + docId) % frames < nPert)
        d(0) = (d(0) + pertDelta).toByte // (b0 + delta) % 256, two's complement
      System.arraycopy(d, 0, out, p, 16)
      p += 16
      f += 1
    }
    out
  }
}
