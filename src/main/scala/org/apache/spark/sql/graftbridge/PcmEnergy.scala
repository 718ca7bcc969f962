package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BinaryType, DataType, LongType}

/** Native Catalyst expression: per-frame energy envelope of a PCM byte
  * stream (`binary` -> `array<long>`) in ONE pass per row.
  *
  * Reads 16-bit little-endian signed samples starting at `dataOffset`
  * (0-based — 44 for a canonical PCM WAV, i.e. right past the RIFF
  * header) and emits one energy value per frame of `frameSamples`
  * samples: energy = sum of |sample| over the frame. Integer arithmetic
  * end to end, so the envelope (and every fingerprint bit derived from
  * it) is bit-deterministic across JVMs and exactly replicable in any
  * engine that can read the same bytes arithmetically (the DuckDB twin
  * computes the identical sums from the fixture's generator formula —
  * a hash match therefore proves the byte build + parse round-trip).
  *
  * A trailing partial frame is DROPPED, not padded: a truncated tail
  * would otherwise report a spuriously low energy and flip gradient
  * bits, the same silent-poison class the JPEG/WAV header gates reject.
  *
  * The audio analogue of the image family's grayscale grid: frame
  * energies are the coarse perceptual summary a fingerprint reads —
  * codec-free, alignment-robust at the frame scale, and cheap enough
  * (one multiply-free pass over the payload) to run at scan speed over
  * billions of clips. Scalar per-row work, no shuffle — the dedup that
  * consumes it pays only the banded candidate join.
  */
case class PcmFrameEnergies(child: Expression, dataOffset: Int, frameSamples: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(dataOffset >= 0, s"dataOffset must be >= 0, got $dataOffset")
  require(frameSamples >= 1, s"frameSamples must be >= 1, got $frameSamples")

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_pcm_frame_energies"

  override protected def nullSafeEval(a: Any): Any =
    PcmFrameEnergies.energies(a.asInstanceOf[Array[Byte]], dataOffset, frameSamples)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graftbridge.PcmFrameEnergies.energies($c, $dataOffset, $frameSamples)")

  override protected def withNewChildInternal(newChild: Expression): PcmFrameEnergies =
    copy(child = newChild)
}

object PcmFrameEnergies {
  /** Static helper invoked from generated code (same discipline as
    * [[SimhashBits.simhash]]). Bytes `[dataOffset, len)` are parsed as
    * i16le samples; whole frames only. */
  def energies(bytes: Array[Byte], dataOffset: Int, frameSamples: Int): GenericArrayData = {
    val nSamples = math.max(0, bytes.length - dataOffset) / 2
    val nFrames = nSamples / frameSamples
    val out = new Array[Long](nFrames)
    var f = 0
    var p = dataOffset
    while (f < nFrames) {
      var e = 0L
      var j = 0
      while (j < frameSamples) {
        // i16le: low byte then high byte; the (short) cast sign-extends.
        val v = ((bytes(p) & 0xff) | (bytes(p + 1) << 8)).toShort.toLong
        e += math.abs(v)
        p += 2
        j += 1
      }
      out(f) = e
      f += 1
    }
    new GenericArrayData(out)
  }
}
