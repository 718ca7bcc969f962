package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization of a string column — the canonical-composition
  * pass a web-scale text pipeline runs before hashing, deduplicating, or
  * tokenizing (the same logical text arrives from the wild in composed and
  * decomposed encodings; é as U+00E9 vs e+U+0301 would otherwise defeat
  * every exact-hash operator in the catalog). Spark has no built-in for
  * this, so it is a native expression rather than a UDF.
  *
  * Scale shape: the hot path is a single byte scan — pure-ASCII input
  * (the overwhelming majority of web corpora by byte count) is detected
  * without decoding and returned AS-IS, zero allocation; non-ASCII input
  * pays `Normalizer.isNormalized` (cheap quick-check lookup) and only
  * text that is genuinely not in NFC allocates a normalized copy. Stays
  * inside whole-stage codegen via a static call.
  *
  * Cross-engine contract: Unicode canonical composition is
  * version-stable for assigned codepoints (normalization stability
  * policy), so JDK `java.text.Normalizer` and DuckDB's utf8proc
  * `nfc_normalize` agree on any text whose codepoints both know — the
  * oracle relies on that, and the spec pins the classic composed /
  * decomposed pairs.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftbridge.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** ASCII fast path (one byte scan, no decode), quick-check second path
    * (already-NFC returns the input object), allocate only when composing. */
  def normalize(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) {
        val str = s.toString
        return if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
        else UTF8String.fromString(
          java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
      }
      i += 1
    }
    s
  }
}
