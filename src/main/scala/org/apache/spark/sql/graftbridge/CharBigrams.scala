package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: every consecutive CHARACTER BIGRAM of a
  * string (`string` -> `array<string>`, element `i` = characters
  * `[i, i+2)`; `max(0, numChars-1)` elements) in ONE pass per row.
  *
  * Replaces the `transform(sequence(1, length(t) - 1), i -> t.substr(i, 2))`
  * formulation of the char-bigram LM model build (r18 optimization): each
  * `substr(i, 2)` call re-walks the string's UTF-8 bytes from the start to
  * find codepoint `i`, so the per-document cost was O(chars²) — measured as
  * 33-48 s of executorCpuTime to bigram-count a 584 KB corpus
  * (x_lm_bigram_score's model build dominated the whole entry). Here the
  * codepoint boundaries are walked ONCE and each bigram is a byte-span
  * slice.
  *
  * Bit contract (what keeps the consumer exactly DuckDB-verifiable):
  * element `i` (0-based) equals `substr(t, i+1, 2)` under Spark/ANSI SQL
  * substring semantics — codepoint-indexed, so multi-byte characters are
  * never split (a surrogate-pair-splitting shape like `split(t, '')` would
  * NOT be equivalent on non-BMP text). A spec pins this expression to the
  * transform+substr formulation on real corpus data and on multi-byte
  * fixtures.
  */
case class CharBigrams(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_char_bigrams"

  override protected def nullSafeEval(a: Any): Any =
    CharBigrams.bigrams(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graftbridge.CharBigrams.bigrams($c)")

  override protected def withNewChildInternal(newChild: Expression): CharBigrams =
    copy(child = newChild)
}

object CharBigrams {
  def bigrams(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val nBytes = bytes.length
    if (nBytes == 0) return new GenericArrayData(Array.empty[Any])
    // One pass: byte offset of every codepoint boundary (+ end sentinel).
    var nChars = 0
    var off = 0
    val offs = new Array[Int](nBytes + 1)
    while (off < nBytes) {
      offs(nChars) = off
      off += UTF8String.numBytesForFirstByte(bytes(off))
      nChars += 1
    }
    offs(nChars) = nBytes
    if (nChars < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nChars - 1)
    var i = 0
    while (i < nChars - 1) {
      val a = offs(i)
      val b = offs(i + 2)
      val slice = new Array[Byte](b - a)
      System.arraycopy(bytes, a, slice, 0, b - a)
      out(i) = UTF8String.fromBytes(slice)
      i += 1
    }
    new GenericArrayData(out)
  }
}
