package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: all `n`-token-gram md5 hex fingerprints of a
  * tokenized document (`array<string>` -> `array<string>`, element `i` =
  * md5 of tokens `[i, i+n)` joined by a single space; `max(0, len-n+1)`
  * elements) in ONE pass per row.
  *
  * Replaces the `transform(sequence(...), i -> md5(concat_ws(" ",
  * slice(toks, i+1, n))))` formulation used by the duplicate-span and
  * decontamination gram builders: `ArrayTransform` is CodegenFallback, so
  * that shape drops the whole projection out of whole-stage codegen and
  * pays an interpreted slice-copy + string-rebuild + digest-state setup
  * PER GRAM (measured 5.8 µs/gram at sf0.1 — the gram build dominated the
  * whole x_dup_spans plan). Here the document is joined once into a byte
  * buffer with an offset index, and each gram digests its byte SPAN
  * directly — no per-gram array or string allocation; the hex characters
  * are the only per-gram output.
  *
  * Bit contract (what keeps the consumers exactly DuckDB-verifiable):
  * element `i` equals `md5(array_to_string(w[i+1 : i+n], ' '))` — the
  * lowercase 32-hex-char digest of the UTF-8 bytes of the n tokens joined
  * with single 0x20 separators. A spec pins this expression to the
  * transform+slice formulation on real corpus data.
  *
  * Null elements follow `concat_ws` semantics exactly (a null token and
  * its separator vanish from the joined gram text, while still occupying
  * a window slot) — the HOF formulation this replaces behaved that way,
  * and the all-non-null fast path costs nothing for the tokenizer-fed
  * consumers that can never produce nulls.
  */
case class NgramMd5(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"gram size must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_ngram_md5"

  override protected def nullSafeEval(a: Any): Any =
    NgramMd5.grams(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graftbridge.NgramMd5.grams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): NgramMd5 =
    copy(child = newChild)
}

object NgramMd5 {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HEX = "0123456789abcdef".getBytes

  def grams(arr: ArrayData, n: Int): ArrayData = {
    val nTok = arr.numElements()
    val nGrams = nTok - n + 1
    if (nGrams <= 0) return new GenericArrayData(Array.empty[Any])
    // Join all tokens once: bytes + start offset of each token. offs has
    // one trailing entry so gram i spans [offs(i), offs(i+n) - 2] —
    // dropping the separator that follows its last token.
    val toks = new Array[Array[Byte]](nTok)
    var total = 0
    var hasNull = false
    var i = 0
    while (i < nTok) {
      if (arr.isNullAt(i)) hasNull = true
      else {
        val b = arr.getUTF8String(i).getBytes
        toks(i) = b
        total += b.length + 1
      }
      i += 1
    }
    if (hasNull) return gramsWithNulls(toks, n)
    val buf = new Array[Byte](total)
    val offs = new Array[Int](nTok + 1)
    var p = 0
    i = 0
    while (i < nTok) {
      offs(i) = p
      val b = toks(i)
      System.arraycopy(b, 0, buf, p, b.length)
      p += b.length
      buf(p) = ' '
      p += 1
      i += 1
    }
    offs(nTok) = p
    val md = digest.get()
    val out = new Array[Any](nGrams)
    i = 0
    while (i < nGrams) {
      md.reset()
      md.update(buf, offs(i), offs(i + n) - 1 - offs(i))
      out(i) = toHex(md.digest())
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Slow path for arrays containing null elements (toks(i) == null):
    * concat_ws semantics — a null token contributes neither bytes nor a
    * separator, but still fills a window slot, exactly like the
    * `md5(concat_ws(" ", slice(toks, i+1, n)))` formulation. */
  private def gramsWithNulls(toks: Array[Array[Byte]], n: Int): ArrayData = {
    val nGrams = toks.length - n + 1
    val md = digest.get()
    val out = new Array[Any](nGrams)
    var i = 0
    while (i < nGrams) {
      md.reset()
      var first = true
      var j = i
      while (j < i + n) {
        val b = toks(j)
        if (b != null) {
          if (!first) md.update(' '.toByte)
          md.update(b)
          first = false
        }
        j += 1
      }
      out(i) = toHex(md.digest())
      i += 1
    }
    new GenericArrayData(out)
  }

  private def toHex(d: Array[Byte]): UTF8String = {
    val hex = new Array[Byte](32)
    var j = 0
    while (j < 16) {
      hex(2 * j) = HEX((d(j) >> 4) & 0xf)
      hex(2 * j + 1) = HEX(d(j) & 0xf)
      j += 1
    }
    UTF8String.fromBytes(hex)
  }
}
