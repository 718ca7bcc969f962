package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: the full 60-bit SimHash of a tokenized
  * document (`array<string>` -> long) in ONE pass per row.
  *
  * Replaces the explode + 60-column aggregate formulation of
  * `ops/Dedup.simhashSignatures`: that shape multiplies the row count by
  * the tokens-per-document factor before aggregating it back down, and
  * evaluates 60 separate `sum(when(shiftright(...)))` aggregate
  * expressions per exploded row. Here the per-token md5 and the 60 bit
  * counters run in a tight static-helper loop invoked from generated code
  * — the signature relation is produced at SCAN speed with no Generate,
  * no aggregation, and no shuffle at all (the sketch's only exchanges are
  * then the candidate join's).
  *
  * Bit contract (hash-identical to the SQL oracle, which is what keeps
  * `x_dedup_simhash`/`x_dedup_cc`/`dml_chunked_dedup` exactly
  * DuckDB-verifiable): per token, h = first 15 hex chars of md5(token)
  * parsed base-16 (60 bits); counter[i] += (h >> i & 1) == 1 ? +1 : -1;
  * output bit i set iff counter[i] > 0. A row-parity spec pins this
  * expression to the explode+aggregate formulation on real corpus data.
  */
case class SimhashBits(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash_bits"

  override protected def nullSafeEval(a: Any): Any =
    SimhashBits.simhash(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graftbridge.SimhashBits.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimhashBits =
    copy(child = newChild)
}

/** Wide-signature variant of [[SimhashBits]]: `words` independent 60-bit
  * SimHash words per document (`array<string>` -> `array<long>`,
  * `words * 60` signature bits total) in ONE pass per row with ONE md5 per
  * token — word `w` consumes hex chars `[15w+1, 15w+15]` (1-indexed) of
  * the SAME 32-hex-char digest, so word 0 is bit-identical to
  * [[SimhashBits]] and the whole family stays exactly replicable in any
  * engine with md5 + substring (DuckDB:
  * `CAST('0x' || substring(md5(tok), 1+15*w, 15) AS BIGINT)`).
  *
  * Why width is a parameter (the 100 TB sizing rule, same law the
  * hyperplane/minhash LSH families measured): banding a `B`-bit signature
  * into `bands` exact-match slices of `bandBits = B/bands` bits gives
  * pigeonhole-complete recall for hamming <= bands-1, while candidate
  * volume per band scales as n^2 / 2^bandBits — so `bandBits` must grow
  * ~log2(corpus) to keep candidates O(n), and the signature must widen to
  * `(maxHamming+1) * bandBits` bits to keep recall. The fixed 60-bit
  * default (6x10-bit bands, 1024 buckets/band) is right up to ~10^5-10^6
  * docs; past that, widen (words=2 -> 120 bits, 8x15-bit bands, 32768
  * buckets/band).
  */
case class SimhashWide(child: Expression, words: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(words >= 1 && words <= 2,
    s"words must be 1 or 2 (md5 yields 32 hex chars = two 15-char words), got $words")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_simhash_wide"

  override protected def nullSafeEval(a: Any): Any =
    SimhashBits.simhashWide(a.asInstanceOf[ArrayData], words)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graftbridge.SimhashBits.simhashWide($c, $words)")

  override protected def withNewChildInternal(newChild: Expression): SimhashWide =
    copy(child = newChild)
}

object SimhashBits {
  private val Bits = 60

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Hex chars `[15w, 15w+15)` (0-indexed) of the digest as an unsigned
    * 60-bit value — for w=0 the first 7 digest bytes whole plus the high
    * nibble of the 8th, exactly what `CAST('0x' ||
    * substring(md5(tok),1,15) AS BIGINT)` (DuckDB) and
    * `conv(substring(md5(tok),1,15),16,10)` (Spark SQL) parse; general w
    * walks nibbles so unaligned word starts (odd 15w) cost nothing. */
  private def hashWord(d: Array[Byte], w: Int): Long = {
    var h = 0L
    var i = 15 * w
    val end = i + 15
    while (i < end) {
      val b = d(i >> 1)
      val nib = if ((i & 1) == 0) (b >> 4) & 0xf else b & 0xf
      h = (h << 4) | nib
      i += 1
    }
    h
  }

  def simhash(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counters = new Array[Int](Bits)
    var i = 0
    while (i < n) {
      val md = digest.get()
      md.reset()
      val h = hashWord(md.digest(arr.getUTF8String(i).getBytes), 0)
      var b = 0
      while (b < Bits) {
        if (((h >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < Bits) {
      if (counters(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** `words` 60-bit SimHash words in one pass; ONE md5 per token feeds all
    * words. Word 0 is bit-identical to [[simhash]]. */
  def simhashWide(arr: ArrayData, words: Int): ArrayData = {
    val n = arr.numElements()
    val counters = new Array[Int](words * Bits)
    var i = 0
    while (i < n) {
      val md = digest.get()
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      var w = 0
      while (w < words) {
        val h = hashWord(d, w)
        val off = w * Bits
        var b = 0
        while (b < Bits) {
          if (((h >>> b) & 1L) == 1L) counters(off + b) += 1 else counters(off + b) -= 1
          b += 1
        }
        w += 1
      }
      i += 1
    }
    val sig = new Array[Long](words)
    var w = 0
    while (w < words) {
      val off = w * Bits
      var word = 0L
      var b = 0
      while (b < Bits) {
        if (counters(off + b) > 0) word |= (1L << b)
        b += 1
      }
      sig(w) = word
      w += 1
    }
    new GenericArrayData(sig)
  }
}
