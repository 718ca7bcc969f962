package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
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

object SimhashBits {
  private val Bits = 60

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex chars of md5(bytes) as an unsigned 60-bit value: the
    * first 7 digest bytes whole plus the high nibble of the 8th — exactly
    * what `CAST('0x' || substring(md5(tok),1,15) AS BIGINT)` (DuckDB) and
    * `conv(substring(md5(tok),1,15),16,10)` (Spark SQL) parse. */
  private def hash60(bytes: Array[Byte]): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(bytes)
    var h = 0L
    var k = 0
    while (k < 7) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
    (h << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  def simhash(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counters = new Array[Int](Bits)
    var i = 0
    while (i < n) {
      val h = hash60(arr.getUTF8String(i).getBytes)
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
}
