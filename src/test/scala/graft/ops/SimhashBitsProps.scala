package graft.ops

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** SimhashBits vs an independent reference implementation on random token
  * lists (including multi-byte unicode): the production helper recombines
  * digest BYTES (7 whole bytes + a high nibble), the reference here
  * formats the digest to a hex STRING and parses 15 chars base-16 — the
  * exact arithmetic the DuckDB oracle and the Spark SQL `conv` idiom
  * perform. Agreement across the two codepaths on arbitrary input is what
  * keeps the native expression oracle-compatible by construction.
  */
object SimhashBitsProps extends Properties("SimhashBits") {

  private val tokenGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(12)),
    Gen.listOfN(4, Gen.oneOf('单', '字', 'ø', 'ü', '€', '-', ' ', 'a')).map(_.mkString),
    Gen.const(""))

  /** Word `w` consumes hex chars [15w, 15w+15) of the digest — the exact
    * substring arithmetic `substring(md5(tok), 1+15w, 15)` performs. */
  private def referenceSimhashWord(tokens: List[String], w: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val counters = new Array[Int](60)
    tokens.foreach { t =>
      val hex = md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .slice(15 * w, 15 * w + 15)
      val h = java.lang.Long.parseLong(hex, 16)
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
        b += 1
      }
    }
    (0 until 60).foldLeft(0L)((acc, b) => if (counters(b) > 0) acc | (1L << b) else acc)
  }

  private def referenceSimhash(tokens: List[String]): Long = referenceSimhashWord(tokens, 0)

  property("byte-twiddled helper equals hex-string-parsing reference on random tokens") =
    forAll(Gen.listOf(tokenGen)) { tokens: List[String] =>
      val arr = ArrayData.toArrayData(tokens.map(UTF8String.fromString).toArray)
      val native = org.apache.spark.sql.graftbridge.SimhashBits.simhash(arr)
      val ref = referenceSimhash(tokens)
      Prop(native == ref) :| f"native $native%x != reference $ref%x for $tokens"
    }

  property("wide helper: every word equals the hex-substring reference (word 0 == narrow helper)") =
    forAll(Gen.listOf(tokenGen)) { tokens: List[String] =>
      val arr = ArrayData.toArrayData(tokens.map(UTF8String.fromString).toArray)
      val wide = org.apache.spark.sql.graftbridge.SimhashBits.simhashWide(arr, 2)
      val narrow = org.apache.spark.sql.graftbridge.SimhashBits.simhash(arr)
      val r0 = referenceSimhashWord(tokens, 0)
      val r1 = referenceSimhashWord(tokens, 1)
      Prop(wide.getLong(0) == r0 && wide.getLong(1) == r1 && wide.getLong(0) == narrow) :|
        f"wide (${wide.getLong(0)}%x, ${wide.getLong(1)}%x) != reference ($r0%x, $r1%x) for $tokens"
    }
}
