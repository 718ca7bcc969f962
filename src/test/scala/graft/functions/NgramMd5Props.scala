package graft.functions

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** NgramMd5 vs an independent reference on random token lists: the
  * production helper digests byte SPANS of a single joined buffer with an
  * offset index; the reference here builds each gram's joined STRING and
  * formats the digest separately — the exact computation the DuckDB
  * oracle (`md5(array_to_string(w[i+1 : i+n], ' '))`) performs.
  * Agreement on arbitrary input (including multi-byte unicode and empty
  * tokens) is what keeps the expression oracle-compatible by
  * construction.
  */
object NgramMd5Props extends Properties("NgramMd5") {

  private val tokenGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(10)),
    Gen.listOfN(3, Gen.oneOf('单', '字', 'ø', 'ü', '€', '.', 'z')).map(_.mkString),
    Gen.const(""))

  private def referenceGrams(tokens: List[String], n: Int): List[String] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 to tokens.length - n).map { i =>
      md.reset()
      md.digest(tokens.slice(i, i + n).mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }.toList
  }

  property("byte-span digests equal per-gram string digests on random tokens") =
    forAll(Gen.listOf(tokenGen), Gen.choose(1, 6)) { (tokens: List[String], n: Int) =>
      val arr = ArrayData.toArrayData(tokens.map(UTF8String.fromString).toArray)
      val native = org.apache.spark.sql.graftbridge.NgramMd5.grams(arr, n)
      val got = (0 until native.numElements()).map(native.getUTF8String(_).toString).toList
      val want = referenceGrams(tokens, n)
      Prop(got == want) :| s"n=$n tokens=$tokens got=$got want=$want"
    }
}
