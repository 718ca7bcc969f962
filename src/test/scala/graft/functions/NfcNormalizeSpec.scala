package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.nfcNormalize
import graft.SparkTestSession

/** The native NFC normalizer: composed/decomposed pairs converge, ASCII is
  * untouched, the result is idempotent, and the column path agrees with
  * java.text.Normalizer on adversarial inputs. All non-ASCII is built from
  * explicit code points so the source-file encoding cannot silently
  * normalize the fixtures.
  */
class NfcNormalizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val acute = "́" // combining acute
  private val ring = "̊" // combining ring above
  private val eAcute = "é" // precomposed é
  private val aRing = "Å" // precomposed Å

  private def norm(inputs: Seq[String]): Seq[String] =
    inputs.toDF("s").select(nfcNormalize(col("s"))).collect().map(_.getString(0)).toSeq

  test("decomposed sequences compose to their NFC form") {
    val decomposed = Seq(
      "cafe" + acute, // e + combining acute -> é
      "A" + ring + "ngstrom", // A + combining ring -> Å
      "ṩ") // s + dot below + dot above (canonical ordering case)
    val got = norm(decomposed)
    val expected = decomposed.map(java.text.Normalizer.normalize(_, java.text.Normalizer.Form.NFC))
    assert(got == expected)
    assert(got.head == "caf" + eAcute)
    assert(got(1) == aRing + "ngstrom")
    assert(got(2) == new String(Character.toChars(0x1E69))) // s-with-dot-below, then dot above
  }

  test("ASCII and already-NFC text pass through unchanged; nulls stay null") {
    val rows = Seq[(java.lang.Long, String)]((1L, "plain ascii text 123"), (2L, "caf" + eAcute), (3L, null))
      .toDF("id", "s").select(col("id"), nfcNormalize(col("s")).as("n")).collect()
      .sortBy(_.getLong(0))
    assert(rows.map(r => if (r.isNullAt(1)) null else r.getString(1)).toSeq ==
      Seq("plain ascii text 123", "caf" + eAcute, null))
  }

  test("idempotent, and equal to java.text.Normalizer on mixed adversarial inputs") {
    val smile = new String(Character.toChars(0x1F600))
    val inputs = Seq("", " ", eAcute * 3, smile + " ok e" + acute,
      "A" + acute + "̖", "half¼ and e" + acute + "nd")
    val once = norm(inputs)
    assert(norm(once) == once, "normalization must be idempotent")
    assert(once == inputs.map(java.text.Normalizer.normalize(_, java.text.Normalizer.Form.NFC)))
  }
}
