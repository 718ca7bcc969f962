package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** The audio fingerprint family: real-WAV fixture build, byte-level header
  * and PCM parsing, envelope-gradient fingerprint, banded near-dup — the
  * properties the DuckDB oracle can't express (native-expression parity,
  * truncation behavior, the perceptual locality law).
  */
class AudioDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sfDir = SparkTestSession.sfDir

  /** Pure-Scala reference of the PCM energy walk, independent of the
    * expression under test. */
  private def refEnergies(bytes: Array[Byte], off: Int, spf: Int): Seq[Long] = {
    val samples = bytes.drop(off).grouped(2).filter(_.length == 2)
      .map(p => ((p(0) & 0xff) | (p(1) << 8)).toShort.toLong).toSeq
    samples.grouped(spf).filter(_.length == spf).map(_.map(math.abs).sum).toSeq
  }

  test("PcmFrameEnergies equals the pure-Scala reference, codegen and interpreted") {
    val rnd = new scala.util.Random(42)
    val payloads = (0 until 20).map { i =>
      // lengths exercise: empty data, partial frame tails, odd byte counts
      val n = Seq(44, 45, 60, 44 + 16, 44 + 17, 44 + 16 * 7 + rnd.nextInt(16))(i % 6)
      val b = new Array[Byte](n); rnd.nextBytes(b); (i.toLong, b)
    }
    val df = payloads.toDF("id", "p")
    def run(): Map[Long, Seq[Long]] =
      df.select(col("id"),
          org.apache.spark.sql.graftbridge.pcmFrameEnergies(col("p"), 44, 8).as("e"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val expected = payloads.map { case (id, b) => id -> refEnergies(b, 44, 8) }.toMap
    val codegen = run()
    assert(codegen == expected)
    val saved = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      assert(run() == expected)
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("native clip builder is bit-identical to the column formulation, orig and clone") {
    // The catalog rides the codegen'd WavFixtureClip (61 inlined md5 chains
    // overflow Janino's method limit); this pins it byte-for-byte to the
    // readable 61 × unhex(md5(...)) concat statement of the contract.
    val docs = Tables.documents(spark, sfDir).limit(40)
    Seq(false, true).foreach { asClone =>
      val mismatches = docs.select(
          Multimodal.wavClipCol(col("text"), col("doc_id"), asClone).as("native"),
          Multimodal.wavPayloadCol(col("text"), col("doc_id"), asClone).as("columnar"))
        .filter(not(col("native") === col("columnar")))
        .count()
      assert(mismatches == 0, s"asClone=$asClone: $mismatches clips differ")
    }
  }

  test("fixture clips are canonical PCM-44 WAVs: gate passes, header fields parse") {
    val clips = Tables.documents(spark, sfDir).limit(50)
      .select(col("doc_id"), Multimodal.wavPayloadCol(col("text"), col("doc_id"), asClone = false).as("p"))
    val rows = clips.select(
        Multimodal.isWav(col("p")).as("ok"),
        Multimodal.wavChannels(col("p")).as("ch"),
        Multimodal.wavSampleRate(col("p")).as("sr"),
        Multimodal.wavBitsPerSample(col("p")).as("bits"),
        Multimodal.wavDataBytes(col("p")).as("db"),
        Multimodal.wavDurationMs(col("p")).as("ms"),
        length(col("p")).as("len")).collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      assert(r.getBoolean(0))
      assert(r.getInt(1) == 1 && r.getInt(2) == 8000 && r.getInt(3) == 16)
      assert(r.getLong(4) == 976L && r.getLong(5) == 61L && r.getInt(6) == 44 + 976)
    }
  }

  test("a trailing partial frame is dropped, not padded") {
    val clip = Tables.documents(spark, sfDir).limit(1)
      .select(Multimodal.wavPayloadCol(col("text"), col("doc_id"), asClone = false).as("p"))
    // cut one byte: 975 data bytes = 487 whole samples = 60 whole frames
    val counts = clip.select(
        size(Multimodal.audioEnvCol(col("p"))).as("full"),
        size(Multimodal.audioEnvCol(substring(col("p"), 1, 44 + 975))).as("cut"),
        size(Multimodal.audioEnvCol(substring(col("p"), 1, 44))).as("empty")).head()
    assert(counts.getInt(0) == 61 && counts.getInt(1) == 60 && counts.getInt(2) == 0)
  }

  test("envelope fingerprint: clone damage is bounded by 2 bits per perturbed frame") {
    // A +16 low-byte bump moves one frame's energy by <= 240 (mod-wrap worst
    // case), touching at most that frame's two gradient comparisons — so
    // hamming(orig, clone) <= 2 * n_pert: the locality property that makes
    // the envelope hash a PERCEPTUAL fingerprint.
    val sigs = Multimodal.audioSignatures(spark, sfDir)
    val orig = sigs.filter(col("doc_id") < 20000000L)
    val clones = sigs.filter(col("doc_id") >= 20000000L)
      .select((col("doc_id") - 20000000L).as("doc_id"), col("w0").as("cw0"))
    val rows = orig.join(clones, "doc_id")
      .select(col("doc_id"),
        bit_count(col("w0").bitwiseXOR(col("cw0"))).as("hamming"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, ham) =>
      val nPert = (id / 7) % 4
      assert(ham <= 2 * nPert, s"doc $id: hamming $ham > ${2 * nPert}")
    }
    assert(rows.filter { case (id, _) => (id / 7) % 4 == 0 }.forall(_._2 == 0))
  }

  test("audio near-dup family: every planted clone is recovered on the fixture") {
    val r = Multimodal.dedupAudioPrecision(spark, sfDir).head()
    val (cand, planted, both) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(planted > 0 && both == planted,
      s"planted $planted, found $both — a clone exceeded the banding budget")
    assert(cand >= planted)
  }

  test("incremental probe agrees with the self-join restricted to delta-vs-index pairs") {
    // The cross-pairs kernel must find exactly the delta(clone)-vs-index
    // pairs the one-shot self-join finds — same bands, same pigeonhole
    // guarantee — and nothing delta-internal or index-internal.
    val self = Multimodal.dedupAudio(spark, sfDir)
      .filter(col("doc_b") >= 20000000L && col("doc_a") < 20000000L)
      .select(col("doc_b").as("doc_id"), col("doc_a").as("match_id"), col("hamming"))
    val inc = Multimodal.dedupAudioIncremental(spark, sfDir)
    assert(inc.filter(col("doc_id") < 20000000L || col("match_id") >= 20000000L).count() == 0)
    assert(inc.exceptAll(self).count() == 0 && self.exceptAll(inc).count() == 0)
  }

  test("byte round-trip: parsed envelope equals the generator formula (oracle mirror)") {
    // The oracle recomputes energies arithmetically from the md5 generator;
    // this pins the same identity in-suite: build bytes -> parse bytes ==
    // never-touch-bytes arithmetic. Any header-size, endianness, sign or
    // framing slip in the build OR the parse breaks it.
    val docs = Tables.documents(spark, sfDir).limit(30)
    val parsed = docs.select(col("doc_id"),
      Multimodal.audioEnvCol(
        Multimodal.wavPayloadCol(col("text"), col("doc_id"), asClone = false)).as("env"))
    val arithmetic = docs.select(col("doc_id"),
      transform(sequence(lit(0), lit(60)), f =>
        aggregate(sequence(lit(0), lit(7)), lit(0L), (acc, j) => {
          val h = md5(concat(col("text"), lit("#p"), f.cast("string")))
          val b0 = conv(h.substr(j * 4 + lit(1), lit(2)), 16, 10).cast("long")
          val b1 = conv(h.substr(j * 4 + lit(3), lit(2)), 16, 10).cast("long")
          acc + abs((b0 + b1 * 256 + 32768L) % 65536L - 32768L)
        })).as("env"))
    assert(parsed.exceptAll(arithmetic).isEmpty && arithmetic.exceptAll(parsed).isEmpty)
  }
}
