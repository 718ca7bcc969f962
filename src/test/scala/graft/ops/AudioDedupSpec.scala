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

  test("clip expressions are structurally equal across distinct header arrays") {
    // The header is a case-class param: with Array[Byte] it compared by
    // REFERENCE, so Catalyst canonicalization / common-subexpression
    // elimination never deduped two semantically identical clips built
    // from distinct arrays. The builder now wraps an immutable Seq.
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.graftbridge.WavFixtureClip
    import org.apache.spark.sql.types.{LongType, StringType}
    import scala.collection.immutable.ArraySeq
    val t = AttributeReference("text", StringType)()
    val id = AttributeReference("doc_id", LongType)()
    val h1 = Array[Byte](1, 2, 3, 4)
    val h2 = Array[Byte](1, 2, 3, 4) // equal content, distinct identity
    val a = WavFixtureClip(t, id, ArraySeq.unsafeWrapArray(h1), 5, "#p", false, 7, 16)
    val b = WavFixtureClip(t, id, ArraySeq.unsafeWrapArray(h2), 5, "#p", false, 7, 16)
    assert(a == b && a.semanticEquals(b) && a.hashCode == b.hashCode)

    // and the Column builder defensively clones, so later caller mutation
    // of the source array can't reach an already-built expression
    val header = Array[Byte](82, 73, 70, 70)
    val clip = org.apache.spark.sql.graftbridge.wavFixtureClip(
      lit("x"), col("doc_id"), header, 2, "#p", false, 7, 16)
    val bytesBefore = Seq(1L).toDF("doc_id").select(clip.as("p"))
      .head().getAs[Array[Byte]](0)
    header(0) = 99
    val bytesAfter = Seq(1L).toDF("doc_id").select(clip.as("p"))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(bytesBefore, bytesAfter) && bytesBefore(0) == 82)
  }

  test("a hostile seed (quotes, backslashes) survives codegen unaltered") {
    // The seed reaches generated Java via addReferenceObj, not source
    // splicing — a seed containing `"` or `\` must produce the same bytes
    // as the direct object call, not a Janino parse error (or silently
    // different frames).
    val seed = "a\"b\\c\nd"
    val header = Array[Byte](82, 73, 70, 70)
    val got = Seq(("x", 3L)).toDF("text", "doc_id")
      .select(org.apache.spark.sql.graftbridge.wavFixtureClip(
        col("text"), col("doc_id"), header, 4, seed, true, 7, 16).as("p"))
      .head().getAs[Array[Byte]](0)
    val want = org.apache.spark.sql.graftbridge.WavFixtureClip.clip(
      org.apache.spark.unsafe.types.UTF8String.fromString("x"), 3L,
      header, 4, seed, true, 7, 16)
    assert(java.util.Arrays.equals(got, want))
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

  test("audio near-dup family: every in-budget planted clone is recovered") {
    // The kernel's guarantee is recall for hamming <= maxHamming (3): four
    // 15-bit bands pigeonhole any <=3-bit difference into one exact band.
    // A clone with n_pert=3 can legitimately reach hamming 6 — dedupAudio-
    // Precision's own docstring calls those the honest misses — so the
    // expected recovery count comes from the MEASURED signature hammings,
    // not from assuming zero misses (which is fixture-data-dependent).
    val sigs = Multimodal.audioSignatures(spark, sfDir)
    val orig = sigs.filter(col("doc_id") < 20000000L)
    val clones = sigs.filter(col("doc_id") >= 20000000L)
      .select((col("doc_id") - 20000000L).as("doc_id"), col("w0").as("cw0"))
    val hams = orig.join(clones, "doc_id")
      .select(bit_count(col("w0").bitwiseXOR(col("cw0"))).as("h"))
    val nPlantedAll = hams.count()
    val nInBudget = hams.filter(col("h") <= 3).count()

    val r = Multimodal.dedupAudioPrecision(spark, sfDir).head()
    val (cand, planted, both) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(planted == nPlantedAll && nInBudget > 0)
    assert(both == nInBudget,
      s"in-budget planted $nInBudget, found $both — recall must be exact for hamming <= 3")
    assert(cand >= both)
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

  test("clearFingerprintCache releases the families' persisted artifacts") {
    // fpShared persists one relation per (dir, tag) for the session's
    // lifetime; the explicit hook must unpersist AND forget them (a
    // long-lived session otherwise accumulates dead cached relations).
    // Assert on the cache's OWN entries, not the global persistent-RDD
    // count — concurrently running suites persist/unpersist relations on
    // the shared session and would make a global-count comparison flaky.
    Multimodal.dedupAudio(spark, sfDir).head() // populate sigs + pairs
    val held = RelCache.entries(spark, "mm/")
    assert(held.nonEmpty)
    assert(held.forall(_._3.storageLevel.useMemory),
      "cached fingerprint relations must be persisted while held")
    Multimodal.clearFingerprintCache(spark)
    // a concurrent suite may repopulate with NEW relations after the
    // clear; the contract is that the relations held BEFORE are gone
    val after = RelCache.entries(spark, "mm/").map(_._3)
    assert(held.forall(h => !after.exists(_ eq h._3)),
      "clear hook must forget the cached fingerprint relations")
    assert(held.forall(_._3.storageLevel == org.apache.spark.storage.StorageLevel.NONE),
      "clear hook must unpersist the cached fingerprint relations")
    // and the cache rebuilds transparently on next access
    assert(Multimodal.dedupAudio(spark, sfDir).count() > 0)
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
