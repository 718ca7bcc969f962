package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Behavioral checks for the pipeline extension operators (dedup, similarity,
  * text analysis, multimodal) beyond the driver's DuckDB oracle: semantic
  * properties the oracle can't express (sketch recall, stub/expression
  * equivalence, known-answer fixtures).
  */
class ExtensionOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sfDir = SparkTestSession.sfDir

  test("exact dedup counts duplicates (known-answer fixture)") {
    val df = Seq(
      (1L, "alpha beta gamma", "en", "web", 16L),
      (2L, "alpha beta gamma", "en", "web", 16L),
      (3L, "something else entirely", "en", "web", 23L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    df.createOrReplaceTempView("ext_fixture_docs")
    val stats = df.groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), countDistinct(md5(col("text"))).as("u"))
      .head()
    assert(stats.getLong(1) == 3 && stats.getLong(2) == 2)
  }

  test("minhash LSH finds exact and near duplicates, skips unrelated docs") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val near = (1 to 58).map(i => s"tok$i").mkString(" ") + " xnova ynova"
    val other = (1 to 60).map(i => s"zzz$i").mkString(" ")
    val docs = Seq(
      (10L, base), (11L, base), (12L, near), (20L, other)
    ).toDF("doc_id", "text")
    // route through the same machinery as the catalog query via a temp dir
    val dir = java.nio.file.Files.createTempDirectory("mh").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = Dedup.dedupMinhashLsh(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    assert(pairs.exists { case (a, b, e) => a == 10 && b == 11 && e == 1.0 }, s"exact dup pair missing: $pairs")
    assert(pairs.exists { case (a, b, e) => Set(a, b).subsetOf(Set(10L, 11L, 12L)) && a == 10 && b == 12 && e > 0.6 },
      s"near dup pair missing: $pairs")
    assert(!pairs.exists { case (a, b, _) => a == 20 || b == 20 }, s"unrelated doc paired: $pairs")
  }

  test("incremental dedup: incoming near-dups of the index match, fresh docs pass through") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val near = (1 to 58).map(i => s"tok$i").mkString(" ") + " xnova ynova"
    val fresh = (1 to 60).map(i => s"zzz$i").mkString(" ")
    // even ids = existing index, odd ids = incoming delta
    val docs = Seq(
      (2L, base), (4L, (1 to 60).map(i => s"other$i").mkString(" ")), // index
      (3L, base), (5L, near), (7L, fresh) // delta: exact dup, near dup, fresh
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("incdd").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Dedup.dedupIncremental(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(out.forall { case (d, m, _) => d % 2 == 1 && m % 2 == 0 },
      s"incremental output must map incoming (odd) to index (even): $out")
    assert(out.exists { case (d, m, _) => d == 3 && m == 2 }, s"exact dup not matched: $out")
    assert(out.exists { case (d, m, _) => d == 5 && m == 2 }, s"near dup not matched: $out")
    assert(!out.exists(_._1 == 7), s"fresh doc falsely matched: $out")
  }

  test("incremental dedup against a PERSISTED signature index equals the inline computation") {
    val dir = java.nio.file.Files.createTempDirectory("incidx").toString
    // real corpus slice as the fixture
    val d = "/root/testdata/sf0.001"
    val inline = Dedup.dedupIncremental(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // production shape: the existing side's SIGNATURES are written once and
    // probed from disk — no recompute of the index corpus at probe time
    Dedup.minhashSignatures(spark, d)
      .filter(col("doc_id") % 2 === 0)
      .write.mode("overwrite").parquet(s"$dir/sig_index.parquet")
    val fromIndex = Dedup.incrementalMatches(
      Dedup.mhBands(Dedup.minhashSignatures(spark, d).filter(col("doc_id") % 2 === 1)),
      Dedup.mhBands(spark.read.parquet(s"$dir/sig_index.parquet"))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(inline.nonEmpty, "fixture produced no incremental matches — spec is vacuous")
    assert(fromIndex == inline,
      s"persisted-index probe diverges from inline: ${fromIndex.diff(inline)} / ${inline.diff(fromIndex)}")
  }

  test("PII scrub counts exactly the planted PII and redacts it from the output") {
    val docs = (0L until 15L).map(i => (i, "plain clean words only"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("pii").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextAnalysis.piiScrub(spark, dir).head()
    val ids = 0L until 15L
    assert(r.getAs[Long]("n_emails") == ids.count(_ % 3 == 0))
    assert(r.getAs[Long]("n_phones") == ids.count(_ % 5 == 0))
    assert(r.getAs[Long]("n_ips") == ids.count(_ % 7 == 0))
    assert(r.getAs[Long]("n_clean") == ids.count(i => i % 3 != 0 && i % 5 != 0 && i % 7 != 0))
    // redaction happened: scrubbed output must not be longer than raw with
    // every email replaced (emails are the longest planted tokens)
    assert(r.getAs[Long]("scrubbed_chars") > 0)
  }

  test("HTML strip recovers exactly the wrapped text plus decoded boilerplate (known answer)") {
    val docs = Seq((0L, "hello world")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("html").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextAnalysis.htmlStrip(spark, dir).head()
    val expected = "Doc 0 hello world (c) 2024 Example Corp & Partners"
    val md = java.security.MessageDigest.getInstance("MD5")
    val expectedHash = md.digest(expected.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r.getAs[Int]("clean_len") == expected.length,
      s"clean_len ${r.getAs[Int]("clean_len")} != ${expected.length}")
    assert(r.getAs[String]("clean_hash") == expectedHash,
      "stripped text differs from the known answer (script content leaked or entities undecoded)")
  }

  test("native SimhashBits equals the explode + 60-column-aggregate formulation on real corpus data") {
    val d = "/root/testdata/sf0.001"
    val native = Dedup.simhashSignatures(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val viaExplode = Dedup.simhashSignaturesViaExplode(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(native.nonEmpty && native == viaExplode,
      s"native/explode simhash divergence on ${native.keySet.diff(viaExplode.keySet)} / value diffs: ${
        native.collect { case (k, v) if viaExplode.get(k).exists(_ != v) => k }.take(5)}")
  }

  test("SimhashBits agrees between codegen and interpreted evaluation, and on edge tokens") {
    import org.apache.spark.sql.graftbridge
    val df = Seq(
      (1L, Seq("alpha", "beta", "alpha")),
      (2L, Seq("")),                      // empty-string token still hashes
      (3L, Seq("单字", "øü", "a b"))       // multi-byte UTF-8, space inside token
    ).toDF("id", "toks")
    val fromExpr = df.select(col("id"), graftbridge.simhashBits(col("toks")).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // interpreted path: force eval through the expression directly
    val interp = df.collect().map { r =>
      val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        r.getSeq[String](1).map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray)
      (r.getLong(0), org.apache.spark.sql.graftbridge.SimhashBits.simhash(arr))
    }.toMap
    assert(fromExpr == interp)
    // and the oracle-contract arithmetic for a known token: the 60-bit hash
    // of a single-token doc IS its signature (sign of +/-1 per bit = the bit)
    val single = Seq((9L, Seq("alpha"))).toDF("id", "toks")
      .select(graftbridge.simhashBits(col("toks"))).head().getLong(0)
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("alpha".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
    assert(single == java.lang.Long.parseLong(hex, 16))
  }

  test("simhash: identical docs hamming 0, unrelated docs never within threshold") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, base), (2L, base), (3L, (1 to 40).map(i => s"q${i}x").mkString(" ")))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("sh").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = Dedup.dedupSimhash(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toList
    assert(pairs.contains((1L, 2L, 0)), s"identical pair should have hamming 0: $pairs")
  }

  test("brute-force ANN: an exact duplicate vector is its own top-1 neighbor with sim ~ 1") {
    val top1 = Similarity.annBruteforce(spark, sfDir)
      .filter(col("rnk") === 1).collect()
    assert(top1.length == 50)
    // planted duplicate embeddings exist in the testdata; at minimum cosine is in [-1, 1]
    top1.foreach(r => assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-12))
  }

  test("LSH ANN agrees with brute force on returned queries (same-bucket top-1 is a true neighbor)") {
    val bf = Similarity.annBruteforce(spark, sfDir)
      .filter(col("rnk") === 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val lsh = Similarity.annLsh(spark, sfDir)
      .filter(col("q_id") < 50).collect()
    lsh.foreach { r =>
      val q = r.getLong(0); val sim = r.getDouble(2)
      bf.get(q).foreach(best => assert(sim <= best + 1e-12, s"LSH sim beats exact best for q=$q"))
    }
  }

  test("IVF ANN: deterministic training, answers never beat the exact best, decent recall") {
    val bf = Similarity.annBruteforce(spark, sfDir)
      .filter(col("rnk") === 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    val ivf = Similarity.annIvf(spark, sfDir)
      .filter(col("q_id") < 50).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    ivf.foreach { case (q, (_, sim)) =>
      assert(sim <= bf(q)._2 + 1e-12, s"IVF beats exact best for q=$q")
    }
    // recall: the probed-bucket search should find the TRUE top-1 for a
    // reasonable fraction of queries (data-adaptive buckets beat random)
    val hits = ivf.count { case (q, (nn, _)) => bf.get(q).exists(_._1 == nn) }
    assert(ivf.nonEmpty && hits >= ivf.size / 4, s"IVF recall too low: $hits/${ivf.size}")
    // determinism: training twice yields identical centroids
    // uncached on purpose: the memoized entry point would trivially return
    // the same array; this asserts the TRAINING is deterministic
    val c1 = Similarity.trainIvfCentroidsUncached(spark, sfDir)
    val c2 = Similarity.trainIvfCentroidsUncached(spark, sfDir)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
    // sample-based training: the Lloyd passes read a strict, deterministic
    // LCG hash-subset of the corpus (the 100 TB training shape), filtered
    // in-plan — not the full vector table
    val train = Similarity.ivfTrainSet(spark, sfDir)
    val m = train.count()
    val full = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    assert(m > 0 && m < full, s"training sample $m of $full is not a strict subset")
    assert(train.queryExecution.executedPlan.toString.contains("1103515245"),
      "LCG sample filter missing from the training plan")
  }

  test("multimodal: mapPartitions stub decode == expression-only fast path") {
    val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 300)
    val viaRdd = Multimodal.withDecodedMeta(docs, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val viaExpr = Multimodal.multimodalMeta(spark, sfDir)
      .orderBy("doc_id").collect().toSeq
    assert(viaRdd.map(_.toSeq) == viaExpr.map(_.toSeq))
  }

  test("native DotProduct expression is bit-identical to the HOF fold it replaced") {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val pairs = emb.as("a").crossJoin(emb.as("b")).limit(20000)
    val neq = pairs.select(
      (Similarity.dot(col("a.v"), col("b.v")) =!= Similarity.dotHof(col("a.v"), col("b.v")))
        .cast("int").as("neq"))
      .agg(sum(col("neq"))).head().getLong(0)
    assert(neq == 0)
  }

  test("native SortedIntersectCount equals size(array_intersect) on sorted distinct arrays") {
    val df = Seq(
      (Seq("a", "b", "c", "d"), Seq("b", "c", "x")),
      (Seq("a"), Seq("z")),
      (Seq[String](), Seq("a", "b")),
      (Seq("m", "n"), Seq("m", "n"))
    ).toDF("x", "y")
    val neq = df.select(
      (org.apache.spark.sql.graftbridge.sortedIntersectCount(col("x"), col("y"))
        =!= size(array_intersect(col("x"), col("y")))).cast("int").as("neq"))
      .agg(sum(col("neq"))).head().getLong(0)
    assert(neq == 0)
  }

  test("token count handles multi-space and empty-ish text") {
    val df = Seq((1L, "a  b   c"), (2L, "single"), (3L, "  padded  ")).toDF("doc_id", "text")
    val counts = df.select(col("doc_id"), TextAnalysis.tokenCountCol(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(counts == Map(1L -> 3, 2L -> 1, 3L -> 1))
  }

  test("language id picks the marker-majority language deterministically") {
    val df = Seq(
      (1L, "the cat sat on the mat", "en"),
      (2L, "der hund und der mann", "de"),
      (3L, "xyz abc qqq", "zz")
    ).toDF("doc_id", "text", "lang")
    val dir = java.nio.file.Files.createTempDirectory("li").toString
    df.withColumn("source", lit("t")).withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.langId(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out.contains(("en", "en")) && out.contains(("de", "de")) && out.contains(("zz", "und")))
  }

  test("native expressions agree between codegen and interpreted evaluation") {
    import spark.implicits._
    import org.apache.spark.sql.graftbridge.{dotProduct, sortedIntersectCount, tokenCount}
    val df = Seq(
      (Seq(1.0, 2.5, -3.0), Seq(0.5, -1.0, 4.0), Seq("a", "c", "x"), Seq("b", "c", "x"), " a  b\tc "),
      (Seq.empty[Double], Seq(1.0), Seq.empty[String], Seq("z"), ""))
      .toDF("va", "vb", "sa", "sb", "txt")
    def run(): Seq[(Double, Int, Int)] = df.select(
      dotProduct(col("va"), col("vb")).as("d"),
      sortedIntersectCount(col("sa"), col("sb")).as("i"),
      tokenCount(col("txt")).as("t"))
      .collect().toSeq.map(r => (r.getDouble(0), r.getInt(1), r.getInt(2)))
    val codegen = run()
    val saved = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val interpreted = run()
      assert(codegen == interpreted, s"$codegen vs $interpreted")
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      saved match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
    assert(codegen.head == (((1.0 * 0.5) + (2.5 * -1.0) + (-3.0 * 4.0), 2, 3)))
    assert(codegen(1) == ((0.0, 0, 0)))
  }

  test("NearestCentroid: ties to lowest index, codegen == interpreted, == HOF formulation") {
    import spark.implicits._
    import org.apache.spark.sql.graftbridge.nearestCentroid
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0), Array(1.0, 0.0)) // 2 ties with 0
    val df = Seq(
      Seq(2.0, 1.0),   // nearest = 0 (tie with 2 -> lowest index wins)
      Seq(0.0, 3.0),   // nearest = 1
      Seq(-1.0, -2.0), // sims (-1,-2,-1): all negative, first max -> 0
      Seq.empty[Double] // all sims 0.0 -> ties -> 0
    ).toDF("v")
    def run(): Seq[Int] =
      df.select(nearestCentroid(col("v"), cents).as("c")).collect().toSeq.map(_.getInt(0))
    val codegen = run()
    assert(codegen == Seq(0, 1, 0, 0))
    val saved = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      assert(run() == codegen)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      saved match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
    // parity with the retained HOF formulation on REAL embeddings at a
    // trivial and a non-trivial k (the auto-k regime)
    for (k <- Seq(16, 20)) {
      val cs = Similarity.trainIvfCentroids(spark, SparkTestSession.sfDir, k)
      val vecs = Tables.embeddings(spark, SparkTestSession.sfDir)
        .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
      val native = vecs.select(col("vec_id"), nearestCentroid(col("v"), cs).as("c"))
      val viaHof = vecs.select(col("vec_id"), Similarity.assignClusterViaHof(col("v"), cs).as("c"))
      assert(native.exceptAll(viaHof).count() == 0 &&
        viaHof.exceptAll(native).count() == 0, s"k=$k diverged")
    }
  }

  test("IVF knn vote: every query with candidates votes once; accuracy tracks brute force") {
    def tally(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(sum(col("n")),
        sum(when(col("true_label") === col("predicted"), col("n")).otherwise(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    val (bTot, bCor) = tally(Similarity.knnLabelVote(spark, SparkTestSession.sfDir))
    val (iTot, iCor) = tally(Similarity.knnLabelVoteIvf(spark, SparkTestSession.sfDir))
    assert(bTot == 200, "brute force votes every query")
    // a probed query can only miss a vote if its NPROBE clusters hold no
    // other vector — never on this fixture (500 vectors / 16 clusters)
    assert(iTot == 200, s"IVF voted $iTot of 200")
    // random-label fixture: both sit near the 1/|labels| baseline; the
    // index must not systematically diverge from the exact eval
    assert(math.abs(iCor - bCor) <= 20, s"IVF $iCor vs brute $bCor correct")
  }

  test("LshBuckets equals the per-plane sign-bit formulation, codegen and interpreted") {
    import spark.implicits._
    import org.apache.spark.sql.graftbridge.lshBuckets
    // 2 tables × 2 bits over dim-2 vectors; float input like the embeddings table
    val planes = Array(Array(1.0, -0.5), Array(-1.0, 0.25), Array(0.5, 0.5), Array(-0.25, 1.0))
    val df = Seq((1L, Seq(0.5f, 1.0f)), (2L, Seq(-1.0f, 0.25f)), (3L, Seq(0.0f, 0.0f)))
      .toDF("id", "emb")
    def run(): Map[Long, Seq[Long]] =
      df.select(col("id"), lshBuckets(col("emb"), planes, 2).as("b"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val codegen = run()
    val expected = df.collect().map { r =>
      val v = r.getSeq[Float](1).map(_.toDouble)
      r.getLong(0) -> (0 until 2).map { t =>
        (0 until 2).map { j =>
          val acc = v.zip(planes(t * 2 + j)).map { case (x, y) => x * y }.sum
          if (acc > 0) 1L << j else 0L
        }.sum
      }
    }.toMap
    assert(codegen == expected, s"$codegen vs $expected")
    assert(codegen(3L) == Seq(0L, 0L)) // zero vector: no positive sims
    val saved = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      assert(run() == codegen)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      saved match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }

  test("native TokenCount equals the regexp \\S+ idiom on adversarial inputs") {
    import spark.implicits._
    val hand = Seq(
      "", " ", "a", " a", "a ", "  a  b  ", "\t\n\f\r", "a\tb\nc",
      "héllo wörld", "日本語 テスト",
      "a b", // nbsp is NOT Java \s: stays one token
      "x" * 1000, ("y " * 500).trim)
    val rng = new scala.util.Random(42)
    val alphabet = "ab \t\n\r\fé中 "
    val fuzz = Seq.fill(200)(Seq.fill(rng.nextInt(40))(alphabet(rng.nextInt(alphabet.length))).mkString)
    val rows = (hand ++ fuzz).toDF("s")
      .select(
        org.apache.spark.sql.graftbridge.tokenCount(col("s")).as("fast"),
        size(regexp_extract_all(col("s"), lit("\\S+"), lit(0))).as("ref"))
      .collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
  }

  test("PNG header parse: real PNG bytes yield true dimensions via pure column expressions") {
    import spark.implicits._
    // A REAL (truncated) PNG: 8-byte signature, IHDR length, 'IHDR' tag,
    // then big-endian width=320, height=200.
    def png(w: Int, h: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(24)
      bb.put(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
      bb.putInt(13).put("IHDR".getBytes("US-ASCII")).putInt(w).putInt(h)
      bb.array()
    }
    val df = Seq(
      (1L, png(320, 200)), (2L, png(1, 1)), (3L, png(65535, 4096)),
      (4L, "not a png at all..........".getBytes("US-ASCII"))
    ).toDF("id", "payload")
    val parsed = df.select(col("id"), Multimodal.isPng(col("payload")).as("ok"),
        Multimodal.pngWidth(col("payload")).as("w"), Multimodal.pngHeight(col("payload")).as("h"))
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getInt(2), r.getInt(3))).toMap
    assert(parsed(1L) == ((true, 320, 200)))
    assert(parsed(2L) == ((true, 1, 1)))
    assert(parsed(3L) == ((true, 65535, 4096)))
    assert(!parsed(4L)._1)
  }

  test("WAV header fields parse from real canonical PCM bytes; non-WAV rejected") {
    import spark.implicits._
    /** Canonical 44-byte PCM WAV header + silence. */
    def wav(channels: Int, rate: Int, bits: Int, dataBytes: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(44 + dataBytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(channels.toShort).putInt(rate)
        .putInt(rate * channels * bits / 8).putShort((channels * bits / 8).toShort)
        .putShort(bits.toShort)
        .put("data".getBytes("US-ASCII")).putInt(dataBytes)
      bb.array()
    }
    /** Valid WAV with an 18-byte EXTENDED fmt chunk: 'data' sits at offset
      * 39, not the canonical 37 — the fixed-offset readers would return
      * garbage, so the gate must reject it. */
    def wavExtFmt(channels: Int, rate: Int, bits: Int, dataBytes: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(46 + dataBytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(38 + dataBytes)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(18)
        .putShort(1).putShort(channels.toShort).putInt(rate)
        .putInt(rate * channels * bits / 8).putShort((channels * bits / 8).toShort)
        .putShort(bits.toShort).putShort(0) // cbSize = 0 extension
        .put("data".getBytes("US-ASCII")).putInt(dataBytes)
      bb.array()
    }
    val df = Seq(
      (1L, wav(1, 16000, 16, 32000)),  // 1 s mono 16 kHz
      (2L, wav(2, 44100, 16, 176400)), // 1 s stereo CD rate
      (3L, "RIFFbut not actually wave data......".getBytes("US-ASCII")),
      (4L, wavExtFmt(1, 16000, 16, 100)) // magics pass; 'data' off-canon
    ).toDF("id", "payload")
    val parsed = df.select(col("id"),
        Multimodal.isWav(col("payload")).as("ok"),
        Multimodal.wavChannels(col("payload")).as("ch"),
        Multimodal.wavSampleRate(col("payload")).as("sr"),
        Multimodal.wavBitsPerSample(col("payload")).as("bits"),
        Multimodal.wavDurationMs(col("payload")).as("ms"))
      .collect().map { r =>
        val fields = if (r.getBoolean(1))
          Some((r.getInt(2), r.getInt(3), r.getInt(4), r.getLong(5))) else None
        r.getLong(0) -> (r.getBoolean(1), fields)
      }.toMap
    assert(parsed(1L) == ((true, Some((1, 16000, 16, 1000L)))))
    assert(parsed(2L) == ((true, Some((2, 44100, 16, 1000L)))))
    assert(!parsed(3L)._1) // truncated payload: fields are NULL, gate is false
    // non-canonical layout must FAIL the gate rather than mis-parse: with
    // the extended fmt chunk the old magic-only gate passed this file while
    // the offset-41 "data size" read landed inside the data tag itself
    assert(!parsed(4L)._1)
  }

  test("aspect-fit resize targets and frame-sample indices are exact") {
    import spark.implicits._
    val df = Seq((1920, 1080), (100, 400), (50, 50), (542, 2)).toDF("w", "h")
    val fits = df.select(Multimodal.fitWithin(col("w"), col("h"), 224, 224).as("fit"))
      .select(col("fit.w"), col("fit.h"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    // downscale keeps aspect; already-small images are not upscaled; an
    // extreme aspect ratio clamps its short axis to 1 instead of a
    // 0-pixel target (floor(2 * 224/542) would be 0)
    assert(fits == Set((224, 126), (56, 224), (50, 50), (224, 1)))

    val frames = Seq(10, 3).toDF("n")
      .select(Multimodal.frameSampleIndices(col("n"), 4).as("idx"))
      .collect().map(_.getSeq[Int](0)).toSet
    assert(frames == Set(Seq(0, 2, 5, 7), Seq(0, 0, 1, 2)))
  }

  test("x_resize_plan: targets fit the box, never upscale, and keep aspect within rounding") {
    val rows = Multimodal.resizePlan(spark, SparkTestSession.sfDir)
      .collect().map(r => (r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (w, h, fw, fh) =>
      assert(fw <= 224 && fh <= 224, s"($w,$h)->($fw,$fh) exceeds the box")
      assert(fw >= 1 && fh >= 1, s"($w,$h)->($fw,$fh) has a zero-pixel axis")
      assert(fw <= w && fh <= h, s"($w,$h)->($fw,$fh) upscaled")
      // floor(scale*dim) keeps the aspect ratio within one pixel per axis,
      // with the short axis clamped to 1
      val scale = math.min(1.0, math.min(224.0 / w, 224.0 / h))
      assert(fw == math.max(1, math.floor(w * scale).toInt) &&
        fh == math.max(1, math.floor(h * scale).toInt))
    }
  }

  test("JPEG SOF parse: real segment streams yield true dimensions; malformed reject") {
    import spark.implicits._
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // canonical baseline JFIF: SOI, APP0 (JFIF\0 header, 16 bytes),
    // COM (5 bytes), DQT (4-byte stub), SOF0 at a non-trivial offset
    val baseline = bytes(0xFF, 0xD8,
      0xFF, 0xE0, 0x00, 0x10, 'J', 'F', 'I', 'F', 0x00, 0x01, 0x02, 0x00,
      0x00, 0x01, 0x00, 0x01, 0x00, 0x00,
      0xFF, 0xFE, 0x00, 0x05, 'h', 'i', '!',
      0xFF, 0xDB, 0x00, 0x04, 0x00, 0x01,
      0xFF, 0xC0, 0x00, 0x11, 0x08, 0x01, 0xE0, 0x02, 0x80, 0x03, // 640x480
      0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01)
    // progressive: same stream with SOF2 and different dims (31x17)
    val progressive = bytes(0xFF, 0xD8,
      0xFF, 0xFE, 0x00, 0x04, 'o', 'k',
      0xFF, 0xC2, 0x00, 0x11, 0x08, 0x00, 0x11, 0x00, 0x1F, 0x01, 0x01, 0x22, 0x00)
    // SOS before any SOF (entropy data begins): must reject, not mis-read
    val sosFirst = bytes(0xFF, 0xD8, 0xFF, 0xDA, 0x00, 0x04, 0x01, 0x00, 0xAB, 0xCD)
    // truncated mid-segment and a non-JPEG payload
    val truncated = bytes(0xFF, 0xD8, 0xFF, 0xE0, 0x00)
    val notJpeg = bytes(0x89, 0x50, 0x4E, 0x47)
    // truncated INSIDE the SOF payload, ending with exactly ONE byte of
    // the width u16 present: a naive 1-byte read would report that byte's
    // 0-255 value as the width (and the already-complete height as 480) —
    // the truncate-rejects contract demands (None, None)
    val sofCut = bytes(0xFF, 0xD8,
      0xFF, 0xC0, 0x00, 0x11, 0x08, 0x01, 0xE0, 0x02)
    val df = Seq(
      (1L, baseline), (2L, progressive), (3L, sosFirst), (4L, truncated),
      (5L, notJpeg), (6L, sofCut)
    ).toDF("id", "payload")
    val got = df.select(col("id"),
        Multimodal.isJpeg(col("payload")).as("ok"),
        Multimodal.jpegWidth(col("payload")).as("w"),
        Multimodal.jpegHeight(col("payload")).as("h"))
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(got(1L) == ((true, Some(640), Some(480))))
    assert(got(2L) == ((true, Some(31), Some(17))))
    assert(got(3L) == ((true, None, None)), "SOS-first stream must parse as no-SOF")
    assert(got(4L) == ((true, None, None)), "truncated stream must parse as no-SOF")
    assert(got(5L) == ((false, None, None)))
    assert(got(6L) == ((true, None, None)),
      "stream cut inside the SOF payload must reject, not half-size")
  }

  test("JPEG SOF parse: EVERY truncation point is all-or-nothing") {
    import spark.implicits._
    // The exhaustive form of the sofCut case: cutting the canonical
    // baseline stream at every byte offset must yield either a full
    // (640, 480) parse or a clean double reject — one surviving dimension
    // at ANY cut point would half-size a rejected frame. This pins the
    // finish-lambda emission (the walk's fields are read together from one
    // evaluated accumulator) against every truncation, not one crafted cut.
    val full = Seq(0xFF, 0xD8,
      0xFF, 0xE0, 0x00, 0x10, 'J'.toInt, 'F'.toInt, 'I'.toInt, 'F'.toInt,
      0x00, 0x01, 0x02, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00,
      0xFF, 0xFE, 0x00, 0x05, 'h'.toInt, 'i'.toInt, '!'.toInt,
      0xFF, 0xDB, 0x00, 0x04, 0x00, 0x01,
      0xFF, 0xC0, 0x00, 0x11, 0x08, 0x01, 0xE0, 0x02, 0x80, 0x03,
      0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01).map(_.toByte)
    val cuts = (0 to full.length).map(n => (n.toLong, full.take(n).toArray))
    val got = cuts.toDF("cut", "payload")
      .select(col("cut"), Multimodal.jpegDims(col("payload")).as("d"))
      .select(col("cut"), col("d.w"), col("d.h"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    got.foreach { case (cut, (w, h)) =>
      assert((w == -1 && h == -1) || (w == 640 && h == 480),
        s"cut at $cut half-reported ($w, $h)")
    }
    assert(got(full.length.toLong) == ((640, 480)), "the full stream must parse")
    // Some prefix long enough to contain the complete SOF dims already
    // parses (the walk does not demand trailing segments)...
    assert(got.exists { case (cut, wh) => cut < full.length && wh == ((640, 480)) })
    // ...and everything cut before the height u16 completes rejects.
    (0L to 40L).foreach(cut => assert(got(cut) == ((-1, -1))))
  }

  test("image dHash: clone damage is bounded by 2 bits per perturbed pixel") {
    // Each +16 pixel bump touches at most its left and right comparisons,
    // so hamming(orig, clone) <= 2 * n_pert — the locality property that
    // makes a difference hash a PERCEPTUAL hash.
    val sigs = Multimodal.imageSignatures(spark, SparkTestSession.sfDir)
    val orig = sigs.filter(col("doc_id") < 10000000L)
    val clones = sigs.filter(col("doc_id") >= 10000000L)
      .select((col("doc_id") - 10000000L).as("doc_id"), col("w0").as("cw0"))
    val rows = orig.join(clones, "doc_id")
      .select(col("doc_id"),
        bit_count(col("w0").bitwiseXOR(col("cw0"))).as("hamming"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, ham) =>
      val nPert = (id / 5) % 4
      assert(ham <= 2 * nPert, s"doc $id: hamming $ham > ${2 * nPert}")
    }
    // n_pert = 0 clones are bit-identical
    assert(rows.filter { case (id, _) => (id / 5) % 4 == 0 }.forall(_._2 == 0))
  }

  test("image near-dup family: every planted clone is recovered on the fixture") {
    val r = Multimodal.dedupImagePrecision(spark, SparkTestSession.sfDir).head()
    val (cand, planted, both) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(planted > 0 && both == planted,
      s"planted $planted, found $both — a clone exceeded the banding budget")
    assert(cand >= planted)
  }
}
