package graft.examples

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.chunker.{BatchChunker, ChunkedRewrite, ChunkerConfig}

/** Executable documentation: every snippet in USAGE.md runs here verbatim
  * (modulo tempdir plumbing and fast test knobs), so the guide can never
  * drift from the API. Example 1 mirrors the reference's own
  * examples/basic.pl:21-31 — construct-and-execute a chunked delete with
  * runtime targeting and progress — re-expressed over immutable storage.
  */
class ExamplesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("example 1: the reference's basic.pl — chunked DELETE with runtime targeting") {
    val dir = tmp("ex-basic")
    (1L to 1000L).map(i => (i, s"track_$i", i % 7))
      .toDF("trackid", "title", "disc")
      .write.parquet(s"$dir/tracks")
    val tracks = spark.read.parquet(s"$dir/tracks")

    // examples/basic.pl: chunk_size 3, target_time 5, sleep 1, coderef =
    // sub { $_[1]->delete }. Here: the adaptive loop sizes chunks toward
    // targetTime, sleeps between chunks, and DELETE over immutable parquet
    // is the per-chunk anti-filter copy-on-write with atomic commit.
    // (Test knobs: targetTime/sleep 0 so the suite stays fast.)
    val cfg = ChunkerConfig(
      chunkSize = BigInt(100), targetTime = 0, sleep = 0,
      progressName = "Deleting tracks", log = _ => ())
    ChunkedRewrite.rewrite(tracks, "trackid", cfg, s"$dir/out")(
      _.filter(col("disc") =!= 0)) // delete every disc-0 track
    val remaining = ChunkedRewrite.readBackCommitted(spark, s"$dir/out")
    assert(remaining.count() == tracks.filter(col("disc") =!= 0).count())
  }

  test("example 2: per-chunk action over a big table (the execute loop directly)") {
    val dir = tmp("ex-action")
    (1L to 500L).map(i => (i, i * 2.0)).toDF("id", "amount")
      .write.parquet(s"$dir/payments")
    val payments = spark.read.parquet(s"$dir/payments")

    val bc = new BatchChunker(payments, "id",
      ChunkerConfig(chunkSize = BigInt(128), sleep = 0, targetTime = 0, log = _ => ()))
    bc.calculateRanges()
    var chunks = 0; var rows = 0L
    val report = bc.foreachChunk { chunk =>
      // each chunk is an ordinary DataFrame pruned to its BETWEEN slice —
      // any Spark action works here (sink write, aggregate, export)
      chunks += 1; rows += chunk.count()
    }
    assert(rows == 500 && chunks == report.processed.size)
  }

  test("example 3: journaled exactly-once chunked DML against a live JDBC database") {
    val url = "jdbc:derby:memory:exdb;create=true"
    (1L to 300L).map(i => (i, 0L)).toDF("id", "hits")
      .write.mode("overwrite").jdbc(url, "accounts", new java.util.Properties)

    // Non-idempotent template + commit journal: retries, lost commit acks,
    // and cross-process restarts (even under adaptive sizing) apply each
    // chunk exactly once. A fresh runId marks a new logical run; re-using
    // one resumes it.
    graft.sources.JdbcBatch.executeChunkedDml(
      url = url,
      template = """UPDATE accounts SET "hits" = "hits" + 1 WHERE "id" BETWEEN {start} AND {end}""",
      idColumn = "id",
      rangeTable = "accounts",
      cfg = ChunkerConfig(chunkSize = BigInt(64), sleep = 0, targetTime = 0, log = _ => ()),
      commitLog = Some("accounts_journal"),
      runId = "monthly-2026-08")
    val hits = spark.read.jdbc(url, "accounts", new java.util.Properties)
    assert(hits.filter(col("hits") =!= 1).count() == 0) // every row exactly once
  }

  test("example 4: near-dup dedup pipeline — candidates, clusters, canonical survivors") {
    val dir = tmp("ex-dedup")
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    (Seq((0L, base), (1L, base + " extra"), (2L, "something else entirely " * 12)) ++
      (3L to 40L).map(i => (i, s"unique text number $i " * 10)))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("web"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$dir/documents.parquet")

    val clusters = graft.ops.Dedup.dedupClusters(spark, dir) // (doc_id, cluster_id, is_canonical)
    val keep = clusters.filter(col("is_canonical") === 1)
    assert(keep.count() < clusters.count()) // the near-dups 0/1 collapsed
    assert(clusters.filter(col("doc_id") === 1).head().getLong(1) == 0L) // 1 clusters under 0
  }

  test("example 6: a training-data pipeline — scrub, quality-gate, dedup, count the budget") {
    val d = "/root/testdata/sf0.001"
    // each stage is a declarative transform over the documents table; the
    // catalog entries (x_pii_scrub, x_quality_score, x_dedup_exact,
    // x_token_count, x_pack_bins, ...) are these stages run standalone
    val docs = graft.ops.Tables.documents(spark, d)
    val scrubbed = docs.withColumn("text",
      regexp_replace(col("text"), "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"))
    val quality = scrubbed.filter(
      graft.ops.TextAnalysis.tokenCountCol(col("text")) >= 10)
    val keep = quality
      .groupBy(graft.ops.TextAnalysis.fingerprintCol(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val corpus = quality.join(keep, "doc_id")
    val budget = corpus.agg(
      count(lit(1)).as("n_docs"),
      sum(graft.ops.TextAnalysis.tokenCountCol(col("text"))).as("n_tokens")).head()
    assert(budget.getLong(0) > 0 && budget.getLong(1) > budget.getLong(0))
    assert(corpus.count() <= docs.count())
  }

  test("example 5: similarity search — brute-force oracle now, bucketed ANN at scale") {
    val dir = tmp("ex-ann")
    val rnd = new scala.util.Random(7)
    (0L until 200L).map { i =>
      (i, Array.fill(64)(rnd.nextFloat()), (i % 3).toInt)
    }.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")

    val topk = graft.ops.Similarity.annBruteforce(spark, dir) // exact cosine top-k
    assert(topk.count() > 0)
    // the LSH/IVF variants answer the same question with bucketed candidate
    // generation — sub-linear probes at corpus scale:
    assert(graft.ops.Similarity.annLsh(spark, dir).count() > 0)
  }

  test("example 8: event analytics — funnel, retention, attribution, transitions") {
    import graft.ops.MoreQueries
    val dir = "/root/testdata/sf0.001"

    // conversion funnel: users surviving view -> later click -> later purchase
    val funnel = MoreQueries.qFunnelSteps(spark, dir) // (step, event_type, n_users)
    val steps = funnel.orderBy(col("step")).collect().map(_.getLong(2))
    assert(steps.length == 3 && steps(0) >= steps(1) && steps(1) >= steps(2),
      "a funnel can only narrow step to step")

    // day-N retention by first-seen cohort (offsets 0..7)
    val retention = MoreQueries.qRetentionCohort(spark, dir) // (cohort_day, day_offset, n_users)
    assert(retention.filter(col("day_offset") === 0).count() > 0)
    assert(retention.filter(col("day_offset") < 0 || col("day_offset") > 7).count() == 0)

    // last-touch attribution: each purchase credited to the most recent
    // prior view/click ('none' if the purchase leads the stream)
    val credit = MoreQueries.qAttributionLastTouch(spark, dir) // (touch_type, n_purchases)
    val totalPurchases = graft.ops.Tables.events(spark, dir)
      .filter(col("event_type") === "purchase").count()
    assert(credit.agg(sum(col("n_purchases"))).head().getLong(0) == totalPurchases,
      "attribution must tile the purchase set exactly")

    // first-order Markov transition counts between event types
    val matrix = MoreQueries.qEventTransitions(spark, dir) // (event_type, next_type, n)
    val nUsers = graft.ops.Tables.events(spark, dir).select(col("user_id")).distinct().count()
    val nEvents = graft.ops.Tables.events(spark, dir).count()
    assert(matrix.agg(sum(col("n"))).head().getLong(0) == nEvents - nUsers,
      "each user's k events yield exactly k-1 transitions")
  }

  test("example 9: the composed assembly pipelines emit balanced manifests") {
    val dir = "/root/testdata/sf0.001"

    // text: gate -> scrub -> split -> sample -> shard
    val shards = graft.ops.TextAnalysis.pipelineFull(spark, dir)
    assert(shards.count() > 0)
    assert(shards.agg(sum(col("n_docs"))).head().getLong(0) == 120L,
      "the stratified stage's 120-doc budget is hit exactly")

    // images: header gate -> near-dup drop -> resize plan -> pixel shards
    val batches = graft.ops.Multimodal.pipelineMultimodal(spark, dir)
    assert(batches.count() > 0)
    val docs = graft.ops.Tables.documents(spark, dir).count()
    val imgs = batches.agg(sum(col("n_images"))).head().getLong(0)
    assert(imgs < docs, "the gate and dedup must drop something")
  }

  test("example 10: day-2 operations — incremental probes, index artifacts, ensembles") {
    val dir = "/root/testdata/sf0.001"

    // batch delta-vs-index semantic probe: every reported match is a
    // delta (odd) vector matched to a canonical index (even) vector
    val dups = graft.ops.Similarity.dedupSemanticIncremental(spark, dir)
    assert(dups.count() > 0)
    dups.collect().foreach { r =>
      assert(r.getLong(0) % 2 == 1 && r.getLong(2) % 2 == 0)
    }

    // persisted index artifacts: probe-from-parquet equals build-in-job
    val fresh = graft.ops.Similarity.annIvfPq(spark, dir).collect()
    val loaded = graft.ops.Similarity.annIvfPqPersisted(spark, dir).collect()
    assert(loaded.map(_.toString).sorted.toSeq == fresh.map(_.toString).sorted.toSeq)

    // ensemble drop list: flags partition the union into the detector sets
    val ens = graft.ops.Similarity.dedupEnsemble(spark, dir)
    assert(ens.count() > 0)
    assert(ens.filter(col("via_lexical") === 0 && col("via_semantic") === 0).count() == 0)

    // paraphrase decontam: flagged vectors are corpus-side only
    val leaks = graft.ops.Similarity.decontamSemantic(spark, dir)
    assert(leaks.count() > 0)
    assert(leaks.filter(col("vec_id") < 50).count() == 0)

    // fingerprint modalities, same day-2 shape: arriving clips probe the
    // persisted envelope-fingerprint index — every match is delta-vs-index
    val clips = graft.ops.Multimodal.dedupAudioIncremental(spark, dir)
    assert(clips.count() > 0)
    assert(clips.filter(col("doc_id") < 20000000L || col("match_id") >= 20000000L)
      .count() == 0)
  }

  test("example 11: dataset versions — snapshot diff, delta probe, filtered search, sink maintenance") {
    val dir = "/root/testdata/sf0.001"

    // per-doc delta: only the three mutation classes leave the diff join,
    // each carrying the fixture's id law (added at +4e7, removed %10==7,
    // changed %10==3)
    val delta = graft.ops.TextAnalysis.datasetDiff(spark, dir)
    assert(delta.count() > 0)
    assert(delta.filter(col("status") === "unchanged").count() == 0,
      "diff output is delta-sized: unchanged rows never leave the join")
    delta.collect().foreach { r =>
      (r.getString(1), r.getLong(0)) match {
        case ("added", id)   => assert(id >= 40000000L)
        case ("removed", id) => assert(id % 10 == 7)
        case ("changed", id) => assert(id % 10 == 3)
        case (s, id)         => fail(s"unexpected status $s for $id")
      }
    }

    // the sign-off report accounts for the whole v1 corpus
    val report = graft.ops.TextAnalysis.datasetDiffStats(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val v1Count = graft.ops.Tables.documents(spark, dir).count()
    assert(report("unchanged") + report("removed") + report("changed") == v1Count)

    // admission probe: only changed docs (minor revisions) hit the v1
    // index; md5-fresh additions never do
    val admissions = graft.ops.TextAnalysis.diffDedupProbe(spark, dir)
    assert(admissions.count() > 0)
    admissions.collect().foreach { r =>
      assert(r.getLong(0) % 10 == 3 && r.getLong(0) < 40000000L)
    }

    // filtered vector search: every hit carries the predicate label —
    // the posting side was filtered BEFORE rerank, not top-k-starved
    val hits = graft.ops.Similarity.annIvfFiltered(spark, dir)
    val labels = graft.ops.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"))
    assert(hits.count() > 0)
    assert(hits.join(labels, hits("nn_id") === labels("vec_id"))
      .filter(col("label") =!= 1).count() == 0)
    assert(hits.filter(col("rnk") > 3).count() == 0)

    // sink maintenance: the stop-compact-resume lifecycle still tiles the
    // one-shot batch pair set (parity across the fold)
    val compacted = graft.ops.Dedup.dedupStreamCompacted(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val oneShot = graft.ops.Dedup.dedupMinhashLsh(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(compacted == oneShot)
  }

  test("example 12: corpus hygiene — keep-best canonicals, boilerplate scrub, per-source calibration, whitening") {
    val dir = "/root/testdata/sf0.001"

    // keep-BEST canonical selection: every emitted cluster is multi-doc,
    // keeps a real member, and the kept token count bounds the average
    val best = graft.ops.Dedup.dedupKeepBest(spark, dir)
    // (cluster_id, keep_id, kept_tokens, n_members, total_tokens)
    assert(best.count() > 0)
    assert(best.filter(col("n_members") < 2).count() == 0)
    assert(best.filter(col("kept_tokens") * col("n_members") < col("total_tokens"))
      .count() == 0, "the kept member is the per-cluster token argmax")

    // boilerplate: per-source frequency-floored template grams; the scrub
    // only ever removes tokens
    val boiler = graft.ops.Dedup.boilerplateGrams(spark, dir)
    // (source, n_boiler_grams, n_docs_hit, n_positions)
    assert(boiler.count() > 0)
    val scrubbed = graft.ops.Dedup.boilerplateScrub(spark, dir)
    assert(scrubbed.filter(col("n_tokens_after") >= col("n_tokens_before")).count() == 0)

    // per-source length calibration: a row per source, band counts nested
    val cal = graft.ops.TextAnalysis.sourceOutliers(spark, dir)
    // (source, n_docs, sum_tokens, n_gt1s, n_gt2s)
    assert(cal.count() == graft.ops.Tables.documents(spark, dir)
      .select(col("source")).distinct().count())
    assert(cal.filter(col("n_gt2s") > col("n_gt1s")).count() == 0)

    // whitening audit: one row per dimension; post sums obey the z-score
    // law within the floor-bias bound
    val w = graft.ops.Similarity.embedWhiten(spark, dir)
    // (dim, n, mean_ppb, var_ppb, post_sum_w_ppm, post_sum_w2_ppm)
    val rows = w.collect()
    assert(rows.length == 64)
    rows.foreach { r =>
      val n = r.getLong(1)
      assert(math.abs(r.getLong(4)) <= 2 * n)
      assert(math.abs(r.getLong(5) - n * 1000000L) <= 3 * n)
    }
  }

  test("example 13: real-codec image dedup — PNG bytes in, verified pairs out") {
    val dir = "/root/testdata/sf0.001"

    // the fixture corpus is REAL bytes: every row decodes via the JDK codec
    val corpus = graft.ops.Multimodal.pngFixtureCorpus(spark, dir)
    val first = corpus.select(col("png")).head().getAs[Array[Byte]](0)
    assert(first.take(8).sameElements(
      Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)),
      "fixture payloads must be genuine PNG bytes (magic header)")

    // decode audit: one row per image, aggregates over DECODED pixels
    val rt = graft.ops.Multimodal.imageRealRoundtrip(spark, dir)
    assert(rt.count() == corpus.count(), "every fixture PNG must decode")
    assert(rt.filter(col("g_min") < 0 || col("g_max") > 255).count() == 0)

    // near-dup pairs over the real bytes: planted re-encodes are found
    val pairs = graft.ops.Multimodal.dedupImageReal(spark, dir)
    assert(pairs.filter(col("doc_b") >= 10000000L).count() > 0,
      "planted re-encode clones must pair with their originals")

    // the production seam: the same pipeline over any (id, binary) frame
    val mine = graft.ops.Multimodal.dedupImageDecoded(
      corpus.withColumnRenamed("doc_id", "img_id").withColumnRenamed("png", "bytes"),
      "img_id", "bytes")
    assert(mine.count() == pairs.count(), "seam and catalog entry agree")

    // VIDEO: real multi-frame bytes (animated GIF), per-frame decode,
    // temporal shingles — trimmed re-cut copies are found with exact recall
    val clips = graft.ops.Multimodal.gifFixtureCorpus(spark, dir)
    val gif87or89 = clips.select(col("gif")).head().getAs[Array[Byte]](0).take(4)
    assert(gif87or89.sameElements("GIF8".getBytes("US-ASCII")),
      "fixture payloads must be genuine GIF bytes (magic header)")
    val vpairs = graft.ops.Multimodal.dedupVideoReal(spark, dir)
    assert(vpairs.filter(col("doc_b") >= 40000000L).count() ==
      graft.ops.Tables.documents(spark, dir).filter(col("doc_id") % 6 === 0).count(),
      "every planted trimmed+re-cut copy must be recovered (exact recall)")
  }

  test("example 14: binary embeddings, graph analytics, canonicalized dedup") {
    val dir = "/root/testdata/sf0.001"

    // 1-bit quantization audit: popcounts live strictly inside [0, dim]
    val audit = graft.ops.Similarity.embedBinaryAudit(spark, dir)
    assert(audit.filter(col("min_pop") < 0 || col("max_pop") > 64).count() == 0)

    // Hamming top-3 + its recall audit against the exact cosine truth
    val nn = graft.ops.Similarity.annHamming(spark, dir)
    assert(nn.groupBy(col("q_id")).count().filter(col("count") =!= 3).count() == 0)
    val rec = graft.ops.Similarity.annHammingRecall(spark, dir).head()
    assert(rec.getLong(0) == 150 && rec.getLong(2) <= 150)

    // integer-exact PageRank: top hubs of the trading network
    val hubs = graft.ops.GraphOps.graphPagerank(spark, dir)
    assert(hubs.count() == 15)
    val degs = graft.ops.GraphOps.graphDegreeStats(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(degs("customer") == degs("supplier")) // undirected bipartite

    // canonicalized dedup: variant groups found per language
    val norm = graft.ops.Dedup.dedupNormalized(spark, dir)
    assert(norm.agg(sum(col("n_variant_groups"))).head().getLong(0) > 0)

    // Count-Min: never undercounts, and the streamed fold equals the batch
    val cms = graft.ops.TextAnalysis.countMinAudit(spark, dir)
    assert(cms.filter(col("overcount") < 0).count() == 0)
    val live = graft.ops.TextAnalysis.countMinStream(spark, dir)
    assert(live.collect().toSet == cms.collect().toSet)

    // kNN-graph health: a connected, partly-reciprocal panel graph
    val g = graft.ops.GraphOps.graphKnnStats(spark, dir).head()
    assert(g.getLong(1) > 0 && g.getLong(2) <= g.getLong(1))
  }

  test("example 15: object-store maintenance, deep PageRank, real-codec day-2") {
    val dir = "/root/testdata/sf0.001"
    import org.apache.spark.sql.types._

    // Manifest-pointer fold: stage a tiny batch_id sink, fold at watermark
    // 1, and read back through the manifest — plain layout keeps only the
    // above-watermark partition, content is untouched.
    val sinkDir = java.nio.file.Files.createTempDirectory("usage15_sink").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("mh", LongType),
      StructField("batch_id", LongType)))
    import spark.implicits._
    val rows = for (b <- 0L until 3L; i <- 0L until 4L) yield (b * 10 + i, b + i, b)
    rows.toDF("doc_id", "mh", "batch_id")
      .write.partitionBy("batch_id").mode("overwrite").parquet(sinkDir)
    graft.streaming.SinkRetention.compactIndexManifest(
      spark, sinkDir, watermark = 1L, schema, Seq("doc_id", "mh"))
    assert(new java.io.File(sinkDir).list().count(_.startsWith("batch_id=")) == 1,
      "folded partitions must leave the plain layout")
    val live = graft.streaming.SinkRetention.readLive(spark, sinkDir, schema)
    assert(live.count() == 12, "the manifest fold must preserve every row")
    assert(live.filter(col("batch_id") <= 1L).count() == 8,
      "folded rows resolve at the watermark partition")

    // Deep PageRank: 10 checkpointed rounds on a planted cycle — total
    // mass bounded, every node ranked
    val edges = (0L until 8L).flatMap(i => Seq((i, (i + 1) % 8), ((i + 1) % 8, i)))
      .toDF("src", "dst")
    val (ranks, rounds) = graft.ops.GraphOps.pagerankDeep(
      edges, maxRounds = 10, checkpointInterval = 4)
    assert(rounds == 10 && ranks.count() == 8)
    assert(ranks.agg(sum(col("r"))).head().getLong(0) <= 1000000000L)

    // Real-codec incremental probe: delta (re-encoded clones) vs index
    val hits = graft.ops.Multimodal.dedupImageRealIncremental(spark, dir)
    assert(hits.filter(col("doc_id") < 10000000L).count() == 0,
      "probe output must be delta-side ids only")
    assert(hits.count() > 0)
  }

  test("example 9b: audio and video ride the multimodal near-dup kernels") {
    val dir = "/root/testdata/sf0.001"

    // audio: every field parsed FROM THE BYTES (header readers + the
    // codegen'd PCM energy walk) — the pre-codec filter/bucket pass
    val clips = graft.ops.Multimodal.audioEnvelope(spark, dir)
    assert(clips.count() == graft.ops.Tables.documents(spark, dir).count(),
      "every fixture clip passes the canonical PCM-44 gate")
    assert(clips.filter(col("sample_rate") =!= 8000 || col("duration_ms") =!= 61L)
      .count() == 0)

    // audio near-dup: the SAME banded join text SimHash and image dHash use
    val audioPairs = graft.ops.Multimodal.dedupAudio(spark, dir)
    assert(audioPairs.count() > 0)

    // video near-dup: temporal shingles + exact Jaccard — trims and
    // single-frame edits survive, and the ppm gate holds by construction
    val editedCopies = graft.ops.Multimodal.dedupVideo(spark, dir)
    assert(editedCopies.count() > 0)
    assert(editedCopies.filter(col("jaccard_ppm") < 700000L).count() == 0)
  }
}
