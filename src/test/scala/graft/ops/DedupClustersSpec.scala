package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Semantics of the near-dup clustering family: the CC kernel on planted
  * graphs (chains force multi-round convergence; the pointer-doubling path
  * is exercised), and the full-corpus assignment's invariants on real data.
  */
class DedupClustersSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // threshold 0 forces the distributed Pregel loop; MaxValue forces the
  // single-task union-find — both paths must agree on every fixture.
  private val bothPaths = Seq(0L -> "distributed loop", Long.MaxValue -> "union-find fast path")

  test("connectedComponents: planted chain + clique + isolated pair all collapse to min-id labels") {
    // chain 1-2-3-...-10 (diameter 9 → needs >1 round even with doubling),
    // clique {20,21,22}, pair {30,31}
    val chain = (1L until 10L).map(i => (i, i + 1))
    val clique = Seq((20L, 21L), (20L, 22L), (21L, 22L))
    val pairs = (chain ++ clique ++ Seq((30L, 31L))).toDF("doc_a", "doc_b")
    bothPaths.foreach { case (thr, path) =>
      val labels = Dedup.connectedComponents(pairs, smallGraphThreshold = thr)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      (1L to 10L).foreach(i => assert(labels(i) == 1L, s"[$path] chain node $i -> ${labels(i)}"))
      (20L to 22L).foreach(i => assert(labels(i) == 20L, s"[$path]"))
      assert(labels(30L) == 30L && labels(31L) == 30L, s"[$path]")
      assert(labels.size == 15, s"[$path] only ids in some pair are labeled")
    }
  }

  test("connectedComponents: empty pair relation yields an empty label table on both paths") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    bothPaths.foreach { case (thr, path) =>
      assert(Dedup.connectedComponents(empty, smallGraphThreshold = thr).count() == 0, s"[$path]")
    }
  }

  test("connectedComponents: label order is direction-independent") {
    // same component described with edges pointing both ways
    val pairs = Seq((5L, 3L), (3L, 9L), (9L, 7L)).toDF("a", "b")
    bothPaths.foreach { case (thr, path) =>
      val labels = Dedup.connectedComponents(pairs, smallGraphThreshold = thr)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(labels.values.toSet == Set(3L), s"[$path]")
    }
  }

  test("connectedComponents: both paths agree on the real pair graph") {
    val d = SparkTestSession.sfDir
    val pairs = Dedup.dedupSimhash(spark, d).select(col("doc_a"), col("doc_b"))
    val fast = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val loop = Dedup.connectedComponents(pairs, smallGraphThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == loop)
  }

  test("connectedComponents: reliable-checkpoint path yields identical labels on the distributed loop") {
    // checkpointDir on: every Nth round writes a RELIABLE checkpoint
    // (executor-loss-safe) instead of localCheckpoint every round. Same
    // labels, and the checkpoint directory must actually be written to.
    val ckpt = java.nio.file.Files.createTempDirectory("cc-ckpt").toString
    // chain of 40 forces > checkpointInterval rounds of pointer doubling
    val pairs = (1L until 40L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val plain = Dedup.connectedComponents(pairs, smallGraphThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ck = Dedup.connectedComponents(pairs, smallGraphThreshold = 0L,
      checkpointDir = Some(ckpt), checkpointInterval = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ck == plain)
    assert(ck.values.toSet == Set(1L))
    def rddFiles(f: java.io.File): Long =
      if (f.isFile) 1L else Option(f.listFiles()).map(_.map(rddFiles).sum).getOrElse(0L)
    assert(rddFiles(new java.io.File(ckpt)) > 0,
      s"no reliable checkpoint was ever written under $ckpt")
  }

  test("dedupClusters: full-corpus assignment is consistent with the pair graph") {
    val d = SparkTestSession.sfDir
    val cc = Dedup.dedupClusters(spark, d)
    val byDoc = cc.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    // every near-dup pair lands in one cluster
    Dedup.dedupSimhash(spark, d).select("doc_a", "doc_b").collect().foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(byDoc(a)._1 == byDoc(b)._1, s"pair ($a,$b) split across clusters")
    }
    // cluster_id is the min member; exactly the min is canonical
    byDoc.groupBy(_._2._1).foreach { case (cid, members) =>
      assert(members.keys.min == cid, s"cluster $cid min is ${members.keys.min}")
      members.foreach { case (id, (_, canon)) =>
        assert((canon == 1) == (id == cid), s"doc $id canonical=$canon in cluster $cid")
      }
    }
    // total assignment covers the whole corpus exactly once
    assert(byDoc.size == Tables.documents(spark, d).count())
  }

  test("dedupChunkTransform: drop-list slice is range-pruned under the broadcast") {
    val dir = java.nio.file.Files.createTempDirectory("droppr").toString
    (0L until 1000L).map(i => (i, s"doc $i"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/chunkside.parquet")
    // drop ids spread across the keyspace; only [100, 199] is in-chunk
    (0L until 1000L by 10L).toDF("doc_id")
      .write.mode("overwrite").parquet(s"$dir/drop.parquet")
    val drop = spark.read.parquet(s"$dir/drop.parquet")
    val chunkDf = spark.read.parquet(s"$dir/chunkside.parquet")
      .filter(col("doc_id").between(100L, 199L))
    val out = Dedup.dedupChunkTransform(drop)(
      graft.chunker.Chunk(BigInt(100), BigInt(199)), chunkDf)
    val plan = out.queryExecution.executedPlan.toString
    // the anti-join broadcasts, and the BETWEEN bounds are pushed into the
    // broadcast side's scan — the full drop list is never shipped
    assert(plan.contains("BroadcastExchange"), plan)
    val pushed = plan.linesIterator.filter(_.contains("drop.parquet")).mkString("\n")
    assert(pushed.contains("GreaterThanOrEqual(doc_id,100)")
      && pushed.contains("LessThanOrEqual(doc_id,199)"),
      s"drop-side scan not range-pruned:\n$plan")
    // semantics: exactly the in-range multiples of 10 are dropped
    val kept = out.collect().map(_.getLong(0)).toSet
    assert(kept == (100L to 199L).filterNot(_ % 10 == 0).toSet)
  }

  test("dmlChunkedDedup: cleans up its temp rewrite directory") {
    def dirs() = new java.io.File("/tmp").listFiles()
      .filter(_.getName.startsWith("graft_dml_chunked_dedup")).map(_.getName).toSet
    val before = dirs()
    val audit = Dedup.dmlChunkedDedup(spark, SparkTestSession.sfDir)
    assert(audit.count() > 0)
    assert(dirs() == before, "temp rewrite dir leaked")
  }

  test("repetitionStats: hand-computable fixtures") {
    val dir = java.nio.file.Files.createTempDirectory("repet").toString
    Seq(
      (1L, "en", "a a a a a"),     // 5 toks, 1 distinct; bigrams [a a]x4
      (2L, "en", "w1 w2 w3 w4"),   // all distinct
      (3L, "en", "x y x y x"),     // bigrams: x y, y x, x y, y x
      (4L, "en", "solo"))          // < 2 tokens: excluded
      .toDF("doc_id", "lang", "text")
      .withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.repetitionStats(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out(1L) == ((5, 0.2, 0.75, 1.0)))
    assert(out(2L) == ((4, 1.0, 0.0, 1.0 / 3)))
    assert(out(3L) == ((5, 0.4, 0.5, 0.5)))
    assert(!out.contains(4L))
  }

  test("tokenRarity: corpus frequencies and rare-token counts are exact on a planted corpus") {
    val dir = java.nio.file.Files.createTempDirectory("rarity").toString
    Seq(
      (1L, "en", "cat cat dog"),   // cat cf=3 (2 here + 1 in doc 2), dog cf=1
      (2L, "en", "cat bird"),      // bird cf=1 (rare)
      (3L, "en", "qux"))           // qux cf=1 (rare)
      .toDF("doc_id", "lang", "text")
      .withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.tokenRarity(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // doc 1: tokens cat,cat,dog -> cf sum 3+3+1=7; dog is rare (cf=1)
    assert(out(1L) == ((3L, 7L, 1L)))
    // doc 2: cat,bird -> 3+1=4; bird rare
    assert(out(2L) == ((2L, 4L, 1L)))
    // doc 3: qux -> 1; rare
    assert(out(3L) == ((1L, 1L, 1L)))
  }

  test("quotaSample: exactly min(K, group size) per language, stable across runs") {
    val dir = java.nio.file.Files.createTempDirectory("quota").toString
    // en: 250 docs (> K=100), zh: 40 docs (< K)
    ((0L until 250L).map(i => (i, "en", s"doc $i")) ++
      (300L until 340L).map(i => (i, "zh", s"doc $i")))
      .toDF("doc_id", "lang", "text")
      .withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val run1 = TextAnalysis.quotaSample(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val byLang = run1.groupBy(_._1)
    assert(byLang("en").length == 100 && byLang("zh").length == 40)
    // ranks are a permutation 1..n per group
    assert(byLang("en").map(_._3).sorted.toSeq == (1 to 100))
    assert(byLang("zh").map(_._3).sorted.toSeq == (1 to 40))
    val run2 = TextAnalysis.quotaSample(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(run1.toSet == run2.toSet) // hash draw, not rand()
  }

  test("packBins: token totals preserved, bounded overflow, contiguous bins per bucket") {
    val dir = java.nio.file.Files.createTempDirectory("pack").toString
    val tokensPerDoc = 100
    (0L until 400L).map(i => (i, "en", (1 to tokensPerDoc).map(t => s"w$t").mkString(" ")))
      .toDF("doc_id", "lang", "text")
      .withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val bins = TextAnalysis.packBins(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // conservation: every token lands in exactly one bin
    assert(bins.map(_._4).sum == 400L * tokensPerDoc)
    // bounded overflow: a bin holds docs STARTING inside its budget window,
    // so fill < budget + one doc
    bins.foreach { case (bkt, bin, _, toks) =>
      assert(toks < 2048 + tokensPerDoc, s"bucket $bkt bin $bin overfilled: $toks")
    }
    // bins are contiguous 0..max within each bucket (docs are smaller than
    // the budget, so no bin index can be skipped)
    bins.groupBy(_._1).foreach { case (bkt, bs) =>
      val ids = bs.map(_._2).sorted
      assert(ids.toSeq == (0L to ids.max).toSeq, s"bucket $bkt bins: ${ids.toSeq}")
    }
  }

  test("mixWeighted: rates bind per language, deterministic, unknown lang keeps nothing") {
    val dir = java.nio.file.Files.createTempDirectory("mix").toString
    (0L until 300L).map(i => (i, if (i % 3 == 0) "zh" else if (i % 3 == 1) "xx" else "en", s"doc $i"))
      .toDF("doc_id", "lang", "text")
      .withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val run1 = TextAnalysis.mixWeighted(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(run1("zh")._2 == run1("zh")._1) // rate 10000 bps: all kept
    assert(run1("xx")._2 == 0L)            // no configured rate: none kept
    val en = run1("en")
    assert(en._2 > 0 && en._2 < en._1)     // 5000 bps: a strict subset
    val run2 = TextAnalysis.mixWeighted(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(run1 == run2)                   // hash sampling, not rand()
  }
}
