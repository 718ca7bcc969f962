package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Behavioral tests for the pipeline text ops on planted fixtures — the
  * oracle proves cross-engine agreement; these prove the SEMANTICS.
  */
class TextPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Write a synthetic documents table and return its dir. */
  private def docsDir(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("textops").toString
    rows.toDF("doc_id", "lang", "text")
      .withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("docWindows: windows tile the token stream with the documented stride and sizes") {
    val toks200 = (1 to 120).map(i => s"t$i").mkString(" ")
    val d = docsDir(Seq((1L, "en", toks200), (2L, "en", "short doc"), (3L, "en", (1 to 50).map("w" + _).mkString(" "))))
    val out = TextAnalysis.docWindows(spark, d)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toList
      .groupBy(_._1)
    // doc 1: 120 tokens -> ceil((120-50)/25)+1 = 4 windows; last starts at 75, has 45 tokens
    val w1 = out(1L).sortBy(_._2).map(_._3)
    assert(w1 == List(50, 50, 50, 45), s"window sizes: $w1")
    // doc 2: 2 tokens -> one window of 2
    assert(out(2L).map(_._3) == List(2))
    // doc 3: exactly 50 tokens -> one full window
    assert(out(3L).map(_._3) == List(50))
    // window hashes verify content: doc 1 window 1 = tokens 26..75
    val h = TextAnalysis.docWindows(spark, d)
      .filter(col("doc_id") === 1 && col("win_idx") === 1)
      .select(col("win_hash")).head().getString(0)
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest((26 to 75).map(i => s"t$i").mkString(" ").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(h == expect)
  }

  test("decontam: planted 5-gram overlap is found, clean docs are not flagged") {
    val gram = "alpha beta gamma delta epsilon"
    val d = docsDir(Seq(
      (1L, "en", s"benchmark text with $gram inside it"),     // benchmark (doc_id < 10)
      (100L, "en", s"a training doc that leaked $gram verbatim"), // contaminated
      (101L, "en", "a perfectly clean training document with original words"),
      (500L, "en", s"outside the corpus range $gram")))       // ignored (>= 400)
    val out = TextAnalysis.decontam(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.contains(100L) && out(100L) >= 1, s"contamination missed: $out")
    assert(!out.contains(101L), s"clean doc flagged: $out")
    assert(!out.contains(500L), s"out-of-range doc flagged: $out")
  }

  test("keywords: distinctive terms win over corpus-wide terms, ranked by tf") {
    val common = "filler " * 3 // appears in every doc -> df too high to be a keyword
    val d = docsDir(
      (0L to 19L).map(i => (i, "en", common + s"unique$i " * (3 + (i % 2)).toInt + s"rare$i"))
    )
    val out = TextAnalysis.keywords(spark, d)
      .filter(col("doc_id") === 3)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getInt(4)))
    // doc 3: 'unique3' tf=4 ranks first; 'rare3' tf=1 second; 'filler' excluded (df=20/20)
    assert(out.map(_._1).toList == List("unique3", "rare3"), out.mkString(","))
    assert(out.head._2 == 4)
  }

  test("hashSample: deterministic across runs and ~10% rate overall") {
    val d = docsDir((0L until 1000L).map(i => (i, "en", s"doc number $i")))
    val a = TextAnalysis.hashSample(spark, d).collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val b = TextAnalysis.hashSample(spark, d).collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b, "sampling not deterministic")
    val (n, sampled) = (a.head._2, a.head._3)
    assert(n == 1000)
    assert(sampled > 50 && sampled < 150, s"rate off: $sampled/1000") // ~10%
  }

  test("bpePairStats: exact pair counts with the GPT-2 leading-space convention") {
    // pretokens of "aba aba cab": ["aba", " aba", " cab"] — the space stays
    // attached to its word, so (' ','a') and ('a','b') count separately
    // from each other and from any space-free variant.
    val d = docsDir(Seq((1L, "en", "aba aba cab")))
    val got = TextAnalysis.bpePairStats(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toList
    // pairs: "aba" -> ab, ba; " aba" -> ⎵a, ab, ba; " cab" -> ⎵c, ca, ab
    val want = Map("ab" -> 3L, "ba" -> 2L, " a" -> 1L, " c" -> 1L, "ca" -> 1L)
    assert(got.map(g => g._1 -> g._2).toMap == want, s"got $got")
    // deterministic rank: count desc, then pair asc
    assert(got.sortBy(_._3).map(_._1) == List("ab", "ba", " a", " c", "ca"))
  }

  test("bpePairStats plans no global window (no single-partition sort)") {
    // The rank over the top-10 is assigned driver-side; a partitionless
    // Window.orderBy would plan Exchange SinglePartition + Window and log
    // the "No Partition Defined for Window" warning in every Verify run.
    val d = docsDir(Seq((1L, "en", "aba aba cab")))
    val plan = TextAnalysis.bpePairStats(spark, d).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window in plan:\n$plan")
    assert(!plan.contains("SinglePartition"), s"unexpected single-partition exchange:\n$plan")
  }
}
