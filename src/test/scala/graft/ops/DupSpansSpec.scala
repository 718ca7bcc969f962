package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Semantics of cross-document duplicate-SPAN detection (x_dup_spans /
  * x_dup_span_stats): planted shared passages must come back as exactly
  * the planted token ranges, and the rollup must tile with the spans.
  */
class DupSpansSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("dupspans").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", concat(lit("s"), (col("doc_id") % 2).cast("string")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def toks(prefix: String, n: Int): Seq[String] =
    (1 to n).map(i => s"$prefix$i")

  test("dupSpans: a passage shared by two docs comes back as one maximal span in each") {
    val shared = toks("shared", 20)
    val a = (toks("ua", 5) ++ shared ++ toks("va", 5)).mkString(" ")
    val b = (toks("ub", 3) ++ shared ++ toks("vb", 7)).mkString(" ")
    val c = toks("uc", 30).mkString(" ")
    val d = docsDir(Seq((1L, a), (2L, b), (3L, c)))
    val spans = Dedup.dupSpans(spark, d)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet
    // shared occupies tokens [5,24] in doc 1 and [3,22] in doc 2; every
    // 8-gram fully inside it is duplicated, and the island merge must
    // recover exactly the full 20-token range — maximal, not per-gram.
    assert(spans == Set((1L, 5, 24, 20), (2L, 3, 22, 20)))
  }

  test("dupSpans: two shared passages separated by enough unique tokens stay two spans") {
    val s1 = toks("one", 10)
    val s2 = toks("two", 10)
    // gap of 10 unique tokens (> gram size 8) between the passages
    val a = (s1 ++ toks("gapa", 10) ++ s2).mkString(" ")
    val b = (s2 ++ toks("gapb", 12) ++ s1).mkString(" ")
    val d = docsDir(Seq((1L, a), (2L, b)))
    val spans = Dedup.dupSpans(spark, d)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    // doc 1: s1 at [0,9], s2 at [20,29]; doc 2: s2 at [0,9], s1 at [22,31]
    assert(spans == Set((1L, 0, 9), (1L, 20, 29), (2L, 0, 9), (2L, 22, 31)))
  }

  test("dupSpans: identical docs below the gram size yield no spans (cross-doc only, gram-bounded)") {
    val tiny = toks("t", 5).mkString(" ")
    val d = docsDir(Seq((1L, tiny), (2L, tiny), (3L, toks("u", 12).mkString(" "))))
    assert(Dedup.dupSpans(spark, d).count() == 0)
  }

  test("dupSpanStats: rollup tiles exactly with the spans and the corpus") {
    val shared = toks("sh", 15)
    val a = (shared ++ toks("xa", 10)).mkString(" ")      // doc 1, source s1
    val b = (toks("xb", 5) ++ shared).mkString(" ")       // doc 2, source s0
    val c = toks("xc", 40).mkString(" ")                  // doc 3, source s1
    val d = docsDir(Seq((1L, a), (2L, b), (3L, c)))
    val stats = Dedup.dupSpanStats(spark, d)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // source s1 = docs {1, 3}: doc 1 has the 15-token span, doc 3 clean
    assert(stats("s1") == ((2L, 1L, 15L, 25L + 40L)))
    // source s0 = doc {2}: the same 15-token span
    assert(stats("s0") == ((1L, 1L, 15L, 20L)))
  }

  test("dupSpanScrub: the first-occurrence doc keeps the passage, every other holder loses it") {
    val shared = toks("sh", 16)
    val a = (toks("ua", 4) ++ shared ++ toks("va", 4)).mkString(" ")   // doc 1 = canonical
    val b = (toks("ub", 6) ++ shared).mkString(" ")                    // doc 2 scrubbed
    val c = (shared ++ toks("vc", 9)).mkString(" ")                    // doc 3 scrubbed
    val d = docsDir(Seq((1L, a), (2L, b), (3L, c)))
    val out = Dedup.dupSpanScrub(spark, d)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    def h(ts: Seq[String]) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(ts.mkString(" ").getBytes("UTF-8")).map(x => f"$x%02x").mkString
    }
    assert(out(1L) == ((24, 24, h(toks("ua", 4) ++ shared ++ toks("va", 4)))))
    assert(out(2L) == ((22, 6, h(toks("ub", 6)))))
    assert(out(3L) == ((25, 9, h(toks("vc", 9)))))
  }

  test("dupSpanScrub: a doc that is entirely one duplicated passage scrubs to the empty stream") {
    val shared = toks("whole", 12)
    val d = docsDir(Seq(
      (1L, (shared ++ toks("tail", 5)).mkString(" ")),  // canonical holder
      (2L, shared.mkString(" "))))                      // fully duplicated doc
    val out = Dedup.dupSpanScrub(spark, d)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(out(2L)._2 == 0)
    // md5 of the empty string — the rewrite really emitted zero tokens
    assert(out(2L)._3 == "d41d8cd98f00b204e9800998ecf8427e")
    assert(out(1L) == ((17, 17, out(1L)._3)))
  }

  test("dupSpans plan laws: no distinct expansion, two shuffles total, windows share one exchange") {
    import org.apache.spark.sql.execution.ExpandExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.window.WindowExec
    val out = Dedup.dupSpans(spark, SparkTestSession.sfDir)
    val nodes = graft.PlanTest.executedNodes(out)
    val plan = out.queryExecution.executedPlan
    // The duplicated-gram test is min(doc_id) != max(doc_id), NOT
    // countDistinct — a distinct expansion on the gram relation (the
    // biggest in the plan) would show up as an Expand node.
    assert(!nodes.exists(_.isInstanceOf[ExpandExec]),
      s"distinct-style expansion crept into the gram plan:\n$plan")
    // Exactly two data shuffles: the gram min/max aggregate and the
    // doc_id window partitioning. The lag window, the running-sum window,
    // and the island aggregate must all reuse the ONE doc_id exchange
    // (hashpartitioning(doc_id) satisfies the (doc_id, island) group).
    val shuffles = nodes.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.size == 2, s"expected 2 shuffles, got ${shuffles.size}:\n$plan")
    assert(nodes.count(_.isInstanceOf[WindowExec]) == 2)
  }

  test("dupSpans invariants on the real corpus: in-bounds, disjoint, gram-wide, stats-consistent") {
    val d = SparkTestSession.sfDir
    val spans = Dedup.dupSpans(spark, d).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(spans.nonEmpty, "the synthetic corpus is known to share phrases")
    val lens = Tables.documents(spark, d)
      .select(col("doc_id"), TextAnalysis.tokenCountCol(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    spans.foreach { case (doc, s, e, n) =>
      assert(s >= 0 && e < lens(doc), s"span [$s,$e] outside doc $doc (${lens(doc)} tokens)")
      assert(n == e - s + 1 && n >= Dedup.SPAN_GRAM)
    }
    spans.groupBy(_._1).values.foreach { ss =>
      val sorted = ss.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, _, e1, _), (doc, s2, _, _)) =>
          // maximality: disjoint AND non-adjacent (a gap ≤ gram size would
          // have been merged into one island)
          assert(s2 - e1 > 1, s"doc $doc spans touch: end $e1 then start $s2")
        case _ => ()
      }
    }
    val perDocFromSpans = spans.groupBy(_._1).view.mapValues(_.map(_._4.toLong).sum).toMap
    val stats = Dedup.dupSpanStats(spark, d).collect()
    val dupTotal = stats.map(_.getLong(3)).sum
    val docsWithDups = stats.map(_.getLong(2)).sum
    assert(dupTotal == perDocFromSpans.values.sum)
    assert(docsWithDups == perDocFromSpans.size)
  }
}
