package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Reciprocal-rank fusion (x_rrf_fusion): a document that both rankers
  * place first must fuse first, the fused score is exactly the two-term
  * reciprocal sum of the emitted ranks, and single-list docs contribute
  * one term.
  */
class RrfFusionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("rrf").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("a doc ranked first by both rankers fuses first; scores are the exact reciprocal sums") {
    // doc 1: stuffed with every BM25 query term AND built from the corpus's
    // dominant bigrams (it IS most of the corpus) -> top of both lists.
    val champion = Seq.fill(6)("spark merge window hash").mkString(" ")
    val rows = Seq(
      (1L, champion),
      (2L, "spark spark alpha beta gamma delta epsilon zeta"), // lexical-only signal
      (3L, "qq zz xx vv ww yy kk jj"), // matches nothing lexically
      (4L, "merge window unrelated words here padding tokens"))
    val d = docsDir(rows)
    val out = TextAnalysis.rrfFusion(spark, d).collect()
    assert(out.nonEmpty && out.head.getLong(0) == 1L, s"champion must fuse first: ${out.toSeq}")
    out.foreach { r =>
      val rLex = if (r.isNullAt(2)) None else Some(r.getInt(2))
      val rQual = if (r.isNullAt(3)) None else Some(r.getInt(3))
      val expected = rLex.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        rQual.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(r.getDouble(1) == expected, s"row $r")
      assert(rLex.forall(x => x >= 1 && x <= 20) && rQual.forall(x => x >= 1 && x <= 20))
    }
    // ranks within the fused list are dense and ordered by score desc
    val rnks = out.map(_.getInt(4)).toSeq
    assert(rnks == (1 to out.length))
    assert(out.map(_.getDouble(1)).toSeq.sliding(2).forall {
      case Seq(a, b) => a >= b; case _ => true })
  }

  test("docs absent from the lexical pool still fuse via the quality arm alone") {
    // No document contains any BM25 term: the lexical arm is empty and the
    // fusion must equal the pure quality ranking.
    val rows = (1L to 5L).map(i => (i, Seq.fill(4)(s"word$i common text here").mkString(" ")))
    val d = docsDir(rows)
    val out = TextAnalysis.rrfFusion(spark, d).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.isNullAt(2)), "no doc may carry a lexical rank")
    val byQual = out.sortBy(_.getInt(3)).map(_.getLong(0)).toSeq
    assert(out.sortBy(_.getInt(4)).map(_.getLong(0)).toSeq == byQual)
  }
}
