package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** BM25 search invariants on the real sf0.001 documents: result shape and
  * ordering, hand-computed score parity for the top document from exact
  * (tf, df, dl) counts, membership (every hit contains a query term), and
  * the scale-shape pin that the global top-10 plans as TakeOrdered rather
  * than a single-partition window.
  */
class Bm25Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir

  private val terms = Seq("spark", "merge", "window", "hash")

  private lazy val out = TextAnalysis.bm25Search(spark, dir).cache()

  test("exactly 10 rows, rnk tiles 1..10, scores non-increasing in rank order") {
    val rows = out.orderBy(col("rnk")).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getInt(2)).toSeq == (1 to 10))
    val scores = rows.map(_.getDouble(1))
    scores.sliding(2).foreach { case Array(a, b) => assert(a >= b) }
  }

  test("top document's score equals a driver-side recomputation from exact counts") {
    val top = out.orderBy(col("rnk")).head()
    val topId = top.getLong(0)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        TextAnalysis.tokensCol(lower(col("text"))).as("tk"))
      .select(col("doc_id"), size(col("tk")).as("dl"), col("tk"))
      .cache()
    val nDocs = docs.count()
    val totalTokens = docs.agg(sum(col("dl"))).head().getLong(0)
    val avgdl = totalTokens.toDouble / nDocs
    val tfMap = docs.filter(col("doc_id") === topId)
      .select(explode(col("tk")).as("t")).filter(col("t").isin(terms: _*))
      .groupBy(col("t")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val dl = docs.filter(col("doc_id") === topId).head().getInt(1)
    val dfMap = terms.map { t =>
      t -> docs.filter(array_contains(col("tk"), t)).count()
    }.toMap
    // Same left-to-right fold and same arithmetic as the operator (and the
    // DuckDB oracle): rational idf * saturated tf, k1 = 1.2, b = 0.75.
    val expected = terms.map { t =>
      tfMap.get(t) match {
        case None => 0.0
        case Some(tf) =>
          val df = dfMap(t)
          ((nDocs - df + 0.5) / (df + 0.5)) *
            ((tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)))
      }
    }.reduceLeft(_ + _)
    assert(top.getDouble(1) == expected,
      s"score ${top.getDouble(1)} != recomputed $expected")
  }

  test("every returned document contains at least one query term") {
    val hits = out.select(col("doc_id"))
    val containing = Tables.documents(spark, dir)
      .select(col("doc_id"), TextAnalysis.tokensCol(lower(col("text"))).as("tk"))
      .filter(terms.map(t => array_contains(col("tk"), t)).reduce(_ || _))
      .select(col("doc_id"))
    assert(hits.exceptAll(containing).count() == 0)
  }

  test("global top-10 plans as TakeOrdered, not a single-partition window") {
    // a fresh frame: the cached `out` would show InMemoryTableScan instead
    val plan = TextAnalysis.bm25Search(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrdered"), s"expected TakeOrderedAndProject in:\n$plan")
  }
}
