package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Filtered vector search: the predicate law (only eligible vectors in
  * the result) and the pre-vs-post-filter divergence that justifies the
  * operator's existence. */
class AnnFilteredSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = SparkTestSession.sfDir

  test("every returned neighbor satisfies the metadata predicate") {
    val eligible = Tables.embeddings(spark, sfDir)
      .filter(col("label") === 1)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val rows = Similarity.annIvfFiltered(spark, sfDir)
      .select(col("q_id"), col("nn_id"), col("rnk")).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => eligible.contains(r.getLong(1))))
    // ranks are dense 1..k per query
    rows.groupBy(_.getLong(0)).foreach { case (_, g) =>
      assert(g.map(_.getInt(2)).sorted.sameElements(1 to g.length))
    }
  }

  test("pre-filtering finds neighbors post-filtering a top-1 list would starve") {
    // The unfiltered IVF search returns each query's single best neighbor;
    // where that winner is ineligible, post-filtering the result list
    // leaves the query empty-handed — while the pre-filtered search still
    // returns eligible neighbors. At least one such query must exist on
    // the fixture (labels are uncorrelated with geometry).
    val labels = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val unfilteredTop1 = Similarity.annIvf(spark, sfDir)
      .select(col("q_id"), col("nn_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val filteredQs = Similarity.annIvfFiltered(spark, sfDir)
      .select(col("q_id")).distinct().collect().map(_.getLong(0)).toSet
    val starved = unfilteredTop1.filter { case (q, nn) =>
      labels(nn) != 1 && filteredQs.contains(q)
    }
    assert(starved.nonEmpty,
      "fixture must contain a query whose unfiltered winner is ineligible")
  }
}
