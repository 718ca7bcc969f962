package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Invariants of the cross-source duplication matrix on the real sf0.001
  * corpus: one canonical triangle, pair mass conserved against the pair
  * relation it labels, and the fixture exercises both the diagonal
  * (intra-source boilerplate) and, if present, off-diagonal leakage.
  */
class CrossSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir

  private lazy val matrix = Dedup.dedupCrossSource(spark, dir).cache()

  test("canonical triangle: source_a <= source_b on every cell") {
    assert(matrix.filter(col("source_a") > col("source_b")).count() == 0)
    assert(matrix.select(col("source_a"), col("source_b")).distinct().count()
      == matrix.count(), "duplicate matrix cells")
  }

  test("pair mass is conserved against the candidate relation") {
    val total = matrix.agg(sum(col("n_pairs"))).head().getLong(0)
    val pairs = Dedup.dedupSimhash(spark, dir).count()
    assert(total == pairs, s"matrix mass $total vs pair count $pairs")
    assert(pairs > 0, "fixture must contain near-dup pairs")
  }

  test("the diagonal is populated: sources duplicate internally") {
    assert(matrix.filter(col("source_a") === col("source_b")).count() > 0)
  }

  test("Over form on synthetic inputs: canonical cells by hand") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("doc_a", "doc_b")
    val src = Seq((1L, "web"), (2L, "web"), (3L, "books"))
      .toDF("doc_id", "source")
    val got = Dedup.dedupCrossSourceOver(pairs, src)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    // (1,2) intra-web; (1,3) and (2,3) canonicalize to (books, web)
    assert(got == Map(("web", "web") -> 1L, ("books", "web") -> 2L))
  }
}
