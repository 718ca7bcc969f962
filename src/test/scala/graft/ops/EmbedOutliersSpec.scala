package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Embedding-hygiene audit (x_embed_outliers): planted zero / low-norm /
  * high-norm / wrong-dimension vectors land in exactly their counters,
  * and the norm mass matches the same left-fold arithmetic.
  */
class EmbedOutliersSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def embDir(rows: Seq[(Long, Seq[Float], Int)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("embout").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def unit(dims: Int): Seq[Float] = 1.0f +: Seq.fill(dims - 1)(0.0f)

  test("each planted defect lands in exactly its counter") {
    val low = Seq.fill(64)(0.05f) // norm^2 = 0.16
    val high = 1.2f +: Seq.fill(63)(0.0f) // norm^2 = 1.44
    val d = embDir(Seq(
      (1L, unit(64), 0), (2L, Seq.fill(64)(0.0f), 0), (3L, low, 0),
      (4L, high, 0), (5L, unit(32), 0), // wrong dims, healthy norm
      (6L, unit(64), 1)))
    val rows = Similarity.embedOutliers(spark, d).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    val (n, bad, zero, lo, hi, sq) = rows(0)
    assert((n, bad, zero, lo, hi) == ((5L, 1L, 1L, 1L, 1L)))
    // same strict left-fold the operator uses
    val expected = Seq(unit(64), Seq.fill(64)(0.0f), low, high, unit(32))
      .map(_.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble)).sum
    assert(math.abs(sq - expected) < 1e-9, s"sum_sq $sq vs $expected")
    assert(rows(1) == ((1L, 0L, 0L, 0L, 0L, 1.0)))
  }
}
