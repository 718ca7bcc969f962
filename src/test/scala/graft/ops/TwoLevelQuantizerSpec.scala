package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{nearestCentroid, nearestCentroidSlice}
import graft.SparkTestSession

/** The two-level (coarse × fine) quantizer behind `x_dedup_semantic_2level`:
  * the sliced argmax expression must agree with the flat [[
  * org.apache.spark.sql.graftbridge.NearestCentroid]] restricted to the
  * row's own cell (same fold, same tie rule), the side length must follow
  * the sqrt-of-cells law, and the catalog entry must keep the SemDeDup
  * pair contract (same composite cell, earlier neighbor, cos ≥ τ, one
  * winner per vector).
  */
class TwoLevelQuantizerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir

  test("NearestCentroidSlice: local argmax, first-match ties, bad cell -> -1") {
    import spark.implicits._
    // 2 cells × sliceLen 2; cell 1's slice has an exact tie (rows of it)
    val table = Array(
      Array(1.0, 0.0), Array(0.0, 1.0), // cell 0
      Array(1.0, 1.0), Array(1.0, 1.0)) // cell 1 (tie -> local 0)
    val df = Seq(
      (Seq(3.0, 1.0), 0),  // cell 0: dots (3,1) -> 0
      (Seq(1.0, 2.0), 0),  // cell 0: dots (1,2) -> 1
      (Seq(5.0, 5.0), 1),  // cell 1: tie (10,10) -> lowest local index 0
      (Seq(1.0, 0.0), 2),  // cell past the table -> -1
      (Seq(1.0, 0.0), -1)  // negative cell -> -1
    ).toDF("v", "cell")
    def run(): Seq[Int] = df
      .select(nearestCentroidSlice(col("v"), col("cell"), table, 2).as("c"))
      .collect().toSeq.map(_.getInt(0))
    val codegen = run()
    assert(codegen == Seq(0, 1, 0, -1, -1))
    val saved = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      assert(run() == codegen, "interpreted eval diverged from codegen")
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      saved match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }

  test("sliced argmax == flat NearestCentroid over the cell's slice, real data") {
    val (coarse, fine, k) = Similarity.trainTwoLevel(spark, dir)
    assert(fine.length == k * k)
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("c1", nearestCentroid(col("v"), coarse))
      .withColumn("c2", nearestCentroidSlice(col("v"), col("c1"), fine, k))
    for (cell <- 0 until k) {
      val slice = fine.slice(cell * k, (cell + 1) * k)
      val flat = vecs.filter(col("c1") === cell)
        .select(col("vec_id"), nearestCentroid(col("v"), slice).as("c2f"))
      val sliced = vecs.filter(col("c1") === cell).select(col("vec_id"), col("c2"))
      val diff = sliced.join(flat, "vec_id")
        .filter(col("c2") =!= col("c2f")).count()
      assert(diff == 0, s"cell $cell: $diff rows diverge from the flat argmax")
    }
  }

  test("side length follows k = max(2, ceil(sqrt(ceil(n/occupancy))))") {
    val n = Tables.embeddings(spark, dir).count()
    val cells = (n + 24) / 25 // L2_OCCUPANCY = 25, same as the auto demo
    val expectedK = math.max(2, math.ceil(math.sqrt(cells.toDouble)).toInt)
    val (_, _, k) = Similarity.trainTwoLevel(spark, dir)
    assert(k == expectedK, s"k=$k, expected $expectedK for n=$n")
    assert(expectedK > 2, s"fixture too small to exercise the law: n=$n")
  }

  test("catalog entry keeps the SemDeDup pair contract over composite cells") {
    val (coarse, fine, k) = Similarity.trainTwoLevel(spark, dir)
    val res = Similarity.queries("x_dedup_semantic_2level")(spark, dir).cache()
    val rows = res.collect()
    assert(rows.nonEmpty, "fixture yields no near-dup pairs")
    // one winner per vector, and it is the LOWEST-id earlier neighbor
    assert(res.groupBy(col("vec_id")).count().filter(col("count") > 1).count() == 0)
    assert(rows.forall(r => r.getLong(3) < r.getLong(0)), "dup_of must be earlier")
    // every reported pair really is same-composite-cell under the trained
    // quantizer, and both the kept cell ids and the cos threshold hold
    val assigned = Tables.embeddings(spark, dir)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("ac1", nearestCentroid(col("v"), coarse))
      .withColumn("ac2", nearestCentroidSlice(col("v"), col("ac1"), fine, k))
      .select(col("vec_id"), col("ac1"), col("ac2"))
    val joined = res
      .join(assigned, "vec_id")
      .join(assigned.withColumnRenamed("vec_id", "dup_of")
        .withColumnRenamed("ac1", "bc1").withColumnRenamed("ac2", "bc2"), "dup_of")
    assert(joined.filter(col("c1") =!= col("ac1") || col("c2") =!= col("ac2") ||
      col("ac1") =!= col("bc1") || col("ac2") =!= col("bc2")).count() == 0,
      "a reported pair is not co-located in the trained composite cell")
    assert(rows.forall(_.getDouble(4) >= 0.4), "cos below SEM_TAU escaped the filter")
    res.unpersist()
  }
}
