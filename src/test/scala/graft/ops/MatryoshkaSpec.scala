package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.window.WindowExec
import graft.{PlanTest, SparkTestSession}

/** Truncated-dimension (matryoshka) ANN: the rerank-corrects-the-prefix
  * contract on a constructed fixture, and the plan law that the coarse
  * window never carries full vectors — only ids survive the shortlist cut,
  * and full vectors come back by equi-join for the <= Q x shortlist
  * candidates.
  */
class MatryoshkaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def dim64(assign: Map[Int, Float]): Array[Float] = {
    val a = Array.fill(64)(0.0f)
    assign.foreach { case (i, x) => a(i) = x }
    a
  }

  test("full-vector rerank demotes a prefix-perfect decoy below the true neighbor") {
    // query 0: unit on dim 0 (inside the 16-dim prefix)
    // id 1 (true nn): 0.9 on dim 0 + 0.1 on dim 20 -> high prefix AND full sim
    // id 2 (decoy):   1.0 on dim 0 + 9.0 on dim 30 -> prefix sim 1.0, full sim ~0.11
    // id 3 (far):     unit on dim 5 -> prefix and full sim 0
    val rows = Seq(
      (0L, dim64(Map(0 -> 1.0f)), 0),
      (1L, dim64(Map(0 -> 0.9f, 20 -> 0.1f)), 0),
      (2L, dim64(Map(0 -> 1.0f, 30 -> 9.0f)), 0),
      (3L, dim64(Map(5 -> 1.0f)), 0))
    val dir = java.nio.file.Files.createTempDirectory("matry").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = Similarity.annMatryoshka(spark, dir)
      .filter(col("q_id") === 0).orderBy(col("rnk"))
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(out.head._1 == 1L, s"true neighbor must rerank to rnk 1: ${out.toList}")
    assert(out(1)._1 == 2L && out(1)._3 < 0.2,
      s"prefix-perfect decoy must fall to rnk 2 on its LOW full-vector sim: ${out.toList}")
    assert(out(2)._1 == 3L && math.abs(out(2)._3) < 1e-12, s"far vector last: ${out.toList}")
  }

  test("coarse shortlist window carries truncated vectors only, never the full 64 dims") {
    val nodes = PlanTest.executedNodes(
      Similarity.annMatryoshka(spark, SparkTestSession.sfDir))
    val coarse = nodes.collect {
      case w: WindowExec if w.orderSpec.exists(_.child.references.exists(_.name == "tsim")) => w
    }
    assert(coarse.nonEmpty, "expected the tsim shortlist window")
    coarse.foreach { w =>
      val carried = w.child.output.map(_.name).toSet
      assert(!carried.contains("v") && !carried.contains("qv") && !carried.contains("nv"),
        s"shortlist window must not carry full vectors, got: $carried")
    }
  }
}
