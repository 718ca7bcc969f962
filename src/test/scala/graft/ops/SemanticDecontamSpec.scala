package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** The semantic decontam probe's contract on real corpus vectors: exactly
  * the corpus vectors with a same-cluster eval-set match clearing τ are
  * flagged, with the exact hit count and the canonical (minimum) eval id —
  * checked against an independently built ground truth, and never an
  * eval-set vector itself.
  */
class SemanticDecontamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.001"

  private val TAU = 0.4
  private val EVAL_MAX = 50L
  private lazy val k: Int = {
    val n = Tables.embeddings(spark, d).count()
    math.max(16, ((n + 24) / 25).toInt)
  }

  test("flags exactly the tau-matching corpus-vs-eval vectors, canonically") {
    val a = Similarity.ivfAssigned(spark, d, k)
      .select(col("vec_id"), col("cluster"), col("v"), col("nrm"))
    val truth = a.as("p").join(a.as("q"),
        col("p.cluster") === col("q.cluster") &&
          col("p.vec_id") >= EVAL_MAX && col("q.vec_id") < EVAL_MAX)
      .filter(aggregate(zip_with(col("p.v"), col("q.v"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x) / (col("p.nrm") * col("q.nrm")) >= TAU)
      .select(col("p.vec_id"), col("q.vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(truth.nonEmpty, "test premise: the fixture has eval-set leakage")
    val byCorpus = truth.groupBy(_._1).map { case (cv, hits) =>
      cv -> (hits.length.toLong, hits.map(_._2).min) }

    val flagged = Similarity.queries("x_decontam_semantic")(spark, d)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(flagged.keySet == byCorpus.keySet)
    byCorpus.foreach { case (cv, expected) =>
      assert(flagged(cv) == expected, s"corpus vec $cv drifted")
    }
    flagged.keySet.foreach(cv => assert(cv >= EVAL_MAX, "flagged an eval vector"))
  }

  test("the probe plan broadcasts the eval side and never shuffles the corpus into the join") {
    val plan = Similarity.decontamSemantic(spark, d, 25L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }

  test("the entry emits only integral columns") {
    val df = Similarity.queries("x_decontam_semantic")(spark, d)
    val types = df.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(types == Map("vec_id" -> "long", "n_eval_hits" -> "long",
      "eval_id" -> "long"), s"non-integral or drifted schema: $types")
  }
}
