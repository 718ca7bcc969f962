package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** The incremental (delta-vs-index) SEMANTIC dedup's contract on real
  * corpus data — the embedding-space sibling of [[IncrementalDedupSpec]]:
  * the asymmetric probe reports exactly the delta vectors with a
  * same-cluster index match clearing the cosine threshold, with the
  * canonical (minimum) index match and the exact match count, and by
  * design never a delta-vs-delta or index-vs-index pair.
  *
  * Ground truth is rebuilt IN THE TEST from the shared cluster assignment
  * (`ivfAssigned` — its own training/assignment machinery is pinned by
  * SemanticAutoSpec/ClusterMedoidsSpec and replayed end-to-end by the
  * DuckDB oracle tallies) with independent join/filter/aggregate logic,
  * so the probe's pairing semantics are checked against a second
  * formulation rather than against itself.
  */
class IncrementalSemanticSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.001"

  private val TAU = 0.4
  private lazy val k: Int = { // the catalog entry's occupancy-25 sizing law
    val n = Tables.embeddings(spark, d).count()
    math.max(16, ((n + 24) / 25).toInt)
  }

  test("probe reports exactly the tau-matching delta-vs-index pairs, canonically") {
    val a = Similarity.ivfAssigned(spark, d, k)
      .select(col("vec_id"), col("cluster"), col("v"), col("nrm"))
    // Independent ground truth: all same-cluster cross-parity pairs over
    // the assigned corpus, thresholded on exact cosine.
    val truth = a.as("p").join(a.as("q"),
        col("p.cluster") === col("q.cluster") &&
          col("p.vec_id") % 2 === 1 && col("q.vec_id") % 2 === 0)
      .select(col("p.vec_id").as("dv"), col("q.vec_id").as("iv"),
        (aggregate(zip_with(col("p.v"), col("q.v"), (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x) / (col("p.nrm") * col("q.nrm"))).as("c"))
      .filter(col("c") >= TAU)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(truth.nonEmpty, "test premise: fixture must hold cross-parity matches")
    val byDelta = truth.groupBy(_._1).map { case (dv, ps) =>
      dv -> (ps.map(_._2).min, ps.length.toLong) }

    val probed = Similarity.queries("x_dedup_semantic_incremental")(spark, d)
      .collect().map(r => (r.getLong(0), (r.getLong(2), r.getLong(3)))).toMap
    assert(probed.keySet == byDelta.keySet,
      s"probe key set drift: missing ${(byDelta.keySet -- probed.keySet).size}, " +
        s"extra ${(probed.keySet -- byDelta.keySet).size}")
    byDelta.foreach { case (dv, (minIv, cnt)) =>
      assert(probed(dv) == ((minIv, cnt)),
        s"delta $dv: expected (min=$minIv, n=$cnt), got ${probed(dv)}")
    }
    // Asymmetry by construction: delta ids odd, canonical matches even.
    probed.foreach { case (dv, (iv, _)) =>
      assert(dv % 2 == 1 && iv % 2 == 0, s"non-cross-parity row: $dv -> $iv")
    }
  }

  test("blind spot: a delta vector whose only tau-matches are fellow deltas is not reported") {
    val a = Similarity.ivfAssigned(spark, d, k)
      .select(col("vec_id"), col("cluster"), col("v"), col("nrm"))
    val intra = a.as("p").join(a.as("q"),
        col("p.cluster") === col("q.cluster") &&
          col("p.vec_id") % 2 === 1 && col("q.vec_id") % 2 === 1 &&
          col("p.vec_id") < col("q.vec_id"))
      .select(col("p.vec_id").as("x"), col("q.vec_id").as("y"),
        (aggregate(zip_with(col("p.v"), col("q.v"), (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x) / (col("p.nrm") * col("q.nrm"))).as("c"))
      .filter(col("c") >= TAU)
      .collect().flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    val probed = Similarity.queries("x_dedup_semantic_incremental")(spark, d)
      .collect().map(_.getLong(0)).toSet
    val intraOnly = intra -- probed
    assert(intraOnly.nonEmpty,
      "test premise: some delta vector tau-matches ONLY fellow deltas")
    // ... and the documented composition covers them: the delta's own
    // self-dedup (the auto entry's keep-first pairs restricted to odd ids)
    // is where those pairs belong, per the index-freshness contract.
    intraOnly.foreach(id => assert(!probed.contains(id)))
  }

  test("oracle derives k in-SQL and emits only integral columns") {
    val sql = Similarity.oracleSql("x_dedup_semantic_incremental")
    assert(sql.contains("kk AS (SELECT greatest(16,") &&
      sql.contains("// 25 AS INT)) AS k FROM n)") &&
      sql.contains("(SELECT k FROM kk)"),
      "oracle SQL does not derive k via the sizing-law CTE")
    val df = Similarity.queries("x_dedup_semantic_incremental")(spark, d)
    val types = df.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(types == Map("vec_id" -> "long", "cluster" -> "integer",
      "match_id" -> "long", "n_matches" -> "long"),
      s"non-integral or drifted output schema: $types")
  }
}
