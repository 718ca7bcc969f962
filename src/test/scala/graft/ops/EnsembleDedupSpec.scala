package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** The ensemble (lexical ∪ semantic) near-dup's contract on real corpus
  * data: its pair set is EXACTLY the union of the two constituent catalog
  * relations, each pair's flags report exactly which detector(s) fired,
  * and the two detectors genuinely disagree in both directions on this
  * corpus (otherwise the ensemble would be decoration, not coverage).
  */
class EnsembleDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.001"

  private val TAU = 0.4
  private lazy val k: Int = {
    val n = Tables.embeddings(spark, d).count()
    math.max(16, ((n + 24) / 25).toInt)
  }

  private lazy val lexical: Set[(Long, Long)] =
    Dedup.dedupMinhashLsh(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val semantic: Set[(Long, Long)] = {
    val a = Similarity.ivfAssigned(spark, d, k)
      .select(col("vec_id"), col("cluster"), col("v"), col("nrm"))
    a.as("p").join(a.as("q"),
        col("p.cluster") === col("q.cluster") &&
          col("p.vec_id") < col("q.vec_id"))
      .filter(aggregate(zip_with(col("p.v"), col("q.v"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x) / (col("p.nrm") * col("q.nrm")) >= TAU)
      .select(col("p.vec_id"), col("q.vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("the ensemble is exactly the flagged union of its constituents") {
    val rows = Similarity.queries("x_dedup_ensemble")(spark, d).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getInt(2), r.getInt(3))))
    assert(rows.length == rows.map(_._1).distinct.length, "a pair surfaced twice")
    val ens = rows.toMap
    assert(ens.keySet == (lexical ++ semantic))
    ens.foreach { case (p, (viaLex, viaSem)) =>
      assert(viaLex == (if (lexical(p)) 1 else 0), s"lexical flag wrong for $p")
      assert(viaSem == (if (semantic(p)) 1 else 0), s"semantic flag wrong for $p")
    }
    // Premise that makes the ensemble worth running: each detector finds
    // pairs the other misses (verbatim-only vs paraphrase-only). The
    // synthetic corpus plants text near-dups and embedding clusters
    // INDEPENDENTLY, so full agreement pairs are coincidental and may be
    // absent at this scale — disagreement in both directions is the law.
    assert((lexical -- semantic).nonEmpty, "no lexical-only pairs in fixture")
    assert((semantic -- lexical).nonEmpty, "no semantic-only pairs in fixture")
  }

  test("the entry emits only integral columns") {
    val df = Similarity.queries("x_dedup_ensemble")(spark, d)
    val types = df.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(types == Map("doc_a" -> "long", "doc_b" -> "long",
      "via_lexical" -> "integer", "via_semantic" -> "integer"),
      s"non-integral or drifted schema: $types")
  }
}
