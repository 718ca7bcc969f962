package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Normalization-keyed dedup: the planted byte-variant clones must be
  * raw-unique (every clone hashes differently from its source) yet
  * norm-identical (the canonicalizer folds each clone back), so the
  * variant-group count per language is exactly the clone count.
  */
class DedupNormSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = SparkTestSession.sfDir

  test("case folding is ASCII-only: non-roundtripping Unicode (ß, İ) cannot break the invariant") {
    import spark.implicits._
    // Unicode upper('ß')='SS' (lowers to 'ss' ≠ 'ß') and upper/lower of
    // 'İ' disagree across JDK vs utf8proc — the exact breakage the
    // ASCII-only translate pair is immune to: clone-then-normalize must
    // equal normalize for ANY text, non-ASCII included.
    val texts = Seq("Straße İstanbul MIXED case", "ß İ ı ffi", "plain ascii Text")
    val up = translate(col("t"), "abcdefghijklmnopqrstuvwxyz", "ABCDEFGHIJKLMNOPQRSTUVWXYZ")
    val down = (c: org.apache.spark.sql.Column) =>
      translate(c, "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz")
    val rows = texts.toDF("t")
      .select(down(up).as("clone_folded"), down(col("t")).as("src_folded"))
      .collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1),
      s"ASCII fold not a clone/source congruence: ${r.getString(0)} vs ${r.getString(1)}"))
  }

  test("variant groups equal the planted clone count per language") {
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val clones = docs.filter(col("doc_id") % 7 === 3 || col("doc_id") % 7 === 5)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_clones"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), countDistinct(md5(col("text"))).as("u"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

    val rows = Dedup.dedupNormalized(spark, d).collect()
    rows.foreach { r =>
      val lang = r.getString(0)
      val (nDocs, nRaw, nNorm, nVar) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val nClones = clones.getOrElse(lang, 0L)
      assert(nDocs == base(lang)._1 + nClones)
      // this corpus has no raw duplicates, so raw-unique counts everything...
      assert(nRaw == base(lang)._1 + nClones)
      // ...and every clone folds back onto its source under normalization
      assert(nNorm == base(lang)._2)
      assert(nVar == nClones)
    }
  }
}
