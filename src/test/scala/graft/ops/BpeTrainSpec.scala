package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** BPE training: the classic low/lower/newest worked example with every
  * merge, count, and compression point hand-computed — which pins the
  * pair-count weighting, the (count desc, pair asc) argmax tie-break
  * ('l o' beats 'o w' at 5-all), AND the greedy left-to-right fold — plus
  * the monotone-compression property on real data.
  */
class BpeTrainSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("hand-computed merges, counts, and compression on low/lower/newest") {
    val dir = java.nio.file.Files.createTempDirectory("bpe").toString
    Seq((1L, "low low low lower lower newest"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.bpeTrainMerges(spark, dir, nMerges = 3)
      .orderBy(col("step"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out(0) == ((1, "l o", 5L, 25L)), s"merge 1: ${out.toList}")
    assert(out(1) == ((2, "lo w", 5L, 20L)), s"merge 2: ${out.toList}")
    assert(out(2) == ((3, "Ġ low", 4L, 16L)), s"merge 3: ${out.toList}")
  }

  test("tokenize-by-dictionary totals equal the training curve's final point") {
    val dir = java.nio.file.Files.createTempDirectory("bpeapp").toString
    Seq((1L, "low low low lower lower newest"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val applied = TextAnalysis.bpeApply(spark, dir, nMerges = 3)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // 6 pretokens; low=1, Ġlow=1 x2, Ġlower=3, Ġnewest=7 -> 16 BPE tokens
    assert(applied("en") == ((6L, 16L)), s"apply: $applied")
    // invariant on the real corpus too: apply's total IS the last
    // compression point of the curve (same dictionary, same corpus)
    val curve = TextAnalysis.bpeTrainMerges(spark, SparkTestSession.sfDir, nMerges = 3)
      .orderBy(col("step")).collect().map(_.getLong(3))
    val total = TextAnalysis.bpeApply(spark, SparkTestSession.sfDir, nMerges = 3)
      .agg(sum(col("n_bpe_tokens"))).head().getLong(0)
    assert(total == curve.last, s"apply total $total != final curve point ${curve.last}")
  }

  test("compression curve strictly decreases on the real corpus") {
    val out = TextAnalysis.bpeTrainMerges(spark, SparkTestSession.sfDir, nMerges = 3)
      .orderBy(col("step")).collect().map(_.getLong(3))
    assert(out.length == 3 && out.sliding(2).forall(p => p(1) < p(0)),
      s"each merge must shrink the corpus symbol count: ${out.toList}")
  }
}
