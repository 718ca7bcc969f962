package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed EXACT order-statistic selection (two-phase).
  *
  * The naive exact formulation — `row_number` over a window partitioned by
  * the group column — sorts each group in ONE task: parallelism equals the
  * group count, which on a 3-value group column means three tasks sorting
  * the whole table (measured 31 s for the percentile entry at the 50x
  * scale point). This operator does textbook two-phase selection instead:
  *
  *  1. bucketize rows by a DETERMINISTIC value function of the sort
  *     column (bounds from one control-plane min/max aggregate). Because
  *     the bucket is a pure per-row function, every branch of the query
  *     computes identical buckets — unlike `repartitionByRange`, whose
  *     sampled bounds differ per execution (its seed derives from the RDD
  *     identity), which silently corrupts cross-job rank offsets;
  *  2. take an exact per-(group, bucket) histogram — one parallel groupBy,
  *     collected as control plane (<= groups x nBuckets tiny rows) — and
  *     locate the buckets containing the requested per-group ranks plus
  *     their exclusive prefix offsets;
  *  3. rank ONLY those buckets: an inner broadcast join prunes everything
  *     else before the sort, so the selection pass sorts ~n/nBuckets rows
  *     per group regardless of total size, and global rank = local rank +
  *     bucket offset.
  *
  * Value skew degrades the pruning (a bucket holding most of a group's
  * rows sorts most of that group) but never correctness; for pathological
  * skew raise `nBuckets` or recurse — at 256 buckets a uniform-ish column
  * prunes ~99.6% of the sort.
  */
object ExactSelection {

  /** All rows of the buckets that contain the `wanted` global ranks, with
    * `rn` (exact global rank within the group, 1-based, ordered by
    * `valueCol` then `tieBreak`) and `n` (exact group size) appended.
    * Callers filter `rn` to the ranks they need; `tieBreak` must make the
    * total order strict for ranks to be well-defined.
    *
    * @param wanted the per-group ranks of interest, as a function of the
    *               group size (e.g. median: `n => Seq((n + 1) / 2)`)
    */
  def rankedCandidates(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      tieBreak: Seq[Column],
      nBuckets: Int = 256
  )(wanted: Long => Seq[Long]): DataFrame = {
    val spark = df.sparkSession
    val bounds = df.agg(min(col(valueCol)), max(col(valueCol))).head()
    if (bounds.isNullAt(0)) return df.limit(0)
      .withColumn("rn", lit(0L)).withColumn("n", lit(0L))
    val (mn, mx) = (bounds.getDouble(0), bounds.getDouble(1))
    val w = (mx - mn) / nBuckets
    val bktExpr =
      if (w > 0) least(floor((col(valueCol) - lit(mn)) / lit(w)), lit(nBuckets - 1)).cast("int")
      else lit(0)
    val bucketed = df.withColumn("bkt", bktExpr)

    val hist = bucketed.groupBy(col(groupCol), col("bkt"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.get(0), r.getInt(1), r.getLong(2)))
    val needed = hist.groupBy(_._1).iterator.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      val n = sorted.map(_._3).sum
      val ranks = wanted(n).filter(r => r >= 1 && r <= n)
      val running = sorted.zip(sorted.scanLeft(0L)(_ + _._3))
      running.collect {
        case ((g, b, c), off) if ranks.exists(r => off < r && r <= off + c) => Row(g, b, off, n)
      }
    }.toSeq

    val gField = df.schema(groupCol)
    val offsSchema = StructType(Seq(
      StructField(groupCol, gField.dataType, gField.nullable),
      StructField("bkt", IntegerType, nullable = false),
      StructField("off", LongType, nullable = false),
      StructField("n", LongType, nullable = false)))
    val offs = spark.createDataFrame(
      spark.sparkContext.parallelize(needed, 1), offsSchema)

    val wLocal = Window.partitionBy(col(groupCol), col("bkt"))
      .orderBy(col(valueCol) +: tieBreak: _*)
    bucketed
      .join(broadcast(offs), Seq(groupCol, "bkt"))
      .withColumn("rn_local", row_number().over(wLocal))
      .withColumn("rn", col("rn_local") + col("off"))
      .drop("bkt", "off", "rn_local")
  }
}
