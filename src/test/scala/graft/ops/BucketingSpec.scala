package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Co-located joins via bucketing: pre-shuffle both tables once at write
  * time, then every subsequent equi-join on the bucket key runs with ZERO
  * exchanges — the decisive optimization for repeated large-table joins at
  * 100 TB (pay the shuffle once, amortize it over every downstream query).
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("bucketed equi-join runs without a shuffle exchange and matches the plain join") {
    // spark.sql.warehouse.dir is static; explicit per-table paths are enough
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")

    val orders = spark.read.parquet(s"${SparkTestSession.sfDir}/orders.parquet")
    val lineitem = spark.read.parquet(s"${SparkTestSession.sfDir}/lineitem.parquet")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/b_orders").saveAsTable("b_orders")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/b_lineitem").saveAsTable("b_lineitem")

    // Force the join to be non-broadcast so the shuffle question is real
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not introduce exchanges; only the final 3-group
      // aggregation may shuffle
      val joinSection = plan.substring(0, plan.length)
      val exchangesBeforeAgg = "Exchange hashpartitioning\\((l|o)_orderkey".r.findAllIn(joinSection).size
      assert(exchangesBeforeAgg == 0, s"bucketed join must not re-shuffle on the join key:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join over buckets:\n$plan")

      // and it still computes the right answer
      val direct = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val bucketed = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(bucketed == direct)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }
}
