package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** The distributed prefix-sum sharding must equal the naive global-window
  * formulation exactly (the partition layout is an implementation detail),
  * tile the shard-id space contiguously, and respect the bounded-overflow
  * packing law.
  */
class ShardBalancedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir
  private val Budget = 2048L

  private lazy val sharded = TextAnalysis.shardBalanced(spark, dir).cache()

  test("distributed prefix sum equals the single-window reference formulation") {
    import org.apache.spark.sql.expressions.Window
    val h = md5(concat(lit("shard:"), col("doc_id").cast("string")))
    val w = Window.orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // single global window: fine at test scale, the thing the operator
    // replaces at real scale
    val ref = Tables.documents(spark, dir)
      .select(col("doc_id"), TextAnalysis.tokenCountCol(col("text")).cast("long").as("n_tokens"),
        h.as("h"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("n_tokens"),
        floor((col("cum") - col("n_tokens")).cast("double") / Budget).cast("long").as("shard_id"))
    assert(sharded.exceptAll(ref).count() == 0 && ref.exceptAll(sharded).count() == 0)
  }

  test("shard ids are contiguous from 0 and every shard is budget-bounded") {
    val stats = sharded.groupBy(col("shard_id"))
      .agg(sum(col("n_tokens")).as("t")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val k = stats.keySet.max
    assert(stats.keySet == (0L to k).toSet, s"shard ids not contiguous: ${stats.keySet}")
    val maxDoc = sharded.agg(max(col("n_tokens"))).head().getLong(0)
    stats.foreach { case (id, t) =>
      assert(t < Budget + maxDoc, s"shard $id holds $t tokens > budget+maxDoc")
    }
    // every shard except possibly the last actually reaches into its
    // budget interval (no empty-but-numbered shards, no starvation)
    (0L until k).foreach(id => assert(stats(id) > 0))
  }

  test("assignment is deterministic across runs") {
    val again = TextAnalysis.shardBalanced(spark, dir)
    assert(sharded.exceptAll(again).count() == 0 && again.exceptAll(sharded).count() == 0)
  }

  test("repeated Over-form calls reuse one persisted intermediate (no cache leak)") {
    // The composable form persists its range-partitioned intermediate for
    // pid stability; without the plan-keyed session cache every
    // bench/verify re-invocation of the composed pipelines pinned a NEW
    // set of cached blocks. Plan-equal inputs must hit the same entry.
    val docsTok = Tables.documents(spark, dir)
      .select(col("doc_id"), TextAnalysis.tokenCountCol(col("text")).cast("long").as("n_tokens"))
    TextAnalysis.shardBalancedOver(spark, docsTok).count()
    val after1 = spark.sparkContext.getPersistentRDDs.size
    (1 to 3).foreach { _ =>
      val again = Tables.documents(spark, dir)
        .select(col("doc_id"), TextAnalysis.tokenCountCol(col("text")).cast("long").as("n_tokens"))
      TextAnalysis.shardBalancedOver(spark, again).count()
    }
    assert(spark.sparkContext.getPersistentRDDs.size == after1,
      "plan-equal re-invocations must not pin new cached blocks")
  }
}
