package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.SparkTestSession

/** The kNN-graph triangle join under a HUB vector — the skew case
  * [[GraphOps.graphKnnStats]]'s scaladoc names: a kNN graph bounds
  * OUT-degree at k but leaves IN-degree unbounded, so a hub that appears
  * in everyone's top-k concentrates the wedge join's middle-node shuffle
  * key into one oversized partition. This spec plants exactly that graph
  * (300k nodes all naming one hub, hub keeps out-degree 3 — the realistic
  * kNN shape) and proves AQE's skew split fires on
  * [[GraphOps.triangleJoin]] itself with byte-identical counts, the
  * [[AqeSkewJoinSpec]] discipline applied to the graph operator.
  */
class KnnHubSkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits the hub partition of the triangle wedge join, counts unchanged") {
    val hub = 400000L
    val fanIn = 300000L // everyone's top-k contains the hub -> in-edges (i, hub)
    import spark.implicits._
    // Canonical u<v edge set: the hub's unbounded in-degree (i, hub), its
    // own bounded top-3 out-edges (hub, hub+1..hub+3), and 100 closing
    // edges (i, hub+1) that each complete the triangle (i, hub, hub+1).
    val inEdges = spark.range(0, fanIn).select(col("id").as("u"), lit(hub).as("v"))
    val outEdges = Seq((hub, hub + 1), (hub, hub + 2), (hub, hub + 3)).toDF("u", "v")
    val closing = spark.range(0, 100).select(col("id").as("u"), lit(hub + 1).as("v"))
    val e = inEdges.unionByName(outEdges).unionByName(closing)

    def count(): Long = GraphOps.triangleJoin(e).collect().head.getLong(0)

    var expected = -1L
    withConfs(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      expected = count()
    }
    assert(expected == 100L, s"planted graph must close exactly 100 triangles, got $expected")

    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // the skew split breaks the wedge join's output partitioning; the
      // downstream count doesn't need it, so forcing is safe here
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      val j = GraphOps.triangleJoin(e)
      val got = j.collect().head.getLong(0) // execute so AQE finalizes THIS plan
      assert(got == expected, "AQE skew split changed the triangle count")
      val adaptive = j.queryExecution.executedPlan.collectFirst {
        case a: AdaptiveSparkPlanExec => a
      }.getOrElse(fail("expected an AdaptiveSparkPlanExec root"))
      val rendered = adaptive.executedPlan.toString
      assert(rendered.contains("skew=true"),
        s"expected a skew=true join in the AQE-final plan:\n$rendered")
      assert(rendered.contains("AQEShuffleRead skewed"),
        s"expected a skewed AQEShuffleRead in the AQE-final plan:\n$rendered")
    }
  }
}
