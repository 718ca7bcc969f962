package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Invariants of the cluster-medoid sampler on the real sf0.001 corpus:
  * one representative per populated cluster, cluster sizes tile the
  * corpus, cosines are sane, and the selection is deterministic.
  */
class ClusterMedoidsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir

  private lazy val med = Similarity.clusterMedoids(spark, dir).cache()

  test("one medoid per populated cluster; sizes tile the corpus") {
    assert(med.count() == med.select(col("cluster")).distinct().count())
    val n = Tables.embeddings(spark, dir).count()
    assert(med.agg(sum(col("csize"))).head().getLong(0) == n)
    assert(med.count() > 1, "fixture must populate multiple clusters")
  }

  test("medoid cosine ppm is a valid similarity and every id is distinct") {
    val rows = med.select(col("cos_ppm"), col("medoid_id")).collect()
    rows.foreach(r => assert(r.getLong(0) >= -1000001L && r.getLong(0) <= 1000000L))
    assert(rows.map(_.getLong(1)).distinct.length == rows.length)
  }

  test("selection is deterministic across plan executions") {
    val again = Similarity.clusterMedoids(spark, dir)
    assert(med.exceptAll(again).count() == 0 && again.exceptAll(med).count() == 0)
  }

  test("plan law: at most one shuffle, on the cluster id; nothing cartesian") {
    // Assignment is a per-row expression, both windows share the cluster
    // partitioning: the whole operator is scan -> ≤1 exchange -> windows.
    // ZERO exchanges is legal and better — when the (data-width-sized)
    // cached corpus is a single partition, it already satisfies the
    // windows' clustered distribution and Spark elides the exchange.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    // Drop the suite-level cache first: CacheManager plan-matching would
    // otherwise serve the whole query as one InMemoryTableScan.
    med.unpersist(blocking = true)
    val nodes = graft.PlanTest.executedNodes(Similarity.clusterMedoids(spark, dir))
    val shuffles = nodes.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.size <= 1, s"expected at most 1 shuffle, got ${shuffles.size}")
    assert(!nodes.exists {
      case _: BroadcastNestedLoopJoinExec | _: CartesianProductExec => true
      case _ => false
    })
  }
}
