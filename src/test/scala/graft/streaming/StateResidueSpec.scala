package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Pins the bounded-stream teardown law behind the r18 interference fix
  * (SURVEY §8.5): a finished stateful `Trigger.AvailableNow` run must leave
  * ZERO state-store providers loaded in the JVM-global registry. Without
  * the `drain` teardown, every stateful parity run leaves its
  * per-(operator, partition) providers resident — heap + periodic
  * maintenance work that taxed later batch queries 2-3x in the sf5
  * ablation. The registry is private to Spark, so the assertion reads it
  * reflectively — a test-only seam; production code goes through
  * `graftbridge.StreamStateResidue`.
  */
class StateResidueSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def loadedProviderCount(): Int = {
    val cls = Class.forName(
      "org.apache.spark.sql.execution.streaming.state.StateStore$")
    val module = cls.getField("MODULE$").get(null)
    val f = cls.getDeclaredField("loadedProviders")
    f.setAccessible(true)
    f.get(module).asInstanceOf[scala.collection.mutable.HashMap[_, _]]
      .synchronized { f.get(module).asInstanceOf[scala.collection.mutable.HashMap[_, _]].size }
  }

  test("a finished stateful parity run leaves zero loaded state-store providers") {
    // The hourly parity entry runs a real watermarked streaming aggregation
    // (stateful: its micro-batches load one provider per state partition).
    val out = graft.ops.MoreQueries.qStreamHourlyParity(spark, SparkTestSession.sfDir)
    assert(out.count() > 0)
    assert(loadedProviderCount() == 0,
      "drain() must unload every provider the bounded run loaded")
  }
}
