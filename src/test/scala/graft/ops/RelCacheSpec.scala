package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.storage.StorageLevel
import graft.SparkTestSession

/** Lifecycle laws of the shared persisted-relation cache: interleaving
  * two scale dirs must NOT thrash (the two-scale verify pass), a third
  * dir evicts the least-recently-used dir wholesale, and the explicit
  * clear hook is tag-prefix-scoped. Uses a private tag namespace so
  * concurrently running suites (which share the session and the real
  * `dedup/` / `mm/` namespaces) can't perturb the assertions. */
class RelCacheSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // A private instance: the lifecycle laws (global per-session LRU) would
  // race with concurrent suites if tested against the shared singleton.
  private val cache = new RelCache
  private val ns = "relcachespec/"
  private var builds = 0
  private def build(n: Int) = { builds += 1; spark.range(n).toDF("v") }

  test("two dirs interleave without thrash; a third evicts the LRU dir") {
    cache.clear(spark, ns)
    builds = 0
    val a1 = cache.shared(spark, "dirA", ns + "t")(build(1))
    val b1 = cache.shared(spark, "dirB", ns + "t")(build(2))
    // Interleaved re-access: both dirs stay cached — same instances, no
    // rebuild, both still persisted (the evict-on-every-dir-switch bug
    // destroyed the other dir's artifact on each access).
    assert(cache.shared(spark, "dirA", ns + "t")(build(1)) eq a1)
    assert(cache.shared(spark, "dirB", ns + "t")(build(2)) eq b1)
    assert(builds == 2, "interleaving two dirs must not rebuild")
    assert(a1.storageLevel.useMemory && b1.storageLevel.useMemory)

    // dirA is now least-recently-used (dirB was touched last); a third
    // dir must evict dirA wholesale and leave dirB + dirC held.
    cache.shared(spark, "dirA", ns + "t")(build(1)) // make dirB the LRU
    val c1 = cache.shared(spark, "dirC", ns + "t")(build(3))
    val dirs = cache.entries(spark, ns).map(_._1).toSet
    assert(dirs == Set("dirA", "dirC"), s"expected LRU dirB evicted, held $dirs")
    assert(b1.storageLevel == StorageLevel.NONE, "evicted dir must be unpersisted")
    assert(a1.storageLevel.useMemory && c1.storageLevel.useMemory)
    cache.clear(spark, ns)
  }

  test("clear is tag-prefix-scoped and evicted entries rebuild transparently") {
    cache.clear(spark, ns)
    cache.shared(spark, "dirA", ns + "x")(build(1))
    val keep = cache.shared(spark, "dirA", ns + "other/y")(build(2))
    cache.clear(spark, ns + "x")
    val tags = cache.entries(spark, ns).map(_._2)
    assert(tags == Seq(ns + "other/y"), s"prefix clear must only drop matching tags: $tags")
    assert(keep.storageLevel.useMemory)
    // rebuild after clear: a NEW relation, persisted again
    builds = 0
    val again = cache.shared(spark, "dirA", ns + "x")(build(1))
    assert(builds == 1 && again.storageLevel.useMemory)
    cache.clear(spark, ns)
  }
}
