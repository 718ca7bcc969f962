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

  test("concurrent access is atomic: dir bound observable-invariant, no recompute storm, no lost relations") {
    val c = new RelCache
    val iters = 300
    val nBuilds = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicInteger]()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def touch(dir: String): Unit = {
      val df = c.shared(spark, dir, ns + "c") {
        nBuilds.computeIfAbsent(dir, _ => new java.util.concurrent.atomic.AtomicInteger)
          .incrementAndGet()
        spark.range(3).toDF("v")
      }
      assert(df != null, "shared returned no relation")
      // The bound must hold at EVERY externally observable instant — the
      // pre-lock implementation could expose a 3-dir window (and, worse,
      // evict against a stale LRU snapshot) between computeIfAbsent and
      // evictLru of racing threads.
      val dirs = c.entries(spark, ns).map(_._1).distinct
      assert(dirs.size <= RelCache.MaxDirsPerSession, s"dir bound violated: $dirs")
    }
    def thread(body: => Unit): Thread = {
      val t = new Thread(() => try body catch { case x: Throwable => errs.add(x) })
      t.start(); t
    }
    // Thread A ping-pongs two hot dirs (both fit the bound); thread B
    // touches a cold third dir once, mid-storm.
    val a = thread((0 until iters).foreach(i => touch(if (i % 2 == 0) "hotA" else "hotB")))
    val b = thread { Thread.sleep(5); touch("coldC") }
    a.join(); b.join()
    assert(errs.isEmpty, s"concurrent access failed: ${errs.peek()}")
    // No recompute storm: with {tick bump, evict} atomic, the single cold
    // touch evicts at most ONE hot dir exactly once (its re-touch then
    // evicts coldC, restoring the hot pair) — so across 301 accesses the
    // build counts are hot ≤ 2 each, cold == 1. A racy LRU could evict a
    // just-touched hot dir over and over.
    val counts = { import scala.jdk.CollectionConverters._
      nBuilds.asScala.map { case (k, v) => k -> v.get() }.toMap }
    assert(counts.getOrElse("coldC", 0) == 1, s"cold dir must build once: $counts")
    assert(counts("hotA") <= 2 && counts("hotB") <= 2, s"hot-dir recompute storm: $counts")
    // no lost relations: the surviving entries still compute
    c.entries(spark, ns).foreach { case (_, _, df) => assert(df.count() == 3) }
    c.clear(spark, ns)
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
