package graft.ops

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Shared persisted-relation cache for the dedup / fingerprint families.
  *
  * One artifact, many audits: the expensive relations these families build
  * (a corpus pair set, a signature table, the exact-Jaccard ground truth)
  * are each read by several catalog entries. In production they'd be
  * materialized ONCE by the dedup pass and every downstream audit would
  * read the stored artifact; in a live session this cache is that
  * materialization — `persist(MEMORY_AND_DISK)` keyed by
  * (session, scale dir, family tag).
  *
  * Lifecycle (the part the per-family ad-hoc caches kept getting wrong):
  *
  *   - Stopped sessions are swept on every access — their persisted
  *     blocks died with the context; the keys are just dead weight.
  *   - A LIVE session is bounded to [[MaxDirsPerSession]] distinct scale
  *     dirs, evicted whole-dir LRU (unpersist + forget). The bound is 2,
  *     not 1, deliberately: a two-scale verify pass interleaves two dirs
  *     in one session, and evict-on-every-dir-switch would thrash —
  *     each access destroying the other dir's persisted artifacts,
  *     possibly while a concurrent job reads them.
  *   - [[clear]] is the explicit hook for long-lived drivers: unpersist
  *     and forget everything the session holds under a tag prefix.
  *
  * Tags are namespaced by family (`"dedup/…"`, `"mm/…"`) so the explicit
  * clear hooks stay family-scoped.
  *
  * Build lambdas must NOT call back into [[shared]]: ConcurrentHashMap
  * forbids updating other mappings from inside `computeIfAbsent`'s mapping
  * function (JDK 9+ throws "Recursive update" when the two keys land in
  * the same bin) — resolve any cached dependency BEFORE calling (see
  * `Dedup.dupLabelsShared`, `Multimodal.audioPairsShared`).
  */
private[graft] class RelCache {
  import RelCache.MaxDirsPerSession

  private final class Entry(val df: DataFrame) {
    @volatile var tick: Long = 0L
  }

  private val clock = new AtomicLong(0L)
  private val map = new ConcurrentHashMap[(SparkSession, String, String), Entry]()
  /** One lock makes {sweep, fetch-or-build, tick bump, LRU evict} a single
    * atomic step (see [[shared]]). Build lambdas only CONSTRUCT plans
    * (persist() is a lazy marking, never a job), so the critical section
    * is microseconds — a coarse lock costs nothing and removes the
    * eviction race the round-13/14 scaladoc could only document. */
  private val lock = new Object

  /** Fetch-or-build the persisted relation for (session, dir, tag).
    *
    * Thread safety: the whole access is one atomic step under [[lock]],
    * so a concurrent access can never observe (or evict against) a stale
    * LRU snapshot — the dir a thread just touched is NEVER the one a
    * racing thread's eviction releases, the per-session dir bound holds
    * at every externally observable instant, and two threads requesting
    * the same key get the same single build (spec-proven under a
    * 2-thread × 3-dir storm in RelCacheSpec). What the lock deliberately
    * does NOT pin: relations are returned for the caller to run jobs on
    * OUTSIDE the lock, so a later access can still LRU-release a relation
    * mid-scan — `unpersist(blocking = false)` keeps that a lineage
    * recompute, never a wrong answer (the designed LRU semantics, not a
    * race). */
  def shared(s: SparkSession, d: String, tag: String)(build: => DataFrame): DataFrame =
    lock.synchronized {
      // Sweep stopped sessions first so dead keys never count toward the
      // live session's dir bound (and never hold DataFrame references).
      val dead = map.entrySet().iterator()
      while (dead.hasNext) if (dead.next().getKey._1.sparkContext.isStopped) dead.remove()
      val e = map.computeIfAbsent((s, d, tag),
        _ => new Entry(build.persist(StorageLevel.MEMORY_AND_DISK)))
      e.tick = clock.incrementAndGet()
      evictLru(s)
      e.df
    }

  /** Bound the session to [[MaxDirsPerSession]] dirs, releasing whole
    * least-recently-used dirs. Always called under [[lock]], AFTER the
    * current access bumped its tick — so the dir just touched is never
    * the one evicted, atomically. */
  private def evictLru(s: SparkSession): Unit = {
    import scala.jdk.CollectionConverters._
    val mine = map.entrySet().asScala.filter(_.getKey._1 eq s).toSeq
    val dirs = mine.groupBy(_.getKey._2)
    if (dirs.size > MaxDirsPerSession) {
      dirs.toSeq
        .sortBy { case (_, es) => es.map(_.getValue.tick).max }
        .dropRight(MaxDirsPerSession)
        .foreach { case (_, es) =>
          es.foreach { e =>
            if (map.remove(e.getKey, e.getValue)) e.getValue.df.unpersist(blocking = false)
          }
        }
    }
  }

  /** Unpersist and forget every relation the session holds whose tag
    * starts with `tagPrefix` ("" clears all) — the explicit lifecycle
    * hook for long-lived sessions. Cached entries rebuild transparently
    * on next access. */
  def clear(s: SparkSession, tagPrefix: String = ""): Unit = lock.synchronized {
    val it = map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if ((e.getKey._1 eq s) && e.getKey._3.startsWith(tagPrefix)) {
        if (!s.sparkContext.isStopped) e.getValue.df.unpersist(blocking = false)
        it.remove()
      }
    }
  }

  /** Test accessor: the (dir, tag, relation) triples a session holds
    * under a tag prefix — lets specs assert on the cache's OWN state
    * instead of the global persistent-RDD count (which any concurrently
    * running suite perturbs). */
  private[graft] def entries(
      s: SparkSession, tagPrefix: String = ""): Seq[(String, String, DataFrame)] = lock.synchronized {
    import scala.jdk.CollectionConverters._
    map.entrySet().asScala
      .filter(e => (e.getKey._1 eq s) && e.getKey._3.startsWith(tagPrefix))
      .map(e => (e.getKey._2, e.getKey._3, e.getValue.df))
      .toSeq
  }
}

/** The process-wide instance every family cache routes through (specs
  * exercising the lifecycle laws build their own [[RelCache]] instance so
  * the global LRU state of concurrently running suites can't perturb
  * them). */
private[graft] object RelCache extends RelCache {
  /** Distinct scale dirs a live session may hold relations for; beyond
    * this the least-recently-used dir is released wholesale. */
  private[graft] val MaxDirsPerSession = 2
}
