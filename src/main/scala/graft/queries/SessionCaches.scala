package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One-call release of every session-scoped cached intermediate the query
  * layer holds: the shared MinHash pair frames and converged CC label
  * frames ([[SessionFrameCache]] instances in TextOps / Extended),
  * connected-components checkpoint blocks (Extended), and the session's
  * SQL-cache entries (builder-internal `.cache()`s — postings, shingle
  * groups, quantizer bases).
  *
  * Call BETWEEN pipeline stages, after the stage's outputs are
  * materialized: released frames must not be re-executed (checkpointed
  * lineage is truncated; cached plans recompute from scratch). Bench and
  * Verify call this after their sweep; SharedCacheLifecycleSpec asserts the
  * result is zero persisted blocks — the bounded-residency contract a
  * long-lived multi-tenant session needs.
  */
object SessionCaches {
  def releaseAll(s: SparkSession): Unit = {
    // label frames are backed by CC checkpoint blocks: release them before
    // the checkpoints so nothing cached ever points at freed lineage
    Extended.releaseCcLabels(s)
    TextOps.releaseSharedPairs(s)
    Extended.releaseCcCheckpoints(s)
    s.catalog.clearCache()
  }
}

/** Session-scoped LRU cache of materialized intermediate frames — the
  * materialized-intermediate pattern a production pipeline DAG uses when
  * several downstream queries start from one expensive shared stage.
  *
  * Lifecycle (bounded — a long-lived multi-tenant session must not grow an
  * unbounded map of persisted frames):
  *  - keyed by a weak-ref per-session UUID + data dir. The UUID is stable
  *    and never reused, unlike `System.identityHashCode`, which the JVM may
  *    hand to a NEW session after the old one is collected — a collision
  *    would serve blocks bound to a stopped context.
  *  - LRU-capped at `maxEntries`; the evicted frame is unpersisted as it
  *    leaves.
  *  - [[release]] unpersists and drops every entry of a session, for
  *    pipelines that want the blocks back between stages (Bench and Verify
  *    do this via [[SessionCaches.releaseAll]] after their sweep).
  * Assumes the data dir's contents are immutable within a session — the
  * same assumption Spark's own SQL cache makes for any cached scan.
  */
final class SessionFrameCache(maxEntries: Int) {

  /** Stable, never-reused id per live session: a WeakHashMap entry dies
    * with the session (no strong ref pinning stopped sessions), and the
    * UUID can never collide the way a recycled identityHashCode can.
    */
  private val sessionIds = new java.util.WeakHashMap[SparkSession, String]()
  private def sessionId(s: SparkSession): String = sessionIds.synchronized {
    Option(sessionIds.get(s)).getOrElse {
      val id = java.util.UUID.randomUUID().toString
      sessionIds.put(s, id)
      id
    }
  }

  private val cache =
    new java.util.LinkedHashMap[String, DataFrame](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, DataFrame]): Boolean = {
        val evict = size() > maxEntries
        // stopped-session frames can't unpersist; eviction must still happen
        if (evict) try e.getValue.unpersist(blocking = false) catch { case _: Throwable => () }
        evict
      }
    }

  /** The cached frame for (session, dir), building + persisting it on first
    * use. The eager count() materializes the blocks so reuse never re-plans
    * the upstream pass.
    */
  def getOrBuild(s: SparkSession, d: String)(build: => DataFrame): DataFrame =
    cache.synchronized {
      val key = sessionId(s) + "|" + d
      Option(cache.get(key)).getOrElse {
        val df = build.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        df.count()
        cache.put(key, df)
        df
      }
    }

  /** Unpersist and drop every cached frame belonging to session `s`. */
  def release(s: SparkSession): Unit = cache.synchronized {
    val it = cache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey.startsWith(sessionId(s) + "|")) {
        try e.getValue.unpersist(blocking = true) catch { case _: Throwable => () }
        it.remove()
      }
    }
  }
}
