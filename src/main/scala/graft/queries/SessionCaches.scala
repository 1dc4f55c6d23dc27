package graft.queries

import org.apache.spark.sql.SparkSession

/** One-call release of every session-scoped cached intermediate the query
  * layer holds: the shared MinHash pair frames (TextOps), connected-
  * components checkpoint blocks (Extended), and the session's SQL-cache
  * entries (builder-internal `.cache()`s — postings, shingle groups,
  * quantizer bases).
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
    TextOps.releaseSharedPairs(s)
    Extended.releaseCcCheckpoints(s)
    s.catalog.clearCache()
  }
}
