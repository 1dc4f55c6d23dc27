package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryProgress

/** Session-scoped memo of a finite streaming replay's drained result —
  * (memory-sink table, per-micro-batch progress) — keyed by
  * (session id, data dir, content stamp), the same staleness rule as the
  * batch-side [[graft.queries.SessionFrameCache]].
  *
  * Why: each replay-backed query pair exposes an OUTPUT query and a
  * METRICS query over the identical drain (DedupIngest.apply/metrics,
  * SessionDedupStream.apply/metrics), and a Verify/Bench pass that
  * evaluates both re-staged and re-drained the same multi-batch streaming
  * replay twice — the slowest queries in the suite, at pure cost. The
  * memory sink collects driver-side anyway, so memoizing the sink table
  * handle adds no residency beyond the one drain; the LRU cap bounds how
  * many drained replays a long-lived session can pin.
  *
  * One thread drains per key (the lazy-holder discipline of
  * Similarity.covarianceMatrix): the map monitor covers only
  * lookup/insert, never a streaming drain.
  */
final class ReplayMemo(maxEntries: Int) {

  private final class Holder(compute: () => (DataFrame, Seq[StreamingQueryProgress])) {
    lazy val value: (DataFrame, Seq[StreamingQueryProgress]) = compute()
  }

  private val sessionIds = new java.util.WeakHashMap[SparkSession, String]()
  private def sessionId(s: SparkSession): String = sessionIds.synchronized {
    Option(sessionIds.get(s)).getOrElse {
      val id = java.util.UUID.randomUUID().toString
      sessionIds.put(s, id)
      id
    }
  }

  private val memo = new java.util.LinkedHashMap[String, Holder](8, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[String, Holder]): Boolean =
      size() > maxEntries
  }

  /** `tag` distinguishes parameterized replays over the same data dir
    * (e.g. the dedup-delay sweep's per-delay drains) without perturbing
    * the ContentStamp path.
    */
  def getOrRun(s: SparkSession, sfDir: String, tag: String = "")(
      run: => (DataFrame, Seq[StreamingQueryProgress]))
      : (DataFrame, Seq[StreamingQueryProgress]) = {
    val key = sessionId(s) + "|" + sfDir + "|" + tag + "|" +
      graft.queries.ContentStamp.of(sfDir)
    val holder = memo.synchronized {
      Option(memo.get(key)).getOrElse {
        val h = new Holder(() => run)
        memo.put(key, h)
        h
      }
    }
    holder.value
  }
}
