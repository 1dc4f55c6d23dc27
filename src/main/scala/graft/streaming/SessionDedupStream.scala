package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CHAINED stateful streaming: ingest dedup feeding session windows in
  * ONE query — `dropDuplicatesWithinWatermark` → `session_window`
  * aggregation, the composition a training-data pipeline deploys when the
  * session table must never double-count re-delivered events. Spark
  * supports multiple stateful operators per query (append mode, one
  * watermark) precisely for this; the replay pins that the composition
  * yields EXACTLY the batch sessions over the distinct event set.
  *
  * Staged batches (file mod times fix the order):
  *   b0  every event. Late-filter watermark still 0 → all admitted; the
  *       dedup state holds every key, session state opens every session.
  *   b1  the nudge (the max-ts row re-delivered): suppressed by dedup
  *       state, its only job is advancing BOTH watermark versions one
  *       batch before the slice arrives. Without it, the composition has
  *       a real cold-start hole: a re-delivery one batch behind passes
  *       the still-zero (lagged) late filter while dedup state has
  *       already been evicted to the 2·delay horizon — and re-enters the
  *       session operator as a double count. The nudge closes it, same
  *       as DedupIngest.
  *   b2  the re-delivered 10% slice (event_id % 10 == 3). Re-deliveries
  *       behind the raw-ts watermark are late-dropped; the rest are
  *       suppressed by dedup state (their expiry ≥ wm + delay, see
  *       DedupIngest) — NOTHING reaches the session operator either way,
  *       so no session shifts or splits.
  *   b3  per-user far-future sentinels with UNIQUE negative event_ids
  *       (−user_id − 1): unique so the dedup stage passes every one
  *       through (a shared −1 id would dedup to a single user's flush —
  *       the composition's one staging subtlety). They advance the
  *       watermark past every real session; the final no-data batch
  *       flushes them all. Sentinel sessions sit a year out, stay
  *       unflushed, and are additionally excluded by the n_events > 0
  *       guard (sentinels count 0 real events).
  *
  * Oracle: the SAME gaps-and-islands SQL as w3b_session_window /
  * stream_session_window — re-deliveries must leave no trace.
  */
object SessionDedupStream {

  def apply(spark: SparkSession, sfDir: String): DataFrame =
    graft.tables.Tables.withShufflePartitions(spark, 4) {
      val staged = Files.createTempDirectory("stream-session-dedup")
      try {
        val raw = spark.read.parquet(s"$sfDir/events.parquet")
        require(raw.head(1).nonEmpty,
          s"$sfDir/events.parquet is empty — cannot stage a session-dedup replay")
        val ev = graft.tables.Tables.toEventTime(raw, "ts")
          .select(col("event_id"), col("ts"), col("user_id"))
        StagedEvents.writePart(ev, staged, "b0_all.parquet", 60)
        StagedEvents.writePart(
          ev.orderBy(col("ts").desc, col("event_id").desc).limit(1),
          staged, "b1_nudge.parquet", 45)
        StagedEvents.writePart(ev.filter(col("event_id") % 10 === 3),
          staged, "b2_redelivered.parquet", 30)
        val sentinelTs =
          ev.agg((max(col("ts")) + expr("INTERVAL 365 DAYS")).as("t")).head().get(0)
        val sentinels = ev.select(col("user_id")).distinct()
          .select((-col("user_id") - 1).as("event_id"),
            lit(sentinelTs).as("ts"), col("user_id"))
        StagedEvents.writePart(sentinels, staged, "b3_sentinels.parquet", 15)
        val schema =
          spark.read.parquet(staged.resolve("b0_all.parquet").toString).schema
        val sessions = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(staged.toString)
          .withWatermark("ts", s"${LateDrop.DelayMinutes} minutes")
          .dropDuplicatesWithinWatermark("event_id")
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
          .agg(
            sum(when(col("event_id") >= 0, 1L).otherwise(0L)).as("n_events"),
            ((max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
              / 1000000.0).as("duration_sec"))
        Drain.toMemory(spark, "stream_session_dedup", sessions)
          .filter(col("n_events") > 0)
          .select(col("user_id"), col("n_events"), col("duration_sec"))
      } finally StagedEvents.deleteRecursively(staged)
    }
}
