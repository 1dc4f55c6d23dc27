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

  /** Stage the four-batch replay and drain the chained query; returns the
    * drained session rows plus the per-micro-batch progress — shared by
    * the output query ([[apply]]) and the monitoring query ([[metrics]]).
    * Memoized per (session, dir, content stamp) via [[ReplayMemo]] so a
    * pass evaluating both queries drains the four-batch replay once.
    */
  private val memo = new ReplayMemo(4)
  private def run(spark: SparkSession, sfDir: String)
      : (DataFrame, Seq[org.apache.spark.sql.streaming.StreamingQueryProgress]) =
    runAt(spark, sfDir, LateDrop.DelayMinutes.toInt)

  private def runAt(spark: SparkSession, sfDir: String, delayMin: Int)
      : (DataFrame, Seq[org.apache.spark.sql.streaming.StreamingQueryProgress]) =
    memo.getOrRun(spark, sfDir, s"delay=$delayMin")(drain(spark, sfDir, delayMin))

  private def drain(spark: SparkSession, sfDir: String, delayMin: Int)
      : (DataFrame, Seq[org.apache.spark.sql.streaming.StreamingQueryProgress]) = {
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
          .withWatermark("ts", s"$delayMin minutes")
          .dropDuplicatesWithinWatermark("event_id")
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
          .agg(
            sum(when(col("event_id") >= 0, 1L).otherwise(0L)).as("n_events"),
            ((max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
              / 1000000.0).as("duration_sec"))
        Drain.toMemoryWithProgress(spark, "stream_session_dedup", sessions)
      } finally StagedEvents.deleteRecursively(staged)
  }

  def apply(spark: SparkSession, sfDir: String): DataFrame =
    graft.tables.Tables.withShufflePartitions(spark, 4) {
      run(spark, sfDir)._1
        .filter(col("n_events") > 0)
        .select(col("user_id"), col("n_events"), col("duration_sec"))
    }

  /** The TWO-OPERATOR state-boundedness contract of the chain, one row
    * per data batch: input rows, late-filter drops, and numRowsTotal per
    * state operator (dedup keys / open session windows) — every cell
    * replayed in SQL. The replay rules compose the pinned singles:
    *
    *   batch 0 (all N): nothing evicted (watermark 0) — dedup holds all
    *     N keys, session state holds every merged session (one state row
    *     per SESSION, not per event — spec-pinned).
    *   batch 1 (nudge): eviction wm = max − delay. Dedup evicts to the
    *     2·delay horizon (ts ≥ max − 2·delay); sessions whose close
    *     (last event + gap) ≤ wm flush and leave state — the open
    *     sessions are those with close > wm.
    *   batch 2 (slice): late filter drops raw ts < wm; the rest are
    *     dedup-suppressed. Neither state moves.
    *   batch 3 (per-user sentinels): U unique new keys pass dedup
    *     (+U dedup rows) and open U far-future sessions (+U session
    *     rows); eviction wm is still the batch-2 watermark, so the real
    *     open sessions remain.
    *
    * Both columns are horizon-bounded at any stream length: dedup by the
    * 2·delay key horizon, sessions by the set still open within gap of
    * the watermark — the pair a production monitor alerts on.
    */
  private def metricsRows(spark: SparkSession, sfDir: String, delayMin: Int)
      : Seq[(Int, Long, Long, Long, Long)] = {
    val (_, progress) = runAt(spark, sfDir, delayMin)
    progress
      .filter(p => p.numInputRows > 0)
      .sortBy(_.batchId)
      .zipWithIndex
      .map { case (p, ord) =>
        val (dedupOps, sessOps) = p.stateOperators
          .partition(_.operatorName.toLowerCase.contains("dedup"))
        (ord, p.numInputRows,
          p.stateOperators.map(_.numRowsDroppedByWatermark).sum,
          dedupOps.map(_.numRowsTotal).sum,
          sessOps.map(_.numRowsTotal).sum)
      }.toSeq
  }

  def metrics(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.tables.Tables.withShufflePartitions(spark, 4) {
      metricsRows(spark, sfDir, LateDrop.DelayMinutes.toInt)
        .toDF("batch_ord", "input_rows", "dropped_rows", "dedup_state", "session_state")
        .select(col("batch_ord").cast("int").as("batch_ord"),
          col("input_rows"), col("dropped_rows"),
          col("dedup_state"), col("session_state"))
    }
  }

  /** The DELAY × GAP horizon sweep (gap fixed at the session operator's
    * 30 min): the two-operator metrics table replayed at dedup delays on
    * BOTH sides of the gap — 119 (delay ≫ gap: the late filter admits
    * nearly the whole re-delivered slice and dedup state must suppress
    * it; most sessions stay OPEN in state), 47, and 17 (delay < gap: the
    * raw-ts watermark now late-drops most of the slice BEFORE dedup
    * state is consulted, dedup state shrinks to the 2·delay≈34 min tail
    * — narrower than one session gap — and the watermark has flushed
    * almost every session out of state). Which operator drops what at
    * each horizon is exactly the table a pipeline owner reads before
    * choosing a watermark delay against a session gap; every cell
    * replays in SQL from the parameterized watermark rules.
    */
  val SweepDelays: Seq[Int] = Seq(119, 47, 17)

  def sweep(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.tables.Tables.withShufflePartitions(spark, 4) {
      SweepDelays.flatMap { d =>
        metricsRows(spark, sfDir, d).map { case (ord, in, drp, ded, sess) =>
          (d, ord, in, drp, ded, sess)
        }
      }.toDF("delay_min", "batch_ord", "input_rows", "dropped_rows",
        "dedup_state", "session_state")
        .select(col("delay_min").cast("int").as("delay_min"),
          col("batch_ord").cast("int").as("batch_ord"),
          col("input_rows"), col("dropped_rows"),
          col("dedup_state"), col("session_state"))
    }
  }
}
