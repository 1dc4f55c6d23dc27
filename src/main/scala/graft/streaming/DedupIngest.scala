package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest-time streaming deduplication with a BOUNDED state horizon —
  * `dropDuplicatesWithinWatermark`, the shape a training-data pipeline
  * actually deploys (exact-dedup state cannot grow with the stream). The
  * replay stages a re-delivered 10% slice (event_id % 10 == 3) two
  * batches behind the original delivery, with a one-row nudge batch in
  * between so both watermark versions (late filter AND state eviction —
  * they lag each other by one batch, see LateDrop) are live when the
  * re-deliveries arrive. What the replay then demonstrates — pinned in
  * DedupIngestSpec — is the exactly-once COMPOSITION the operator is
  * deployed for: re-deliveries within the watermark horizon are
  * suppressed by dedup state, re-deliveries beyond it are dropped by the
  * late-record filter before they can re-enter, and the drained output is
  * therefore EXACTLY the distinct event set — the batch answer — while
  * state stays bounded by the horizon. Neither path can double-count.
  *
  * The drained row set is aggregated hourly batch-side (bounded output);
  * no sentinel is needed because dedup emits first-seen rows immediately
  * in append mode — nothing waits on a final flush.
  */
object DedupIngest {

  /** Stage the three-batch re-delivery replay and drain the
    * dropDuplicatesWithinWatermark stream through it; returns the drained
    * first-seen row set plus the per-micro-batch progress — the shared
    * scaffold of the output query ([[apply]]) and the monitoring query
    * ([[metrics]]). Memoized per (session, dir, content stamp) via
    * [[ReplayMemo]] so a pass evaluating BOTH queries stages and drains
    * the replay once, not twice.
    */
  private val memo = new ReplayMemo(2)
  private def run(spark: SparkSession, sfDir: String)
      : (DataFrame, Seq[org.apache.spark.sql.streaming.StreamingQueryProgress]) =
    memo.getOrRun(spark, sfDir)(drain(spark, sfDir))

  private def drain(spark: SparkSession, sfDir: String)
      : (DataFrame, Seq[org.apache.spark.sql.streaming.StreamingQueryProgress]) = {
    val staged = Files.createTempDirectory("stream-dedup-ingest")
    try {
      val raw = spark.read.parquet(s"$sfDir/events.parquet")
      require(raw.head(1).nonEmpty,
        s"$sfDir/events.parquet is empty — cannot stage a re-delivery replay")
      val ev = graft.tables.Tables.toEventTime(raw, "ts")
        .select(col("event_id"), col("ts"), col("event_type"), col("value"))
      StagedEvents.writePart(ev, staged, "b0_all.parquet", 60)
      // the nudge batch: one certainly-still-in-state re-delivery (the
      // max-ts row), suppressed by the dedup state, whose only effect is
      // advancing the eviction/late watermarks one batch before the
      // re-delivered slice arrives
      StagedEvents.writePart(
        ev.orderBy(col("ts").desc, col("event_id").desc).limit(1),
        staged, "b1_nudge.parquet", 45)
      StagedEvents.writePart(ev.filter(col("event_id") % 10 === 3),
        staged, "b2_redelivered.parquet", 30)
      val schema = spark.read.parquet(staged.resolve("b0_all.parquet").toString).schema
      val deduped = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staged.toString)
        .withWatermark("ts", s"${LateDrop.DelayMinutes} minutes")
        .dropDuplicatesWithinWatermark("event_id")
      Drain.toMemoryWithProgress(spark, "stream_dedup_ingest", deduped)
    } finally StagedEvents.deleteRecursively(staged)
  }

  def apply(spark: SparkSession, sfDir: String): DataFrame =
    graft.tables.Tables.withShufflePartitions(spark, 4) {
      run(spark, sfDir)._1
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00")
            .as("hour_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          (sum(round(col("value") * 100).cast("long")) / 100.0).as("value_sum"))
    }

  /** The DEDUP-STATE boundedness contract, asserted per batch rather than
    * designed for (the stream_late_metrics discipline): one row per data
    * batch with the observe-free input count, the late-filter drop count,
    * and the state store's numRowsTotal. The replay rules — all in SQL:
    *
    *   batch 0 (all N events): eviction watermark is still 0, so state
    *     holds every distinct event_id → (0, N, 0, N).
    *   batch 1 (the max-ts nudge): eviction now runs at wm = max(ts) −
    *     delay; a key survives iff its expiry ts + delay ≥ wm, i.e.
    *     ts ≥ max(ts) − 2·delay — the horizon is 2·delay wide because the
    *     expiry extends delay forward while the watermark trails delay
    *     behind → (1, 1, 0, |ts ≥ max − 2·delay|).
    *   batch 2 (the re-delivered slice): the late filter drops a
    *     re-delivery iff its RAW event time is behind the live watermark
    *     (ts < wm — the standard watermark filter, NOT the expiry test;
    *     pinned in DedupIngestSpec where the 07:00 key is late-filtered
    *     even though its state entry still lives). Admitted re-deliveries
    *     (ts ≥ wm) are guaranteed still in state — their expiry
    *     ts + delay ≥ wm + delay — so they are suppressed and state is
    *     UNCHANGED → (2, |slice|, |ts < wm slice|, |ts ≥ max − 2·delay|).
    *
    * The two horizons differ by design: suppression-vs-drop switches at
    * the 1·delay watermark line, while state eviction trails at 2·delay
    * (expiry extends delay forward, the watermark trails delay behind).
    * Either way numRowsTotal is horizon-bounded at any stream length: the
    * state never holds more keys than arrive within 2·delay of the
    * frontier.
    */
  def metrics(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.tables.Tables.withShufflePartitions(spark, 4) {
      val (_, progress) = run(spark, sfDir)
      val rows = progress
        .filter(p => p.numInputRows > 0)
        .sortBy(_.batchId)
        .zipWithIndex
        .map { case (p, ord) =>
          val dropped = p.stateOperators.map(_.numRowsDroppedByWatermark).sum
          val stateRows = p.stateOperators.map(_.numRowsTotal).sum
          (ord, p.numInputRows, dropped, stateRows)
        }
      rows.toSeq.toDF("batch_ord", "input_rows", "dropped_rows", "state_rows")
        .select(col("batch_ord").cast("int").as("batch_ord"),
          col("input_rows"), col("dropped_rows"), col("state_rows"))
    }
  }
}
