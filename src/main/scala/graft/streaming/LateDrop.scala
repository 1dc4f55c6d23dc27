package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Watermark late-data semantics made OBSERVABLE: a three-batch staged
  * replay of the events table in which 5% of rows (event_id % 20 == 7)
  * arrive one micro-batch LATE, so the watermark computed from the on-time
  * batch decides — deterministically — which stragglers are admitted into
  * open windows and which are dropped. This is the drop-late metrics story
  * the stateful paths were missing (SURVEY §9 #5): the reference's
  * streaming surface has no analogue; the contract here is Spark's own
  * (docs: structured-streaming watermark semantics), pinned against a
  * DuckDB replay of the same split + drop rules.
  *
  * Batch timeline (file source, maxFilesPerTrigger=1, AvailableNow; file
  * modification times force the order). Spark keeps TWO watermark
  * versions per batch (SPARK-24588 lineage): the LATE-RECORD filter uses
  * the previous batch's watermark while STATE EVICTION uses the current
  * one — so data arriving exactly one batch behind is never filtered, and
  * the stragglers here arrive TWO batches behind the on-time bulk
  * (empirically pinned in LateDropSpec; a two-file staging shows
  * numRowsDroppedByWatermark = 0 for the same stragglers):
  *   batch 0  half the on-time rows (even event_id). Watermark 0.
  *   batch 1  the other on-time half. Late-filter watermark still 0;
  *            after this batch the watermark is max(on-time ts) − delay.
  *   batch 2  the stragglers (event_id % 20 == 7). The late filter now
  *            holds the full on-time watermark: a straggler whose hour
  *            window END is ≤ it was evicted a batch ago and is DROPPED
  *            (numRowsDroppedByWatermark); younger stragglers merge into
  *            their still-open windows.
  *   batch 3  one far-future sentinel row (null event_type) advances the
  *            watermark past every real window, so the engine's final
  *            flush emits them all — admitted stragglers included. The
  *            sentinel's own group is filtered out by its null type.
  *
  * The 119-minute delay is deliberately NOT hour-aligned: window ends are
  * whole hours while max(ts) carries microseconds, so the ≤-watermark drop
  * rule never lands on an exact tie and the oracle replay has no float/
  * boundary ambiguity to adjudicate.
  *
  * At scale nothing here is test-rig-shaped: the staging writes are the
  * ingest job, the watermark/state mechanics are per-key in the state
  * store, and the observe() counters are the production monitoring hook —
  * per-batch row counts surface in QueryProgress with zero extra jobs.
  */
object LateDrop {

  val DelayMinutes = 119L

  /** Stage the three-batch layout into a fresh temp dir; returns it.
    * Files are written oldest-first (b0, b1, sentinel) with strictly
    * increasing modification times so the file source's oldest-first
    * listing replays the intended arrival order.
    */
  def stage(spark: SparkSession, sfDir: String): Path = {
    val stage = Files.createTempDirectory("stream-late-drop")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    require(raw.head(1).nonEmpty,
      s"$sfDir/events.parquet is empty — cannot stage a late-arrival replay")
    val ev = graft.tables.Tables.toEventTime(raw, "ts")
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
    val sentinelTs =
      ev.agg((max(col("ts")) + expr("INTERVAL 365 DAYS")).as("t")).head().get(0)
    val sentinel = ev.limit(1).select(
      lit(-1L).as("event_id"),
      lit(sentinelTs).as("ts"),
      lit(null).cast("string").as("event_type"),
      lit(null).cast("double").as("value"))
    def writeOne(df: DataFrame, name: String, modSecsAgo: Long): Unit =
      StagedEvents.writePart(df, stage, name, modSecsAgo)
    val onTime = ev.filter(col("event_id") % 20 =!= 7)
    writeOne(onTime.filter(col("event_id") % 2 === 0), "b0_ontime_even.parquet", 60)
    writeOne(onTime.filter(col("event_id") % 2 =!= 0), "b1_ontime_odd.parquet", 45)
    writeOne(ev.filter(col("event_id") % 20 === 7), "b2_stragglers.parquet", 30)
    writeOne(sentinel, "b3_sentinel.parquet", 15)
    stage
  }

  private def hourlyAgg(spark: SparkSession, stage: Path): DataFrame = {
    val schema =
      spark.read.parquet(stage.resolve("b0_ontime_even.parquet").toString).schema
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage.toString)
      .withWatermark("ts", s"$DelayMinutes minutes")
      .observe("graft_input", count(lit(1)).as("rows"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
  }

  /** One staged drain per (session, dir, stamp) — the output query and
    * the metrics query read the same replay ([[ReplayMemo]], the
    * DedupIngest apply/metrics discipline).
    */
  private val memo = new ReplayMemo(2)

  private def run(spark: SparkSession, sfDir: String) =
    memo.getOrRun(spark, sfDir, tag = "late_drop") {
      val staged = stage(spark, sfDir)
      try Drain.toMemoryWithProgress(
        spark, "stream_drop_late", hourlyAgg(spark, staged))
      finally StagedEvents.deleteRecursively(staged)
    }

  /** The APPEND-mode hourly aggregate under the staged late-arrival replay:
    * every window the watermark finalized, with dropped stragglers absent
    * and admitted stragglers counted. Oracle-matched (the split, the
    * watermark, and the ≤-window-end drop rule all replay in SQL).
    */
  def droppedLateAgg(spark: SparkSession, sfDir: String): DataFrame =
    graft.tables.Tables.withShufflePartitions(spark, 4) {
      val (out, _) = run(spark, sfDir)
      out.filter(col("event_type").isNotNull)
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:00").as("hour_start"),
          col("event_type"),
          col("n"),
          (col("value_cents") / 100.0).as("value_sum"))
    }

  /** Per-batch observability of the same run: the observe() row counter,
    * the state store's numRowsDroppedByWatermark, AND its numRowsTotal —
    * one row per data batch in arrival order. input/dropped follow the
    * split rules ((0, |even on-time|, 0), (1, |odd on-time|, 0),
    * (2, |stragglers|, |dropped|), (3, 1, 0)); state_rows is the
    * boundedness CONTRACT asserted rather than designed: after each batch
    * the store holds exactly the distinct (window, type) groups of the
    * admitted rows whose window end survives that batch's eviction
    * watermark — a horizon-bounded count at any stream length, replayed
    * group-by-group in SQL (the eviction watermark lags the late-filter
    * one by one batch, so batch 1 evicts by the EVEN half's max while
    * batch 2 evicts by the full on-time max).
    */
  def lateMetrics(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.tables.Tables.withShufflePartitions(spark, 4) {
      {
        val (_, progress) = run(spark, sfDir)
        val rows = progress
          .filter(p => p.numInputRows > 0)
          .sortBy(_.batchId)
          .zipWithIndex
          .map { case (p, ord) =>
            val observed = Option(p.observedMetrics.get("graft_input"))
              .map(_.getLong(0)).getOrElse(p.numInputRows)
            val dropped = p.stateOperators.map(_.numRowsDroppedByWatermark).sum
            val stateRows = p.stateOperators.map(_.numRowsTotal).sum
            (ord, observed, dropped, stateRows)
          }
        rows.toSeq.toDF("batch_ord", "input_rows", "dropped_rows", "state_rows")
          .select(col("batch_ord").cast("int").as("batch_ord"),
            col("input_rows"), col("dropped_rows"), col("state_rows"))
      }
    }
  }
}
