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

  def apply(spark: SparkSession, sfDir: String): DataFrame =
    graft.tables.Tables.withShufflePartitions(spark, 4) {
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
        Drain.toMemory(spark, "stream_dedup_ingest", deduped)
          .groupBy(
            date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00")
              .as("hour_start"),
            col("event_type"))
          .agg(count(lit(1)).as("n"),
            (sum(round(col("value") * 100).cast("long")) / 100.0).as("value_sum"))
      } finally StagedEvents.deleteRecursively(staged)
    }
}
