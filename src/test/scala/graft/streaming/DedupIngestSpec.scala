package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec

/** Hand-computed pin of the exactly-once dedup composition: re-delivered
  * keys AHEAD of the raw-ts watermark are suppressed by dedup state
  * (id 33 below), and re-deliveries BEHIND it are caught by the
  * late-record filter before they can re-enter (ids 3, 23, 13 — the
  * filter tests raw event time against the watermark, NOT the state
  * expiry, so 13 is late-dropped even while its state entry survives
  * eviction; the metrics test below pins that distinction). Both paths
  * collapse to the same contract: the drained output is exactly the
  * distinct event set, never a double count. (A two-batch staging
  * without the nudge batch was measured re-emitting NOTHING either — but
  * only because both watermark versions still read zero; this staging
  * has them live, so the assertion is on the real steady-state
  * semantics, not the cold-start race.)
  */
class DedupIngestSpec extends SparkSpec {

  private def ts(h: Int, m: Int, s: Int = 0, us: Int = 0): Timestamp =
    Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:$s%02d.$us%06d")

  // max ts = 10:30:00.123456; delay 119 min → watermark after batch 0 =
  // 08:31:00.123456. Re-delivered ids (id % 10 == 3): 3 (01:00), 23
  // (05:00) and 13 (07:00) sit behind the raw-ts watermark and are
  // late-filtered; 33 (09:50) is admitted and suppressed by dedup state.
  private val events = Seq(
    (1L, ts(0, 10), "view", 1.0),
    (3L, ts(1, 0), "view", 2.0),
    (23L, ts(5, 0), "click", 3.0),
    (13L, ts(7, 0), "view", 4.0),
    (33L, ts(9, 50), "click", 5.0),
    (2L, ts(10, 30, 0, 123456), "view", 6.0))

  test("re-deliveries never double-count: in-horizon suppressed, beyond-horizon " +
      "late-dropped — output is exactly the distinct event set") {
    import spark.implicits._
    val dir = Files.createTempDirectory("dedup-ingest-spec")
    events.toDF("event_id", "ts", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = DedupIngest(spark, dir.toString)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val expected = Set(
      ("2026-01-01 00:00", "view", 1L, 1.0),
      ("2026-01-01 01:00", "view", 1L, 2.0), // id 3 late-dropped, not re-emitted
      ("2026-01-01 05:00", "click", 1L, 3.0), // id 23 late-dropped
      ("2026-01-01 07:00", "view", 1L, 4.0), // id 13 late-dropped (raw ts < wm)
      ("2026-01-01 09:00", "click", 1L, 5.0), // id 33 suppressed by state
      ("2026-01-01 10:00", "view", 1L, 6.0))
    assert(got === expected)
  }

  // Same fixture, the monitoring surface: batch 0 admits all 6 keys into
  // state (eviction watermark 0); batch 1's nudge evicts to the 2·delay
  // horizon ts ≥ 10:30:00.123456 − 238 min = 06:32:00.123456 → keys at
  // 07:00, 09:50, 10:30 survive (3); batch 2 re-delivers 4 keys of which
  // 3 (01:00), 23 (05:00) AND 13 (07:00) sit behind the raw-ts watermark
  // 08:31:00.123456 → 3 late-dropped — note 13 is dropped by the LATE
  // FILTER even though its state entry survives eviction (the filter
  // tests raw ts, eviction tests expiry; the horizons differ by delay) —
  // and the one admitted key (33) is already in state → state stays 3.
  test("per-batch metrics pin the state-boundedness contract: " +
      "(0,6,0,6), (1,1,0,3), (2,4,3,3)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("dedup-ingest-metrics-spec")
    events.toDF("event_id", "ts", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = DedupIngest.metrics(spark, dir.toString)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toList.sortBy(_._1)
    assert(got === List((0, 6L, 0L, 6L), (1, 1L, 0L, 3L), (2, 4L, 3L, 3L)))
  }
}
