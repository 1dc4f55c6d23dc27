package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec

/** Hand-computed pin of the exactly-once dedup composition: re-delivered
  * keys INSIDE the watermark horizon are suppressed by dedup state
  * (ids 13, 33 below), and re-deliveries BEYOND it — whose keys the
  * horizon already evicted — are caught by the late-record filter before
  * they can re-enter (ids 3, 23: event time + delay ≤ the live
  * watermark). Both paths collapse to the same contract: the drained
  * output is exactly the distinct event set, never a double count. (A
  * two-batch staging without the nudge batch was measured re-emitting
  * NOTHING either — but only because both watermark versions still read
  * zero; this staging has them live, so the assertion is on the real
  * steady-state semantics, not the cold-start race.)
  */
class DedupIngestSpec extends SparkSpec {

  private def ts(h: Int, m: Int, s: Int = 0, us: Int = 0): Timestamp =
    Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:$s%02d.$us%06d")

  // max ts = 10:30:00.123456; delay 119 min → watermark after batch 0 =
  // 08:31:00.123456. Re-delivered ids (id % 10 == 3): 3 (01:00) and
  // 23 (05:00) arrive beyond the horizon (ts + delay ≤ watermark → state
  // evicted AND late-filtered); 13 (07:00) and 33 (09:50) are still in
  // state and suppressed.
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
      ("2026-01-01 07:00", "view", 1L, 4.0), // id 13 suppressed by state
      ("2026-01-01 09:00", "click", 1L, 5.0), // id 33 suppressed by state
      ("2026-01-01 10:00", "view", 1L, 6.0))
    assert(got === expected)
  }
}
