package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-computed pin of the drop-late replay's watermark arithmetic: a
  * tiny events table with stragglers placed on both sides of the
  * batch-0 watermark, so the admitted/dropped split, the per-batch
  * observe() counts, and numRowsDroppedByWatermark are all exact
  * expectations — this is what certifies the DuckDB oracle's >-window-end
  * admission rule against Spark's actual state-eviction boundary.
  */
class LateDropSpec extends SparkSpec {

  private def ts(h: Int, m: Int, s: Int = 0, us: Int = 0): Timestamp =
    Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:$s%02d.$us%06d")

  private def writeEvents(rows: Seq[(Long, Timestamp, String, Double)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("late-drop-spec")
    rows.toDF("event_id", "ts", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir.toString
  }

  // on-time ids avoid %20==7; stragglers are 7, 27, 47, 67.
  // max on-time ts = 10:30:00.123456 → watermark after batch 0 =
  // 08:31:00.123456. Straggler windows: id 7 ends 02:00 (dropped),
  // id 67 ends 06:00 (dropped), id 27 ends 09:00 (admitted),
  // id 47 ends 10:00 (admitted).
  private val onTime = Seq(
    (1L, ts(0, 10), "view", 1.0),
    (2L, ts(1, 20), "view", 2.0),
    (3L, ts(1, 40), "click", 3.0),
    (4L, ts(5, 15), "view", 4.0),
    (5L, ts(8, 45), "click", 5.0),
    (6L, ts(9, 30), "view", 6.0),
    (8L, ts(10, 30, 0, 123456), "view", 7.0))
  private val stragglers = Seq(
    (7L, ts(1, 15), "view", 10.0),
    (27L, ts(8, 40), "click", 20.0),
    (47L, ts(9, 10), "view", 30.0),
    (67L, ts(5, 5), "click", 40.0))

  test("droppedLateAgg: dropped stragglers absent, admitted stragglers counted") {
    val dir = writeEvents(scala.util.Random.shuffle(onTime ++ stragglers))
    val got = LateDrop.droppedLateAgg(spark, dir)
      .select("hour_start", "event_type", "n", "value_sum")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val expected = Set(
      ("2026-01-01 00:00", "view", 1L, 1.0),
      ("2026-01-01 01:00", "view", 1L, 2.0), // straggler 7 dropped
      ("2026-01-01 01:00", "click", 1L, 3.0),
      ("2026-01-01 05:00", "view", 1L, 4.0), // straggler 67 dropped
      ("2026-01-01 08:00", "click", 2L, 25.0), // straggler 27 admitted
      ("2026-01-01 09:00", "view", 2L, 36.0), // straggler 47 admitted
      ("2026-01-01 10:00", "view", 1L, 7.0)) // emitted by the sentinel flush
    assert(got === expected)
  }

  test("lateMetrics: per-batch observe counts, dropped-by-watermark, and the " +
      "state-boundedness contract") {
    val dir = writeEvents(scala.util.Random.shuffle(onTime ++ stragglers))
    val got = LateDrop.lateMetrics(spark, dir)
      .orderBy(col("batch_ord"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val nEven = onTime.count(_._1 % 2 == 0).toLong
    // state replay by hand: even half (ids 2,4,6,8) forms 4 groups; after
    // the odd half merges, eviction by the even max (wm 08:31:00.123456)
    // leaves {08-click, 09-view, 10-view} = 3; the two admitted stragglers
    // merge INTO two of those groups (no new ones) = 3; the sentinel adds
    // its own group = 4. State never grows with stream length — only with
    // the windows inside the horizon.
    assert(got === Seq(
      (0, nEven, 0L, 4L), // even on-time half — nothing dropped
      (1, onTime.size - nEven, 0L, 3L), // odd half merges; eviction bites
      (2, stragglers.size.toLong, 2L, 3L), // ids 7 and 67 behind the watermark
      (3, 1L, 0L, 4L))) // the sentinel row's own group
  }
}
