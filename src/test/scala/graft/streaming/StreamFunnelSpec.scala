package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The left-outer stream-stream funnel's contracts beyond its DuckDB
  * oracle: exactly-once emission of every view (matched via data,
  * unmatched via watermark eviction — the mechanism under test), a
  * sentinel-free output, and consistency with the batch funnel's
  * first-view reading.
  */
class StreamFunnelSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("every view emits exactly once, sentinels never, and the batch " +
      "funnel's conversions are a subset") {
    val rows = StreamFunnel.audit(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(rows.nonEmpty)
    // sentinel-free: the nudge rows (users −1/−2) must never reach output
    assert(rows.keys.forall(_ >= 0L), s"sentinel leaked: ${rows.keys.min}")
    // exactly-once: n_views summed equals the raw view-event count — an
    // unmatched view lost to a stalled watermark would undercount, a
    // double emission (matched AND evicted) would overcount
    val nViews = graft.tables.Tables.events(spark, sf)
      .filter(col("event_type") === "view").count()
    assert(rows.values.map(_._1).sum == nViews,
      s"views emitted ${rows.values.map(_._1).sum} of $nViews")
    rows.foreach { case (u, (v, c, lat)) =>
      assert(c <= v, s"user $u: $c conversions of $v views")
      assert(lat.forall(_ >= 0L), s"user $u: negative latency $lat")
      assert((c > 0) == lat.nonEmpty, s"user $u: latency/conversion mismatch")
    }
    // the batch funnel (first view per user) is a restriction of this
    // per-view read: a converted first view implies >=1 converted view
    // here, and the fastest conversion can only be at-or-under its latency
    // the inner (data-driven) emission path must actually fire at fixture
    // scale, not just the eviction path — 2 matched pairs are planted
    assert(rows.values.map(_._2).sum > 0, "no streamed conversion — vacuous")
    val w4 = graft.SparkEntry.queries("w4_funnel")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    w4.foreach { case (u, (conv, lat)) =>
      if (conv) {
        assert(rows(u)._2 >= 1L, s"user $u: batch converted, stream did not")
        assert(rows(u)._3.get <= lat.get,
          s"user $u: stream min latency ${rows(u)._3.get} > batch first-view ${lat.get}")
      }
    }
  }
}
