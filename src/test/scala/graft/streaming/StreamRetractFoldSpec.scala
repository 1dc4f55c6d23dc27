package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

import graft.SparkSpec
import graft.streaming.StreamRetractFold.{Cdc, FoldRow, RState}

/** The streamed retraction fold's three contracts beyond its DuckDB
  * oracle: (1) a retracted extremum is FLAGGED, never silently served
  * from the stale maintained value; (2) the composed output equals the
  * batch retraction query row for row; (3) state is bounded by the live
  * group count (one record per group), and a sentinel clears it.
  */
class StreamRetractFoldSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val key = ("2024-01-01", "purchase")

  private def freshState(prior: Option[RState]) =
    TestGroupState.create[RState](
      org.apache.spark.api.java.Optional.fromNullable(prior.orNull),
      GroupStateTimeout.NoTimeout(), 0L,
      org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)

  private def cdc(cents: Long, mult: Long) = Cdc(key._1, key._2, cents, mult)

  test("a retracted extremum flags the group; n/sum subtract exactly") {
    // inserts 1 and 5: maintained state absorbs both extrema
    val s1 = freshState(None)
    assert(StreamRetractFold.onGroup(key,
      Iterator(cdc(1, 1), cdc(5, 1)), s1).isEmpty)
    assert(s1.get == RState(2, 6, 1, 5, touched = false))
    // the 5 retracts: count/sum subtract in-stream, but the maintained
    // max still reads 5 — the stale extremum the flag exists for
    val s2 = freshState(Some(s1.get))
    assert(StreamRetractFold.onGroup(key, Iterator(cdc(5, -1)), s2).isEmpty)
    assert(s2.get == RState(1, 1, 1, 5, touched = true),
      "retraction must flag the group and must NOT pretend to repair max")
    // sentinel: the final record emits flagged, state clears
    val s3 = freshState(Some(s2.get))
    val out = StreamRetractFold.onGroup(key, Iterator(cdc(0, 0)), s3).toSeq
    assert(out == Seq(FoldRow(key._1, key._2, 1, 1, 1, 5, touched = true)))
    assert(!s3.exists, "sentinel must clear the group's state")
  }

  test("a retraction for a never-inserted group fails loudly") {
    val s = freshState(None)
    intercept[IllegalStateException] {
      StreamRetractFold.onGroup(key, Iterator(cdc(3, -1)), s).toSeq
    }
  }

  test("composed output equals the batch retraction query; state bounded by groups") {
    val (df, progress) = StreamRetractFold.applyWithProgress(spark, sf)
    val streamed = df.collect().map(_.toString).sorted.toSeq
    val batch = graft.SparkEntry.queries("agg_incremental_retract")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty)
    assert(df.filter(col("recomputed")).count() > 0,
      "fixture retraction slice touched no group — the deferred-rescan path went unexercised")
    // state never exceeds the live group spine (one record per group)
    val groups = graft.tables.Tables.events(spark, sf)
      .select(date_format(to_date(col("ts")), "yyyy-MM-dd"), col("event_type"))
      .distinct().count()
    val maxState = progress.flatMap(_.stateOperators.map(_.numRowsTotal)).max
    assert(maxState <= groups, s"state rows $maxState exceed $groups groups")
  }
}
