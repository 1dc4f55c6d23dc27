package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

import scala.collection.mutable.ArrayBuffer

/** Gap-based sessionization as a STATEFUL Structured Streaming query:
  * `flatMapGroupsWithState` keyed by user, custom per-group state (the open
  * session), event-time timeout closing idle sessions past the watermark.
  *
  * This is the streaming twin of the batch `w3_sessionize` query (same
  * >30-minute-gap rule, same 0-based session ordinals) and of the
  * reference's per-file ordered-scan state machines (the precursor as-of
  * lookup, mzml_statistics.py:253-260, walks spectra in order carrying
  * "last MS1 seen" state — exactly a GroupState over the file key).
  *
  * Determinism for the finite-input oracle check: a far-future sentinel
  * event per user (event_id = -1) is staged next to the real file, so every
  * real session is closed by data rather than by wall-clock, and the output
  * is exactly the batch answer. On an unbounded stream the sentinel path is
  * simply never taken and the event-time timeout does the closing — that
  * branch is what `GroupState.hasTimedOut` handles.
  *
  * At 100 TB the same plan shards by `user_id` across executors with
  * per-key state in the state store; nothing here is single-node.
  */
object StatefulSessionize {

  private val GapUs = 30L * 60 * 1000000

  // tsm carries the watermarked event-time column through the typed view:
  // a lossy map{} to a tsm-less class would drop the watermark attribute and
  // Spark rejects EventTimeTimeout without a watermark in the child plan.
  case class Ev(user_id: Long, event_id: Long, us: Long, tsm: java.sql.Timestamp)
  case class Open(startUs: Long, lastUs: Long, n: Long, ordinal: Long)
  case class SessionRow(user_id: Long, session_id: Long, n_events: Long, duration_sec: Double)

  /** The per-group state transition. Events within a batch are sorted by
    * (time, id); the open session survives in `state` across batches.
    */
  private[streaming] def onGroup(
      user: Long, it: Iterator[Ev], state: GroupState[Open]): Iterator[SessionRow] = {
    if (state.hasTimedOut) {
      // unbounded-stream path: watermark passed lastUs + gap → close. A
      // zero-event marker (n = 0, no timeout registered) stays behind so the
      // user's next session continues the ordinal sequence.
      val s = state.get
      state.update(Open(0L, 0L, 0L, s.ordinal + 1))
      Iterator.single(SessionRow(user, s.ordinal, s.n, (s.lastUs - s.startUs) / 1e6))
    } else {
      val evs = it.toArray.sortBy(e => (e.us, e.event_id))
      val out = new ArrayBuffer[SessionRow]
      var cur: Option[Open] = state.getOption
      def close(s: Open): Unit =
        out += SessionRow(user, s.ordinal, s.n, (s.lastUs - s.startUs) / 1e6)
      evs.foreach { e =>
        if (e.event_id == -1L) { // sentinel: flush, never starts a session
          cur.filter(_.n > 0).foreach(close); cur = None
        } else cur match {
          case None =>
            cur = Some(Open(e.us, e.us, 1, 0L))
          case Some(s) if s.n == 0 => // marker left by a timeout close
            cur = Some(Open(e.us, e.us, 1, s.ordinal))
          case Some(s) if e.us - s.lastUs > GapUs =>
            close(s)
            cur = Some(Open(e.us, e.us, 1, s.ordinal + 1))
          case Some(s) =>
            cur = Some(s.copy(lastUs = e.us, n = s.n + 1))
        }
      }
      cur match {
        case Some(s) =>
          state.update(s)
          // never set a timeout at or before the current watermark (Spark
          // rejects it); an already-overdue session closes one batch later
          state.setTimeoutTimestamp(math.max(
            s.lastUs / 1000 + GapUs / 1000, state.getCurrentWatermarkMs() + 1))
        case None =>
          if (state.exists) state.remove()
      }
      out.iterator
    }
  }

  /** Stage the finite input for the oracle-checked run: the real events file
    * plus one sentinel row per user at max(ts) + 1 year, so the final
    * sessions close deterministically. Returns the staging directory.
    */
  private def stageInput(spark: SparkSession, sfDir: String): Path = {
    val stage = Files.createTempDirectory("stream-sessionize")
    val src = Paths.get(s"$sfDir/events.parquet")
    Files.copy(src, stage.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val raw = spark.read.parquet(src.toString) // ts = raw nanos long
    val maxTs = raw.agg(max(col("ts"))).head.getLong(0)
    val sentinelTs = maxTs + 365L * 24 * 3600 * 1000000000L
    val sentinel = raw.select(col("user_id")).distinct()
      .select(
        lit(-1L).as("event_id"),
        lit(sentinelTs).as("ts"),
        col("user_id"),
        lit(null).cast("string").as("event_type"),
        lit(null).cast("double").as("value"),
        lit(null).cast("string").as("props"))
    val tmpOut = Files.createTempDirectory("stream-sessionize-sentinel")
    sentinel.coalesce(1).write.mode("overwrite").parquet(tmpOut.toString)
    val part = Files.list(tmpOut).filter(_.getFileName.toString.endsWith(".parquet"))
      .findFirst().orElseThrow()
    Files.move(part, stage.resolve("sentinel.parquet"), StandardCopyOption.REPLACE_EXISTING)
    stage
  }

  def apply(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val stage = stageInput(spark, sfDir)
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val qn = s"stream_sessionize_${System.nanoTime()}"
    val sessions = spark.readStream.schema(schema)
      .parquet(stage.toString)
      .select(
        col("user_id"), col("event_id"),
        timestamp_micros(expr("ts div 1000")).as("tsm"))
      .withColumn("us", unix_micros(col("tsm")))
      .withWatermark("tsm", "30 minutes")
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(onGroup)
    val q = sessions.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(qn)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(qn)
      .select(col("user_id"), col("session_id"), col("n_events"), col("duration_sec"))
  }
}
