package graft.streaming

import org.apache.spark.sql.streaming.GroupState
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable.ArrayBuffer
import scala.util.Random

/** Unit tests for the sessionizer's state transition itself (no Spark
  * session): the streaming run through Verify only ever exercises the
  * sentinel-flush path, so the cross-batch continuation and the
  * event-time-timeout branch are pinned here with a fake GroupState.
  */
class StatefulSessionizeSpec extends AnyFunSuite {

  import StatefulSessionize.{Ev, Open, SessionRow}

  private val Gap = 30L * 60 * 1000000

  private final class FakeState(var opt: Option[Open], val timedOut: Boolean)
      extends GroupState[Open] {
    var timeoutTs: Long = -1L
    override def exists: Boolean = opt.isDefined
    override def get: Open = opt.get
    override def getOption: Option[Open] = opt
    override def update(s: Open): Unit = { opt = Some(s) }
    override def remove(): Unit = { opt = None }
    override def hasTimedOut: Boolean = timedOut
    override def setTimeoutDuration(durationMs: Long): Unit = ()
    override def setTimeoutDuration(duration: String): Unit = ()
    override def setTimeoutTimestamp(timestampMs: Long): Unit = { timeoutTs = timestampMs }
    override def setTimeoutTimestamp(timestampMs: Long, additionalDuration: String): Unit =
      { timeoutTs = timestampMs }
    override def setTimeoutTimestamp(timestamp: java.sql.Date): Unit =
      { timeoutTs = timestamp.getTime }
    override def setTimeoutTimestamp(timestamp: java.sql.Date, additionalDuration: String): Unit =
      { timeoutTs = timestamp.getTime }
    override def getCurrentWatermarkMs(): Long = 0L
    override def getCurrentProcessingTimeMs(): Long = 0L
  }

  private def ev(id: Long, us: Long) = Ev(7L, id, us, new java.sql.Timestamp(us / 1000))

  /** Batch-reference sessionization of one user's complete event list. */
  private def reference(evs: Seq[Ev]): Seq[SessionRow] = {
    val out = ArrayBuffer.empty[SessionRow]
    var ord = 0L
    evs.sortBy(e => (e.us, e.event_id)).foldLeft(Option.empty[(Long, Long, Long)]) {
      case (None, e) => Some((e.us, e.us, 1L))
      case (Some((s0, s1, n)), e) =>
        if (e.us - s1 > Gap) {
          out += SessionRow(7L, ord, n, (s1 - s0) / 1e6); ord += 1
          Some((e.us, e.us, 1L))
        } else Some((s0, e.us, n + 1))
    }.foreach { case (s0, s1, n) => out += SessionRow(7L, ord, n, (s1 - s0) / 1e6) }
    out.toSeq
  }

  test("arbitrary batch splits reproduce the batch answer (sentinel flush)") {
    val rnd = new Random(42)
    (1 to 20).foreach { trial =>
      // events with ~25% chance of a >30min gap between consecutive ones
      var t = 1000000L
      val evs = (1L to (5 + rnd.nextInt(40)).toLong).map { id =>
        t += (if (rnd.nextInt(4) == 0) Gap + 1 + rnd.nextInt(1000)
              else 1 + rnd.nextInt(1000)).toLong
        ev(id, t)
      }
      val withSentinel = evs :+ ev(-1L, t + 365L * 24 * 3600 * 1000000L)
      // split into 1..5 batches at random boundaries, preserving time order
      val nCuts = rnd.nextInt(5)
      val cuts = Seq.fill(nCuts)(rnd.nextInt(withSentinel.size)).sorted.distinct
      val batches = (0 +: cuts :+ withSentinel.size).sliding(2).collect {
        case Seq(a, b) if a < b => withSentinel.slice(a, b)
      }.toSeq

      val state = new FakeState(None, timedOut = false)
      val got = batches.flatMap { b =>
        StatefulSessionize.onGroup(7L, rnd.shuffle(b).iterator, state)
      }
      assert(got === reference(evs), s"trial $trial")
      assert(state.opt.isEmpty, s"trial $trial: sentinel must clear state")
    }
  }

  test("cross-batch out-of-order events merge into the open session") {
    // batch 2 delivers an event OLDER than batch 1's max (admissible under
    // the 30-min watermark): must merge — no split, no negative duration
    val state = new FakeState(None, timedOut = false)
    val b1 = StatefulSessionize.onGroup(
      7L, Iterator(ev(1, 100L * 60 * 1000000)), state)
    assert(b1.isEmpty)
    val b2 = StatefulSessionize.onGroup(
      7L, Iterator(
        ev(2, 71L * 60 * 1000000),  // 29 min older than event 1
        ev(3, 105L * 60 * 1000000),
        ev(-1L, 10000L * 60 * 1000000)), state)
    // batch reference on {71,100,105}: ONE session, 3 events, 34 min
    assert(b2.toSeq === Seq(SessionRow(7L, 0L, 3, 34 * 60.0)))
    assert(state.opt.isEmpty)
  }

  test("marker state expires via its own timeout instead of living forever") {
    val marker = new FakeState(Some(Open(0L, 0L, 0L, 3L)), timedOut = true)
    val out = StatefulSessionize.onGroup(7L, Iterator.empty, marker)
    assert(out.isEmpty)
    assert(marker.opt.isEmpty, "expired marker must be removed")
  }

  test("event-time timeout closes the open session and preserves ordinals") {
    val state = new FakeState(None, timedOut = false)
    // session 0: two events 10s apart
    val out1 = StatefulSessionize.onGroup(
      7L, Iterator(ev(1, 1000000L), ev(2, 11000000L)), state)
    assert(out1.isEmpty)
    assert(state.opt === Some(Open(1000000L, 11000000L, 2, 0L)))
    // timeout registered past lastUs + gap (in millis)
    assert(state.timeoutTs >= 11000000L / 1000 + Gap / 1000)

    // watermark passes → timeout invocation closes session 0, leaves marker
    val timedOut = new FakeState(state.opt, timedOut = true)
    val out2 = StatefulSessionize.onGroup(7L, Iterator.empty, timedOut)
    assert(out2.toSeq === Seq(SessionRow(7L, 0L, 2, 10.0)))
    assert(timedOut.opt === Some(Open(0L, 0L, 0L, 1L)))
    assert(timedOut.timeoutTs >= 0, "marker must register its own TTL")

    // later events continue with ordinal 1, flushed by a sentinel
    val cont = new FakeState(timedOut.opt, timedOut = false)
    val out3 = StatefulSessionize.onGroup(
      7L, Iterator(ev(3, Gap * 10), ev(-1L, Gap * 1000)), cont)
    assert(out3.toSeq === Seq(SessionRow(7L, 1L, 1, 0.0)))
    assert(cont.opt.isEmpty)
  }
}
