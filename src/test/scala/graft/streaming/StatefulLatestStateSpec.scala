package graft.streaming

import org.apache.spark.sql.streaming.GroupState
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Unit tests for the latest-state transition itself (no Spark session):
  * the Verify run only exercises the sentinel-flush path, so the
  * cross-batch fold and the event-time-timeout branch are pinned here
  * with a fake GroupState.
  */
class StatefulLatestStateSpec extends AnyFunSuite {

  import StatefulLatestState.{Ev, Latest, LatestRow}

  private final class FakeState(var opt: Option[Latest], val timedOut: Boolean)
      extends GroupState[Latest] {
    var timeoutTs: Long = -1L
    override def exists: Boolean = opt.isDefined
    override def get: Latest = opt.get
    override def getOption: Option[Latest] = opt
    override def update(s: Latest): Unit = { opt = Some(s) }
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

  private def ev(id: Long, us: Long, v: Double) =
    Ev(7L, id, us, Some(v), new java.sql.Timestamp(us / 1000))

  test("arbitrary batch splits reproduce the batch argmax (sentinel flush)") {
    val rnd = new Random(11)
    (1 to 50).foreach { trial =>
      val evs = (1 to 40).map(i => ev(i.toLong, rnd.nextInt(1000).toLong * 1000, i * 0.5))
      val expectedLast = evs.maxBy(e => (e.us, e.event_id))
      val withSentinel = rnd.shuffle(evs) :+ Ev(7L, -1L, Long.MaxValue / 2, None,
        new java.sql.Timestamp(0))
      // split into random contiguous batches
      val cuts = (0 +: Seq.fill(rnd.nextInt(5))(rnd.nextInt(withSentinel.size)) :+
        withSentinel.size).distinct.sorted
      val state = new FakeState(None, timedOut = false)
      val out = cuts.sliding(2).flatMap { case Seq(a, b) =>
        StatefulLatestState.onGroup(7L, withSentinel.slice(a, b).iterator, state)
      }.toSeq
      assert(out == Seq(LatestRow(7L, expectedLast.us, expectedLast.value, 40L)),
        s"trial $trial: $out")
      assert(state.opt.isEmpty, "state cleared after sentinel flush")
    }
  }

  test("event-time timeout emits the compacted row and clears the key") {
    val building = new FakeState(None, timedOut = false)
    StatefulLatestState.onGroup(7L, Iterator(ev(1, 5000, 1.0), ev(2, 9000, 2.0)), building)
    assert(building.opt.contains(Latest(9000, 2, Some(2.0), 2)))
    val expiring = new FakeState(building.opt, timedOut = true)
    val out = StatefulLatestState.onGroup(7L, Iterator.empty, expiring).toSeq
    assert(out == Seq(LatestRow(7L, 9000, Some(2.0), 2)))
    assert(expiring.opt.isEmpty)
  }

  test("a late event older than the current latest counts but does not replace it") {
    val state = new FakeState(Some(Latest(9000, 5, Some(2.0), 3)), timedOut = false)
    StatefulLatestState.onGroup(7L, Iterator(ev(1, 1000, 9.9)), state)
    assert(state.opt.contains(Latest(9000, 5, Some(2.0), 4)))
  }
}
