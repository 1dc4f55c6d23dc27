package graft.streaming

import org.apache.spark.sql.streaming.GroupState
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable.ArrayBuffer
import scala.util.Random

/** Unit tests for the streaming SCD2 state transition (no Spark session):
  * the Verify run only exercises the sentinel-flush path, so cross-batch
  * folding under an advancing watermark — including admissibly LATE
  * deliveries, which an eager fold would version wrongly — and the
  * event-time-timeout branch are pinned here with a fake GroupState.
  */
class StreamScd2Spec extends AnyFunSuite {

  import StreamScd2.{Ev, Scd2State, VersionRow}

  private final class FakeState(var opt: Option[Scd2State], val timedOut: Boolean,
      val wmMs: Long) extends GroupState[Scd2State] {
    var timeoutTs: Long = -1L
    override def exists: Boolean = opt.isDefined
    override def get: Scd2State = opt.get
    override def getOption: Option[Scd2State] = opt
    override def update(s: Scd2State): Unit = { opt = Some(s) }
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
    override def getCurrentWatermarkMs(): Long = wmMs
    override def getCurrentProcessingTimeMs(): Long = 0L
  }

  private def ev(id: Long, us: Long, tier: Long) =
    Ev(7L, id, us, tier, new java.sql.Timestamp(us / 1000))

  /** Batch-reference SCD2 fold of one user's complete event list. */
  private def reference(evs: Seq[Ev]): Seq[VersionRow] = {
    val out = ArrayBuffer.empty[VersionRow]
    var version = 0
    var open: Option[(Long, Long)] = None // (from, tier)
    evs.sortBy(e => (e.us, e.event_id)).foreach { e =>
      open match {
        case None =>
          version += 1; open = Some((e.us, e.tier))
        case Some((from, tier)) if e.tier != tier =>
          out += VersionRow(7L, version, tier, from, e.us, is_current = false)
          version += 1; open = Some((e.us, e.tier))
        case _ => ()
      }
    }
    open.foreach { case (from, tier) =>
      out += VersionRow(7L, version, tier, from, Long.MaxValue, is_current = true)
    }
    out.toSeq
  }

  test("cross-batch folding under an advancing watermark matches the batch fold") {
    val DelayMs = 30L * 60 * 1000
    (1 to 40).foreach { seed =>
      val rnd = new Random(seed)
      val n = 2 + rnd.nextInt(60)
      val sorted = (1 to n).map { i =>
        ev(i.toLong, i.toLong * 3 * 60 * 1000000 + rnd.nextInt(1000),
          rnd.nextInt(3).toLong)
      }
      // admissibly-late perturbation: swap adjacent events (≤ 3 min apart,
      // far inside the 30-min horizon) so deliveries cross batch
      // boundaries out of order — the case an eager fold gets wrong
      val perturbed = sorted.toArray
      (0 until n - 1).foreach { i =>
        if (rnd.nextBoolean()) { val t = perturbed(i); perturbed(i) = perturbed(i + 1); perturbed(i + 1) = t }
      }
      // random batch splits; watermark after each batch = max ts seen - delay
      val out = ArrayBuffer.empty[VersionRow]
      var state: Option[Scd2State] = None
      var maxTsMs = 0L
      var i = 0
      while (i < n) {
        val take = 1 + rnd.nextInt(8)
        val batch = perturbed.slice(i, math.min(n, i + take)).toSeq
        i += take
        val fake = new FakeState(state, timedOut = false, wmMs = math.max(0L, maxTsMs - DelayMs))
        out ++= StreamScd2.onGroup(7L, batch.iterator, fake)
        state = fake.opt
        maxTsMs = math.max(maxTsMs, batch.map(_.us / 1000).max)
      }
      // key goes quiet: the event-time timeout flushes the tail
      val fake = new FakeState(state, timedOut = true, wmMs = maxTsMs)
      out ++= StreamScd2.onGroup(7L, Iterator.empty, fake)
      assert(fake.opt.isEmpty, s"seed $seed: state not removed on timeout")
      assert(out.toSeq == reference(sorted.toSeq), s"seed $seed: diverged from batch fold")
    }
  }

  test("sentinel flush emits the open version as current and clears state") {
    val evs = Seq(ev(1, 1000000, 0), ev(2, 2000000, 1), ev(3, 3000000, 1))
    val fake = new FakeState(None, timedOut = false, wmMs = 0L)
    val sentinel = Ev(7L, -1L, 99999999L, 0L, new java.sql.Timestamp(99999L))
    val out = StreamScd2.onGroup(7L, (evs :+ sentinel).iterator, fake).toSeq
    assert(out == reference(evs), s"got $out")
    assert(out.last.is_current && out.last.valid_to_us == Long.MaxValue)
    assert(fake.opt.isEmpty, "sentinel did not clear state")
  }
}
