package graft.streaming

import org.apache.spark.sql.streaming.GroupState
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable.ArrayBuffer
import scala.util.Random

/** Unit tests for the streaming as-of state transition (no Spark session):
  * the Verify run only exercises the sentinel-flush path, so cross-batch
  * folding under an advancing watermark — including admissibly LATE view
  * deliveries, which an eager fold would enrich against the wrong state —
  * and the scalar-keeping timeout branch are pinned with a fake GroupState.
  */
class StreamAsofSpec extends AnyFunSuite {

  import StreamAsof.{Ev, AsofState, EnrichedRow}

  private final class FakeState(var opt: Option[AsofState], val timedOut: Boolean,
      val wmMs: Long) extends GroupState[AsofState] {
    var timeoutTs: Long = -1L
    override def exists: Boolean = opt.isDefined
    override def get: AsofState = opt.get
    override def getOption: Option[AsofState] = opt
    override def update(s: AsofState): Unit = { opt = Some(s) }
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

  private def ev(id: Long, us: Long, isView: Boolean, cents: Long) =
    Ev(7L, id, us, isView, cents, new java.sql.Timestamp(us / 1000))

  /** Batch-reference as-of fold over one user's complete event list. */
  private def reference(evs: Seq[Ev]): Seq[EnrichedRow] = {
    val out = ArrayBuffer.empty[EnrichedRow]
    var latest: Option[(Long, Long)] = None // (v_us, v_cents)
    evs.sortBy(e => (e.us, e.event_id)).foreach { e =>
      if (e.isView) latest = Some((e.us, e.cents))
      else out += EnrichedRow(7L, e.event_id, e.us,
        latest.map(_._1), latest.map(_._2))
    }
    out.toSeq
  }

  test("cross-batch as-of folding under an advancing watermark matches the batch fold") {
    val DelayMs = 30L * 60 * 1000
    (1 to 40).foreach { seed =>
      val rnd = new Random(seed)
      val n = 2 + rnd.nextInt(60)
      val sorted = (1 to n).map { i =>
        ev(i.toLong, i.toLong * 3 * 60 * 1000000 + rnd.nextInt(1000),
          rnd.nextBoolean(), 100L + rnd.nextInt(900))
      }
      // admissibly-late perturbation: adjacent swaps cross batch
      // boundaries out of order — the case eager enrichment gets wrong
      // (a late view must retroactively NOT apply to an earlier purchase)
      val perturbed = sorted.toArray
      (0 until n - 1).foreach { i =>
        if (rnd.nextBoolean()) { val t = perturbed(i); perturbed(i) = perturbed(i + 1); perturbed(i + 1) = t }
      }
      val out = ArrayBuffer.empty[EnrichedRow]
      var state: Option[AsofState] = None
      var maxTsMs = 0L
      var i = 0
      while (i < n) {
        val take = 1 + rnd.nextInt(8)
        val batch = perturbed.slice(i, math.min(n, i + take)).toSeq
        i += take
        val fake = new FakeState(state, timedOut = false,
          wmMs = math.max(0L, maxTsMs - DelayMs))
        out ++= StreamAsof.onGroup(7L, batch.iterator, fake)
        state = fake.opt
        maxTsMs = math.max(maxTsMs, batch.map(_.us / 1000).max)
      }
      // quiet key: the timeout flushes the tail but KEEPS the scalars
      val fake = new FakeState(state, timedOut = true, wmMs = maxTsMs)
      out ++= StreamAsof.onGroup(7L, Iterator.empty, fake)
      assert(fake.opt.isDefined && fake.opt.get.buf.isEmpty,
        s"seed $seed: timeout must keep the O(1) scalars, drop the buffer")
      assert(out.toSeq.sortBy(_.event_id) == reference(sorted.toSeq).sortBy(_.event_id),
        s"seed $seed: diverged from batch fold")
      // a late-waking key enriches against the kept scalars
      val wake = ev(n + 1L, (n + 100L) * 3 * 60 * 1000000, isView = false, 0L)
      val fake2 = new FakeState(fake.opt, timedOut = false, wmMs = Long.MaxValue / 2000)
      val woken = StreamAsof.onGroup(7L, Iterator(wake), fake2).toSeq
      val lastView = sorted.filter(_.isView).lastOption
      assert(woken.map(r => (r.v_us, r.v_cents)) ==
        Seq((lastView.map(_.us), lastView.map(_.cents))),
        s"seed $seed: late-waking purchase enriched wrongly")
    }
  }

  test("sentinel flush emits every buffered purchase and clears state") {
    val evs = Seq(ev(1, 1000000, isView = true, 500),
      ev(2, 2000000, isView = false, 0), ev(3, 3000000, isView = false, 0))
    val fake = new FakeState(None, timedOut = false, wmMs = 0L)
    val sentinel = Ev(7L, -1L, 99999999L, isView = false, 0L,
      new java.sql.Timestamp(99999L))
    val out = StreamAsof.onGroup(7L, (evs :+ sentinel).iterator, fake).toSeq
    assert(out == reference(evs), s"got $out")
    assert(fake.opt.isEmpty, "sentinel did not clear state")
  }
}
