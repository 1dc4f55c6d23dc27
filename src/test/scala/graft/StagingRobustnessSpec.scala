package graft

import java.nio.file.{Files, Paths}

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import graft.sources.mzml.MzmlSynth

/** Concurrent/crash robustness of the two staging protocols that share
  * directories across JVMs (the round-7 ADVICE race fixes, pinned as
  * tests): MzmlSynth's build-then-atomic-rename run staging, and the
  * UUID-named bucketed-table staging that replaced the old
  * check-then-delete `clearOrphan` (a name fresh per JVM can never
  * collide with a live catalog's location, so no deletion of
  * possibly-live dirs ever happens).
  */
class StagingRobustnessSpec extends SparkSpec {

  test("mzml staging: an incomplete crash remnant is rebuilt, byte-identical") {
    // params distinct from the bench's (32, 96, 128) set: this test mutates
    // its staged dir
    val paths = MzmlSynth.stagedRuns(3, 4, 8)
    assert(paths.length == 3 && paths.forall(p => Files.exists(Paths.get(p))))
    val contents = paths.map(p => Files.readString(Paths.get(p)))
    // simulate a writer that died mid-stage: the dir exists but is missing
    // a file — the next staging must replace it wholesale via the tmp-dir
    // + atomic-rename path, never scan the half-written remnant
    Files.delete(Paths.get(paths.last))
    val again = MzmlSynth.stagedRuns(3, 4, 8)
    assert(again == paths, "staging paths are deterministic")
    assert(again.forall(p => Files.exists(Paths.get(p))))
    assert(again.map(p => Files.readString(Paths.get(p))) == contents,
      "re-staged content must be byte-identical (pure arithmetic generator)")
  }

  test("mzml staging: concurrent callers all observe complete runs") {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      // generous bound: under a loaded box (parallel sbt JVMs, bench
      // sweeps) the 8 concurrent stagings have flaked a 60s limit — the
      // assertion is about correctness, not latency
      val futs = (1 to 8).map(_ => Future(MzmlSynth.stagedRuns(2, 3, 6)))
      val all = Await.result(Future.sequence(futs), Duration("240s"))
      assert(all.distinct.size == 1, "every caller sees the same staged paths")
      assert(all.head.forall(p => Files.exists(Paths.get(p))))
    } finally pool.shutdown()
  }

  test("bucketed staging: concurrent prewarms are idempotent; release drops every table") {
    val sf = "/root/testdata/sf0.001"
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futs = (1 to 4).map(_ =>
        Future(graft.queries.Relational.prewarmStagedLayouts(spark, sf)))
      Await.result(Future.sequence(futs), Duration("300s"))
    } finally pool.shutdown()
    // exactly one (orders, customer) bucketed pair exists for this JVM —
    // concurrent staging never doubled up or errored
    val staged = spark.catalog.listTables().collect()
      .map(_.name).filter(_.contains("_bck_"))
    assert(staged.count(_.startsWith("orders_bck_")) == 1, staged.mkString(","))
    assert(staged.count(_.startsWith("customer_bck_")) == 1, staged.mkString(","))
    // the bucketed consumers still answer (sanity that the tables are live)
    assert(SparkEntry.queries("q3b_bucketed_topk")(spark, sf).count() > 0)
    // release drops the managed tables AND their warehouse dirs
    graft.queries.Relational.releaseBucketedTables(spark)
    val left = spark.catalog.listTables().collect().map(_.name).filter(_.contains("_bck_"))
    assert(left.isEmpty, s"tables left after release: ${left.mkString(",")}")
  }

  test("stageOnce: a winner committing mid-write is kept, the loser's tmp discarded") {
    // The r11 ADVICE race: JVM A passes the !exists(_SUCCESS) gate, then
    // JVM B commits `root` while A is still writing its tmp. A must NOT
    // delete B's just-committed layout (a reader mid-scan would see files
    // vanish) — it must re-check the marker, keep the winner's dir, and
    // discard its own tmp. Simulated in-process: the write callback plays
    // JVM B by committing root itself before returning.
    val dir = s"${sys.props("java.io.tmpdir")}/graft_stageonce_race_${java.util.UUID.randomUUID()}"
    val root = Paths.get(dir)
    try {
      val out = graft.ops.Multimodal.stageOnce(dir) { tmp =>
        // "JVM B" commits the real dir while "JVM A" is mid-write
        Files.createDirectories(root)
        Files.writeString(root.resolve("winner.txt"), "committed-by-winner")
        Files.writeString(root.resolve("_SUCCESS"), "")
        // A's own (losing) staged content
        Files.createDirectories(Paths.get(tmp))
        Files.writeString(Paths.get(tmp).resolve("loser.txt"), "from-loser")
      }
      assert(out == dir)
      assert(Files.exists(root.resolve("_SUCCESS")), "winner's marker survives")
      assert(Files.readString(root.resolve("winner.txt")) == "committed-by-winner",
        "winner's committed content must never be deleted")
      assert(!Files.exists(root.resolve("loser.txt")), "loser's content never lands")
      // the loser's tmp dir is cleaned up
      val leftovers = Option(root.getParent.toFile.listFiles()).getOrElse(Array.empty)
        .map(_.getName).filter(n => n.startsWith(root.getFileName.toString + ".") && n.endsWith(".tmp"))
      assert(leftovers.isEmpty, s"tmp dirs left behind: ${leftovers.mkString(",")}")
      // a second call is a pure no-op read of the winner's dir
      graft.ops.Multimodal.stageOnce(dir) { _ => fail("must not re-stage a committed dir") }
    } finally graft.streaming.StagedEvents.deleteRecursively(root)
  }
}
