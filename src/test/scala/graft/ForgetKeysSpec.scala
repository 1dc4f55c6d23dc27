package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.ForgetKeys

/** The purge's PHYSICAL contract — what the value oracle can't see: the
  * rewrite touches exactly the forget set's bucket footprint; every other
  * partition's files are never replaced (same paths, same bytes length,
  * same mtime), and the purged layout holds zero forgotten rows.
  */
class ForgetKeysSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def listing(dir: java.nio.file.Path): Map[String, (Long, Long)] = {
    import scala.jdk.CollectionConverters._
    val ps = Files.walk(dir)
    try ps.iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
      .map(p => dir.relativize(p).toString ->
        (Files.size(p), Files.getLastModifiedTime(p).toMillis))
      .toMap
    finally ps.close()
  }

  test("forget-keys rewrites exactly the affected buckets and nothing else") {
    val dir = Files.createTempDirectory("forget-keys-spec")
    try {
      ForgetKeys.stage(spark, sf, dir)
      val pre = listing(dir)
      val audit = ForgetKeys.purgeInto(spark, dir).collect()
        .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getBoolean(4))).toMap
      val post = listing(dir)
      assert(audit.nonEmpty)
      val affected = audit.filter(_._2._4).keySet
      assert(affected.nonEmpty && affected.size < audit.size,
        s"pruning is vacuous: ${affected.size} of ${audit.size} buckets affected")
      // untouched buckets: identical file paths, sizes, and mtimes — the
      // purge never opened them
      val untouchedPre = pre.filter { case (p, _) =>
        !affected.exists(b => p.startsWith(s"bkt=$b/")) }
      val untouchedPost = post.filter { case (p, _) =>
        !affected.exists(b => p.startsWith(s"bkt=$b/")) }
      assert(untouchedPre == untouchedPost,
        "an unaffected bucket's files changed — the rewrite was not pruned")
      // affected buckets: the file set DID change
      affected.foreach { b =>
        val before = pre.keys.filter(_.startsWith(s"bkt=$b/")).toSet
        val after = post.keys.filter(_.startsWith(s"bkt=$b/")).toSet
        assert(before != after, s"bucket $b marked rewritten but files unchanged")
      }
      // the purged layout holds zero forgotten rows and the audit's
      // arithmetic is the census of what remains
      val back = spark.read.parquet(dir.toString)
      val fg = conv(substring(md5(concat(lit("fg"), col("user_id").cast("string"))),
        1, 15), 16, 10).cast("long") % 10 === 0
      assert(back.filter(fg).isEmpty, "a forgotten user's rows survived the purge")
      audit.foreach { case (b, (nb, na, np, _)) =>
        assert(nb == na + np, s"bucket $b census broken: $nb != $na + $np")
      }
      val remaining = back.groupBy(col("bkt").cast("int").as("b")).count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      audit.foreach { case (b, (_, na, _, _)) =>
        assert(remaining.getOrElse(b, 0L) == na,
          s"bucket $b read-back ${remaining.getOrElse(b, 0L)} != audited $na")
      }
    } finally graft.streaming.StagedEvents.deleteRecursively(dir)
  }

  test("streamed erasure: a replayed batchId is a no-op — no rewrite, no re-delete") {
    import spark.implicits._
    val table = Files.createTempDirectory("stream-forget-replay-table")
    val log = Files.createTempDirectory("stream-forget-replay-log")
    try {
      ForgetKeys.stage(spark, sf, table)
      // one arriving deletion batch: three users across two buckets
      val users = spark.read.parquet(table.toString)
        .select(col("user_id")).distinct().limit(3)
        .collect().map(_.getLong(0)).toSeq
      val keys = users.toDF("user_id")
      val touched = graft.streaming.StreamForgetKeys
        .applyForgetBatch(spark, table, log, keys, 0L)
      assert(touched == users.map(u => (u % 16).toInt).toSet, s"footprint $touched")
      val afterFirst = listing(table)
      assert(spark.read.parquet(table.toString)
        .filter(col("user_id").isin(users: _*)).head(1).isEmpty,
        "forgotten users must be gone after the first application")
      // the retry delivers the SAME batchId: marker short-circuits — no
      // partition rewritten (every file byte- and mtime-identical), no
      // directory deleted
      val replayTouched = graft.streaming.StreamForgetKeys
        .applyForgetBatch(spark, table, log, keys, 0L)
      assert(replayTouched.isEmpty, "replayed batchId must rewrite nothing")
      assert(listing(table) == afterFirst,
        "replay touched the table: file listing changed")
      // end-to-end: the streamed audit equals the batch purge's audit
      val streamed = graft.streaming.StreamForgetKeys.audit(spark, sf)
        .collect().map(_.toString).sorted.toSeq
      val batch = ForgetKeys.audit(spark, sf)
        .collect().map(_.toString).sorted.toSeq
      assert(streamed == batch)
    } finally {
      graft.streaming.StagedEvents.deleteRecursively(table)
      graft.streaming.StagedEvents.deleteRecursively(log)
    }
  }
}
