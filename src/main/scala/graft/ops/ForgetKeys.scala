package graft.ops

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The right-to-be-forgotten job — a key-set purge done the way a 100 TB
  * lakehouse actually does it: the stored table is partitioned by a key
  * bucket (`user_id % 16`), the forget set maps to the buckets it lives
  * in, and ONLY those partitions are rewritten (dynamic partition
  * overwrite); every other file is never opened, never rewritten —
  * byte-identical before and after (the mtime pin in ForgetKeysSpec).
  * A naive purge rewrites the whole table; the pruned rewrite's cost is
  * proportional to the forget set's bucket footprint, which is what makes
  * weekly GDPR erasure batches feasible against petabyte facts.
  *
  * The forget set is md5-derived (~10% of users) so the DuckDB oracle
  * replays membership exactly; a bucket whose rows are ALL forgotten
  * produces no survivor rows for the dynamic overwrite to replace, so its
  * stale partition directory is deleted explicitly (bounded: ≤16 buckets).
  * The audit is the read-back per-bucket before/after census — proving
  * the purge from the rewritten layout itself, not from the plan.
  */
object ForgetKeys {

  /** ~10% of users, md5-derived — replayable in SQL. */
  private def forgotten = conv(substring(
    md5(concat(lit("fg"), col("user_id").cast("string"))), 1, 15), 16, 10)
    .cast("long") % 10 === 0

  /** Write `sfDir`'s events as the bucket-partitioned stored table. */
  def stage(spark: SparkSession, sfDir: String, dir: Path): Unit = {
    val ev = graft.tables.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        pmod(col("user_id"), lit(16L)).as("bkt"))
    require(ev.head(1).nonEmpty, s"$sfDir/events.parquet is empty")
    ev.repartition(col("bkt"))
      .write.mode("overwrite").partitionBy("bkt").parquet(dir.toString)
  }

  /** Purge the forget set from an already-staged table at `dir`,
    * rewriting only the affected partitions; returns the per-bucket
    * audit (before/after census) as a collected, dir-independent frame.
    */
  def purgeInto(spark: SparkSession, dir: Path): DataFrame =
    graft.tables.Tables.withShufflePartitions(spark, 4) {
      import spark.implicits._
      val stored = spark.read.parquet(dir.toString)
      // bounded (≤16 rows): the pre-rewrite census must be materialized
      // BEFORE the overwrite — the frame is lazy over the files it audits
      val before = stored.groupBy(col("bkt").cast("int").as("bkt"))
        .agg(count(lit(1)).as("n_before"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      // bounded (≤16 rows): the forget set's bucket footprint — the only
      // partitions the rewrite may touch
      val affected = stored.filter(forgotten)
        .select(col("bkt").cast("int")).distinct()
        .collect().map(_.getInt(0)).toSet
      val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try {
        stored.filter(col("bkt").cast("int").isin(affected.toSeq: _*))
          .filter(!forgotten)
          .repartition(col("bkt"))
          .write.mode("overwrite").partitionBy("bkt").parquet(dir.toString)
      } finally prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      // a fully-forgotten bucket emits no survivors, so dynamic overwrite
      // leaves its stale directory — delete it explicitly (≤16 dirs).
      // ONE survivor census over all affected dirs (basePath keeps the
      // bkt partition column) instead of one driver-sequential probe job
      // per bucket: the loop was ≤16 tiny Spark jobs run back-to-back on
      // the driver — pure scheduling overhead at any scale (guide §5).
      val existing = affected.toSeq.sorted
        .filter(b => Files.exists(dir.resolve(s"bkt=$b")))
      if (existing.nonEmpty) {
        val surviving = spark.read.option("basePath", dir.toString)
          .parquet(existing.map(b => dir.resolve(s"bkt=$b").toString): _*)
          .filter(!forgotten)
          .select(col("bkt").cast("int")).distinct()
          .collect().map(_.getInt(0)).toSet
        existing.filterNot(surviving).foreach(b =>
          graft.streaming.StagedEvents.deleteRecursively(dir.resolve(s"bkt=$b")))
      }
      // bounded (≤16 rows): read the purged layout back — the audit
      // proves the purge from the files, not the plan
      val after = spark.read.parquet(dir.toString)
        .groupBy(col("bkt").cast("int").as("bkt"))
        .agg(count(lit(1)).as("n_after"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      before.toSeq.sortBy(_._1).map { case (b, nb) =>
        val na = after.getOrElse(b, 0L)
        (b, nb, na, nb - na, affected.contains(b))
      }.toDF("bkt", "n_before", "n_after", "n_purged", "rewritten")
    }

  def audit(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = Files.createTempDirectory("forget-keys")
    try {
      stage(spark, sfDir, dir)
      purgeInto(spark, dir)
    } finally graft.streaming.StagedEvents.deleteRecursively(dir)
  }
}
