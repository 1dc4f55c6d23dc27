package graft

import org.apache.spark.sql.functions._

/** Invariants of the CDC/IVM family (cdc_scd2, cdc_merge_upsert,
  * agg_incremental_merge_gated) that the value-pinning oracle can't
  * express: interval algebra of the SCD2 output, the
  * tombstone/resurrection semantics of the merge, and the
  * gate-commutes-with-merge proof of the quarantine-aware rollup.
  */
class CdcSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("cdc_scd2: versions dense, intervals contiguous, one open row per key") {
    val rows = graft.queries.Temporal.all("cdc_scd2")(spark, sf)
      .select("user_id", "version", "tier", "valid_from_us", "valid_to_us", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(rows.nonEmpty, "fixture produced no SCD2 rows — test is vacuous")
    rows.groupBy(_._1).foreach { case (uid, vs) =>
      val sorted = vs.sortBy(_._2)
      // versions are 1..n with no gaps
      assert(sorted.map(_._2).toSeq == (1 to sorted.length), s"user $uid versions not dense")
      // contiguous: each version's valid_to equals the next valid_from
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5 == b._4, s"user $uid gap between v${a._2} and v${b._2}")
          // compaction: consecutive versions must differ in tier
          assert(a._3 != b._3, s"user $uid no-op change survived at v${b._2}")
        case _ => ()
      }
      // exactly the last version is open/current
      assert(sorted.count(_._6) == 1 && sorted.last._6,
        s"user $uid open-interval rows wrong")
      assert(sorted.last._5 == Long.MaxValue, s"user $uid last interval not open")
    }
  }

  test("cdc_merge_upsert: latest-wins with tombstone delete and resurrection") {
    val cutoff = 1705708800000000L
    val got = graft.queries.Temporal.all("cdc_merge_upsert")(spark, sf)
      .collect().map(r => r.getLong(0) -> r).toMap
    // independent reference: fold each user's full history in driver code
    val ev = graft.tables.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        col("event_type"), round(col("value") * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
    val byUser = ev.groupBy(_._1)
    var checkedDelete = false
    var checkedResurrect = false
    byUser.foreach { case (uid, rows) =>
      val base = rows.filter(r => r._2 < cutoff && r._4 != "error")
        .sortBy(r => (-r._2, -r._3)).headOption
      val delta = rows.filter(_._2 >= cutoff).sortBy(r => (-r._2, -r._3))
      val newest = (base.map(r => (r, false)).toSeq ++ delta.map(r => (r, true)))
        .sortBy { case (r, _) => (-r._2, -r._3) }.headOption
      newest match {
        case Some((r, _)) if r._4 == "error" =>
          assert(!got.contains(uid), s"user $uid survived its tombstone")
          checkedDelete = true
        case Some((r, isChg)) =>
          val out = got.get(uid)
          assert(out.isDefined, s"user $uid missing from merge output")
          assert(out.get.getAs[Long]("cents") == r._5, s"user $uid wrong cents")
          assert(out.get.getAs[Boolean]("updated") == isChg, s"user $uid wrong updated")
          assert(out.get.getAs[Long]("n_changes") == delta.length, s"user $uid wrong n_changes")
          if (delta.exists(_._4 == "error")) checkedResurrect = true
        case None => assert(!got.contains(uid))
      }
    }
    assert(checkedDelete, "no user ends on a tombstone — delete path untested")
    assert(checkedResurrect, "no post-tombstone upsert — resurrection path untested")
  }

  test("agg_incremental_merge_gated: gate partitions rows, both severities " +
      "fire, merge equals one-pass, two scans") {
    val df = graft.queries.Temporal.all("agg_incremental_merge_gated")(spark, sf)
    val rows = df.collect().map(r => (r.getAs[String]("source"),
      r.getAs[Long]("n_docs"), r.getAs[Long]("n_warn"),
      r.getAs[Long]("n_quarantined"))).toSeq
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    // the gate PARTITIONS every row into kept or quarantined — nothing
    // dropped silently, nothing double-counted
    assert(rows.map(r => r._2 + r._4).sum == total,
      s"kept + quarantined != $total doc rows")
    // both severities must demonstrably fire, or the gate is vacuous
    assert(rows.map(_._4).sum > 0, "error gate excluded nothing — vacuous")
    assert(rows.map(_._3).sum > 0, "warn counter counted nothing — vacuous")
    // warn rows are KEPT: every source's warn count is bounded by its kept
    rows.foreach { case (src, n, w, _) =>
      assert(w <= n, s"$src: warn $w exceeds kept $n — warn rows were dropped")
    }
    // the IVM proof independent of the DuckDB oracle: the merged
    // state+delta result must equal the same gated aggregate computed in
    // ONE pass with no slice split (gating commutes with the merge)
    val doc = spark.read.parquet(s"$sf/documents.parquet").select(
      col("source"), col("n_chars"),
      (col("text").isNull || trim(col("text")) === "" ||
        col("n_chars") =!= length(col("text")) ||
        col("n_chars") < 60).as("err"),
      (col("n_chars") < 100).as("warn"))
    val onePass = doc.groupBy(col("source")).agg(
      sum(when(!col("err"), 1L).otherwise(0L)).as("n_docs"),
      sum(when(!col("err"), col("n_chars"))).as("sum_chars"),
      min(when(!col("err"), col("n_chars"))).as("min_chars"),
      max(when(!col("err"), col("n_chars"))).as("max_chars"),
      sum(when(!col("err") && col("warn"), 1L).otherwise(0L)).as("n_warn"),
      sum(when(col("err"), 1L).otherwise(0L)).as("n_quarantined"))
      .select(col("source"), col("n_docs"), col("sum_chars"),
        col("min_chars"), col("max_chars"), col("n_warn"),
        col("n_quarantined"),
        when(col("n_docs") > 0L,
          round(col("sum_chars").cast("double") / col("n_docs"), 6))
          .as("avg_chars"))
    assert(df.exceptAll(onePass).isEmpty && onePass.exceptAll(df).isEmpty,
      "merged state+delta diverges from the one-pass gated aggregate")
    // incremental shape: exactly TWO documents scans (state + delta) — the
    // whole point is that a refresh never re-scans history a third time
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 2, s"expected 2 parquet scans (state + delta), saw $scans:\n$p")
  }

  test("cdc_asof_snapshot: each snapshot is the interval algebra's point read") {
    val dim = graft.queries.Temporal.all("cdc_scd2")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val snap = graft.queries.Temporal.all("cdc_asof_snapshot")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    assert(snap.nonEmpty, "no snapshot rows — cutoffs outside the events span")
    val cutoffs = Map("2024-01-08" -> 1704672000000000L,
      "2024-01-16" -> 1705363200000000L, "2024-01-24" -> 1706054400000000L)
    // exactly one row per (asof, user) — a snapshot is a function of key
    val dupes = snap.groupBy(r => (r._1, r._2)).filter(_._2.length > 1)
    assert(dupes.isEmpty, s"snapshot has ${dupes.size} duplicated (asof,user) keys")
    // per asof: present users == users whose first version opened by then,
    // and each row is that user's interval covering the cutoff
    cutoffs.foreach { case (day, t) =>
      val expect = dim.filter(v => v._4 <= t && t < v._5)
        .map(v => (day, v._1, v._2, v._3, v._4)).toSet
      val got = snap.filter(_._1 == day).toSet
      assert(got == expect, s"$day snapshot diverges from the interval read")
    }
    // time moves forward: membership never shrinks (SCD2 keys are never
    // deleted) and versions strictly advance as users change tiers
    // between cutoffs
    val byDay = cutoffs.toSeq.sortBy(_._2).map { case (day, _) =>
      (snap.count(_._1 == day), snap.filter(_._1 == day).map(_._3.toLong).sum) }
    val (sizes, vsums) = byDay.unzip
    assert(sizes == sizes.sorted, s"snapshot membership shrank: $sizes")
    assert(vsums == vsums.sorted && vsums.last > vsums.head,
      s"version totals not advancing across cutoffs: $vsums")
  }
}
