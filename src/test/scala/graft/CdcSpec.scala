package graft

import org.apache.spark.sql.functions._

/** Invariants of the CDC family (cdc_scd2, cdc_merge_upsert) that the
  * value-pinning oracle can't express: interval algebra of the SCD2
  * output, and the tombstone/resurrection semantics of the merge.
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
}
