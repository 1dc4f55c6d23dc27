package graft

import org.apache.spark.sql.functions._

/** Bucketed-table co-located join — the storage-layout strategy that removes
  * BOTH join shuffles at 100 TB: write each fact table bucketed (and
  * per-bucket sorted) on the join key, and the planner wires bucket i of one
  * side to bucket i of the other in the same task. A recurring
  * orders⋈customer join (the q3/q5 shape) then costs zero exchanges per run
  * instead of re-shuffling both tables every time — the bucketing shuffle is
  * paid ONCE at write time and amortized over every subsequent join.
  *
  * The write is single-file-per-bucket, so each join task streams one
  * pre-sorted file per side; the residual per-task Sort (Spark ≥3.0 ignores
  * on-disk sort order unless a legacy flag is set) is a linear in-memory
  * pass with no exchange.
  */
class BucketedJoinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("bucketed orders ⋈ customer: zero join exchanges, no re-sort") {
    import graft.tables.Tables._
    // broadcast would bypass the layout under test at this tiny scale; at
    // 100 TB neither side broadcasts and bucketing is the only shuffle-free
    // plan, so pin the shuffle-based planner for the assertion
    val thrKey = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(thrKey)
    spark.conf.set(thrKey, "-1")
    try {
      // coalesce(1): one writer task ⇒ exactly one file per bucket ⇒ Spark
      // trusts the per-bucket sort order on read (multi-file buckets are
      // read unsorted and would re-Sort before the merge join)
      orders(spark, sf).coalesce(1).write
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("orders_bucketed")
      customer(spark, sf).coalesce(1).write
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable("customer_bucketed")
      val joined = spark.table("orders_bucketed")
        .join(spark.table("customer_bucketed"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      // the ONE exchange is the post-join aggregation (on c_mktsegment);
      // the join itself reads both sides already co-partitioned by bucket
      assert("Exchange hashpartitioning".r.findAllMatchIn(p).length == 1,
        "join side shuffled despite bucketing:\n" + p)
      // NOTE: a Sort node remains below the join — Spark ≥3.0 ignores the
      // on-disk bucket sort order by default (legacy flag
      // spark.sql.legacy.bucketedTableScanOutputOrdering restores it). The
      // Sort is per-task over one pre-sorted bucket file — a linear verify
      // pass, NO exchange — so the scale property (no shuffle) holds.
      // and the answer matches the plain (shuffled) join byte-for-byte
      val expected = orders(spark, sf)
        .join(customer(spark, sf), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
        .collect().map(_.toString).sorted
      assert(joined.collect().map(_.toString).sorted.sameElements(expected))
    } finally {
      spark.conf.set(thrKey, prev)
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS customer_bucketed")
    }
  }

  test("bucketed posting self-join: the whole plan runs without one exchange") {
    // grouping key AND join key both equal the bucket key (term), so the
    // per-half df aggregations and the final join all consume the bucket
    // partitioning in place — zero Exchange anywhere in the plan. Pin the
    // shuffle planner (no broadcast) so the layout is what's under test.
    val thrKey = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(thrKey)
    spark.conf.set(thrKey, "-1")
    try {
      val q = SparkEntry.queries("text_postings_bucketed_join")(spark, sf)
      val p = q.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        "bucketed posting plan still exchanges:\n" + p)
      assert(q.count() > 0)
    } finally spark.conf.set(thrKey, prev)
  }
}
