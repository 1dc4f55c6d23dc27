package graft

import org.apache.spark.sql.functions._

/** Bucketing = the 100 TB answer to repeated fact⋈fact joins: write both
  * tables bucketed (and sorted) by the join key once, and every subsequent
  * join on that key is co-located — a sort-merge join with NO Exchange on
  * either side. At cluster scale that turns the nightly
  * lineitem⋈orders-shaped join from the dominant shuffle into pure local
  * work. This spec pins both halves: the shuffle-free plan and the answer.
  */
class BucketingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("bucketed fact-fact join: sort-merge with zero exchanges, same answer") {
    import graft.tables.Tables
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_extendedprice"))
      .write.format("parquet")
      .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderpriority"))
      .write.format("parquet")
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bucketed")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), plan)
      assert(plan.contains("SelectedBucketsCount"), plan)

      val expected = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("bucket pruning: an equality filter on the bucket key reads one bucket") {
    import graft.tables.Tables
    spark.sql("DROP TABLE IF EXISTS li_prune")
    Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_extendedprice"))
      .write.format("parquet")
      .bucketBy(4, "l_orderkey")
      .mode("overwrite").saveAsTable("li_prune")
    // auto-bucketed-scan turns OFF bucketed reading for scans with no
    // downstream join/agg, which also drops bucket pruning — force it on
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val q = spark.table("li_prune").filter(col("l_orderkey") === 1L)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of 4"), plan)
    } finally {
      spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      spark.sql("DROP TABLE IF EXISTS li_prune")
    }
  }
}
