package graft

import org.apache.spark.sql.functions._

/** Directory-partitioned layout + partition pruning: at 100 TB the events
  * table is written `partitionBy(<predicate column>)` and a filtered scan
  * must read ONLY the matching directories — pruning happens at planning
  * from the file index, before any I/O. This is the other half of the
  * layout story next to bucketing (BucketedJoinSpec): bucketing kills join
  * shuffles, partitioning kills scan volume.
  */
class PartitionPruningSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("filtered scan over a partitioned layout reads only matching partitions") {
    import graft.tables.Tables._
    val dir = java.nio.file.Files.createTempDirectory("part").toString + "/events"
    events(spark, sf)
      .withColumn("ts", unix_micros(col("ts"))) // plain long partitions cleanly
      .write.partitionBy("event_type").mode("overwrite").parquet(dir)

    val q = spark.read.parquet(dir)
      .filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    val p = q.queryExecution.executedPlan.toString

    // the filter must appear as a PartitionFilter (planning-time, on the
    // file index), NOT as a PushedFilter (row-group-time, after opening
    // files) and NOT as a post-scan Filter
    assert(p.contains("PartitionFilters: [isnotnull(event_type"), p)
    assert(p.contains("(event_type#"), p)
    assert(!p.contains("PushedFilters: [IsNotNull(event_type)"), p)

    // answers match the unpartitioned read
    val expected = events(spark, sf).filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(_.toString).sorted
    assert(q.collect().map(_.toString).sorted.sameElements(expected))

    // and the scan touched exactly the files under event_type=view — the
    // numFiles metric counts post-pruning selection
    def parquetFiles(sub: String) = {
      val f = new java.io.File(dir + sub)
      Option(f.listFiles()).toSeq.flatten.count(_.getName.endsWith(".parquet"))
    }
    val viewFiles = parquetFiles("/event_type=view")
    val allFiles = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("event_type="))
      .map(d => parquetFiles("/" + d.getName)).sum
    // with AQE on, the executedPlan's leaf is the AdaptiveSparkPlanExec
    // wrapper — recurse through it (and materialized query stages) to reach
    // the real FileSourceScanExec before reading its metrics
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(plan: SparkPlan): Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
      plan match {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case qs: QueryStageExec       => scans(qs.plan)
        case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
        case other => other.children.flatMap(scans)
      }
    val numFiles = scans(q.queryExecution.executedPlan).map(_.metrics("numFiles").value).sum
    assert(viewFiles > 0 && allFiles > viewFiles, s"$viewFiles / $allFiles")
    assert(numFiles == viewFiles, s"scan read $numFiles files, expected $viewFiles")
  }

  test("s12: z-order box scan prunes cells at planning time and matches the flat scan") {
    import graft.tables.Tables._
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(plan: SparkPlan): Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
      plan match {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case qs: QueryStageExec       => scans(qs.plan)
        case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
        case other => other.children.flatMap(scans)
      }

    val q = SparkEntry.queries("s12_zorder_scan")(spark, sf)
    val got = q.collect().map(_.toString).sorted

    // the zcell membership must prune at PLANNING time (PartitionFilters
    // over the Morton-cell directories), never as a row filter
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: ") && p.contains("zcell"), p)

    val scan = scans(q.queryExecution.executedPlan)
    val read = scan.map(_.metrics("numFiles").value).sum
    // total files across ALL staged z-cells, from the scan's own root path
    val root = scan.head.relation.location.rootPaths.head.toString.stripPrefix("file:")
    val all = Option(new java.io.File(root).listFiles()).toSeq.flatten
      .filter(_.getName.startsWith("zcell="))
      .flatMap(d => Option(d.listFiles()).toSeq.flatten)
      .count(_.getName.endsWith(".parquet"))
    assert(read > 0 && read < all,
      s"z-order box read $read of $all files — expected a strict subset")

    // the pruned+residual-filtered answer equals the flat full-scan answer
    val (umin, umax) = {
      val r = events(spark, sf).agg(min(col("user_id")), max(col("user_id"))).head()
      (r.getLong(0), r.getLong(1))
    }
    val (tmin, tmax) = {
      val r = events(spark, sf)
        .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
      (r.getLong(0), r.getLong(1))
    }
    def pct(lo: Long, hi: Long, p: Long) = lo + (hi - lo) * p / 100
    val flat = events(spark, sf)
      .filter(col("user_id").between(pct(umin, umax, 25), pct(umin, umax, 50)) &&
        unix_micros(col("ts")).between(pct(tmin, tmax, 25), pct(tmin, tmax, 50)))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("value_sum"))
      .collect().map(_.toString).sorted
    assert(got.sameElements(flat), s"${got.toSeq} vs ${flat.toSeq}")
  }

  test("s14: zone-map manifest selects a strict subset of files; answer matches the flat scan") {
    import graft.tables.Tables._
    val df = SparkEntry.queries("s14_zonemap_scan")(spark, sf)
    val got = df.collect().map(_.toString).sorted
    // the returned plan scans ONLY the manifest-selected data files (the
    // manifest itself was consumed driver-side at planning)
    val read = df.inputFiles.count(_.contains("/data/"))
    val root = df.inputFiles.head
      .replaceAll("file:", "").replaceAll("/data/.*$", "/data")
    val all = Option(new java.io.File(root).listFiles()).toSeq.flatten
      .count(_.getName.endsWith(".parquet"))
    assert(read > 0 && read < all,
      s"zone-map read $read of $all files — expected a strict subset")
    val flat = events(spark, sf)
      .filter(col("value") >= 100.0 && col("value") <= 150.0)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("sum_cents"))
      .collect().map(_.toString).sorted
    assert(got.sameElements(flat), s"${got.toSeq} vs ${flat.toSeq}")
  }

  test("zone-map ingest: streamed deltas + incremental manifest serve the same answer") {
    // base ∪ streamed delta is the whole table, so the append→refresh→serve
    // loop must land exactly where the batch layout's query does
    val ingest = SparkEntry.queries("stream_zonemap_ingest")(spark, sf)
      .collect().map(_.toString).sorted
    val batch = SparkEntry.queries("s14_zonemap_scan")(spark, sf)
      .collect().map(_.toString).sorted
    assert(ingest.sameElements(batch), s"${ingest.toSeq} vs ${batch.toSeq}")
    // the OPTIMIZE step: same answer again (its restored strict-subset
    // read is an in-query require — a pruning regression fails loudly)
    val compacted = SparkEntry.queries("zonemap_recompaction")(spark, sf)
      .collect().map(_.toString).sorted
    assert(compacted.sameElements(batch), s"${compacted.toSeq} vs ${batch.toSeq}")
  }
}
