package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Physical-layout pins for the IVF-PQ compaction step: the
  * repartition(cell) + partitionBy(cell) write must produce ONE parquet
  * file per inverted list (not one per task × cell fragment), and a
  * probe reading a single cell must hit the partition-pruning path —
  * PartitionFilters in the scan, so the other 15 lists are never opened.
  */
class CompactionSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("one file per inverted list; single-cell reads prune partitions") {
    val dir = Files.createTempDirectory("compaction-spec")
    try {
      graft.queries.Similarity.ivfpqCellsShared(spark, sf)
        .join(graft.queries.Similarity.pqCodesShared(spark, sf), Seq("vec_id"))
        .repartition(col("cell"))
        .write.mode("overwrite").partitionBy("cell").parquet(dir.toString)

      import scala.jdk.CollectionConverters._
      val walk = Files.walk(dir)
      val cellDirs =
        try walk.iterator().asScala
          .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("cell="))
          .toVector
        finally walk.close()
      assert(cellDirs.nonEmpty)
      cellDirs.foreach { cd =>
        val ls = Files.list(cd)
        val parts =
          try ls.iterator().asScala
            .count(_.getFileName.toString.endsWith(".parquet"))
          finally ls.close()
        assert(parts === 1, s"inverted list $cd fragmented into $parts files")
      }

      val someCell = cellDirs.head.getFileName.toString.stripPrefix("cell=").toInt
      val pruned = spark.read.parquet(dir.toString).filter(col("cell") === someCell)
      val plan = pruned.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("cell"), plan)
      assert(pruned.select(col("cell")).distinct().collect().map(_.getInt(0)).toSet
        === Set(someCell))
    } finally graft.streaming.StagedEvents.deleteRecursively(dir)
  }

  test("the streamed probe's candidate scan reads exactly the probed cells' files") {
    val dir = Files.createTempDirectory("compacted-probe-spec")
    try {
      graft.queries.Similarity.ivfpqCellsShared(spark, sf)
        .join(graft.queries.Similarity.pqCodesShared(spark, sf), Seq("vec_id"))
        .repartition(col("cell"))
        .write.mode("overwrite").partitionBy("cell").parquet(dir.toString)
      val allCells = spark.read.parquet(dir.toString)
        .select(col("cell").cast("int")).distinct().collect().map(_.getInt(0)).sorted
      assert(allCells.length >= 3, s"need ≥3 lists to prove pruning: ${allCells.toSeq}")
      val probed = allCells.take(2).toSeq

      val codes =
        graft.streaming.CompactedProbe.compactedCodes(spark, dir.toString, probed)
      val plan = codes.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("cell"), plan)
      assert(codes.select(col("cell")).distinct().collect().map(_.getInt(0)).toSet
        === probed.toSet)

      // physical pin: with one file per list, files read == cells probed
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def scans(p: SparkPlan): Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
        p match {
          case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
          case qs: QueryStageExec       => scans(qs.plan)
          case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
          case other => other.children.flatMap(scans)
        }
      codes.collect()
      val numFiles =
        scans(codes.queryExecution.executedPlan).map(_.metrics("numFiles").value).sum
      assert(numFiles === probed.size.toLong,
        s"scan read $numFiles files for ${probed.size} probed cells")
    } finally graft.streaming.StagedEvents.deleteRecursively(dir)
  }

  test("append fragments the lists; re-compaction restores one file per list") {
    import scala.jdk.CollectionConverters._
    def filesPerCell(root: java.nio.file.Path): Map[String, Int] = {
      val walk = Files.walk(root)
      try walk.iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".parquet"))
        .toVector
        .groupBy(_.getParent.getFileName.toString)
        .map { case (cell, fs) => cell -> fs.size }
      finally walk.close()
    }
    val idx = graft.queries.Similarity.ivfpqCellsShared(spark, sf)
      .join(graft.queries.Similarity.pqCodesShared(spark, sf), Seq("vec_id"))
    val log = Files.createTempDirectory("recompaction-spec-log")
    val merged = Files.createTempDirectory("recompaction-spec-merged")
    try {
      idx.filter(col("vec_id") % 2 === 0).repartition(col("cell"))
        .write.mode("overwrite").partitionBy("cell").parquet(log.toString)
      idx.filter(col("vec_id") % 2 === 1).repartition(col("cell"))
        .write.mode("append").partitionBy("cell").parquet(log.toString)
      // the append left at least one list fragmented
      assert(filesPerCell(log).values.max >= 2, filesPerCell(log).toString)

      spark.read.parquet(log.toString)
        .repartition(col("cell"))
        .write.mode("overwrite").partitionBy("cell").parquet(merged.toString)
      val after = filesPerCell(merged)
      assert(after.nonEmpty && after.values.forall(_ === 1), after.toString)

      // and the merge lost nothing: same (cell, vec_id, sub, c_id) set
      val before = idx.select(col("cell").cast("long"), col("vec_id"),
        col("sub").cast("long"), col("c_id").cast("long"))
        .collect().map(_.toString).sorted.toSeq
      val read = spark.read.parquet(merged.toString)
        .select(col("cell").cast("long"), col("vec_id"),
          col("sub").cast("long"), col("c_id").cast("long"))
        .collect().map(_.toString).sorted.toSeq
      assert(read === before)
    } finally {
      graft.streaming.StagedEvents.deleteRecursively(log)
      graft.streaming.StagedEvents.deleteRecursively(merged)
    }
  }

  test("postings append fragments the buckets; re-compaction restores one file each") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.functions.{conv, md5, substring}
    def filesPerBucket(root: java.nio.file.Path): Map[String, Int] = {
      val walk = Files.walk(root)
      try walk.iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".parquet"))
        .toVector
        .groupBy(_.getParent.getFileName.toString)
        .map { case (b, fs) => b -> fs.size }
      finally walk.close()
    }
    val bucketed = graft.queries.TextOps.postingsShared(spark, sf).withColumn("bucket",
      (conv(substring(md5(col("term")), 1, 15), 16, 10).cast("long")
        % 16).cast("int"))
    val log = Files.createTempDirectory("postings-recompaction-log")
    val merged = Files.createTempDirectory("postings-recompaction-merged")
    try {
      bucketed.filter(col("doc_id") % 2 === 0).repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(log.toString)
      bucketed.filter(col("doc_id") % 2 === 1).repartition(col("bucket"))
        .write.mode("append").partitionBy("bucket").parquet(log.toString)
      // the append left at least one bucket fragmented
      assert(filesPerBucket(log).values.max >= 2, filesPerBucket(log).toString)

      spark.read.parquet(log.toString)
        .repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(merged.toString)
      val after = filesPerBucket(merged)
      assert(after.nonEmpty && after.values.forall(_ === 1), after.toString)

      // and the merge lost nothing: same (bucket, doc_id, term, tf) set
      val before = bucketed
        .select(col("bucket").cast("long"), col("doc_id"), col("term"),
          col("tf").cast("long"))
        .collect().map(_.toString).sorted.toSeq
      val read = spark.read.parquet(merged.toString)
        .select(col("bucket").cast("long"), col("doc_id"), col("term"),
          col("tf").cast("long"))
        .collect().map(_.toString).sorted.toSeq
      assert(read === before)
    } finally {
      graft.streaming.StagedEvents.deleteRecursively(log)
      graft.streaming.StagedEvents.deleteRecursively(merged)
    }
  }

  test("term-posting buckets: probe terms' buckets read without opening the rest") {
    import org.apache.spark.sql.functions.{conv, md5, substring}
    val dir = Files.createTempDirectory("postings-compaction-spec")
    try {
      graft.queries.TextOps.postingsShared(spark, sf).withColumn("bucket",
        (conv(substring(md5(col("term")), 1, 15), 16, 10).cast("long")
          % 16).cast("int"))
        .repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(dir.toString)
      val buckets = spark.read.parquet(dir.toString)
        .select(col("bucket").cast("int")).distinct()
        .collect().map(_.getInt(0)).sorted
      assert(buckets.length >= 3, s"need ≥3 buckets: ${buckets.toSeq}")
      val probeBuckets = buckets.take(2)
      val pruned = spark.read.parquet(dir.toString)
        .filter(col("bucket").isin(probeBuckets.map(Int.box): _*))
      val plan = pruned.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("bucket"), plan)
      assert(pruned.select(col("bucket").cast("int")).distinct()
        .collect().map(_.getInt(0)).toSet === probeBuckets.toSet)
    } finally graft.streaming.StagedEvents.deleteRecursively(dir)
  }

  test("streamed compacted probe lands on the batch IVF-PQ top-5 exactly") {
    val batch = SparkEntry.queries("sim_ivfpq_topk")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val streamed = graft.streaming.CompactedProbe.ivfpqTop5(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(streamed === batch)
  }
}
