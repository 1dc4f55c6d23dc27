package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Physical pins for the kNN graph's serving layout (the CompactionSpec
  * discipline applied to the adjacency table): the repartition(blk) +
  * partitionBy(blk) write must produce ONE parquet file per block, and a
  * neighbor read for a probed node set must open only the probed blocks'
  * files — partition pruning, so the rest of the graph is never touched.
  */
class KnnLayoutSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def blkOf(c: org.apache.spark.sql.Column) =
    conv(substring(md5(concat(lit("b1"), c.cast("string"))), 1, 15), 16, 10)
      .cast("long") % 16L

  test("one adjacency file per block; probed-block reads prune partitions") {
    val dir = Files.createTempDirectory("knn-layout-spec")
    try {
      graft.queries.Similarity.knnGraphShared(spark, sf)
        .filter(col("iter") === 4)
        .select(col("vec_id"), col("nbr"), blkOf(col("vec_id")).as("blk"))
        .repartition(col("blk"))
        .write.mode("overwrite").partitionBy("blk").parquet(dir.toString)

      import scala.jdk.CollectionConverters._
      val walk = Files.walk(dir)
      val blkDirs =
        try walk.iterator().asScala
          .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("blk="))
          .toVector
        finally walk.close()
      assert(blkDirs.length >= 3, s"need ≥3 blocks to prove pruning: $blkDirs")
      blkDirs.foreach { bd =>
        val ls = Files.list(bd)
        val parts =
          try ls.iterator().asScala
            .count(_.getFileName.toString.endsWith(".parquet"))
          finally ls.close()
        assert(parts === 1, s"block $bd fragmented into $parts files")
      }

      // a 2-block probe set: the scan must carry the blocks as partition
      // filters and read exactly those blocks' files
      val probeBlocks = blkDirs.map(_.getFileName.toString.stripPrefix("blk=").toInt)
        .sorted.take(2)
      val read = spark.read.parquet(dir.toString)
        .filter(col("blk").isin(probeBlocks.map(Integer.valueOf): _*))
      val plan = read.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("blk"), plan)
      val filesRead = read.queryExecution.executedPlan.collectLeaves()
        .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics.get("numFiles")
        }
      read.collect()
      val n = filesRead.flatten.map(_.value).sum
      assert(n == probeBlocks.length,
        s"probed ${probeBlocks.length} blocks but read $n files")
    } finally graft.streaming.StagedEvents.deleteRecursively(dir)
  }

  test("compacted walk: hop reads open only the beam's blocks and the " +
      "answer equals the shared-frame search") {
    import graft.queries.Similarity
    val dir = Similarity.knnLayoutDir(spark, sf)

    // physical pin on the query's exact hop-read shape: the 10 probes'
    // own blocks (round-1 beam) as the partition filter
    val blocks = spark.range(0, 10).toDF("cand")
      .select(Similarity.knnBlkOf(col("cand")).cast("int").as("blk"))
      .distinct().collect().map(_.getInt(0)).sorted
    assert(blocks.length >= 2, s"probe beam landed in one block: ${blocks.toSeq}")
    val read = spark.read.parquet(dir)
      .filter(col("blk").isin(blocks.map(Integer.valueOf): _*))
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("blk"), plan)
    val filesRead = read.queryExecution.executedPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics.get("numFiles")
      }
    read.collect()
    val n = filesRead.flatten.map(_.value).sum
    assert(n == blocks.length,
      s"beam occupies ${blocks.length} blocks but the hop read $n files")

    // semantic pin: serving from the layout changes NOTHING — visit
    // order, tie rule, scores, and answer set all agree with the
    // shared-frame walk (the pair also share one oracle SQL string)
    val a = Similarity.queries("sim_knn_graph_search")(spark, sf)
    val b = Similarity.queries("sim_knn_graph_search_compacted")(spark, sf)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "compacted walk diverged from the shared-frame search")
  }
}
