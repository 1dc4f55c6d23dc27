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
}
