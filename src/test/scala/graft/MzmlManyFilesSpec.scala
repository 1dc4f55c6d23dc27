package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.MzmlStats

/** SURVEY §0 "many files per job": one mzmlstats invocation over N runs must
  * parallelize per file — ONE DSv2 scan whose input partitions are the files
  * themselves (a run is a single XML document, so the file is the natural
  * split unit), never a serial per-file driver loop. On a cluster this is
  * what lets 1000 runs land on 1000 cores.
  */
class MzmlManyFilesSpec extends SparkSpec {

  private val N = 6

  private def makeRuns(): Seq[String] = {
    val dir = Files.createTempDirectory("manyruns")
    (1 to N).map { i =>
      MzmlFixtures.standard(dir, s"run$i.mzML").toString
    }
  }

  test("N runs = one scan with N file partitions, each holding one file's rows") {
    val paths = makeRuns()
    val spectra = MzmlStats.readSpectra(spark, paths)

    // one DSv2 scan in the plan — a single declarative job, not N jobs
    val plan = spectra.queryExecution.executedPlan.toString
    assert(countSubstr(plan, "BatchScan") == 1, plan)

    // the scan splits into exactly one partition per file...
    val rdd = spectra.select(col("file_name")).rdd
    assert(rdd.getNumPartitions == N, s"expected $N partitions, got ${rdd.getNumPartitions}")

    // ...and no partition mixes files (per-file reader isolation), while
    // every file is present (nothing silently dropped)
    val filesPerPartition = rdd
      .mapPartitions(it => Iterator.single(it.map(_.getString(0)).toSet))
      .collect()
    assert(filesPerPartition.forall(_.size == 1), filesPerPartition.mkString(", "))
    assert(filesPerPartition.flatten.toSet.size == N, filesPerPartition.mkString(", "))
  }

  test("runMany writes a file_name-partitioned dataset with one directory per run") {
    val paths = makeRuns()
    val out = Files.createTempDirectory("manyout").toString
    val Seq(infoPath) = MzmlStats.runMany(spark, paths, out)

    val dirs = new java.io.File(infoPath).listFiles()
      .filter(_.getName.startsWith("file_name=")).map(_.getName).toSet
    assert(dirs.size == N, dirs.mkString(", "))

    // per-run access is partition-pruned: a file_name filter reads ONE dir
    val one = spark.read.parquet(infoPath)
      .filter(col("file_name") === "run3.mzML")
    val p = one.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(file_name"), p)
    assert(one.count() > 0)
  }

  private def countSubstr(hay: String, needle: String): Int =
    needle.r.findAllMatchIn(hay).length
}
