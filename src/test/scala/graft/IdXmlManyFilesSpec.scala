package graft

import org.apache.spark.sql.functions._

import graft.ops.PsmConvert
import graft.sources.idxml.IdXmlSynth

/** The idXML twin of MzmlManyFilesSpec, over the synthesized oracle corpus:
  * one DSv2 scan whose input partitions are the files themselves (per-file
  * parallelism, no driver loop), and the assembled PSM table matching the
  * generator's closed form row-for-row — the same arithmetic the
  * `s2b_idxml_many_runs` DuckDB VALUES oracle replays.
  */
class IdXmlManyFilesSpec extends SparkSpec {

  private val (n, peps, hits) = (6, 5, 2)

  test("N runs = one scan with N file partitions, each holding one file's rows") {
    val paths = IdXmlSynth.stagedRuns(n, peps, hits)
    val pepIds = PsmConvert.readIdXml(spark, paths)

    val plan = pepIds.queryExecution.executedPlan.toString
    assert("BatchScan".r.findAllMatchIn(plan).length == 1, plan)

    val rdd = pepIds.select(col("file_name")).rdd
    assert(rdd.getNumPartitions == n, s"expected $n partitions, got ${rdd.getNumPartitions}")

    val filesPerPartition = rdd
      .mapPartitions(it => Iterator.single(it.map(_.getString(0)).toSet))
      .collect()
    assert(filesPerPartition.forall(_.size == 1), filesPerPartition.mkString(", "))
    assert(filesPerPartition.flatten.toSet.size == n, filesPerPartition.mkString(", "))
  }

  test("assembled PSM rows match the generator's closed form exactly") {
    val paths = IdXmlSynth.stagedRuns(n, peps, hits)
    val got = PsmConvert.convert(
        PsmConvert.readIdXml(spark, paths), None, exportDecoyPsm = true)
      .select(
        col("file_name"), col("scan_number"), col("sequence"), col("peptidoform"),
        col("charge"), col("retention_time"), col("exp_mass_to_charge"),
        col("is_decoy"), col("global_qvalue"), col("consensus_support"),
        col("reference_file_name"),
        array_join(col("search_engines"), "|").as("engines"),
        array_join(col("id_scores"), "|").as("scores"),
        array_join(col("protein_accessions"), "|").as("proteins"))
      .collect()
      .map(r => IdXmlSynth.ExpectedPsm(
        r.getString(0), r.getInt(1), r.getString(2), r.getString(3),
        r.getInt(4), r.getDouble(5), r.getDouble(6), r.getInt(7),
        if (r.isNullAt(8)) None else Some(r.getDouble(8)),
        if (r.isNullAt(9)) None else Some(r.getDouble(9)),
        r.getString(10), r.getString(11), r.getString(12), r.getString(13)))
      .toSeq

    val want = IdXmlSynth.expectedPsms(n, peps, hits)
    assert(got.size == want.size, s"${got.size} vs ${want.size}")
    val key = (p: IdXmlSynth.ExpectedPsm) =>
      (p.file_name, p.scan_number, p.peptidoform, p.charge, p.is_decoy)
    assert(got.sortBy(key) == want.sortBy(key),
      got.sortBy(key).zip(want.sortBy(key)).filter(t => t._1 != t._2).take(3).mkString("\n"))
  }
}
