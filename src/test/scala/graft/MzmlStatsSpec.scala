package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.model.Schemas
import graft.ops.MzmlStats

/** mzML DSv2 source + mzmlstats semantics against synthesized files with
  * exactly-known arrays (FIXTURES.md §2.2; reference assertions
  * tests/test_commands.py:219-234).
  */
class MzmlStatsSpec extends SparkSpec {

  private lazy val dir = Files.createTempDirectory("mzml-fix")
  private lazy val file = MzmlFixtures.standard(dir).toString
  private lazy val spectra = MzmlStats.readSpectra(spark, Seq(file)).cache()

  test("source parses all spectra with decoded peak arrays") {
    assert(spectra.count() === 6)
    val s1 = spectra.filter(col("spectrum_index") === 0).head()
    assert(s1.getAs[Seq[Double]]("mz_array") === Seq(499.3, 500.0, 500.5, 501.0))
    assert(s1.getAs[Seq[Double]]("intensity_array") === Seq(50.0, 100.0, 30.0, 20.0))
    assert(s1.getAs[String]("native_id") === "controllerType=0 controllerNumber=1 scan=1")
    assert(s1.getAs[String]("acquisition_datetime") === "2024-03-01T10:15:30Z")
  }

  test("32-bit uncompressed arrays and minute RT decode correctly") {
    val s6 = spectra.filter(col("spectrum_index") === 5).head()
    assert(s6.getAs[Seq[Double]]("mz_array") === Seq(301.0))
    assert(s6.getAs[Double]("rt") === 900.0) // 15 min → seconds
  }

  test("msLevels option pushes the level filter into the parse") {
    val ms1Only = MzmlStats.readSpectra(spark, Seq(file), msLevels = Some(Seq(1)))
    assert(ms1Only.count() === 2)
    // and a plan-level filter prunes the same way via pushdown
    val pushed = spectra.filter(col("ms_level") === 1)
    assert(pushed.count() === 2)
  }

  test("ms_info: schema, level filter, null handling, as-of + purity") {
    val info = MzmlStats.msInfo(spectra).cache()
    assert(info.drop("file_name").columns === Schemas.msInfo.fieldNames)
    // MS3 row dropped
    assert(info.count() === 5)
    assert(info.filter(col("ms_level") === 3).count() === 0)

    // MS1 row: no precursor columns, base/summed computed
    val ms1 = info.filter(col("scan") === "1").head()
    assert(ms1.getAs[Double]("base_peak_intensity") === 100.0)
    assert(ms1.getAs[Double]("summed_peak_intensities") === 200.0)
    assert(ms1.isNullAt(ms1.fieldIndex("precursor_charge")))

    // empty-peaks MS1: nulls, zero count
    val empty = info.filter(col("scan") === "5").head()
    assert(empty.getAs[Int]("num_peaks") === 0)
    assert(empty.isNullAt(empty.fieldIndex("base_peak_intensity")))
    assert(empty.isNullAt(empty.fieldIndex("summed_peak_intensities")))

    // MS2 with unannotated intensity: purity fallback against parent scan 1.
    // Window [499,501], z=2 → step 0.5017; isotope-matching peaks 500.0
    // (100), 500.5 (30), 501.0 (20) → target 150; 499.3 matches no isotope
    // position → total = all 4 peaks = 200.
    val ms2 = info.filter(col("scan") === "2").head()
    assert(ms2.getAs[Int]("precursor_charge") === 2)
    assert(ms2.getAs[Double]("precursor_mz") === 500.0)
    assert(ms2.getAs[Double]("precursor_rt") === 10.0)
    assert(ms2.getAs[Double]("precursor_intensity") === 150.0)
    assert(ms2.getAs[Double]("precursor_total_intensity") === 200.0)

    // MS2 with annotated intensity keeps it
    val ms3r = info.filter(col("scan") === "3").head()
    assert(ms3r.getAs[Double]("precursor_intensity") === 777.0)

    // charge 0 → null charge (scan 6)
    val s6 = info.filter(col("scan") === "6").head()
    assert(s6.isNullAt(s6.fieldIndex("precursor_charge")))
  }

  test("ms2_info: only MS2-with-precursor rows, full arrays") {
    val ms2 = MzmlStats.ms2Info(spectra)
    assert(ms2.drop("file_name").columns === Schemas.ms2Info.fieldNames)
    assert(ms2.count() === 3)
    val r = ms2.filter(col("scan") === "2").head()
    assert(r.getAs[Seq[Double]]("mz_array") === Seq(101.0, 102.0, 103.0))
  }

  test("run(): writes single-file gzip parquet outputs with reference naming") {
    val out = Files.createTempDirectory("mzml-out")
    val written = MzmlStats.run(spark, file, ms2File = true, outDir = Some(out.toString))
    assert(written.map(p => new java.io.File(p).getName).toSet ===
      Set("sample_ms_info.parquet", "sample_ms2_info.parquet"))
    val info = spark.read.parquet(written.head)
    assert(info.columns === Schemas.msInfo.fieldNames)
    assert(info.count() === 5)
  }

  test("runMany(): file_name-partitioned dataset across runs") {
    val f2 = MzmlFixtures.standard(dir, "runmany_b.mzML").toString
    val out = Files.createTempDirectory("mzml-many")
    val written = MzmlStats.runMany(spark, Seq(file, f2), out.toString, ms2File = true)
    assert(written.length === 2)
    val info = spark.read.parquet(written.head)
    assert(info.select("file_name").distinct().count() === 2)
    assert(info.count() === 10) // 5 ms_info rows per run
    // partition pruning: one run's directory readable in isolation
    val one = spark.read.parquet(s"${written.head}/file_name=runmany_b.mzML")
    assert(one.count() === 5)
  }

  test("multi-file read parallelizes per file and keeps file_name") {
    val f2 = MzmlFixtures.standard(dir, "second.mzML").toString
    val both = MzmlStats.readSpectra(spark, Seq(file, f2))
    assert(both.select("file_name").distinct().count() === 2)
    assert(both.rdd.getNumPartitions === 2)
    // as-of lookup stays within each file
    val info = MzmlStats.msInfo(both)
    val rts = info.filter(col("scan") === "2")
      .select("precursor_rt").collect().map(_.getDouble(0)).toSeq
    assert(rts === Seq(10.0, 10.0))
  }
}
