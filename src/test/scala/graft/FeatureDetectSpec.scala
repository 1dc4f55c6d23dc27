package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.kernels.{FeatureFinder, SpecPeaks}
import graft.model.Schemas
import graft.ops.{FeatureDetect, MzmlStats}

/** Feature detection: kernel unit behavior + invariant-based pipeline tests
  * (SURVEY §7.4: bounding box contains apex; num_scans = |range-join
  * result|; schema parity — exact OpenMS values are NOT the bar).
  */
class FeatureDetectSpec extends SparkSpec {

  /** 12 MS1 scans: one z=2 peptide envelope (mono 500.0, +3 isotopes) with a
    * gaussian elution profile over scans 2-9, plus a far-away lone noise
    * peak per scan (no isotope partner → no feature), plus a zero-m/z
    * artifact spectrum (dropped by the sanity filter).
    */
  private def envelopeSpecs: Seq[MzmlFixtures.Spec] = {
    val iso = FeatureFinder.IsoDiff / 2.0
    val scans = (0 until 12).map { i =>
      val elution = math.exp(-math.pow(i - 5.5, 2) / 4.0) * 1e6
      val (mzs, ints) =
        if (i >= 2 && i <= 9)
          (Array(500.0, 500.0 + iso, 500.0 + 2 * iso, 500.0 + 3 * iso, 900.123),
            Array(elution, elution * 0.8, elution * 0.4, elution * 0.15, 42.0))
        else (Array(900.123), Array(42.0))
      MzmlFixtures.Spec(i + 1, 1, 10.0 + i * 5.0, mzs, ints)
    }
    scans :+ MzmlFixtures.Spec(99, 1, 100.0, Array(0.5, 200.0), Array(1.0, 1.0))
  }

  private lazy val file = {
    val dir = Files.createTempDirectory("feat-fix")
    MzmlFixtures.write(dir.resolve("feat.mzML"), envelopeSpecs).toString
  }
  private lazy val ms1 = MzmlStats.readSpectra(spark, Seq(file), Some(Seq(1))).cache()

  test("kernel: isotope envelope becomes one charge-2 feature; noise does not") {
    val iso = FeatureFinder.IsoDiff / 2.0
    val spectra = (0 until 10).map { i =>
      val inten = 1000.0 + 100 * i
      SpecPeaks(i, 10.0 + i, s"${i + 1}",
        Array(500.0, 500.0 + iso, 500.0 + 2 * iso, 777.7),
        Array(inten, inten * 0.7, inten * 0.3, 5.0))
    }
    val feats = FeatureFinder.detect(spectra)
    assert(feats.length === 1)
    val f = feats.head
    assert(f.charge === 2)
    assert(math.abs(f.mz - 500.0) < 0.01)
    // bounding box contains the apex and the full isotope span
    assert(f.minRt <= f.rt && f.rt <= f.maxRt)
    assert(f.minMz <= 500.0 && f.maxMz >= 500.0 + 2 * iso)
    assert(f.rt === 19.0) // apex = last (most intense) scan
  }

  test("ptic table: exclusive prefix sums normalized by total TIC") {
    val ptic = FeatureDetect.pticTable(ms1)
    val rows = ptic.orderBy("spectrum_index").collect()
    assert(rows.head.getAs[Double]("ptic") === 0.0)
    val last = rows.last
    assert(last.getAs[Double]("ptic") < 1.0)
    // monotone non-decreasing
    val vals = rows.map(_.getAs[Double]("ptic")).toSeq
    assert(vals === vals.sorted)
  }

  test("pipeline: schema, invariants, scan attachment, intensity ordering") {
    val out = FeatureDetect.features(spark, ms1).cache()
    assert(out.drop("file_name").columns === Schemas.ms1Features.fieldNames)
    assert(out.count() >= 1)

    val f = out.head()
    assert(f.getAs[Int]("feature_charge") === 2)
    assert(math.abs(f.getAs[Double]("feature_mz") - 500.0) < 0.01)
    val ptic = f.getAs[Double]("feature_percentile_tic")
    assert(ptic >= 0.0 && ptic <= 1.0)

    // num_scans equals the scans whose RT is inside the box (J7 invariant),
    // over the sanity-filtered spectrum set
    val minRt = f.getAs[Double]("feature_min_rt")
    val maxRt = f.getAs[Double]("feature_max_rt")
    val sane = ms1.filter(size(col("mz_array")) > 0 && array_min(col("mz_array")) > 1.0)
    val expected = FeatureDetect.pticTable(sane)
      .filter(col("rt").between(minRt, maxRt)).count()
    assert(f.getAs[Int]("feature_num_scans").toLong === expected)
    val scans = f.getAs[scala.collection.Seq[String]]("feature_scans")
    assert(scans.length.toLong === expected)
    // sanity-filtered artifact spectrum (scan 99) never appears
    assert(!scans.contains("99"))

    // intensity-descending order
    val ints = out.select("feature_intensity").collect().map(_.getDouble(0)).toSeq
    assert(ints === ints.sortBy(-_))
  }

  test("run(): writes the reference-named single parquet") {
    val outDir = Files.createTempDirectory("feat-out")
    val path = FeatureDetect.run(spark, file, Some(outDir.toString))
    assert(path.endsWith("feat_ms1_feature_info.parquet"))
    val df = spark.read.parquet(path)
    assert(df.columns === Schemas.ms1Features.fieldNames)
    assert(df.count() >= 1)
  }
}
