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

  /** Differential golden for the N1/N2 kernel (reference output contract:
    * ms1_feature_finder.py:189-205): a synthesized run whose isotope
    * envelopes have CLOSED-FORM feature answers — the s1b discipline
    * (closed-form VALUES from the synth arithmetic) extended from source
    * statistics to the feature kernel. Five envelopes cover every charge
    * 1..4 and both quality branches; peak arrays round-trip bit-exactly
    * through the 64-bit zlib mzML encoding, intensities are integers (so
    * every kernel sum is exact), and per-envelope intensity scaling makes
    * the global ordering unique. Every output column is pinned EXACTLY —
    * mz/rt (4dp-rounded), charge, quality, intensity, the full bounding
    * box, num_scans, the scan list, and the interpolated pTIC.
    */
  case class Env(mono: Double, z: Int, nIso: Int, s0: Int, len: Int, scale: Int)
  private val goldenEnvs = Seq(
    Env(300.0, 1, 3, 0, 8, 1),
    Env(360.0, 2, 4, 2, 8, 2),
    Env(420.0, 3, 3, 1, 8, 3),
    Env(480.0, 4, 3, 0, 8, 4),
    Env(540.0, 2, 2, 3, 7, 5)) // chain 2 of 3 -> quality 2/3 branch

  private val goldenScans = 12
  private def goldenRt(i: Int): Double = 10.0 + 5.0 * i
  private def isoMz(e: Env, k: Int): Double = e.mono + k * FeatureFinder.IsoDiff / e.z
  private def isoInt(e: Env, k: Int, i: Int): Double =
    (i - e.s0 + 1).toDouble * e.scale * math.pow(2, 10 - k)

  private def goldenSpecs: Seq[MzmlFixtures.Spec] = {
    val ms1 = (0 until goldenScans).map { i =>
      val peaks = goldenEnvs.flatMap { e =>
        if (i >= e.s0 && i < e.s0 + e.len)
          (0 until e.nIso).map(k => (isoMz(e, k), isoInt(e, k, i)))
        else Nil
      } :+ ((900.123, 32.0)) // lone peak, no isotope partner -> never a feature
      val sorted = peaks.sortBy(_._1)
      MzmlFixtures.Spec(i + 1, 1, goldenRt(i),
        sorted.map(_._1).toArray, sorted.map(_._2).toArray)
    }
    // zero-m/z artifact: the sanity filter must drop it from features AND
    // from the pTIC curve
    ms1 :+ MzmlFixtures.Spec(99, 1, 100.0, Array(0.5, 200.0), Array(7.0, 7.0))
  }

  test("golden: multi-envelope run matches the closed-form feature table exactly") {
    val dir = Files.createTempDirectory("feat-golden")
    val f = MzmlFixtures.write(dir.resolve("golden.mzML"), goldenSpecs).toString
    val out = FeatureDetect.features(
      spark, MzmlStats.readSpectra(spark, Seq(f), Some(Seq(1)))).collect()

    // closed-form per-scan TIC over the sane spectra (integers: exact)
    def tic(i: Int): Double =
      goldenEnvs.map(e =>
        if (i >= e.s0 && i < e.s0 + e.len)
          (0 until e.nIso).map(k => isoInt(e, k, i)).sum
        else 0.0).sum + 32.0
    val total = (0 until goldenScans).map(tic).sum

    assert(out.length === goldenEnvs.length, out.map(_.toString).mkString("\n"))
    // intensity-descending output order is unique by construction
    val expectedOrder = goldenEnvs.sortBy(e =>
      -(0 until e.nIso).map(k => (0 until e.len).map(j => isoInt(e, k, e.s0 + j)).sum).sum)
    out.zip(expectedOrder).foreach { case (row, e) =>
      val apexScan = e.s0 + e.len - 1
      val chainLen = e.nIso // every generated isotope joins the chain
      val clue = s"envelope z=${e.z} mono=${e.mono}: $row"
      assert(row.getAs[Double]("feature_mz") === math.round(e.mono * 10000) / 10000.0, clue)
      assert(row.getAs[Double]("feature_rt") === goldenRt(apexScan), clue)
      assert(row.getAs[Int]("feature_charge") === e.z, clue)
      assert(row.getAs[Double]("feature_quality") ===
        math.min(1.0, chainLen.toDouble / (FeatureFinder.MaxIsotopes / 2.0)), clue)
      val wantIntensity =
        (0 until e.nIso).map(k => (0 until e.len).map(j => isoInt(e, k, e.s0 + j)).sum).sum
      assert(row.getAs[Double]("feature_intensity") === wantIntensity, clue)
      // bounding box: exact point-value selections, no arithmetic
      assert(row.getAs[Double]("feature_min_rt") === goldenRt(e.s0), clue)
      assert(row.getAs[Double]("feature_max_rt") === goldenRt(apexScan), clue)
      assert(row.getAs[Double]("feature_min_mz") === e.mono, clue)
      assert(row.getAs[Double]("feature_max_mz") === isoMz(e, e.nIso - 1), clue)
      // scan attachment: exactly the envelope's elution scans
      assert(row.getAs[Int]("feature_num_scans") === e.len, clue)
      assert(row.getAs[scala.collection.Seq[String]]("feature_scans") ===
        (e.s0 + 1 to apexScan + 1).map(_.toString), clue)
      // pTIC: the apex rt IS a curve point, so interpolation degenerates to
      // the exclusive prefix sum at the apex scan
      val wantPtic = BigDecimal.valueOf(
        (0 until apexScan).map(tic).sum / total)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).doubleValue
      assert(row.getAs[Double]("feature_percentile_tic") === wantPtic, clue)
      assert(row.getAs[Long]("feature_id") >= 0L, clue)
    }
  }
}
