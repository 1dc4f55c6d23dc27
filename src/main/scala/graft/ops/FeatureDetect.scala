package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.kernels.{FeatureFinder, SpecPeaks}
import graft.model.Schemas

/** `mzmlstats --feature_detection`: MS1 feature table
  * (reference: ms1_feature_finder.py).
  *
  * Plan: mzml scan (ms_level=1 pushed into the parser) → m/z sanity filter →
  * per-file `flatMapGroups` running the pure feature-finder kernel (N1/N2 —
  * data-parallel ACROSS runs, exactly SURVEY §3.3's prescription) → pTIC
  * exclusive-prefix-sum window (A5) → as-of interpolation (J8) and RT-range
  * scan attachment (J7) as DataFrame ops → global intensity-descending sort
  * (O1).
  */
object FeatureDetect {

  /** MS1 scans with TIC and exclusive pTIC (ms1_feature_finder.py:75-102):
    * columns file_name, spectrum_index, scan, rt, tic, ptic.
    */
  def pticTable(ms1: DataFrame): DataFrame = {
    val tic = graft.expressions.VectorExpressions.sum(col("intensity_array"))
    val wFile = Window.partitionBy(col("file_name"))
    val wPrefix = Window.partitionBy(col("file_name")).orderBy(col("spectrum_index"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ms1
      .select(
        col("file_name"), col("spectrum_index"),
        MzmlStats.scanId(col("native_id")).as("scan"),
        col("rt"), tic.as("tic"))
      .withColumn("total_tic", sum(col("tic")).over(wFile))
      .withColumn("ptic",
        coalesce(sum(col("tic")).over(wPrefix), lit(0.0)) / col("total_tic"))
      .drop("total_tic")
  }

  /** Full feature table (Schemas.ms1Features + file_name), sorted by
    * intensity descending.
    */
  def features(spark: SparkSession, ms1: DataFrame): DataFrame = {
    import spark.implicits._

    // m/z sanity filter: drop spectra whose min m/z <= 1.0 (zero-m/z
    // artifacts, ms1_feature_finder.py:260-265); empty spectra too (their
    // min is undefined and they contribute nothing)
    val sane = ms1.filter(
      size(col("mz_array")) > 0 && array_min(col("mz_array")) > 1.0)

    val raw = sane
      .select(col("file_name"), col("spectrum_index"),
        MzmlStats.scanId(col("native_id")).as("scan"),
        col("rt"), col("mz_array"), col("intensity_array"))
      .as[(String, Int, String, Double, Array[Double], Array[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (file, it) =>
        val spectra = it.map(r => SpecPeaks(r._2, r._4, r._3, r._5, r._6)).toSeq
        FeatureFinder.detect(spectra).map(f => (file, f))
      }
      .map { case (file, f) =>
        (file, math.round(f.mz * 10000) / 10000.0, f.intensity,
          math.round(f.rt * 10000) / 10000.0, f.charge, f.quality,
          f.minRt, f.minMz, f.maxRt, f.maxMz)
      }
      .toDF("file_name", "feature_mz", "feature_intensity", "feature_rt",
        "feature_charge", "feature_quality", "feature_min_rt", "feature_min_mz",
        "feature_max_rt", "feature_max_mz")
      // deterministic 64-bit id standing in for OpenMS's random unique id
      .withColumn("feature_id",
        abs(xxhash64(col("file_name"), col("feature_mz"), col("feature_rt"),
          col("feature_charge"))))
      // cached: probes, the scan range join, and the final join all consume
      // this — without it the per-file feature kernel (the dominant cost)
      // re-reads the mzML and re-runs THREE times
      .cache()

    // pTIC over the SAME filtered spectrum set the kernel sees
    // (ms1_feature_finder.py:259-272 filters before _get_ptic_data)
    val ptic = pticTable(sane).cache()

    // J8: as-of interpolation of the feature RT into the per-file (rt, ptic)
    // curve — merged-stream windows, clamped at both ends
    // (ms1_feature_finder.py:104-142)
    val curve = ptic.select(
      col("file_name"), col("rt").as("t"), col("ptic").as("v"),
      lit(0).as("is_probe"), lit(null).cast("long").as("probe_id"))
    val probes = raw.select(
      col("file_name"), col("feature_rt").as("t"), lit(null).cast("double").as("v"),
      lit(1).as("is_probe"), col("feature_id").as("probe_id"))
    val wFwd = Window.partitionBy(col("file_name")).orderBy(col("t"), col("is_probe"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wBwd = Window.partitionBy(col("file_name")).orderBy(col("t").desc, col("is_probe").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val interp = curve.unionByName(probes)
      .withColumn("prev_v", last(col("v"), ignoreNulls = true).over(wFwd))
      .withColumn("prev_t",
        last(when(col("is_probe") === 0, col("t")), ignoreNulls = true).over(wFwd))
      .withColumn("next_v", last(col("v"), ignoreNulls = true).over(wBwd))
      .withColumn("next_t",
        last(when(col("is_probe") === 0, col("t")), ignoreNulls = true).over(wBwd))
      .filter(col("is_probe") === 1)
      .select(
        col("file_name").as("p_file"), col("probe_id"),
        round(
          when(col("prev_t").isNull, coalesce(col("next_v"), lit(0.0)))
            .when(col("next_t").isNull, col("prev_v"))
            .when(col("next_t") === col("prev_t"), col("prev_v"))
            .otherwise(col("prev_v") +
              (col("next_v") - col("prev_v")) * (col("t") - col("prev_t")) /
                (col("next_t") - col("prev_t"))), 4)
          .as("feature_percentile_tic"))

    // J7: scans whose RT falls inside the feature's RT bounding box,
    // in scan order (ms1_feature_finder.py:307-322)
    val scansInRange = raw.alias("f")
      .join(ptic.alias("s"),
        col("f.file_name") === col("s.file_name") &&
          col("s.rt").between(col("f.feature_min_rt"), col("f.feature_max_rt")))
      .groupBy(col("f.file_name").as("file_name"), col("f.feature_id").as("feature_id"))
      .agg(
        expr("transform(array_sort(collect_list(struct(s.spectrum_index, s.scan))), x -> x.scan)")
          .as("feature_scans"),
        count(lit(1)).cast("int").as("feature_num_scans"))

    raw
      .join(interp, col("file_name") === col("p_file") &&
        col("feature_id") === col("probe_id"))
      .drop("p_file", "probe_id")
      .join(scansInRange, Seq("file_name", "feature_id"), "left")
      .withColumn("feature_scans",
        coalesce(col("feature_scans"), array().cast("array<string>")))
      .withColumn("feature_num_scans", coalesce(col("feature_num_scans"), lit(0)))
      .select((Schemas.ms1Features.fieldNames.toIndexedSeq.map(col(_)) :+ col("file_name")): _*)
      .orderBy(col("feature_intensity").desc)
  }

  /** CLI-shaped entry: `{stem}_ms1_feature_info.parquet` (gzip, 1 file). */
  def run(spark: SparkSession, msPath: String, outDir: Option[String] = None): String = {
    val ms1 = MzmlStats.readSpectra(spark, Seq(msPath), msLevels = Some(Seq(1)))
    val stem = new java.io.File(msPath).getName.replaceAll("\\.[^.]*$", "")
    val dir = outDir.getOrElse(new java.io.File(msPath).getAbsoluteFile.getParent)
    val target = s"$dir/${stem}_ms1_feature_info.parquet"
    MzmlStats.writeSingleParquet(
      features(spark, ms1).drop("file_name"), target, Schemas.ms1Features)
    target
  }
}
