package graft.model

import org.apache.spark.sql.types._

/** Output-table schemas of the engine, fixed in code exactly like the
  * reference declares them via pyarrow / ordered column lists.
  *
  * ms_info / ms2_info: reference/quantmsutils/mzml/mzml_statistics.py:36-65.
  * ms1_features: reference/quantmsutils/mzml/ms1_feature_finder.py:182-205.
  * psm: reference/quantmsutils/psm/psm_conversion.py:13-35.
  * msstats_in: reference/quantmsutils/diann/diann2msstats.py:53-59,84-95.
  */
object Schemas {

  /** One row per spectrum (MS1 + MS2). */
  val msInfo: StructType = StructType(Seq(
    StructField("scan", StringType),
    StructField("ms_level", IntegerType),
    StructField("num_peaks", IntegerType),
    StructField("base_peak_intensity", DoubleType),
    StructField("summed_peak_intensities", DoubleType),
    StructField("rt", DoubleType),
    StructField("precursor_charge", IntegerType),
    StructField("precursor_mz", DoubleType),
    StructField("precursor_rt", DoubleType),
    StructField("precursor_intensity", DoubleType),
    StructField("precursor_total_intensity", DoubleType),
    StructField("acquisition_datetime", StringType),
  ))

  /** One row per MS2 spectrum with full peak vectors. */
  val ms2Info: StructType = StructType(Seq(
    StructField("scan", StringType),
    StructField("ms_level", IntegerType),
    StructField("mz_array", ArrayType(DoubleType, containsNull = false)),
    StructField("intensity_array", ArrayType(DoubleType, containsNull = false)),
  ))

  /** One row per detected MS1 feature, intensity-descending on write. */
  val ms1Features: StructType = StructType(Seq(
    StructField("feature_mz", DoubleType),
    StructField("feature_intensity", DoubleType),
    StructField("feature_rt", DoubleType),
    StructField("feature_charge", IntegerType),
    StructField("feature_percentile_tic", DoubleType),
    StructField("feature_quality", DoubleType),
    StructField("feature_id", LongType),
    StructField("feature_min_rt", DoubleType),
    StructField("feature_min_mz", DoubleType),
    StructField("feature_max_rt", DoubleType),
    StructField("feature_max_mz", DoubleType),
    StructField("feature_num_scans", IntegerType),
    StructField("feature_scans", ArrayType(StringType, containsNull = false)),
  ))

  /** One row per (peptide identification × hit), 21 columns in the
    * `_parquet_field` order of psm_conversion.py:13-35.
    */
  val psm: StructType = StructType(Seq(
    StructField("sequence", StringType),
    StructField("protein_accessions", ArrayType(StringType)),
    StructField("protein_start_positions", ArrayType(IntegerType)),
    StructField("protein_end_positions", ArrayType(IntegerType)),
    StructField("modifications", ArrayType(StringType)),
    StructField("retention_time", DoubleType),
    StructField("charge", IntegerType),
    StructField("exp_mass_to_charge", DoubleType),
    StructField("reference_file_name", StringType),
    StructField("scan_number", IntegerType),
    StructField("peptidoform", StringType),
    StructField("posterior_error_probability", DoubleType),
    StructField("global_qvalue", DoubleType),
    StructField("is_decoy", IntegerType),
    StructField("consensus_support", DoubleType),
    StructField("mz_array", ArrayType(ArrayType(DoubleType, containsNull = false))),
    StructField("intensity_array", ArrayType(ArrayType(DoubleType, containsNull = false))),
    StructField("num_peaks", IntegerType),
    StructField("search_engines", ArrayType(StringType)),
    StructField("id_scores", ArrayType(StringType)),
    StructField("hit_rank", IntegerType),
  ))

  /** MSstats input CSV (IsotopeLabelType position varies with multiplexing —
    * this is the non-multiplexed order).
    */
  val msstatsIn: StructType = StructType(Seq(
    StructField("ProteinName", StringType),
    StructField("PeptideSequence", StringType),
    StructField("PrecursorCharge", IntegerType),
    StructField("Intensity", DoubleType),
    StructField("Run", StringType),
    StructField("IsotopeLabelType", StringType),
    StructField("FragmentIon", StringType),
    StructField("ProductCharge", StringType),
    StructField("Fraction", StringType),
    StructField("BioReplicate", StringType),
    StructField("Condition", StringType),
  ))
}
