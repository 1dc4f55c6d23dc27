package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Peptides
import graft.model.Schemas

/** `psmconvert`: idXML → PSM parquet, optionally joined against the
  * ms2_info peak table (reference: psm_conversion.py).
  *
  * Plan: idxml DSv2 scan → explode(hits) (the built-in Generator stands in
  * for the reference's per-hit loop) → when-chain score dispatch → left join
  * on string-typed scan. The ms2 side is grouped per scan first, so the join
  * is m:1 and the nested array-of-arrays cells of the reference's pandas
  * `.values` assignment come out identically.
  */
object PsmConvert {

  def readIdXml(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.format("graft.sources.idxml.IdXmlDataSource").load(paths: _*)

  /** Assemble the 21-column PSM table (Schemas.psm).
    *
    * @param ms2 optional ms2_info table (scan string/castable, mz_array,
    *            intensity_array)
    * @param exportDecoyPsm keep decoy hits (psm_conversion.py:141)
    */
  def convert(pepIds: DataFrame, ms2: Option[DataFrame],
              exportDecoyPsm: Boolean = false): DataFrame = {
    // scan from spectrum_reference; no-match rows are skipped with a warning
    // in the reference (psm_conversion.py:123-128) — here: filtered
    val withScan = pepIds
      .withColumn("scan_number",
        nullif(regexp_extract(col("spectrum_reference"), "(?:spectrum|scan)=(\\d+)", 1), lit(""))
          .cast("int"))
      .filter(col("scan_number").isNotNull)

    val exploded = withScan.select(
      col("*"), explode(col("hits")).as("hit"))

    val isDecoy = when(col("hit.target_decoy") === "target", 0).otherwise(1)
    val multiEngine = size(col("search_engines")) > 1

    // global q-value: peptide-id score when its type is a q-value in the
    // consensus case; always overridden by hit-level metas when present
    // (psm_conversion.py:143-158)
    val consensusQ = when(multiEngine && col("score_type").contains("q-value"), col("hit.score"))
    val globalQ = coalesce(col("hit.ms_qvalue"), col("hit.meta_qvalue"), consensusQ)

    // single-engine per-hit score label (psm_conversion.py:148-153); the
    // reference renders the score with Python str() — repr'd via format to
    // match typical float text
    val scoreStr = col("hit.score").cast("string")
    val idScores = when(multiEngine, array().cast("array<string>"))
      .when(element_at(col("search_engines"), 1) === "Comet",
        array(concat(lit("Comet:Expectation value: "), scoreStr)))
      .when(element_at(col("search_engines"), 1) === "MS-GF+",
        array(concat(lit("MS-GF:SpecEValue: "), scoreStr)))
      .when(element_at(col("search_engines"), 1) === "Sage",
        array(concat(lit("Sage:hyperscore: "), scoreStr)))
      .otherwise(array().cast("array<string>"))

    val consensusSupport = when(multiEngine, col("hit.consensus_support"))

    val filtered =
      if (exportDecoyPsm) exploded
      else exploded.filter(isDecoy === 0)

    val base = filtered.select(
      Peptides.unmodifiedSequence(col("hit.sequence")).as("sequence"),
      col("hit.protein_accessions").as("protein_accessions"),
      col("hit.protein_starts").as("protein_start_positions"),
      col("hit.protein_ends").as("protein_end_positions"),
      Peptides.modsPosition(col("hit.sequence")).as("modifications"),
      col("rt").as("retention_time"),
      col("hit.charge").as("charge"),
      col("mz").as("exp_mass_to_charge"),
      col("reference_file_name"),
      col("scan_number"),
      col("hit.sequence").as("peptidoform"),
      col("hit.posterior_error_probability").as("posterior_error_probability"),
      globalQ.as("global_qvalue"),
      isDecoy.as("is_decoy"),
      consensusSupport.as("consensus_support"),
      col("search_engines"),
      idScores.as("id_scores"),
      // hit rank: idXML carries no rank attribute; OpenMS loads hits with
      // rank 0, which the reference emits verbatim (psm_conversion.py:168)
      lit(0).as("hit_rank"),
      col("file_name"))

    ms2 match {
      case None =>
        base
          .withColumn("mz_array", lit(null).cast("array<array<double>>"))
          .withColumn("intensity_array", lit(null).cast("array<array<double>>"))
          .withColumn("num_peaks", lit(null).cast("int"))
      case Some(spectra) =>
        // per-scan grouping reproduces the reference's `.values` semantics:
        // each PSM cell holds the list of matching spectra's arrays and
        // num_peaks counts matched ROWS (a reference quirk kept on purpose,
        // psm_conversion.py:131-136)
        val grouped = spectra
          .groupBy(col("scan").cast("string").as("scan_str"))
          .agg(
            collect_list(col("mz_array")).as("mz_array"),
            collect_list(col("intensity_array")).as("intensity_array"),
            count(lit(1)).cast("int").as("num_peaks"))
        // no broadcast hint: ms2_info is the big side at scale (full peak
        // vectors) — let Catalyst/AQE pick; at fixture scale it broadcasts
        // anyway, at 100 TB it sort-merge-joins on scan
        base.join(grouped,
          base("scan_number").cast("string") === grouped("scan_str"), "left")
          .drop("scan_str")
    }
  }

  /** CLI-shaped entry: write `{stem}_psm.parquet` (gzip, single file). */
  def run(spark: SparkSession, idxmlPath: String, ms2Path: Option[String],
          exportDecoyPsm: Boolean = false, outputFile: Option[String] = None): String = {
    val pepIds = readIdXml(spark, Seq(idxmlPath))
    val ms2 = ms2Path.map(p => spark.read.parquet(p))
    val out = convert(pepIds, ms2, exportDecoyPsm)
    val stem = new java.io.File(idxmlPath).getName.replaceAll("\\.[^.]*$", "")
    val target = outputFile.getOrElse(
      s"${new java.io.File(idxmlPath).getAbsoluteFile.getParent}/${stem}_psm.parquet")
    MzmlStats.writeSingleParquet(out.drop("file_name"), target, Schemas.psm)
    target
  }
}
