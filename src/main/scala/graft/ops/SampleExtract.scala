package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.{DesignReader, SingleFileSink}

/** `openms2sample`: (file → sample/mixture) table from an OpenMS design file
  * (reference: extract_sample.py:17-59).
  *
  * The file table keeps rows with no nulls; with an `MSstats_Mixture` sample
  * column, files are deduplicated on Spectra_Filepath and Sample is replaced
  * by the mixture id (inner-join lookup; a file-table Sample missing from the
  * sample table is an error).
  */
object SampleExtract {

  def extract(spark: SparkSession, designPath: String): DataFrame = {
    val design = DesignReader.readLegacy(spark, designPath)
    // pandas `dropna()` on the whole-file read: the legacy reader already
    // splits tables, so no-null here means every file-table cell present
    val fTable = design.files.na.drop("any")

    if (!design.samples.columns.contains("MSstats_Mixture")) {
      fTable.select("Spectra_Filepath", "Sample")
    } else {
      val files = fTable.dropDuplicates("Spectra_Filepath")
      val lookup = design.samples.select(
        col("Sample"), col("MSstats_Mixture"))
      val missing = files.join(lookup, Seq("Sample"), "left_anti")
        .select("Sample").distinct().collect().map(_.getString(0))
      if (missing.nonEmpty)
        throw new IllegalArgumentException(
          s"Sample '${missing.head}' in the fraction table has no matching entry " +
            "in the sample table.")
      files.join(broadcast(lookup), Seq("Sample"))
        .select(col("Spectra_Filepath"), col("MSstats_Mixture").as("Sample"))
    }
  }

  /** CLI-shaped entry: write `{design-stem}_sample.csv` (tab-separated). */
  def run(spark: SparkSession, designPath: String, outDir: String = "."): String = {
    val stem = new java.io.File(designPath).getName.replaceAll("\\.[^.]*$", "")
    val target = s"$outDir/${stem}_sample.csv"
    SingleFileSink.csv(extract(spark, designPath), target, sep = "\t")
    target
  }
}
