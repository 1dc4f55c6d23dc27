package graft.ops

import org.apache.spark.sql.SparkSession
import org.slf4j.LoggerFactory

/** `checksamplesheet --minimal`: SDRF column validation
  * (reference: check_samplesheet.py:14-99).
  *
  * Full-template ontology validation (sdrf-pipelines + OLS cache) is out of
  * scope per SURVEY §5/N5 — minimal mode covers the columns quantms actually
  * needs; the CLI turns a non-empty error list into a nonzero exit code.
  */
object SdrfValidator {

  private val log = LoggerFactory.getLogger(getClass)

  val requiredColumns: Seq[String] = Seq(
    "source name",
    "assay name",
    "comment[data file]",
    "comment[label]",
    "comment[cleavage agent details]",
    "comment[instrument]",
    "comment[proteomics data acquisition method]",
    "technology type")

  val recommendedColumns: Seq[String] = Seq(
    "comment[precursor mass tolerance]",
    "comment[fragment mass tolerance]",
    "comment[dissociation method]",
    "comment[technical replicate]",
    "comment[fraction identifier]")

  /** Minimal-mode validation; returns the error strings (empty = valid). */
  def validateMinimal(spark: SparkSession, sdrfPath: String): Seq[String] = {
    val df = spark.read.option("sep", "\t").option("header", true).csv(sdrfPath)
    val columnsLower = df.columns.map(_.toLowerCase).toSeq

    if (df.limit(1).count() == 0)
      return Seq("ERROR: SDRF file contains a header but no data rows.")

    val missingRequired = requiredColumns.filterNot(columnsLower.contains).map(c =>
      s"ERROR: Required column '$c' is missing from the SDRF file.")

    val modError =
      if (columnsLower.exists(_.startsWith("comment[modification parameters"))) Nil
      else Seq("ERROR: At least one 'comment[modification parameters]' column is required.")

    recommendedColumns.filterNot(columnsLower.contains).foreach(c =>
      log.warn(s"Recommended column '$c' is missing. Pipeline will use default parameters."))

    missingRequired ++ modError
  }
}
