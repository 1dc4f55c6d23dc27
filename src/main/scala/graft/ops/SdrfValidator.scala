package graft.ops

import org.apache.spark.sql.SparkSession
import org.slf4j.LoggerFactory

/** `checksamplesheet`: SDRF validation (reference: check_samplesheet.py).
  *
  * Two modes, mirroring the reference:
  *  - `--minimal` (check_samplesheet.py:14-99): the column subset quantms
  *    actually needs to run.
  *  - template mode (check_samplesheet.py:100-125, delegating to the
  *    public sdrf-pipelines schemas): required-column and empty-cell rules
  *    of the named template. The reference's third layer — OLS ontology
  *    term validation — needs a live ontology service (or its cache) and
  *    is a DOCUMENTED DIVERGENCE: this sandbox has zero egress, so
  *    template mode validates structure, not term accessions.
  *
  * The CLI turns a non-empty error list into a nonzero exit code.
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

  /** Required columns of the public SDRF-for-proteomics templates
    * (bigbio/proteomics-sample-metadata spec; the same sets sdrf-pipelines'
    * schemas enforce). `default` is the base sample-metadata contract;
    * `ms-proteomics` layers the mass-spec columns on it; `dia-acquisition`
    * additionally demands the acquisition-method column.
    */
  private val defaultTemplate: Seq[String] = Seq(
    "source name",
    "characteristics[organism]",
    "characteristics[organism part]",
    "characteristics[disease]",
    "characteristics[cell type]",
    "assay name",
    "comment[fraction identifier]",
    "comment[label]",
    "comment[data file]",
    "comment[instrument]",
    "technology type")

  val templates: Map[String, Seq[String]] = Map(
    "default" -> defaultTemplate,
    "ms-proteomics" -> (defaultTemplate ++ Seq(
      "characteristics[biological replicate]",
      "comment[technical replicate]",
      "comment[cleavage agent details]",
      "comment[modification parameters]")),
    "dia-acquisition" -> (defaultTemplate ++ Seq(
      "characteristics[biological replicate]",
      "comment[technical replicate]",
      "comment[cleavage agent details]",
      "comment[modification parameters]",
      "comment[proteomics data acquisition method]")))

  /** Template-mode validation: required columns of the named template must
    * be present (case-insensitive) and have no empty cells ("not available"
    * / "not applicable" are valid SDRF values, an empty string is not).
    * The empty-cell scan is ONE distributed aggregation over all required
    * columns — a single pass whatever the row count, no per-column jobs.
    * Returns error strings (empty = valid).
    */
  def validateTemplate(spark: SparkSession, sdrfPath: String,
                       template: String = "ms-proteomics"): Seq[String] = {
    val required = templates.getOrElse(template,
      return Seq(s"ERROR: Unknown template '$template'. " +
        s"Known templates: ${templates.keys.toSeq.sorted.mkString(", ")}"))
    val df = spark.read.option("sep", "\t").option("header", true).csv(sdrfPath)
    val columnsLower = df.columns.map(_.toLowerCase).toSeq

    if (df.limit(1).count() == 0)
      return Seq("ERROR: SDRF file contains a header but no data rows.")

    val missing = required.filterNot(columnsLower.contains).map(c =>
      s"ERROR: Required column '$c' is missing from the SDRF file (template '$template').")

    // empty-cell counts for every present required column, one aggregation
    val present = required.filter(columnsLower.contains)
    val emptyErrors =
      if (present.isEmpty) Nil
      else {
        import org.apache.spark.sql.functions._
        val byLower = df.columns.map(c => c.toLowerCase -> c).toMap
        val aggs = present.map(c =>
          sum(when(col(s"`${byLower(c)}`").isNull ||
            trim(col(s"`${byLower(c)}`")) === "", 1).otherwise(0)).as(c))
        val counts = df.agg(aggs.head, aggs.tail: _*).head()
        present.zipWithIndex.collect {
          case (c, i) if counts.getLong(i) > 0 =>
            s"ERROR: Column '$c' has ${counts.getLong(i)} empty cell(s) (template '$template')."
        }
      }

    missing ++ emptyErrors
  }
}
