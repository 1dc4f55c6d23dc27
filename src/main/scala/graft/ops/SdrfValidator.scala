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
  *    of the named template, PLUS term-accession validation against a
  *    bundled ontology snapshot (validateTerms) — the equivalent of the
  *    reference's `--use_ols_cache_only` mode (check_samplesheet.py:52-56),
  *    with the OLS cache replaced by src/main/resources/ontology_snapshot
  *    .tsv + the Unimod snapshot. The remaining zero-egress divergence is
  *    narrow: accessions under an ontology prefix the snapshot does not
  *    cover at all are logged and skipped (the reference would ask OLS).
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

  /** Ontology snapshot for term-accession validation: the reference's full
    * mode validates every `AC=<accession>` against OLS (check_samplesheet
    * .py:52-56 via sdrf-pipelines; `--use_ols_cache_only` swaps the live
    * service for a local cache). This sandbox has zero egress, so we ship
    * the cache: a bundled subset of the public PSI-MS CV (instrument
    * models, cleavage agents, dissociation methods, mzML/scan terms),
    * the PRIDE CV dissociation subset, and NCBI taxonomy
    * (src/main/resources/ontology_snapshot.tsv) plus the Unimod snapshot
    * already bundled for S10/J9. accession(upper) → canonical label.
    */
  lazy val ontologySnapshot: Map[String, String] = {
    val in = getClass.getClassLoader.getResourceAsStream("ontology_snapshot.tsv")
    require(in != null, "ontology_snapshot.tsv missing from classpath")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    val fromTsv =
      try src.getLines().drop(1).filter(_.nonEmpty).zipWithIndex.map { case (l, i) =>
        // split with limit -1: a trailing empty field (label present, third
        // column empty) must not change the arity and MatchError the load
        val f = l.split("\t", -1)
        require(f.length >= 2,
          s"ontology_snapshot.tsv line ${i + 2}: expected >=2 tab-separated " +
            s"fields (accession, label[, source]), got ${f.length}: '$l'")
        f(0).toUpperCase -> f(1)
      }.toMap
      finally src.close()
    fromTsv ++ DiannCfg.unimod.map(e => e.accession.toUpperCase -> e.name)
  }

  /** Ontology prefixes the snapshot covers: an accession under one of these
    * that is absent from the snapshot is an ERROR; any other prefix is
    * logged and skipped (the documented zero-egress divergence — the
    * reference would ask OLS).
    */
  val coveredOntologies: Set[String] = Set("MS", "UNIMOD", "NCBITAXON", "PRIDE")

  /** Term-accession validation over every `comment[...]`/
    * `characteristics[...]` column: cells carrying SDRF key-value terms
    * (`NT=<name>;AC=<accession>`) must name an accession the snapshot
    * knows, and the `NT=` name must match the ontology's canonical label
    * (case-insensitive) — the two checks sdrf-pipelines runs per term.
    *
    * Scale shape: ONE projection pass extracts (column, AC, NT) for all
    * term columns, then a distinct on that tiny projection — the result is
    * bounded by the CV size (distinct terms used in the design), never the
    * row count — and the bounded set is checked on the driver against the
    * in-memory snapshot, the same broadcast-lookup shape as S10.
    */
  def validateTerms(spark: SparkSession, sdrfPath: String): Seq[String] =
    validateTerms(spark.read.option("sep", "\t").option("header", true).csv(sdrfPath))

  /** Same, over an already-loaded SDRF frame — validateTemplate passes its
    * own scan through instead of re-reading the file.
    */
  def validateTerms(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    import org.apache.spark.sql.functions._
    val termCols = df.columns.filter { c =>
      val l = c.toLowerCase
      l.startsWith("comment[") || l.startsWith("characteristics[")
    }
    if (termCols.isEmpty) return Nil
    val terms = df.select(explode(array(termCols.map(c =>
        struct(
          lit(c).as("col"),
          regexp_extract(col(s"`$c`"), "(?i)(?:^|;)\\s*AC=([^;]+)", 1).as("ac"),
          regexp_extract(col(s"`$c`"), "(?i)(?:^|;)\\s*NT=([^;]+)", 1).as("nt"))): _*))
        .as("t"))
      .select(col("t.*"))
      .filter(col("ac") =!= "")
      .distinct()
      .collect()
    terms.toSeq.flatMap { r =>
      val (column, ac, nt) = (r.getString(0), r.getString(1).trim, r.getString(2).trim)
      if (!ac.contains(":")) {
        // Not an ontology CURIE at all: SDRF reuses the AC= key for plain
        // database accessions (e.g. the UniProt protein in
        // characteristics[spiked compound] — P00924 in the PXD000001
        // fixture). sdrf-pipelines doesn't send those to OLS either.
        this.log.debug(s"AC '$ac' (column '$column') is not an ontology CURIE; skipping.")
        Nil
      } else {
      val prefix = ac.split(":")(0).toUpperCase
      if (!coveredOntologies.contains(prefix)) {
        this.log.warn(s"Term '$ac' (column '$column') uses ontology '$prefix' not in the " +
          "bundled snapshot; skipping (the reference would query OLS here).")
        Nil
      } else ontologySnapshot.get(ac.toUpperCase) match {
        case None =>
          Seq(s"ERROR: Term accession '$ac' (column '$column') not found in ontology '$prefix'.")
        case Some(label) if nt.nonEmpty && label.toLowerCase != nt.toLowerCase =>
          Seq(s"ERROR: Term name '$nt' (column '$column') does not match the " +
            s"ontology label '$label' for accession '$ac'.")
        case _ => Nil
      }
      }
    }
  }

  /** Template-mode validation: required columns of the named template must
    * be present (case-insensitive) and have no empty cells ("not available"
    * / "not applicable" are valid SDRF values, an empty string is not).
    * The empty-cell scan is ONE distributed aggregation over all required
    * columns — a single pass whatever the row count, no per-column jobs.
    * Cells carrying `AC=` term accessions are additionally validated
    * against the bundled ontology snapshot (validateTerms above).
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

    // An SDRF legitimately repeats some columns (every real design carries
    // several comment[modification parameters]); Spark's CSV reader
    // de-duplicates repeated headers by appending the column index, so
    // 'comment[modification parameters]14' IS the required column. A
    // required name therefore matches exactly or with a bare numeric
    // suffix.
    def matches(req: String)(l: String): Boolean =
      l == req || (l.startsWith(req) && l.drop(req.length).nonEmpty &&
        l.drop(req.length).forall(_.isDigit))

    val missing = required.filterNot(c => columnsLower.exists(matches(c))).map(c =>
      s"ERROR: Required column '$c' is missing from the SDRF file (template '$template').")

    // empty-cell counts for every present required column (all duplicates
    // of a repeated column included), one aggregation
    val present = required.flatMap(c => columnsLower.filter(matches(c)))
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

    missing ++ emptyErrors ++ validateTerms(df)
  }
}
