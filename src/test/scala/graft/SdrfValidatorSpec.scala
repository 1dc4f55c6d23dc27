package graft

import java.nio.file.Files

import graft.ops.SdrfValidator

/** checksamplesheet --minimal behavior
  * (tests/test_commands.py:110-151).
  */
class SdrfValidatorSpec extends SparkSpec {

  test("PXD000001 fails: missing acquisition-method column") {
    val errors = SdrfValidator.validateMinimal(spark, resource("designs/PXD000001.sdrf.tsv"))
    assert(errors.nonEmpty)
    assert(errors.exists(_.toLowerCase.contains("proteomics data acquisition method")))
  }

  test("valid minimal SDRF passes") {
    val f = Files.createTempFile("ok", ".sdrf.tsv")
    Files.writeString(f,
      "source name\tassay name\tcomment[data file]\tcomment[label]\t" +
        "comment[instrument]\tcomment[proteomics data acquisition method]\t" +
        "technology type\tcomment[cleavage agent details]\t" +
        "comment[modification parameters]\n" +
        "S1\trun1\tfile1.raw\tlabel free sample\tOrbitrap\t" +
        "Data-Independent Acquisition\tMS\tTrypsin\tOxidation\n")
    assert(SdrfValidator.validateMinimal(spark, f.toString).isEmpty)
  }

  test("missing cleavage agent column fails") {
    val f = Files.createTempFile("bad", ".sdrf.tsv")
    Files.writeString(f,
      "source name\tassay name\tcomment[data file]\tcomment[label]\t" +
        "comment[instrument]\tcomment[proteomics data acquisition method]\t" +
        "technology type\tcomment[modification parameters]\n" +
        "S1\trun1\tfile1.raw\tlabel free sample\tOrbitrap\tDIA\tMS\tOxidation\n")
    val errors = SdrfValidator.validateMinimal(spark, f.toString)
    assert(errors.exists(_.contains("cleavage agent details")))
  }

  test("header-only SDRF fails") {
    val f = Files.createTempFile("empty", ".sdrf.tsv")
    Files.writeString(f, "source name\tassay name\n")
    val errors = SdrfValidator.validateMinimal(spark, f.toString)
    assert(errors === Seq("ERROR: SDRF file contains a header but no data rows."))
  }

  // --- template mode (check_samplesheet.py:100-125 minus ontology/OLS) ---

  private def templateSdrf(drop: Set[String] = Set.empty,
                           blank: Set[String] = Set.empty): String = {
    val cols = SdrfValidator.templates("dia-acquisition").filterNot(drop)
    val row = cols.map(c => if (blank(c)) "" else "v")
    val f = Files.createTempFile("tpl", ".sdrf.tsv")
    Files.writeString(f, cols.mkString("\t") + "\n" + row.mkString("\t") + "\n")
    f.toString
  }

  test("template mode: complete dia-acquisition sheet passes all templates") {
    val path = templateSdrf()
    for (t <- SdrfValidator.templates.keys)
      assert(SdrfValidator.validateTemplate(spark, path, t).isEmpty, t)
  }

  test("template mode: missing organism fails the template but not minimal") {
    val path = templateSdrf(drop = Set("characteristics[organism]"))
    val errors = SdrfValidator.validateTemplate(spark, path, "ms-proteomics")
    assert(errors.exists(_.contains("characteristics[organism]")), errors)
    // minimal mode doesn't ask for sample metadata — same file passes it
    assert(SdrfValidator.validateMinimal(spark, path).isEmpty)
  }

  test("template mode: empty cell in a required column fails") {
    val path = templateSdrf(blank = Set("comment[instrument]"))
    val errors = SdrfValidator.validateTemplate(spark, path, "default")
    assert(errors.exists(e =>
      e.contains("comment[instrument]") && e.contains("empty cell")), errors)
  }

  test("template mode: unknown template is an error") {
    val errors = SdrfValidator.validateTemplate(spark, templateSdrf(), "nope")
    assert(errors.exists(_.contains("Unknown template 'nope'")), errors)
  }

  // --- ontology-snapshot term validation (check_samplesheet.py:52-56;
  //     the use_ols_cache_only path with the cache bundled as a resource) ---

  private def termSdrf(cleavage: String, organism: String = "Homo sapiens",
                       mods: String = "NT=Oxidation;MT=Variable;TA=M;AC=UNIMOD:35"): String = {
    val cols = Seq("source name", "characteristics[organism]", "assay name",
      "comment[data file]", "comment[label]", "comment[instrument]",
      "comment[cleavage agent details]", "comment[modification parameters]",
      "technology type")
    val row = Seq("S1", organism, "run1", "f.raw",
      "NT=label free sample;AC=MS:1002038",
      "NT=Orbitrap Fusion Lumos;AC=MS:1002732", cleavage, mods, "MS")
    val f = Files.createTempFile("terms", ".sdrf.tsv")
    Files.writeString(f, cols.mkString("\t") + "\n" + row.mkString("\t") + "\n")
    f.toString
  }

  test("terms: known MS/UNIMOD accessions with matching names pass") {
    val path = termSdrf("NT=Trypsin;AC=MS:1001251")
    assert(SdrfValidator.validateTerms(spark, path).isEmpty)
  }

  test("terms: bogus accession fails, and fails the whole template validation") {
    val path = termSdrf("NT=Trypsin;AC=MS:9999999")
    val errors = SdrfValidator.validateTerms(spark, path)
    assert(errors.exists(e => e.contains("MS:9999999") && e.contains("not found")), errors)
    // end-to-end: template mode surfaces it too (the CLI exit-code path)
    assert(SdrfValidator.validateTemplate(spark, path, "default")
      .exists(_.contains("MS:9999999")))
  }

  test("terms: name/accession mismatch fails") {
    val path = termSdrf("NT=Chymotrypsin;AC=MS:1001251")
    val errors = SdrfValidator.validateTerms(spark, path)
    assert(errors.exists(e =>
      e.contains("Chymotrypsin") && e.contains("Trypsin") && e.contains("does not match")), errors)
  }

  test("terms: uncovered ontology prefixes are skipped, not failed") {
    // EFO isn't in the bundled snapshot — the reference would ask OLS; we
    // log and skip (documented divergence), never spuriously fail
    val path = termSdrf("NT=Trypsin;AC=MS:1001251",
      mods = "NT=something;AC=EFO:0009736")
    assert(SdrfValidator.validateTerms(spark, path).isEmpty)
  }

  test("terms: PXD000001 — every prefix covered, one genuine legacy mis-annotation") {
    // With the expanded snapshot (PSI-MS branches + PRIDE dissociation +
    // NCBITaxon + Unimod incl. Methylthio), every ontology CURIE in the
    // reference fixture resolves: MS:1001742, UNIMOD:35/39/737,
    // PRIDE:0000590, MS:1001313. The UniProt AC=P00924 in
    // characteristics[spiked compound] is not a CURIE and is skipped
    // silently. The ONLY finding is real: the legacy file pairs
    // AC=MS:1001313 (canonical label 'Trypsin/P') with NT=Trypsin —
    // exactly what OLS-backed validation would flag.
    val errors = SdrfValidator.validateTerms(spark, resource("designs/PXD000001.sdrf.tsv"))
    assert(errors.size === 1, errors)
    assert(errors.head.contains("MS:1001313") && errors.head.contains("Trypsin/P"), errors)
  }

  test("terms: PRIDE is a covered prefix — bogus PRIDE accession fails") {
    val path = termSdrf("NT=Trypsin;AC=MS:1001251",
      mods = "NT=HCD;AC=PRIDE:9999999")
    val errors = SdrfValidator.validateTerms(spark, path)
    assert(errors.exists(e => e.contains("PRIDE:9999999") && e.contains("not found")), errors)
  }

  test("terms: colon-less AC values (plain database accessions) are skipped") {
    val path = termSdrf("NT=Trypsin;AC=MS:1001251",
      mods = "SP=Yeast;CT=protein;AC=P00924;QY=10")
    assert(SdrfValidator.validateTerms(spark, path).isEmpty)
  }

  test("terms: unimod accession with wrong name fails against the unimod snapshot") {
    val path = termSdrf("NT=Trypsin;AC=MS:1001251",
      mods = "NT=Phospho;MT=Variable;TA=M;AC=UNIMOD:35")
    val errors = SdrfValidator.validateTerms(spark, path)
    assert(errors.exists(e => e.contains("Phospho") && e.contains("Oxidation")), errors)
  }

  // --- second-template breadth: synthesized DIA and TMT designs validate
  //     with every ontology CURIE covered (zero OLS-divergence skips) ---

  /** Every `AC=<prefix>:<id>` ontology CURIE in an SDRF file. */
  private def curiesOf(path: String): Seq[String] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try "(?i)AC=([A-Za-z]+:[^;\\t\\n\\r]+)".r
      .findAllMatchIn(src.mkString).map(_.group(1)).toSeq.distinct
    finally src.close()
  }

  /** Zero-skip, mechanically: every CURIE is under a covered prefix (no
    * log-and-skip path can fire) AND resolves in the bundled snapshot.
    */
  private def assertFullyCovered(path: String): Unit = {
    val curies = curiesOf(path)
    assert(curies.nonEmpty, s"fixture $path carries no ontology CURIEs")
    curies.foreach { ac =>
      val prefix = ac.split(":")(0).toUpperCase
      assert(SdrfValidator.coveredOntologies.contains(prefix),
        s"$ac would be skipped: ontology '$prefix' not covered")
      assert(SdrfValidator.ontologySnapshot.contains(ac.toUpperCase),
        s"$ac not in the bundled snapshot")
    }
  }

  test("terms: synthesized DIA design — dia-acquisition-valid, zero uncovered skips") {
    val path = resource("designs/synthetic_dia.sdrf.tsv")
    for (t <- Seq("default", "ms-proteomics", "dia-acquisition"))
      assert(SdrfValidator.validateTemplate(spark, path, t).isEmpty, t)
    assertFullyCovered(path)
  }

  test("terms: synthesized TMT design — ms-proteomics-valid, zero uncovered skips") {
    val path = resource("designs/synthetic_tmt.sdrf.tsv")
    for (t <- Seq("default", "ms-proteomics"))
      assert(SdrfValidator.validateTemplate(spark, path, t).isEmpty, t)
    assertFullyCovered(path)
    // plain-text TMT channel names (the PXD000001 convention) are not
    // CURIEs and must not produce term errors or skips
    assert(!curiesOf(path).exists(_.toUpperCase.startsWith("TMT")))
  }

  test("terms: DIA design with a bogus instrument accession fails template mode") {
    val lines = {
      val src = scala.io.Source.fromFile(
        resource("designs/synthetic_dia.sdrf.tsv"), "UTF-8")
      try src.getLines().toVector finally src.close()
    }
    val f = Files.createTempFile("dia_bogus", ".sdrf.tsv")
    Files.writeString(f,
      lines.map(_.replace("AC=MS:1003028", "AC=MS:8888888")).mkString("\n") + "\n")
    val errors = SdrfValidator.validateTemplate(spark, f.toString, "dia-acquisition")
    assert(errors.exists(e => e.contains("MS:8888888") && e.contains("not found")), errors)
  }
}
