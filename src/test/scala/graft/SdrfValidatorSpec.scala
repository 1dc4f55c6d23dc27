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
}
