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
}
