package graft

import java.nio.file.{Files, Paths}

import graft.io.DesignReader

/** Design-format parsing, mirroring the reference's unified/legacy suite
  * (tests/test_commands.py:325-385).
  */
class DesignReaderSpec extends SparkSpec {

  test("unified format parses: 2 samples, 4 file rows, stem runs") {
    val t = DesignReader.read(spark, resource("designs/PXD026600_diann_design.tsv"))
    assert(t.samples.columns.contains("MSstats_Condition"))
    assert(t.samples.columns.contains("MSstats_BioReplicate"))
    assert(t.samples.count() === 2)
    assert(t.files.columns.contains("run"))
    assert(t.files.columns.contains("Fraction"))
    assert(t.files.columns.contains("Sample"))
    assert(t.files.count() === 4)
    val runs = t.files.select("run").collect().map(_.getString(0)).toSet
    assert(runs.contains("RD139_Narrow_UPS1_0_1fmol_inj1"))
    assert(runs.contains("RD139_Narrow_UPS1_0_25fmol_inj2"))
  }

  test("legacy two-table format parses: 2 samples, 4 file rows") {
    val t = DesignReader.read(spark, resource("designs/PXD026600.sdrf_openms_design.tsv"))
    assert(t.samples.columns.contains("MSstats_Condition"))
    assert(t.samples.count() === 2)
    assert(t.files.columns.contains("run"))
    assert(t.files.count() === 4)
  }

  test("unified format rejects missing required columns") {
    val f = Files.createTempFile("bad_design", ".tsv")
    Files.writeString(f, "Filename\tCondition\tBioReplicate\nfile1.raw\tA\t1\n")
    val e = intercept[IllegalArgumentException] {
      DesignReader.read(spark, f.toString)
    }
    assert(e.getMessage.contains("missing required columns"))
  }

  test("unified format rejects inconsistent Sample mapping") {
    val f = Files.createTempFile("inconsistent_design", ".tsv")
    Files.writeString(f,
      "Filename\tSample\tFraction\tCondition\tBioReplicate\tLabel\tLabelType\n" +
        "file1.raw\t1\t1\tCondA\t1\tlabel free sample\tlabel free\n" +
        "file2.raw\t1\t1\tCondB\t2\tlabel free sample\tlabel free\n")
    val e = intercept[IllegalArgumentException] {
      DesignReader.read(spark, f.toString)
    }
    assert(e.getMessage.contains("Inconsistent"))
  }

  test("legacy format without blank separator is an error") {
    val f = Files.createTempFile("nosep", ".tsv")
    Files.writeString(f,
      "Fraction_Group\tFraction\tSpectra_Filepath\tLabel\tSample\n1\t1\ta.mzML\t1\t1\n")
    val e = intercept[IllegalArgumentException] {
      DesignReader.readLegacy(spark, f.toString)
    }
    assert(e.getMessage.contains("blank separator"))
  }
}
