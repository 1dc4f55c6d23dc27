package graft

import java.nio.file.Files

import graft.ops.SampleExtract

/** openms2sample behavior, mirroring tests/test_commands.py:153-158,390-421. */
class SampleExtractSpec extends SparkSpec {

  test("BSA design (no mixture): Spectra_Filepath + Sample, 6 rows") {
    val out = SampleExtract.extract(spark, resource("designs/BSA_design_urls.tsv"))
    assert(out.columns === Array("Spectra_Filepath", "Sample"))
    assert(out.count() === 6)
  }

  test("mixture design: sample replaced by mixture id, deduped") {
    val f = Files.createTempFile("test_design", ".tsv")
    Files.writeString(f,
      "Fraction_Group\tFraction\tSpectra_Filepath\tLabel\tSample\n" +
        "1\t1\tfile1.mzML\t1\t1\n" +
        "2\t1\tfile2.mzML\t1\t2\n" +
        "\n" +
        "Sample\tMSstats_Condition\tMSstats_BioReplicate\tMSstats_Mixture\n" +
        "1\tCondition_A\t1\tMixture_1\n" +
        "2\tCondition_B\t2\tMixture_1\n")
    val out = SampleExtract.extract(spark, f.toString)
    assert(out.count() === 2)
    assert(out.columns === Array("Spectra_Filepath", "Sample"))
    assert(out.select("Sample").collect().map(_.getString(0)).toSet === Set("Mixture_1"))
  }

  test("mixture design with unknown sample is an error") {
    val f = Files.createTempFile("bad_mix_design", ".tsv")
    Files.writeString(f,
      "Fraction_Group\tFraction\tSpectra_Filepath\tLabel\tSample\n" +
        "1\t1\tfile1.mzML\t1\t7\n" +
        "\n" +
        "Sample\tMSstats_Condition\tMSstats_BioReplicate\tMSstats_Mixture\n" +
        "1\tCondition_A\t1\tMixture_1\n")
    val e = intercept[IllegalArgumentException] {
      SampleExtract.extract(spark, f.toString)
    }
    assert(e.getMessage.contains("no matching entry"))
  }
}
