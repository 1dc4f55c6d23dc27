package graft

import java.nio.file.{Files, Paths}

/** In-process e2e over the CLI dispatcher: real commands, real fixture
  * files, asserted exit codes and output artifacts — the layer SURVEY §8
  * credits as "CLI e2e". dispatch() leaves the session alive, so these run
  * against the shared test session like every other suite.
  */
class CliSpec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("diann2msstats writes the MSstats CSV and exits 0") {
    val out = tmpDir("cli-msstats")
    // the same synthesized report recipe as DiannToMsstatsSpec
    val report = {
      val rows = Seq(
        "Run\tProtein.Names\tModified.Sequence\tPrecursor.Charge\tPrecursor.Quantity\tQ.Value\tDecoy",
        "RD139_Narrow_UPS1_0_1fmol_inj1\tP02768;ALBU_HUMAN\tAAC(UniMod:4)LLPK\t2\t1500.5\t0.001\t0",
        "RD139_Narrow_UPS1_0_25fmol_inj1\tP00330;ADH1_YEAST\tVLDALDSIK\t2\t95.75\t0.002\t0")
      val f = Files.createTempFile("cli_report", ".tsv")
      Files.writeString(f, rows.mkString("\n") + "\n")
      f.toString
    }
    val code = cli.Main.dispatch(spark, Array(
      "diann2msstats",
      "--report", report,
      "--exp_design", resource("designs/PXD026600.sdrf_openms_design.tsv"),
      "--qvalue_threshold", "0.01",
      "--out_dir", out))
    assert(code == 0)
    val listing = Files.list(Paths.get(out))
    val csv =
      try listing.toArray.map(_.toString).filter(_.endsWith("_msstats_in.csv"))
      finally listing.close()
    assert(csv.length == 1, s"expected one MSstats csv in $out")
    val lines = Files.readAllLines(Paths.get(csv.head))
    assert(lines.get(0).startsWith("ProteinName,PeptideSequence"))
    assert(lines.size > 1)
  }

  test("checksamplesheet exits 0 on a valid design and 1 on a broken one") {
    val valid = Files.createTempFile("cli_ok_design", ".sdrf.tsv")
    Files.writeString(valid,
      "source name\tassay name\tcomment[data file]\tcomment[label]\t" +
        "comment[instrument]\tcomment[proteomics data acquisition method]\t" +
        "technology type\tcomment[cleavage agent details]\t" +
        "comment[modification parameters]\n" +
        "S1\trun1\tfile1.raw\tlabel free sample\tOrbitrap\t" +
        "Data-Independent Acquisition\tMS\tTrypsin\tOxidation\n")
    val ok = cli.Main.dispatch(spark, Array(
      "checksamplesheet", "--minimal", "--exp_design", valid.toString))
    assert(ok == 0)
    val broken = Files.createTempFile("cli_bad_design", ".tsv")
    Files.writeString(broken, "NotAColumn\tAlsoWrong\nx\ty\n")
    val bad = cli.Main.dispatch(spark, Array(
      "checksamplesheet", "--minimal", "--exp_design", broken.toString))
    assert(bad == 1)
  }

  test("checksamplesheet template mode validates structure and exits by result") {
    import graft.ops.SdrfValidator
    val cols = SdrfValidator.templates("ms-proteomics")
    val ok = Files.createTempFile("cli_tpl_ok", ".sdrf.tsv")
    Files.writeString(ok,
      cols.mkString("\t") + "\n" + cols.map(_ => "v").mkString("\t") + "\n")
    assert(cli.Main.dispatch(spark, Array(
      "checksamplesheet", "--exp_design", ok.toString)) == 0)
    // minimal-valid but template-invalid: no characteristics[organism]
    // (dia-acquisition columns so the minimal acquisition-method need is met)
    val noOrg = Files.createTempFile("cli_tpl_bad", ".sdrf.tsv")
    val kept = SdrfValidator.templates("dia-acquisition")
      .filterNot(_ == "characteristics[organism]")
    Files.writeString(noOrg,
      kept.mkString("\t") + "\n" + kept.map(_ => "v").mkString("\t") + "\n")
    assert(cli.Main.dispatch(spark, Array(
      "checksamplesheet", "--exp_design", noOrg.toString)) == 1)
    assert(cli.Main.dispatch(spark, Array(
      "checksamplesheet", "--minimal", "--exp_design", noOrg.toString)) == 0)
  }

  test("checksamplesheet template mode rejects a bogus ontology accession") {
    // the use_ols_cache_only path e2e: a structurally-complete sheet whose
    // cleavage agent names a nonexistent PSI-MS accession must exit 1
    import graft.ops.SdrfValidator
    val cols = SdrfValidator.templates("ms-proteomics")
    def sheet(cleavage: String) = {
      val f = Files.createTempFile("cli_tpl_terms", ".sdrf.tsv")
      val row = cols.map {
        case "comment[cleavage agent details]" => cleavage
        case _ => "v"
      }
      Files.writeString(f, cols.mkString("\t") + "\n" + row.mkString("\t") + "\n")
      f.toString
    }
    assert(cli.Main.dispatch(spark, Array(
      "checksamplesheet", "--exp_design", sheet("NT=Trypsin;AC=MS:1001251"))) == 0)
    assert(cli.Main.dispatch(spark, Array(
      "checksamplesheet", "--exp_design", sheet("NT=Trypsin;AC=MS:9999999"))) == 1)
  }

  test("dianncfg writes the config file and exits 0") {
    val out = tmpDir("cli-dianncfg")
    val code = cli.Main.dispatch(spark, Array(
      "dianncfg",
      "--enzyme", "Trypsin",
      "--fix_mod", "Carbamidomethyl (C)",
      "--out_dir", out))
    assert(code == 0)
    val cfg = Paths.get(out, "diann_config.cfg")
    assert(Files.exists(cfg))
    val txt = Files.readString(cfg)
    assert(txt.contains("--cut"))
  }

  test("unknown command and empty args exit 2") {
    assert(cli.Main.dispatch(spark, Array("nonsense")) == 2)
    assert(cli.Main.dispatch(spark, Array.empty[String]) == 2)
  }

  test("missing required option exits 2") {
    assert(cli.Main.dispatch(spark, Array("diann2msstats")) == 2)
    assert(cli.Main.dispatch(spark, Array("checksamplesheet", "--minimal")) == 2)
  }

  // S9 resolve_ms_path (mzml_statistics.py:412-448): unique stem match
  // resolves, zero or multiple candidates exit non-zero
  test("mzmlstats resolves a renamed --ms_path by stem glob") {
    val dir = Paths.get(tmpDir("cli-resolve"))
    MzmlFixtures.standard(dir, "run1.mzML")
    val out = tmpDir("cli-resolve-out")
    val code = cli.Main.dispatch(spark, Array(
      "mzmlstats", "--ms_path", s"$dir/run1.raw", "--out_dir", out))
    assert(code == 0)
    assert(Files.exists(Paths.get(out, "run1_ms_info.parquet")))
  }

  test("mzmlstats exits 1 when stem glob is ambiguous or empty") {
    val dir = Paths.get(tmpDir("cli-resolve-multi"))
    MzmlFixtures.standard(dir, "run2.mzML")
    MzmlFixtures.standard(dir, "run2x.mzML")
    assert(cli.Main.dispatch(spark, Array(
      "mzmlstats", "--ms_path", s"$dir/run2.raw")) == 1)
    assert(cli.Main.dispatch(spark, Array(
      "mzmlstats", "--ms_path", s"$dir/absent.raw")) == 1)
  }
}
