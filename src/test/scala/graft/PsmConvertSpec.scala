package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.model.Schemas
import graft.ops.PsmConvert

/** idXML DSv2 source + psmconvert semantics (reference assertions
  * tests/test_commands.py:167-202; FIXTURES.md §2.3-2.4).
  */
class PsmConvertSpec extends SparkSpec {

  private lazy val dir = Files.createTempDirectory("idxml-fix")
  private lazy val file = IdXmlFixtures.standard(dir).toString

  private lazy val ms2 = {
    import spark.implicits._
    Seq(
      ("2", 2, Seq(101.0, 102.0), Seq(5.0, 6.0)),
      ("3", 2, Seq(201.0, 202.0), Seq(9.0, 11.0)),
      ("99", 2, Seq(301.0), Seq(1.0)))
      .toDF("scan", "ms_level", "mz_array", "intensity_array")
  }

  test("idxml source parses run info, hits, and protein evidence") {
    val df = PsmConvert.readIdXml(spark, Seq(file))
    assert(df.count() === 3)
    val first = df.filter(col("pep_index") === 0).head()
    assert(first.getAs[String]("spectrum_reference").endsWith("scan=2"))
    assert(first.getAs[Seq[org.apache.spark.sql.Row]]("hits").length === 2)
    assert(first.getAs[Seq[String]]("search_engines") === Seq("Comet"))
    assert(first.getAs[String]("reference_file_name") === "e2e_run")
  }

  test("psm assembly: decoy drop, scan skip, mods, scores, evidence") {
    val out = PsmConvert.convert(PsmConvert.readIdXml(spark, Seq(file)), Some(ms2)).cache()
    assert(out.drop("file_name").columns.sorted === Schemas.psm.fieldNames.sorted)

    // 4 hits − 1 decoy − 1 unparseable scan = 2 PSMs
    assert(out.count() === 2)

    val r1 = out.filter(col("scan_number") === 2).head()
    assert(r1.getAs[String]("sequence") === "PECPTMCIDE")
    assert(r1.getAs[String]("peptidoform") === "PEC(Carbamidomethyl)PTMC(Carbamidomethyl)IDE")
    assert(r1.getAs[Seq[String]]("modifications") ===
      Seq("3-Carbamidomethyl", "7-Carbamidomethyl"))
    assert(r1.getAs[Double]("retention_time") === 100.5)
    assert(r1.getAs[Double]("exp_mass_to_charge") === 500.25)
    assert(r1.getAs[Seq[String]]("id_scores") === Seq("Comet:Expectation value: 0.01"))
    assert(r1.getAs[Int]("is_decoy") === 0)
    // ms2 join: nested array-of-arrays + matched-row count
    assert(r1.getAs[Seq[Seq[Double]]]("mz_array") === Seq(Seq(101.0, 102.0)))
    assert(r1.getAs[Int]("num_peaks") === 1)

    val r2 = out.filter(col("scan_number") === 3).head()
    assert(r2.getAs[String]("sequence") === "PEPTIDEK")
    assert(r2.getAs[Seq[String]]("modifications") === Seq("0-Acetyl"))
    assert(r2.getAs[Double]("global_qvalue") === 0.001) // MS:1001491 wins
    assert(r2.getAs[Seq[String]]("protein_accessions") === Seq("P02768", "P00330"))
    assert(r2.getAs[Seq[Int]]("protein_start_positions") === Seq(5, 7))
    assert(r2.getAs[Seq[Int]]("protein_end_positions") === Seq(12, 14))
  }

  test("export_decoy_psm keeps decoys flagged") {
    val out = PsmConvert.convert(
      PsmConvert.readIdXml(spark, Seq(file)), None, exportDecoyPsm = true)
    assert(out.count() === 3)
    assert(out.filter(col("is_decoy") === 1).count() === 1)
    // without ms2: null arrays
    val r = out.filter(col("scan_number") === 2).filter(col("is_decoy") === 0).head()
    assert(r.isNullAt(r.fieldIndex("num_peaks")))
  }

  test("ConsensusID run: sub-engines, consensus support, q-value score type") {
    val f = IdXmlFixtures.write(dir.resolve("consensus.idXML"), Seq(
      IdXmlFixtures.PepId(50.0, 400.0, "q-value", "scan=7", Seq(
        IdXmlFixtures.Hit("PEPK", 2, 0.004, consensusSupport = Some(0.67))))),
      searchEngine = "ConsensusID_best", subEngines = Seq("Comet", "MS-GF+"))
    val out = PsmConvert.convert(PsmConvert.readIdXml(spark, Seq(f.toString)), None)
    val r = out.head()
    // ordered MS-GF+ first, as the reference builds it
    val df = PsmConvert.readIdXml(spark, Seq(f.toString))
    assert(df.head().getAs[Seq[String]]("search_engines") === Seq("MS-GF+", "Comet"))
    assert(r.getAs[Double]("global_qvalue") === 0.004) // score_type q-value
    assert(r.getAs[Double]("consensus_support") === 0.67)
    assert(r.getAs[Seq[String]]("id_scores") === Seq.empty)
  }
}
