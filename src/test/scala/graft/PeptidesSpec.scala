package graft

import org.apache.spark.sql.functions._

import graft.functions.Peptides

/** Golden tests for the peptide string functions; the modsPosition cases are
  * the reference's own unit suite (tests/test_commands.py:274-300).
  */
class PeptidesSpec extends SparkSpec {
  import spark.implicits._

  private def mods(peptidoform: String): Option[Seq[String]] = {
    val r = Seq(peptidoform).toDF("p")
      .select(Peptides.modsPosition(col("p")).as("m"))
      .head()
    if (r.isNullAt(0)) None else Some(r.getSeq[String](0))
  }

  test("modsPosition: single modification") {
    assert(mods("PEPTM(Oxidation)IDE").contains(Seq("5-Oxidation")))
  }

  test("modsPosition: multiple modifications") {
    assert(mods("PEC(Carbamidomethyl)PTMC(Carbamidomethyl)IDE")
      .contains(Seq("3-Carbamidomethyl", "7-Carbamidomethyl")))
  }

  test("modsPosition: unmodified peptide → null") {
    assert(mods("PEPTIDE").isEmpty)
  }

  test("modsPosition: leading dot stripped") {
    assert(mods(".PEPTM(Oxidation)IDE").contains(Seq("5-Oxidation")))
  }

  test("modsPosition: N-terminal modification at position 0") {
    assert(mods("(Acetyl)PEPTIDE").contains(Seq("0-Acetyl")))
  }

  test("modsPosition: trailing modification") {
    assert(mods("PEPC(Carbamidomethyl)").contains(Seq("4-Carbamidomethyl")))
  }

  private def one(c: org.apache.spark.sql.Column, input: String): String =
    Seq(input).toDF("x").select(c.as("y")).head().getString(0)

  test("trueStem: plain, URL, and .d.zip double stem") {
    assert(one(Peptides.trueStem($"x"), "RD139_Narrow_UPS1_0_1fmol_inj1.mzML")
      === "RD139_Narrow_UPS1_0_1fmol_inj1")
    assert(one(Peptides.trueStem($"x"), "https://host/path/BSA1_F1.mzML") === "BSA1_F1")
    assert(one(Peptides.trueStem($"x"), "run7.d.zip") === "run7")
  }

  test("sanitizeSequence drops (SILAC)") {
    assert(one(Peptides.sanitizeSequence($"x"), "PEP(SILAC)TIDEK") === "PEPTIDEK")
  }

  test("normalizeSequence: UniMod id → name, N-term dot, caret preserved") {
    assert(one(Peptides.normalizeSequence($"x"), "AAC(UniMod:4)LLPK")
      === "AAC(Carbamidomethyl)LLPK")
    assert(one(Peptides.normalizeSequence($"x"), "(UniMod:1)PEPTIDEK")
      === ".(Acetyl)PEPTIDEK")
    assert(one(Peptides.normalizeSequence($"x"), "^(UniMod:1)PEPTIDEK")
      === "^.(Acetyl)PEPTIDEK")
    assert(one(Peptides.normalizeSequence($"x"), "PEPTM(UNIMOD:35)IDE")
      === "PEPTM(Oxidation)IDE")
    assert(one(Peptides.normalizeSequence($"x"), "PEPTIDEK") === "PEPTIDEK")
  }
}
