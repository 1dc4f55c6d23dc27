package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.DiannCfg

/** dianncfg golden behavior — inputs from the reference's own test
  * (tests/test_commands.py:92-104) plus error paths.
  */
class DiannCfgSpec extends AnyFunSuite {

  test("reference test inputs render the full config line") {
    val out = DiannCfg.render(
      enzyme = Some("Trypsin"),
      fixMod = Some("Carbamidomethyl (C)"),
      varMod = Some("Oxidation (M),Phospho (S),Phospho (T),Phospho (Y)," +
        "Acetyl (Protein N-term),Acetyl (K),Acetyl (R),Met-loss (Protein N-term M)"))
    assert(out ===
      "--cut K*,R*,!*P" +
        " --fixed-mod UniMod:4,57.021464,C" +
        " --var-mod UniMod:35,15.994915,M" +
        " --var-mod UniMod:21,79.966331,STY" +
        " --var-mod UniMod:1,42.010565,*nKR" +
        " --met-excision ")
  }

  test("no enzyme → no cut flag") {
    assert(DiannCfg.render(None, Some("Carbamidomethyl (C)"), None) ===
      " --fixed-mod UniMod:4,57.021464,C")
  }

  test("unknown enzyme / unknown mod / labelled mod / missing site are errors") {
    intercept[IllegalArgumentException](DiannCfg.enzymeCut(Some("Pepsin")))
    intercept[IllegalArgumentException](DiannCfg.getMod("NotAMod (C)", "fixed_mod"))
    intercept[IllegalArgumentException](DiannCfg.getMod("TMT6plex (K)", "fixed_mod"))
    intercept[IllegalArgumentException](DiannCfg.getMod("Oxidation", "var_mod"))
    // terminal-AA restriction other than Met-loss is rejected
    intercept[IllegalArgumentException](DiannCfg.getMod("Acetyl (Protein N-term K)", "var_mod"))
  }

  test("N-term vs Protein N-term site rewriting") {
    assert(DiannCfg.getMod("Gln->pyro-Glu (N-term)", "var_mod")._2 === "n")
    assert(DiannCfg.getMod("Acetyl (Protein N-term)", "var_mod")._2 === "*n")
  }
}
