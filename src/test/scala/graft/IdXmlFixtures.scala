package graft

import java.nio.file.{Files, Path}

/** Synthesizes idXML files (FIXTURES.md §2.3): the reference's comet idXML
  * fixture is a stripped large blob.
  */
object IdXmlFixtures {

  case class Hit(
      sequence: String,
      charge: Int,
      score: Double,
      targetDecoy: String = "target",
      pep: Option[Double] = Some(0.02),
      consensusSupport: Option[Double] = None,
      msQValue: Option[Double] = None,
      qValue: Option[Double] = None,
      proteins: Seq[(String, Int, Int)] = Seq(("PH_0", 10, 18)))

  case class PepId(
      rt: Double,
      mz: Double,
      scoreType: String,
      spectrumReference: String,
      hits: Seq[Hit])

  def write(path: Path, pepIds: Seq[PepId],
            searchEngine: String = "Comet",
            subEngines: Seq[String] = Nil,
            spectraData: String = "e2e_run.mzML",
            accessions: Map[String, String] = Map("PH_0" -> "P02768", "PH_1" -> "P00330")): Path = {
    val seParams = subEngines.map(e =>
      s"""<UserParam type="string" name="SE:$e" value="1.0"/>""").mkString("\n")
    val protHits = accessions.map { case (id, acc) =>
      s"""<ProteinHit id="$id" accession="$acc" score="0.0" sequence=""/>"""
    }.mkString("\n")
    val peps = pepIds.map { p =>
      val hits = p.hits.map { h =>
        val metas = Seq(
          Some(s"""<UserParam type="string" name="target_decoy" value="${h.targetDecoy}"/>"""),
          h.pep.map(v => s"""<UserParam type="float" name="Posterior Error Probability_score" value="$v"/>"""),
          h.consensusSupport.map(v => s"""<UserParam type="float" name="consensus_support" value="$v"/>"""),
          h.msQValue.map(v => s"""<UserParam type="float" name="MS:1001491" value="$v"/>"""),
          h.qValue.map(v => s"""<UserParam type="float" name="q-value" value="$v"/>"""),
        ).flatten.mkString("\n")
        val refs = h.proteins.map(_._1).mkString(" ")
        val starts = h.proteins.map(_._2).mkString(" ")
        val ends = h.proteins.map(_._3).mkString(" ")
        s"""<PeptideHit score="${h.score}" sequence="${h.sequence}" charge="${h.charge}" start="$starts" end="$ends" protein_refs="$refs">
           |$metas
           |</PeptideHit>""".stripMargin
      }.mkString("\n")
      s"""<PeptideIdentification score_type="${p.scoreType}" higher_score_better="false" significance_threshold="0" MZ="${p.mz}" RT="${p.rt}" spectrum_reference="${p.spectrumReference}">
         |$hits
         |</PeptideIdentification>""".stripMargin
    }.mkString("\n")

    val xml =
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<IdXML version="1.5" xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance">
         |<SearchParameters id="SP_0" db="test.fasta" db_version="" taxonomy="" mass_type="monoisotopic" charges="" enzyme="trypsin" missed_cleavages="2" precursor_peak_tolerance="10" precursor_peak_tolerance_ppm="true" peak_mass_tolerance="0.02" peak_mass_tolerance_ppm="false">
         |$seParams
         |</SearchParameters>
         |<IdentificationRun date="2024-03-01T10:00:00" search_engine="$searchEngine" search_engine_version="1.0" search_parameters_ref="SP_0">
         |<ProteinIdentification score_type="" higher_score_better="true" significance_threshold="0">
         |$protHits
         |<UserParam type="stringList" name="spectra_data" value="[$spectraData]"/>
         |</ProteinIdentification>
         |$peps
         |</IdentificationRun>
         |</IdXML>""".stripMargin
    Files.writeString(path, xml)
    path
  }

  /** Standard comet-style fixture: 3 peptide ids (one decoy hit, one
    * 2-protein evidence, one unparseable spectrum_reference).
    */
  def standard(dir: Path, name: String = "sample_comet.idXML"): Path =
    write(dir.resolve(name), Seq(
      PepId(100.5, 500.25, "expect", "controllerType=0 controllerNumber=1 scan=2", Seq(
        Hit("PEC(Carbamidomethyl)PTMC(Carbamidomethyl)IDE", 2, 0.01),
        Hit("DECOYPEPTIDER", 2, 0.5, targetDecoy = "decoy"))),
      PepId(200.5, 600.5, "expect", "controllerType=0 controllerNumber=1 scan=3", Seq(
        Hit(".(Acetyl)PEPTIDEK", 3, 0.02, msQValue = Some(0.001),
          proteins = Seq(("PH_0", 5, 12), ("PH_1", 7, 14))))),
      PepId(300.0, 700.0, "expect", "no-scan-here", Seq(
        Hit("SKIPPEDK", 2, 0.9)))))
}
