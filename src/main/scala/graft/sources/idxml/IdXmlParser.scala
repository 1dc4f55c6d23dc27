package graft.sources.idxml

import java.io.InputStream

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/** One peptide hit (candidate match) of a peptide identification.
  * idXML stores start/end/protein_refs as space-separated aligned lists.
  */
case class IdXmlHit(
    sequence: String,
    charge: Int,
    score: Double,
    targetDecoy: Option[String],
    posteriorErrorProbability: Option[Double],
    consensusSupport: Option[Double],
    msQValue: Option[Double], // UserParam "MS:1001491"
    qValue: Option[Double], // UserParam "q-value"
    proteinAccessions: Seq[String],
    proteinStarts: Seq[Int],
    proteinEnds: Seq[Int])

/** One PeptideIdentification element (a spectrum's identification). */
case class IdXmlPeptideId(
    index: Int,
    rt: Double,
    mz: Double,
    scoreType: String,
    spectrumReference: String,
    hits: List[IdXmlHit])

/** Run-level context shared by all peptide ids of an identification run. */
case class IdXmlRunInfo(
    searchEngine: String,
    consensusSubEngines: Seq[String], // SE:* meta values when ConsensusID
    spectraData: Seq[String])

/** Streaming StAX parser for OpenMS idXML (reference consumption:
  * psm_conversion.py:87-108). Yields PeptideIdentifications; run-level info
  * (search engine / ConsensusID sub-engines from SearchParameters UserParams,
  * `spectra_data` from the ProteinIdentification) is exposed once parsed —
  * idXML orders SearchParameters and ProteinIdentification before the
  * peptide ids, so it is available from the first element on.
  */
class IdXmlParser(in: InputStream) extends Iterator[IdXmlPeptideId] with AutoCloseable {

  private val factory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_COALESCING, true)
    f
  }
  private val r: XMLStreamReader = factory.createXMLStreamReader(in)

  private var searchEngine = ""
  private val subEngines = ArrayBuffer.empty[String]
  private val spectraData = ArrayBuffer.empty[String]
  private val proteinAcc = mutable.Map.empty[String, String] // ProteinHit id → accession

  def runInfo: IdXmlRunInfo = IdXmlRunInfo(searchEngine, subEngines.toSeq, spectraData.toSeq)

  private var nextId: IdXmlPeptideId = _
  private var done = false
  private var pepCount = 0
  private var inSearchParameters = false
  private var inProteinIdentification = false

  private def attr(name: String): Option[String] = {
    var i = 0
    while (i < r.getAttributeCount) {
      if (r.getAttributeLocalName(i) == name) return Some(r.getAttributeValue(i))
      i += 1
    }
    None
  }

  private def advance(): Unit = {
    nextId = null
    while (nextId == null && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "SearchParameters" => inSearchParameters = true
            case "IdentificationRun" =>
              if (searchEngine.isEmpty)
                searchEngine = attr("search_engine").getOrElse("")
            case "ProteinIdentification" => inProteinIdentification = true
            case "ProteinHit" =>
              for (id <- attr("id"); acc <- attr("accession")) proteinAcc(id) = acc
            case "UserParam" =>
              val name = attr("name").getOrElse("")
              val value = attr("value").getOrElse("")
              if (inSearchParameters && name.startsWith("SE:"))
                subEngines += name.stripPrefix("SE:")
              else if (inProteinIdentification && name == "spectra_data")
                // stringList rendering: "[a.mzML, b.mzML]"
                spectraData ++= value.stripPrefix("[").stripSuffix("]")
                  .split(",").map(_.trim).filter(_.nonEmpty)
            case "PeptideIdentification" =>
              nextId = parsePeptideId()
            case _ =>
          }
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "SearchParameters" => inSearchParameters = false
            case "ProteinIdentification" => inProteinIdentification = false
            case _ =>
          }
        case _ =>
      }
    }
    if (nextId == null) done = true
  }

  private def parsePeptideId(): IdXmlPeptideId = {
    val idx = pepCount
    pepCount += 1
    val rt = attr("RT").map(_.toDouble).getOrElse(0.0)
    val mz = attr("MZ").map(_.toDouble).getOrElse(0.0)
    val scoreType = attr("score_type").getOrElse("")
    val specRef = attr("spectrum_reference").getOrElse("")
    val hits = ArrayBuffer.empty[IdXmlHit]

    // current-hit state
    var hSeq = ""; var hCharge = 0; var hScore = 0.0
    var hRefs: Seq[String] = Nil; var hStarts: Seq[Int] = Nil; var hEnds: Seq[Int] = Nil
    var hTd: Option[String] = None
    var hPep, hCs, hMsQ, hQ: Option[Double] = None
    var inHit = false

    var depth = 1
    while (depth > 0 && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          depth += 1
          r.getLocalName match {
            case "PeptideHit" =>
              inHit = true
              hSeq = attr("sequence").getOrElse("")
              hCharge = attr("charge").map(_.toInt).getOrElse(0)
              hScore = attr("score").map(_.toDouble).getOrElse(0.0)
              hRefs = attr("protein_refs").map(_.split("\\s+").toSeq.filter(_.nonEmpty)).getOrElse(Nil)
              hStarts = attr("start").map(_.split("\\s+").toSeq.filter(_.nonEmpty).map(_.toInt)).getOrElse(Nil)
              hEnds = attr("end").map(_.split("\\s+").toSeq.filter(_.nonEmpty).map(_.toInt)).getOrElse(Nil)
              hTd = None; hPep = None; hCs = None; hMsQ = None; hQ = None
            case "UserParam" if inHit =>
              val name = attr("name").getOrElse("")
              val value = attr("value").getOrElse("")
              name match {
                case "target_decoy" => hTd = Some(value)
                case "Posterior Error Probability_score" => hPep = value.toDoubleOption
                case "consensus_support" => hCs = value.toDoubleOption
                case "MS:1001491" => hMsQ = value.toDoubleOption
                case "q-value" => hQ = value.toDoubleOption
                case _ =>
              }
            case _ =>
          }
        case XMLStreamConstants.END_ELEMENT =>
          depth -= 1
          if (r.getLocalName == "PeptideHit") {
            inHit = false
            hits += IdXmlHit(hSeq, hCharge, hScore, hTd, hPep, hCs, hMsQ, hQ,
              hRefs.map(ref => proteinAcc.getOrElse(ref, ref)), hStarts, hEnds)
          }
        case _ =>
      }
    }
    IdXmlPeptideId(idx, rt, mz, scoreType, specRef, hits.toList)
  }

  override def hasNext: Boolean = {
    if (nextId == null && !done) advance()
    nextId != null
  }

  override def next(): IdXmlPeptideId = {
    if (!hasNext) throw new NoSuchElementException
    val s = nextId
    nextId = null
    s
  }

  override def close(): Unit = { r.close(); in.close() }
}
