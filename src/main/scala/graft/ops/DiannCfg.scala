package graft.ops

import java.nio.file.{Files, Paths}

import scala.io.Source

/** `dianncfg`: enzyme + Unimod modification lookups → DIA-NN config text
  * (reference: dianncfg.py). A config-path operator: runs on the driver
  * against the bundled Unimod snapshot (src/main/resources/
  * unimod_snapshot.tsv — name/accession/monoisotopic-delta triples from the
  * public Unimod database), which is exactly the broadcast-lookup-table shape
  * (SURVEY S10/J9) at trivial size.
  */
object DiannCfg {

  /** UniMod:765 Met-loss at Protein N-term M → DIA-NN's --met-excision. */
  val MetLossModification = "UniMod:765,-131.040485,*nM"

  case class UnimodEntry(name: String, accession: String, deltaMonoMass: String)

  lazy val unimod: Seq[UnimodEntry] = {
    val in = getClass.getClassLoader.getResourceAsStream("unimod_snapshot.tsv")
    require(in != null, "unimod_snapshot.tsv missing from classpath")
    val src = Source.fromInputStream(in, "UTF-8")
    try src.getLines().drop(1).filter(_.nonEmpty).map { l =>
      val Array(n, a, m) = l.split("\t")
      UnimodEntry(n, a, m)
    }.toList
    finally src.close()
  }

  private lazy val byName: Map[String, UnimodEntry] = unimod.map(e => e.name -> e).toMap

  val enzymeSpecificity: Map[String, String] = Map(
    "Trypsin" -> "K*,R*,!*P",
    "Trypsin/P" -> "K*,R*",
    "Arg-C" -> "R*,!*P",
    "Asp-N" -> "*B,*D",
    "Chymotrypsin" -> "F*,W*,Y*,L*,!*P",
    "Lys-C" -> "K*,!*P")

  def enzymeCut(enzyme: Option[String]): String = enzyme match {
    case None => ""
    case Some(e) => enzymeSpecificity.getOrElse(e,
      throw new IllegalArgumentException(
        s"Unknown enzyme '$e'. Supported enzymes: ${enzymeSpecificity.keys.toList}"))
  }

  /** One "Name (site)" term → (accession-with-mass, rewritten site)
    * (dianncfg.py:79-144).
    */
  def getMod(mod: String, modType: String): (String, String) = {
    val name = mod.split(" ")(0)
    val entry = byName.getOrElse(name,
      throw new IllegalArgumentException(
        "Only Unimod modifications are currently supported for the DIA pipeline. " +
          s"Unsupported modification: $mod"))
    if (entry.name.contains("TMT") || entry.name.contains("Label:") ||
      entry.name.contains("iTRAQ") || entry.name.contains("mTRAQ") ||
      entry.name.contains("Dimethyl:"))
      throw new IllegalArgumentException(
        s"quantms DIA-NN workflow only supports LFQ now! Unsupported modifications: $mod")

    val accession = entry.accession.replace("UNIMOD:", "UniMod:") + "," + entry.deltaMonoMass
    val rest = mod.split(" ").drop(1).mkString(" ")
    val sites = "\\((.*?)\\)".r.findAllMatchIn(rest).map(_.group(1)).toList
    if (sites.isEmpty)
      throw new IllegalArgumentException(s"No site specification found in modification string: $mod")
    val site0 = sites.head
    val site = site0 match {
      case "Protein N-term" => "*n"
      case "N-term" => "n"
      case s if s.split(" ").length >= 2 =>
        val parts = s.split(" ")
        val pp = parts.dropRight(1).mkString(" ") match {
          case "Protein N-term" => "*n"
          case "N-term" => "n"
          case other => other
        }
        val combined = pp + parts.last
        if (combined == "*nM" && entry.name == "Met-loss" && modType == "var_mod") combined
        else throw new IllegalArgumentException(
          "Restricting to certain terminal AAs isn't directly supported.")
      case s => s
    }
    (accession, site)
  }

  /** Merge same-mod sites into sorted-set strings, first-seen mod order
    * (the A9 group-merge, dianncfg.py:147-171).
    */
  def convertMods(mods: Option[String], modType: String): Seq[String] = mods match {
    case None | Some("") => Nil
    case Some(s) =>
      val pairs = s.split(",").toSeq.map(m => getMod(m, modType))
      val order = pairs.map(_._1).distinct
      val merged = pairs.groupBy(_._1).view.mapValues(_.map(_._2))
      order.map(acc => s"$acc,${merged(acc).distinct.sorted.mkString("")}")
  }

  /** Render the config line (dianncfg.py:62-76). */
  def render(enzyme: Option[String], fixMod: Option[String], varMod: Option[String]): String = {
    val cut = enzymeCut(enzyme)
    val cutArg = if (cut.nonEmpty) s"--cut $cut" else ""
    val fixed = convertMods(fixMod, "fixed_mod").map(m => s" --fixed-mod $m").mkString
    val vars = convertMods(varMod, "var_mod").map {
      case MetLossModification => " --met-excision "
      case m => s" --var-mod $m"
    }.mkString
    cutArg + fixed + vars
  }

  /** CLI-shaped entry: write `diann_config.cfg`. */
  def run(enzyme: Option[String], fixMod: Option[String], varMod: Option[String],
          outDir: String = "."): String = {
    val target = s"$outDir/diann_config.cfg"
    Files.writeString(Paths.get(target), render(enzyme, fixMod, varMod))
    target
  }
}
