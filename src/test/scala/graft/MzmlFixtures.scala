package graft

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path}
import java.util.Base64
import java.util.zip.Deflater

/** Synthesizes mzML files with known spectra (FIXTURES.md §2.2): the real
  * test mzMLs are stripped large blobs, so parser tests run against files we
  * generate with exactly-known peak arrays, Thermo-style nativeIDs, and
  * precursor blocks.
  */
object MzmlFixtures {

  case class Spec(
      scan: Int,
      msLevel: Int,
      rtSeconds: Double,
      mz: Array[Double],
      intensity: Array[Double],
      precursor: Option[(Double, Int, Double)] = None, // (mz, charge, intensity)
      isoWindow: (Double, Double) = (1.0, 1.0),
      rtInMinutes: Boolean = false,
      encode64: Boolean = true,
      zlib: Boolean = true)

  def encode(values: Array[Double], is64: Boolean, zlib: Boolean): String = {
    val buf =
      if (is64) {
        val b = ByteBuffer.allocate(values.length * 8).order(ByteOrder.LITTLE_ENDIAN)
        values.foreach(b.putDouble); b.array()
      } else {
        val b = ByteBuffer.allocate(values.length * 4).order(ByteOrder.LITTLE_ENDIAN)
        values.foreach(v => b.putFloat(v.toFloat)); b.array()
      }
    val payload = if (zlib) deflate(buf) else buf
    Base64.getEncoder.encodeToString(payload)
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Public variant for specs crafting custom spectrum XML. */
  def binaryArrayPublic(values: Array[Double], kind: String): String =
    binaryArray(values, kind, is64 = true, zlib = true)

  private def binaryArray(values: Array[Double], kind: String, is64: Boolean,
                          zlib: Boolean): String = {
    val bits = if (is64) """<cvParam cvRef="MS" accession="MS:1000523" name="64-bit float"/>"""
    else """<cvParam cvRef="MS" accession="MS:1000521" name="32-bit float"/>"""
    val comp = if (zlib) """<cvParam cvRef="MS" accession="MS:1000574" name="zlib compression"/>"""
    else """<cvParam cvRef="MS" accession="MS:1000576" name="no compression"/>"""
    val kindParam = kind match {
      case "mz" => """<cvParam cvRef="MS" accession="MS:1000514" name="m/z array"/>"""
      case _ => """<cvParam cvRef="MS" accession="MS:1000515" name="intensity array"/>"""
    }
    s"""<binaryDataArray encodedLength="0">$bits$comp$kindParam<binary>${encode(values, is64, zlib)}</binary></binaryDataArray>"""
  }

  def spectrumXml(i: Int, s: Spec): String = {
    val rtValue = if (s.rtInMinutes) s.rtSeconds / 60.0 else s.rtSeconds
    val rtUnit = if (s.rtInMinutes)
      """unitAccession="UO:0000031" unitName="minute""""
    else """unitAccession="UO:0000010" unitName="second""""
    val precursorXml = s.precursor.map { case (pmz, z, pint) =>
      val intParam = if (pint > 0)
        s"""<cvParam cvRef="MS" accession="MS:1000042" name="peak intensity" value="$pint"/>"""
      else ""
      s"""<precursorList count="1"><precursor>
         |<isolationWindow>
         |<cvParam cvRef="MS" accession="MS:1000827" name="isolation window target m/z" value="$pmz"/>
         |<cvParam cvRef="MS" accession="MS:1000828" name="isolation window lower offset" value="${s.isoWindow._1}"/>
         |<cvParam cvRef="MS" accession="MS:1000829" name="isolation window upper offset" value="${s.isoWindow._2}"/>
         |</isolationWindow>
         |<selectedIonList count="1"><selectedIon>
         |<cvParam cvRef="MS" accession="MS:1000744" name="selected ion m/z" value="$pmz"/>
         |<cvParam cvRef="MS" accession="MS:1000041" name="charge state" value="$z"/>
         |$intParam
         |</selectedIon></selectedIonList>
         |<activation/>
         |</precursor></precursorList>""".stripMargin
    }.getOrElse("")
    s"""<spectrum index="$i" id="controllerType=0 controllerNumber=1 scan=${s.scan}" defaultArrayLength="${s.mz.length}">
       |<cvParam cvRef="MS" accession="MS:1000511" name="ms level" value="${s.msLevel}"/>
       |<scanList count="1"><scan>
       |<cvParam cvRef="MS" accession="MS:1000016" name="scan start time" value="$rtValue" $rtUnit/>
       |</scan></scanList>
       |$precursorXml
       |<binaryDataArrayList count="2">
       |${binaryArray(s.mz, "mz", s.encode64, s.zlib)}
       |${binaryArray(s.intensity, "intensity", s.encode64, s.zlib)}
       |</binaryDataArrayList>
       |</spectrum>""".stripMargin
  }

  def write(path: Path, specs: Seq[Spec],
            startTimeStamp: String = "2024-03-01T10:15:30Z"): Path = {
    val body = specs.zipWithIndex.map { case (s, i) => spectrumXml(i, s) }.mkString("\n")
    val xml =
      s"""<?xml version="1.0" encoding="utf-8"?>
         |<indexedmzML xmlns="http://psi.hupo.org/ms/mzml">
         |<mzML xmlns="http://psi.hupo.org/ms/mzml" version="1.1.0">
         |<run id="run0" startTimeStamp="$startTimeStamp">
         |<spectrumList count="${specs.length}" defaultDataProcessingRef="dp">
         |$body
         |</spectrumList>
         |</run>
         |</mzML>
         |</indexedmzML>""".stripMargin
    Files.writeString(path, xml)
    path
  }

  /** The standard small experiment used across specs:
    *  - scan 1: MS1, 4 peaks (the purity parent)
    *  - scan 2: MS2 of 500.0 z=2 (annotated intensity 0 → purity fallback)
    *  - scan 3: MS2 with annotated precursor intensity
    *  - scan 4: MS3 (skipped by ms_info)
    *  - scan 5: MS1 with zero peaks (null base/summed)
    *  - scan 6: MS2 in minutes RT with 32-bit uncompressed arrays
    */
  def standard(dir: Path, name: String = "sample.mzML"): Path = {
    val specs = Seq(
      // 499.3 sits away from every isotope position of 500.0 z=2 (the
      // nearest, k=-2 → 498.9966 and k=-1 → 499.4983, are >100 ppm off) so
      // it counts in total but not target purity
      Spec(1, 1, 10.0,
        Array(499.3, 500.0, 500.5, 501.0), Array(50.0, 100.0, 30.0, 20.0)),
      Spec(2, 2, 11.0, Array(101.0, 102.0, 103.0), Array(5.0, 6.0, 7.0),
        precursor = Some((500.0, 2, 0.0))),
      Spec(3, 2, 12.0, Array(201.0, 202.0), Array(9.0, 11.0),
        precursor = Some((500.5, 3, 777.0))),
      Spec(4, 3, 13.0, Array(51.0), Array(1.0)),
      Spec(5, 1, 14.0, Array.emptyDoubleArray, Array.emptyDoubleArray),
      Spec(6, 2, 900.0, Array(301.0), Array(3.0),
        precursor = Some((501.0, 0, 0.0)), rtInMinutes = true,
        encode64 = false, zlib = false))
    write(dir.resolve(name), specs)
  }
}
