package graft.sources.idxml

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 "idxml" source (SURVEY §2.1 S2): one row per
  * PeptideIdentification, hits nested as an array of structs (exploded
  * downstream with the built-in `explode` — no custom Generator needed,
  * SURVEY §2.10). Run-level fields (search engines, spectra_data-derived
  * reference file name) are replicated onto every row, where they compress
  * to nothing in parquet and act as literals in the plan.
  *
  * One InputPartition per file, like the mzml source.
  */
class IdXmlDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = IdXmlTable.schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new IdXmlTable(new CaseInsensitiveStringMap(properties))
}

object IdXmlTable {
  val hitType: StructType = StructType(Seq(
    StructField("sequence", StringType),
    StructField("charge", IntegerType),
    StructField("score", DoubleType),
    StructField("target_decoy", StringType),
    StructField("posterior_error_probability", DoubleType),
    StructField("consensus_support", DoubleType),
    StructField("ms_qvalue", DoubleType),
    StructField("meta_qvalue", DoubleType),
    StructField("protein_accessions", ArrayType(StringType, containsNull = false)),
    StructField("protein_starts", ArrayType(IntegerType, containsNull = false)),
    StructField("protein_ends", ArrayType(IntegerType, containsNull = false)),
  ))

  val schema: StructType = StructType(Seq(
    StructField("file_name", StringType, nullable = false),
    StructField("pep_index", IntegerType, nullable = false),
    StructField("rt", DoubleType, nullable = false),
    StructField("mz", DoubleType, nullable = false),
    StructField("score_type", StringType),
    StructField("spectrum_reference", StringType),
    StructField("hits", ArrayType(hitType, containsNull = false)),
    StructField("search_engines", ArrayType(StringType, containsNull = false)),
    StructField("reference_file_name", StringType),
  ))
}

class IdXmlTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  import graft.sources.mzml.MzmlTable.resolvePaths
  override def name(): String = s"idxml(${resolvePaths(options).mkString(",")})"
  override def schema(): StructType = IdXmlTable.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new CaseInsensitiveStringMap((options.asScala ++ opts.asScala).asJava)
    new ScanBuilder with SupportsPushDownRequiredColumns {
      private var required: StructType = IdXmlTable.schema
      // honor top-level pruning only: nested pruning would hand us a
      // narrowed `hits` struct the row builder doesn't emit — report the
      // full field back and let Spark project
      override def pruneColumns(s: StructType): Unit = {
        val keep = s.fieldNames.toSet
        required = StructType(IdXmlTable.schema.fields.filter(f => keep.contains(f.name)))
      }
      override def build(): Scan = new IdXmlScan(resolvePaths(merged), required)
    }
  }
}

class IdXmlScan(paths: Seq[String], required: StructType) extends Scan with Batch {
  import graft.sources.SourceEnv
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    SourceEnv.expand(paths, ".idxml",
        org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())
      .map(p => IdXmlInputPartition(p): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new IdXmlReaderFactory(required, SourceEnv.hadoopConfMap())
}

case class IdXmlInputPartition(path: String) extends InputPartition

class IdXmlReaderFactory(required: StructType, confMap: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new IdXmlPartitionReader(
      partition.asInstanceOf[IdXmlInputPartition].path, required, confMap)
}

class IdXmlPartitionReader(path: String, required: StructType, confMap: Map[String, String])
    extends PartitionReader[InternalRow] {

  private val hPath = new Path(path)
  private val fs = hPath.getFileSystem(graft.sources.SourceEnv.toConf(confMap))
  private val parser = new IdXmlParser(fs.open(hPath))
  private val fileName = UTF8String.fromString(hPath.getName)
  private var current: IdXmlPeptideId = _

  private val ord: Map[String, Int] =
    IdXmlTable.schema.fieldNames.map(n => n -> required.fieldNames.indexOf(n)).toMap

  /** search_engines per the reference dispatch (psm_conversion.py:96-104):
    * ConsensusID → its SE:* sub-engines, else the run's engine. The three
    * engines the reference scores (MS-GF+, Comet, Sage) keep their
    * canonical order; any OTHER sub-engine follows in file order rather
    * than being dropped — provenance is never silently lost.
    * (Known divergence: files with multiple IdentificationRuns stamp every
    * row with the first run's engine — one run per file is the reference's
    * own contract, one idXML per search.)
    */
  private lazy val searchEngines: Seq[String] = {
    val info = parser.runInfo
    if (info.searchEngine.contains("ConsensusID")) {
      val known = Seq("MS-GF+", "Comet", "Sage").filter(info.consensusSubEngines.contains)
      known ++ info.consensusSubEngines.filterNot(known.contains)
    } else Seq(info.searchEngine)
  }

  /** First spectra_data entry minus its extension (os.path.splitext
    * semantics: directory kept), psm_conversion.py:106-108.
    */
  private lazy val referenceFileName: Option[String] =
    parser.runInfo.spectraData.headOption.map(_.replaceAll("\\.[^./]*$", ""))

  override def next(): Boolean = {
    if (parser.hasNext) { current = parser.next(); true } else false
  }

  override def get(): InternalRow = {
    val row = new GenericInternalRow(required.length)
    def set(name: String, v: Any): Unit = {
      val i = ord(name)
      if (i >= 0) row.update(i, v)
    }
    val s = current
    set("file_name", fileName)
    set("pep_index", s.index)
    set("rt", s.rt)
    set("mz", s.mz)
    set("score_type", UTF8String.fromString(s.scoreType))
    set("spectrum_reference", UTF8String.fromString(s.spectrumReference))
    set("hits", new GenericArrayData(s.hits.map(hitRow).toArray[Any]))
    set("search_engines",
      new GenericArrayData(searchEngines.map(UTF8String.fromString).toArray[Any]))
    set("reference_file_name",
      referenceFileName.map(UTF8String.fromString).orNull)
    row
  }

  private def hitRow(h: IdXmlHit): InternalRow = {
    val r = new GenericInternalRow(IdXmlTable.hitType.length)
    r.update(0, UTF8String.fromString(h.sequence))
    r.update(1, h.charge)
    r.update(2, h.score)
    r.update(3, h.targetDecoy.map(UTF8String.fromString).orNull)
    r.update(4, h.posteriorErrorProbability.map(java.lang.Double.valueOf).orNull)
    r.update(5, h.consensusSupport.map(java.lang.Double.valueOf).orNull)
    r.update(6, h.msQValue.map(java.lang.Double.valueOf).orNull)
    r.update(7, h.qValue.map(java.lang.Double.valueOf).orNull)
    r.update(8, new GenericArrayData(h.proteinAccessions.map(UTF8String.fromString).toArray[Any]))
    r.update(9, ArrayData.toArrayData(h.proteinStarts.toArray))
    r.update(10, ArrayData.toArrayData(h.proteinEnds.toArray))
    r
  }

  override def close(): Unit = parser.close()
}
