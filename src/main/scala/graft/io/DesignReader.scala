package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.functions.Peptides

/** Experimental-design tables.
  *
  * @param samples `Sample, MSstats_Condition, MSstats_BioReplicate`
  * @param files   `Fraction, Sample, run` (+ `Spectra_Filepath`/`Filename`,
  *                `Label` when multiplexed) — one row per raw file
  */
case class DesignTables(samples: DataFrame, files: DataFrame)

/** Readers for the two on-disk experimental-design formats
  * (reference: diann2msstats.py:141-240).
  *
  * Design files are a handful of rows of run metadata, so they are parsed on
  * the driver and become broadcast-sized DataFrames — at cluster scale these
  * are the small side of every join, never shuffled.
  */
object DesignReader {

  /** Normalized design-file lines (CRLF/CR → LF, trailing EOF empties
    * dropped so only a true blank line between tables registers as empty —
    * matching Python readlines semantics).
    */
  private def readLines(path: String): Vector[String] = {
    val all = new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8)
      .replace("\r\n", "\n").replace("\r", "\n")
      .split("\n", -1).toVector
    all.reverse.dropWhile(_.isEmpty).reverse
  }

  /** Format sniff on the header line (diann2msstats.py:149-150): unified iff
    * it carries Condition + BioReplicate + Filename.
    */
  def read(spark: SparkSession, path: String): DesignTables = {
    val header = readLines(path).headOption.getOrElse("")
    if (header.contains("Condition") && header.contains("BioReplicate") &&
      header.contains("Filename")) readUnified(spark, path)
    else readLegacy(spark, path)
  }

  /** Unified flat TSV from convert-diann (diann2msstats.py:158-219). */
  def readUnified(spark: SparkSession, path: String): DesignTables = {
    val df = spark.read
      .option("sep", "\t").option("header", true)
      .csv(path)

    val required = Seq("Filename", "Fraction", "Sample", "Condition", "BioReplicate")
    val missing = required.filterNot(df.columns.contains)
    if (missing.nonEmpty)
      throw new IllegalArgumentException(
        s"Unified design file is missing required columns: ${missing.sorted.mkString(", ")}. " +
          s"Expected: ${required.sorted.mkString(", ")}")

    val withRun = df.withColumn("run", Peptides.trueStem(col("Filename")))

    val multiplexed = df.columns.contains("Label") &&
      withRun.agg(countDistinct(col("Label"))).head().getLong(0) > 1

    val files =
      if (multiplexed) {
        // whole-value SILAC / mTRAQ label replacement (diann2msstats.py:182-199)
        // null-safe: an empty Label cell is null here (pandas astype(str)
        // would have made it "nan"); it can't match either label family
        val labels = withRun.select(lower(col("Label"))).distinct().collect()
          .map(_.getString(0)).filter(_ != null)
        val silac = labels.exists(_.contains("silac"))
        val mtraq = labels.exists(_.contains("mtraq"))
        val silacMap = Map("SILAC light" -> "L", "SILAC medium" -> "M", "SILAC heavy" -> "H")
        val mtraqMap = Map("MTRAQ0" -> "0", "MTRAQ4" -> "4", "MTRAQ8" -> "8")
        val mapped0 = if (silac) silacMap.foldLeft(col("Label")) { case (c, (k, v)) =>
          when(c === k, v).otherwise(c)
        } else col("Label")
        val mapped = if (mtraq) mtraqMap.foldLeft(mapped0) { case (c, (k, v)) =>
          when(c === k, v).otherwise(c)
        } else mapped0
        withRun.withColumn("Label", mapped)
          .select("Filename", "Fraction", "Sample", "run", "Label")
      } else withRun.select("Filename", "Fraction", "Sample", "run")

    // each Sample must map to exactly one (Condition, BioReplicate)
    val mapping = withRun.select("Sample", "Condition", "BioReplicate").distinct()
    val dupSamples = mapping.groupBy("Sample").count().filter(col("count") > 1)
      .select("Sample").collect().map(_.get(0).toString)
    if (dupSamples.nonEmpty)
      throw new IllegalArgumentException(
        s"Inconsistent experimental design: Sample(s) ${dupSamples.sorted.mkString(", ")} " +
          "map to multiple (Condition, BioReplicate) combinations.")

    val samples = mapping
      .withColumnRenamed("Condition", "MSstats_Condition")
      .withColumnRenamed("BioReplicate", "MSstats_BioReplicate")

    DesignTables(samples, files)
  }

  /** Legacy two-tables-in-one-file format: file table, blank line, sample
    * table (diann2msstats.py:222-240). All columns string-typed, as in the
    * reference's split-and-DataFrame parse.
    */
  def readLegacy(spark: SparkSession, path: String): DesignTables = {
    val lines = readLines(path)
    val sep = lines.indexWhere(_.isEmpty)
    if (sep < 0)
      throw new IllegalArgumentException(
        s"Could not find blank separator row in $path. Ensure the file contains " +
          "a blank line between the file and sample tables.")

    def table(header: String, rows: Seq[String]): DataFrame = {
      val cols = header.split("\t", -1)
      val schema = StructType(cols.map(StructField(_, StringType)))
      val data = rows.filter(_.nonEmpty).map(l => Row.fromSeq(l.split("\t", -1).toSeq))
      spark.createDataFrame(data.asJava, schema)
    }

    val files = table(lines.head, lines.slice(1, sep))
      .withColumn("run", Peptides.trueStem(col("Spectra_Filepath")))
    val samples = table(lines(sep + 1), lines.drop(sep + 2))
    DesignTables(samples, files)
  }
}
