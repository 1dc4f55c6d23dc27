package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DIA-NN main-report reader (reference: diann2msstats.py:243-264).
  *
  * Format dispatch on the file suffix; schema-first column pruning (the
  * optional `Decoy`/`Channel` columns are selected only when present) and the
  * strict q-value filter are declared here so Catalyst pushes both into the
  * scan — at 100 TB the parquet reader never materializes the ~40 unused
  * report columns, and row groups failing `Q.Value < t` statistics are
  * skipped.
  */
object ReportReader {

  private val keep = Seq(
    "Run", "Protein.Names", "Modified.Sequence",
    "Precursor.Charge", "Precursor.Quantity", "Q.Value")

  def read(spark: SparkSession, path: String, qvalueThreshold: Double): DataFrame = {
    val isParquet = path.endsWith(".parquet")
    val raw =
      if (isParquet) spark.read.parquet(path)
      else spark.read.option("sep", "\t").option("header", true).csv(path)

    val optional = if (isParquet) Seq("Decoy", "Channel") else Seq("Decoy")
    val cols = keep ++ optional.filter(raw.columns.contains)

    val typed = raw
      .select(cols.map(c => col(s"`$c`")): _*)
      .withColumn("Precursor.Charge", col("`Precursor.Charge`").cast("int"))
      .withColumn("Precursor.Quantity", col("`Precursor.Quantity`").cast("double"))
      .withColumn("Q.Value", col("`Q.Value`").cast("double"))

    val withDecoy =
      if (cols.contains("Decoy")) typed.withColumn("Decoy", col("Decoy").cast("int"))
      else typed

    withDecoy.filter(col("`Q.Value`") < qvalueThreshold)
  }
}
