package graft

import org.apache.spark.sql.functions._

/** Source/sink format breadth: the same table written and re-read through
  * each bundled columnar/text format must survive byte-identically. A
  * training-data pipeline at 100 TB holds its corpus in parquet or ORC and
  * exchanges samples/diagnostics as JSON/CSV; this pins that every leg
  * round-trips (schema and values) so format choice is a layout decision,
  * not a correctness one.
  */
class FormatRoundTripSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def canon(df: org.apache.spark.sql.DataFrame): Array[String] =
    df.select(col("doc_id"), col("text"), col("lang"), col("source"),
      col("n_chars").cast("long").as("n_chars"))
      .collect().map(_.toString).sorted

  test("documents round-trip identically through ORC, JSON, and CSV") {
    import graft.tables.Tables._
    val base = documents(spark, sf)
    val expected = canon(base)
    val dir = java.nio.file.Files.createTempDirectory("fmt").toString

    base.write.mode("overwrite").orc(s"$dir/docs.orc")
    assert(canon(spark.read.orc(s"$dir/docs.orc")).sameElements(expected))

    base.write.mode("overwrite").json(s"$dir/docs.json")
    // JSON carries no schema: re-read with the writer's schema (the same
    // contract Verify's oracle dump relies on for parquet)
    assert(canon(spark.read.schema(base.schema).json(s"$dir/docs.json"))
      .sameElements(expected))

    // CSV needs quoting/escaping for free text — the default quote-all-
    // special-chars writer must round-trip embedded delimiters and newlines
    base.write.mode("overwrite").option("header", "true").option("escape", "\"")
      .csv(s"$dir/docs.csv")
    assert(canon(spark.read.schema(base.schema).option("header", "true")
      .option("escape", "\"").csv(s"$dir/docs.csv")).sameElements(expected))
  }
}
