package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The streamed contamination gate's contracts beyond its DuckDB oracle:
  * the verdicts partition each source's documents, and the Bloom's
  * one-sidedness holds — every doc that is EXACTLY contaminated (≥50% of
  * its distinct 4-gram shingles genuinely in the eval corpus's shingle
  * set) must be routed contam; false positives may add to the pile but
  * can never subtract (a truly-covered shingle's positions are all set by
  * construction, so nc_bloom ≥ nc_true row by row).
  */
class ContamGateSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def h(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  private def shingleFrame(df: org.apache.spark.sql.DataFrame, idCol: String) =
    df.select(col(idCol),
        split(trim(col("text")), "\\s+").as("t"))
      .select(col(idCol), explode(array_distinct(when(size(col("t")) >= 4,
        expr("transform(sequence(1, size(t) - 3), i -> array_join(slice(t, i, 4), ' '))"))
        .otherwise(array()))).as("s"))

  test("gate verdicts partition each source; exact contamination never escapes") {
    val audit = ContamGate.audit(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(audit.nonEmpty)
    assert(audit.keys.exists(_._2 == "contam") && audit.keys.exists(_._2 == "clean"),
      "both verdicts must occur — the planted verbatim slice guarantees contam")

    val docs = graft.tables.Tables.documents(spark, sf)
    val bySource = docs.groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    bySource.foreach { case (src, n) =>
      val routed = audit.getOrElse((src, "contam"), 0L) +
        audit.getOrElse((src, "clean"), 0L)
      assert(routed == n, s"source $src: routed $routed of $n docs")
    }

    // the exact (no-Bloom) per-source contamination floor: ≥50% of a
    // doc's distinct shingles semi-join into the eval shingle set
    val evSet = shingleFrame(
      spark.read.parquet(graft.queries.TextOps.evalCorpusDir(spark, sf))
        .select(col("eval_id"), col("text")), "eval_id")
      .select(h(col("s")).as("hh")).distinct()
    val dSh = shingleFrame(docs.select(col("doc_id"), col("text")), "doc_id")
      .select(col("doc_id"), h(col("s")).as("hh"))
    val tot = dSh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val nc = dSh.join(evSet, Seq("hh"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("nc"))
    val exact = tot.join(nc, Seq("doc_id"))
      .filter(col("nc") * 2 >= col("n_sh"))
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.values.sum > 0, "no exactly-contaminated doc — pin is vacuous")
    exact.foreach { case (src, n) =>
      assert(audit.getOrElse((src, "contam"), 0L) >= n,
        s"source $src: gate flagged ${audit.getOrElse((src, "contam"), 0L)} " +
          s"< exact floor $n — a Bloom false NEGATIVE, impossible by construction")
    }
  }
}
