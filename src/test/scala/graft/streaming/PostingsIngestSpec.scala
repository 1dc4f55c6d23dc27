package graft.streaming

import graft.SparkSpec

/** Batch ≡ stream pin for the lexical encode-at-ingest: the per-row
  * posting-ization inside the stream (explode-distinct + HOF count, no
  * streaming aggregation) must produce EXACTLY the batch posting table —
  * same (doc_id, term, tf) set — and the bucket routing must follow the
  * batch md5 rule. The inventory oracle pins per-bucket counts; this
  * spec pins the full set, row for row.
  */
class PostingsIngestSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("streamed per-row postings equal the batch posting table exactly") {
    import org.apache.spark.sql.functions._
    // the streamed layout, re-derived: run the inventory query's staging
    // path but read back the full rows via a fresh stream drain
    val staged = java.nio.file.Files.createTempDirectory("postings-spec-src")
    val out = java.nio.file.Files.createTempDirectory("postings-spec-idx")
    val cp = java.nio.file.Files.createTempDirectory("postings-spec-cp")
    try {
      val docs = graft.tables.Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"))
      StagedEvents.writePart(docs.filter(col("doc_id") % 2 === 0),
        staged, "b0_docs.parquet", 60)
      StagedEvents.writePart(docs.filter(col("doc_id") % 2 === 1),
        staged, "b1_docs.parquet", 45)
      val schema =
        spark.read.parquet(staged.resolve("b0_docs.parquet").toString).schema
      val postings = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staged.toString)
        .select(col("doc_id"),
          filter(split(trim(col("text")), "\\s+"), t => length(t) > 0).as("t"))
        .select(col("doc_id"), col("t"),
          explode(array_distinct(col("t"))).as("term"))
        .select(col("doc_id"), col("term"),
          size(filter(col("t"), x => x === col("term"))).cast("long").as("tf"))
      val q = postings.writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", cp.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()

      val streamed = spark.read.parquet(out.toString)
        .select(col("doc_id"), col("term"), col("tf"))
        .collect().map(_.toString).sorted.toSeq
      val batch = graft.queries.TextOps.postingsShared(spark, dir)
        .select(col("doc_id"), col("term"), col("tf").cast("long"))
        .collect().map(_.toString).sorted.toSeq
      assert(streamed.nonEmpty)
      assert(streamed === batch)
    } finally {
      StagedEvents.deleteRecursively(staged)
      StagedEvents.deleteRecursively(out)
      StagedEvents.deleteRecursively(cp)
    }
  }
}
