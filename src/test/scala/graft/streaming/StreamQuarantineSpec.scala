package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The streamed quarantine's two contracts beyond its DuckDB oracle:
  * the audit cross-pins the BATCH quarantine's documents rows (detect
  * and route agree check for check), and the routed counts equal the
  * cumulative edge-expectation verdicts (the detect→route closure —
  * what the counters alarm on is exactly what landed in the sink).
  */
class StreamQuarantineSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("streamed quarantine audit equals the batch quarantine's documents rows") {
    val streamed = StreamQuarantine.audit(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val batch = graft.SparkEntry.queries("diag_quarantine")(spark, sf)
      .filter(col("tbl") === "documents")
      .select(col("check_name"), col("severity"), col("n_rows"),
        col("min_key"), col("max_key"))
      .collect().map(_.toString).sorted.toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty, "quarantine vacuously empty at fixture scale")
  }

  test("routed row counts equal the edge-expectation verdict counters") {
    val routed = StreamQuarantine.audit(spark, sf)
      .select(col("check_name"), col("n_rows"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val verdicts = StreamExpectations.verdicts(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    verdicts.foreach { case (check, n) =>
      assert(routed.getOrElse(check, 0L) === n,
        s"$check: routed ${routed.getOrElse(check, 0L)} vs verdict $n")
    }
  }

  test("a replayed batchId replaces nothing: sink contents identical, no duplicates") {
    // the foreachBatch retry contract: Spark re-runs a failed micro-batch
    // with the SAME batchId. The sink must converge to the same table,
    // not append a second copy of every reject row.
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("idem-sink").toString
    try {
      val b = Seq(("7", "text_len_ge_60", "error"), ("9", "text_nonblank", "error"))
        .toDF("row_key", "check_name", "severity")
      assert(IdempotentBatchSink.commit(b, root, 0L, Seq("check_name")),
        "first delivery must perform the commit")
      def snapshot(): Seq[String] =
        spark.read.parquet(root).collect().map(_.toString).sorted.toSeq
      val first = snapshot()
      assert(first.size == 2)
      // the retry delivers the same batchId (possibly a recomputed frame)
      assert(!IdempotentBatchSink.commit(b, root, 0L, Seq("check_name")),
        "a replayed batchId must be a no-op")
      assert(snapshot() === first, "replay duplicated or mutated the sink")
      // a NEW batchId still lands
      val b1 = Seq(("11", "text_len_ge_100", "warn"))
        .toDF("row_key", "check_name", "severity")
      assert(IdempotentBatchSink.commit(b1, root, 1L, Seq("check_name")))
      assert(snapshot().size == 3)
    } finally StagedEvents.deleteRecursively(java.nio.file.Paths.get(root))
  }
}
