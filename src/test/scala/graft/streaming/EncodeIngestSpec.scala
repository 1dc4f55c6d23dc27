package graft.streaming

import graft.SparkSpec

/** Batch ≡ stream pin for encode-at-ingest: the streamed per-row PQ/OPQ
  * encode (literal-codebook argmin projection inside a file-source
  * stream) must land on EXACTLY the code table the batch shared stages
  * produce (`pqCodesShared` / `opqCodesShared`) — same (vec_id, sub,
  * c_id) set, same tie rule (lower c_id on equal d2, via the
  * struct-ordered array_min). The DuckDB oracle independently re-derives
  * the same table from raw parquet; this spec pins the INTERNAL
  * consistency the oracle can't see: one quantizer, two execution
  * shapes, zero drift.
  */
class EncodeIngestSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def asSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Int)] =
    df.selectExpr("cast(vec_id as long)", "cast(sub as int)", "cast(c_id as int)")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet

  test("streamed raw-PQ encode equals the batch code table") {
    val batch = asSet(graft.queries.Similarity.pqCodesShared(spark, dir))
    val streamed = asSet(EncodeIngest.pq(spark, dir))
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("streamed IVF-PQ index equals the batch cell⋈codes join") {
    import org.apache.spark.sql.functions.col
    val batch = graft.queries.Similarity.ivfpqCellsShared(spark, dir)
      .join(graft.queries.Similarity.pqCodesShared(spark, dir), Seq("vec_id"))
      .selectExpr("cast(vec_id as long)", "cast(cell as int)",
        "cast(sub as int)", "cast(c_id as int)")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet
    val streamed = EncodeIngest.ivfpq(spark, dir)
      .selectExpr("cast(vec_id as long)", "cast(cell as int)",
        "cast(sub as int)", "cast(c_id as int)")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet
    assert(streamed.nonEmpty)
    assert(streamed === batch)
    // every vector routes to exactly ONE cell
    val cellsPerVec = streamed.groupBy(_._1).view.mapValues(_.map(_._2).toSet.size).toMap
    assert(cellsPerVec.values.toSet === Set(1))
  }

  test("two-source fan-in leaves no trace: equals the single-source code table") {
    val single = asSet(EncodeIngest.pq(spark, dir))
    val fanIn = asSet(EncodeIngest.pqFanIn(spark, dir))
    assert(fanIn === single)
  }

  test("streamed OPQ rotate+encode equals the batch rotated code table") {
    val batch = asSet(graft.queries.Similarity.opqCodesShared(spark, dir))
    val streamed = asSet(EncodeIngest.opq(spark, dir))
    assert(streamed.nonEmpty)
    assert(streamed === batch)
    // every vector carries exactly 8 subspace codes — the projection
    // never drops or duplicates a subspace
    val perVec = streamed.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perVec.values.toSet === Set(8))
  }

  test("streamed rotated probe equals the batch rotated-ADC top-5") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // batch side rebuilt from the PUBLIC shared stages: per-probe LUT in
    // the rotated space joined onto the rotated code table, exact BIGINT
    // ADC totals, same (adc_u, vec_id) rank rule
    val lut = graft.queries.Similarity.opqXuShared(spark, dir)
      .filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("sub"), col("wd"), col("xu").as("qu"))
      .join(broadcast(graft.queries.Similarity.opqCentsShared(spark, dir)),
        Seq("sub", "wd"))
      .groupBy(col("q_id"), col("sub"), col("c_id"))
      .agg(sum((col("qu") - col("cu")) * (col("qu") - col("cu"))).as("d2"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("adc_u"), col("vec_id"))
    val batch = graft.queries.Similarity.opqCodesShared(spark, dir)
      .join(broadcast(lut), Seq("sub", "c_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("d2")).as("adc_u"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .select(col("q_id"), col("vec_id"), col("rank"))
      .collect().map(_.toString).sorted.toSeq
    val streamed = ProbeStream.opqTop5(spark, dir)
      .select(col("q_id"), col("vec_id"), col("rank"))
      .collect().map(_.toString).sorted.toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("probe latency counters: one row per data batch, timing contract holds") {
    // the batch-count contract: the parity-split staging yields EXACTLY
    // two data batches (maxFilesPerTrigger=1 over two part files), each
    // with its split's probe count, and every batch satisfies the
    // progress-event timing invariants — phases present, addBatch nested
    // inside triggerExecution, no negative durations. Raw milliseconds
    // are intentionally absent from the output (un-oracle-able).
    val rows = ProbeStream.adcLatency(spark, dir).collect()
      .map(r => (r.getAs[Int]("batch_ord"), r.getAs[Long]("input_rows"),
        r.getAs[Boolean]("phases_reported"),
        r.getAs[Boolean]("addbatch_within_trigger"),
        r.getAs[Boolean]("durations_nonneg")))
      .sortBy(_._1)
    assert(rows.length === 2, s"expected 2 data batches, got $rows")
    assert(rows.map(_._1).toSeq === Seq(0, 1))
    assert(rows.map(_._2).sum === 10L, s"parity split lost probes: $rows")
    rows.foreach { case (ord, _, phases, nested, nonneg) =>
      assert(phases, s"batch $ord missing canonical phases")
      assert(nested, s"batch $ord addBatch exceeds triggerExecution")
      assert(nonneg, s"batch $ord negative duration")
    }
  }
}
