package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming PQ/OPQ ENCODE-AT-INGEST — the index-build pipeline the
  * batch-side shared code tables simulate, made a real streaming query:
  * vectors arrive in micro-batches and each is (optionally rotated and)
  * product-quantized to its 8 subspace codes INSIDE the stream, as a pure
  * stateless projection — no stateful operator, no watermark, no shuffle.
  * The drained append-sink table is the full (vec_id, sub, c_id) code
  * table, oracled against the same DuckDB train/encode replay as the
  * batch queries, and spec-pinned equal to the batch
  * `pqCodesShared`/`opqCodesShared` frames.
  *
  * Design for scale: the codebook is train-once-batch-side (8×16×8 =
  * 1024 cells — collected to the driver and embedded as a DATA literal in
  * the projection, the streaming analogue of a broadcast join against a
  * static dim); the per-row encode is an argmin fold over the literal
  * (strict less-than keeps the first = lowest c_id on ties, the batch
  * [[graft.queries.Similarity]] `pqAssign` rule). A 1000-executor ingest
  * runs exactly this shape: no state, no coordination, each micro-batch
  * encodes embarrassingly parallel.
  *
  * Staging: the embeddings corpus enters as four mod-time-ordered files
  * (vec_id % 4 ring) drained with maxFilesPerTrigger=1 — four
  * micro-batches, so the spec can also pin that codes stream out
  * incrementally rather than in one degenerate batch.
  */
object EncodeIngest {

  /** The codebook as a DATA literal — array<struct<sub, c_id, cu[8]>>,
    * c_id ascending within each sub (the tie order). The first cut
    * UNROLLED the 8×16×8 arithmetic into ~1024 expression terms instead:
    * that tree serialized as a ~2 MiB task binary and, worse, the
    * generated Java for the Generate node blew past janino's method
    * limits (19 codegen failures per bench sweep, interpreted fallback).
    * As data + higher-order folds the expression tree is constant-size,
    * codegen survives, and the arithmetic is bit-identical.
    */
  private[streaming] def centsLit(cents: IndexedSeq[Seq[(Int, Array[Long])]]): Column =
    array(cents.indices.flatMap { sub =>
      cents(sub).map { case (cid, cus) =>
        struct(lit(sub).as("sub"), lit(cid).as("c_id"),
          array(cus.toSeq.map(lit): _*).as("cu"))
      }
    }: _*)

  /** Integer L2² between an 8-slot slice of `xuArr` (starting at
    * `start`, 1-based) and the centroid coordinates `cu` — one zip_with
    * fold, exact BIGINT.
    */
  private[streaming] def sliceD2(xuArr: Column, start: Column, cu: Column): Column =
    aggregate(
      zip_with(slice(xuArr, start, lit(8)), cu, (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)

  /** Fold an array of (d2-able) candidate structs to the argmin struct —
    * strict less-than keeps the FIRST candidate on ties, so an array
    * ordered by ascending id replays the batch (d2, id)-ascending rule.
    */
  private def argminFold(cands: Column, d2Of: Column => Column,
      idOf: Column => Column): Column =
    aggregate(cands,
      struct(lit(Long.MaxValue).as("d2"), lit(-1).as("id")),
      (acc, c) => {
        val d2 = d2Of(c)
        when(d2 < acc.getField("d2"),
          struct(d2.as("d2"), idOf(c).as("id"))).otherwise(acc)
      }).getField("id")

  /** Per-row code array: for each subspace, argmin_c Σ_wd (xu − cu)² over
    * the literal codebook, ties to the lower c_id. `xuArr` must be the
    * 64-long integer micro-unit coordinate array in (sub·8 + wd) order.
    */
  private[graft] def codeStructs(
      xuArr: Column, cents: IndexedSeq[Seq[(Int, Array[Long])]]): Column = {
    val cl = centsLit(cents)
    transform(sequence(lit(0), lit(cents.size - 1)), sub =>
      struct(sub.cast("int").as("sub"),
        argminFold(filter(cl, c => c.getField("sub") === sub),
          c => sliceD2(xuArr, sub * 8 + 1, c.getField("cu")),
          c => c.getField("c_id")).as("c_id")))
  }

  /** Raw-space coordinates in integer micro-units, dim order — the
    * streaming copy of the batch pqXu arithmetic (round(x·1e6) as long).
    */
  private def rawXu(v: Column): Column =
    transform(v, x => round(x * 1000000).cast("long"))

  /** OPQ-rotated coordinates — the batch opqXu arithmetic (dot against
    * the literal basis, minus the folded mean offset, rounded once).
    */
  private[streaming] def rotatedXu(
      v: Column, basis: Seq[Array[Double]], mean: Array[Double]): Column = {
    val bLit = array(basis.map(vj => array(vj.toSeq.map(lit): _*)): _*)
    val oLit = array(basis.map(vj =>
      lit(mean.indices.map(i => mean(i) * vj(i)).sum)): _*)
    zip_with(bLit, oLit, (bj, oj) =>
      round((aggregate(zip_with(v, bj, (x, c) => x * c),
        lit(0.0), (acc, x) => acc + x) - oj) * 1000000).cast("long"))
  }

  /** Per-row coarse IVF cell: argmin over the 16 literal seed vectors of
    * the full 64-dim integer L2², ties to the lower cell id — the batch
    * `ivfpqCellsShared` rule as a stateless streaming projection (seeds
    * as a data literal + folds, the [[centsLit]] codegen discipline).
    */
  private[graft] def cellCol(xuArr: Column, seeds: Seq[(Int, Array[Long])]): Column = {
    val seedsLit = array(seeds.map { case (cell, cus) =>
      struct(lit(cell).as("cell"), array(cus.toSeq.map(lit): _*).as("cu"))
    }: _*)
    argminFold(seedsLit,
      s => aggregate(
        zip_with(xuArr, s.getField("cu"), (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, x) => acc + x),
      s => s.getField("cell"))
  }

  /** Stage the embeddings corpus as four vec_id-ring files and drain the
    * encode projection over them; `toXu` maps the double vector column to
    * the 64-long coordinate array the codes are computed in. With
    * `cellSeeds` set, each output row also carries the coarse IVF cell —
    * the complete streaming IVF-PQ index row. `sources` > 1 splits the
    * ring across that many staged directories read by a UNION of file
    * sources — the multi-feed ingest fan-in (codes are per-row and
    * order-free, so the union needs no coordination).
    */
  private def drainEncode(spark: SparkSession, sfDir: String,
      cents: IndexedSeq[Seq[(Int, Array[Long])]],
      toXu: Column => Column,
      cellSeeds: Option[Seq[(Int, Array[Long])]] = None,
      sources: Int = 1): DataFrame = {
    val staged = Files.createTempDirectory("stream-encode-ingest")
    try {
      val emb = graft.tables.Tables.embeddings(spark, sfDir)
      require(emb.head(1).nonEmpty,
        s"$sfDir/embeddings.parquet is empty — cannot stage an encode-at-ingest replay")
      val dirs = (0 until sources).map { src =>
        val dir = if (sources == 1) staged else {
          val d = staged.resolve(s"src$src"); Files.createDirectories(d); d
        }
        (0 until 4).foreach { b =>
          StagedEvents.writePart(
            emb.filter(col("vec_id") % (4 * sources) === (b * sources + src)),
            dir, s"b${b}_vectors.parquet", 60 - 15 * b)
        }
        dir
      }
      val schema =
        spark.read.parquet(dirs.head.resolve("b0_vectors.parquet").toString).schema
      def source(dir: java.nio.file.Path) =
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(dir.toString)
      // The coordinate array is materialized as its OWN projection so the
      // 1024 argmin terms reference a bound attribute: inlining `toXu`
      // (for OPQ, a 64×64-literal rotation) into every (sub, cent, wd)
      // term once ballooned the task binary to 122 MiB — CollapseProject
      // keeps multi-referenced non-cheap projections separate, so the
      // rotation is computed once per row and the encode reads the array.
      val base = dirs.map(source).reduce(_ unionByName _)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("v"))
        .select(col("vec_id"), toXu(col("v")).as("xu"))
      val codes = cellSeeds match {
        case None =>
          base.select(col("vec_id"), explode(codeStructs(col("xu"), cents)).as("c"))
            .select(col("vec_id"), col("c.sub").cast("int").as("sub"), col("c.c_id").as("c_id"))
        case Some(seeds) =>
          base.select(col("vec_id"), cellCol(col("xu"), seeds).as("cell"),
              explode(codeStructs(col("xu"), cents)).as("c"))
            .select(col("vec_id"), col("cell"),
              col("c.sub").cast("int").as("sub"), col("c.c_id").as("c_id"))
      }
      Drain.toMemory(spark, "stream_encode", codes)
    } finally StagedEvents.deleteRecursively(staged)
  }

  /** The streaming RAW-PQ encode: batch-trained codebook, streamed corpus,
    * codes out — oracled against the static DuckDB train/encode replay.
    */
  def pq(spark: SparkSession, sfDir: String): DataFrame =
    graft.tables.Tables.withShufflePartitions(spark, 4) {
      val cents = graft.queries.Similarity.collectedCents(
        graft.queries.Similarity.pqCodebookShared(spark, sfDir))
      drainEncode(spark, sfDir, cents, rawXu)
    }

  /** The streaming OPQ encode: rotate + encode at ingest against the
    * batch-trained rotated codebook — the production OPQ ingest path
    * (rotation is part of the index build, applied per vector as it
    * arrives, never a corpus-wide job).
    */
  def opq(spark: SparkSession, sfDir: String): DataFrame =
    graft.tables.Tables.withShufflePartitions(spark, 4) {
      val (basis, mean) = graft.queries.Similarity.opqBasis(spark, sfDir)
      val cents = graft.queries.Similarity.collectedCents(
        graft.queries.Similarity.opqCentsShared(spark, sfDir))
      drainEncode(spark, sfDir, cents, v => rotatedXu(v, basis, mean))
    }

  /** The 16 coarse seed vectors (vec_id < 16) in integer micro-units,
    * collected via the SAME Spark round() arithmetic as the batch pqXu —
    * driver-side math.round would round negative halves differently.
    */
  private def collectSeeds(spark: SparkSession, sfDir: String): Seq[(Int, Array[Long])] =
    graft.tables.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") < 16)
      .select(col("vec_id").cast("int"),
        transform(transform(col("embedding"), x => x.cast("double")),
          x => round(x * 1000000).cast("long")).as("xu"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1).toSeq

  /** The COMPLETE streaming IVF-PQ index build: each arriving vector is
    * coarse-quantized to its inverted-list cell (argmin over the 16
    * literal seed vectors — at scale this IS the partitioning decision)
    * AND product-quantized to its 8 codes, in one stateless projection.
    * The drained (vec_id, cell, sub, c_id) table is the full index row,
    * oracled against DuckDB's independent assign+train+encode replay and
    * spec-pinned equal to the batch ivfpqCellsShared ⋈ pqCodesShared join.
    */
  def ivfpq(spark: SparkSession, sfDir: String): DataFrame =
    graft.tables.Tables.withShufflePartitions(spark, 4) {
      val cents = graft.queries.Similarity.collectedCents(
        graft.queries.Similarity.pqCodebookShared(spark, sfDir))
      val seeds = collectSeeds(spark, sfDir)
      drainEncode(spark, sfDir, cents, rawXu, cellSeeds = Some(seeds))
    }

  /** The ingest FAN-IN: the raw-PQ encode over TWO staged sources (their
    * files interleave by mod time) unioned into one streaming query —
    * pins that the stateless encode composes with source union without
    * re-ordering effects: codes are per-row and order-free, so the
    * drained table equals the single-source (and batch) code table
    * exactly. The multi-feed shape a production ingest actually runs
    * (per-region feeds → one index build).
    */
  def pqFanIn(spark: SparkSession, sfDir: String): DataFrame =
    graft.tables.Tables.withShufflePartitions(spark, 4) {
      val cents = graft.queries.Similarity.collectedCents(
        graft.queries.Similarity.pqCodebookShared(spark, sfDir))
      drainEncode(spark, sfDir, cents, rawXu, sources = 2)
    }
}
