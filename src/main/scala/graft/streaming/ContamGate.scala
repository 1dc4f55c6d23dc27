package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Benchmark decontamination AT THE INGEST EDGE — the streamed gate the
  * batch family (text_cross_contamination → pipeline_mix_decontaminated)
  * promises: the load that ships training data also refuses benchmark
  * content, per micro-batch, with ZERO joins in the hot path.
  *
  * The eval corpus's distinct 4-gram digests build an m=65536-bit, k=4
  * Bloom filter whose positions are Kirsch-Mitzenmacher combinations
  * (h1 + j·h2) mod m of the digest's two halves (the MinHash signature
  * scheme — one md5 per shingle, arithmetic for the rest; see [[posOf]]
  * for why per-position md5s were benched out), collapsed ONCE into a
  * nibble-packed array literal embedded in the streaming projection. Each
  * arriving doc then evaluates entirely per-row: tokens → distinct
  * 4-gram shingle hashes → per shingle, all 4 bit positions set → hit
  * count; contaminated iff ≥50% of its shingles hit. No stream-static
  * join, no state store, no shuffle — at 100 TB the gate is pure map
  * work riding the ingest scan, and the filter is rebuilt only when the
  * benchmark suite changes (it is bounded by m = 8 KiB regardless of
  * corpus size; the position collect is the one driver-side read, ≤65536
  * rows by construction).
  *
  * Bloom one-sidedness does the right thing here: a genuinely
  * contaminated doc can never slip through (no false negatives — every
  * truly-covered shingle's positions are set), while a false positive
  * only quarantines a clean doc for triage. The routed sink is
  * partitionBy(verdict), and the read-back audit hash-matches DuckDB
  * replaying the SAME position sets relationally — the false-positive
  * behavior itself is reproduced, not approximated.
  */
object ContamGate {
  private val M = 65536
  private val K = 4

  /** Bit position j of a shingle's (h1, h2) digest pair — the
    * Kirsch-Mitzenmacher combination (h1 + j·h2) mod m, the SAME scheme
    * the MinHash signatures use. This replaced per-position md5s
    * (md5(h || '_' || j)) after the bench caught the cost: the gate's hot
    * path is HOF lambdas, which Spark evaluates INTERPRETED, and k=4
    * digest calls per shingle put ~40M interpreted md5s on the stream's
    * single input partition — 55 s/rep at sf0.1 for a 15-job query. One
    * digest per shingle + integer arithmetic for the k positions is the
    * same one-sided filter at a quarter of the hashing (measured ~4×
    * faster end to end), and DuckDB replays the arithmetic verbatim.
    */
  private def posOf(h1: Column, h2: Column, j: Column): Column =
    (h1 + j * h2) % M

  /** Per distinct 4-gram: the digest's two halves (h1 < 2^60,
    * h2 < 2^55 — headroom so h1 + 3·h2 stays far inside a long). The
    * digest is computed ONCE per shingle (separate transform stage), not
    * once per extracted half.
    */
  private def shingleHashPairs(t: Column): Column = {
    val grams = array_distinct(
      when(size(t) >= 4, transform(sequence(lit(1), size(t) - 3),
        i => array_join(slice(t, i, lit(4)), " ")))
        .otherwise(array()))
    transform(transform(grams, s => md5(s)), dg => struct(
      conv(substring(dg, 1, 15), 16, 10).cast("long").as("h1"),
      (conv(substring(dg, 17, 15), 16, 10).cast("long") % lit(1L << 55)).as("h2")))
  }

  def audit(spark: SparkSession, sfDir: String): DataFrame =
    graft.tables.Tables.withShufflePartitions(spark, 4) {
      import spark.implicits._
      // the eval-side Bloom: distinct eval shingle hashes → K positions
      // each → DISTINCT set bits; bounded by M rows, collected once to
      // build the bitmap literal the stream probes
      val evSh = spark.read.parquet(graft.queries.TextOps.evalCorpusDir(spark, sfDir))
        .select(split(trim(col("text")), "\\s+").as("t"))
        .select(explode(shingleHashPairs(col("t"))).as("p"))
        .select(col("p.h1").as("h1"), col("p.h2").as("h2")).distinct()
      val posSet = evSh
        .select(explode(transform(sequence(lit(0), lit(K - 1)),
          j => posOf(col("h1"), col("h2"), j))).as("p"))
        .distinct().collect().map(_.getLong(0))
      val bits = new Array[Boolean](M)
      posSet.foreach(p => bits(p.toInt) = true)
      // nibble-packed ARRAY literal, probed with element_at — O(1) per
      // probe. The first cut embedded a 16384-char hex STRING and read it
      // with substr(p >> 2, 1): UTF8String.substring walks bytes from the
      // start to find the char offset, so every probe scanned ~8 KB of
      // the literal — ~40M probes × 8 KB on the stream's single input
      // partition was 47 s/rep of pure memory traffic (measured; the md5
      // count was the FIRST suspect and its fix moved nothing — profile
      // before optimizing, even the second time).
      val nibbles = (0 until M / 4).map { n =>
        (if (bits(4 * n)) 8 else 0) | (if (bits(4 * n + 1)) 4 else 0) |
          (if (bits(4 * n + 2)) 2 else 0) | (if (bits(4 * n + 3)) 1 else 0)
      }
      val bitmap = typedLit(nibbles)
      // nibble (p >> 2), MSB-first weight 8 >> (p & 3)
      def bitSet(p: Column): Column =
        element_at(bitmap, (shiftright(p, 2) + 1).cast("int"))
          .bitwiseAND(element_at(array(lit(8), lit(4), lit(2), lit(1)),
            (p.bitwiseAND(lit(3L)) + 1).cast("int"))) =!= 0

      val staged = Files.createTempDirectory("contam-gate-src")
      val out = Files.createTempDirectory("contam-gate-sink")
      val cp = Files.createTempDirectory("contam-gate-cp")
      try {
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id"), col("source"), col("text"))
        require(docs.head(1).nonEmpty, s"$sfDir/documents.parquet is empty")
        StagedEvents.writePart(docs.filter(col("doc_id") % 2 === 0),
          staged, "b0_docs.parquet", 60)
        StagedEvents.writePart(docs.filter(col("doc_id") % 2 =!= 0),
          staged, "b1_docs.parquet", 45)
        val schema =
          spark.read.parquet(staged.resolve("b0_docs.parquet").toString).schema
        val routed = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(staged.toString)
          .select(col("doc_id"), col("source"),
            shingleHashPairs(split(trim(col("text")), "\\s+")).as("hs"))
          .select(col("doc_id"), col("source"),
            size(col("hs")).cast("long").as("n_sh"),
            size(filter(col("hs"), p => forall(sequence(lit(0), lit(K - 1)),
              j => bitSet(posOf(p.getField("h1"), p.getField("h2"), j)))))
              .cast("long").as("nc"))
          .select(col("doc_id"), col("source"), col("nc"),
            when(col("n_sh") > 0 && col("nc") * 2 >= col("n_sh"), lit("contam"))
              .otherwise(lit("clean")).as("verdict"))
        val q = routed.writeStream
          .format("parquet")
          .option("path", out.toString)
          .option("checkpointLocation", cp.toString)
          .partitionBy("verdict")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        // bounded (≤ 2·|sources| rows): collected so the result outlives
        // the temp dirs
        spark.read.parquet(out.toString)
          .groupBy(col("source"), col("verdict").cast("string").as("verdict"))
          .agg(count(lit(1)).as("n_docs"), sum(col("nc")).as("n_hits"),
            min(col("doc_id")).as("min_doc_id"),
            max(col("doc_id")).as("max_doc_id"))
          .collect()
          .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
            r.getLong(4), r.getLong(5))).toSeq
          .toDF("source", "verdict", "n_docs", "n_hits", "min_doc_id", "max_doc_id")
      } finally {
        StagedEvents.deleteRecursively(staged)
        StagedEvents.deleteRecursively(out)
        StagedEvents.deleteRecursively(cp)
      }
    }
}
