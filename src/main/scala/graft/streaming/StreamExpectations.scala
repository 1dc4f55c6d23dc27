package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Expectations AT THE EDGE: the per-row documents predicates of the
  * batch expectation suite evaluated INSIDE a micro-batch ingest via
  * `observe()` — per-batch violation counters surface in QueryProgress
  * with ZERO extra jobs, which is the production deployment mode: the
  * load that ships the data also ships its quality verdicts, and a bad
  * slice alarms before anything downstream reads it (the batch suite
  * then stays the end-of-day audit, not the first line of defense).
  *
  * The staged replay splits documents into two parity part files → two
  * data batches (maxFilesPerTrigger=1, AvailableNow). The drained
  * verdict table is the CUMULATIVE (check, severity, n_violations) over
  * all batches and must equal the batch suite's documents rows exactly:
  * arrival batching changes nothing about the verdicts — the
  * commutative-counter property that makes edge expectations sound.
  * StreamExpectationsSpec additionally pins the PER-BATCH counters to
  * each slice's own violation counts (the alarm granularity).
  */
object StreamExpectations {

  /** One staged drain per (session, dir, stamp) — the verdict query and
    * any metrics reader share it (the DedupIngest discipline).
    */
  private val memo = new ReplayMemo(2)

  private[streaming] def run(spark: SparkSession, sfDir: String) =
    memo.getOrRun(spark, sfDir, tag = "stream_expectations") {
      val staged = Files.createTempDirectory("stream-expectations")
      try {
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        require(docs.head(1).nonEmpty,
          s"$sfDir/documents.parquet is empty — cannot stage an ingest replay")
        StagedEvents.writePart(docs.filter(col("doc_id") % 2 === 0),
          staged, "b0_docs_even.parquet", 60)
        StagedEvents.writePart(docs.filter(col("doc_id") % 2 =!= 0),
          staged, "b1_docs_odd.parquet", 45)
        val schema =
          spark.read.parquet(staged.resolve("b0_docs_even.parquet").toString).schema
        val stream = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(staged.toString)
          .observe("graft_exp",
            sum(when(col("text").isNull || trim(col("text")) === "", 1L)
              .otherwise(0L)).as("blank"),
            sum(when(col("n_chars") =!= length(col("text")), 1L)
              .otherwise(0L)).as("lenmm"),
            sum(when(col("n_chars") < 60, 1L).otherwise(0L)).as("floor60"),
            sum(when(col("n_chars") < 100, 1L).otherwise(0L)).as("floor100"))
          .select(col("doc_id"))
        Drain.toMemoryWithProgress(spark, "stream_expectations", stream)
      } finally StagedEvents.deleteRecursively(staged)
    }

  /** Per-batch observed counters in arrival order — the alarm surface.
    * (batch_ord, input_rows, blank, lenmm, floor60, floor100).
    */
  private[streaming] def perBatch(spark: SparkSession, sfDir: String)
      : Seq[(Int, Long, Long, Long, Long, Long)] = {
    val (_, progress) = run(spark, sfDir)
    progress.filter(_.numInputRows > 0).sortBy(_.batchId).zipWithIndex.flatMap {
      case (p, ord) =>
        Option(p.observedMetrics.get("graft_exp")).map { r =>
          (ord, p.numInputRows, r.getAs[Long]("blank"), r.getAs[Long]("lenmm"),
            r.getAs[Long]("floor60"), r.getAs[Long]("floor100"))
        }
    }
  }

  /** The cumulative verdict table — must equal the batch suite's
    * documents rows exactly (same oracle CTE).
    */
  def verdicts(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.tables.Tables.withShufflePartitions(spark, 4) {
      val per = perBatch(spark, sfDir)
      val (b, l, f60, f100) = per.foldLeft((0L, 0L, 0L, 0L)) {
        case ((a1, a2, a3, a4), (_, _, x1, x2, x3, x4)) =>
          (a1 + x1, a2 + x2, a3 + x3, a4 + x4)
      }
      Seq(
        ("text_nonblank", "error", b),
        ("n_chars_consistent", "error", l),
        ("text_len_ge_60", "error", f60),
        ("text_len_ge_100", "warn", f100))
        .toDF("check_name", "severity", "n_violations")
    }
  }
}
