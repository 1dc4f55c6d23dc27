package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Every table is a single parquet file under `sfDir`. At cluster scale these
  * would be directory-partitioned datasets; the reader call is identical
  * (`spark.read.parquet` takes a directory just as well), so nothing here
  * changes at 100 TB — only the path layout does.
  */
object Tables {
  import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
  import org.apache.spark.sql.types.{LongType, TimestampNTZType}

  /** Columns stored as parquet TIMESTAMP(NANOS), which Spark only reads as
    * long (spark.sql.legacy.parquet.nanosAsLong=true — set in every session
    * builder we own). Normalized here to TimestampType at microsecond
    * precision so the rest of the engine sees real timestamps.
    */
  private val nanosCols = Map(
    "orders" -> Seq("o_orderdate"),
    "events" -> Seq("ts"))

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    nanosCols.getOrElse(name, Nil).foldLeft(raw)(toEventTime)
  }

  /** Normalize an event-time column to TimestampType whatever physical form
    * the generated parquet carries — the driver has shipped both epoch-NANOS
    * longs (read via spark.sql.legacy.parquet.nanosAsLong) and plain
    * TIMESTAMP(MICROS) without a timezone (read as TIMESTAMP_NTZ). The
    * session timezone is pinned to UTC in [[graft.Sessions]], so the
    * NTZ→instant cast is value-preserving and both forms land on the same
    * microsecond instants the DuckDB oracle sees
    * (`epoch_us(CAST(ts AS TIMESTAMP))` is equally form-agnostic there).
    * Works on batch and streaming frames alike.
    *
    * CONTRACT: a LongType event-time column is epoch-NANOS — the only long
    * physical form the generator has ever shipped (plain INT64 micros with
    * no logical annotation would be silently divided by 1000 here and land
    * near 1970). Every site that WRITES a long ts upholds this:
    * StatefulSessionize's sentinel adds nanos arithmetic to a long max(ts),
    * and Relational's staged layouts store micros only after converting the
    * column to TimestampType first (so they re-enter via the `_` branch,
    * never this one).
    */
  def toEventTime(df: DataFrame, c: String): DataFrame =
    df.schema(c).dataType match {
      // integer `div`, NOT `/`: epoch-nanos longs exceed 2^53, so the
      // double division `/` would lose microsecond precision
      case LongType => df.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
      case TimestampNTZType => df.withColumn(c, col(c).cast("timestamp"))
      case _ => df
    }

  /** Fan a narrow scan out to the session's full parallelism before
    * compute-heavy per-row work (shingling, per-shingle hashing, vector
    * math). The driver test tables are single parquet files with one row
    * group, so the scan plans exactly one partition and every downstream
    * expression runs on one core unless we add a (cheap: the table is small
    * by definition here) round-robin shuffle. Gated on the actual scan file
    * count: a real multi-file dataset at cluster scale already parallelizes
    * and skips the extra shuffle entirely.
    */
  def fanOut(df: DataFrame, s: SparkSession, partitions: Int = 0): DataFrame = {
    val target =
      if (partitions > 0) partitions else s.sparkContext.defaultParallelism
    if (df.inputFiles.length * 4 < target) df.repartition(target) else df
  }

  /** Run `body` with a reduced shuffle-partition count, restoring the
    * session's setting afterwards. Streaming queries pay a fixed cost per
    * state-store partition per micro-batch (open, delta write, commit) —
    * with the default 32 partitions that fixed cost dwarfs the actual work
    * at test scale. A real deployment sizes this to the state volume;
    * stateful test queries here run with a handful.
    */
  def withShufflePartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, n.toString)
    try body finally s.conf.set(key, prev)
  }

  /** AQE off for the plans COMPILED inside `body` — for iterative loops
    * over bounded per-round frames (beam walks: ≤ probes × beam ≈ 10²
    * rows/round) whose lazy loop-checkpoints fix their physical plan at
    * construction. AQE materializes every Exchange of every round as its
    * own job and re-optimizes between them; on frames this small the
    * re-optimization buys nothing and the per-stage job machinery is the
    * dominant cost (r13 verdict: sim_knn_graph_entry 264 jobs at 8 cores,
    * all scheduling overhead). Plans built AFTER body returns — the
    * query's final readout, which sees real data sizes — keep AQE. Only
    * sane with a small explicit shuffle-partition count in scope (the
    * withShufflePartitions(4) the walk queries already run under):
    * without AQE coalescing, each loop exchange runs exactly that many
    * tasks at any cluster size, which is the right shape for a bounded
    * frame but wrong for anything data-scaled.
    */
  def withAqeOff[T](s: SparkSession)(body: => T): T = {
    val key = "spark.sql.adaptive.enabled"
    val prev = s.conf.get(key)
    s.conf.set(key, "false")
    try body finally s.conf.set(key, prev)
  }

  def lineitem(s: SparkSession, d: String): DataFrame   = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame     = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = t(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame     = t(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
