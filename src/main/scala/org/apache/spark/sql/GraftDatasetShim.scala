package org.apache.spark.sql

/** Plan-truncation bridge for materialized DataFrames. Spark offers two
  * public ways to reuse a computed frame and both are wrong for a
  * session-shared cache:
  *
  *  - `persist()` keeps the FULL logical plan under an InMemoryRelation, so
  *    every consumer's plan embeds the whole upstream pipeline — measured
  *    r13: a 20k-line / 1594-Exchange plan the driver re-analyzed (and AQE
  *    re-optimized per stage) on every action;
  *  - `localCheckpoint()` truncates the plan but DESTROYS the lineage: an
  *    unpersisted (released / LRU-evicted / stale-stamp-purged) frame makes
  *    every still-held reference fail with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND
  *    instead of recomputing, and its LogicalRDD reports no statistics, so
  *    auto-broadcast joins silently degrade to SortMergeJoin.
  *
  * [[truncated]] combines the good halves: given a persisted + materialized
  * frame, it wraps the frame's executed RDD (an InMemoryRelation scan — on
  * unpersist it recomputes from lineage like any cached RDD) in a
  * `LogicalRDD` leaf via `LogicalRDD.fromDataset`, which also carries the
  * origin's output partitioning/ordering and its POST-materialization
  * statistics (the InMemoryRelation's real byte sizes), so planner
  * decisions (broadcast thresholds, the range-join strategy's size gate)
  * see the same numbers they saw under plain persist().
  */
object GraftDatasetShim {
  def truncated(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    classic.Dataset.ofRows(ds.sparkSession,
      org.apache.spark.sql.execution.LogicalRDD
        .fromDataset(ds.queryExecution.toRdd, ds, isStreaming = false))
  }

  /** ONE literal expression node holding `value` under exactly `dt`
    * (field names, nullability — byte-for-byte the schema the
    * element-wise `array(struct(lit(...)))` construction produced).
    *
    * The element-wise construction of a large constant directory (a
    * 128-entry codebook = ~1.5k expression nodes, a 64×64 rotation basis
    * = ~4k) is only folded to a single Literal by ConstantFolding at
    * OPTIMIZATION time — every ANALYSIS walks the full tree first, and a
    * streaming micro-batch re-analyzes its plan per trigger
    * (IncrementalExecution), so the per-value tree is re-walked by every
    * rule on every batch. Handing the planner the already-folded Literal
    * removes that tax without changing a single produced byte.
    */
  def literalCol(value: Any, dt: org.apache.spark.sql.types.DataType): Column = {
    // the TYPED converter (handles Product → InternalRow for struct
    // elements, which the typeless Literal.create conversion does not)
    val toCatalyst =
      org.apache.spark.sql.catalyst.CatalystTypeConverters.createToCatalystConverter(dt)
    classic.ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.Literal(toCatalyst(value), dt))
  }
}
