package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge from raw Catalyst [[Expression]]s to the public [[Column]] API.
  * Spark 4 made Column wrap ColumnNode and gated the Expression constructor
  * behind `private[sql]` — this shim re-exports it for the engine's custom
  * expressions (graft.expressions).
  */
object GraftColumnShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
