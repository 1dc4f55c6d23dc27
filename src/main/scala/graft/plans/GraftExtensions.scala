package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

/** Engine extension entry point: register with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  * Currently injects the broadcast interval-join planner strategy
  * ([[RangeJoinStrategy]]); future custom rules/strategies hang off here.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectPlannerStrategy(_ => RangeJoinStrategy)
  }
}
