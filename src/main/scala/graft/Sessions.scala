package graft

import org.apache.spark.sql.SparkSession

/** The one local-session builder every entry point shares. Verify, Bench,
  * Profile, ExplainCheck, and the CLI used to hand-roll this block and had
  * already drifted once (ExplainCheck lost the extensions line, so its
  * captured plans silently lacked the custom range-join strategy);
  * centralizing it makes "profiled plan == bench plan == verified plan" a
  * property of the code rather than of copy-paste discipline.
  */
object Sessions {
  def local(cpus: String, appName: String = "quantmsutilsspark"): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s
  }

  /** CPU count from SPARK_GRAFT_CPUS, else the given default. */
  def cpusOr(default: => String): String =
    sys.env.getOrElse("SPARK_GRAFT_CPUS", default)
}
