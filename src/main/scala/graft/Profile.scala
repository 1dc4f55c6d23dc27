package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query profiler: `graft.Profile <sfDir> <queryName> [reps]`.
  * Prints per-rep wall seconds and the formatted physical plan, so a slow
  * bench entry can be attributed (scan parallelism, shuffle count, codegen)
  * without re-running the whole suite.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
