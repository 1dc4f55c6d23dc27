package graft

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
    val spark = Sessions.local(Sessions.cpusOr("32"))
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // streaming entries run awaitTermination inside the closure and return
    // the drained memory sink — explaining that LocalTableScan would both
    // re-run the stream and print a useless plan
    if (name.startsWith("stream_"))
      println("(streaming query: plan attribution lives in the stream's own progress, not the sink table)")
    else fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
