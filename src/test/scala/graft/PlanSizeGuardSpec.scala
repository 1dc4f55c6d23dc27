package graft

/** Plan-size ceiling sweep — the guard against the regression class r13
  * fixed: a multiply-referenced shared frame whose consumers silently
  * regrow a multiplicative logical plan (measured before the fix:
  * sim_knn_graph_incremental at 20,103 plan lines / 1,594 Exchange nodes,
  * re-analyzed by the driver on every action; after truncation: 983 / 78).
  *
  * Every registered non-streaming query's executed plan must stay under
  * the r13 ceilings (~2k lines / ~150 Exchanges). The sweep fails loudly
  * with the offending query's counts if a future chain reverts the
  * truncated-view architecture (e.g. knnFinalGraphShared) — catching at
  * test time what otherwise only shows as a mysterious driver slowdown.
  *
  * Streaming queries are excluded: invoking their entry drains the whole
  * stream (their returned frame is a memory-sink LocalTableScan, trivially
  * small), so the sweep would re-run every stream for no signal.
  */
class PlanSizeGuardSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val maxLines = 2000
  private val maxExchanges = 150

  test("no registered query's physical plan exceeds the r13 ceilings") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(_._1.startsWith("stream_"))
      .flatMap { case (name, fn) =>
        val p = fn(spark, sf).queryExecution.executedPlan.toString
        val lines = p.linesIterator.size
        val exchanges = "Exchange ".r.findAllMatchIn(p).length
        if (lines > maxLines || exchanges > maxExchanges)
          Some(s"$name: $lines plan lines, $exchanges Exchanges")
        else None
      }
    assert(offenders.isEmpty,
      s"plans regrew past the r13 truncation ceilings " +
        s"($maxLines lines / $maxExchanges Exchanges):\n" +
        offenders.mkString("\n"))
    graft.queries.SessionCaches.releaseAll(spark)
  }
}
