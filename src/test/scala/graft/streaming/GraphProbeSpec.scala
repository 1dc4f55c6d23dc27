package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** stream_graph_probe's contracts beyond its DuckDB oracle (which pins it
  * to the batch hier walk, hash for hash): the two independently-built
  * paths — the streamed entry + compacted-layout walk here, and
  * sim_knn_graph_entry's hier leg over the session-shared frame — must
  * agree on what they RETRIEVE, and the serving output must be a
  * well-formed ranked answer.
  */
class GraphProbeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("streamed serving agrees with the batch hier leg and ranks cleanly") {
    val served = graft.queries.Temporal.all("stream_graph_probe")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    // well-formed: exactly 5 ranked answers per probe, ranks 1..5, scores
    // nonincreasing with the (cos desc, vec_id) tie rule
    val byQ = served.groupBy(_._1)
    assert(byQ.keySet == (0L until 10L).toSet, "one answer set per probe")
    byQ.foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to 5), s"probe $q ranks")
      val ordered = sorted.map(r => (-r._3, r._2)).toSeq
      assert(ordered == ordered.sorted, s"probe $q tie rule violated: $sorted")
    }
    // cross-path agreement: hits against the exact top-5 must equal the
    // batch leg's hier_hits column (independent entry computation,
    // independent adjacency source — the shared frame vs the layout)
    val exact = {
      val vecs = graft.tables.Tables.embeddings(spark, sf)
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      val byId = vecs.toMap
      val nrm = byId.map { case (id, v) => id -> math.sqrt(v.map(x => x * x).sum) }
      def cos(a: Long, b: Long): Double = BigDecimal(
        byId(a).zip(byId(b)).map { case (x, y) => x * y }.sum / (nrm(a) * nrm(b)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (0L until 10L).map { q =>
        q -> vecs.map(_._1).filter(_ != q)
          .map(c => (c, cos(q, c)))
          .sortBy { case (c, s) => (-s, c) }.take(5).map(_._1).toSet
      }.toMap
    }
    val servedHits = byQ.map { case (q, rows) =>
      q -> rows.count(r => exact(q).contains(r._2)).toLong
    }
    val batchHits = graft.queries.Similarity.queries("sim_knn_graph_entry")(spark, sf)
      .select(col("q_id"), col("hier_hits")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(servedHits == batchHits,
      s"served hits $servedHits differ from the batch hier leg $batchHits")
    // vacuousness: the walk retrieves something real
    assert(servedHits.values.sum > 0, "zero recall everywhere — serving vacuous")
  }
}
