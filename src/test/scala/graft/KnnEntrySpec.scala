package graft

import org.apache.spark.sql.functions._

/** sim_knn_graph_entry pins exact values via its generated oracle; this
  * pins the ENTRY CHOICES against driver-side brute force (the layer
  * membership rule, the single fixed entry, the per-probe argmax) and the
  * ordering claim the operator exists to measure.
  */
class KnnEntrySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def md5Mod8(salt: String, id: Long): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest((salt + id.toString).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % 8
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("entry strategies: layer membership, fixed entry, and per-probe argmax are the brute-force answers") {
    val vecs = graft.tables.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val layer = vecs.filter { case (id, _) => md5Mod8("hl", id) == 0L }
    val nrm = vecs.toMap.map { case (id, v) =>
      id -> math.sqrt(v.map(x => x * x).sum)
    }
    val byId = vecs.toMap
    def cos(a: Long, b: Long): Double = round6(
      byId(a).zip(byId(b)).map { case (x, y) => x * y }.sum / (nrm(a) * nrm(b)))
    val got = graft.queries.Similarity.queries("sim_knn_graph_entry")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(5), r.getLong(6), r.getLong(7)))
      .toMap
    assert(got.keySet == (0L until 10L).toSet, "one row per probe")
    val fixedEntry = layer.map(_._1).min
    got.foreach { case (q, (fx, hr, nl1, _, _, _)) =>
      assert(fx == fixedEntry, s"probe $q fixed entry")
      assert(nl1 == layer.length.toLong, s"probe $q layer size")
      // brute per-probe argmax over the layer (never the probe itself),
      // ties to the smaller id — the walk's own ordering rule
      val brute = layer.map(_._1).filter(_ != q)
        .map(c => (c, cos(q, c)))
        .minBy { case (c, s) => (-s, c) }._1
      assert(hr == brute, s"probe $q hier entry: got $hr, brute $brute")
    }
    // the ordering the operator measures: self-entry is the in-corpus
    // ceiling, a single global entry the floor (aggregate, not per-probe)
    val selfHits = got.values.map(_._4).sum
    val fixedHits = got.values.map(_._5).sum
    val hierHits = got.values.map(_._6).sum
    assert(selfHits >= fixedHits,
      s"self-entry ($selfHits) under the fixed entry ($fixedHits)")
    assert(hierHits >= fixedHits,
      s"the sampled layer ($hierHits) must not lose to one fixed entry ($fixedHits)")
    // vacuousness: the strategies genuinely diverge on this corpus
    assert(selfHits != fixedHits || fixedHits != hierHits,
      "all strategies tied — the measurement is vacuous")
  }
}
