package graft

import org.apache.spark.sql.functions._

/** sample_kcenter pins exact values via its generated oracle; this replays
  * the whole greedy farthest-point selection in driver Scala and pins the
  * structural guarantees (radius curve monotone nonincreasing, centers
  * distinct, Gonzalez invariant).
  */
class KcenterSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("sample_kcenter equals the brute-force greedy replay and its radius curve never rises") {
    val vu = graft.tables.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => BigDecimal(x.toDouble * 1000000)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toArray)
    val byId = vu.toMap
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // greedy replay
    val seed = vu.map(_._1).min
    var minD = vu.map { case (id, v) => id -> d2(v, byId(seed)) }.toMap
    val expect = scala.collection.mutable.ArrayBuffer[
      (Int, Option[Long], Option[Long])]((0, Some(seed), None))
    for (step <- 1 to 7) {
      val (cid, dmin) = minD.toSeq.minBy { case (id, dv) => (-dv, id) }
      expect += ((step, Some(cid), Some(dmin)))
      minD = minD.map { case (id, dv) =>
        id -> math.min(dv, d2(byId(id), byId(cid)))
      }
    }
    expect += ((8, None, Some(minD.values.max)))
    val got = graft.queries.Similarity.queries("sample_kcenter")(spark, sf)
      .collect()
      .map(r => (r.getInt(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .sortBy(_._1)
    assert(got.toSeq == expect.toSeq,
      s"greedy replay differs:\n got   ${got.toSeq}\n brute ${expect.toSeq}")
    // structural pins: the coverage radius is monotone nonincreasing
    // (each added center can only shrink min distances), and the 8
    // centers are distinct
    val radii = got.flatMap(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a },
      s"radius curve rose: ${radii.toSeq}")
    val centers = got.flatMap(_._2)
    assert(centers.distinct.length == 8, s"centers not distinct: ${centers.toSeq}")
    // vacuousness: the curve genuinely decreases somewhere
    assert(radii.head > radii.last, "flat radius curve — selection is vacuous")
  }

  test("sample_kcenter_census equals the brute-force nearest-center assignment") {
    val vu = graft.tables.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => BigDecimal(x.toDouble * 1000000)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toArray)
    val byId = vu.toMap
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // centers from the selection query itself (already brute-pinned above)
    val centers = graft.queries.Similarity.queries("sample_kcenter")(spark, sf)
      .collect().filter(!_.isNullAt(1)).map(_.getLong(1)).sorted
    val brute = vu.map { case (id, v) =>
      val (cid, dv) = centers.map(c => (c, d2(v, byId(c))))
        .minBy { case (c, dd) => (dd, c) }
      (id, cid, dv)
    }.groupBy(_._2).map { case (cid, xs) =>
      cid -> (xs.length.toLong, xs.map(_._3).max, xs.map(_._3).sum)
    }
    val got = graft.queries.Similarity.queries("sample_kcenter_census")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.keySet == brute.keySet, "center sets differ")
    brute.foreach { case (c, v) =>
      assert(got(c) == v, s"center $c: got ${got(c)}, brute $v")
    }
    // every center covers itself (distance 0 is its own minimum), so all
    // 8 selected exemplars appear and the populations sum to the corpus
    assert(got.values.map(_._1).sum == vu.length.toLong)

    // the balance audit is structurally sound: both schemes quantize the
    // whole corpus over exactly 8 live lists
    val bal = graft.queries.Similarity.queries("sim_ivf_kcenter_balance")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(bal.keySet == Set("fixture_seeds", "kcenter"))
    bal.foreach { case (s, (lists, widest, narrowest)) =>
      assert(lists == 8L, s"$s: dead lists")
      assert(widest >= narrowest && narrowest > 0, s"$s: degenerate balance")
    }
  }
}
