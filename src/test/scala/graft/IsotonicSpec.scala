package graft

import org.apache.spark.sql.functions._

/** text_quality_isotonic pins exact values via its Verify-time literal
  * oracle; this pins the FIT's defining properties independently of the
  * fitting code: the step function is monotone, each pool's fitted value
  * is the smoothed log-odds of its own pooled counts (recomputed here
  * from the raw bins), adjacent pools are strictly increasing (else PAV
  * would have merged them), and pools are contiguous bin ranges.
  */
class IsotonicSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def lodds(pos: Long, n: Long): Long =
    BigDecimal(math.log((pos + 1L).toDouble / (n - pos + 1L).toDouble) * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("isotonic fit: monotone, pool-consistent, maximally split") {
    val rows = graft.queries.TextOps.queries("text_quality_isotonic")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    assert(rows.length > 2, "single-bin table — fit vacuous")
    // 1. the fitted step function never decreases
    val iso = rows.map(_._5)
    assert(iso.zip(iso.tail).forall { case (a, b) => b >= a },
      s"fit not monotone: ${iso.toSeq}")
    // 2. each pool's fitted value is the smoothed log-odds of the pool's
    //    SUMMED counts — recomputed here from the raw per-bin counts
    rows.groupBy(_._6).foreach { case (lo, pool) =>
      val n = pool.map(_._2).sum
      val pos = pool.map(_._3).sum
      val expect = lodds(pos, n)
      assert(pool.forall(_._5 == expect),
        s"pool $lo fitted ${pool.head._5}, recomputed $expect")
      // 4. pools are contiguous bin ranges over the occupied bins
      val bins = pool.map(_._1).sorted
      val occupied = rows.map(_._1).filter(b => b >= bins.head && b <= bins.last)
      assert(bins.toSeq == occupied.toSeq, s"pool $lo not contiguous: ${bins.toSeq}")
    }
    // 3. adjacent pools never invert (PAV merges strict violations; two
    //    pools whose true values differ can still TIE after micro-unit
    //    rounding, so equality is legal)
    val poolVals = rows.groupBy(_._6).toSeq.sortBy(_._1).map(_._2.head._5)
    assert(poolVals.zip(poolVals.tail).forall { case (a, b) => b >= a },
      s"adjacent pools invert: $poolVals")
    // vacuousness: the raw empirical sequence must violate monotonicity
    // somewhere (else the fit is an identity and pins nothing)
    val emp = rows.map(_._4)
    assert(emp.zip(emp.tail).exists { case (a, b) => b < a },
      "empirical log-odds already monotone — pooling untested")
    // and where it does, the fit must differ from the raw value
    assert(rows.exists(r => r._4 != r._5), "fit identical to raw everywhere")
  }
}
