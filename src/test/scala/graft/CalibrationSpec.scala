package graft

import org.apache.spark.sql.functions._

/** text_quality_calibration pins exact values via its oracle; this replays
  * the reliability table in driver Scala with the identical arithmetic and
  * guards the verdict against vacuousness.
  */
class CalibrationSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def roundL(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("text_quality_calibration equals the driver-side reliability replay") {
    def ratioU(pat: String) =
      expr(s"(length(regexp_replace(text, '$pat', '')) * 1000000L) div length(text)")
    val scored = graft.tables.Tables.documents(spark, sf)
      .filter(length(col("text")) > 0)
      .withColumn("logit_u",
        lit(-900000L) + lit(2L) * ratioU("[^A-Za-z]") - lit(4L) * ratioU("[^0-9]")
          + ratioU("[^ ]") - lit(3L) * ratioU("[^A-Z]"))
      .select(col("logit_u"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val perBin = scored.groupBy { case (l, _) =>
      math.floor(l.toDouble / 10000.0).toLong
    }.map { case (bin, xs) =>
      val n = xs.length.toLong
      val pos = xs.map(_._2).sum
      val claimed = roundL(xs.map(_._1).sum.toDouble / n)
      val emp = roundL(math.log((pos + 1L).toDouble / (n - pos + 1L).toDouble) * 1e6)
      bin -> (n, pos, claimed, emp, math.abs(claimed - emp),
        math.abs(claimed - emp) <= 1000000L)
    }
    val nTot = perBin.values.map(_._1).sum
    val wAvg = (f: ((Long, Long, Long, Long, Long, Boolean)) => Long) =>
      roundL(perBin.values.map(v => v._1 * f(v)).sum.toDouble / nTot)
    val wg = wAvg(_._5)
    val expect = perBin + (999L ->
      (nTot, perBin.values.map(_._2).sum, wAvg(_._3), wAvg(_._4), wg,
        wg <= 1000000L))
    val got = graft.queries.TextOps.queries("text_quality_calibration")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))
      .toMap
    assert(got.keySet == expect.keySet, "bin sets differ")
    expect.foreach { case (b, v) =>
      assert(got(b) == v, s"bin $b: got ${got(b)}, brute $v")
    }
    // vacuousness: the table must have multiple bins and the verdict must
    // actually split (the audit exists to FLAG overconfident bins)
    assert(got.size > 2, "single-bin reliability table — widen the corpus or narrow the bins")
    // (at sf0.001 every bin reads overconfident — the honest verdict on
    // the stand-in weights; requiring a calibrated bin too would pin the
    // fixture, not the operator)
    assert(got.values.exists(!_._6), "no uncalibrated bin — verdict vacuous")
  }
}
