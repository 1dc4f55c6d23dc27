package graft

import org.apache.spark.sql.functions._

/** diag_l_diversity pins exact values via its oracle; this replays the
  * census in driver Scala (equivalence classes, distinct-l, majority
  * share) and guards the audit against vacuousness on the real tables.
  */
class PrivacySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("diag_l_diversity equals the driver-side census and flags a genuinely homogeneous class") {
    val rows = graft.tables.Tables.documents(spark, sf)
      .select(col("source"), expr("n_chars div 500"), col("lang"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val brute = rows.groupBy(r => (r._1, r._2)).map { case ((src, b), xs) =>
      val byLang = xs.groupBy(_._3).map { case (l, g) => l -> g.size.toLong }
      val (topLang, topN) = byLang.toSeq.minBy { case (l, n) => (-n, l) }
      (src, b) -> (xs.size.toLong, byLang.size.toLong, topLang, topN,
        BigDecimal(topN.toDouble / xs.size.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        byLang.size >= 3)
    }
    val got = graft.queries.Extended.queries("diag_l_diversity")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getString(4), r.getLong(5),
          r.getDouble(6), r.getBoolean(7)))
      .toMap
    assert(got.keySet == brute.keySet, "equivalence classes differ")
    brute.foreach { case (k, v) =>
      assert(got(k) == v, s"class $k: got ${got(k)}, brute $v")
    }
    // vacuousness guards: the audit must have something to flag AND
    // something to pass, or the verdict column is decoration
    assert(brute.values.exists(!_._6), "no non-diverse class — audit vacuous")
    assert(brute.values.exists(_._6), "no diverse class — audit vacuous")
  }
}
