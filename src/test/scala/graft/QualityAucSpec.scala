package graft

import org.apache.spark.sql.functions._

/** text_quality_auc pins exact values via the oracle; this pins the
  * STATISTIC: the grouped rank formula must equal the O(P·N) pairwise
  * Mann-Whitney definition (wins + half-ties over all pos×neg pairs).
  */
class QualityAucSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("text_quality_auc equals brute-force pairwise AUC with half-tie credit") {
    def ratioU(pat: String) =
      expr(s"(length(regexp_replace(text, '$pat', '')) * 1000000L) div length(text)")
    val scored = graft.tables.Tables.documents(spark, sf)
      .withColumn("logit_u",
        lit(-900000L) + lit(2L) * ratioU("[^A-Za-z]") - lit(4L) * ratioU("[^0-9]")
          + ratioU("[^ ]") - lit(3L) * ratioU("[^A-Z]"))
      .select(col("source"), col("logit_u"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val brute = scored.groupBy(_._1).map { case (src, rows) =>
      val pos = rows.filter(_._3 == 1L).map(_._2)
      val neg = rows.filter(_._3 == 0L).map(_._2)
      val score = (for (p <- pos; n <- neg)
        yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
      src -> (pos.length.toLong, neg.length.toLong,
        math.rint(score / (pos.length.toDouble * neg.length) * 1e6) / 1e6)
    }
    val got = graft.queries.TextOps.queries("text_quality_auc")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got.keySet == brute.keySet, "source sets differ")
    brute.foreach { case (src, expect) =>
      assert(got(src) == expect, s"$src: got ${got(src)}, brute $expect")
    }
    // vacuousness guards: both classes present somewhere, and at least one
    // tied pos/neg score pair so the half-tie path is exercised
    assert(brute.values.exists(v => v._1 > 0 && v._2 > 0))
    val tied = scored.groupBy(r => (r._1, r._2)).values
      .exists(g => g.exists(_._3 == 1L) && g.exists(_._3 == 0L))
    assert(tied, "no tied pos/neg score — half-tie credit untested")
  }
}
