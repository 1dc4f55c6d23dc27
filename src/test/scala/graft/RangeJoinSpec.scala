package graft

import org.apache.spark.sql.functions._

/** The injected broadcast interval-join strategy (graft.plans): plan shape
  * and semantics vs a hand-computed expected result, including strict
  * bounds, null probes/bounds, and the equi-key bail-out.
  */
class RangeJoinSpec extends SparkSpec {

  private lazy val points = {
    import spark.implicits._
    Seq((1L, 1.0), (2L, 5.0), (3L, 10.0), (4L, 15.0), (5L, 100.0))
      .toDF("id", "x")
  }

  // overlapping, nested, and disjoint intervals + a null bound
  private lazy val intervals = {
    import spark.implicits._
    Seq(
      (10L, 0.0, 6.0),
      (20L, 4.0, 12.0),
      (30L, 9.0, 9.5),
      (40L, 14.0, 200.0),
      (50L, Double.NaN, 1.0)
    ).toDF("iid", "lo", "hi")
      .withColumn("lo", when(col("iid") === 50, lit(null)).otherwise(col("lo")))
  }

  test("interval join plans BroadcastRangeJoinExec, not nested-loop") {
    val joined = points.join(
      broadcast(intervals), col("x").between(col("lo"), col("hi")))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastRangeJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("interval join matches the nested-loop answer") {
    val got = points.join(
        broadcast(intervals), col("x").between(col("lo"), col("hi")))
      .select(col("id"), col("iid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // hand-computed: interval 50 has a null lo → never matches
    val expected = Set(
      (1L, 10L), (2L, 10L), (2L, 20L), (3L, 20L), (4L, 40L), (5L, 40L))
    assert(got === expected)
  }

  test("strict bounds are honored via full-condition recheck") {
    val got = points.join(
        broadcast(intervals), col("x") > col("lo") && col("x") < col("hi"))
      .select(col("id"), col("iid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // id=1 x=1.0 > lo=0.0 ok; boundary cases x=lo or x=hi excluded
    val expected = Set(
      (1L, 10L), (2L, 10L), (2L, 20L), (3L, 20L), (4L, 40L), (5L, 40L))
    assert(got === expected)
  }

  test("null probe produces no matches") {
    import spark.implicits._
    val withNull = points.withColumn(
      "x", when(col("id") === 1, lit(null)).otherwise(col("x")))
    val got = withNull.join(
        broadcast(intervals), col("x").between(col("lo"), col("hi")))
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(!got.contains(1L))
  }

  test("equi-key + range join still goes to hash join") {
    val p = points.withColumn("k", col("id") % 2)
    val iv = intervals.withColumn("k2", col("iid") % 2)
    val joined = p.join(broadcast(iv),
      col("k") === col("k2") && col("x").between(col("lo"), col("hi")))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastRangeJoin"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("null-safe equi key also bails out to hash join") {
    val p = points.withColumn("k", col("id") % 2)
    val iv = intervals.withColumn("k2", col("iid") % 2)
    val joined = p.join(broadcast(iv),
      col("k") <=> col("k2") && col("x").between(col("lo"), col("hi")))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastRangeJoin"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("randomized vs Spark-ordering nested loop, incl. NaN and infinities") {
    import spark.implicits._
    // Spark's total order puts NaN above +Infinity; mirror it for the oracle
    def geS(a: Double, b: Double): Boolean =
      if (a.isNaN) true else if (b.isNaN) false else a >= b
    val rnd = new scala.util.Random(20260812L)
    def draw(): Double = rnd.nextInt(20) match {
      case 0 => Double.NaN
      case 1 => Double.PositiveInfinity
      case 2 => Double.NegativeInfinity
      case _ => math.floor(rnd.nextDouble() * 200) / 2.0
    }
    val ps = (1L to 300L).map(id => (id, draw()))
    val ivs = (1L to 60L).map(id => (id, draw(), draw()))

    val got = ps.toDF("id", "x")
      .join(broadcast(ivs.toDF("iid", "lo", "hi")),
        col("x") >= col("lo") && col("x") <= col("hi"))
      .select(col("id"), col("iid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      (id, x) <- ps
      (iid, lo, hi) <- ivs
      if geS(x, lo) && geS(hi, x)
    } yield (id, iid)).toSet
    assert(got === expected)
  }

  test("residual conjuncts are applied") {
    val got = points.join(
        broadcast(intervals),
        col("x").between(col("lo"), col("hi")) && col("iid") =!= 10L)
      .select(col("id"), col("iid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = Set((2L, 20L), (3L, 20L), (4L, 40L), (5L, 40L))
    assert(got === expected)
  }
}
