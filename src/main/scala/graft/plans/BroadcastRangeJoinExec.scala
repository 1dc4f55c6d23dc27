package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, BindReferences, Expression, JoinedRow, Predicate, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.physical.{
  BroadcastDistribution, Distribution, IdentityBroadcastMode, Partitioning,
  UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

import scala.collection.mutable.ArrayBuffer

/** Broadcast interval join: `streamed.probe BETWEEN build.lo AND build.hi`
  * with a small build side (the interval table).
  *
  * Spark's planner has no physical operator for a pure non-equi range join —
  * it falls back to BroadcastNestedLoopJoin, which tests every (row,
  * interval) pair: O(|streamed| * |build|). This operator instead sorts the
  * broadcast intervals by `lo` once per task and keeps a running prefix
  * maximum of `hi`, so each probe does a binary search for the last interval
  * with `lo <= x` and then walks left only while `maxHi(i) >= x` — touching
  * just the candidate intervals instead of all of them. This is the shape of
  * the reference's feature→scans interval join (ms1_feature_finder.py:
  * 186-187,307-322) at 100 TB: millions of scans probed against a broadcast
  * feature-bounding-box table.
  *
  * Correctness does not depend on the index: `fullCondition` (the original
  * join predicate, including strict bounds and any residual conjuncts) is
  * re-evaluated on every candidate pair; the lo/hi index is only a superset
  * pre-filter. `probe`/`lo`/`hi` are pre-cast to double by the strategy.
  *
  * The build side is materialized through a normal BroadcastExchange
  * (`BroadcastDistribution(IdentityBroadcastMode)`), so the exchange is
  * planned, reused, and AQE-managed exactly like Spark's own broadcast joins.
  */
case class BroadcastRangeJoinExec(
    probe: Expression,
    lo: Expression,
    hi: Expression,
    fullCondition: Expression,
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  protected override def doExecute(): RDD[InternalRow] = {
    val broadcastRelation = right.executeBroadcast[Array[InternalRow]]()
    val loBound = BindReferences.bindReference(lo, right.output)
    val hiBound = BindReferences.bindReference(hi, right.output)
    val probeBound = BindReferences.bindReference(probe, left.output)
    val cond = fullCondition
    val allOutput = output

    left.execute().mapPartitions { streamIter =>
      // Spark's comparison ordering puts NaN ABOVE every other double
      // (x <= NaN is true for all x), while Java's NaN comparisons are all
      // false. Normalizing NaN to +inf makes the Java-compared index a
      // superset of Spark's semantics — a NaN hi admits every probe >= lo,
      // a NaN probe/lo only pairs with +inf-normalized counterparts — and
      // the fullCondition recheck (Spark semantics) restores exactness.
      def norm(d: Double): Double =
        if (java.lang.Double.isNaN(d)) Double.PositiveInfinity else d

      // Build the sorted interval index once per task from the broadcast
      // rows (cheap: the build side is broadcast-small by construction).
      val buildRows = broadcastRelation.value
      val entries = new ArrayBuffer[(Double, Double, InternalRow)](buildRows.length)
      buildRows.foreach { r =>
        val l = loBound.eval(r)
        val h = hiBound.eval(r)
        // A null bound can never satisfy the join predicate — drop it here.
        if (l != null && h != null)
          entries += ((norm(l.asInstanceOf[Double]), norm(h.asInstanceOf[Double]), r))
      }
      val sorted = entries.sortBy(_._1).toArray
      val los = sorted.map(_._1)
      val maxHi = new Array[Double](sorted.length)
      var runningMax = Double.NegativeInfinity
      var i = 0
      while (i < sorted.length) {
        runningMax = math.max(runningMax, sorted(i)._2)
        maxHi(i) = runningMax
        i += 1
      }

      val joined = new JoinedRow
      val project = UnsafeProjection.create(allOutput, allOutput)
      val predicate = Predicate.create(cond, allOutput)
      predicate.initialize(0)

      streamIter.flatMap { streamRow =>
        val x = probeBound.eval(streamRow)
        if (x == null || sorted.isEmpty) Iterator.empty
        else {
          val xv = norm(x.asInstanceOf[Double])
          // last index with lo <= xv (binary search on the sorted lows)
          var a = 0
          var b = los.length
          while (a < b) {
            val mid = (a + b) >>> 1
            if (los(mid) <= xv) a = mid + 1 else b = mid
          }
          val matches = new ArrayBuffer[InternalRow]
          var j = a - 1
          // prefix-max prune: once every interval to the left ends before
          // xv, no earlier interval can contain it.
          while (j >= 0 && maxHi(j) >= xv) {
            if (sorted(j)._2 >= xv) {
              joined(streamRow, sorted(j)._3)
              if (predicate.eval(joined)) matches += project(joined).copy()
            }
            j -= 1
          }
          matches.iterator
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastRangeJoinExec =
    copy(left = newLeft, right = newRight)
}
