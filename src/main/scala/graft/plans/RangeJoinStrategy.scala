package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Cast, EqualNullSafe, EqualTo, Expression, GreaterThan, GreaterThanOrEqual,
  LessThan, LessThanOrEqual, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Join, JoinHint, LogicalPlan}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DoubleType, NumericType}

/** Planner strategy that recognizes a pure interval join — an inner join
  * whose condition bounds one numeric expression of the left side between a
  * lower and an upper expression of the (broadcast-small) right side, with
  * NO equi-join key — and plans [[BroadcastRangeJoinExec]] instead of
  * letting Spark fall back to BroadcastNestedLoopJoin.
  *
  * Joins with an extractable equi key are deliberately left to Spark's hash
  * join (the range conjunct rides along as a post-join filter there, which
  * is already efficient). The right side must be broadcastable: either
  * hinted (`broadcast(df)`) or under `autoBroadcastJoinThreshold` by stats.
  *
  * Injected via [[GraftExtensions]] (`spark.sql.extensions`); injected
  * strategies are consulted before the built-in ones, so a match here wins.
  */
object RangeJoinStrategy extends SparkStrategy with PredicateHelper {

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)

      def fromLeft(e: Expression): Boolean =
        e.references.nonEmpty && e.references.subsetOf(left.outputSet) && e.deterministic
      def fromRight(e: Expression): Boolean =
        e.references.nonEmpty && e.references.subsetOf(right.outputSet) && e.deterministic
      def numeric(e: Expression): Boolean = e.dataType.isInstanceOf[NumericType]

      // EqualNullSafe counts too: ExtractEquiJoinKeys plans hash joins for
      // both forms, and a hash join with a range residual beats our scan
      val hasEquiKey = conjuncts.exists {
        case EqualTo(a, b) =>
          (fromLeft(a) && fromRight(b)) || (fromLeft(b) && fromRight(a))
        case EqualNullSafe(a, b) =>
          (fromLeft(a) && fromRight(b)) || (fromLeft(b) && fromRight(a))
        case _ => false
      }

      // (probe from left, bound from right) pairs. Strict bounds are fine:
      // the non-strict index is a superset and the exec re-checks `cond`.
      val lowers = conjuncts.collect {
        case GreaterThanOrEqual(p, b) if fromLeft(p) && fromRight(b) && numeric(p) && numeric(b) => (p, b)
        case GreaterThan(p, b) if fromLeft(p) && fromRight(b) && numeric(p) && numeric(b) => (p, b)
        case LessThanOrEqual(b, p) if fromLeft(p) && fromRight(b) && numeric(p) && numeric(b) => (p, b)
        case LessThan(b, p) if fromLeft(p) && fromRight(b) && numeric(p) && numeric(b) => (p, b)
      }
      val uppers = conjuncts.collect {
        case LessThanOrEqual(p, b) if fromLeft(p) && fromRight(b) && numeric(p) && numeric(b) => (p, b)
        case LessThan(p, b) if fromLeft(p) && fromRight(b) && numeric(p) && numeric(b) => (p, b)
        case GreaterThanOrEqual(b, p) if fromLeft(p) && fromRight(b) && numeric(p) && numeric(b) => (p, b)
        case GreaterThan(b, p) if fromLeft(p) && fromRight(b) && numeric(p) && numeric(b) => (p, b)
      }
      val banded = lowers.flatMap { case (p, lo) =>
        uppers.collectFirst { case (p2, hi) if p2.semanticEquals(p) => (p, lo, hi) }
      }.headOption

      banded match {
        case Some((p, lo, hi)) if !hasEquiKey && canBroadcast(right, hint) =>
          def dbl(e: Expression): Expression =
            if (e.dataType == DoubleType) e else Cast(e, DoubleType)
          BroadcastRangeJoinExec(
            dbl(p), dbl(lo), dbl(hi), cond,
            planLater(left), planLater(right)) :: Nil
        case _ => Nil
      }
    case _ => Nil
  }

  private def canBroadcast(p: LogicalPlan, hint: JoinHint): Boolean =
    hint.rightHint.exists(_.strategy.contains(BROADCAST)) ||
      (p.stats.sizeInBytes >= 0 &&
        p.stats.sizeInBytes <= SQLConf.get.autoBroadcastJoinThreshold)
}
