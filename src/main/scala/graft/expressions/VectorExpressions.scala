package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expressions for dense-vector math over array<double>
  * columns. The built-in higher-order functions (`aggregate`, `zip_with`)
  * evaluate a lambda per element in interpreted mode; these compile to a
  * tight primitive loop inside whole-stage codegen, which is the difference
  * between "works" and "fast" for 100 TB of embedding/peak-array scans.
  *
  * Semantics deliberately match a sequential left-to-right fold (identical
  * IEEE754 result to the HOF formulation and the DuckDB oracle).
  *
  * CONTRACT: defined for equal-length arrays of non-null elements only.
  * Mismatched lengths throw (fail-fast — silent truncation would diverge
  * from the HOF fold, which yields null there; an exception can't be
  * mistaken for an answer). Element nulls are NOT checked: every producing
  * site is either a source declaring containsNull=false or a transform of
  * one, and a per-element null branch would cost real time in the one loop
  * these expressions exist to make tight. A null element reads as 0 —
  * acceptable only because no call site can produce one; schemas that
  * merely DECLARE containsNull=true (nullable parquet fields that never
  * hold nulls) pass the type check on purpose.
  */
object VectorExpressions {
  private def e(c: Column): Expression = GraftColumnShim.expression(c)

  def dot(a: Column, b: Column): Column =
    GraftColumnShim.column(DotProduct(e(a), e(b)))
  def sum(a: Column): Column =
    GraftColumnShim.column(ArraySumD(e(a)))
  def l2sq(a: Column, b: Column): Column =
    GraftColumnShim.column(L2SqLong(e(a), e(b)))
  def dotLong(a: Column, b: Column): Column =
    GraftColumnShim.column(DotLong(e(a), e(b)))

  /** Shared length-equality guard for the binary folds (interpreted path). */
  private[expressions] def checkLen(name: String, x: ArrayData, y: ArrayData): Int = {
    val n = x.numElements()
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"$name: mismatched array lengths $n vs ${y.numElements()}")
    n
  }

  /** The same guard as generated Java (codegen path). */
  private[expressions] def lenGuardCode(name: String, a: String, b: String, n: String): String =
    s"""int $n = $a.numElements();
       |if ($n != $b.numElements()) {
       |  throw new IllegalArgumentException(
       |    "$name: mismatched array lengths " + $n + " vs " + $b.numElements());
       |}""".stripMargin
}

/** Σ aᵢ·bᵢ over two array<bigint> columns — exact integer dot product
  * (the LSH sign projection's inner loop: micro-unit coordinates × ±1
  * plane weights). Same primitive-loop codegen rationale as [[L2SqLong]];
  * integer addition is associative so the result is order-free and
  * bit-identical to the HOF fold and the DuckDB oracle.
  */
case class DotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.isInstanceOf[ArrayType] && right.dataType.isInstanceOf[ArrayType] &&
      left.dataType.asInstanceOf[ArrayType].elementType == LongType &&
      right.dataType.asInstanceOf[ArrayType].elementType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot_long expects two array<bigint> inputs, got ${left.dataType} / ${right.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot_long"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = VectorExpressions.checkLen(prettyName, x, y)
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |${VectorExpressions.lenGuardCode(prettyName, a, b, n)}
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σ (aᵢ-bᵢ)² over two array<bigint> columns — the exact integer-L2²
  * every ANN ranking stage folds per (vector, centroid/probe) pair. The
  * HOF formulation (`aggregate(zip_with(...))`) allocates a zipped
  * intermediate array and evaluates two lambdas per element; this is one
  * primitive loop in whole-stage codegen. Integer addition is
  * associative, so the result is bit-identical to the HOF fold and the
  * DuckDB oracle regardless of order.
  */
case class L2SqLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.isInstanceOf[ArrayType] && right.dataType.isInstanceOf[ArrayType] &&
      left.dataType.asInstanceOf[ArrayType].elementType == LongType &&
      right.dataType.asInstanceOf[ArrayType].elementType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_l2sq expects two array<bigint> inputs, got ${left.dataType} / ${right.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_l2sq"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = VectorExpressions.checkLen(prettyName, x, y)
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = x.getLong(i) - y.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val dv = ctx.freshName("d")
      s"""
         |${VectorExpressions.lenGuardCode(prettyName, a, b, n)}
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $dv = $a.getLong($i) - $b.getLong($i);
         |  $acc += $dv * $dv;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σ aᵢ·bᵢ over two array<double> columns (sequential order). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.isInstanceOf[ArrayType] && right.dataType.isInstanceOf[ArrayType] &&
      left.dataType.asInstanceOf[ArrayType].elementType == DoubleType &&
      right.dataType.asInstanceOf[ArrayType].elementType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects two array<double> inputs, got ${left.dataType} / ${right.dataType}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = VectorExpressions.checkLen(prettyName, x, y)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |${VectorExpressions.lenGuardCode(prettyName, a, b, n)}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σ aᵢ over an array<double> column (sequential order). */
case class ArraySumD(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[ArrayType] &&
      child.dataType.asInstanceOf[ArrayType].elementType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_arr_sum expects array<double>, got ${child.dataType}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_arr_sum"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $acc += $a.getDouble($i); }
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
