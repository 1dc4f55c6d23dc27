package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel shared by interpreted eval and generated code (Scala
  * objects emit static forwarders, so codegen calls it directly).
  *
  * 64-bit SimHash: each token hashes to 64 bits (two 32-bit Murmur3 halves
  * with different seeds — the same primitive Spark's `hash()` uses); bit j
  * votes ±1 per token; the sign vector packs into a long.
  */
object SimHashUtil {
  def compute(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val counts = new Array[Int](64)
    var t = 0
    while (t < n) {
      val s = tokens.getUTF8String(t)
      // null elements are legal in array<string> inputs — skip, don't NPE
      if (s != null) {
        val lo = Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42)
        val hi = Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 13)
        val h = (hi.toLong << 32) | (lo.toLong & 0xffffffffL)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      t += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}

/** SimHash over an array<string> token column — a whole-document signature
  * in one pass, replacing a 64-way zip_with/aggregate HOF pyramid.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == ArrayType(StringType) ||
      child.dataType == ArrayType(StringType, containsNull = false))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects array<string>, got ${child.dataType}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(a: Any): Any =
    SimHashUtil.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      a => s"${ev.value} = graft.expressions.SimHashUtil.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  def apply(c: Column): Column =
    GraftColumnShim.column(SimHash64(GraftColumnShim.expression(c)))
}
