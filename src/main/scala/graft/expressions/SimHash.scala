package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Static kernel shared by interpreted eval and generated code (Scala
  * objects emit static forwarders, so codegen calls it directly).
  *
  * 60-bit SimHash: each token hashes to the TOP 60 bits of its md5 digest —
  * exactly the engine-portable `('0x' || substr(md5(t), 1, 15))::BIGINT`
  * rule the other dedup oracles use, so a DuckDB query reproduces the
  * signature bit-for-bit (the Murmur3 variant this replaces was
  * engine-internal and could only be rows-checked). Bit j votes ±1 per
  * token; the sign vector (count > 0 ⇒ 1) packs into a long.
  */
object SimHashUtil {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of md5(bytes) == ('0x' || substr(md5(s), 1, 15))::BIGINT. */
  def md5Top60(bytes: Array[Byte]): Long = {
    val d = md5.get()
    d.reset()
    val digest = d.digest(bytes)
    var first = 0L
    var i = 0
    while (i < 8) { first = (first << 8) | (digest(i) & 0xffL); i += 1 }
    first >>> 4
  }

  def compute(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val counts = new Array[Int](60)
    var t = 0
    while (t < n) {
      val s = tokens.getUTF8String(t)
      // null elements are legal in array<string> inputs — skip, don't NPE
      if (s != null) {
        val h = md5Top60(s.getBytes)
        var j = 0
        while (j < 60) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      t += 1
    }
    var out = 0L
    var j = 0
    while (j < 60) {
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
