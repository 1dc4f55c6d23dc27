package graft.expressions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the Bloom contamination gate's hot
  * path ([[graft.streaming.ContamGate]]): token array → distinct 4-gram
  * shingles → one md5 per shingle → Kirsch-Mitzenmacher positions
  * (h1 + j·h2) mod m → bitmap probes. The HOF formulation
  * (transform/filter/forall over a 16384-element array literal) runs
  * INTERPRETED — Catalyst evaluates every lambda per element per row —
  * which left ~10M interpreted md5s + element_at probes as the gate's
  * whole cost (5.2 s/rep at sf0.1 after two earlier rewrites of the same
  * path). Here the per-document loop is one compiled method: the only
  * per-row plan work is a single virtual call, and the bitmap rides
  * along as a reference object (8 KiB byte[]) instead of a plan literal.
  *
  * Semantics are BIT-IDENTICAL to the SQL the DuckDB oracle replays:
  * shingle text = array_join(slice(t, i, 4), ' ') over the raw token
  * array, digest = md5 of its UTF-8 bytes, h1 = first 15 hex digits
  * (60 bits), h2 = hex digits 17..31 mod 2^55, position j =
  * (h1 + j·h2) mod 65536. Distinctness is by shingle STRING (the
  * array_distinct the HOF applied before hashing).
  */
object ContamExpressions {
  private def e(c: Column): Expression = GraftColumnShim.expression(c)

  /** (n_shingles, n_contaminated) as array<bigint>[2] for one doc's
    * token array, probed against `bits` (m/8 = 8192 bytes, bit p =
    * byte p>>3, mask 1 << (p & 7)).
    */
  def probe(tokens: Column, bits: Array[Byte], m: Int, k: Int): Column =
    GraftColumnShim.column(ContamProbe(e(tokens), bits, m, k))

  /** All k positions of every distinct shingle in one doc's token array
    * — the Bloom BUILD side (explode + distinct + collect downstream).
    */
  def positions(tokens: Column, m: Int, k: Int): Column =
    GraftColumnShim.column(ContamPositions(e(tokens), m, k))

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val HEX = "0123456789abcdef".toCharArray

  /** (h1, h2) of one shingle string: md5 hex digits [0,15) and [16,31)
    * parsed base-16, h2 reduced mod 2^55 — the exact arithmetic of
    * conv(substring(md5(s), 1, 15), 16, 10) /
    * conv(substring(md5(s), 17, 15), 16, 10) % 2^55.
    */
  private[expressions] def hashPair(shingle: String): (Long, Long) = {
    val d = md5Local.get()
    d.reset()
    val dig = d.digest(shingle.getBytes(StandardCharsets.UTF_8))
    // first 15 hex digits = bytes 0..6 (14 digits) + high nibble of byte 7
    var h1 = 0L
    var i = 0
    while (i < 7) { h1 = (h1 << 8) | (dig(i) & 0xffL); i += 1 }
    h1 = (h1 << 4) | ((dig(7) & 0xf0L) >> 4)
    // hex digits 16..30 (0-based) = low nibble of byte 7 is digit 15 —
    // digit 16 starts at byte 8: bytes 8..14 (14 digits) + high nibble
    // of byte 15
    var h2 = 0L
    i = 8
    while (i < 15) { h2 = (h2 << 8) | (dig(i) & 0xffL); i += 1 }
    h2 = (h2 << 4) | ((dig(15) & 0xf0L) >> 4)
    (h1, h2 % (1L << 55))
  }

  /** Distinct 4-gram shingle strings of a token array (insertion order,
    * matching array_distinct's first-occurrence order — order only
    * matters for the build side's array layout, never for results).
    */
  private[expressions] def shingles(toks: ArrayData): java.util.LinkedHashSet[String] = {
    val n = toks.numElements()
    val out = new java.util.LinkedHashSet[String]()
    if (n >= 4) {
      var i = 0
      while (i <= n - 4) {
        val sb = new java.lang.StringBuilder()
        sb.append(toks.getUTF8String(i).toString).append(' ')
          .append(toks.getUTF8String(i + 1).toString).append(' ')
          .append(toks.getUTF8String(i + 2).toString).append(' ')
          .append(toks.getUTF8String(i + 3).toString)
        out.add(sb.toString)
        i += 1
      }
    }
    out
  }
}

/** array<bigint>[n_shingles, n_contaminated] of one document — the whole
  * per-row gate in one compiled call. A shingle is contaminated iff all
  * k of its (h1 + j·h2) mod m bits are set in the 8 KiB bitmap carried
  * as a reference object.
  */
case class ContamProbe(child: Expression, bits: Array[Byte], m: Int, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_contam_probe expects array<string> tokens, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_contam_probe"

  def run(toks: ArrayData): ArrayData = {
    val sh = ContamExpressions.shingles(toks)
    var nc = 0L
    val it = sh.iterator()
    while (it.hasNext) {
      val (h1, h2) = ContamExpressions.hashPair(it.next())
      var hit = true
      var j = 0
      while (hit && j < k) {
        val p = ((h1 + j * h2) % m).toInt
        hit = (bits(p >> 3) & (1 << (p & 7))) != 0
        j += 1
      }
      if (hit) nc += 1L
    }
    new GenericArrayData(Array(sh.size.toLong, nc))
  }

  override def nullSafeEval(input: Any): Any = run(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the loop body is compiled Scala; codegen emits ONE call per row so
    // the expression stays inside the WholeStageCodegen span
    val ref = ctx.addReferenceObj("contamProbe", this, classOf[ContamProbe].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.run($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** array<bigint> of all k Bloom positions of every distinct shingle in
  * one document — the build side ([[ContamProbe]]'s dual): downstream
  * explode + distinct + bounded collect assemble the bitmap.
  */
case class ContamPositions(child: Expression, m: Int, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_contam_positions expects array<string> tokens, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_contam_positions"

  def run(toks: ArrayData): ArrayData = {
    val sh = ContamExpressions.shingles(toks)
    val out = new Array[Long](sh.size * k)
    var w = 0
    val it = sh.iterator()
    while (it.hasNext) {
      val (h1, h2) = ContamExpressions.hashPair(it.next())
      var j = 0
      while (j < k) {
        out(w) = (h1 + j * h2) % m
        w += 1; j += 1
      }
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = run(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("contamPositions", this, classOf[ContamPositions].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.run($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
