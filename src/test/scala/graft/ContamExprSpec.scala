package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.ContamExpressions

/** The native contamination-gate expressions must be BIT-IDENTICAL to
  * the interpreted-HOF formulation they replaced (which is what the
  * DuckDB oracle replays): same shingles, same md5-derived (h1, h2),
  * same Kirsch-Mitzenmacher positions, same probe verdicts.
  */
class ContamExprSpec extends SparkSpec {
  import spark.implicits._

  private val M = 65536
  private val K = 4

  /** The pre-expression SQL formulation, verbatim from ContamGate r11. */
  private def hofPairs = {
    val t = col("t")
    val grams = array_distinct(
      when(size(t) >= 4, transform(sequence(lit(1), size(t) - 3),
        i => array_join(slice(t, i, lit(4)), " ")))
        .otherwise(array()))
    transform(transform(grams, s => md5(s)), dg => struct(
      conv(substring(dg, 1, 15), 16, 10).cast("long").as("h1"),
      (conv(substring(dg, 17, 15), 16, 10).cast("long") % lit(1L << 55)).as("h2")))
  }

  private val docs = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b c d e f g h a b c d", // repeated shingles → distinct matters
    "too short",
    "", // empty
    "exactly four tokens here",
    "Unicode tokens café naïve über straße mixed in here too",
    (1 to 200).map(i => s"tok$i").mkString(" ") // long doc
  ).toDF("text").select(split(trim(col("text")), "\\s+").as("t"))

  test("positions: native expression equals the HOF md5/KM arithmetic") {
    val hof = docs.select(explode(
      transform(hofPairs, p => transform(sequence(lit(0), lit(K - 1)),
        j => (p.getField("h1") + j * p.getField("h2")) % M))).as("ps"))
      .select(explode(col("ps")).as("p"))
      .as[Long].collect().sorted.toSeq
    val native = docs
      .select(ContamExpressions.positions(col("t"), M, K).as("ps"))
      .select(explode(col("ps")).as("p"))
      .as[Long].collect().sorted.toSeq
    assert(native == hof)
  }

  test("probe: native (n_sh, nc) equals the HOF filter/forall probe") {
    // bitmap from doc 0 and doc 4's own shingles: those docs must read
    // fully contaminated, the others mostly clean
    val seed = Seq("the quick brown fox jumps over the lazy dog",
      "exactly four tokens here")
      .toDF("text").select(split(trim(col("text")), "\\s+").as("t"))
    val ps = seed.select(explode(
      transform(hofPairs, p => transform(sequence(lit(0), lit(K - 1)),
        j => (p.getField("h1") + j * p.getField("h2")) % M))).as("ps"))
      .select(explode(col("ps")).as("p")).distinct().as[Long].collect()
    val bits = new Array[Byte](M / 8)
    ps.foreach(p =>
      bits(p.toInt >> 3) = (bits(p.toInt >> 3) | (1 << (p.toInt & 7))).toByte)
    val bset = ps.toSet

    val native = docs
      .select(ContamExpressions.probe(col("t"), bits, M, K).as("pr"))
      .select(element_at(col("pr"), 1).as("n_sh"), element_at(col("pr"), 2).as("nc"))
      .as[(Long, Long)].collect().toSeq
    // reference: replay in plain Scala over the HOF pair extraction
    val ref = docs.select(hofPairs.as("hs"))
      .as[Seq[(Long, Long)]].collect().toSeq
      .map { hs =>
        val nc = hs.count { case (h1, h2) =>
          (0 until K).forall(j => bset((h1 + j * h2) % M)) }
        (hs.size.toLong, nc.toLong)
      }
    assert(native == ref)
    // and the seeded docs are fully hit (Bloom has no false negatives)
    assert(native.head._1 == native.head._2 && native.head._1 > 0)
    assert(native(4)._1 == native(4)._2 && native(4)._1 > 0)
  }

  test("probe stays inside WholeStageCodegen (no CodegenFallback span break)") {
    val bits = new Array[Byte](M / 8)
    val plan = docs
      .select(ContamExpressions.probe(col("t"), bits, M, K).as("pr"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CodegenFallback"), plan)
  }
}
