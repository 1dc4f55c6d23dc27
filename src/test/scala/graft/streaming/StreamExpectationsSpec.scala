package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The per-batch granularity of the edge expectations: each micro-batch's
  * observed counters must equal its OWN slice's violation counts (that is
  * the alarm a bad load fires on), and the two batches must cover the
  * corpus exactly.
  */
class StreamExpectationsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("per-batch observed counters equal each parity slice's own counts") {
    val per = StreamExpectations.perBatch(spark, sf)
    assert(per.length === 2, s"expected 2 data batches, got $per")
    assert(per.map(_._1) === Seq(0, 1))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    Seq(0, 1).foreach { parity =>
      val slice = docs.filter(col("doc_id") % 2 === parity)
      val want = slice.agg(
        sum(when(col("text").isNull || trim(col("text")) === "", 1L)
          .otherwise(0L)),
        sum(when(col("n_chars") =!= length(col("text")), 1L).otherwise(0L)),
        sum(when(col("n_chars") < 60, 1L).otherwise(0L)),
        sum(when(col("n_chars") < 100, 1L).otherwise(0L)),
        count(lit(1))).head()
      val (_, rows, blank, lenmm, f60, f100) = per(parity)
      assert(rows === want.getLong(4), s"batch $parity input rows")
      assert(blank === want.getLong(0), s"batch $parity blank")
      assert(lenmm === want.getLong(1), s"batch $parity len mismatch")
      assert(f60 === want.getLong(2), s"batch $parity floor60")
      assert(f100 === want.getLong(3), s"batch $parity floor100")
      // the alarm path is live at fixture scale: the warn floor fires in
      // every slice (short docs exist in both parities)
      assert(f100 > 0L, s"batch $parity warn floor vacuously zero")
    }
  }
}
