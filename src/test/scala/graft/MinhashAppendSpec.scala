package graft

import org.apache.spark.sql.functions._

/** Append-exactness of the MinHash LSH index: a slice's band rows
  * computed from the slice ALONE must equal its rows in the full-corpus
  * build (signatures are per-document; the only corpus coupling is the
  * hot-shingle df-cap, which does not fire at any test scale — if it
  * ever did, slice-local and corpus-global caps could legitimately
  * diverge and this spec would catch the scheme change).
  */
class MinhashAppendSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def isBatch = conv(substring(md5(concat(lit("inc"),
    col("doc_id").cast("string"))), 1, 15), 16, 10).cast("long") % 8L === 0L

  test("slice-built band rows equal the slice's rows in the full build") {
    val full = graft.queries.TextOps.minhashBandsShared(spark, sf)
      .filter(isBatch)
      .collect().map(_.toString).sorted.toSeq
    val slice = graft.queries.TextOps.sliceBandRows(spark, sf, isBatch)
      .collect().map(_.toString).sorted.toSeq
    assert(slice.nonEmpty, "empty slice — the append-exactness test is vacuous")
    assert(slice === full)
  }

  test("appended pair set equals the full rebuild's pair set, origins partition it") {
    val appended = graft.queries.TextOps.queries("dedup_minhash_append")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"), r.getAs[String]("origin")))
    val rebuilt = graft.queries.TextOps.queries("dedup_minhash_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(appended.map(t => (t._1, t._2)).sorted.toSeq === rebuilt)
    // origin tags must agree with the salted split, pairwise
    appended.foreach { case (da, db, origin) =>
      def b(x: Long) = {
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(s"inc$x".getBytes("UTF-8")).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(md.take(15), 16) % 8 == 0
      }
      val want =
        if (b(da) && b(db)) "batch_batch"
        else if (b(da) || b(db)) "base_batch"
        else "base_base"
      assert(origin === want, s"pair ($da, $db)")
    }
  }

  test("winnowing: slice-built selections equal the slice's rows in the full build") {
    val full = graft.queries.TextOps.winnowSelectionsShared(spark, sf)
      .filter(isBatch)
      .collect().map(_.toString).sorted.toSeq
    val slice = graft.queries.TextOps.sliceWinnowSelections(spark, sf, isBatch)
      .collect().map(_.toString).sorted.toSeq
    assert(slice.nonEmpty, "empty slice — the append-exactness test is vacuous")
    assert(slice === full)
  }

  test("winnowing: appended pair set equals the full rebuild's pair set") {
    val appended = graft.queries.TextOps.queries("dedup_winnowing_append")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"),
        r.getAs[Long]("n_shared"))).sorted.toSeq
    val rebuilt = graft.queries.TextOps.queries("dedup_winnowing_pairs")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"),
        r.getAs[Long]("n_shared"))).sorted.toSeq
    assert(appended.nonEmpty)
    assert(appended === rebuilt)
  }
}
