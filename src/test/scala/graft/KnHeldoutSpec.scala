package graft

/** text_kn_heldout pins exact values via its oracle on the real tables;
  * this synthesizes a four-doc corpus whose held-out half exercises ALL
  * THREE probability branches (seen pair, unseen pair with seen context,
  * fully unseen context) and replays the Kneser-Ney and add-one scoring
  * in driver Scala with the identical arithmetic order.
  */
class KnHeldoutSpec extends SparkSpec {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def lpu(p: Double): Long =
    BigDecimal(math.log(p) * 1000000)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("KN + add-one held-out scoring replays exactly on a corpus hitting all three backoff branches") {
    val docs = Seq(
      (0L, "a b a c"),   // train
      (1L, "a b x b d"), // held: seen (a,b),(b,d); unseen pair (b,x); unseen ctx (x,b)
      (2L, "a b d"),     // train
      (3L, "q q"))       // held: fully unseen context
    val dir = java.nio.file.Files.createTempDirectory("kn-fixture")
    try {
      import spark.implicits._
      docs.map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(dir.resolve("documents.parquet").toString)

      // driver-side replay
      def bigrams(t: String) = t.split("\\s+").toSeq.sliding(2).toSeq
        .collect { case Seq(a, b) if a.nonEmpty && b.nonEmpty => (a, b) }
      val trainBg = docs.filter(_._1 % 2 == 0).flatMap(d => bigrams(d._2))
      val c2 = trainBg.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val c1 = c2.toSeq.groupBy(_._1._1).map { case (w1, xs) =>
        w1 -> (xs.map(_._2).sum, xs.size.toLong)
      }
      val cont = c2.toSeq.groupBy(_._1._2).map { case (w2, xs) => w2 -> xs.size.toLong }
      val dd = c2.size.toLong
      val vv = docs.filter(_._1 % 2 == 0)
        .flatMap(_._2.split("\\s+")).filter(_.nonEmpty).distinct.size.toLong
      val expect = docs.filter(_._1 % 2 == 1).map { case (id, t) =>
        val bs = bigrams(t)
        val scored = bs.map { case (w1, w2) =>
          val pc = (cont.getOrElse(w2, 0L) + 1L).toDouble / (dd + vv).toDouble
          val pkn = c2.get((w1, w2)) match {
            case Some(n) =>
              val (nctx, ntypes) = c1(w1)
              (n - 0.75) / nctx + 0.75 * ntypes / nctx * pc
            case None => c1.get(w1) match {
              case Some((nctx, ntypes)) => 0.75 * ntypes / nctx * pc
              case None                 => pc
            }
          }
          val p1 = (c2.getOrElse((w1, w2), 0L) + 1L).toDouble /
            (c1.get(w1).map(_._1).getOrElse(0L) + vv).toDouble
          (if (c2.contains((w1, w2))) 0L else 1L, lpu(pkn), lpu(p1))
        }
        val n = scored.size.toLong
        (id, n, scored.map(_._1).sum,
          round6(-scored.map(_._2).sum.toDouble / 1000000.0 / n),
          round6(-scored.map(_._3).sum.toDouble / 1000000.0 / n))
      }.sortBy(_._1)
      // branch coverage: the fixture genuinely hits all three branches
      assert(expect.find(_._1 == 1L).get._3 == 2L, "doc 1 must have 2 unseen bigrams")
      assert(expect.find(_._1 == 3L).get._3 == 1L, "doc 3 must be fully unseen")

      val got = graft.queries.TextOps.queries("text_kn_heldout")(spark, dir.toString)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4)))
        .sortBy(_._1)
      assert(got.toSeq == expect,
        s"KN replay differs:\n got   ${got.toSeq}\n brute $expect")
    } finally graft.streaming.StagedEvents.deleteRecursively(dir)
  }
}
