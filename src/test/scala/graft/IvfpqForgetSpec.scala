package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.queries.Similarity

/** The index-erasure purge's PHYSICAL contract — what the value oracle
  * can't see: the rewrite touches exactly the forget set's inverted-list
  * footprint; every other list's file is never replaced (same path, same
  * byte length, same mtime), and the purged layout holds zero forgotten
  * vectors.
  */
class IvfpqForgetSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def listing(dir: java.nio.file.Path): Map[String, (Long, Long)] = {
    import scala.jdk.CollectionConverters._
    val ps = Files.walk(dir)
    try ps.iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
      .map(p => dir.relativize(p).toString ->
        (Files.size(p), Files.getLastModifiedTime(p).toMillis))
      .toMap
    finally ps.close()
  }

  test("index purge rewrites exactly the forgotten cells' lists and nothing else") {
    val dir = Files.createTempDirectory("ivfpq-forget-spec")
    try {
      Similarity.stageIvfpqLayout(spark, sf, dir.toString)
      val pre = listing(dir)
      val nf = Similarity.purgeForgotten(spark, sf, dir.toString)
      val post = listing(dir)
      assert(nf.nonEmpty, "the md5 forget set hit no cell — vacuous purge")
      // untouched lists: identical file path, size, and mtime — never opened
      val untouchedPre = pre.filter { case (p, _) =>
        !nf.keySet.exists(c => p.startsWith(s"cell=$c/")) }
      val untouchedPost = post.filter { case (p, _) =>
        !nf.keySet.exists(c => p.startsWith(s"cell=$c/")) }
      assert(untouchedPre.nonEmpty, "every cell affected — footprint check vacuous")
      assert(untouchedPre == untouchedPost,
        "an unaffected inverted list's file changed — the rewrite was not pruned")
      // affected lists changed, and the purged layout holds zero forgotten rows
      nf.keySet.foreach { c =>
        val before = pre.filter(_._1.startsWith(s"cell=$c/"))
        val after = post.filter(_._1.startsWith(s"cell=$c/"))
        assert(before != after, s"cell $c marked rewritten but files unchanged")
      }
      val back = spark.read.parquet(dir.toString)
      assert(back.filter(Similarity.forgetPred).count() === 0L,
        "forgotten vectors survive in the purged index")
      // survivors are intact: purged layout == logical index minus forget set
      val logical = Similarity.ivfpqCellsShared(spark, sf)
        .join(Similarity.pqCodesShared(spark, sf), Seq("vec_id"))
        .filter(!Similarity.forgetPred)
      assert(back.select(col("vec_id"), col("sub"), col("c_id"), col("cell").cast("long"))
        .exceptAll(logical.select(col("vec_id"), col("sub"), col("c_id"), col("cell")))
        .isEmpty && logical.count() === back.count(),
        "purged layout drifted from the logical survivor index")
    } finally graft.streaming.StagedEvents.deleteRecursively(dir)
  }
}
