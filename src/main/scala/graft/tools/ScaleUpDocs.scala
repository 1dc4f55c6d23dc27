package graft.tools

import org.apache.spark.sql.functions._

/** Scale-up generator for dedup-family profiling:
  * `graft.tools.ScaleUpDocs <srcSfDir> <outDir> <k>` writes a documents
  * table k× the source's row count.
  *
  * Replica 0 is the source verbatim; replica i > 0 rewrites every
  * whitespace token with an `r<i>_` marker and offsets doc_ids by
  * i·10^8. Marking every TOKEN (not appending a suffix to the doc) makes
  * each replica's shingle space disjoint from every other replica's, so
  * the duplicate-cluster STRUCTURE of the source corpus is preserved
  * exactly, per replica: cluster count scales ×k while the cluster-size
  * distribution — the thing that stresses LSH bucket widths and
  * connected-components round counts — stays what the source had. A naive
  * row-replicate would instead weld all k copies of every doc into one
  * mega-clique and profile a corpus no pipeline ever sees.
  *
  * Also writes a k× `embeddings` table for the ANN-family profiles:
  * replica i > 0 applies a deterministic ORTHOGONAL transform (circular
  * dimension shift by i plus alternating sign flips) and offsets vec_ids
  * by i·10^8. An orthogonal map preserves every within-replica L2
  * distance and cosine exactly, so each replica carries the source's
  * neighbor structure while contributing fresh vectors; the vec_id<10
  * probes and vec_id<16 training seeds stay replica-0 rows, which makes
  * the scaled run exactly the production shape "a fixed trained index /
  * probe set scans a k× corpus".
  */
object ScaleUpDocs {
  def main(args: Array[String]): Unit = {
    val (src, out, k) = (args(0), args(1), args(2).toInt)
    val spark = graft.Sessions.local(graft.Sessions.cpusOr("32"))
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.tables.Tables.documents(spark, src)
    val reps = (0 until k).map { i =>
      if (i == 0) docs
      else docs
        .select(
          (col("doc_id") + lit(i.toLong * 100000000L)).as("doc_id"),
          regexp_replace(col("text"), "(\\S+)", s"r${i}_$$1").as("text"),
          col("lang"), col("source"))
        // n_chars must describe the REWRITTEN text: dedup_canonical ranks
        // cluster canonicals by it, so a stale copy would disagree with
        // the actual lengths
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
    reps.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    println(s"wrote ${k}x documents to $out")

    val emb = graft.tables.Tables.embeddings(spark, src)
    val embReps = (0 until k).map { i =>
      if (i == 0) emb
      else emb.select(
        (col("vec_id") + lit(i.toLong * 100000000L)).as("vec_id"),
        expr(s"transform(sequence(0, size(embedding) - 1), j -> " +
          s"CAST(element_at(embedding, ((j + $i) % size(embedding)) + 1) * " +
          s"(CASE WHEN (j + $i) % 2 = 0 THEN 1.0 ELSE -1.0 END) AS FLOAT))").as("embedding"),
        col("label"))
    }
    embReps.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    println(s"wrote ${k}x embeddings to $out")
    spark.stop()
  }
}
