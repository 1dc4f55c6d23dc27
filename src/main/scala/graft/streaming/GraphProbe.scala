package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The streamed GRAPH-ANN probe — sim_knn_graph_entry's hier strategy as
  * a serving path, closing the graph family's loop the way
  * [[CompactedProbe]] closed IVF-PQ's: probes arrive as a micro-batch
  * stream, the per-probe ENTRY is chosen in-stream (exact cosine against
  * the broadcast md5-sampled upper layer — the bounded ~N/8 table a
  * serving tier keeps hot, so entry selection is a stateless stream-static
  * join + one complete-mode argmax), and the 3-round B=8 beam walk runs
  * batch-side over the drained ≤|probes|-row entry set, reading adjacency
  * per hop from the stage-once partitionBy(blk) serving layout with the
  * beam's block set as a literal partition filter (hop I/O == blocks
  * visited, the sim_knn_graph_search_compacted read path).
  *
  * The whole streamed path must land on the batch hier leg's own answer:
  * the oracle replays the generated build chain + the hier-entry walk,
  * top-5 with cos and rank — hash for hash (the stream_compacted_probe
  * contract: a serving regime is correct only if it answers identically
  * to the batch query it serves).
  */
object GraphProbe {

  /** One drain per (session, dir, stamp) — serving reps read the memo. */
  private val memo = new ReplayMemo(2)

  def hierTop5(spark: SparkSession, sfDir: String): DataFrame =
    graft.tables.Tables.withShufflePartitions(spark, 4) {
      import graft.queries.Similarity
      val dot = graft.expressions.VectorExpressions.dot _
      val vecs = graft.tables.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("v"))
        .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      // the upper layer a tier serves entries from: ~N/8 by salted md5,
      // the same standardized rule as the batch query — bounded, broadcast
      val layer = vecs.filter(
        conv(substring(md5(concat(lit("hl"), col("vec_id").cast("string"))), 1, 15),
          16, 10).cast("long") % 8L === 0L)
        .select(col("vec_id").as("cand"), col("v").as("lv"), col("nrm").as("ln_"),
          lit(1).as("k"))
      val drained = memo.getOrRun(spark, sfDir, tag = "stream_graph_probe") {
        val staged = java.nio.file.Files.createTempDirectory("stream-graph-probe")
        try {
          val probes = graft.tables.Tables.embeddings(spark, sfDir)
            .filter(col("vec_id") < 10)
          require(probes.head(1).nonEmpty,
            s"$sfDir/embeddings.parquet has no probe rows — cannot stage a probe stream")
          StagedEvents.writePart(probes.filter(col("vec_id") % 2 === 0),
            staged, "b0_probes.parquet", 60)
          StagedEvents.writePart(probes.filter(col("vec_id") % 2 === 1),
            staged, "b1_probes.parquet", 45)
          val schema =
            spark.read.parquet(staged.resolve("b0_probes.parquet").toString).schema
          // entry selection in-stream: score the probe against the whole
          // broadcast layer (an equi-join on a constant key — broadcast
          // hash, streaming-legal), argmax as a complete-mode MIN over
          // (−cos, cand) structs — the batch leg's exact tie rule
          val entries = spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(staged.toString)
            .select(col("vec_id").as("q_id"),
              transform(col("embedding"), x => x.cast("double")).as("qv"))
            .withColumn("qn", sqrt(dot(col("qv"), col("qv"))))
            .withColumn("k", lit(1))
            .join(broadcast(layer), Seq("k"))
            .filter(col("cand") =!= col("q_id"))
            .select(col("q_id"),
              round(dot(col("qv"), col("lv")) / (col("qn") * col("ln_")), 6)
                .as("cos"), col("cand"))
            .groupBy(col("q_id"))
            .agg(min(struct((-col("cos")).as("nc"), col("cand").as("cand")))
              .as("e"))
            .select(col("q_id"), col("e.cand").as("cand"))
          Drain.toMemoryWithProgress(spark, "stream_graph_probe", entries,
            mode = "complete")
        } finally StagedEvents.deleteRecursively(staged)
      }._1
      // batch tail: the identical 3-round B=8 walk from the drained
      // entries, adjacency read per hop from the compacted layout with
      // the beam's blocks as the partition filter
      val dir = Similarity.knnLayoutDir(spark, sfDir)
      val probes = vecs.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
      def score(cand: DataFrame): DataFrame =
        cand
          .join(vecs.select(col("vec_id").as("cand"), col("v"), col("nrm")),
            Seq("cand"))
          .join(broadcast(probes), Seq("q_id"))
          .select(col("q_id"), col("cand"),
            round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6).as("cos"))
      val wB = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("cos").desc, col("cand"))
      var beam = drained.select(col("q_id"), col("cand"))
      var visited: DataFrame = null
      for (_ <- 1 to 3) {
        // bounded collect (≤ 16 block ints): the hop's partition filter
        val blocks = beam
          .select(Similarity.knnBlkOf(col("cand")).cast("int").as("blk"))
          .distinct().collect().map(_.getInt(0)).sorted
        val adj = spark.read.parquet(dir)
          .filter(col("blk").isin(blocks.map(Integer.valueOf): _*))
          .select(col("vec_id").as("cand"), col("nbr"))
        val expand = beam.join(adj, Seq("cand"))
          .select(col("q_id"), col("nbr").as("cand"))
          .filter(col("cand") =!= col("q_id"))
          .distinct()
        val scored = score(expand)
        // per-round lineage truncation — the bfsFrom discipline
        visited = graft.queries.SessionCaches.loopCheckpoint(
          if (visited == null) scored
          else visited.unionByName(scored).distinct())
        beam = visited.withColumn("r", row_number().over(wB))
          .filter(col("r") <= 8).select(col("q_id"), col("cand"))
      }
      visited.withColumn("rank", row_number().over(wB)).filter(col("rank") <= 5)
        .select(col("q_id"), col("cand").as("vec_id"), col("cos"),
          col("rank").cast("int").as("rank"))
    }
}
