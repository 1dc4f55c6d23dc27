package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q5_multijoin")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.TextOps.queries ++
      graft.queries.Similarity.queries ++
      graft.queries.Temporal.all ++
      graft.queries.Extended.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++
      graft.queries.TextOps.oracle ++
      graft.queries.Similarity.oracle ++
      graft.queries.Temporal.oracle ++
      graft.queries.Extended.oracle

  /** [[oracleSql]] plus the data-dependent oracles that can only be
    * generated against a concrete data dir (emb_pca_topk embeds its
    * eigenbasis as SQL literals). Verify dumps THIS map, so the driver's
    * DuckDB gate sees every query fully oracled.
    */
  def oracleSqlFor(spark: SparkSession, sfDir: String): Map[String, String] =
    oracleSql +
      ("emb_pca_topk" -> graft.queries.Similarity.pcaOracleSql(spark, sfDir)) +
      ("emb_whitening" -> graft.queries.Similarity.whiteningOracleSql(spark, sfDir)) +
      ("sim_opq_code_gain" -> graft.queries.Similarity.opqOracleSql(spark, sfDir)) +
      ("sim_opq_recall" -> graft.queries.Similarity.opqRecallSql(spark, sfDir)) +
      ("sim_opq_ivfpq_gain" -> graft.queries.Similarity.opqIvfpqGainSql(spark, sfDir)) +
      ("sim_opq_rerank_gain" -> graft.queries.Similarity.opqRerankGainSql(spark, sfDir)) +
      ("stream_opq_encode" -> graft.queries.Similarity.opqStreamCodesSql(spark, sfDir)) +
      ("stream_opq_probe" -> graft.queries.Similarity.opqAdcProbeSql(spark, sfDir)) +
      ("pipeline_hybrid_retrieval" -> graft.queries.Similarity.hybridRetrievalSql(spark, sfDir)) +
      ("pipeline_hybrid_gain" -> graft.queries.Similarity.hybridGainSql(spark, sfDir)) +
      ("pipeline_hybrid_ksweep" -> graft.queries.Similarity.hybridKsweepSql(spark, sfDir)) +
      ("pipeline_hybrid_depth_curve" -> graft.queries.Similarity.hybridDepthCurveSql(spark, sfDir)) +
      ("pipeline_retrieval_metrics" -> graft.queries.Similarity.hybridMetricsSql(spark, sfDir)) +
      ("sim_opq_train_curve" -> graft.queries.Similarity.opqTrainCurveSql(spark, sfDir)) +
      ("text_quality_isotonic" -> graft.queries.TextOps.isotonicOracleSql(spark, sfDir))
}
