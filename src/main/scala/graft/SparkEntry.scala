package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — flagship query + the full named-query surface with
  * DuckDB oracle twins (see SURVEY.md §7.0 and the per-module Scaladoc:
  * graft.analytics.Queries, graft.dedup.Dedup, graft.similarity.Ann,
  * graft.text.TextStats).
  */
object SparkEntry {

  /** Flagship: the canonical star join (reference JOIN_SKILL_ON_COURSE,
    * /root/reference/main.py:491-496) on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    analytics.Queries.qJoinStar(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ the
    * training-pipeline operators: dedup, ANN, text analysis). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    analytics.Queries.queries ++
      analytics.FuzzyQueries.queries ++
      analytics.Mining.queries ++
      dedup.Dedup.queries ++
      similarity.Ann.queries ++
      text.TextStats.queries ++
      ml.MlOps.queries

  /** DuckDB ANSI twins. Keys absent here (q_dedup_minhash,
    * q_dedup_simhash, q_dedup_clusters, q_ann_lsh, q_fuzzy_join,
    * q_best_match, q_theme_search, q_theme_grouped, q_tfidf_similar,
    * q_tfidf_lsh, q_kmeans_clusters) are probabilistic / UDF / ML
    * operators verified by ScalaTest properties instead; the driver
    * records a rows-only check for them. */
  def oracleSql: Map[String, String] =
    analytics.Queries.oracles ++
      analytics.FuzzyQueries.oracles ++
      analytics.Mining.oracles ++
      dedup.Dedup.oracles ++
      similarity.Ann.oracles ++
      text.TextStats.oracles ++
      ml.MlOps.oracles
}
