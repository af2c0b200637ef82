package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Corpus, Dedup, Events, Multimodal, Similarity, TextAnalysis, TransitQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    TransitQueries.q4OccupancyPerRoute(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    TransitQueries.queries ++ Dedup.queries ++ Similarity.queries ++
      TextAnalysis.queries ++ Multimodal.queries ++ Corpus.queries ++
      Events.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    TransitQueries.oracleSql ++ Dedup.oracleSql ++ Similarity.oracleSql ++
      TextAnalysis.oracleSql ++ Multimodal.oracleSql ++ Corpus.oracleSql ++
      Events.oracleSql
}
