package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{CoreQueries, Corpus, DataQuality, Dedup, EntityResolution, Graph, Multimodal, Redaction, Similarity, Stats, TextAnalysis, TimeSeries, WindowedEvents}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the oracle-checked operator inventory (SURVEY §2) over
  * the star-schema testdata; `oracleSql` is the DuckDB-equivalent SQL
  * per query. Column names/order match between the two (the driver's
  * compare sorts columns by name before hashing values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.leaderboard(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.all ++ WindowedEvents.all ++ TextAnalysis.all ++ Dedup.all ++
      Similarity.all ++ Multimodal.all ++ Corpus.all ++ TimeSeries.all ++
      Stats.all ++ Redaction.all ++ Pipeline.all ++ Graph.all ++ EntityResolution.all ++ DataQuality.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracle ++ WindowedEvents.oracle ++ TextAnalysis.oracle ++ Dedup.oracle ++
      Similarity.oracle ++ Multimodal.oracle ++ Corpus.oracle ++ TimeSeries.oracle ++
      Stats.oracle ++ Redaction.oracle ++ Pipeline.oracle ++ Graph.oracle ++ EntityResolution.oracle ++ DataQuality.oracle
}
