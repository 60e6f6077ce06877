package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.{AnalyticsQueries, CurationQueries, EngineQueries, RelationalQueries, SignalQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` covers the SURVEY.md §2 operator inventory (q01-q17), the
  * training-data-pipeline operators (q18-q28: dedup, similarity search,
  * text analysis), and the engine-native seeded/sketch operators
  * (q29-q32, rows-only). Each oracle is ANSI SQL validated against
  * DuckDB v1.0.0 semantics.
  */
object SparkEntry {

  /** Flagship: the crawl engine's extraction front-end (the one pass that
    * touches the html binary at 100 TB scale) over the deterministic tiny
    * corpus — html → text/outlinks/leak-flags, aggregated per host.
    */
  def entry(spark: SparkSession): DataFrame = {
    val pages = graft.fixtures.PagesGen.generate(spark, graft.fixtures.PagesGen.Tiny, partitions = 4).toDF
    graft.round.CrawlEngine
      .extractPages(spark, pages)
      .withColumn("host", expr("url_host(url)"))
      .groupBy("host")
      .agg(
        count(lit(1)).as("n_pages"),
        sum(size(col("outlinks"))).as("n_outlinks"),
        sum(when(col("has_secret"), 1).otherwise(0)).as("n_leaky"),
        max(col("ver")).as("max_versions")
      )
      .orderBy("host")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.all ++ TextQueries.all ++ EngineQueries.all ++ CurationQueries.all ++ SignalQueries.all ++ AnalyticsQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Engine-native ops (q29-q32) are omitted →
    * rows-only check; q39 (the α=1 deterministic walk corner) carries a
    * full oracle.
    */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ TextQueries.oracles ++ EngineQueries.oracles ++ CurationQueries.oracles ++ SignalQueries.oracles ++ AnalyticsQueries.oracles
}
