package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.FeatureFrame
import graft.queries.{LlmQueries, ParityQueries, RelationalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001 (driver smoke-checks
    * rows > 0): the SURVEY §7 minimum end-to-end slice — events source →
    * per-key count-based sliding window → windowed average feature →
    * latest-wins upsert → bulk query.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val e = Tables.events(spark, dir).select("user_id", "event_id", "value")
    FeatureFrame.source(e, "user_id", "event_id")
      .sliding("value", windowSize = 5, slideSize = 2)
      .mapFeature(_.select(col("user_id"), col("event_id"),
        round(col("w_avg"), 6).as("feature")))
      .latest
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ParityQueries.queries ++ RelationalQueries.queries ++ LlmQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted only for the sequential-fold
    * shedding policies (not SQL-expressible; ScalaTest covers them).
    */
  def oracleSql: Map[String, String] =
    ParityQueries.oracleSql ++ RelationalQueries.oracleSql ++ LlmQueries.oracleSql
}
