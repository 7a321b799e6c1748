package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AnalyticsQueries, CdcQueries, FunctionQueries, LlmQueries, RelationalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query inventories. Every operator claimed done
  * in SURVEY.md §2 has a `queries` entry here; SQL-expressible ones also have
  * a DuckDB `oracleSql` twin with identical column names/order semantics.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q1Agg(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ CdcQueries.queries ++ LlmQueries.queries ++
      FunctionQueries.queries ++ AnalyticsQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ CdcQueries.oracles ++ LlmQueries.oracles ++
      FunctionQueries.oracles ++ AnalyticsQueries.oracles
}
