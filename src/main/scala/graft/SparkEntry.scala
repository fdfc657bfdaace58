package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's operator inventory (SURVEY.md §2): each key is an
  * implemented operator expressed over the driver's parquet tables, and
  * `oracleSql` carries the equivalent DuckDB SQL for the correctness gate.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.RelationalQueries.queries ++
      graft.queries.ExtensionQueries.queries ++
      graft.queries.AnalyticsQueries.queries ++
      graft.queries.BreadthQueries.queries ++
      graft.queries.ServeQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.RelationalQueries.oracle ++
      graft.queries.ExtensionQueries.oracle ++
      graft.queries.AnalyticsQueries.oracle ++
      graft.queries.BreadthQueries.oracle ++
      graft.queries.ServeQueries.oracle
}
