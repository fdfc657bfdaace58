package graft.queries

import graft.Tables
import graft.analytics.{Forecast, Granger}
import graft.ingest.Ingest
import graft.ops.{Relational => R}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Remaining SURVEY.md §2 inventory entries: small projection/guard
  * operators (P2/P3/O5/A10) with oracles, plus the non-SQL-expressible
  * analytics (C1 Granger, C2-C4 forecast) exposed through the driver
  * contract as rows-only checks (no oracleSql entry — SURVEY.md §5.1). */
object AnalyticsQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ── P2: drop-list projection (reference: [c for c in cols if not in drop])
    "q38_droplist_projection" -> ((s, d) =>
      Tables.lineitem(s, d).drop("l_tax", "l_discount", "l_comment")),

    // ── P3: dtype-based projection (select_dtypes numeric)
    "q39_numeric_projection" -> ((s, d) => {
      val p = Tables.part(s, d)
      p.select(R.numericCols(p).map(col): _*)
    }),

    // ── O5/S9/S10: latest-observation pick per source key
    "q40_latest_pick" -> ((s, d) =>
      Ingest.latestPerKey(
        Tables.events(s, d).select("event_type", "ts", "event_id", "value"),
        "event_type", "ts")),

    // ── A10: count-threshold guard as a relational filter
    "q41_count_guard" -> ((s, d) =>
      Tables.events(s, d).groupBy("user_id").agg(count(lit(1)).as("n"))
        .filter(col("n") >= 60)),

    // ── C1: Granger causality sweep (rows-only; OLS F-test per lag)
    "q42_granger" -> ((s, d) => {
      val e = Tables.events(s, d)
        .filter(col("user_id") < 20)
        .select(col("user_id").cast("string").as("sym"), col("ts"),
          col("value"),
          get_json_object(col("props"), "$.k").cast("double").as("k"))
      Granger.test(e, "sym", "ts", "value", "k", maxLag = 2)
        .select("symbol", "predictor", "lag", "p_value", "n_obs")
    }),

    // ── C2-C4: GBT lag-feature forecast (rows-only; deterministic seed)
    "q43_forecast" -> ((s, d) => {
      val series = Tables.events(s, d).filter(col("user_id") === 0)
        .select(col("ts"), col("value").as("c"))
      Forecast.forecastSymbol(series, "ts", "c",
        nLags = 6, horizon = 12, maxIter = 10).forecast
    }))

  val oracle: Map[String, String] = Map(
    "q38_droplist_projection" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
        | l_extendedprice, l_returnflag, l_linestatus, l_shipdate FROM lineitem""".stripMargin,
    "q39_numeric_projection" ->
      "SELECT p_partkey, p_size, p_retailprice FROM part",
    "q40_latest_pick" ->
      """SELECT event_type, ts, event_id, value FROM (
        | SELECT event_type, ts, event_id, value,
        |   row_number() OVER (PARTITION BY event_type ORDER BY ts DESC) AS rn
        | FROM events) WHERE rn = 1""".stripMargin,
    "q41_count_guard" ->
      "SELECT user_id, count(*) AS n FROM events GROUP BY 1 HAVING count(*) >= 60")
}
