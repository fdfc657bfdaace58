package graft.queries

import graft.Tables
import graft.analytics.Correlation
import graft.ops.{Relational => R, TimeSeriesOps => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Oracle-checked queries for SURVEY.md §2.2–§2.8 (relational / window /
  * time-series operator inventory), expressed over the driver's TPC-H-ish
  * tables (TESTDATA.md). Each entry has an equivalent DuckDB SQL oracle.
  *
  * Determinism contract (SURVEY.md §7.4 #3/#6): every query is a pure
  * function of the input tables — aggregates over doubles go through exact
  * DECIMAL(38,6) sums, order-dependent picks (`last`, top-k, per-group
  * latest) carry explicit total orders with id tiebreaks.
  */
object RelationalQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ── one-scan table profiler: long-format per-column null/distinct/
    //    numeric stats (the per-ingest data-quality summary)
    "q217_profile" -> ((s, d) =>
      graft.ops.Relational.profile(Tables.lineitem(s, d))),

    // ── A1/A7: grouped aggregation battery (TPC-H Q1 shape; reference
    //    preprocess dedup + dashboard stats, SURVEY §2.4)
    "q01_agg" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      li.filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          R.exactSum(col("l_extendedprice")).as("sum_base_price"),
          R.exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          R.exactAvg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order"))
    }),

    // ── P1/P4/P5: filter + projection (predicate/column pushdown to parquet)
    "q02_filter_project" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("2000-01-01").cast("timestamp") &&
          col("l_returnflag") === "R" && col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")),

    // ── J1-J3: star join, dims broadcast (orders⋈customer⋈nation⋈region)
    "q03_join_star" -> ((s, d) => {
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_orders"), R.exactSum(col("o_totalprice")).as("total_spend"))
    }),

    // ── J1 left outer with null-tolerant downstream (quote ⟕ yahoo analog)
    "q04_join_left" -> ((s, d) => {
      val liAgg = Tables.lineitem(s, d).groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("qty"), count(lit(1)).as("n_lines"))
      Tables.orders(s, d)
        .join(liAgg, col("o_orderkey") === col("l_orderkey"), "left")
        .select(col("o_orderkey"), col("o_orderstatus"),
          coalesce(col("qty"), lit(0.0)).as("qty"),
          coalesce(col("n_lines"), lit(0L)).as("n_lines"))
    }),

    // ── A1/A2: whole-row distinct (preprocess drop_duplicates analog)
    "q05_distinct" -> ((s, d) =>
      Tables.events(s, d).select("user_id", "event_type").distinct()),

    // ── A3: pivot with deterministic positional-last (max_by on (ts,id))
    "q06_pivot_last" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("hour"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(max_by(col("value"), col("ts")))),

    // ── W1: pct_change per series
    "q07_pct_change" -> ((s, d) =>
      T.pctChange(Tables.events(s, d), "value", Seq("user_id"),
          Seq(col("ts"), col("event_id")), "ret")
        .select("user_id", "event_id", "value", "ret")),

    // ── W2: next-step lead label
    "q08_lead" -> ((s, d) =>
      T.leadNext(Tables.events(s, d), "value", Seq("user_id"),
          Seq(col("ts"), col("event_id")), "value_next")
        .select("user_id", "event_id", "value", "value_next")),

    // ── W3: lag-feature fan-out 1..24 (reference analysis_part/main.py:83-85;
    //    single window exec, 24 frames)
    "q09_lag_features" -> ((s, d) =>
      T.lagFeatures(Tables.events(s, d), "value", 24, Seq("user_id"),
          Seq(col("ts"), col("event_id")))
        .select((Seq("user_id", "event_id", "value") ++ (1 to 24).map(i => s"value_lag$i")).map(col): _*)),

    // ── A3+W4+F9: hourly resample + forward fill over generated grid
    "q10_resample_ffill" -> ((s, d) => {
      val hourly = T.bucketLast(Tables.events(s, d), Seq("user_id"), "ts", "hour",
        "value", Seq("event_id")).withColumnRenamed("bucket", "hour")
      T.gapFillFFill(hourly, Seq("user_id"), "hour", "interval 1 hour", "value", "v_ffill")
    }),

    // ── W5/A4: daily group-mean imputation (nulls synthesized on 'error')
    "q11_impute" -> ((s, d) => {
      val base = Tables.events(s, d)
        .withColumn("v", when(col("event_type") === "error", lit(null)).otherwise(col("value")))
      T.groupMeanImpute(base, "v", to_date(col("ts")), "v_imp")
        .select("event_id", "v_imp")
    }),

    // ── O2: global top-k (TakeOrderedAndProject, no global sort)
    "q12_topk" -> ((s, d) =>
      R.topK(Tables.events(s, d), 10, col("value").desc, col("event_id").asc)
        .select("event_id", "user_id", "value")),

    // ── A6/W7: latest row per group as one hash aggregate
    "q13_latest_per_group" -> ((s, d) =>
      R.latestPerGroup(Tables.events(s, d), Seq("user_id"),
        Seq(col("ts"), col("event_id")), Seq("ts", "event_type", "value"))),

    // ── W8: previous-day lookup with latest fallback
    "q14_prev_day" -> ((s, d) =>
      T.prevDayValue(Tables.events(s, d), Seq("user_id"), "ts", "value",
        Seq("event_id"), "prev_day_value")),

    // ── A9: 60-bin probability-density histogram
    "q15_histogram" -> ((s, d) =>
      T.histogramDensity(Tables.events(s, d), "value", 60)),

    // ── A8/C6: pairwise-complete Pearson correlation matrix, exact sums
    "q16_corr_matrix" -> ((s, d) =>
      Correlation.matrix(Tables.lineitem(s, d), CorrCols, CorrScales)),

    // ── U1: union-by-name with per-frame missing columns
    "q17_union" -> ((s, d) => {
      val e = Tables.events(s, d)
      val a = e.filter(col("event_type") === "click").select("event_id", "user_id", "value")
      val b = e.filter(col("event_type") === "purchase").select("event_id", "user_id")
      R.unionByNameAll(Seq(a, b))
    }),

    // ── F1-F18: scalar function battery (string/date/math/json/case)
    "q18_scalar_battery" -> ((s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        date_trunc("hour", col("ts")).as("hour"),
        to_date(col("ts")).as("day"),
        date_sub(to_date(col("ts")), 1).as("day_before"),
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("iso"),
        get_json_object(col("props"), "$.k").cast("int").as("k"),
        // rounded: JVM vs libm log10 differ in the last ulp. `+ 0.0`
        // canonicalizes signed zero (DuckDB round keeps -0.0, Spark's
        // BigDecimal path yields +0.0; IEEE: -0.0 + 0.0 = +0.0).
        (round(-log10(greatest(abs(col("value")), lit(1e-10))), 6) + lit(0.0)).as("neg_log"),
        sqrt(abs(col("value"))).as("sq"),
        (round(col("value"), 2) + lit(0.0)).as("v_round"),
        when(col("value") >= 0, "up").otherwise("down").as("direction"),
        (col("event_id") % 24).as("mod24"),
        floor(col("event_id") / 24).cast("long").as("div24"),
        format_string("Day %d", col("event_id")).as("label"),
        lower(col("event_type")).contains("c").as("has_c"),
        split(col("event_type"), "[aeiou]").getItem(0).as("first_tok"),
        upper(col("event_type")).rlike("^[A-Z]{1,5}$").as("is_short_code"),
        // F18 — value relabel via literal map with identity fallback
        coalesce(element_at(typedLit(Map("click" -> "Click", "view" -> "View")),
          col("event_type")), col("event_type")).as("relabeled"),
        col("value").cast("double").as("v_f"))),

    // ── J4: fuzzy containment theta-join (broadcast nested loop on a
    //    keyword dim — reference trend-column → symbol map)
    "q19_fuzzy_join" -> ((s, d) => {
      import s.implicits._
      val kw = Seq("spark", "data", "query", "stream").toDF("keyword")
      Tables.documents(s, d)
        .join(broadcast(kw), col("text").contains(col("keyword")))
        .select("doc_id", "keyword")
    }),

    // ── W6: chronological 80/20 split tag
    "q20_chrono_split" -> ((s, d) =>
      T.chronoSplitTag(Tables.events(s, d), Seq("user_id"),
          Seq(col("ts"), col("event_id")), 0.8, "is_train")
        .select("user_id", "event_id", "is_train")),

    // ── O4: bounded per-key enumeration (50-tweet cap analog)
    "q21_limit_per_group" -> ((s, d) =>
      R.limitPerGroup(Tables.events(s, d), 50, Seq("user_id"),
          Seq(col("ts"), col("event_id")))
        .select("user_id", "event_id")),

    // ── semi/anti joins (engine completeness beyond reference)
    "q22_join_anti" -> ((s, d) => {
      val bigOrders = Tables.lineitem(s, d).groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("qty")).filter(col("qty") > 150)
      Tables.orders(s, d)
        .join(bigOrders, col("o_orderkey") === col("l_orderkey"), "left_anti")
        .select("o_orderkey", "o_totalprice")
    }),
    "q23_join_semi" -> ((s, d) => {
      val r = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      Tables.orders(s, d)
        .join(r, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select("o_orderkey", "o_orderstatus")
    }))

  private val CorrCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
  // integer-izing multipliers ~ 5e5/max|x|: exact cross-engine rounding,
  // int64 Gram sums (see Correlation.matrix scaladoc)
  private val CorrScales = Map("l_quantity" -> 1e4, "l_extendedprice" -> 4.0,
    "l_discount" -> 1e6, "l_tax" -> 1e6)

  private val lagSelect = (1 to 24).map(i =>
    s"lag(value, $i) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS value_lag$i").mkString(", ")

  private val ProfileSql: String = {
    val numeric = Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double")
    // l_shipdate's parquet TIMESTAMP is isAdjustedToUTC=false → Spark
    // reads TIMESTAMP_NTZ; the dtype literal mirrors that rendering
    val other = Seq("l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp_ntz")
    val numLegs = numeric.map { case (c, t) =>
      s"""SELECT '$c' AS "column", '$t' AS dtype, count(*) AS n_rows, """ +
        s"count(*) - count($c) AS n_null, " +
        s"count(DISTINCT $c) AS n_distinct, " +
        s"round(CAST(min($c) AS DOUBLE), 6) AS min_val, " +
        s"round(CAST(max($c) AS DOUBLE), 6) AS max_val, " +
        s"round(CAST(sum(CAST($c AS DECIMAL(28,10))) AS DOUBLE) " +
        s"/ count($c), 6) AS mean_val FROM lineitem"
    }
    val othLegs = other.map { case (c, t) =>
      s"""SELECT '$c', '$t', count(*), count(*) - count($c), """ +
        s"count(DISTINCT $c), CAST(NULL AS DOUBLE), " +
        s"CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM lineitem"
    }
    (numLegs ++ othLegs).mkString("\nUNION ALL ")
  }

  val oracle: Map[String, String] = Map(
    "q217_profile" -> ProfileSql,
    "q01_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | sum(l_quantity) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
        | CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)/count(l_quantity) AS avg_qty,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '2000-01-01' AND l_returnflag = 'R' AND l_quantity > 45""".stripMargin,
    "q03_join_star" ->
      """SELECT r_name, n_name, count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_spend
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q04_join_left" ->
      """SELECT o_orderkey, o_orderstatus, coalesce(qty, 0.0) AS qty, coalesce(n_lines, 0) AS n_lines
        |FROM orders LEFT JOIN (
        |  SELECT l_orderkey, sum(l_quantity) AS qty, count(*) AS n_lines
        |  FROM lineitem GROUP BY l_orderkey) li ON o_orderkey = l_orderkey""".stripMargin,
    "q05_distinct" -> "SELECT DISTINCT user_id, event_type FROM events",
    "q06_pivot_last" ->
      """SELECT date_trunc('hour', ts) AS hour,
        | arg_max(value, ts) FILTER (WHERE event_type='click') AS click,
        | arg_max(value, ts) FILTER (WHERE event_type='error') AS error,
        | arg_max(value, ts) FILTER (WHERE event_type='purchase') AS purchase,
        | arg_max(value, ts) FILTER (WHERE event_type='signup') AS signup,
        | arg_max(value, ts) FILTER (WHERE event_type='view') AS view
        |FROM events GROUP BY 1""".stripMargin,
    "q07_pct_change" ->
      """SELECT user_id, event_id, value,
        | CASE WHEN lag(value) OVER w != 0
        |   THEN (value - lag(value) OVER w) / lag(value) OVER w END AS ret
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,
    "q08_lead" ->
      """SELECT user_id, event_id, value,
        | lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS value_next
        |FROM events""".stripMargin,
    "q09_lag_features" ->
      s"SELECT user_id, event_id, value, $lagSelect FROM events",
    "q10_resample_ffill" ->
      """WITH hourly AS (
        |  SELECT user_id, date_trunc('hour', ts) AS hour, arg_max(value, ts) AS value
        |  FROM events GROUP BY 1, 2),
        |bounds AS (SELECT user_id, min(hour) AS lo, max(hour) AS hi FROM hourly GROUP BY 1),
        |grid AS (SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM bounds)
        |SELECT g.user_id, g.hour,
        | last_value(h.value IGNORE NULLS) OVER (PARTITION BY g.user_id ORDER BY g.hour
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ffill
        |FROM grid g LEFT JOIN hourly h ON g.user_id = h.user_id AND g.hour = h.hour""".stripMargin,
    "q11_impute" ->
      """SELECT event_id,
        | coalesce(v, CAST(sum(CAST(v AS DECIMAL(38,6))) OVER gd AS DOUBLE) / count(v) OVER gd) AS v_imp
        |FROM (SELECT event_id, ts, CASE WHEN event_type='error' THEN NULL ELSE value END AS v FROM events)
        |WINDOW gd AS (PARTITION BY CAST(ts AS DATE))""".stripMargin,
    "q12_topk" ->
      "SELECT event_id, user_id, value FROM events ORDER BY value DESC, event_id LIMIT 10",
    "q13_latest_per_group" ->
      """SELECT user_id, ts, event_type, value FROM (
        | SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        | FROM events) WHERE rn = 1""".stripMargin,
    "q14_prev_day" ->
      """WITH latest AS (
        |  SELECT user_id, max(CAST(ts AS DATE)) AS latest_date,
        |    arg_max(value, ts) AS last_v
        |  FROM events GROUP BY 1),
        |prev AS (
        |  SELECT e.user_id, arg_max(e.value, e.ts) AS prev_v
        |  FROM events e JOIN latest l ON e.user_id = l.user_id
        |  WHERE CAST(e.ts AS DATE) = l.latest_date - 1 GROUP BY 1)
        |SELECT l.user_id, coalesce(p.prev_v, l.last_v) AS prev_day_value
        |FROM latest l LEFT JOIN prev p ON l.user_id = p.user_id""".stripMargin,
    "q15_histogram" ->
      """WITH stats AS (SELECT min(value) AS lo, max(value) AS hi, count(value) AS n FROM events)
        |SELECT CAST(least(greatest(floor((value - lo) / (hi - lo) * 60), 0.0), 59.0) AS INT) AS bucket,
        | count(*) AS n, count(*) / (any_value(n) * ((any_value(hi) - any_value(lo)) / 60)) AS density
        |FROM events, stats GROUP BY 1""".stripMargin,
    "q16_corr_matrix" -> Correlation.oracleSql("lineitem", CorrCols, CorrScales),
    "q17_union" ->
      """SELECT event_id, user_id, value FROM events WHERE event_type = 'click'
        |UNION ALL
        |SELECT event_id, user_id, CAST(NULL AS DOUBLE) AS value FROM events WHERE event_type = 'purchase'""".stripMargin,
    "q18_scalar_battery" ->
      """SELECT event_id,
        | date_trunc('hour', ts) AS hour,
        | CAST(ts AS DATE) AS day,
        | CAST(ts AS DATE) - 1 AS day_before,
        | strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS iso,
        | CAST(json_extract_string(props, '$.k') AS INT) AS k,
        | round(-log10(greatest(abs(value), 1e-10)), 6) + 0.0 AS neg_log,
        | sqrt(abs(value)) AS sq,
        | round(value, 2) + 0.0 AS v_round,
        | CASE WHEN value >= 0 THEN 'up' ELSE 'down' END AS direction,
        | event_id % 24 AS mod24,
        | CAST(floor(event_id / 24) AS BIGINT) AS div24,
        | printf('Day %d', event_id) AS label,
        | contains(lower(event_type), 'c') AS has_c,
        | regexp_split_to_array(event_type, '[aeiou]')[1] AS first_tok,
        | regexp_full_match(upper(event_type), '[A-Z]{1,5}') AS is_short_code,
        | coalesce((MAP {'click': 'Click', 'view': 'View'}[event_type])[1],
        |     event_type) AS relabeled,
        | CAST(value AS DOUBLE) AS v_f
        |FROM events""".stripMargin,
    "q19_fuzzy_join" ->
      """SELECT doc_id, keyword
        |FROM documents JOIN (VALUES ('spark'),('data'),('query'),('stream')) kw(keyword)
        |ON contains(text, keyword)""".stripMargin,
    "q20_chrono_split" ->
      """SELECT user_id, event_id,
        | row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |   <= floor(count(*) OVER (PARTITION BY user_id) * 0.8) AS is_train
        |FROM events""".stripMargin,
    "q21_limit_per_group" ->
      """SELECT user_id, event_id FROM (
        | SELECT user_id, event_id, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        | FROM events) WHERE rn <= 50""".stripMargin,
    "q22_join_anti" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM (
        |  SELECT l_orderkey, sum(l_quantity) AS qty FROM lineitem GROUP BY 1) b
        |  WHERE b.l_orderkey = o_orderkey AND b.qty > 150)""".stripMargin,
    "q23_join_semi" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')""".stripMargin)
}
