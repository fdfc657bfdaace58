package graft.queries

import graft.Tables
import graft.ops.{Relational => R, TimeSeriesOps => T}
import graft.pipeline.{Integrate, Preprocess, Serve}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle promotions for the §2 operators previously verified only by
  * ScalaTest specs (VERDICT r1 item 5): the dashboard read panels (Serve),
  * the preprocess clean path, and the integrate trends-long join, each
  * expressed over the driver's parquet tables with a DuckDB oracle.
  *
  * The `events` table stands in for the integrated stock panel: user_id →
  * symbol, ts → hour (globally unique, so positional picks are total-ordered),
  * value → price/volume/return as each panel requires.
  */
object ServeQueries {
  type Q = (SparkSession, String) => DataFrame

  /** events as an integrated-panel lookalike: symbol, hour, c. */
  private def panel(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("user_id").cast("string").as("symbol"),
      col("ts").as("hour"),
      col("value").as("c"))

  val queries: Map[String, Q] = Map(
    // ── W7: last/second-to-last price + % change (dashboard/app.py:75-84)
    "q68_last_change" -> ((s, d) => Serve.lastChange(panel(s, d))),

    // ── O3 + A6: latest volume per symbol, descending (dashboard/app.py:173-174)
    "q69_latest_volumes" -> ((s, d) =>
      Serve.latestVolumes(Tables.events(s, d).select(
        col("user_id").cast("string").as("symbol"),
        col("ts").as("hour"),
        col("value").as("Volume")))),

    // ── C5 + A7: sample-stddev volatility + stability label
    //    (dashboard/app.py:342-343). stddev rounded to 6dp: the one-pass
    //    merge order differs across engines in the last ulp.
    "q70_volatility_stability" -> ((s, d) =>
      Serve.volatilityStability(Tables.events(s, d).select(
          col("user_id").cast("string").as("symbol"),
          col("value").as("ret_1h")))
        .select(col("symbol"), round(col("volatility"), 6).as("volatility"),
          col("stability"))),

    // ── A5 + F12 + O2: per-predictor min p-value, −log10 significance with
    //    zero-guard, top-10 (dashboard/app.py:408-413). p_value is a
    //    deterministic rational of event_id so both engines agree exactly;
    //    significance rounds (libm vs JVM log10) and canonicalizes -0.0.
    "q71_causality_summary" -> ((s, d) => {
      val causality = Tables.events(s, d).select(
        col("event_type").as("predictor"),
        (pmod(col("event_id") * 37, lit(997)) / 997.0).as("p_value"))
      Serve.causalitySummary(causality)
        .select(col("predictor"), col("p_value"),
          (round(col("significance"), 6) + lit(0.0)).as("significance"))
    }),

    // ── P7 + P11 + A1: required-column check → whole-row dedup → drop
    //    null-bearing rows on the required subset (preprocess_function/
    //    main.py:15, analysis_part/main.py:138-141)
    "q72_clean" -> ((s, d) => {
      val base = Tables.events(s, d).select(col("event_id"), col("user_id"),
        when(col("event_type") === "error", lit(null).cast("double"))
          .otherwise(col("value")).as("v"))
      Preprocess.clean(R.requireColumns(base, Seq("event_id", "user_id", "v")),
        dropNaSubset = Seq("v"))
    }),

    // ── J2 + F5: hourly-latest panel ⟕ trends-long on the composite
    //    (hour, symbol) key (integrate/main.py:90,102-104)
    "q73_trend_join" -> ((s, d) => {
      val e = Tables.events(s, d)
      val left = Integrate.floorHour(
          e.select(col("user_id").cast("string").as("symbol"),
            col("ts").as("timestamp"), col("value").as("c")), "timestamp")
        .groupBy("symbol", "hour")
        .agg(max_by(col("c"), col("timestamp")).as("c"))
      val trends = Integrate.floorHour(
          e.filter(col("event_type") === "view")
            .select(col("user_id").cast("string").as("symbol"),
              col("ts").as("timestamp"), col("value")), "timestamp")
        .groupBy(col("hour"), col("symbol"))
        .agg(max_by(col("value"), col("timestamp")).as("trend_score"))
      left.join(trends, Seq("hour", "symbol"), "left")
    }),

    // ── serve-layer persist audit (SURVEY §3.3): ONE cached scan of the
    //    panel feeds three dashboard panels (W7+W1 last-change, A6+O3
    //    latest volumes, C5+A7 volatility) joined into the market-overview
    //    page. The reference re-reads the CSV per page render; here every
    //    panel reads InMemoryTableScan (plan-audited in PLANS.md).
    "q141_serve_page" -> ((s, d) => {
      val p = Serve.cachedFor(s, d, panel(s, d))
      val lc = Serve.lastChange(p)
      val lv = Serve.latestVolumes(
        p.select(col("symbol"), col("hour"), col("c").as("Volume")))
      val vol = Serve.volatilityStability(
          p.select(col("symbol"), col("c").as("ret_1h")))
        .select(col("symbol"), round(col("volatility"), 6).as("volatility"),
          col("stability"))
      lc.join(lv, Seq("symbol")).join(vol, Seq("symbol"))
    }),

    // ── S3 + S4: headered CSV round-trip — the engine writes the CSV, both
    //    engines read it back independently and must agree on every value
    //    (bigint / string / date / timestamp / double columns). Content is
    //    a deterministic range projection, NOT a slice of sfDir: the CSV
    //    lands at a fixed path, and deriving it from sfDir would let a
    //    Verify(sf0.01)/Bench(sf0.1) interleaving race on that file.
    "q74_csv_roundtrip" -> ((s, _) => {
      val path = CsvRoundTripPath
      val src = s.range(0, 500).select(
        col("id"),
        concat(lit("name_"), col("id") % 37).as("name"),
        date_add(to_date(lit("2025-01-01")), (col("id") % 365).cast("int")).as("d"),
        timestamp_seconds(col("id") * 3607 + 11).as("ts"),
        (pmod(col("id") * 7, lit(97)) / 97.0).as("x"))
      graft.sources.Csv.write(src, path)
      graft.sources.Csv.read(s, path,
        "id BIGINT, name STRING, d DATE, ts TIMESTAMP, x DOUBLE")
    }),

    // ── compaction-writer round-trip: deterministic content written as
    //    range-partitioned, sorted, record-capped parquet (the q140 report's
    //    consumer — Layout.compactWrite), read back by BOTH engines from
    //    the same files. LayoutSpec asserts the file-level invariants
    //    (record cap, non-overlapping sort ranges); the oracle proves the
    //    rewrite lost nothing.
    "q147_compact_roundtrip" -> ((s, _) => {
      val path = CompactPath
      val src = s.range(0, 10000).select(
        col("id"),
        (col("id") % 7).as("k"),
        (pmod(col("id") * 13, lit(101)) / 101.0).as("x"))
      graft.ops.Layout.compactWrite(src, path, Seq(col("k"), col("id")),
        partitions = 4, maxRecordsPerFile = 1000L)
      s.read.parquet(path)
    }),

    // ── columnar ORC round-trip (same deterministic content recipe as q74;
    //    DuckDB can't read ORC, so the oracle regenerates the content from
    //    range() instead of reading the written files)
    "q107_orc_roundtrip" -> ((s, _) => {
      val path = OrcRoundTripPath
      val src = s.range(0, 500).select(
        col("id"),
        concat(lit("name_"), col("id") % 37).as("name"),
        date_add(to_date(lit("2025-01-01")), (col("id") % 365).cast("int")).as("d"),
        timestamp_seconds(col("id") * 3607 + 11).as("ts"),
        (pmod(col("id") * 7, lit(97)) / 97.0).as("x"))
      graft.sources.Orc.write(src, path)
      graft.sources.Orc.read(s, path,
        "id BIGINT, name STRING, d DATE, ts TIMESTAMP, x DOUBLE")
    }))

  private val CsvRoundTripPath = "/root/repo/target/graft_csv_roundtrip"
  private val OrcRoundTripPath = "/root/repo/target/graft_orc_roundtrip"
  private val CompactPath      = "/root/repo/target/graft_compact"

  val oracle: Map[String, String] = Map(
    "q68_last_change" ->
      """WITH r AS (SELECT user_id::VARCHAR AS symbol, ts AS hour, value AS c,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts DESC) AS rn FROM events)
        |SELECT symbol, arg_max(c, hour) AS last_price,
        | CASE WHEN count(*) = 2 AND arg_min(c, hour) != 0
        |   THEN (arg_max(c, hour) - arg_min(c, hour)) / arg_min(c, hour) * 100 END AS pct_change
        |FROM r WHERE rn <= 2 GROUP BY symbol""".stripMargin,
    "q69_latest_volumes" ->
      """SELECT user_id::VARCHAR AS symbol, arg_max(value, ts) AS Volume
        |FROM events GROUP BY 1""".stripMargin,
    "q70_volatility_stability" ->
      """SELECT user_id::VARCHAR AS symbol,
        | round(stddev_samp(value), 6) AS volatility,
        | CASE WHEN stddev_samp(value) < 0.02 THEN 'Stable' ELSE 'Volatile' END AS stability
        |FROM events GROUP BY 1""".stripMargin,
    "q71_causality_summary" ->
      """WITH c AS (SELECT event_type AS predictor,
        |  (((event_id * 37) % 997 + 997) % 997) / 997.0 AS p_value FROM events),
        |m AS (SELECT predictor, min(p_value) AS p_value FROM c GROUP BY 1)
        |SELECT predictor, p_value,
        | round(-log10(CASE WHEN p_value = 0 THEN 1e-10 ELSE p_value END), 6) + 0.0 AS significance
        |FROM m
        |ORDER BY round(-log10(CASE WHEN p_value = 0 THEN 1e-10 ELSE p_value END), 6) DESC, predictor
        |LIMIT 10""".stripMargin,
    "q72_clean" ->
      """SELECT DISTINCT event_id, user_id, value AS v FROM events
        |WHERE event_type != 'error' AND value IS NOT NULL""".stripMargin,
    "q73_trend_join" ->
      """WITH l AS (SELECT user_id::VARCHAR AS symbol, date_trunc('hour', ts) AS hour,
        |  arg_max(value, ts) AS c FROM events GROUP BY 1, 2),
        |t AS (SELECT date_trunc('hour', ts) AS hour, user_id::VARCHAR AS symbol,
        |  arg_max(value, ts) AS trend_score FROM events WHERE event_type = 'view' GROUP BY 1, 2)
        |SELECT hour, symbol, c, trend_score FROM l LEFT JOIN t USING (hour, symbol)""".stripMargin,
    "q141_serve_page" ->
      """WITH r AS (SELECT user_id::VARCHAR AS symbol, ts AS hour, value AS c,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts DESC) AS rn FROM events),
        |lc AS (SELECT symbol, arg_max(c, hour) AS last_price,
        |  CASE WHEN count(*) = 2 AND arg_min(c, hour) != 0
        |    THEN (arg_max(c, hour) - arg_min(c, hour)) / arg_min(c, hour) * 100 END AS pct_change
        |  FROM r WHERE rn <= 2 GROUP BY symbol),
        |lv AS (SELECT user_id::VARCHAR AS symbol, arg_max(value, ts) AS Volume
        |  FROM events GROUP BY 1),
        |vol AS (SELECT user_id::VARCHAR AS symbol,
        |  round(stddev_samp(value), 6) AS volatility,
        |  CASE WHEN stddev_samp(value) < 0.02 THEN 'Stable' ELSE 'Volatile' END AS stability
        |  FROM events GROUP BY 1)
        |SELECT symbol, last_price, pct_change, Volume, volatility, stability
        |FROM lc JOIN lv USING (symbol) JOIN vol USING (symbol)""".stripMargin,
    "q74_csv_roundtrip" ->
      """SELECT * FROM read_csv('/root/repo/target/graft_csv_roundtrip/*.csv',
        | header = true)""".stripMargin,
    "q147_compact_roundtrip" ->
      """SELECT id, k, x
        |FROM read_parquet('/root/repo/target/graft_compact/*.parquet')""".stripMargin,
    "q107_orc_roundtrip" ->
      """SELECT id,
        | 'name_' || CAST(id % 37 AS VARCHAR) AS name,
        | DATE '2025-01-01' + CAST(id % 365 AS INTEGER) AS d,
        | TIMESTAMP '1970-01-01' + to_seconds(id * 3607 + 11) AS ts,
        | CAST(id * 7 % 97 AS DOUBLE) / 97 AS x
        |FROM range(0, 500) t(id)""".stripMargin)
}
