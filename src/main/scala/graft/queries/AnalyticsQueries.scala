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

    // ── P8: drop all-null columns (dropna(axis=1, how="all"),
    //    dashboard/app.py:381). Fixture plants two genuinely all-null
    //    columns (double + string) and one sparse column; the operator must
    //    drop exactly the dead ones — the oracle's column list is the proof.
    "q82_drop_allnull_cols" -> ((s, d) =>
      R.dropAllNullCols(
        Tables.nation(s, d)
          .withColumn("dead_d", lit(null).cast("double"))
          .withColumn("dead_s", lit(null).cast("string"))
          .withColumn("sparse",
            when(col("n_nationkey") % 5 === 0, col("n_regionkey"))))),

    // ── J5 explicit: as-of join — each purchase sees the latest prior view
    "q44_asof_join" -> ((s, d) => {
      val e = Tables.events(s, d)
      val l = e.filter(col("event_type") === "purchase")
        .select("user_id", "ts", "event_id", "value")
      val r = e.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("value").as("view_value"),
          col("ts").as("view_ts"))
      graft.ops.TimeSeriesOps.asofJoin(l, r, Seq("user_id"), "ts",
        Seq("view_value", "view_ts"))
    }),

    // ── forward as-of with tolerance: each purchase joined to the next
    //    view within 2 hours (merge_asof direction='forward' analog)
    "q119_asof_forward" -> ((s, d) => {
      val e = Tables.events(s, d)
      val l = e.filter(col("event_type") === "purchase")
        .select("user_id", "ts", "event_id", "value")
      val r = e.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("value").as("view_value"))
      graft.ops.TimeSeriesOps.asofJoinForward(l, r, Seq("user_id"), "ts",
        Seq("view_value"), toleranceSeconds = 7200L)
    }),

    // ── batch session windows (gaps-and-islands; streaming analog:
    //    streaming.Sessionize)
    "q45_session_window" -> ((s, d) =>
      graft.ops.TimeSeriesOps.sessionAgg(
        Tables.events(s, d), Seq("user_id"), "ts", "value", 1800L)),

    // ── SQL surface: the same engine through spark.sql over temp views
    //    (TPC-H Q3 shape; exact decimal revenue, fully tie-broken order)
    "q46_sql_tpch_q3" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql(TpchQ3Sql)
    }),

    // ── hierarchical totals: ROLLUP (beyond the reference's surface)
    "q49_rollup" -> ((s, d) =>
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))),

    // ── full cross-dimensional totals: CUBE
    "q55_cube" -> ((s, d) =>
      Tables.events(s, d)
        .cube(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"),
          R.exactSum(col("value")).as("sum_value"))),

    // ── time-RANGE window: 2-hour rolling mean per user (exact decimal)
    "q50_rolling_mean" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").cast("long"))
        .rangeBetween(-7200L, 0L)
      Tables.events(s, d).select(col("user_id"), col("event_id"),
        (sum(col("value").cast(R.ExactDec)).over(w).cast("double") /
          count(col("value")).over(w)).as("rolling_mean_2h"))
    }),

    // ── exact quantiles (linear interpolation; the 100 TB path would use
    //    approx_percentile — exact needs a per-group sort)
    "q51_percentiles" -> ((s, d) =>
      Tables.lineitem(s, d).groupBy("l_returnflag").agg(
        expr("percentile(l_quantity, 0.25)").as("p25"),
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.75)").as("p75"),
        expr("percentile(l_extendedprice, 0.9)").as("price_p90"))),

    // ── sketch aggregates for the 100 TB path, HYBRID-checked: the sketch
    //    internals (HLL/GK) aren't reproducible in the oracle engine, so the
    //    exact counterparts are value-checked and the sketch outputs are
    //    checked as in-bound FLAGS (HLL default rsd 0.05 → 10% guard band;
    //    approx_percentile rank error ≤ n/accuracy → value band between the
    //    0.49 and 0.51 exact percentiles). The oracle expects every flag
    //    true, so an out-of-spec sketch is a hash mismatch, not a shrug.
    "q52_approx_stats" -> ((s, d) =>
      Tables.events(s, d).groupBy("event_type").agg(
        approx_count_distinct(col("user_id")).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        expr("approx_percentile(value, 0.5)").as("approx_median"),
        expr("percentile(value, 0.5)").as("exact_median"),
        expr("percentile(value, 0.49)").as("_lo"),
        expr("percentile(value, 0.51)").as("_hi"))
      .select(col("event_type"), col("exact_users"), col("exact_median"),
        (abs(col("approx_users") - col("exact_users")) <=
          col("exact_users") * 0.10).as("approx_users_ok"),
        (col("approx_median") >= col("_lo") &&
          col("approx_median") <= col("_hi")).as("approx_median_ok"))),

    // ── C1: Granger causality sweep (rows-only; OLS F-test per lag) — the
    //    reference's full shape: every numeric predictor × lags 1..5
    //    (analysis_part/main.py:58-78,159-161)
    "q42_granger" -> ((s, d) => {
      val e = Tables.events(s, d)
        .filter(col("user_id") < 20)
        .select(col("user_id").cast("string").as("sym"), col("ts"),
          col("value"),
          get_json_object(col("props"), "$.k").cast("double").as("k"),
          hour(col("ts")).cast("double").as("hod"),
          dayofweek(col("ts")).cast("double").as("dow"))
      Granger.sweep(e, "sym", "ts", "value", Seq("k", "hod", "dow"), maxLag = 5)
        .select("symbol", "predictor", "lag", "p_value", "n_obs")
    }),

    // ── Granger F statistic VALUE-CHECKED cross-engine: integer-quantized
    //    synthetic series make every Gram sum exactly representable in both
    //    engines, so the lag-1 F (restricted-vs-unrestricted OLS from those
    //    sums) agrees to FP noise — quantized at 2 decimals, which pins the
    //    hardest custom math in DuckDB while the F-CDF p-value stays
    //    spec-side (GrangerSpec NumPy goldens). y = 2·x_{t−1} + (t mod 5):
    //    the x lag carries real signal, so rss_r − rss_u is large and the
    //    cancellation-sensitive numerator is numerically stable.
    "q42b_granger_f" -> ((s, _) => {
      val base = s.range(4L * 2500L).select(
          (col("id") % 4).as("k"), expr("id div 4 + 1").as("t"))
        .select(
          concat(lit("s"), col("k")).as("sym"), col("t"),
          (((col("t") * 7 + col("k") * 3) % 19)).cast("double").as("x"),
          ((((col("t") - 1) * 7 + col("k") * 3) % 19) * 2 + col("t") % 5)
            .cast("double").as("y"))
      Granger.test(base, "sym", "t", "y", "x", maxLag = 1)
        .select(col("symbol"), col("predictor"), col("lag"),
          (floor(col("f_stat") * 100 + lit(0.5)) / 100).as("f_stat"),
          col("n_obs"))
    }),

    // ── Granger FULL-SWEEP F value-checked cross-engine, lags 1..5: the
    //    oracle unrolls the restricted/unrestricted OLS as symmetric
    //    Gaussian elimination over the CENTERED Gram matrix (generated SQL,
    //    [[grangerSweepOracleSql]]) — mathematically the same RSS Schur
    //    complement Granger.rss computes by pivoted elimination over the
    //    uncentered moments, so with integer-quantized inputs (every Gram
    //    sum exactly representable) the engines agree to FP noise and the
    //    2-decimal floor is stable. y = 2·P(t+2) + P(t) + 3·(t mod 7) with
    //    P(s) = (3s² + 7s + 5k) mod 23 and x = P(t+3): y loads on x lags 1
    //    AND 3, so every lag order 1..5 has a distinct, well-separated F.
    "q42c_granger_sweep_f" -> ((s, _) => {
      val t = col("t"); val k = col("k")
      def p(sft: Int) = ((t + sft) * (t + sft) * 3 + (t + sft) * 7 + k * 5) % 23
      val base = s.range(4L * 2500L).select(
          (col("id") % 4).as("k"), expr("id div 4 + 1").as("t"))
        .select(
          concat(lit("s"), k).as("sym"), t,
          p(3).cast("double").as("x"),
          (p(2) * 2 + p(0) + (t % 7) * 3).cast("double").as("y"))
      Granger.test(base, "sym", "t", "y", "x", maxLag = 5)
        .select(col("symbol"), col("predictor"), col("lag"),
          (floor(col("f_stat") * 100 + lit(0.5)) / 100).as("f_stat"),
          col("n_obs"))
    }),

    // ── C2-C4: GBT lag-feature forecast (rows-only; deterministic seed)
    "q43_forecast" -> ((s, d) => {
      val series = Tables.events(s, d).filter(col("user_id") === 0)
        .select(col("ts"), col("value").as("c"))
      Forecast.forecastSymbol(series, "ts", "c",
        nLags = 6, horizon = 12, maxIter = 10).forecast
    }),

    // ── Bollinger bands: 20-row mean ± 2σ per series (exact decimal Σx/Σx²)
    "q103_bollinger" -> ((s, d) =>
      graft.analytics.Indicators.bollinger(Tables.events(s, d), "value",
          Seq("user_id"), Seq(col("ts"), col("event_id")), n = 20, k = 2.0)
        .select("user_id", "event_id", "value", "bb_mid", "bb_upper", "bb_lower")),

    // ── Cutler's RSI-14 per series (SMA gains/losses window)
    "q104_rsi" -> ((s, d) =>
      graft.analytics.Indicators.rsi(Tables.events(s, d), "value",
          Seq("user_id"), Seq(col("ts"), col("event_id")), n = 14)
        .select("user_id", "event_id", "value", "rsi")),

    // ── rolling 20-row Pearson correlation: value × JSON prop k per user
    "q121_rolling_corr" -> ((s, d) =>
      graft.analytics.Indicators.rollingCorr(
          Tables.events(s, d)
            .withColumn("k", get_json_object(col("props"), "$.k").cast("double")),
          "value", "k", Seq("user_id"), Seq(col("ts"), col("event_id")), n = 20)
        .select("user_id", "event_id", "value", "k", "rolling_corr")),

    // ── drawdown from the running peak per user
    "q122_drawdown" -> ((s, d) =>
      graft.analytics.Indicators.drawdown(Tables.events(s, d), "value",
          Seq("user_id"), Seq(col("ts"), col("event_id")))
        .select("user_id", "event_id", "value", "peak", "drawdown")),

    // ── Holt linear (double exponential) smoothing over hourly close bars
    //    (dyadic α=0.5, β=0.25 → bit-exact fold replay)
    "q253_holt" -> ((s, d) => {
      val bars = Tables.events(s, d).filter(col("value").isNotNull)
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("bar"))
        .agg(max_by(col("value"), col("ts")).as("close"))
      graft.analytics.Indicators.holtLinear(bars, "close", Seq("user_id"),
        "bar", alpha = 0.5, beta = 0.25)
    }),

    // ── forecast accuracy (MAE/RMSE/SMAPE/MASE) of the q253 Holt
    //    one-step forecasts per series — the evaluation half of C4
    "q257_forecast_accuracy" -> ((s, d) => {
      val bars = Tables.events(s, d).filter(col("value").isNotNull)
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("bar"))
        .agg(max_by(col("value"), col("ts")).as("close"))
      val holt = graft.analytics.Indicators.holtLinear(bars, "close",
        Seq("user_id"), "bar", alpha = 0.5, beta = 0.25)
      graft.analytics.Indicators.forecastAccuracy(holt, "close", "fitted",
        Seq("user_id"), Seq(col("bar")))
    }),

    // ── cohort LTV curve: first-seen-day cohorts, weekly revenue, and
    //    the running cumulative value per cohort member
    "q280_ltv" -> ((s, d) =>
      graft.analytics.Behavior.ltvCurve(Tables.events(s, d), "user_id",
        "ts", "value")),

    // ── first/last-touch conversion attribution: purchases credit the
    //    most recent and the earliest preceding touch per user; untouched
    //    conversions land on the explicit "(none)" channel
    "q278_attribution" -> ((s, d) =>
      graft.analytics.Behavior.attribution(Tables.events(s, d), "user_id",
        "ts", "event_type", conversion = "purchase",
        touches = Seq("view", "click", "signup"))),

    // ── Kaplan–Meier survival with right censoring: subjects are
    //    (user, event_type) activity spans, durations in whole hours,
    //    spans still alive within 3 days of the window end are censored
    "q273_kaplan_meier" -> ((s, d) =>
      graft.analytics.Behavior.kaplanMeier(Tables.events(s, d),
        Seq("user_id", "event_type"), "ts", censorDays = 3)),

    // ── two-group log-rank test on the q273 survival subjects: do
    //    even-user activity spans die at a different hazard than odd?
    "q283_logrank" -> ((s, d) =>
      graft.analytics.Behavior.logRank(Tables.events(s, d),
        Seq("user_id", "event_type"), "ts",
        treat = col("user_id") % 2 === 0, censorDays = 3)),

    // ── ROC AUC + average precision of `value` as a purchase-vs-view
    //    score, per day-of-week — the threshold-free ranking metrics,
    //    from per-distinct-value counts + binnedPrefix descending
    //    cumulatives (never a raw-row rank window)
    "q284_roc_pr" -> ((s, d) =>
      graft.ops.Stats.rocPr(
        Tables.events(s, d)
          .filter(col("event_type").isin("view", "purchase"))
          .withColumn("dow", (dayofweek(col("ts")) - 1).cast("long"))
          .withColumn("lbl", (col("event_type") === "purchase").cast("int")),
        "value", "lbl", Seq("dow"))),

    // ── CUPED variance-reduced A/B readout: pre-period spend (before the
    //    q274 split date) as the covariate, post-period spend as the
    //    metric, θ estimated on the pooled population
    "q285_cuped" -> ((s, d) => {
      val cut = lit("2024-01-16").cast("timestamp")
      val units = Tables.events(s, d).filter(col("value").isNotNull)
        .groupBy(col("user_id")).agg(
          sum(when(col("ts") < cut, col("value").cast("decimal(28,10)")))
            .cast("double").as("_pre"),
          sum(when(col("ts") >= cut, col("value").cast("decimal(28,10)")))
            .cast("double").as("_post"))
        .select(
          when(col("user_id") % 2 === 0, "A").otherwise("B").as("grp"),
          coalesce(col("_pre"), lit(0.0)).as("pre"),
          coalesce(col("_post"), lit(0.0)).as("post"))
      graft.ops.Stats.cupedReadout(units, "grp", "pre", "post")
        .orderBy("grp")
    }),

    // ── isotonic (PAV) calibration of `value` against purchase outcome
    //    on a 16-bin score grid — the monotone reliability mapping via
    //    the minimax characterization, all on the bins-sized frame
    "q287_isotonic" -> ((s, d) =>
      graft.ops.Stats.isotonicCalibration(
        Tables.events(s, d)
          .filter(col("event_type").isin("view", "purchase"))
          .withColumn("lbl", (col("event_type") === "purchase").cast("int")),
        "value", "lbl", bins = 16)),

    // ── Holt–Winters additive triple smoothing (daily cycle over hourly
    //    bars: period=24) per event_type — native O(n) ring-buffer scan,
    //    dyadic α=.25 β=.125 γ=.25 → bit-exact recursive-CTE replay
    "q288_holt_winters" -> ((s, d) => {
      val bars = Tables.events(s, d).filter(col("value").isNotNull)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bar"))
        .agg(max_by(col("value"), col("ts")).as("close"))
      graft.analytics.Indicators.holtWinters(bars, "close",
        Seq("event_type"), "bar", period = 24,
        alpha = 0.25, beta = 0.125, gamma = 0.25)
    }),

    // ── Shapley-value attribution over the 2³ touch coalitions: v(S) =
    //    observed conversion rate per coalition, exact factorial-rational
    //    weights — the unique efficient/symmetric credit split
    "q299_shapley" -> ((s, d) =>
      graft.analytics.Behavior.shapleyAttribution(Tables.events(s, d),
        "user_id", "event_type", conversion = "purchase",
        touches = Seq("view", "click", "signup"))),

    // ── U-shaped (40/20/40) position attribution over pre-conversion
    //    paths — rational credits, the multi-touch middle ground between
    //    q278's first/last endpoints
    "q300_position_attribution" -> ((s, d) =>
      graft.analytics.Behavior.positionAttribution(Tables.events(s, d),
        "user_id", "ts", "event_type", conversion = "purchase",
        touches = Seq("view", "click", "signup"))),

    // ── DDSketch mergeable quantile sketch (α = 1%): p50/p95/p99 of the
    //    order value per priority from log-bucket counts — deterministic
    //    bucket arithmetic, so the sketch READS hash-check cross-engine
    "q308_ddsketch" -> ((s, d) =>
      graft.ops.Stats.ddSketch(Tables.orders(s, d), "o_totalprice",
        Seq("o_orderpriority"))),

    // ── DDSketch MERGE path: two disjoint shard sketches (orderkey
    //    parity) merged by counter sum, then read through the q308
    //    quantile arithmetic — additivity makes merged ≡ from-scratch,
    //    and the oracle replays the split/merge literally
    "q311_ddsketch_merge" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val shards = Seq(0, 1).map(p =>
        graft.ops.Stats.ddSketchBuckets(
          o.filter(pmod(col("o_orderkey"), lit(2)) === p),
          "o_totalprice", Seq("o_orderpriority")))
      graft.ops.Stats.ddSketchRead(
        graft.ops.Stats.ddSketchMerge(shards, Seq("o_orderpriority")),
        Seq("o_orderpriority"))
    }),

    // ── the COMPACTED maintained DDSketch store, oracle-checked: base +
    //    two increments (orderkey mod 3) folded into a new base, then the
    //    q308 read path over the compacted store — additivity makes the
    //    fold invisible to the answer, and this query proves it at the
    //    value level (the compaction specs pin it structurally)
    "q325_compacted_ddsketch" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val dir = ExtensionQueries.scratchDir("graft_cdd")
      graft.streaming.StreamingSketch.writeBaseDdSketch(
        o.filter(pmod(col("o_orderkey"), lit(3)) === 0), "o_totalprice",
        Seq("o_orderpriority"), dir)
      Seq(1, 2).foreach(p =>
        graft.ops.Stats.ddSketchBuckets(
            o.filter(pmod(col("o_orderkey"), lit(3)) === p),
            "o_totalprice", Seq("o_orderpriority"))
          .write.mode("overwrite").parquet(s"$dir/increments/batch=$p"))
      require(graft.streaming.StreamingSketch.compactDdSketch(s, dir,
        Seq("o_orderpriority")) == 2, "both increments must fold")
      graft.ops.Stats.ddSketchRead(
        graft.streaming.StreamingSketch.readMergedDdSketch(s, dir,
          Seq("o_orderpriority")),
        Seq("o_orderpriority"))
    }),

    // ── covariate balance (SMD) for the q274/q285 parity assignment:
    //    per-user spend / activity / breadth covariates, exact decimal
    //    moments, |SMD| < 0.1 is the standard "balanced" bar
    "q306_smd_balance" -> ((s, d) => {
      val units = Tables.events(s, d).groupBy(col("user_id")).agg(
        coalesce(sum(col("value").cast("decimal(28,10)")).cast("double"),
          lit(0.0)).as("spend"),
        count(lit(1)).cast("double").as("n_events"),
        countDistinct(col("event_type")).cast("double").as("n_types"))
      graft.ops.Stats.smdBalance(units, col("user_id") % 2 === 0,
        Seq("spend", "n_events", "n_types"))
    }),

    // ── Markov-chain removal-effect attribution: transition matrix from
    //    the event log (distributed, channel-bounded result), absorption
    //    by 32 quantized-decimal Jacobi iterations the oracle replays as
    //    a recursive CTE — the causal counterweight to q299's Shapley
    "q301_markov_attribution" -> ((s, d) =>
      graft.analytics.Behavior.markovAttribution(Tables.events(s, d),
        "user_id", "ts", "event_type", conversion = "purchase",
        touches = Seq("view", "click", "signup"))),

    // ── Poisson-bootstrap CI for the mean order value per priority: 64
    //    deterministic hash-Poisson(1) resamples in ONE pass, 2.5/97.5
    //    percentile bounds from pure-integer rank arithmetic
    "q289_bootstrap_ci" -> ((s, d) =>
      graft.ops.Stats.bootstrapCi(Tables.orders(s, d), "o_orderkey",
        "o_totalprice", Seq("o_orderpriority"), reps = 64)),

    // ── Mann–Kendall trend test + Theil–Sen slope on the monthly revenue
    //    series per order priority (calendar-bounded series → the n² pair
    //    fan-out is a constant per group at any corpus size)
    "q291_trend_test" -> ((s, d) => {
      val monthly = Tables.orders(s, d)
        .groupBy(col("o_orderpriority"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
            .as("t"))
        .agg(sum(col("o_totalprice").cast("decimal(28,6)")).cast("double")
          .as("rev"))
      graft.ops.Stats.trendTest(monthly, Seq("o_orderpriority"), "t", "rev")
    }),

    // ── decile lift & cumulative gains of `value` as a purchase-vs-view
    //    score per day-of-week — per-distinct-value counts + binnedPrefix
    //    descending cumulatives (the rocPr contract), deciles by pure
    //    integer ceil on the cumulative counts
    "q294_lift_gains" -> ((s, d) =>
      graft.ops.Stats.liftGains(
        Tables.events(s, d)
          .filter(col("event_type").isin("view", "purchase"))
          .withColumn("dow", (dayofweek(col("ts")) - 1).cast("long"))
          .withColumn("lbl", (col("event_type") === "purchase").cast("int")),
        "value", "lbl", Seq("dow"))),

    // ── Nelson–Aalen cumulative hazard on the q273 survival subjects —
    //    same duration axis and censoring, the integral companion curve
    "q295_nelson_aalen" -> ((s, d) =>
      graft.analytics.Behavior.nelsonAalen(Tables.events(s, d),
        Seq("user_id", "event_type"), "ts", censorDays = 3)),

    // ── mutual information + NMI between document source and language:
    //    one corpus aggregate to the contingency cells, everything else
    //    rides the category-bounded frames
    "q296_mutual_info" -> ((s, d) =>
      graft.ops.Stats.mutualInfo(Tables.documents(s, d), "source", "lang")),

    // ── 2×2 difference-in-differences on event values: even users
    //    "treated", the month's second half "post" — point estimate,
    //    unpooled SE, and the t statistic from one 12-statistic scan
    "q274_did" -> ((s, d) =>
      graft.analytics.Behavior.diffInDiff(Tables.events(s, d), "value",
        isTreat = col("user_id") % 2 === 0,
        isPost = col("ts") >= lit("2024-01-16").cast("timestamp"))),

    // ── split-conformal prediction intervals (finite-sample coverage, no
    //    distributional assumption) around the naive one-step forecast:
    //    first 80% of bars calibrate the residual quantile, the rest get
    //    [ŷ−q̂, ŷ+q̂] + the empirical coverage — α = 1/10 as a rational,
    //    so the quantile rank is integer-exact cross-engine
    "q272_conformal" -> ((s, d) => {
      val bars = Tables.events(s, d).filter(col("value").isNotNull)
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("bar"))
        .agg(max_by(col("value"), col("ts")).as("close"))
      graft.analytics.Indicators.conformalNaive(bars, "close",
        Seq("user_id"), "bar", alphaNum = 1, alphaDen = 10, calFrac = 0.8)
    }),

    // ── Winkler interval score of the q272 conformal intervals: the
    //    proper scoring rule (width + (2/α)·miss overshoot) plus coverage
    //    and mean width per series — the eval half of interval forecasting
    "q277_interval_score" -> ((s, d) => {
      val bars = Tables.events(s, d).filter(col("value").isNotNull)
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("bar"))
        .agg(max_by(col("value"), col("ts")).as("close"))
      val conf = graft.analytics.Indicators.conformalNaive(bars, "close",
        Seq("user_id"), "bar", alphaNum = 1, alphaDen = 10, calFrac = 0.8)
      graft.analytics.Indicators.intervalScore(conf, "y", "lo", "hi",
        Seq("user_id"), invAlpha = 20.0)
    }),

    // ── classic additive seasonal decomposition of the hourly bars at an
    //    odd period of 5 (centered MA trend, re-centered phase means)
    "q254_seasonal" -> ((s, d) => {
      val bars = Tables.events(s, d).filter(col("value").isNotNull)
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("bar"))
        .agg(max_by(col("value"), col("ts")).as("close"))
      graft.analytics.Indicators.seasonalDecompose(bars, "close",
        Seq("user_id"), Seq(col("bar")), period = 5)
    }),

    // ── Roll implied bid-ask spread per series (lag-1 autocovariance of
    //    price changes; NULL when the bounce signal is absent)
    "q249_roll_spread" -> ((s, d) =>
      graft.analytics.Indicators.rollSpread(Tables.events(s, d), "value",
        Seq("user_id"), Seq(col("ts"), col("event_id")))),

    // ── Amihud illiquidity per series: mean |return| per unit volume
    //    (JSON prop k as the volume proxy)
    "q250_amihud" -> ((s, d) =>
      graft.analytics.Indicators.amihud(
        Tables.events(s, d).withColumn("vol",
          get_json_object(col("props"), "$.k").cast("double")),
        "value", "vol", Seq("user_id"), Seq(col("ts"), col("event_id")))),

    // ── GARCH(1,1) variance filter over hourly close bars (the q204 bar
    //    shape); dyadic-exact parameters so the fold replay is exact
    "q251_garch" -> ((s, d) => {
      val bars = Tables.events(s, d).filter(col("value").isNotNull)
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("bar"))
        .agg(max_by(col("value"), col("ts")).as("close"))
      graft.analytics.Indicators.garch(bars, "close", Seq("user_id"), "bar",
        omega = 0.25, alpha = 0.25, beta = 0.5)
    }),

    // ── rolling 20-row OLS beta/alpha of value on JSON prop k per user
    //    (the rolling hedge ratio; q121's sufficient statistics, slope form)
    "q173_rolling_beta" -> ((s, d) =>
      graft.analytics.Indicators.rollingBeta(
          Tables.events(s, d)
            .withColumn("k", get_json_object(col("props"), "$.k").cast("double")),
          "value", "k", Seq("user_id"), Seq(col("ts"), col("event_id")), n = 20)
        .select("user_id", "event_id", "value", "k", "rolling_beta",
          "rolling_alpha")),

    // ── MACD(12,26,9): EMA-crossover momentum triple per series, composed
    //    from three size-routed EMA legs (each leg the q157 machinery)
    "q174_macd" -> ((s, d) =>
      graft.analytics.Indicators.macd(Tables.events(s, d), "value",
          Seq("user_id"), "ts", carry = Seq("event_id"))
        .select("user_id", "event_id", "value", "ema_fast", "ema_slow",
          "macd", "macd_signal", "macd_hist")),

    // ── stochastic oscillator %K/%D over the trailing 14-row frame
    "q175_stochastic" -> ((s, d) =>
      graft.analytics.Indicators.stochastic(
          Tables.events(s, d).select("user_id", "event_id", "ts", "value"),
          "value", Seq("user_id"), Seq(col("ts"), col("event_id")), n = 14)
        .select("user_id", "event_id", "value", "pct_k", "pct_d")),

    // ── autocorrelation function at lags 1..5 per series (one Window exec
    //    fans out every lag, one aggregate derives the correlations)
    "q176_acf" -> ((s, d) =>
      graft.analytics.Indicators.acf(
        Tables.events(s, d).select("user_id", "event_id", "ts", "value"),
        "value", Seq("user_id"), Seq(col("ts"), col("event_id")),
        maxLag = 5, minPairs = 10L)),

    // ── historical VaR / expected shortfall at 5% by exact order statistics
    "q177_tail_risk" -> ((s, d) =>
      graft.ops.Stats.tailRisk(Tables.events(s, d), "value",
        Seq("event_type"), id = "event_id", alpha = 0.05)),

    // ── skewness / excess kurtosis per group from exact decimal power sums
    "q178_moments" -> ((s, d) =>
      graft.ops.Stats.momentStats(Tables.events(s, d), "value",
        Seq("event_type"))),

    // ── PSI drift monitor: reference-decile bins shared by both sides,
    //    ε-floored shares (the per-feature distribution-shift gate a
    //    training pipeline runs between data loads)
    "q262_psi_drift" -> ((s, d) => {
      val ev = Tables.events(s, d)
      graft.ops.Stats.psi(ev.filter(col("event_type") === "view"),
        ev.filter(col("event_type") === "purchase"), "value", bins = 10)
    }),

    // ── candlestick pattern flags (doji/hammer/bullish-engulfing) over
    //    hourly OHLC bars per series
    "q180_candles" -> ((s, d) =>
      graft.analytics.Indicators.candlePatterns(Tables.events(s, d), "value",
          Seq("user_id"), "ts", bucket = "hour")
        .select("user_id", "bar", "open", "high", "low", "close", "n_ticks",
          "doji", "hammer", "bull_engulf")),

    // ── two-sided CUSUM change-point statistic per series (Page 1954)
    "q181_cusum" -> ((s, d) =>
      graft.analytics.Indicators.cusumSeries(Tables.events(s, d), "value",
        Seq("user_id"), "ts", carry = Seq("event_id"))),

    // ── Donchian channel + turtle breakout flag over the trailing 20 rows
    "q183_donchian" -> ((s, d) =>
      graft.analytics.Indicators.donchian(
          Tables.events(s, d).select("user_id", "event_id", "ts", "value"),
          "value", Seq("user_id"), Seq(col("ts"), col("event_id")), n = 20)
        .select("user_id", "event_id", "value", "dc_upper", "dc_lower",
          "dc_mid", "breakout")),

    // ── on-balance volume (Granville): signed cumulative flow per series,
    //    |value| standing in for tick volume
    "q184_obv" -> ((s, d) =>
      graft.analytics.Indicators.obv(
          Tables.events(s, d).select("user_id", "event_id", "ts", "value")
            .withColumn("vol", abs(col("value"))),
          "value", "vol", Seq("user_id"), Seq(col("ts"), col("event_id")))
        .select("user_id", "event_id", "value", "obv")),

    // ── Engle–Granger cointegration: OLS long-run fit + Dickey–Fuller
    //    t-stat on the residuals, value vs JSON prop k per user
    "q185_coint" -> ((s, d) =>
      graft.analytics.Indicators.engleGranger(
          Tables.events(s, d)
            .withColumn("k", get_json_object(col("props"), "$.k")
              .cast("double")),
          y = "value", x = "k", Seq("user_id"),
          Seq(col("ts"), col("event_id")))
        .select("user_id", "n_obs", "beta", "alpha_int", "m", "phi",
          "df_stat")),

    // ── two-sample Kolmogorov–Smirnov D between view and purchase values
    "q186_ks" -> ((s, d) =>
      graft.ops.Stats.ksTest(Tables.events(s, d), "value", "event_type",
        aLabel = "view", bLabel = "purchase")),

    // ── Benford first-digit screen per event_type (portable integer-path
    //    digit extraction, never log10 of the value)
    "q187_benford" -> ((s, d) =>
      graft.ops.Stats.benford(Tables.events(s, d), "value",
          Seq("event_type"))
        .select("event_type", "digit", "n_digit", "n_rows", "share",
          "benford_p")),

    // ── Mann–Whitney U rank-sum (tie-corrected normal z), view vs purchase
    "q188_mannwhitney" -> ((s, d) =>
      graft.ops.Stats.mannWhitney(Tables.events(s, d), "value",
        "event_type", aLabel = "view", bLabel = "purchase")),

    // ── Heikin-Ashi smoothed candles over hourly bars per series
    "q189_heikin" -> ((s, d) =>
      graft.analytics.Indicators.heikinAshi(Tables.events(s, d), "value",
        Seq("user_id"), "ts", bucket = "hour")),

    // ── Ichimoku lines over the hourly close series per user
    "q190_ichimoku" -> ((s, d) =>
      graft.analytics.Indicators.ichimoku(
          graft.analytics.Indicators.ohlcBars(Tables.events(s, d), "value",
              Seq("user_id"), "ts", bucket = "hour")
            .select("user_id", "bar", "close"),
          "close", Seq("user_id"), Seq(col("bar")))
        .select("user_id", "bar", "close", "tenkan", "kijun", "senkou_a",
          "senkou_b", "chikou")),

    // ── average true range (Wilder α=1/14 smoothing ≡ the EMA machinery)
    "q194_atr" -> ((s, d) =>
      graft.analytics.Indicators.atr(Tables.events(s, d), "value",
          Seq("user_id"), "ts", bucket = "hour", n = 14)
        .select("user_id", "bar", "open", "high", "low", "close", "tr",
          "atr")),

    // ── Wilder directional system: DI+/DI−/DX/ADX over hourly bars
    "q195_adx" -> ((s, d) =>
      graft.analytics.Indicators.adx(Tables.events(s, d), "value",
        Seq("user_id"), "ts", bucket = "hour", n = 14)),

    // ── cross-correlation function at lags −3..3: value vs JSON prop k
    //    (negative lag = k leads value)
    "q196_ccf" -> ((s, d) =>
      graft.analytics.Indicators.ccf(
        Tables.events(s, d)
          .withColumn("k", get_json_object(col("props"), "$.k")
            .cast("double")),
        y = "value", x = "k", Seq("user_id"),
        Seq(col("ts"), col("event_id")), maxLag = 3, minPairs = 10L)),

    // ── Lo–MacKinlay variance ratio VR(q), q = 2..5, per series
    "q197_variance_ratio" -> ((s, d) =>
      graft.analytics.Indicators.varianceRatio(Tables.events(s, d), "value",
        Seq("user_id"), Seq(col("ts"), col("event_id")),
        qs = Seq(2, 3, 4, 5))),

    // ── time-under-water: drawdown episode count/length/depth per series
    "q198_underwater" -> ((s, d) =>
      graft.analytics.Indicators.underwater(Tables.events(s, d), "value",
        Seq("user_id"), Seq(col("ts"), col("event_id")))),

    // ── day-of-week return ANOVA (calendar-effect screen, F attached)
    "q199_dow_anova" -> ((s, d) =>
      graft.analytics.Indicators.calendarAnova(Tables.events(s, d), "value",
        Seq("user_id"), "ts", Seq(col("ts"), col("event_id")))),

    // ── Spearman rank correlation: value vs JSON prop k per event type
    "q200_spearman" -> ((s, d) =>
      graft.ops.Stats.spearman(
        Tables.events(s, d)
          .withColumn("k", get_json_object(col("props"), "$.k")
            .cast("double")),
        x = "value", y = "k", Seq("event_type"))),

    // ── Wald–Wolfowitz runs test on 1-step move signs per series
    "q201_runs_test" -> ((s, d) =>
      graft.analytics.Indicators.runsTest(Tables.events(s, d), "value",
        Seq("user_id"), Seq(col("ts"), col("event_id")))),

    // ── Pettitt rank change-point test per series (integer-exact U)
    "q202_pettitt" -> ((s, d) =>
      graft.analytics.Indicators.pettitt(Tables.events(s, d), "value",
        Seq("user_id"), Seq(col("ts"), col("event_id")))),

    // ── Hurst exponent by aggregated variance over dyadic block sizes
    "q203_hurst" -> ((s, d) =>
      graft.analytics.Indicators.hurst(Tables.events(s, d), "value",
        Seq("user_id"), Seq(col("ts"), col("event_id")),
        ms = Seq(1, 2, 4, 8))),

    // ── 1-D local-level Kalman filter over hourly close bars per series
    "q204_kalman" -> ((s, d) =>
      graft.analytics.Indicators.kalmanLevel(
        graft.analytics.Indicators.ohlcBars(Tables.events(s, d), "value",
            Seq("user_id"), "ts", bucket = "hour")
          .select("user_id", "bar", "close"),
        "close", Seq("user_id"), "bar", qVar = 0.01, rVar = 1.0)),

    // ── Goertzel periodogram at candidate periods per event type
    "q205_periodogram" -> ((s, d) =>
      graft.analytics.Indicators.periodogram(Tables.events(s, d), "value",
        Seq("event_type"), Seq(col("ts"), col("event_id")),
        periods = Seq(4, 6, 12, 24))),

    // ── RFM segmentation: quantile-breakpoint scoring, broadcast fences
    "q206_rfm" -> ((s, d) =>
      graft.analytics.Behavior.rfm(Tables.events(s, d), "user_id", "ts",
        "event_type", "value", label = "purchase")),

    // ── first-order Markov transition matrix over event-type sequences
    "q207_transitions" -> ((s, d) =>
      graft.analytics.Behavior.transitionMatrix(Tables.events(s, d),
        "user_id", "ts", "event_type", Seq(col("event_id")))),

    // ── Gini concentration of per-user total value within each event type
    //    (scale-safe per-distinct-value closed form — no per-group
    //    single-task rank window)
    "q208_gini" -> ((s, d) =>
      graft.ops.Stats.giniPerValue(
        Tables.events(s, d).filter(col("value").isNotNull)
          .groupBy("event_type", "user_id")
          .agg(sum(col("value").cast("decimal(28,10)")).cast("double")
            .as("user_total")),
        "user_total", Seq("event_type"))),

    // ── risk-adjusted performance ratios: Sharpe / Sortino / Calmar
    "q212_risk_ratios" -> ((s, d) =>
      graft.analytics.Indicators.riskRatios(Tables.events(s, d), "value",
        Seq("user_id"), Seq(col("ts"), col("event_id")))),

    // ── AR(1) fit + mean-reversion half-life per series
    "q213_ar_halflife" -> ((s, d) =>
      graft.analytics.Indicators.arHalfLife(Tables.events(s, d), "value",
        Seq("user_id"), Seq(col("ts"), col("event_id")))),

    // ── order-3 permutation entropy (Bandt–Pompe complexity) per series
    "q214_perm_entropy" -> ((s, d) =>
      graft.analytics.Indicators.permutationEntropy(Tables.events(s, d),
        "value", Seq("user_id"), Seq(col("ts"), col("event_id")))),

    // ── market-basket association rules over per-user event-type sets
    "q218_basket_lift" -> ((s, d) =>
      graft.analytics.Behavior.basketLift(Tables.events(s, d), "user_id",
        "event_type")),

    // ── KPSS level-stationarity statistic (Bartlett lags = 4) per series
    "q219_kpss" -> ((s, d) =>
      graft.analytics.Indicators.kpss(Tables.events(s, d), "value",
        Seq("user_id"), Seq(col("ts"), col("event_id")), lags = 4)),

    // ── time-to-convert distribution per funnel transition
    "q224_funnel_timing" -> ((s, d) =>
      graft.analytics.Behavior.funnelTiming(Tables.events(s, d), "user_id",
        "ts", "event_type", Seq("view", "click", "purchase"))),

    // ── top-20 frequent event 3-grams over per-user sequences
    "q229_event_ngrams" -> ((s, d) =>
      graft.analytics.Behavior.eventNgrams(Tables.events(s, d), "user_id",
        "ts", "event_type", Seq(col("event_id")), n = 3, topK = 20)),

    // ── RiskMetrics EWMA volatility (λ = 0.94) per series
    "q230_ewm_vol" -> ((s, d) =>
      graft.analytics.Indicators.ewmVolatility(Tables.events(s, d),
        "value", Seq("user_id"), "ts", lambda = 0.94,
        carry = Seq("event_id"))),

    // ── CAPM market beta: per-user hourly returns vs the cross-sectional
    //    market return
    "q231_market_beta" -> ((s, d) =>
      graft.analytics.Indicators.marketBeta(Tables.events(s, d), "value",
        "user_id", "ts", bucket = "hour")),

    // ── Benjamini–Hochberg FDR gate over the per-user Pettitt p battery
    "q232_bh_fdr" -> ((s, d) =>
      graft.ops.Stats.bhFdr(
        graft.analytics.Indicators.pettitt(Tables.events(s, d), "value",
            Seq("user_id"), Seq(col("ts"), col("event_id")))
          .select("user_id", "p_approx"),
        "p_approx", alpha = 0.05)),

    // ── exact lower weighted median: price weighted by quantity, per flag
    "q233_weighted_median" -> ((s, d) =>
      graft.ops.Stats.weightedMedian(Tables.lineitem(s, d),
        "l_extendedprice", "l_quantity", Seq("l_returnflag"))),

    // ── rolling 24h distinct actives per hour (rolling-DAU shape)
    "q234_rolling_actives" -> ((s, d) =>
      graft.analytics.Behavior.rollingActives(Tables.events(s, d), "ts",
        "user_id", bucket = "hour", windowN = 24)),

    // ── Lorenz curve deciles of per-user total value within event type
    "q235_lorenz" -> ((s, d) =>
      graft.ops.Stats.lorenzCurve(
        Tables.events(s, d).filter(col("value").isNotNull)
          .groupBy("event_type", "user_id")
          .agg(sum(col("value").cast("decimal(28,10)")).cast("double")
            .as("user_total")),
        "user_total", Seq("event_type"))),

    // ── Herfindahl concentration of value across users per event type
    "q236_hhi" -> ((s, d) =>
      graft.ops.Stats.hhi(Tables.events(s, d), "user_id", "value",
        Seq("event_type"))),

    // ── cohort churn: users silent > 7 days before the reference date
    "q237_churn" -> ((s, d) =>
      graft.analytics.Behavior.churnRate(Tables.events(s, d), "user_id",
        "ts", inactiveDays = 7)),

    // ── Hill tail-index estimator over the top-50 values per event type
    "q239_hill" -> ((s, d) =>
      graft.ops.Stats.hillEstimator(Tables.events(s, d), "value",
        Seq("event_type"), k = 50)),

    // ── 5–95% trimmed mean per event type (dropping robust location)
    "q240_trimmed_mean" -> ((s, d) =>
      graft.ops.Stats.trimmedMean(Tables.events(s, d), "value",
        Seq("event_type"), lo = 0.05, hi = 0.95)),

    // ── chi-square independence: event type × day-of-week + Cramér's V
    "q242_chi2" -> ((s, d) =>
      graft.ops.Stats.chiSquare(
        Tables.events(s, d).withColumn("dow", dayofweek(col("ts"))),
        "event_type", "dow")),

    // ── CUPED variance-reduced metric: value adjusted by the k covariate
    "q243_cuped" -> ((s, d) =>
      graft.ops.Stats.cuped(
        Tables.events(s, d).select(col("event_id"),
          col("value").as("y"),
          get_json_object(col("props"), "$.k").cast("double").as("x")),
        "y", "x")),

    // ── two-proportion z-test: purchase conversion, even vs odd users
    "q241_ab_test" -> ((s, d) => {
      val users = Tables.events(s, d).groupBy("user_id")
        .agg(max(when(col("event_type") === "purchase", 1).otherwise(0))
          .as("converted"))
        .withColumn("grp",
          when(col("user_id") % 2 === 0, "A").otherwise("B"))
      graft.ops.Stats.twoProportionZ(users, "grp", "converted", "A", "B")
    }),

    // ── DAU/MAU stickiness per day (two rolling-actives legs joined)
    "q238_stickiness" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val d1 = graft.analytics.Behavior.rollingActives(ev, "ts", "user_id",
        bucket = "day", windowN = 1).withColumnRenamed("active_keys", "dau")
      val d30 = graft.analytics.Behavior.rollingActives(ev, "ts", "user_id",
        bucket = "day", windowN = 30).withColumnRenamed("active_keys", "mau")
      d1.join(d30, Seq("bucket_ts"))
        .withColumn("stickiness",
          round(col("dau").cast("double") / col("mau"), 6))
    }),

    // ── F4 coerce-parse semantics: malformed timestamp strings → NULL
    //    (try_to_timestamp; ANSI to_timestamp would throw)
    "q227_coerce_ts" -> ((s, d) => {
      val strs = Tables.events(s, d).select(col("event_id"),
        when(col("event_id") % 97 === 0, lit("not-a-time"))
          .otherwise(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
          .as("parsed_ts"))
      graft.pipeline.Preprocess.coerceTimestamp(strs, "parsed_ts")
    }),

    // ── Tukey-fence outliers per event_type (exact quantiles + broadcast fences)
    "q105_outlier_iqr" -> ((s, d) =>
      graft.ops.Stats.iqrOutliers(Tables.events(s, d), "value",
          Seq("event_type"), k = 1.5)
        .select("event_id", "event_type", "value", "lo", "hi")),

    // ── incremental-rollup maintenance: merge per-day partial agg states;
    //    must equal the direct aggregate (the oracle computes it directly)
    "q109_agg_merge" -> ((s, d) =>
      graft.ops.Stats.mergePartials(
        graft.ops.Stats.partialAgg(Tables.events(s, d), Seq("event_type"),
          to_date(col("ts")), "value"),
        Seq("event_type"))),

    // ── interval-overlap join (binned): view sessions × click sessions
    //    per user; the oracle recomputes with a plain theta join, so the
    //    bucket-replication + later-start dedup trick is value-verified
    "q120_interval_overlap" -> ((s, d) => {
      val e = Tables.events(s, d)
      def sessions(t: String) = graft.ops.TimeSeriesOps.sessionAgg(
        e.filter(col("event_type") === t), Seq("user_id"), "ts", "value", 172800L)
      val a = sessions("view")
        .select(col("user_id"), col("session_start").as("a_start"),
          col("session_end").as("a_end"))
      val b = sessions("click")
        .select(col("user_id"), col("session_start").as("b_start"),
          col("session_end").as("b_end"))
      graft.ops.Intervals.overlapJoin(a, b, Seq("user_id"),
        "a_start", "a_end", "b_start", "b_end", bucketSeconds = 3600L)
    }),

    // ── ordered funnel: view → click → purchase progression per user
    "q117_funnel" -> ((s, d) =>
      graft.analytics.Behavior.funnel(Tables.events(s, d), "user_id", "ts",
        "event_type", Seq("view", "click", "purchase"))),

    // ── cohort retention: first-day cohort × active-day offsets
    "q118_retention" -> ((s, d) =>
      graft.analytics.Behavior.retention(Tables.events(s, d), "user_id", "ts")),

    // ── time-weighted average: each observation weighted by its holding
    //    interval, per user
    "q135_twap" -> ((s, d) =>
      graft.analytics.Indicators.twap(Tables.events(s, d), "value",
        Seq("user_id"), "ts")),

    // ── OHLC bars: open/high/low/close per user per hour
    "q136_ohlc_bars" -> ((s, d) =>
      graft.analytics.Indicators.ohlcBars(Tables.events(s, d), "value",
        Seq("user_id"), "ts", bucket = "hour")),

    // ── linear gap interpolation (pandas interpolate(method='time')):
    //    error rows' values nulled, then lerped on the time axis between
    //    real observations; edges back/forward-fill
    "q156_interpolate" -> ((s, d) =>
      graft.ops.TimeSeriesOps.interpolateLinear(
        Tables.events(s, d).select(col("user_id"), col("ts"), col("event_id"),
          when(col("event_type") === "error", lit(null).cast("double"))
            .otherwise(col("value")).as("v")),
        Seq("user_id"), "ts", "v")
        .select("user_id", "event_id", "v", "v_lerp")),

    // ── rolling median: the robust smoother over the trailing 5-row frame
    "q153_rolling_median" -> ((s, d) =>
      graft.analytics.Indicators.rollingMedian(
        Tables.events(s, d).select("user_id", "event_id", "ts", "value"),
        "value", Seq("user_id"), Seq(col("ts")), n = 5)
        .select("user_id", "event_id", "value", "rolling_median")),

    // ── EWMA per series (pandas ewm(adjust=False)): one ordered per-key
    //    fold, bit-identical left-to-right in both engines (α = 0.25 is
    //    exactly representable)
    "q144_ema" -> ((s, d) =>
      graft.analytics.Indicators.ema(Tables.events(s, d), "value",
        Seq("user_id"), "ts", alpha = 0.25)),

    // ── per-row running EMA (pandas ewm().mean() as a column), via the
    //    size-routed default: modest keys run the same left-to-right fold
    //    as q144 (bit-identical to the oracle's sequential recursion —
    //    which is why these hashes match), oversized keys would take the
    //    chunk-stitch path (none at catalog SFs; IndicatorsSpec forces the
    //    split with a tiny threshold)
    "q157_ema_series" -> ((s, d) =>
      graft.analytics.Indicators.emaSeriesAuto(Tables.events(s, d), "value",
        Seq("user_id"), "ts", alpha = 0.25, carry = Seq("event_id"))),

    // ── winsorization: clip into the per-group [p5, p95] exact-percentile
    //    band (broadcast bounds; data never shuffles)
    "q145_winsorize" -> ((s, d) =>
      graft.ops.Stats.winsorize(
        Tables.events(s, d).filter(col("value").isNotNull)
          .select("event_id", "event_type", "value"),
        "value", Seq("event_type"), 0.05, 0.95)),

    // ── per-key OLS: slope/intercept/R² of value on JSON prop k per user
    "q129_ols_per_key" -> ((s, d) =>
      graft.analytics.Indicators.olsPerKey(
        Tables.events(s, d)
          .withColumn("k", get_json_object(col("props"), "$.k").cast("double")),
        "k", "value", Seq("user_id"))),

    // ── Shannon entropy of the event-type distribution per user
    "q130_entropy" -> ((s, d) =>
      graft.analytics.Indicators.entropy(Tables.events(s, d), "event_type",
        Seq("user_id"))),

    // ── top-share cut: smallest set of lineitems covering 50% of each
    //    return flag's revenue mass (nucleus/top-p selection)
    "q138_top_share" -> ((s, d) =>
      graft.ops.Stats.topShare(Tables.lineitem(s, d), "l_extendedprice",
          Seq("l_returnflag"), Seq(col("l_orderkey"), col("l_linenumber")),
          share = 0.5)
        .select("l_returnflag", "l_orderkey", "l_linenumber",
          "l_extendedprice", "cum_share")),

    // ── k-fold CV assignment: salted-hash fold ids, summarized per fold
    "q139_kfold" -> ((s, d) =>
      graft.ops.Stats.kfoldAssign(Tables.documents(s, d), "doc_id", k = 5)
        .groupBy("fold")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"))),

    // ── feature scaling per user: sample z-score + min-max from one
    //    broadcast stats pass
    "q131_feature_scale" -> ((s, d) =>
      graft.ops.Stats.scaleFeatures(Tables.events(s, d), "value",
          Seq("user_id"))
        .select("user_id", "event_id", "value", "zscore", "minmax")),

    // ── one-hot encoding with a stable lexicographic category index
    "q132_one_hot" -> ((s, d) =>
      graft.ops.Stats.oneHotEncode(Tables.events(s, d), "event_type")
        .select("event_id", "event_type", "cat_index", "onehot_str")),

    // ── ANALYZE surface: per-column row/null/distinct counts in one pass
    "q124_column_stats" -> ((s, d) =>
      graft.ops.Stats.columnStats(Tables.events(s, d))),

    // ── equi-depth histogram: 8 equal-mass bins on exact quantile edges
    //    (binary-fraction probabilities so both engines interpolate at
    //    bit-identical positions)
    "q123_equidepth" -> ((s, d) =>
      graft.ops.Stats.equiDepthHistogram(Tables.events(s, d), "value", 8)),

    // ── median/MAD robust z-score outliers per event_type
    "q111_mad_outliers" -> ((s, d) =>
      graft.ops.Stats.madOutliers(Tables.events(s, d), "value",
          Seq("event_type"), k = 4.0)
        .select("event_id", "event_type", "value", "robust_z")))

  /** Runs verbatim in both Spark SQL and DuckDB. */
  private val TpchQ3Sql =
    """SELECT l_orderkey,
      | CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
      | o_orderdate, o_orderpriority
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |  AND l_shipdate > TIMESTAMP '1997-01-01'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderdate, l_orderkey
      |LIMIT 10""".stripMargin

  /** Generated DuckDB oracle for q42 — the FULL Granger sweep on the real
    * events table, p-values included. Three pieces, all mechanical and
    * shared with [[grangerSweepOracleSql]]'s scheme:
    *  1. per (predictor, lag): the centered-Gram symmetric elimination
    *     chain → F statistic (raw, no floor — the Spark side's pivoted
    *     uncentered elimination agrees to FP noise once the Gram moments
    *     are DECIMAL-exact, which Granger.test now guarantees);
    *  2. the F upper tail p = I_x(d2/2, d1/2) via the SAME continued
    *     fraction `Granger.regIncBeta` runs (a recursive CTE iterating
    *     Lentz steps to |δ−1| < 3e-16, lgamma for the log-beta front) —
    *     so both engines CONVERGE to the same value and round(5) is
    *     hash-stable;
    *  3. gotchas encoded: DuckDB `dayofweek` is Sunday=0 (Spark 1 → +1),
    *     WITH RECURSIVE forbids reusing a WINDOW name across CTEs
    *     (unique w_<pred><lag> names), and bare decimal literals in the
    *     recursion base must be CAST to DOUBLE or the recursive term's
    *     values get coerced to DECIMAL(2,1). */
  private def grangerPOracleSql(maxLag: Int): String = {
    def chain(prefix: String): (Seq[String], Seq[String]) = {
      val ctes = scala.collection.mutable.ArrayBuffer[String]()
      val fins = scala.collection.mutable.ArrayBuffer[String]()
      for (l <- 1 to maxLag) {
        val vars = (1 to l).map(i => s"a$i") ++ (1 to l).map(i => s"b$i") :+ "y"
        def pairs(vs: Seq[String]) =
          for (i <- vs.indices; j <- vs.indices if j >= i) yield (vs(i), vs(j))
        def cn(u: String, v: String) =
          if (vars.indexOf(u) <= vars.indexOf(v)) s"c_${u}_$v" else s"c_${v}_$u"
        val wn = s"w_$prefix$l"
        val lagCols =
          ((1 to l).map(i => s"lag(y, $i) OVER $wn AS a$i") ++
            (1 to l).map(i => s"lag(x, $i) OVER $wn AS b$i")).mkString(", ")
        val sums =
          (vars.map(v => s"sum($v) AS s_$v") ++
            pairs(vars).map { case (u, v) => s"sum($u*$v) AS s_${u}_$v" })
            .mkString(", ")
        val centered = pairs(vars)
          .map { case (u, v) => s"s_${u}_$v - s_$u*s_$v/n AS ${cn(u, v)}" }
          .mkString(", ")
        ctes += s"${prefix}l$l AS (SELECT sym, y, $lagCols FROM ${prefix}base " +
          s"WINDOW $wn AS (PARTITION BY sym ORDER BY t))"
        ctes += s"${prefix}m$l AS (SELECT sym, count(*) AS n, $sums FROM ${prefix}l$l " +
          s"WHERE a$l IS NOT NULL AND b$l IS NOT NULL GROUP BY sym)"
        ctes += s"${prefix}c$l AS (SELECT sym, n, $centered FROM ${prefix}m$l)"
        vars.init.zipWithIndex.foreach { case (e, idx) =>
          val remaining = vars.drop(idx + 1)
          val carry = if (idx >= l) ", rssr" else ""
          val cols = pairs(remaining)
            .map { case (u, v) =>
              s"${cn(u, v)} - ${cn(u, e)}*${cn(e, v)}/${cn(e, e)} AS ${cn(u, v)}" }
            .mkString(", ")
          val capture = if (idx + 1 == l)
            s", c_y_y - ${cn("y", e)}*${cn(e, "y")}/${cn(e, e)} AS rssr" else ""
          val src = if (idx == 0) s"${prefix}c$l" else s"${prefix}e${l}_$idx"
          ctes += s"${prefix}e${l}_${idx + 1} AS (SELECT sym, n$carry, $cols$capture FROM $src)"
        }
        fins += s"SELECT sym AS symbol, '${prefix.init}' AS predictor, $l AS lag, " +
          s"((rssr - c_y_y) / $l) / (c_y_y / (n - ${2 * l + 1})) AS f, " +
          s"CAST(n AS BIGINT) AS n_obs FROM ${prefix}e${l}_${2 * l}"
      }
      (ctes.toSeq, fins.toSeq)
    }
    val xExprs = Seq(
      "k_"   -> "CAST(json_extract(props, '$.k') AS DOUBLE)",
      "hod_" -> "CAST(hour(ts) AS DOUBLE)",
      "dow_" -> "CAST(dayofweek(ts) + 1 AS DOUBLE)")
    val (allCtes, allFins) = xExprs.map { case (p, x) =>
      // MATERIALIZED: this scan feeds every lag chain (5 references per
      // predictor) — un-hinted, DuckDB inlines and re-reads events ~15x
      // across the three predictors (measured 41.8s -> 2.9s, value-equal)
      val base = s"${p}base AS MATERIALIZED (SELECT user_id::VARCHAR AS sym, ts AS t, " +
        s"CAST(value AS DOUBLE) AS y, $x AS x FROM events " +
        s"WHERE user_id < 20 AND value IS NOT NULL AND $x IS NOT NULL)"
      val (cs, fs) = chain(p)
      (base +: cs, fs)
    }.unzip
    s"""WITH RECURSIVE ${allCtes.flatten.mkString(",\n")},
       |fs AS MATERIALIZED (
       |${allFins.flatten.mkString("\nUNION ALL\n")}),
       |prep AS MATERIALIZED (SELECT symbol, predictor, lag, n_obs, f,
       |  CAST(n_obs - 2*lag - 1 AS DOUBLE) AS d2, CAST(lag AS DOUBLE) AS d1
       |  FROM fs),
       |prep2 AS (SELECT *, d2/(d2 + d1*f) AS x0, d2/2.0 AS a0, d1/2.0 AS b0
       |  FROM prep),
       |prep3 AS (SELECT *,
       |  CASE WHEN x0 < (a0 + 1.0)/(a0 + b0 + 2.0) THEN 0 ELSE 1 END AS swp,
       |  CASE WHEN x0 < (a0 + 1.0)/(a0 + b0 + 2.0) THEN x0 ELSE 1.0 - x0 END AS xx,
       |  CASE WHEN x0 < (a0 + 1.0)/(a0 + b0 + 2.0) THEN a0 ELSE b0 END AS aa,
       |  CASE WHEN x0 < (a0 + 1.0)/(a0 + b0 + 2.0) THEN b0 ELSE a0 END AS bb
       |  FROM prep2),
       |prep4 AS MATERIALIZED (SELECT *,
       |  exp(aa*ln(xx) + bb*ln(1.0 - xx)
       |      - (lgamma(aa) + lgamma(bb) - lgamma(aa + bb))) AS front,
       |  1.0/(1.0 - (aa + bb)*xx/(aa + 1.0)) AS dinit
       |  FROM prep3),
       |cf AS (
       |  SELECT symbol, predictor, lag, 0 AS m, CAST(1.0 AS DOUBLE) AS c,
       |    dinit AS d, dinit AS h, CAST(2.0 AS DOUBLE) AS del
       |  FROM prep4
       |  UNION ALL
       |  SELECT symbol, predictor, lag, m + 1,
       |    1.0 + aa2/c1, 1.0/(1.0 + aa2*d1), h1*((1.0/(1.0 + aa2*d1))*(1.0 + aa2/c1)),
       |    (1.0/(1.0 + aa2*d1))*(1.0 + aa2/c1)
       |  FROM (
       |    SELECT s.*, p.aa, p.bb, p.xx,
       |      -(p.aa + (s.m+1))*((p.aa + p.bb) + (s.m+1))*p.xx
       |        /((p.aa + 2*(s.m+1))*((p.aa + 1.0) + 2*(s.m+1))) AS aa2,
       |      1.0/(1.0 + s.aa1*s.d) AS d1, 1.0 + s.aa1/s.c AS c1,
       |      s.h*((1.0/(1.0 + s.aa1*s.d))*(1.0 + s.aa1/s.c)) AS h1
       |    FROM (
       |      SELECT cf.*,
       |        (cf.m+1)*(p0.bb - (cf.m+1))*p0.xx
       |          /(((p0.aa - 1.0) + 2*(cf.m+1))*(p0.aa + 2*(cf.m+1))) AS aa1
       |      FROM cf JOIN prep4 p0 USING (symbol, predictor, lag)
       |      WHERE cf.m < 300 AND abs(cf.del - 1.0) >= 3e-16
       |    ) s JOIN prep4 p USING (symbol, predictor, lag)
       |  )
       |),
       |cfh AS (SELECT symbol, predictor, lag, h FROM (
       |  SELECT symbol, predictor, lag, h,
       |    row_number() OVER (PARTITION BY symbol, predictor, lag
       |      ORDER BY m DESC) AS rn
       |  FROM cf) WHERE rn = 1)
       |SELECT p.symbol, p.predictor, p.lag,
       |  round(CASE WHEN p.f <= 0 THEN 1.0
       |    WHEN p.swp = 1 THEN 1.0 - (p.front*cfh.h)/p.aa
       |    ELSE (p.front*cfh.h)/p.aa END, 5) AS p_value,
       |  p.n_obs
       |FROM prep4 p JOIN cfh USING (symbol, predictor, lag)""".stripMargin
  }

  /** Generated DuckDB oracle for [[q42c]]: per lag L, the F test's two RSS
    * values come from UNROLLED symmetric Gaussian elimination on the
    * centered Gram matrix of (y-lags a1..aL, x-lags b1..bL, y). Centering
    * (c_uv = Σuv − Σu·Σv/n) eliminates the intercept; then eliminating
    * a1..aL in order leaves c_y_y = rss_restricted, and continuing through
    * b1..bL leaves c_y_y = rss_unrestricted — the same Schur complements
    * `Granger.rss` reaches via pivoted elimination of the uncentered
    * normal equations. Each elimination step is the rank-1 update
    * c_uv ← c_uv − c_ue·c_ev/c_ee over the surviving variables, emitted as
    * one CTE per step (≤ 10 steps × ≤ 66 pair columns at L = 5). The SQL
    * is mechanical, so it is generated rather than hand-maintained. */
  private def grangerSweepOracleSql(maxLag: Int): String = {
    val chains = (1 to maxLag).map { l =>
      val vars = (1 to l).map(i => s"a$i") ++ (1 to l).map(i => s"b$i") :+ "y"
      def pairs(vs: Seq[String]) =
        for (i <- vs.indices; j <- vs.indices if j >= i) yield (vs(i), vs(j))
      def cn(u: String, v: String) =
        if (vars.indexOf(u) <= vars.indexOf(v)) s"c_${u}_$v" else s"c_${v}_$u"
      val lagCols =
        ((1 to l).map(i => s"lag(y, $i) OVER w AS a$i") ++
          (1 to l).map(i => s"lag(x, $i) OVER w AS b$i")).mkString(", ")
      val sums =
        (vars.map(v => s"sum($v) AS s_$v") ++
          pairs(vars).map { case (u, v) => s"sum($u*$v) AS s_${u}_$v" })
          .mkString(", ")
      val centered = pairs(vars)
        .map { case (u, v) => s"s_${u}_$v - s_$u*s_$v/n AS ${cn(u, v)}" }
        .mkString(", ")
      // one CTE per eliminated variable; after the L-th (all y-lags gone)
      // the running c_y_y is captured as rssr and carried through
      val steps = vars.init.zipWithIndex.map { case (e, idx) =>
        val remaining = vars.drop(idx + 1)
        val carry = if (idx >= l) ", rssr" else ""
        val cols = pairs(remaining)
          .map { case (u, v) =>
            s"${cn(u, v)} - ${cn(u, e)}*${cn(e, v)}/${cn(e, e)} AS ${cn(u, v)}" }
          .mkString(", ")
        val capture = if (idx + 1 == l) s", c_y_y - ${cn("y", e)}*${cn(e, "y")}/${cn(e, e)} AS rssr" else ""
        s"e${l}_${idx + 1} AS (SELECT sym, n$carry, $cols$capture FROM " +
          (if (idx == 0) s"c$l" else s"e${l}_$idx") + ")"
      }
      val fin =
        s"""SELECT sym AS symbol, 'x' AS predictor, $l AS lag,
           | floor(((rssr - c_y_y) / $l) / (c_y_y / (n - ${2 * l + 1})) * 100 + 0.5) / 100 AS f_stat,
           | CAST(n AS BIGINT) AS n_obs FROM e${l}_${2 * l}""".stripMargin
      val ctes = Seq(
        s"l$l AS (SELECT sym, y, $lagCols FROM base WINDOW w AS (PARTITION BY sym ORDER BY t))",
        s"m$l AS (SELECT sym, count(*) AS n, $sums FROM l$l WHERE a$l IS NOT NULL AND b$l IS NOT NULL GROUP BY sym)",
        s"c$l AS (SELECT sym, n, $centered FROM m$l)") ++ steps
      (ctes, fin)
    }
    val base =
      """base AS MATERIALIZED (
        |  SELECT 's' || (range % 4) AS sym, range // 4 + 1 AS t,
        |    CAST((3*(range//4+4)*(range//4+4) + 7*(range//4+4) + 5*(range%4)) % 23 AS DOUBLE) AS x,
        |    CAST(2*((3*(range//4+3)*(range//4+3) + 7*(range//4+3) + 5*(range%4)) % 23)
        |       + ((3*(range//4+1)*(range//4+1) + 7*(range//4+1) + 5*(range%4)) % 23)
        |       + ((range//4+1) % 7) * 3 AS DOUBLE) AS y
        |  FROM range(10000))""".stripMargin
    (base +: chains.flatMap(_._1)).mkString("WITH ", ",\n", "\n") +
      chains.map(_._2).mkString("\nUNION ALL\n")
  }

  /** The split-conformal chain ending in `conf(user_id, bar, y, yhat,
    * lo, hi, covered, n_cal, qhat, coverage)` — q272 selects it directly;
    * q277 scores the intervals on top. */
  private val ConformalCtes =
    """bars AS (SELECT user_id, date_trunc('hour', ts) AS bar,
      |  arg_max(value, ts) AS close FROM events
      | WHERE value IS NOT NULL GROUP BY 1, 2),
      |lagd AS (SELECT user_id, bar, close,
      |  lag(close) OVER (PARTITION BY user_id ORDER BY bar) AS yhat FROM bars),
      |idx AS (SELECT user_id, bar, close, yhat,
      |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY bar) AS BIGINT) AS rn,
      |  CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
      | FROM lagd WHERE yhat IS NOT NULL),
      |nc AS (SELECT *, CAST(ceil(CAST(n AS DECIMAL(20,0)) * 0.80) AS BIGINT) AS ncal
      | FROM idx),
      |cal AS (SELECT user_id, bar, abs(close - yhat) AS r, ncal
      | FROM nc WHERE rn <= ncal),
      |rr AS (SELECT user_id, r, ncal,
      |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY r, bar) AS BIGINT) AS rrn
      | FROM cal),
      |qh AS (SELECT user_id, r AS qhat FROM rr
      | WHERE rrn = least(CAST(floor(CAST((ncal + 1) * 9 + 9 AS DOUBLE) / 10) AS BIGINT), ncal)),
      |cov AS (SELECT nc.user_id, bar, close, yhat, ncal, qhat,
      |  CASE WHEN close >= yhat - qhat AND close <= yhat + qhat
      |    THEN 1 ELSE 0 END AS covered
      | FROM nc JOIN qh USING (user_id) WHERE rn > ncal),
      |conf AS (SELECT user_id, bar, close AS y, yhat,
      | round(yhat - qhat, 6) AS lo, round(yhat + qhat, 6) AS hi,
      | covered, ncal AS n_cal, round(qhat, 6) AS qhat,
      | round(CAST(sum(covered) OVER (PARTITION BY user_id) AS DOUBLE)
      |   / count(*) OVER (PARTITION BY user_id), 6) AS coverage
      |FROM cov)""".stripMargin

  /** The Holt recursive-CTE chain ending in `st(user_id, rn, bar, close,
    * l, b, f)` — q253 selects it directly; q257 evaluates forecast
    * accuracy on top. Goes after WITH RECURSIVE. */
  private val HoltCtes =
    """bars AS (SELECT user_id, date_trunc('hour', ts) AS bar,
      |  arg_max(value, ts) AS close FROM events
      | WHERE value IS NOT NULL GROUP BY 1, 2),
      |idx AS (SELECT user_id, bar, close,
      |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY bar)
      |    AS BIGINT) AS rn FROM bars),
      |st AS (
      | SELECT i1.user_id, CAST(1 AS BIGINT) AS rn, i1.bar, i1.close,
      |  i1.close AS l, i2.close - i1.close AS b, i1.close AS f
      | FROM idx i1 JOIN idx i2
      |   ON i2.user_id = i1.user_id AND i2.rn = 2
      | WHERE i1.rn = 1
      | UNION ALL
      | SELECT s.user_id, s.rn + 1, i.bar, i.close,
      |  CAST(0.5 AS DOUBLE) * i.close
      |    + CAST(0.5 AS DOUBLE) * (s.l + s.b),
      |  CAST(0.25 AS DOUBLE) * ((CAST(0.5 AS DOUBLE) * i.close
      |      + CAST(0.5 AS DOUBLE) * (s.l + s.b)) - s.l)
      |    + CAST(0.75 AS DOUBLE) * s.b,
      |  s.l + s.b
      | FROM st s JOIN idx i
      |   ON i.user_id = s.user_id AND i.rn = s.rn + 1)""".stripMargin

  /** The q308 DDSketch replay — shared with q325, whose compacted store
    * reads identically (counter addition is the merge everywhere). */
  private lazy val ddSketchOracleSql: String = {
      val (lnG, g, gp1) = graft.ops.Stats.ddSketchConsts(10)
      s"""WITH b AS (SELECT o_orderpriority AS k,
         |  CAST(ceil(ln(CAST(o_totalprice AS DOUBLE))
         |    / CAST('$lnG' AS DOUBLE)) AS BIGINT) AS bkt
         | FROM orders WHERE o_totalprice > 0),
         |sk AS (SELECT k, bkt, CAST(count(*) AS BIGINT) AS c FROM b
         | GROUP BY 1, 2),
         |cm AS (SELECT *, CAST(sum(c) OVER (PARTITION BY k ORDER BY bkt
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS cum,
         |  CAST(sum(c) OVER (PARTITION BY k) AS BIGINT) AS n FROM sk),
         |est AS (SELECT *, round(2.0 * pow(CAST('$g' AS DOUBLE), bkt)
         |    / CAST('$gp1' AS DOUBLE), 6) AS e FROM cm)
         |SELECT k AS o_orderpriority, max(n) AS n,
         | CAST(count(*) AS BIGINT) AS n_buckets,
         | min(CASE WHEN cum >= (n * 500 + 999) // 1000 THEN e END) AS p50,
         | min(CASE WHEN cum >= (n * 950 + 999) // 1000 THEN e END) AS p95,
         | min(CASE WHEN cum >= (n * 990 + 999) // 1000 THEN e END) AS p99
         |FROM est GROUP BY 1""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q42c_granger_sweep_f" -> grangerSweepOracleSql(5),
    // q42 GRADUATES to fully hash-checked: DECIMAL-exact Gram moments +
    // the shared continued-fraction F tail make the p-values themselves
    // reproducible cross-engine at round(5)
    "q42_granger" -> grangerPOracleSql(5),
    // PSI: fences quantized to 6 dp in both engines before binning; the
    // bin index is a fence-indicator sum (no width_bucket in DuckDB);
    // terms from UNROUNDED shares, quantized to DECIMAL pre-sum
    "q262_psi_drift" ->
      """WITH r AS (SELECT value FROM events
        | WHERE event_type = 'view' AND value IS NOT NULL),
        |c AS (SELECT value FROM events
        | WHERE event_type = 'purchase' AND value IS NOT NULL),
        |f AS (SELECT list_transform(
        |  quantile_cont(value, [CAST(0.1 AS DOUBLE), CAST(0.2 AS DOUBLE),
        |    CAST(0.3 AS DOUBLE), CAST(0.4 AS DOUBLE), CAST(0.5 AS DOUBLE),
        |    CAST(0.6 AS DOUBLE), CAST(0.7 AS DOUBLE), CAST(0.8 AS DOUBLE),
        |    CAST(0.9 AS DOUBLE)]), x -> floor(x * 1e6 + 0.5) / 1e6) AS fl
        |  FROM r),
        |rb AS (SELECT len(list_filter(f.fl, x -> r.value > x)) AS bin,
        |  CAST(count(*) AS BIGINT) AS ref_n FROM r, f GROUP BY 1),
        |cb AS (SELECT len(list_filter(f.fl, x -> c.value > x)) AS bin,
        |  CAST(count(*) AS BIGINT) AS cur_n FROM c, f GROUP BY 1),
        |bins AS (SELECT unnest(generate_series(0, 9)) AS bin),
        |jn AS (SELECT bins.bin, coalesce(rb.ref_n, 0) AS ref_n,
        |  coalesce(cb.cur_n, 0) AS cur_n
        | FROM bins LEFT JOIN rb USING (bin) LEFT JOIN cb USING (bin)),
        |t AS (SELECT bin, ref_n, cur_n,
        |  CAST(sum(ref_n) OVER () AS BIGINT) AS rt,
        |  CAST(sum(cur_n) OVER () AS BIGINT) AS ct FROM jn),
        |sh AS (SELECT bin, ref_n, cur_n,
        |  greatest(coalesce(CAST(ref_n AS DOUBLE) /
        |    (CASE WHEN rt > 0 THEN CAST(rt AS DOUBLE) END), 0), 1e-6) AS rs,
        |  greatest(coalesce(CAST(cur_n AS DOUBLE) /
        |    (CASE WHEN ct > 0 THEN CAST(ct AS DOUBLE) END), 0), 1e-6) AS cs
        | FROM t),
        |tm AS (SELECT bin, ref_n, cur_n, rs, cs,
        |  CAST((cs - rs) * ln(cs / rs) AS DECIMAL(28,12)) AS term FROM sh)
        |SELECT bin, ref_n, cur_n, round(rs, 6) AS ref_share,
        |  round(cs, 6) AS cur_share,
        |  round(CAST(term AS DOUBLE), 6) AS psi_term,
        |  round(CAST(sum(term) OVER () AS DOUBLE), 6) AS psi
        |FROM tm""".stripMargin,
    "q46_sql_tpch_q3" -> TpchQ3Sql,
    "q103_bollinger" ->
      """WITH b AS (SELECT user_id, event_id, value,
        |  count(value) OVER w AS cnt,
        |  CAST(sum(CAST(value AS DECIMAL(28,10))) OVER w AS DOUBLE) AS sx,
        |  CAST(sum(CAST(value * value AS DECIMAL(28,10))) OVER w AS DOUBLE) AS sxx
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id, value,
        | CASE WHEN cnt = 20 THEN round(sx / cnt, 6) END AS bb_mid,
        | CASE WHEN cnt = 20 THEN round(sx / cnt
        |   + 2.0 * sqrt((sxx - sx * sx / cnt) / (cnt - 1)), 6) END AS bb_upper,
        | CASE WHEN cnt = 20 THEN round(sx / cnt
        |   - 2.0 * sqrt((sxx - sx * sx / cnt) / (cnt - 1)), 6) END AS bb_lower
        |FROM b""".stripMargin,
    "q104_rsi" ->
      """WITH d AS (SELECT user_id, event_id, ts, value,
        |  CAST(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    AS DECIMAL(28,10)) AS diff
        | FROM events),
        |g AS (SELECT user_id, event_id, value,
        |  CAST(sum(CASE WHEN diff > 0 THEN diff
        |    ELSE CAST(0 AS DECIMAL(28,10)) END) OVER w AS DOUBLE) AS gain,
        |  CAST(sum(CASE WHEN diff < 0 THEN -diff
        |    ELSE CAST(0 AS DECIMAL(28,10)) END) OVER w AS DOUBLE) AS loss,
        |  count(diff) OVER w AS nd
        | FROM d WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id, value,
        | CASE WHEN nd = 14 AND gain + loss > 0
        |   THEN round(100.0 * gain / (gain + loss), 6) END AS rsi
        |FROM g""".stripMargin,
    "q121_rolling_corr" ->
      """WITH e AS (SELECT user_id, event_id, ts, value,
        |  CAST(json_extract(props, '$.k') AS DOUBLE) AS k FROM events),
        |b AS (SELECT user_id, event_id, value, k,
        |  count(CASE WHEN value IS NOT NULL AND k IS NOT NULL THEN 1 END) OVER w AS cnt,
        |  CAST(sum(CASE WHEN value IS NOT NULL AND k IS NOT NULL
        |    THEN CAST(value AS DECIMAL(28,10)) END) OVER w AS DOUBLE) AS sx,
        |  CAST(sum(CASE WHEN value IS NOT NULL AND k IS NOT NULL
        |    THEN CAST(k AS DECIMAL(28,10)) END) OVER w AS DOUBLE) AS sy,
        |  CAST(sum(CASE WHEN value IS NOT NULL AND k IS NOT NULL
        |    THEN CAST(value * value AS DECIMAL(28,10)) END) OVER w AS DOUBLE) AS sxx,
        |  CAST(sum(CASE WHEN value IS NOT NULL AND k IS NOT NULL
        |    THEN CAST(k * k AS DECIMAL(28,10)) END) OVER w AS DOUBLE) AS syy,
        |  CAST(sum(CASE WHEN value IS NOT NULL AND k IS NOT NULL
        |    THEN CAST(value * k AS DECIMAL(28,10)) END) OVER w AS DOUBLE) AS sxy
        | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id, value, k,
        | CASE WHEN cnt = 20 AND cnt * sxx - sx * sx > 0 AND cnt * syy - sy * sy > 0
        |   THEN round((cnt * sxy - sx * sy) /
        |     sqrt((cnt * sxx - sx * sx) * (cnt * syy - sy * sy)), 6)
        | END AS rolling_corr
        |FROM b""".stripMargin,
    "q173_rolling_beta" ->
      """WITH e AS (SELECT user_id, event_id, ts, value,
        |  CAST(json_extract(props, '$.k') AS DOUBLE) AS k FROM events),
        |b AS (SELECT user_id, event_id, value, k,
        |  count(CASE WHEN value IS NOT NULL AND k IS NOT NULL THEN 1 END) OVER w AS cnt,
        |  CAST(sum(CASE WHEN value IS NOT NULL AND k IS NOT NULL
        |    THEN CAST(k AS DECIMAL(28,10)) END) OVER w AS DOUBLE) AS sx,
        |  CAST(sum(CASE WHEN value IS NOT NULL AND k IS NOT NULL
        |    THEN CAST(value AS DECIMAL(28,10)) END) OVER w AS DOUBLE) AS sy,
        |  CAST(sum(CASE WHEN value IS NOT NULL AND k IS NOT NULL
        |    THEN CAST(k * k AS DECIMAL(28,10)) END) OVER w AS DOUBLE) AS sxx,
        |  CAST(sum(CASE WHEN value IS NOT NULL AND k IS NOT NULL
        |    THEN CAST(value * k AS DECIMAL(28,10)) END) OVER w AS DOUBLE) AS sxy
        | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id, value, k,
        | CASE WHEN cnt = 20 AND cnt * sxx - sx * sx > 0
        |   THEN round((cnt * sxy - sx * sy) / (cnt * sxx - sx * sx), 6)
        | END AS rolling_beta,
        | CASE WHEN cnt = 20 AND cnt * sxx - sx * sx > 0
        |   THEN round((sy - (cnt * sxy - sx * sy) / (cnt * sxx - sx * sx) * sx)
        |     / cnt, 6)
        | END AS rolling_alpha
        |FROM b""".stripMargin,
    // MACD: the three EMA folds replay the Spark recursion exactly — the α
    // constants are this JVM's shortest-repr doubles (string round-trip ≡
    // bit-identical), each leg quantizes at the same point as the Spark
    // side (per-leg quant6), and the signal fold runs over the quantized
    // macd list, as emaSeries does
    "q174_macd" -> {
      val aF = 2.0 / 13.0; val aS = 2.0 / 27.0; val aG = 2.0 / 10.0
      val bF = 1.0 - aF; val bS = 1.0 - aS; val bG = 1.0 - aG
      s"""WITH p AS (SELECT user_id,
         |    list(event_id ORDER BY ts, event_id) AS ids,
         |    list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS xs
         |  FROM events WHERE value IS NOT NULL GROUP BY 1),
         |i AS (SELECT user_id, unnest(range(1, len(xs) + 1)) AS rn, ids, xs
         |  FROM p),
         |e AS (SELECT user_id, rn, ids[rn] AS event_id, xs[rn] AS value,
         |  floor(list_reduce(xs[1:rn], (acc, x) ->
         |    CAST($bF AS DOUBLE) * acc + CAST($aF AS DOUBLE) * x)
         |    * 1000000.0 + 0.5) / 1000000.0 AS ema_fast,
         |  floor(list_reduce(xs[1:rn], (acc, x) ->
         |    CAST($bS AS DOUBLE) * acc + CAST($aS AS DOUBLE) * x)
         |    * 1000000.0 + 0.5) / 1000000.0 AS ema_slow
         |  FROM i),
         |m AS (SELECT *, ema_fast - ema_slow AS macd FROM e),
         |g AS (SELECT user_id, list(macd ORDER BY rn) AS ms FROM m GROUP BY 1),
         |j AS (SELECT m.user_id, m.event_id, m.value, m.ema_fast, m.ema_slow,
         |  m.macd,
         |  floor(list_reduce(ms[1:m.rn], (acc, x) ->
         |    CAST($bG AS DOUBLE) * acc + CAST($aG AS DOUBLE) * x)
         |    * 1000000.0 + 0.5) / 1000000.0 AS macd_signal
         |  FROM m JOIN g USING (user_id))
         |SELECT user_id, event_id, value, ema_fast, ema_slow, macd,
         |  macd_signal, macd - macd_signal AS macd_hist FROM j""".stripMargin
    },
    "q175_stochastic" ->
      """WITH b AS (SELECT user_id, event_id, ts, value,
        |  CASE WHEN count(value) OVER wn = 14
        |            AND max(value) OVER wn > min(value) OVER wn
        |    THEN floor((value - min(value) OVER wn)
        |      / (max(value) OVER wn - min(value) OVER wn) * 100.0
        |      * 1000000.0 + 0.5) / 1000000.0 END AS pct_k
        | FROM events WINDOW wn AS (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)),
        |d AS (SELECT user_id, event_id, value, pct_k,
        |  lag(pct_k, 1) OVER wb AS k1, lag(pct_k, 2) OVER wb AS k2
        | FROM b WINDOW wb AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, event_id, value, pct_k,
        | CASE WHEN pct_k IS NOT NULL AND k1 IS NOT NULL AND k2 IS NOT NULL
        |   THEN floor((pct_k + k1 + k2) / CAST(3 AS DOUBLE)
        |     * 1000000.0 + 0.5) / 1000000.0 END AS pct_d
        |FROM d""".stripMargin,
    "q176_acf" ->
      """WITH b AS (SELECT user_id, value,
        |  lag(value, 1) OVER w AS l1, lag(value, 2) OVER w AS l2,
        |  lag(value, 3) OVER w AS l3, lag(value, 4) OVER w AS l4,
        |  lag(value, 5) OVER w AS l5
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |u AS (
        | SELECT user_id, 1 AS lag_k, value AS x, l1 AS xl FROM b
        | UNION ALL SELECT user_id, 2, value, l2 FROM b
        | UNION ALL SELECT user_id, 3, value, l3 FROM b
        | UNION ALL SELECT user_id, 4, value, l4 FROM b
        | UNION ALL SELECT user_id, 5, value, l5 FROM b),
        |a AS (SELECT user_id, lag_k,
        |  count(CASE WHEN x IS NOT NULL AND xl IS NOT NULL THEN 1 END) AS n_pairs,
        |  CAST(sum(CASE WHEN x IS NOT NULL AND xl IS NOT NULL
        |    THEN CAST(x AS DECIMAL(28,10)) END) AS DOUBLE) AS sx,
        |  CAST(sum(CASE WHEN x IS NOT NULL AND xl IS NOT NULL
        |    THEN CAST(xl AS DECIMAL(28,10)) END) AS DOUBLE) AS sy,
        |  CAST(sum(CASE WHEN x IS NOT NULL AND xl IS NOT NULL
        |    THEN CAST(x * x AS DECIMAL(28,10)) END) AS DOUBLE) AS sxx,
        |  CAST(sum(CASE WHEN x IS NOT NULL AND xl IS NOT NULL
        |    THEN CAST(xl * xl AS DECIMAL(28,10)) END) AS DOUBLE) AS syy,
        |  CAST(sum(CASE WHEN x IS NOT NULL AND xl IS NOT NULL
        |    THEN CAST(x * xl AS DECIMAL(28,10)) END) AS DOUBLE) AS sxy
        | FROM u GROUP BY 1, 2)
        |SELECT user_id, lag_k, n_pairs,
        | CASE WHEN n_pairs >= 10 AND n_pairs * sxx - sx * sx > 0
        |           AND n_pairs * syy - sy * sy > 0
        |   THEN round((n_pairs * sxy - sx * sy) /
        |     sqrt((n_pairs * sxx - sx * sx) * (n_pairs * syy - sy * sy)), 6)
        | END AS acf
        |FROM a""".stripMargin,
    "q177_tail_risk" ->
      """WITH b AS (SELECT event_type, event_id, value,
        |  row_number() OVER (PARTITION BY event_type ORDER BY value, event_id)
        |    AS rn,
        |  count(*) OVER (PARTITION BY event_type) AS n
        | FROM events WHERE value IS NOT NULL),
        |k AS (SELECT *, greatest(1,
        |  CAST(ceil(CAST(0.05 AS DOUBLE) * n) AS BIGINT)) AS kk FROM b)
        |SELECT event_type, max(n) AS n_obs, max(kk) AS tail_n,
        | max(value) AS var_tail,
        | round(CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE) / max(kk), 6)
        |   AS es_tail
        |FROM k WHERE rn <= kk GROUP BY 1""".stripMargin,
    "q178_moments" ->
      """WITH a AS (SELECT event_type,
        |  count(value) AS n_obs,
        |  CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS s1,
        |  CAST(sum(CAST(value * value AS DECIMAL(28,10))) AS DOUBLE) AS s2,
        |  CAST(sum(CAST(value * value * value AS DECIMAL(28,10))) AS DOUBLE)
        |    AS s3,
        |  CAST(sum(CAST(value * value * value * value AS DECIMAL(28,10)))
        |    AS DOUBLE) AS s4
        | FROM events GROUP BY 1),
        |c AS (SELECT event_type, n_obs, CAST(n_obs AS DOUBLE) AS n,
        |  s1 / CAST(n_obs AS DOUBLE) AS mean, s2 / CAST(n_obs AS DOUBLE) AS r2,
        |  s3 / CAST(n_obs AS DOUBLE) AS r3, s4 / CAST(n_obs AS DOUBLE) AS r4
        | FROM a),
        |f AS (SELECT event_type, n_obs, mean,
        |  r2 - mean * mean AS m2,
        |  r3 - CAST(3 AS DOUBLE) * mean * r2
        |     + CAST(2 AS DOUBLE) * mean * mean * mean AS m3,
        |  r4 - CAST(4 AS DOUBLE) * mean * r3
        |     + CAST(6 AS DOUBLE) * mean * mean * r2
        |     - CAST(3 AS DOUBLE) * mean * mean * mean * mean AS m4
        | FROM c)
        |SELECT event_type, n_obs, round(mean, 6) AS mean,
        | CASE WHEN n_obs >= 2 THEN round(m2, 6) END AS variance,
        | CASE WHEN n_obs >= 3 AND m2 > 0
        |   THEN round(m3 / (m2 * sqrt(m2)), 6) END AS skewness,
        | CASE WHEN n_obs >= 3 AND m2 > 0
        |   THEN round(m4 / (m2 * m2) - CAST(3 AS DOUBLE), 6) END
        |   AS kurtosis_excess
        |FROM f""".stripMargin,
    "q180_candles" ->
      """WITH bars AS (SELECT user_id, date_trunc('hour', ts) AS bar,
        |  arg_min(value, ts) AS open, max(value) AS high, min(value) AS low,
        |  arg_max(value, ts) AS close, count(*) AS n_ticks
        | FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |l AS (SELECT *, lag(open) OVER w AS po, lag(close) OVER w AS pc
        | FROM bars WINDOW w AS (PARTITION BY user_id ORDER BY bar))
        |SELECT user_id, bar, open, high, low, close, n_ticks,
        | (high - low > 0 AND abs(close - open) * CAST(10 AS DOUBLE)
        |   <= high - low) AS doji,
        | (high - low > 0
        |   AND least(open, close) - low >= abs(close - open) * CAST(2 AS DOUBLE)
        |   AND high - greatest(open, close) <= abs(close - open)) AS hammer,
        | (pc IS NOT NULL AND pc < po AND close - open > 0
        |   AND open <= pc AND close >= po) AS bull_engulf
        |FROM l""".stripMargin,
    "q181_cusum" ->
      """WITH p AS (SELECT user_id,
        |   list(event_id ORDER BY ts, event_id) AS ids,
        |   list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS xs,
        |   CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE) / count(value)
        |     AS mu
        | FROM events WHERE value IS NOT NULL GROUP BY 1),
        |i AS (SELECT user_id, mu, unnest(range(1, len(xs) + 1)) AS rn, ids, xs
        | FROM p)
        |SELECT user_id, ids[rn] AS event_id, xs[rn] AS value,
        | floor(mu * 1000000.0 + 0.5) / 1000000.0 AS mu,
        | floor(list_reduce(list_prepend(CAST(0 AS DOUBLE), xs[1:rn]),
        |   (acc, x) -> greatest(CAST(0 AS DOUBLE), acc + (x - mu)))
        |   * 1000000.0 + 0.5) / 1000000.0 AS cusum_pos,
        | floor(list_reduce(list_prepend(CAST(0 AS DOUBLE), xs[1:rn]),
        |   (acc, x) -> least(CAST(0 AS DOUBLE), acc + (x - mu)))
        |   * 1000000.0 + 0.5) / 1000000.0 AS cusum_neg
        |FROM i""".stripMargin,
    "q183_donchian" ->
      """WITH b AS (SELECT user_id, event_id, ts, value,
        |  CASE WHEN count(value) OVER wn = 20
        |    THEN max(value) OVER wn END AS dc_upper,
        |  CASE WHEN count(value) OVER wn = 20
        |    THEN min(value) OVER wn END AS dc_lower,
        |  CASE WHEN count(value) OVER wn = 20
        |    THEN (max(value) OVER wn + min(value) OVER wn)
        |      / CAST(2 AS DOUBLE) END AS dc_mid
        | FROM events WINDOW wn AS (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id, value, dc_upper, dc_lower, dc_mid,
        | coalesce(value > lag(dc_upper, 1) OVER
        |   (PARTITION BY user_id ORDER BY ts, event_id), FALSE) AS breakout
        |FROM b""".stripMargin,
    "q184_obv" ->
      """WITH t AS (SELECT user_id, event_id, ts, value,
        |  CASE WHEN lag(value, 1) OVER w IS NULL THEN CAST(0 AS DECIMAL(28,10))
        |       WHEN value > lag(value, 1) OVER w
        |         THEN CAST(abs(value) AS DECIMAL(28,10))
        |       WHEN value < lag(value, 1) OVER w
        |         THEN -CAST(abs(value) AS DECIMAL(28,10))
        |       ELSE CAST(0 AS DECIMAL(28,10)) END AS term
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, event_id, value,
        | round(CAST(sum(term) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 6)
        |   AS obv
        |FROM t""".stripMargin,
    // Engle–Granger: stage-1 OLS uses the q129 moment forms (beta/alpha
    // ROUNDED to 6dp in both engines — the residuals derive from the
    // rounded fit, pinning them bit-for-bit), stage 2 the lag-0 DF
    // regression in the identical closed-form order
    "q185_coint" ->
      """WITH e AS (SELECT user_id, event_id, ts, value AS y,
        |  CAST(json_extract(props, '$.k') AS DOUBLE) AS x FROM events),
        |a AS (SELECT user_id,
        |  count(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN 1 END) AS n_obs,
        |  CAST(sum(CASE WHEN x IS NOT NULL AND y IS NOT NULL
        |    THEN CAST(x AS DECIMAL(28,10)) END) AS DOUBLE) AS sx,
        |  CAST(sum(CASE WHEN x IS NOT NULL AND y IS NOT NULL
        |    THEN CAST(y AS DECIMAL(28,10)) END) AS DOUBLE) AS sy,
        |  CAST(sum(CASE WHEN x IS NOT NULL AND y IS NOT NULL
        |    THEN CAST(x * x AS DECIMAL(28,10)) END) AS DOUBLE) AS sxx,
        |  CAST(sum(CASE WHEN x IS NOT NULL AND y IS NOT NULL
        |    THEN CAST(y * x AS DECIMAL(28,10)) END) AS DOUBLE) AS sxy
        | FROM e GROUP BY 1),
        |f AS (SELECT user_id, n_obs,
        |  CASE WHEN n_obs * sxx - sx * sx > 0
        |    THEN round((n_obs * sxy - sx * sy) / (n_obs * sxx - sx * sx), 6)
        |  END AS beta,
        |  CASE WHEN n_obs * sxx - sx * sx > 0
        |    THEN round((sy - (n_obs * sxy - sx * sy) / (n_obs * sxx - sx * sx)
        |      * sx) / n_obs, 6)
        |  END AS alpha_int
        | FROM a),
        |r AS (SELECT e.user_id, f.n_obs, f.beta, f.alpha_int, e.ts, e.event_id,
        |   e.y - (f.alpha_int + f.beta * e.x) AS res
        | FROM e JOIN f USING (user_id)
        | WHERE e.x IS NOT NULL AND e.y IS NOT NULL AND f.beta IS NOT NULL),
        |l AS (SELECT *, lag(res, 1) OVER
        |   (PARTITION BY user_id ORDER BY ts, event_id) AS lres FROM r),
        |d AS (SELECT user_id, n_obs, beta, alpha_int, lres, res - lres AS dres
        | FROM l WHERE lres IS NOT NULL),
        |g AS (SELECT user_id, max(n_obs) AS n_obs, max(beta) AS beta,
        |  max(alpha_int) AS alpha_int, count(*) AS m,
        |  CAST(sum(CAST(lres * dres AS DECIMAL(28,10))) AS DOUBLE) AS sld,
        |  CAST(sum(CAST(lres * lres AS DECIMAL(28,10))) AS DOUBLE) AS sll,
        |  CAST(sum(CAST(dres * dres AS DECIMAL(28,10))) AS DOUBLE) AS sdd
        | FROM d GROUP BY 1)
        |SELECT user_id, n_obs, beta, alpha_int, m,
        | CASE WHEN sll > 0 THEN round(sld / sll, 6) END AS phi,
        | CASE WHEN m >= 3 AND sll > 0
        |       AND sdd - CAST(2 AS DOUBLE) * (sld / sll) * sld
        |           + (sld / sll) * (sld / sll) * sll > 0
        |   THEN round((sld / sll) / sqrt(((sdd
        |     - CAST(2 AS DOUBLE) * (sld / sll) * sld
        |     + (sld / sll) * (sld / sll) * sll) / (m - 1)) / sll), 6)
        | END AS df_stat
        |FROM g""".stripMargin,
    "q186_ks" ->
      """WITH b AS (SELECT value, event_type FROM events
        |  WHERE value IS NOT NULL AND event_type IN ('view', 'purchase')),
        |p AS (SELECT value AS v,
        |  count(CASE WHEN event_type = 'view' THEN 1 END) AS c1,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS c2
        | FROM b GROUP BY 1),
        |c AS (SELECT v, CAST(sum(c1) OVER w AS BIGINT) AS f1,
        |  CAST(sum(c2) OVER w AS BIGINT) AS f2
        | FROM p WINDOW w AS (ORDER BY v
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |t AS (SELECT max(f1) AS n1, max(f2) AS n2 FROM c)
        |SELECT t.n1 AS n1, t.n2 AS n2,
        | round(max(CASE WHEN t.n1 > 0 AND t.n2 > 0
        |   THEN abs(CAST(f1 AS DOUBLE) / CAST(t.n1 AS DOUBLE)
        |     - CAST(f2 AS DOUBLE) / CAST(t.n2 AS DOUBLE)) END), 6) AS d_stat
        |FROM c CROSS JOIN t GROUP BY t.n1, t.n2""".stripMargin,
    "q187_benford" ->
      """WITH b AS (SELECT event_type,
        |   CAST(substr(CAST(CAST(floor(value * 100.0 + 0.5) AS BIGINT)
        |     AS VARCHAR), 1, 1) AS INT) AS digit
        | FROM events WHERE value IS NOT NULL AND value > 0
        |   AND CAST(floor(value * 100.0 + 0.5) AS BIGINT) > 0),
        |c AS (SELECT event_type, digit, count(*) AS n_digit FROM b GROUP BY 1, 2)
        |SELECT event_type, digit, n_digit,
        | CAST(sum(n_digit) OVER (PARTITION BY event_type) AS BIGINT) AS n_rows,
        | round(CAST(n_digit AS DOUBLE) /
        |   CAST(sum(n_digit) OVER (PARTITION BY event_type) AS BIGINT), 6)
        |   AS share,
        | round(ln(CAST(1 AS DOUBLE) + CAST(1 AS DOUBLE) / digit)
        |   / ln(CAST(10 AS DOUBLE)), 6) AS benford_p
        |FROM c""".stripMargin,
    "q188_mannwhitney" ->
      """WITH b AS (SELECT value, event_type FROM events
        |  WHERE value IS NOT NULL AND event_type IN ('view', 'purchase')),
        |r AS (SELECT value, event_type,
        |  rank() OVER (ORDER BY value) AS rmin,
        |  count(*) OVER (PARTITION BY value) AS t FROM b),
        |v AS (SELECT event_type,
        |  CAST(rmin AS DOUBLE) + CAST(t - 1 AS DOUBLE) / CAST(2 AS DOUBLE)
        |    AS avgr, t FROM r),
        |a AS (SELECT
        |  count(CASE WHEN event_type = 'view' THEN 1 END) AS n1,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n2,
        |  CAST(sum(CASE WHEN event_type = 'view'
        |    THEN CAST(avgr AS DECIMAL(28,10)) END) AS DOUBLE) AS r1,
        |  CAST(sum(CAST(t * t - 1 AS DECIMAL(28,10))) AS DOUBLE) AS tsum3
        | FROM v),
        |c AS (SELECT n1, n2, r1, tsum3, CAST(n1 AS DOUBLE) AS d1,
        |  CAST(n2 AS DOUBLE) AS d2,
        |  CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) AS dn FROM a),
        |u AS (SELECT *, r1 - d1 * (d1 + 1) / CAST(2 AS DOUBLE) AS u1 FROM c),
        |w AS (SELECT *, d1 * d2 / CAST(12 AS DOUBLE)
        |  * ((dn + 1) - tsum3 / (dn * (dn - 1))) AS vr FROM u)
        |SELECT n1, n2, round(u1, 6) AS u1,
        | CASE WHEN n1 > 0 AND n2 > 0 AND vr > 0
        |   THEN round((u1 - d1 * d2 / CAST(2 AS DOUBLE)) / sqrt(vr), 6)
        | END AS z
        |FROM w""".stripMargin,
    // Heikin-Ashi: hc per bar is closed-form, the ho recursion replays the
    // Spark fold per prefix (q157's oracle technique); ha_high/ha_low
    // re-derive the RAW ho inline so the greatest/least see unquantized
    // values exactly as the Spark side does
    "q189_heikin" ->
      """WITH bars AS (SELECT user_id, date_trunc('hour', ts) AS bar,
        |  arg_min(value, ts) AS open, max(value) AS high, min(value) AS low,
        |  arg_max(value, ts) AS close FROM events
        | WHERE value IS NOT NULL GROUP BY 1, 2),
        |p AS (SELECT user_id, list(bar ORDER BY bar) AS bs,
        |  list(open ORDER BY bar) AS os, list(high ORDER BY bar) AS hs,
        |  list(low ORDER BY bar) AS ls, list(close ORDER BY bar) AS cs
        | FROM bars GROUP BY 1),
        |q AS (SELECT user_id, bs, os, hs, ls, cs,
        |  list_transform(range(1, len(bs) + 1),
        |    j -> (((os[j] + hs[j]) + ls[j]) + cs[j]) / CAST(4 AS DOUBLE)) AS hc
        | FROM p),
        |i AS (SELECT user_id, unnest(range(1, len(bs) + 1)) AS rn,
        |  bs, os, hs, ls, cs, hc FROM q),
        |e AS (SELECT user_id, bs[rn] AS bar, os[rn] AS open, hs[rn] AS high,
        |  ls[rn] AS low, cs[rn] AS close, hc[rn] AS hcv,
        |  list_reduce(list_prepend((os[1] + cs[1]) / CAST(2 AS DOUBLE),
        |    hc[1:rn - 1]), (acc, x) -> (acc + x) / CAST(2 AS DOUBLE)) AS hov
        | FROM i)
        |SELECT user_id, bar, open, high, low, close,
        | floor(hov * 1000000.0 + 0.5) / 1000000.0 AS ha_open,
        | floor(hcv * 1000000.0 + 0.5) / 1000000.0 AS ha_close,
        | floor(greatest(high, hov, hcv) * 1000000.0 + 0.5) / 1000000.0
        |   AS ha_high,
        | floor(least(low, hov, hcv) * 1000000.0 + 0.5) / 1000000.0 AS ha_low
        |FROM e""".stripMargin,
    "q190_ichimoku" ->
      """WITH bars AS (SELECT user_id, date_trunc('hour', ts) AS bar,
        |  arg_max(value, ts) AS close FROM events
        | WHERE value IS NOT NULL GROUP BY 1, 2),
        |b AS (SELECT user_id, bar, close,
        |  CASE WHEN count(close) OVER w9 = 9 THEN
        |    (max(close) OVER w9 + min(close) OVER w9) / CAST(2 AS DOUBLE)
        |  END AS tenkan,
        |  CASE WHEN count(close) OVER w26 = 26 THEN
        |    (max(close) OVER w26 + min(close) OVER w26) / CAST(2 AS DOUBLE)
        |  END AS kijun,
        |  CASE WHEN count(close) OVER w52 = 52 THEN
        |    (max(close) OVER w52 + min(close) OVER w52) / CAST(2 AS DOUBLE)
        |  END AS senkou_b_raw
        | FROM bars WINDOW
        |  w9 AS (PARTITION BY user_id ORDER BY bar
        |    ROWS BETWEEN 8 PRECEDING AND CURRENT ROW),
        |  w26 AS (PARTITION BY user_id ORDER BY bar
        |    ROWS BETWEEN 25 PRECEDING AND CURRENT ROW),
        |  w52 AS (PARTITION BY user_id ORDER BY bar
        |    ROWS BETWEEN 51 PRECEDING AND CURRENT ROW))
        |SELECT user_id, bar, close, tenkan, kijun,
        | lag((tenkan + kijun) / CAST(2 AS DOUBLE), 26) OVER wb AS senkou_a,
        | lag(senkou_b_raw, 26) OVER wb AS senkou_b,
        | lead(close, 26) OVER wb AS chikou
        |FROM b WINDOW wb AS (PARTITION BY user_id ORDER BY bar)""".stripMargin,
    "q194_atr" -> {
      val a = 1.0 / 14; val b = 1.0 - a
      s"""WITH bars AS (SELECT user_id, date_trunc('hour', ts) AS bar,
         |  arg_min(value, ts) AS open, max(value) AS high, min(value) AS low,
         |  arg_max(value, ts) AS close FROM events
         | WHERE value IS NOT NULL GROUP BY 1, 2),
         |t AS (SELECT user_id, bar, open, high, low, close,
         |  CASE WHEN lag(close) OVER w IS NULL THEN high - low
         |    ELSE greatest(high - low, abs(high - lag(close) OVER w),
         |      abs(low - lag(close) OVER w)) END AS tr
         | FROM bars WINDOW w AS (PARTITION BY user_id ORDER BY bar)),
         |p AS (SELECT user_id, list(bar ORDER BY bar) AS bs,
         |  list(open ORDER BY bar) AS os, list(high ORDER BY bar) AS hs,
         |  list(low ORDER BY bar) AS ls, list(close ORDER BY bar) AS cs,
         |  list(tr ORDER BY bar) AS trs
         | FROM t GROUP BY 1),
         |i AS (SELECT user_id, unnest(range(1, len(bs) + 1)) AS rn,
         |  bs, os, hs, ls, cs, trs FROM p)
         |SELECT user_id, bs[rn] AS bar, os[rn] AS open, hs[rn] AS high,
         |  ls[rn] AS low, cs[rn] AS close, trs[rn] AS tr,
         |  floor(list_reduce(trs[1:rn], (acc, x) ->
         |    CAST($b AS DOUBLE) * acc + CAST($a AS DOUBLE) * x)
         |    * 1000000.0 + 0.5) / 1000000.0 AS atr
         |FROM i""".stripMargin
    },
    "q195_adx" -> {
      val a = 1.0 / 14; val b = 1.0 - a
      def q6(e: String) = s"floor(($e) * 1000000.0 + 0.5) / 1000000.0"
      def fold(src: String) =
        s"list_reduce($src, (acc, x) -> CAST($b AS DOUBLE) * acc + CAST($a AS DOUBLE) * x)"
      s"""WITH bars AS (SELECT user_id, date_trunc('hour', ts) AS bar,
         |  arg_min(value, ts) AS open, max(value) AS high, min(value) AS low,
         |  arg_max(value, ts) AS close FROM events
         | WHERE value IS NOT NULL GROUP BY 1, 2),
         |t AS (SELECT user_id, bar,
         |  CASE WHEN lag(close) OVER w IS NULL THEN high - low
         |    ELSE greatest(high - low, abs(high - lag(close) OVER w),
         |      abs(low - lag(close) OVER w)) END AS tr,
         |  CASE WHEN lag(high) OVER w IS NULL THEN CAST(0 AS DOUBLE)
         |    ELSE CASE WHEN (high - lag(high) OVER w) > (lag(low) OVER w - low)
         |              AND (high - lag(high) OVER w) > 0
         |      THEN high - lag(high) OVER w ELSE CAST(0 AS DOUBLE) END
         |  END AS pdm,
         |  CASE WHEN lag(high) OVER w IS NULL THEN CAST(0 AS DOUBLE)
         |    ELSE CASE WHEN (lag(low) OVER w - low) > (high - lag(high) OVER w)
         |              AND (lag(low) OVER w - low) > 0
         |      THEN lag(low) OVER w - low ELSE CAST(0 AS DOUBLE) END
         |  END AS mdm
         | FROM bars WINDOW w AS (PARTITION BY user_id ORDER BY bar)),
         |p AS (SELECT user_id, list(bar ORDER BY bar) AS bs,
         |  list(tr ORDER BY bar) AS trs, list(pdm ORDER BY bar) AS ps,
         |  list(mdm ORDER BY bar) AS ms FROM t GROUP BY 1),
         |i AS (SELECT user_id, unnest(range(1, len(bs) + 1)) AS rn,
         |  bs, trs, ps, ms FROM p),
         |e AS (SELECT user_id, rn, bs[rn] AS bar,
         |  ${q6(fold("trs[1:rn]"))} AS str,
         |  ${q6(fold("ps[1:rn]"))} AS spdm,
         |  ${q6(fold("ms[1:rn]"))} AS smdm FROM i),
         |d AS (SELECT user_id, rn, bar, str,
         |  CASE WHEN str > 0
         |    THEN ${q6("CAST(100 AS DOUBLE) * spdm / str")} END AS di_plus,
         |  CASE WHEN str > 0
         |    THEN ${q6("CAST(100 AS DOUBLE) * smdm / str")} END AS di_minus
         | FROM e),
         |x AS (SELECT *, CASE WHEN di_plus IS NOT NULL
         |      AND di_minus IS NOT NULL AND di_plus + di_minus > 0
         |    THEN ${q6("CAST(100 AS DOUBLE) * abs(di_plus - di_minus) / (di_plus + di_minus)")}
         |  END AS dx FROM d),
         |g AS (SELECT user_id, list(dx ORDER BY rn) AS dxs FROM x GROUP BY 1),
         |j AS (SELECT x.user_id, x.bar, x.str, x.di_plus, x.di_minus, x.dx,
         |  CASE WHEN x.rn = 1 THEN dxs[1]
         |    ELSE list_reduce(
         |      list_prepend(coalesce(dxs[1], CAST(0 AS DOUBLE)), dxs[2:x.rn]),
         |      (acc, v) -> CAST($b AS DOUBLE) * acc
         |        + CAST($a AS DOUBLE) * coalesce(v, acc))
         |  END AS adx_raw
         | FROM x JOIN g USING (user_id))
         |SELECT user_id, bar, str, di_plus, di_minus, dx,
         |  ${q6("adx_raw")} AS adx
         |FROM j""".stripMargin
    },
    "q196_ccf" ->
      """WITH e AS (SELECT user_id, ts, event_id, value AS yv,
        |  CAST(json_extract(props, '$.k') AS DOUBLE) AS k FROM events),
        |b AS (SELECT user_id, yv,
        |  lead(k, 3) OVER w AS sm3, lead(k, 2) OVER w AS sm2,
        |  lead(k, 1) OVER w AS sm1, k AS s0,
        |  lag(k, 1) OVER w AS sp1, lag(k, 2) OVER w AS sp2,
        |  lag(k, 3) OVER w AS sp3
        | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |u AS (
        | SELECT user_id, -3 AS lag_k, yv, sm3 AS xl FROM b
        | UNION ALL SELECT user_id, -2, yv, sm2 FROM b
        | UNION ALL SELECT user_id, -1, yv, sm1 FROM b
        | UNION ALL SELECT user_id, 0, yv, s0 FROM b
        | UNION ALL SELECT user_id, 1, yv, sp1 FROM b
        | UNION ALL SELECT user_id, 2, yv, sp2 FROM b
        | UNION ALL SELECT user_id, 3, yv, sp3 FROM b),
        |a AS (SELECT user_id, lag_k,
        |  count(CASE WHEN yv IS NOT NULL AND xl IS NOT NULL THEN 1 END)
        |    AS n_pairs,
        |  CAST(sum(CASE WHEN yv IS NOT NULL AND xl IS NOT NULL
        |    THEN CAST(yv AS DECIMAL(28,10)) END) AS DOUBLE) AS sy,
        |  CAST(sum(CASE WHEN yv IS NOT NULL AND xl IS NOT NULL
        |    THEN CAST(xl AS DECIMAL(28,10)) END) AS DOUBLE) AS sx,
        |  CAST(sum(CASE WHEN yv IS NOT NULL AND xl IS NOT NULL
        |    THEN CAST(yv * yv AS DECIMAL(28,10)) END) AS DOUBLE) AS syy,
        |  CAST(sum(CASE WHEN yv IS NOT NULL AND xl IS NOT NULL
        |    THEN CAST(xl * xl AS DECIMAL(28,10)) END) AS DOUBLE) AS sxx,
        |  CAST(sum(CASE WHEN yv IS NOT NULL AND xl IS NOT NULL
        |    THEN CAST(yv * xl AS DECIMAL(28,10)) END) AS DOUBLE) AS sxy
        | FROM u GROUP BY 1, 2)
        |SELECT user_id, lag_k, n_pairs,
        | CASE WHEN n_pairs >= 10 AND n_pairs * sxx - sx * sx > 0
        |       AND n_pairs * syy - sy * sy > 0
        |   THEN round((n_pairs * sxy - sx * sy) /
        |     sqrt((n_pairs * sxx - sx * sx) * (n_pairs * syy - sy * sy)), 6)
        | END AS ccf
        |FROM a""".stripMargin,
    "q197_variance_ratio" ->
      """WITH b AS (SELECT user_id,
        |  value - lag(value, 1) OVER w AS d1,
        |  value - lag(value, 2) OVER w AS d2,
        |  value - lag(value, 3) OVER w AS d3,
        |  value - lag(value, 4) OVER w AS d4,
        |  value - lag(value, 5) OVER w AS d5
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |u AS (
        | SELECT user_id, 1 AS q, d1 AS d FROM b
        | UNION ALL SELECT user_id, 2, d2 FROM b
        | UNION ALL SELECT user_id, 3, d3 FROM b
        | UNION ALL SELECT user_id, 4, d4 FROM b
        | UNION ALL SELECT user_id, 5, d5 FROM b),
        |s AS (SELECT user_id, q, count(*) AS n_d,
        |  CAST(sum(CAST(d AS DECIMAL(28,10))) AS DOUBLE) AS sd,
        |  CAST(sum(CAST(d * d AS DECIMAL(28,10))) AS DOUBLE) AS sdd
        | FROM u WHERE d IS NOT NULL GROUP BY 1, 2),
        |v AS (SELECT user_id, q, n_d,
        |  (sdd - sd * sd / n_d) / n_d AS var FROM s),
        |base AS (SELECT user_id, var AS var1, n_d AS n_base FROM v WHERE q = 1)
        |SELECT v.user_id, v.q, v.n_d, base.n_base,
        | CASE WHEN base.var1 > 0 AND v.var >= 0
        |   THEN round(v.var / (v.q * base.var1), 6) END AS vr
        |FROM v JOIN base USING (user_id) WHERE v.q != 1""".stripMargin,
    "q198_underwater" ->
      """WITH b AS (SELECT user_id, event_id, ts, value,
        |  max(value) OVER wc AS peak FROM events WHERE value IS NOT NULL
        | WINDOW wc AS (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |m AS (SELECT user_id, event_id, ts, value, peak,
        |  CASE WHEN value < peak THEN 1 ELSE 0 END AS under,
        |  CASE WHEN peak > 0 THEN round(value / peak - 1.0, 6) END AS dd
        | FROM b),
        |e AS (SELECT *, CAST(sum(1 - under) OVER wc AS BIGINT) AS ep FROM m
        | WINDOW wc AS (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |epi AS (SELECT user_id, ep, count(*) AS len, min(dd) AS depth
        | FROM e WHERE under = 1 GROUP BY 1, 2),
        |pk AS (SELECT user_id, count(*) AS n_episodes,
        |  max(len) AS max_underwater_len, min(depth) AS max_drawdown
        | FROM epi GROUP BY 1),
        |nn AS (SELECT user_id, count(*) AS n_obs FROM events
        | WHERE value IS NOT NULL GROUP BY 1)
        |SELECT nn.user_id, nn.n_obs, coalesce(pk.n_episodes, 0) AS n_episodes,
        | coalesce(pk.max_underwater_len, 0) AS max_underwater_len,
        | pk.max_drawdown
        |FROM nn LEFT JOIN pk USING (user_id)""".stripMargin,
    // day-of-week: Spark is Sunday=1..7, DuckDB Sunday=0..6 — shift +1
    "q199_dow_anova" ->
      """WITH r AS (SELECT user_id, ts, value,
        |  value - lag(value, 1) OVER w AS ret FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |g AS (SELECT CAST(dayofweek(ts) + 1 AS INT) AS dow, count(*) AS n,
        |  CAST(sum(CAST(ret AS DECIMAL(28,10))) AS DOUBLE) AS s,
        |  CAST(sum(CAST(ret * ret AS DECIMAL(28,10))) AS DOUBLE) AS ss
        | FROM r WHERE ret IS NOT NULL GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS nt,
        |  CAST(sum(CAST(s AS DECIMAL(28,10))) AS DOUBLE) AS st,
        |  count(*) AS k FROM g),
        |w2 AS (SELECT g.dow, g.n, g.s, g.ss, t.nt, t.st, t.k,
        |  g.s / g.n AS mg, t.st / t.nt AS m FROM g CROSS JOIN t),
        |f AS (SELECT max(nt) AS nt, max(k) AS k,
        |  CAST(sum(CAST(n * (mg - m) * (mg - m) AS DECIMAL(28,10)))
        |    AS DOUBLE) AS ssb,
        |  CAST(sum(CAST(ss - s * s / n AS DECIMAL(28,10))) AS DOUBLE) AS ssw
        | FROM w2),
        |ff AS (SELECT CASE WHEN k > 1 AND nt > k AND ssw > 0
        |    THEN round((ssb / (k - 1)) / (ssw / (nt - k)), 6) END AS f_stat,
        |  k AS k_groups, nt AS n_total FROM f)
        |SELECT w2.dow, w2.n, round(w2.mg, 6) AS mean_ret,
        | ff.f_stat, ff.k_groups, ff.n_total
        |FROM w2 CROSS JOIN ff""".stripMargin,
    "q200_spearman" ->
      """WITH base AS (SELECT event_type, value AS x,
        |  CAST(json_extract(props, '$.k') AS DOUBLE) AS y FROM events
        | WHERE value IS NOT NULL
        |   AND CAST(json_extract(props, '$.k') AS DOUBLE) IS NOT NULL),
        |r AS (SELECT event_type,
        |  CAST(rank() OVER (PARTITION BY event_type ORDER BY x) AS DOUBLE)
        |   + (CAST(count(*) OVER (PARTITION BY event_type, x) AS DOUBLE)
        |      - 1.0) / 2.0 AS rx,
        |  CAST(rank() OVER (PARTITION BY event_type ORDER BY y) AS DOUBLE)
        |   + (CAST(count(*) OVER (PARTITION BY event_type, y) AS DOUBLE)
        |      - 1.0) / 2.0 AS ry
        | FROM base),
        |a AS (SELECT event_type, count(*) AS n_obs,
        |  CAST(sum(CAST(rx AS DECIMAL(28,10))) AS DOUBLE) AS sx,
        |  CAST(sum(CAST(ry AS DECIMAL(28,10))) AS DOUBLE) AS sy,
        |  CAST(sum(CAST(rx * rx AS DECIMAL(28,10))) AS DOUBLE) AS sxx,
        |  CAST(sum(CAST(ry * ry AS DECIMAL(28,10))) AS DOUBLE) AS syy,
        |  CAST(sum(CAST(rx * ry AS DECIMAL(28,10))) AS DOUBLE) AS sxy
        | FROM r GROUP BY 1),
        |v AS (SELECT event_type, n_obs, CAST(n_obs AS DOUBLE) AS n,
        |  sx, sy, sxx, syy, sxy FROM a)
        |SELECT event_type, n_obs,
        | CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
        |  THEN round((n * sxy - sx * sy) /
        |    sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) END AS rho
        |FROM v""".stripMargin,
    "q201_runs_test" ->
      """WITH r AS (SELECT user_id, ts, event_id,
        |  value - lag(value, 1) OVER w AS ret FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |f AS (SELECT user_id, ts, event_id,
        |  CASE WHEN ret > 0 THEN 1 ELSE 0 END AS sgn
        | FROM r WHERE ret IS NOT NULL AND ret != 0.0),
        |c AS (SELECT user_id, sgn,
        |  lag(sgn, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    AS prev FROM f),
        |a AS (SELECT user_id, count(*) AS n_moves,
        |  CAST(sum(sgn) AS BIGINT) AS n_up,
        |  CAST(sum(CASE WHEN prev IS NULL OR prev != sgn THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_runs
        | FROM c GROUP BY 1),
        |b AS (SELECT user_id, n_moves, n_up, n_moves - n_up AS n_down,
        |  n_runs, CAST(n_up AS DOUBLE) AS n1,
        |  CAST(n_moves - n_up AS DOUBLE) AS n2,
        |  CAST(n_up AS DOUBLE) + CAST(n_moves - n_up AS DOUBLE) AS n FROM a),
        |z AS (SELECT user_id, n_moves, n_up, n_down, n_runs,
        |  2.0 * n1 * n2 / n + 1.0 AS mu,
        |  2.0 * n1 * n2 * (2.0 * n1 * n2 - n) / (n * n * (n - 1.0)) AS var
        | FROM b)
        |SELECT user_id, n_moves, n_up, n_down, n_runs,
        | CASE WHEN n_up > 0 AND n_down > 0 AND var > 0
        |  THEN round((CAST(n_runs AS DOUBLE) - mu) / sqrt(var), 6) END AS z
        |FROM z""".stripMargin,
    "q202_pettitt" ->
      """WITH base AS (SELECT user_id, ts, event_id, value FROM events
        | WHERE value IS NOT NULL),
        |r AS (SELECT user_id,
        |  2 * rank() OVER (PARTITION BY user_id ORDER BY value)
        |   + count(*) OVER (PARTITION BY user_id, value) - 1 AS r2,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    AS t,
        |  count(*) OVER (PARTITION BY user_id) AS n
        | FROM base),
        |u AS (SELECT user_id, t, n,
        |  CAST(sum(r2) OVER (PARTITION BY user_id ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |   - t * (n + 1) AS uu
        | FROM r),
        |w2 AS (SELECT user_id, t, n, abs(uu) AS absu FROM u WHERE t < n),
        |k AS (SELECT user_id, max(n) AS n_obs, max(absu) AS k_stat
        | FROM w2 GROUP BY 1),
        |tt AS (SELECT w2.user_id, min(w2.t) AS t_change FROM w2
        | JOIN k ON w2.user_id = k.user_id AND w2.absu = k.k_stat GROUP BY 1),
        |d AS (SELECT user_id, n_obs, k_stat, t_change,
        |  CAST(k_stat AS DOUBLE) AS kd, CAST(n_obs AS DOUBLE) AS nd
        | FROM k JOIN tt USING (user_id))
        |SELECT user_id, n_obs, k_stat, t_change,
        | round(2.0 * exp(-6.0 * kd * kd / (nd * nd * nd + nd * nd)), 6)
        |   AS p_approx
        |FROM d""".stripMargin,
    "q203_hurst" ->
      """WITH r AS (SELECT user_id, ts, event_id,
        |  value - lag(value, 1) OVER w AS ret FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |p AS (SELECT user_id, ret,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
        |    AS pos
        | FROM r WHERE ret IS NOT NULL),
        |g AS (SELECT user_id, ret, pos, m FROM p
        | CROSS JOIN (SELECT unnest([1, 2, 4, 8]) AS m) ms),
        |b AS (SELECT user_id, m,
        |  CAST(floor(CAST(pos AS DOUBLE) / m) AS BIGINT) AS blk,
        |  count(*) AS bn, sum(CAST(ret AS DECIMAL(28,10))) AS bs
        | FROM g GROUP BY 1, 2, 3),
        |bm AS (SELECT user_id, m, CAST(bs AS DOUBLE) / m AS bmv
        | FROM b WHERE bn = m),
        |s AS (SELECT user_id, m, count(*) AS k,
        |  CAST(sum(CAST(bmv AS DECIMAL(28,10))) AS DOUBLE) AS sb,
        |  CAST(sum(CAST(bmv * bmv AS DECIMAL(28,10))) AS DOUBLE) AS sbb
        | FROM bm GROUP BY 1, 2),
        |v AS (SELECT user_id, m, k,
        |  (sbb - sb * sb / CAST(k AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0)
        |    AS var
        | FROM s WHERE k >= 2),
        |l AS (SELECT user_id, ln(CAST(m AS DOUBLE)) AS lx, ln(var) AS ly
        | FROM v WHERE var > 0),
        |o AS (SELECT user_id, count(*) AS n_scales,
        |  CAST(sum(CAST(lx AS DECIMAL(28,10))) AS DOUBLE) AS sx,
        |  CAST(sum(CAST(ly AS DECIMAL(28,10))) AS DOUBLE) AS sy,
        |  CAST(sum(CAST(lx * lx AS DECIMAL(28,10))) AS DOUBLE) AS sxx,
        |  CAST(sum(CAST(lx * ly AS DECIMAL(28,10))) AS DOUBLE) AS sxy
        | FROM l GROUP BY 1)
        |SELECT user_id, n_scales,
        | CASE WHEN n_scales >= 2
        |   AND CAST(n_scales AS DOUBLE) * sxx - sx * sx != 0.0
        |  THEN round(1.0 + (CAST(n_scales AS DOUBLE) * sxy - sx * sy) /
        |    (CAST(n_scales AS DOUBLE) * sxx - sx * sx) / 2.0, 6) END AS hurst
        |FROM o""".stripMargin,
    // Holt recursion replayed by a RECURSIVE CTE — one row of scalar
    // double arithmetic per (key, step), the identical operand order as
    // the Spark fold (a list_reduce struct-lambda would be the natural
    // form, but DuckDB 1.0 evaluates interdependent struct fields with
    // in-place accumulator updates in an engine-defined order — the
    // recursive CTE sidesteps that entirely); dyadic 0.5/0.25/0.75
    // constants are exact in any engine
    "q253_holt" ->
      s"""WITH RECURSIVE $HoltCtes
         |SELECT user_id, bar, close,
         | floor(l * 1000000.0 + 0.5) / 1000000.0 AS level,
         | floor(b * 1000000.0 + 0.5) / 1000000.0 AS trend,
         | floor(f * 1000000.0 + 0.5) / 1000000.0 AS fitted
         |FROM st""".stripMargin,
    // accuracy of the Holt one-step forecasts: errors against the SAME
    // quantized fitted values the operator emits; per-row error terms
    // quantize to exact decimals pre-sum, MASE scales by the naive MAE
    "q257_forecast_accuracy" ->
      s"""WITH RECURSIVE $HoltCtes,
         |h AS (SELECT user_id, bar, close,
         |  floor(f * 1000000.0 + 0.5) / 1000000.0 AS fitted FROM st),
         |d AS (SELECT user_id, close - fitted AS e,
         |  close - lag(close) OVER (PARTITION BY user_id ORDER BY bar)
         |    AS nv,
         |  abs(close) + abs(fitted) AS sden FROM h),
         |t AS (SELECT user_id, e, nv, CASE WHEN sden > 0
         |  THEN CAST(2.0 * abs(e) / sden AS DECIMAL(28,12)) END AS st2
         | FROM d),
         |a AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_obs,
         |  CAST(sum(CAST(abs(e) AS DECIMAL(28,10))) AS DOUBLE) / count(*)
         |    AS mae_d,
         |  sqrt(CAST(sum(CAST(e * e AS DECIMAL(28,10))) AS DOUBLE)
         |    / count(*)) AS rmse_d,
         |  CAST(sum(st2) AS DOUBLE) / count(st2) AS smape_d,
         |  CAST(sum(CAST(abs(nv) AS DECIMAL(28,10))) AS DOUBLE) / count(nv)
         |    AS nmae_d
         | FROM t GROUP BY 1)
         |SELECT user_id, n_obs, round(mae_d, 6) AS mae,
         | round(rmse_d, 6) AS rmse, round(smape_d, 6) AS smape,
         | CASE WHEN nmae_d > 0 THEN round(mae_d / nmae_d, 6) END AS mase
         |FROM a""".stripMargin,
    // LTV: per-row values quantized to DECIMAL pre-sum; the cumulative
    // window rides the calendar-bounded (cohort, week-of-life) axis
    "q280_ltv" ->
      """WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort
        |  FROM events GROUP BY 1),
        |sz AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n_users
        |  FROM f GROUP BY 1),
        |r AS (SELECT f.cohort,
        |  CAST(floor(date_diff('day', f.cohort, CAST(ts AS DATE)) / 7.0) AS BIGINT) AS age_week,
        |  sum(CAST(value AS DECIMAL(28,10))) AS wk
        | FROM events e JOIN f ON e.user_id = f.user_id
        | WHERE value IS NOT NULL GROUP BY 1, 2),
        |c AS (SELECT *, sum(wk) OVER (PARTITION BY cohort ORDER BY age_week
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM r)
        |SELECT c.cohort, age_week, n_users,
        | round(CAST(wk AS DOUBLE), 6) AS wk_value,
        | round(CAST(cum AS DOUBLE) / n_users, 6) AS ltv
        |FROM c JOIN sz ON c.cohort = sz.cohort""".stripMargin,
    // attribution: IGNORE NULLS running first/last over the same
    // preceding-rows frame; ts is globally unique so the order is total
    "q278_attribution" ->
      """WITH t AS (SELECT user_id, ts, event_type,
        |  CASE WHEN event_type IN ('view','click','signup')
        |    THEN event_type END AS touch
        | FROM events),
        |c AS (SELECT event_type,
        |  coalesce(last_value(touch IGNORE NULLS) OVER w, '(none)') AS lt,
        |  coalesce(first_value(touch IGNORE NULLS) OVER w, '(none)') AS ft
        | FROM t
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |cv AS (SELECT lt, ft FROM c WHERE event_type = 'purchase'),
        |f AS (SELECT ft AS channel, CAST(count(*) AS BIGINT) AS first_touch
        |  FROM cv GROUP BY 1),
        |l AS (SELECT lt AS channel, CAST(count(*) AS BIGINT) AS last_touch
        |  FROM cv GROUP BY 1),
        |b AS (SELECT coalesce(f.channel, l.channel) AS channel,
        |  coalesce(first_touch, 0) AS first_touch,
        |  coalesce(last_touch, 0) AS last_touch
        | FROM f FULL OUTER JOIN l ON f.channel = l.channel)
        |SELECT channel, first_touch, last_touch,
        | round(CAST(first_touch AS DOUBLE)
        |   / CAST(sum(first_touch) OVER () AS DOUBLE), 6) AS first_share,
        | round(CAST(last_touch AS DOUBLE)
        |   / CAST(sum(last_touch) OVER () AS DOUBLE), 6) AS last_share
        |FROM b""".stripMargin,
    // Kaplan–Meier: epoch seconds via the boundary-crossing mirror of
    // Spark's cast(ts AS long); ln(1−d/n) terms quantized to DECIMAL
    // before the cumulative sum; factor-0 durations pin survival to 0
    "q273_kaplan_meier" ->
      """WITH s AS (SELECT user_id, event_type,
        |  date_diff('second', TIMESTAMP '1970-01-01', min(ts)) AS a,
        |  date_diff('second', TIMESTAMP '1970-01-01', max(ts)) AS b
        | FROM events GROUP BY 1, 2),
        |m AS (SELECT max(b) AS mx FROM s),
        |bd AS (SELECT CAST(floor((b - a) / 3600.0) AS BIGINT) AS duration_hr,
        |  CAST(sum(CASE WHEN b < mx - 259200 THEN 1 ELSE 0 END) AS BIGINT) AS n_events,
        |  CAST(sum(CASE WHEN b < mx - 259200 THEN 0 ELSE 1 END) AS BIGINT) AS n_censored,
        |  CAST(count(*) AS BIGINT) AS tot
        | FROM s, m GROUP BY 1),
        |r AS (SELECT *, CAST(sum(tot) OVER (ORDER BY duration_hr
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
        | FROM bd),
        |f AS (SELECT *, 1.0 - CAST(n_events AS DOUBLE) / CAST(n_risk AS DOUBLE) AS fct
        | FROM r),
        |g AS (SELECT *,
        |  CAST(CASE WHEN fct > 0 THEN ln(fct) ELSE 0 END AS DECIMAL(28,12)) AS lnf,
        |  max(CASE WHEN fct = 0 THEN 1 ELSE 0 END) OVER wc AS hit0,
        |  sum(CAST(CASE WHEN fct > 0 THEN ln(fct) ELSE 0 END AS DECIMAL(28,12)))
        |    OVER wc AS slnf
        | FROM f
        | WINDOW wc AS (ORDER BY duration_hr
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT duration_hr, n_risk, n_events, n_censored,
        |  CASE WHEN hit0 = 1 THEN 0.0
        |    ELSE round(exp(CAST(slnf AS DOUBLE)), 6) END AS survival
        |FROM g""".stripMargin,
    // log-rank: the KM subject/duration chain split by parity, O−E and
    // hypergeometric-variance terms DECIMAL-quantized per duration
    "q283_logrank" ->
      """WITH s AS (SELECT user_id, event_type,
        |  date_diff('second', TIMESTAMP '1970-01-01', min(ts)) AS a,
        |  date_diff('second', TIMESTAMP '1970-01-01', max(ts)) AS b,
        |  max(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS t
        | FROM events GROUP BY 1, 2),
        |m AS (SELECT max(b) AS mx FROM s),
        |bd AS (SELECT CAST(floor((b - a) / 3600.0) AS BIGINT) AS dur,
        |  CAST(sum(t) AS BIGINT) AS tot1, CAST(sum(1 - t) AS BIGINT) AS tot0,
        |  CAST(sum(t * CASE WHEN b < mx - 259200 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
        |  CAST(sum((1 - t) * CASE WHEN b < mx - 259200 THEN 1 ELSE 0 END) AS BIGINT) AS d0
        | FROM s, m GROUP BY 1),
        |r AS (SELECT *, CAST(sum(tot1) OVER wr AS BIGINT) AS n1,
        |  CAST(sum(tot0) OVER wr AS BIGINT) AS n0
        | FROM bd WINDOW wr AS (ORDER BY dur
        |   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
        |tm AS (SELECT *, n1 + n0 AS n, d1 + d0 AS d,
        |  CAST(n1 AS DOUBLE) / CAST(n1 + n0 AS DOUBLE) AS p1
        | FROM r WHERE d1 + d0 > 0),
        |tt AS (SELECT
        |  CAST(sum(CAST(CAST(d1 AS DOUBLE) - CAST(d AS DOUBLE) * p1
        |    AS DECIMAL(28,12))) AS DOUBLE) AS soe,
        |  CAST(sum(CASE WHEN n > 1 THEN CAST(CAST(d AS DOUBLE) * p1 * (1.0 - p1)
        |      * CAST(n - d AS DOUBLE) / CAST(n - 1 AS DOUBLE) AS DECIMAL(28,12))
        |    ELSE CAST(0.0 AS DECIMAL(28,12)) END) AS DOUBLE) AS sv,
        |  CAST(sum(d1) AS BIGINT) AS events_treat,
        |  CAST(sum(d0) AS BIGINT) AS events_ctrl
        | FROM tm),
        |g AS (SELECT CAST(sum(t) AS BIGINT) AS n_treat,
        |  CAST(sum(1 - t) AS BIGINT) AS n_ctrl FROM s)
        |SELECT n_treat, n_ctrl, events_treat, events_ctrl,
        | CASE WHEN sv > 0 THEN round(soe * soe / sv, 6) END AS chi2
        |FROM tt CROSS JOIN g""".stripMargin,
    // ROC/PR: per-distinct-value class counts, descending cumulatives;
    // 2U is an exact integer identity (HUGEINT here, DECIMAL in Spark),
    // the AP precision term one pinned division quantized pre-sum
    "q284_roc_pr" ->
      """WITH b AS (SELECT date_part('dow', ts) AS dow, value AS v,
        |  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS lbl
        | FROM events WHERE event_type IN ('view', 'purchase')
        |   AND value IS NOT NULL),
        |pv AS (SELECT dow, v,
        |  CAST(count(CASE WHEN lbl = 1 THEN 1 END) AS BIGINT) AS p,
        |  CAST(count(CASE WHEN lbl = 0 THEN 1 END) AS BIGINT) AS n
        | FROM b GROUP BY 1, 2),
        |c AS (SELECT *, CAST(sum(p) OVER w AS BIGINT) AS p_cum,
        |  CAST(sum(n) OVER w AS BIGINT) AS n_cum,
        |  CAST(sum(p) OVER (PARTITION BY dow) AS BIGINT) AS pt,
        |  CAST(sum(n) OVER (PARTITION BY dow) AS BIGINT) AS nt
        | FROM pv WINDOW w AS (PARTITION BY dow ORDER BY v DESC
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |a AS (SELECT dow, max(pt) AS n_pos, max(nt) AS n_neg,
        |  sum(n * (2 * (p_cum - p) + p)) AS u2,
        |  sum(CASE WHEN p > 0 THEN
        |    CAST(CAST(p AS DOUBLE) * CAST(p_cum AS DOUBLE)
        |      / CAST(p_cum + n_cum AS DOUBLE) AS DECIMAL(28,12)) END) AS ap
        | FROM c GROUP BY 1)
        |SELECT dow, n_pos, n_neg,
        | CASE WHEN n_pos > 0 AND n_neg > 0
        |   THEN round(CAST(u2 AS DOUBLE) / (2.0 * n_pos * n_neg), 6)
        |   END AS auc,
        | CASE WHEN n_pos > 0
        |   THEN round(CAST(ap AS DOUBLE) / n_pos, 6) END AS avg_prec
        |FROM a""".stripMargin,
    // CUPED: per-unit pre/post from exact DECIMAL sums, per-arm power
    // sums with per-unit cross terms quantized pre-sum, θ on the pooled
    // frame, every closed form spelled in the Spark side's op order
    "q285_cuped" ->
      """WITH u AS (SELECT user_id,
        |  CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS grp,
        |  coalesce(CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
        |    THEN CAST(value AS DECIMAL(28,10)) END) AS DOUBLE), 0.0) AS x,
        |  coalesce(CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
        |    THEN CAST(value AS DECIMAL(28,10)) END) AS DOUBLE), 0.0) AS y
        | FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |pa AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
        |  sum(CAST(x AS DECIMAL(28,10))) AS sx,
        |  sum(CAST(y AS DECIMAL(28,10))) AS sy,
        |  sum(CAST(x * x AS DECIMAL(28,10))) AS sxx,
        |  sum(CAST(y * y AS DECIMAL(28,10))) AS syy,
        |  sum(CAST(x * y AS DECIMAL(28,10))) AS sxy
        | FROM u GROUP BY 1),
        |al AS (SELECT CAST(sum(n) AS BIGINT) AS na, sum(sx) AS sxa,
        |  sum(sy) AS sya, sum(sxx) AS sxxa, sum(sxy) AS sxya FROM pa),
        |th AS (SELECT
        |  CASE WHEN CAST(sxxa AS DOUBLE) / na
        |      - CAST(sxa AS DOUBLE) / na * (CAST(sxa AS DOUBLE) / na) > 0
        |    THEN (CAST(sxya AS DOUBLE) / na
        |        - CAST(sxa AS DOUBLE) / na * (CAST(sya AS DOUBLE) / na))
        |      / (CAST(sxxa AS DOUBLE) / na
        |        - CAST(sxa AS DOUBLE) / na * (CAST(sxa AS DOUBLE) / na))
        |    END AS theta,
        |  CAST(sxa AS DOUBLE) / na AS mxa FROM al)
        |SELECT grp, n,
        | round(CAST(sx AS DOUBLE) / n, 6) AS mean_pre,
        | round(CAST(sy AS DOUBLE) / n, 6) AS mean_post,
        | round(CAST(sy AS DOUBLE) / n
        |   - theta * (CAST(sx AS DOUBLE) / n - mxa), 6) AS mean_adj,
        | round(CAST(syy AS DOUBLE) / n
        |   - CAST(sy AS DOUBLE) / n * (CAST(sy AS DOUBLE) / n), 6)
        |   AS var_post,
        | round((CAST(syy AS DOUBLE) - 2.0 * theta * CAST(sxy AS DOUBLE)
        |     + theta * theta * CAST(sxx AS DOUBLE)) / n
        |   - (CAST(sy AS DOUBLE) / n - theta * (CAST(sx AS DOUBLE) / n))
        |     * (CAST(sy AS DOUBLE) / n - theta * (CAST(sx AS DOUBLE) / n)),
        |   6) AS var_adj,
        | round(theta, 6) AS theta,
        | CASE WHEN CAST(syy AS DOUBLE) / n
        |     - CAST(sy AS DOUBLE) / n * (CAST(sy AS DOUBLE) / n) > 0
        |   THEN round(1.0 - ((CAST(syy AS DOUBLE)
        |       - 2.0 * theta * CAST(sxy AS DOUBLE)
        |       + theta * theta * CAST(sxx AS DOUBLE)) / n
        |     - (CAST(sy AS DOUBLE) / n - theta * (CAST(sx AS DOUBLE) / n))
        |       * (CAST(sy AS DOUBLE) / n - theta * (CAST(sx AS DOUBLE) / n)))
        |     / (CAST(syy AS DOUBLE) / n
        |       - CAST(sy AS DOUBLE) / n * (CAST(sy AS DOUBLE) / n)), 6)
        |   END AS var_reduction
        |FROM pa CROSS JOIN th ORDER BY grp""".stripMargin,
    // isotonic: equal-width bins from broadcast min/max, then the PAV
    // minimax on pooled integer counts — every rate one exact division
    "q287_isotonic" ->
      """WITH b AS (SELECT CAST(value AS DOUBLE) AS s,
        |  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS lbl
        | FROM events WHERE event_type IN ('view', 'purchase')
        |   AND value IS NOT NULL),
        |ex AS (SELECT min(s) AS lo, (max(s) - min(s)) / 16 AS w FROM b),
        |bn AS (SELECT CASE WHEN w = 0 THEN 0
        |    ELSE least(CAST(floor((s - lo) / w) AS BIGINT), 15) END AS bin,
        |  CAST(count(*) AS BIGINT) AS n, CAST(sum(lbl) AS BIGINT) AS pos
        | FROM b, ex GROUP BY 1),
        |pr AS (SELECT i.bin AS i, j.bin AS j,
        |  CAST(sum(m.pos) AS DOUBLE) / CAST(sum(m.n) AS DOUBLE) AS rate
        | FROM bn i JOIN bn j ON i.bin <= j.bin
        | JOIN bn m ON m.bin BETWEEN i.bin AND j.bin GROUP BY 1, 2),
        |ft AS (SELECT b2.bin, pr.i, min(pr.rate) AS mn
        | FROM bn b2 JOIN pr ON pr.i <= b2.bin AND pr.j >= b2.bin
        | GROUP BY 1, 2),
        |f2 AS (SELECT bin, max(mn) AS fit FROM ft GROUP BY 1)
        |SELECT bn.bin, n, pos,
        | round(CAST(pos AS DOUBLE) / n, 6) AS raw_rate,
        | round(fit, 6) AS iso_rate
        |FROM bn JOIN f2 USING (bin)""".stripMargin,
    // Holt–Winters: DECIMAL-exact seed means, then the recursive CTE
    // replays the ring-buffer recurrence with the seasonal state as a
    // DDSketch: the γ-constants are the SAME Scala doubles inlined as
    // string-cast literals; rank cutoffs pure integer ceil
    "q308_ddsketch" -> ddSketchOracleSql,
    // the compacted store reads identically — counter addition is the
    // merge in both the fold and the read
    "q325_compacted_ddsketch" -> ddSketchOracleSql,

    // DDSketch merge: per-parity shard bucket counts summed, then the
    // identical q308 cumulative-rank read
    "q311_ddsketch_merge" -> {
      val (lnG, g, gp1) = graft.ops.Stats.ddSketchConsts(10)
      s"""WITH b AS (SELECT o_orderpriority AS k, o_orderkey % 2 AS sh,
         |  CAST(ceil(ln(CAST(o_totalprice AS DOUBLE))
         |    / CAST('$lnG' AS DOUBLE)) AS BIGINT) AS bkt
         | FROM orders WHERE o_totalprice > 0),
         |shard AS (SELECT k, sh, bkt, CAST(count(*) AS BIGINT) AS c
         | FROM b GROUP BY 1, 2, 3),
         |sk AS (SELECT k, bkt, CAST(sum(c) AS BIGINT) AS c FROM shard
         | GROUP BY 1, 2),
         |cm AS (SELECT *, CAST(sum(c) OVER (PARTITION BY k ORDER BY bkt
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS cum,
         |  CAST(sum(c) OVER (PARTITION BY k) AS BIGINT) AS n FROM sk),
         |est AS (SELECT *, round(2.0 * pow(CAST('$g' AS DOUBLE), bkt)
         |    / CAST('$gp1' AS DOUBLE), 6) AS e FROM cm)
         |SELECT k AS o_orderpriority, max(n) AS n,
         | CAST(count(*) AS BIGINT) AS n_buckets,
         | min(CASE WHEN cum >= (n * 500 + 999) // 1000 THEN e END) AS p50,
         | min(CASE WHEN cum >= (n * 950 + 999) // 1000 THEN e END) AS p95,
         | min(CASE WHEN cum >= (n * 990 + 999) // 1000 THEN e END) AS p99
         |FROM est GROUP BY 1""".stripMargin
    },
    // SMD balance: the q285 conditional-moment contract per covariate,
    // variance/pooled/smd as pinned double expressions
    "q306_smd_balance" -> {
      val covs = Seq("spend", "n_events", "n_types")
      val sums = covs.map { c =>
        s"""sum(CAST(CASE WHEN g = 1 THEN $c ELSE CAST(0 AS DOUBLE) END
           |    AS DECIMAL(28,6))) AS sa_$c,
           |  sum(CAST(CASE WHEN g = 1 THEN $c * $c ELSE CAST(0 AS DOUBLE) END
           |    AS DECIMAL(28,6))) AS qa_$c,
           |  sum(CAST(CASE WHEN g = 0 THEN $c ELSE CAST(0 AS DOUBLE) END
           |    AS DECIMAL(28,6))) AS sb_$c,
           |  sum(CAST(CASE WHEN g = 0 THEN $c * $c ELSE CAST(0 AS DOUBLE) END
           |    AS DECIMAL(28,6))) AS qb_$c""".stripMargin
      }.mkString(",\n  ")
      val selects = covs.map { c =>
        s"""SELECT '$c' AS covariate, na AS n_a, nb AS n_b,
           | round(CAST(sa_$c AS DOUBLE) / na, 6) AS mean_a,
           | round(CAST(sb_$c AS DOUBLE) / nb, 6) AS mean_b,
           | round(CASE WHEN
           |     ((CASE WHEN na > 1 THEN (CAST(qa_$c AS DOUBLE)
           |         - CAST(sa_$c AS DOUBLE) * CAST(sa_$c AS DOUBLE) / na)
           |         / (na - 1) END)
           |      + (CASE WHEN nb > 1 THEN (CAST(qb_$c AS DOUBLE)
           |         - CAST(sb_$c AS DOUBLE) * CAST(sb_$c AS DOUBLE) / nb)
           |         / (nb - 1) END)) / CAST(2 AS DOUBLE) > 0
           |   THEN (CAST(sa_$c AS DOUBLE) / na - CAST(sb_$c AS DOUBLE) / nb)
           |     / sqrt(((CASE WHEN na > 1 THEN (CAST(qa_$c AS DOUBLE)
           |         - CAST(sa_$c AS DOUBLE) * CAST(sa_$c AS DOUBLE) / na)
           |         / (na - 1) END)
           |      + (CASE WHEN nb > 1 THEN (CAST(qb_$c AS DOUBLE)
           |         - CAST(sb_$c AS DOUBLE) * CAST(sb_$c AS DOUBLE) / nb)
           |         / (nb - 1) END)) / CAST(2 AS DOUBLE))
           |   END, 6) AS smd
           |FROM m""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH u AS (SELECT user_id,
         |  coalesce(CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE),
         |    CAST(0 AS DOUBLE)) AS spend,
         |  CAST(count(*) AS DOUBLE) AS n_events,
         |  CAST(count(DISTINCT event_type) AS DOUBLE) AS n_types,
         |  CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS g
         | FROM events GROUP BY user_id),
         |m AS (SELECT CAST(sum(g) AS BIGINT) AS na,
         |  CAST(sum(1 - g) AS BIGINT) AS nb,
         |  $sums
         | FROM u)
         |$selects""".stripMargin
    },
    // Markov attribution: the transition chain in SQL windows, then the
    // 32 Jacobi iterations as a recursive CTE over the 4 variants —
    // every product CAST to DECIMAL(28,12) exactly as the driver solve
    "q301_markov_attribution" ->
      """WITH RECURSIVE fc AS (SELECT user_id, min(ts) AS cts FROM events
        | WHERE event_type = 'purchase' GROUP BY 1),
        |tl AS (SELECT e.user_id, e.event_type AS ch, e.ts FROM events e
        | LEFT JOIN fc USING (user_id)
        | WHERE e.event_type IN ('view', 'click', 'signup')
        |   AND (fc.cts IS NULL OR e.ts < fc.cts)),
        |sq AS (SELECT user_id, ch,
        |  lag(ch) OVER (PARTITION BY user_id ORDER BY ts) AS prev FROM tl),
        |t1 AS (SELECT coalesce(prev, 'start') AS src, ch AS dst FROM sq),
        |lt AS (SELECT user_id, arg_max(ch, ts) AS lch FROM tl GROUP BY 1),
        |cu AS (SELECT user_id,
        |  max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS cv
        | FROM events GROUP BY 1),
        |t2 AS (SELECT coalesce(l.lch, 'start') AS src,
        |  CASE WHEN c.cv = 1 THEN 'conv' ELSE 'null' END AS dst
        | FROM cu c LEFT JOIN lt l USING (user_id)),
        |mt AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS cnt FROM
        | (SELECT * FROM t1 UNION ALL SELECT * FROM t2) GROUP BY 1, 2),
        |tt AS (SELECT src, CAST(sum(cnt) AS BIGINT) AS tot FROM mt
        | GROUP BY 1),
        |e AS (SELECT src, dst, CAST(CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE)
        |   AS DECIMAL(28,12)) AS p
        | FROM mt JOIN tt USING (src)),
        |ev AS MATERIALIZED (SELECT 'full' AS variant, * FROM e
        | UNION ALL SELECT 'view', * FROM e WHERE dst != 'view'
        | UNION ALL SELECT 'click', * FROM e WHERE dst != 'click'
        | UNION ALL SELECT 'signup', * FROM e WHERE dst != 'signup'),
        |rec AS (
        | SELECT v.variant, a.s,
        |   CAST(CASE WHEN a.s = 'conv' THEN 1 ELSE 0 END AS DECIMAL(28,12))
        |     AS val, 0 AS it
        | FROM (SELECT DISTINCT variant FROM ev) v
        | CROSS JOIN (VALUES ('conv'), ('null')) a(s)
        | UNION ALL
        | SELECT variant, s, val, it FROM (
        |  SELECT x.variant AS variant, x.src AS s,
        |    sum(CAST(x.p * r.val AS DECIMAL(28,12))) AS val,
        |    r.it + 1 AS it
        |  FROM ev x JOIN rec r ON r.variant = x.variant AND r.s = x.dst
        |  WHERE r.it < 32 GROUP BY 1, 2, r.it + 1
        |  UNION ALL
        |  SELECT variant, s, val, it + 1 FROM rec
        |  WHERE s IN ('conv', 'null') AND it < 32)),
        |fin AS (SELECT variant, val FROM rec WHERE it = 32 AND s = 'start')
        |SELECT c.channel,
        | round(CAST(pf.val AS DOUBLE), 6) AS p_conv,
        | round(CAST(pr.val AS DOUBLE), 6) AS p_conv_removed,
        | round(CASE WHEN pf.val > 0
        |   THEN 1 - CAST(pr.val AS DOUBLE) / CAST(pf.val AS DOUBLE) END, 6)
        |   AS removal_effect
        |FROM (VALUES ('view'), ('click'), ('signup')) c(channel)
        |JOIN fin pf ON pf.variant = 'full'
        |JOIN fin pr ON pr.variant = c.channel""".stripMargin,
    // Shapley: the 2^3 coalition v-table from one user aggregate,
    // factorial-rational weights, per-term pinned division over n! = 6
    "q299_shapley" ->
      """WITH u AS (SELECT user_id,
        |  max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) * 1
        |  + max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) * 2
        |  + max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) * 4
        |    AS mask,
        |  max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        | FROM events GROUP BY 1),
        |v AS (SELECT mask, CAST(sum(conv) AS DOUBLE) / count(*) AS v
        | FROM u GROUP BY 1),
        |coef(channel, mwith, mwo, num) AS (VALUES
        | ('view', 1, 0, 2), ('view', 3, 2, 1),
        | ('view', 5, 4, 1), ('view', 7, 6, 2),
        | ('click', 2, 0, 2), ('click', 3, 1, 1),
        | ('click', 6, 4, 1), ('click', 7, 5, 2),
        | ('signup', 4, 0, 2), ('signup', 5, 1, 1),
        | ('signup', 6, 2, 1), ('signup', 7, 3, 2)),
        |t AS (SELECT channel, CAST(
        |   (CAST(num AS DOUBLE) * (coalesce(vw.v, CAST(0 AS DOUBLE))
        |     - coalesce(vo.v, CAST(0 AS DOUBLE)))) / CAST(6 AS DOUBLE)
        |   AS DECIMAL(28,12)) AS t
        | FROM coef LEFT JOIN v vw ON vw.mask = coef.mwith
        | LEFT JOIN v vo ON vo.mask = coef.mwo)
        |SELECT channel, round(CAST(sum(t) AS DOUBLE), 6) AS shapley
        |FROM t GROUP BY 1""".stripMargin,
    // U-shaped attribution: positions from the pre-first-conversion
    // path, rational credits, DECIMAL-quantized pre-sum
    "q300_position_attribution" ->
      """WITH fc AS (SELECT user_id, min(ts) AS cts FROM events
        | WHERE event_type = 'purchase' GROUP BY 1),
        |p AS (SELECT e.user_id, e.event_type, e.ts FROM events e
        | JOIN fc USING (user_id)
        | WHERE e.event_type IN ('view', 'click', 'signup')
        |   AND e.ts < fc.cts),
        |r AS (SELECT *,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts) AS pos,
        |  count(*) OVER (PARTITION BY user_id) AS k FROM p),
        |c AS (SELECT event_type AS channel, pos,
        |  CASE WHEN k = 1 THEN CAST(1 AS DOUBLE)
        |    WHEN k = 2 THEN 1 / CAST(2 AS DOUBLE)
        |    WHEN pos = 1 OR pos = k THEN 2 / CAST(5 AS DOUBLE)
        |    ELSE 1 / (CAST(5 AS DOUBLE) * (k - 2)) END AS credit
        | FROM r)
        |SELECT channel,
        | round(CAST(sum(CAST(credit AS DECIMAL(28,12))) AS DOUBLE), 6)
        |   AS credit,
        | CAST(sum(CASE WHEN pos = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_first
        |FROM c GROUP BY 1""".stripMargin,
    // Poisson bootstrap: the hash-Poisson weights replay from integer
    // thresholds (no float near the draw); resample sums DECIMAL(28,6),
    // CI ranks from integer ceil over the non-empty resample count
    "q289_bootstrap_ci" ->
      """WITH b AS (SELECT o_orderpriority AS grp,
        |  CAST(o_orderkey AS VARCHAR) AS id, o_totalprice AS val
        | FROM orders),
        |sd AS (SELECT grp, val, h % 1048573 AS s0,
        |  1 + (h // 1048576) % 1048572 AS s1
        | FROM (SELECT *, ('0x' || substr(md5(id || ':bs'), 1, 15))::BIGINT
        |   AS h FROM b)),
        |r AS (SELECT grp, val, s0, s1, rep FROM sd
        |  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS rep)),
        |w AS (SELECT grp, rep, val,
        |  CASE WHEN hm < 385748 THEN 0 WHEN hm < 771496 THEN 1
        |    WHEN hm < 964371 THEN 2 WHEN hm < 1028662 THEN 3
        |    WHEN hm < 1044735 THEN 4 WHEN hm < 1047949 THEN 5
        |    WHEN hm < 1048485 THEN 6 WHEN hm < 1048562 THEN 7
        |    WHEN hm < 1048571 THEN 8 ELSE 9 END AS w
        | FROM (SELECT *, (s0 + rep * s1) % 1048573 AS hm FROM r)),
        |s AS (SELECT grp, rep, sum(CAST(w * val AS DECIMAL(28,6))) AS sv,
        |  CAST(sum(w) AS BIGINT) AS wn FROM w GROUP BY 1, 2),
        |m AS (SELECT grp, rep, CAST(sv AS DOUBLE) / wn AS mean FROM s
        | WHERE wn > 0),
        |rk AS (SELECT grp, mean,
        |  row_number() OVER (PARTITION BY grp ORDER BY mean, rep) AS rn,
        |  count(*) OVER (PARTITION BY grp) AS m FROM m),
        |ci AS (SELECT grp,
        |  max(CASE WHEN rn = (m * 25 + 999) // 1000 THEN mean END) AS lo,
        |  max(CASE WHEN rn = (m * 975 + 999) // 1000 THEN mean END) AS hi,
        |  CAST(max(m) AS BIGINT) AS n_resamples FROM rk GROUP BY 1),
        |f AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(val AS DECIMAL(28,6))) AS DOUBLE) / count(*) AS mn
        | FROM b GROUP BY 1)
        |SELECT f.grp AS o_orderpriority, n, round(mn, 6) AS mean,
        | round(lo, 6) AS ci_lo, round(hi, 6) AS ci_hi, n_resamples
        |FROM f JOIN ci USING (grp)""".stripMargin,
    // Mann-Kendall + Theil-Sen: S and the tie/variance terms are pure
    // integers; each slope one pinned division; median midpoint (a+b)/2
    "q291_trend_test" ->
      """WITH mo AS (SELECT o_orderpriority AS g,
        |  year(o_orderdate) * 12 + month(o_orderdate) AS t,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS y
        | FROM orders GROUP BY 1, 2),
        |p AS (SELECT a.g, a.t AS t1, a.y AS y1, b.t AS t2, b.y AS y2
        | FROM mo a JOIN mo b ON a.g = b.g AND a.t < b.t),
        |s AS (SELECT g, CAST(sum(CASE WHEN y2 > y1 THEN 1
        |    WHEN y2 < y1 THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
        | FROM p GROUP BY 1),
        |n AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM mo GROUP BY 1),
        |tie AS (SELECT g, CAST(sum(tc * (tc - 1) * (2 * tc + 5)) AS BIGINT)
        |   AS tie
        | FROM (SELECT g, y, count(*) AS tc FROM mo GROUP BY 1, 2)
        | GROUP BY 1),
        |sl AS (SELECT g, (y2 - y1) / (t2 - t1) AS sl FROM p WHERE t2 != t1),
        |rk AS (SELECT g, sl, row_number() OVER (PARTITION BY g ORDER BY sl)
        |   AS rn, count(*) OVER (PARTITION BY g) AS m FROM sl),
        |sen AS (SELECT g, (min(sl) + max(sl)) / 2.0 AS sen FROM rk
        | WHERE rn * 2 = m OR rn * 2 = m + 2 OR rn * 2 = m + 1 GROUP BY 1),
        |v AS (SELECT n.g, n.n, s.s_stat, sen.sen,
        |  CAST(n.n * (n.n - 1) * (2 * n.n + 5) - tie.tie AS DOUBLE) / 18.0
        |    AS vs
        | FROM n JOIN s ON s.g = n.g JOIN tie ON tie.g = n.g
        | JOIN sen ON sen.g = n.g)
        |SELECT g AS o_orderpriority, n, s_stat, round(vs, 6) AS var_s,
        | round(CASE WHEN vs > 0 THEN
        |   CASE WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE) / sqrt(vs)
        |     WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE) / sqrt(vs)
        |     ELSE 0.0 END END, 6) AS z,
        | round(sen, 6) AS sen_slope
        |FROM v""".stripMargin,
    // lift/gains: q284's per-value descending cumulatives, deciles by
    // integer ceil on cumulative row counts (value ties never straddle)
    "q294_lift_gains" ->
      """WITH b AS (SELECT date_part('dow', ts) AS dow, value AS v,
        |  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS lbl
        | FROM events WHERE event_type IN ('view', 'purchase')
        |   AND value IS NOT NULL),
        |pv AS (SELECT dow, v, CAST(count(*) AS BIGINT) AS c,
        |  CAST(sum(lbl) AS BIGINT) AS p FROM b GROUP BY 1, 2),
        |cum AS (SELECT *, CAST(sum(c) OVER w AS BIGINT) AS ccum,
        |  CAST(sum(p) OVER w AS BIGINT) AS pcum,
        |  CAST(sum(c) OVER (PARTITION BY dow) AS BIGINT) AS ctot,
        |  CAST(sum(p) OVER (PARTITION BY dow) AS BIGINT) AS ptot
        | FROM pv WINDOW w AS (PARTITION BY dow ORDER BY v DESC
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |dec AS (SELECT dow,
        |  CAST((10 * ccum + ctot - 1) // ctot AS BIGINT) AS decile,
        |  c, p, pcum, ptot, ctot FROM cum),
        |agg AS (SELECT dow, decile, CAST(sum(c) AS BIGINT) AS n,
        |  CAST(sum(p) AS BIGINT) AS n_pos,
        |  CAST(max(pcum) AS BIGINT) AS cum_pos,
        |  max(ptot) AS ptot, max(ctot) AS ctot
        | FROM dec GROUP BY 1, 2)
        |SELECT dow, decile, n, n_pos, cum_pos,
        | round(CASE WHEN ptot > 0
        |   THEN CAST(cum_pos AS DOUBLE) / ptot END, 6) AS gain,
        | round(CASE WHEN ptot > 0 THEN (CAST(n_pos AS DOUBLE) / n)
        |   / (CAST(ptot AS DOUBLE) / ctot) END, 6) AS lift
        |FROM agg""".stripMargin,
    // Nelson-Aalen: the q273 subject/duration/censor chain, hazard and
    // variance terms DECIMAL-quantized before the cumulative sums
    "q295_nelson_aalen" ->
      """WITH s AS (SELECT user_id, event_type,
        |  date_diff('second', TIMESTAMP '1970-01-01', min(ts)) AS a,
        |  date_diff('second', TIMESTAMP '1970-01-01', max(ts)) AS b
        | FROM events GROUP BY 1, 2),
        |m AS (SELECT max(b) AS mx FROM s),
        |bd AS (SELECT CAST(floor((b - a) / 3600.0) AS BIGINT) AS duration_hr,
        |  CAST(sum(CASE WHEN b < mx - 259200 THEN 1 ELSE 0 END) AS BIGINT) AS n_events,
        |  CAST(sum(CASE WHEN b < mx - 259200 THEN 0 ELSE 1 END) AS BIGINT) AS n_censored,
        |  CAST(count(*) AS BIGINT) AS tot
        | FROM s, m GROUP BY 1),
        |r AS (SELECT *, CAST(sum(tot) OVER (ORDER BY duration_hr
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
        | FROM bd),
        |g AS (SELECT *,
        |  sum(CAST(CAST(n_events AS DOUBLE) / CAST(n_risk AS DOUBLE)
        |    AS DECIMAL(28,12))) OVER wc AS ch,
        |  sum(CAST(CAST(n_events AS DOUBLE)
        |      / (CAST(n_risk AS DOUBLE) * CAST(n_risk AS DOUBLE))
        |    AS DECIMAL(28,12))) OVER wc AS hv
        | FROM r WINDOW wc AS (ORDER BY duration_hr
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT duration_hr, n_risk, n_events, n_censored,
        | round(CAST(ch AS DOUBLE), 6) AS cum_hazard,
        | round(CAST(hv AS DOUBLE), 6) AS hazard_var
        |FROM g""".stripMargin,
    // mutual information: per-cell and per-margin log terms quantized to
    // DECIMAL(28,12) pre-sum, every log argument one pinned double expr
    "q296_mutual_info" ->
      """WITH c AS (SELECT source AS x, lang AS y,
        |  CAST(count(*) AS BIGINT) AS nxy
        | FROM documents WHERE source IS NOT NULL AND lang IS NOT NULL
        | GROUP BY 1, 2),
        |mx AS (SELECT x, CAST(sum(nxy) AS BIGINT) AS nx FROM c GROUP BY 1),
        |my AS (SELECT y, CAST(sum(nxy) AS BIGINT) AS ny FROM c GROUP BY 1),
        |nn AS (SELECT CAST(sum(nxy) AS BIGINT) AS n FROM c),
        |mi AS (SELECT CAST(sum(CAST(
        |    (CAST(nxy AS DOUBLE) / CAST(n AS DOUBLE))
        |    * ln((CAST(nxy AS DOUBLE) * CAST(n AS DOUBLE))
        |      / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE)))
        |    AS DECIMAL(28,12))) AS DOUBLE) AS mi
        | FROM c JOIN mx USING (x) JOIN my USING (y) CROSS JOIN nn),
        |hx AS (SELECT CAST(sum(CAST(
        |    -(CAST(nx AS DOUBLE) / CAST(n AS DOUBLE))
        |    * ln(CAST(nx AS DOUBLE) / CAST(n AS DOUBLE))
        |    AS DECIMAL(28,12))) AS DOUBLE) AS hx FROM mx CROSS JOIN nn),
        |hy AS (SELECT CAST(sum(CAST(
        |    -(CAST(ny AS DOUBLE) / CAST(n AS DOUBLE))
        |    * ln(CAST(ny AS DOUBLE) / CAST(n AS DOUBLE))
        |    AS DECIMAL(28,12))) AS DOUBLE) AS hy FROM my CROSS JOIN nn)
        |SELECT n, round(mi, 6) AS mi, round(hx, 6) AS h_x,
        | round(hy, 6) AS h_y,
        | round(CASE WHEN hx > 0 AND hy > 0
        |   THEN mi / sqrt(hx * hy) END, 6) AS nmi
        |FROM mi CROSS JOIN hx CROSS JOIN hy CROSS JOIN nn""".stripMargin,
    // LIST (head = s_{t−m}, rotate-append each step) — expression text
    // pinned to HwScan's IEEE step order
    "q288_holt_winters" ->
      """WITH RECURSIVE bars AS MATERIALIZED (SELECT event_type AS k,
        |  date_trunc('hour', ts) AS bar, arg_max(value, ts) AS close
        | FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |idx AS MATERIALIZED (SELECT k, bar, close,
        |  CAST(row_number() OVER (PARTITION BY k ORDER BY bar) AS BIGINT)
        |    AS rn FROM bars),
        |nn AS (SELECT k, CAST(count(*) AS BIGINT) AS cnt FROM idx GROUP BY 1),
        |sraw AS (SELECT i.k,
        |  CAST(sum(CASE WHEN rn <= 24
        |    THEN CAST(close AS DECIMAL(28,10)) END) AS DOUBLE) AS s1,
        |  CAST(sum(CASE WHEN rn > 24 AND rn <= 48
        |    THEN CAST(close AS DECIMAL(28,10)) END) AS DOUBLE) AS s2
        | FROM idx i JOIN nn ON nn.k = i.k WHERE nn.cnt >= 48 GROUP BY 1),
        |sd AS (SELECT k, s1 / 24 AS l0, (s2 / 24 - s1 / 24) / 24 AS b0
        | FROM sraw),
        |sl0 AS (SELECT i.k, list(i.close - sd.l0 ORDER BY i.rn) AS sl
        | FROM idx i JOIN sd ON sd.k = i.k WHERE i.rn <= 24 GROUP BY 1),
        |st AS (
        | SELECT sd.k, CAST(24 AS BIGINT) AS rn, CAST(NULL AS TIMESTAMP) AS bar,
        |  CAST(NULL AS DOUBLE) AS close, sd.l0 AS l, sd.b0 AS b,
        |  CAST(NULL AS DOUBLE) AS s, CAST(NULL AS DOUBLE) AS f, sl0.sl AS sl
        | FROM sd JOIN sl0 ON sl0.k = sd.k
        | UNION ALL
        | SELECT s0.k, s0.rn + 1, i.bar, i.close,
        |  0.25 * (i.close - s0.sl[1]) + 0.75 * (s0.l + s0.b),
        |  0.125 * ((0.25 * (i.close - s0.sl[1]) + 0.75 * (s0.l + s0.b))
        |      - s0.l) + 0.875 * s0.b,
        |  0.25 * (i.close - s0.l - s0.b) + 0.75 * s0.sl[1],
        |  s0.l + s0.b + s0.sl[1],
        |  list_append(s0.sl[2:],
        |    0.25 * (i.close - s0.l - s0.b) + 0.75 * s0.sl[1])
        | FROM st s0 JOIN idx i ON i.k = s0.k AND i.rn = s0.rn + 1)
        |SELECT k AS event_type, bar, close,
        | floor(l * 1000000.0 + 0.5) / 1000000.0 AS level,
        | floor(b * 1000000.0 + 0.5) / 1000000.0 AS trend,
        | floor(s * 1000000.0 + 0.5) / 1000000.0 AS seasonal,
        | floor(f * 1000000.0 + 0.5) / 1000000.0 AS fitted
        |FROM st WHERE rn > 24""".stripMargin,
    // DiD: per-cell n/Σy/Σy² via conditional DECIMAL sums, means and
    // variances in double with the op order pinned against the Spark side
    "q274_did" ->
      """WITH b AS (SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS t,
        |  CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS p,
        |  CAST(value AS DOUBLE) AS y FROM events WHERE value IS NOT NULL),
        |a AS (SELECT
        |  CAST(sum(CASE WHEN t=1 AND p=1 THEN 1 END) AS BIGINT) AS n11,
        |  CAST(sum(CASE WHEN t=1 AND p=0 THEN 1 END) AS BIGINT) AS n10,
        |  CAST(sum(CASE WHEN t=0 AND p=1 THEN 1 END) AS BIGINT) AS n01,
        |  CAST(sum(CASE WHEN t=0 AND p=0 THEN 1 END) AS BIGINT) AS n00,
        |  sum(CASE WHEN t=1 AND p=1 THEN CAST(y AS DECIMAL(28,10)) END) AS s11,
        |  sum(CASE WHEN t=1 AND p=0 THEN CAST(y AS DECIMAL(28,10)) END) AS s10,
        |  sum(CASE WHEN t=0 AND p=1 THEN CAST(y AS DECIMAL(28,10)) END) AS s01,
        |  sum(CASE WHEN t=0 AND p=0 THEN CAST(y AS DECIMAL(28,10)) END) AS s00,
        |  sum(CASE WHEN t=1 AND p=1 THEN CAST(y*y AS DECIMAL(28,10)) END) AS q11,
        |  sum(CASE WHEN t=1 AND p=0 THEN CAST(y*y AS DECIMAL(28,10)) END) AS q10,
        |  sum(CASE WHEN t=0 AND p=1 THEN CAST(y*y AS DECIMAL(28,10)) END) AS q01,
        |  sum(CASE WHEN t=0 AND p=0 THEN CAST(y*y AS DECIMAL(28,10)) END) AS q00
        | FROM b),
        |c AS (SELECT *,
        |  CAST(s11 AS DOUBLE) / CAST(n11 AS DOUBLE) AS m11,
        |  CAST(s10 AS DOUBLE) / CAST(n10 AS DOUBLE) AS m10,
        |  CAST(s01 AS DOUBLE) / CAST(n01 AS DOUBLE) AS m01,
        |  CAST(s00 AS DOUBLE) / CAST(n00 AS DOUBLE) AS m00,
        |  CASE WHEN n11 > 1 THEN (CAST(q11 AS DOUBLE) - CAST(s11 AS DOUBLE) * CAST(s11 AS DOUBLE) / CAST(n11 AS DOUBLE)) / (CAST(n11 AS DOUBLE) - 1.0) END AS v11,
        |  CASE WHEN n10 > 1 THEN (CAST(q10 AS DOUBLE) - CAST(s10 AS DOUBLE) * CAST(s10 AS DOUBLE) / CAST(n10 AS DOUBLE)) / (CAST(n10 AS DOUBLE) - 1.0) END AS v10,
        |  CASE WHEN n01 > 1 THEN (CAST(q01 AS DOUBLE) - CAST(s01 AS DOUBLE) * CAST(s01 AS DOUBLE) / CAST(n01 AS DOUBLE)) / (CAST(n01 AS DOUBLE) - 1.0) END AS v01,
        |  CASE WHEN n00 > 1 THEN (CAST(q00 AS DOUBLE) - CAST(s00 AS DOUBLE) * CAST(s00 AS DOUBLE) / CAST(n00 AS DOUBLE)) / (CAST(n00 AS DOUBLE) - 1.0) END AS v00
        | FROM a),
        |e AS (SELECT *, (m11 - m10) - (m01 - m00) AS did,
        |  sqrt(v11 / CAST(n11 AS DOUBLE) + v10 / CAST(n10 AS DOUBLE)
        |     + v01 / CAST(n01 AS DOUBLE) + v00 / CAST(n00 AS DOUBLE)) AS se
        | FROM c)
        |SELECT n11 AS n_treat_post, n10 AS n_treat_pre,
        |  n01 AS n_ctrl_post, n00 AS n_ctrl_pre,
        |  round(m11, 6) AS m_treat_post, round(m10, 6) AS m_treat_pre,
        |  round(m01, 6) AS m_ctrl_post, round(m00, 6) AS m_ctrl_pre,
        |  round(did, 6) AS did, round(se, 6) AS se,
        |  round(did / se, 6) AS t_stat
        |FROM e""".stripMargin,
    // split-conformal: the ⌈0.8n⌉ split and the k = ⌈(n_cal+1)·9/10⌉
    // rank are decimal/integer-exact; residual ties at rank k break by
    // bar, so q̂ is the identical order statistic in both engines
    "q272_conformal" ->
      s"""WITH $ConformalCtes
         |SELECT user_id, bar, y, yhat, lo, hi, covered, n_cal, qhat,
         | coverage
         |FROM conf""".stripMargin,
    // interval score over the conformal chain: per-row score terms
    // quantized to DECIMAL pre-sum, the (width + below) + above op order
    // pinned against the Spark side, 20.0 = 2/α exact in both engines
    "q277_interval_score" ->
      s"""WITH $ConformalCtes
         |SELECT user_id, CAST(count(*) AS BIGINT) AS n_obs,
         | round(CAST(sum(CAST(hi - lo AS DECIMAL(28,10))) AS DOUBLE)
         |   / count(*), 6) AS mean_width,
         | round(CAST(sum(CASE WHEN y >= lo AND y <= hi THEN 1 ELSE 0 END) AS DOUBLE)
         |   / count(*), 6) AS coverage,
         | round(CAST(sum(CAST((hi - lo)
         |   + (CASE WHEN y < lo THEN 20.0 * (lo - y) ELSE 0.0 END)
         |   + (CASE WHEN y > hi THEN 20.0 * (y - hi) ELSE 0.0 END)
         |   AS DECIMAL(28,10))) AS DOUBLE) / count(*), 6) AS mean_interval_score
         |FROM conf GROUP BY 1""".stripMargin,
    // decomposition replay: trend from the same centered decimal-mean,
    // detrended phase means re-centered by the per-key phase-mean average;
    // rounding order (trend/seasonal at 6dp BEFORE resid) mirrored exactly
    "q254_seasonal" ->
      """WITH bars AS (SELECT user_id, date_trunc('hour', ts) AS bar,
        |  arg_max(value, ts) AS close FROM events
        | WHERE value IS NOT NULL GROUP BY 1, 2),
        |b AS (SELECT user_id, bar, close,
        |  (row_number() OVER w - 1) % 5 AS phase,
        |  CAST(count(*) OVER c AS BIGINT) AS wn,
        |  CAST(sum(CAST(close AS DECIMAL(28,10))) OVER c AS DOUBLE) / 5
        |    AS tr
        | FROM bars
        | WINDOW w AS (PARTITION BY user_id ORDER BY bar),
        |  c AS (PARTITION BY user_id ORDER BY bar
        |    ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)),
        |t AS (SELECT user_id, bar, close, phase,
        |  CASE WHEN wn = 5 THEN tr END AS trend FROM b),
        |s AS (SELECT user_id, phase,
        |  CAST(sum(CAST(close - trend AS DECIMAL(28,10))) AS DOUBLE)
        |    / count(*) AS sraw
        | FROM t WHERE trend IS NOT NULL GROUP BY 1, 2),
        |sc AS (SELECT user_id, phase,
        |  round(sraw -
        |    CAST(sum(CAST(sraw AS DECIMAL(28,10)))
        |        OVER (PARTITION BY user_id) AS DOUBLE)
        |      / count(*) OVER (PARTITION BY user_id), 6) AS seasonal
        | FROM s)
        |SELECT t.user_id, t.bar, t.close, t.phase,
        | round(t.trend, 6) AS trend, sc.seasonal,
        | CASE WHEN t.trend IS NOT NULL AND sc.seasonal IS NOT NULL
        |   THEN round(t.close - round(t.trend, 6) - sc.seasonal, 6)
        | END AS resid
        |FROM t LEFT JOIN sc ON sc.user_id = t.user_id
        |  AND sc.phase = t.phase""".stripMargin,
    "q249_roll_spread" ->
      """WITH b AS (SELECT user_id, ts, event_id, value FROM events
        | WHERE value IS NOT NULL),
        |d AS (SELECT user_id, ts, event_id,
        |  value - lag(value) OVER w AS d FROM b
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |e AS (SELECT user_id, d, lag(d) OVER w AS dl FROM d
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |p AS (SELECT user_id, d, dl FROM e
        | WHERE d IS NOT NULL AND dl IS NOT NULL),
        |a AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(sum(CAST(d AS DECIMAL(28,10))) AS DOUBLE) AS sd,
        |  CAST(sum(CAST(dl AS DECIMAL(28,10))) AS DOUBLE) AS sdl,
        |  CAST(sum(CAST(d*dl AS DECIMAL(28,10))) AS DOUBLE) AS sddl
        | FROM p GROUP BY 1),
        |c AS (SELECT user_id, n_pairs,
        |  (sddl - sd*sdl/CAST(n_pairs AS DOUBLE)) / CAST(n_pairs AS DOUBLE)
        |    AS cov FROM a)
        |SELECT user_id, n_pairs, round(cov, 6) AS dcov,
        | CASE WHEN cov < 0 THEN round(2.0*sqrt(-cov), 6) END AS roll_spread
        |FROM c""".stripMargin,
    "q250_amihud" ->
      """WITH b AS (SELECT user_id, ts, event_id, value,
        |  CAST(json_extract(props, '$.k') AS DOUBLE) AS vol FROM events
        | WHERE value IS NOT NULL),
        |r AS (SELECT user_id, vol, value - lag(value) OVER w AS r FROM b
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |p AS (SELECT user_id, CAST(abs(r)/vol AS DECIMAL(28,12)) AS t
        | FROM r WHERE r IS NOT NULL AND vol IS NOT NULL AND vol > 0)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_obs,
        | round(CAST(sum(t) AS DOUBLE)/count(*), 6) AS illiq
        |FROM p GROUP BY 1""".stripMargin,
    // GARCH fold replayed with the identical acc = (s2, prev-return)
    // recursion; parameters 0.25/0.25/0.5 and seed 1.0 are dyadic-exact
    "q251_garch" ->
      """WITH bars AS (SELECT user_id, date_trunc('hour', ts) AS bar,
        |  arg_max(value, ts) AS close FROM events
        | WHERE value IS NOT NULL GROUP BY 1, 2),
        |p AS (SELECT user_id, list(bar ORDER BY bar) AS bs,
        |  list(close ORDER BY bar) AS cs FROM bars GROUP BY 1
        | HAVING count(*) >= 2),
        |rr AS (SELECT user_id, bs[2:] AS rbs,
        |  list_transform(range(2, len(cs) + 1), i -> cs[i] - cs[i-1]) AS rs
        | FROM p),
        |i AS (SELECT user_id, unnest(range(1, len(rs) + 1)) AS rn, rbs, rs
        | FROM rr),
        |e AS (SELECT user_id, rbs[rn] AS bar, rs[rn] AS ret,
        |  list_reduce(
        |    list_prepend({'s2': CAST(1.0 AS DOUBLE), 'rp': rs[1]},
        |      list_transform(rs[2:rn],
        |        x -> {'s2': CAST(0.0 AS DOUBLE), 'rp': x})),
        |    (acc, el) -> {
        |      's2': CAST(0.25 AS DOUBLE) + CAST(0.25 AS DOUBLE)*acc.rp*acc.rp
        |        + CAST(0.5 AS DOUBLE)*acc.s2,
        |      'rp': el.rp}).s2 AS s2
        | FROM i)
        |SELECT user_id, bar,
        | floor(ret * 1000000.0 + 0.5) / 1000000.0 AS ret,
        | floor(s2 * 1000000.0 + 0.5) / 1000000.0 AS sigma2,
        | floor(sqrt(s2) * 1000000.0 + 0.5) / 1000000.0 AS sigma
        |FROM e""".stripMargin,
    "q204_kalman" ->
      """WITH bars AS (SELECT user_id, date_trunc('hour', ts) AS bar,
        |  arg_max(value, ts) AS close FROM events
        | WHERE value IS NOT NULL GROUP BY 1, 2),
        |p AS (SELECT user_id, list(bar ORDER BY bar) AS bs,
        |  list(close ORDER BY bar) AS cs FROM bars GROUP BY 1),
        |i AS (SELECT user_id, unnest(range(1, len(cs) + 1)) AS rn, bs, cs
        | FROM p),
        |e AS (SELECT user_id, bs[rn] AS bar, cs[rn] AS close,
        |  list_reduce(
        |    list_prepend({'level': cs[1], 'p': CAST(1.0 AS DOUBLE)},
        |      list_transform(cs[2:rn],
        |        x -> {'level': x, 'p': CAST(0.0 AS DOUBLE)})),
        |    (acc, el) -> {
        |      'level': acc.level
        |        + ((acc.p + 0.01) / ((acc.p + 0.01) + 1.0))
        |          * (el.level - acc.level),
        |      'p': (1.0 - ((acc.p + 0.01) / ((acc.p + 0.01) + 1.0)))
        |        * (acc.p + 0.01)}).level AS lvl
        | FROM i)
        |SELECT user_id, bar, close,
        | floor(lvl * 1000000.0 + 0.5) / 1000000.0 AS kf_level
        |FROM e""".stripMargin,
    "q205_periodogram" ->
      """WITH base AS (SELECT event_type, ts, event_id, value FROM events
        | WHERE value IS NOT NULL),
        |m AS (SELECT event_type,
        |  CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS sv,
        |  count(*) AS cn FROM base GROUP BY 1),
        |x AS (SELECT b.event_type, b.value - m.sv / m.cn AS xv,
        |  row_number() OVER (PARTITION BY b.event_type
        |    ORDER BY b.ts, b.event_id) - 1 AS pos
        | FROM base b JOIN m USING (event_type)),
        |g AS (SELECT event_type, xv, pos, p FROM x
        | CROSS JOIN (SELECT unnest([4, 6, 12, 24]) AS p) ps),
        |cell AS (SELECT event_type, p, CAST(pos % p AS INT) AS res,
        |  count(*) AS cn2,
        |  CAST(sum(CAST(xv AS DECIMAL(28,10))) AS DOUBLE) AS sx
        | FROM g GROUP BY 1, 2, 3),
        |t AS (SELECT event_type, p, cn2, sx,
        |  floor(cos(2.0 * pi() * res / p) * 1000000000.0 + 0.5)
        |    / 1000000000.0 AS c,
        |  floor(sin(2.0 * pi() * res / p) * 1000000000.0 + 0.5)
        |    / 1000000000.0 AS s
        | FROM cell),
        |f AS (SELECT event_type, p AS period,
        |  CAST(sum(cn2) AS BIGINT) AS n_obs,
        |  CAST(sum(CAST(sx * c AS DECIMAL(28,10))) AS DOUBLE) AS sc,
        |  CAST(sum(CAST(sx * s AS DECIMAL(28,10))) AS DOUBLE) AS ss
        | FROM t GROUP BY 1, 2)
        |SELECT event_type, period, n_obs,
        | CASE WHEN n_obs > 0
        |  THEN round((sc * sc + ss * ss) / CAST(n_obs AS DOUBLE), 6)
        | END AS power
        |FROM f""".stripMargin,
    "q206_rfm" ->
      """WITH conv AS (SELECT user_id, CAST(ts AS DATE) AS d, value
        | FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
        |ref AS (SELECT max(d) AS refd FROM conv),
        |pu AS (SELECT user_id, max(d) AS lastd, count(*) AS frequency,
        |  CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS monetary
        | FROM conv GROUP BY 1),
        |pr AS (SELECT user_id, frequency, monetary,
        |  date_diff('day', lastd, refd) AS recency_days
        | FROM pu CROSS JOIN ref),
        |b AS (SELECT
        |  quantile_cont(recency_days, 0.2) AS r0,
        |  quantile_cont(recency_days, 0.4) AS r1,
        |  quantile_cont(recency_days, 0.6) AS r2,
        |  quantile_cont(recency_days, 0.8) AS r3,
        |  quantile_cont(frequency, 0.2) AS f0,
        |  quantile_cont(frequency, 0.4) AS f1,
        |  quantile_cont(frequency, 0.6) AS f2,
        |  quantile_cont(frequency, 0.8) AS f3,
        |  quantile_cont(monetary, 0.2) AS m0,
        |  quantile_cont(monetary, 0.4) AS m1,
        |  quantile_cont(monetary, 0.6) AS m2,
        |  quantile_cont(monetary, 0.8) AS m3
        | FROM pr),
        |sc AS (SELECT user_id, recency_days, frequency, monetary,
        |  (CASE WHEN recency_days < r0 THEN 1 ELSE 0 END
        |   + CASE WHEN recency_days < r1 THEN 1 ELSE 0 END
        |   + CASE WHEN recency_days < r2 THEN 1 ELSE 0 END
        |   + CASE WHEN recency_days < r3 THEN 1 ELSE 0 END) + 1 AS r_score,
        |  (CASE WHEN frequency > f0 THEN 1 ELSE 0 END
        |   + CASE WHEN frequency > f1 THEN 1 ELSE 0 END
        |   + CASE WHEN frequency > f2 THEN 1 ELSE 0 END
        |   + CASE WHEN frequency > f3 THEN 1 ELSE 0 END) + 1 AS f_score,
        |  (CASE WHEN monetary > m0 THEN 1 ELSE 0 END
        |   + CASE WHEN monetary > m1 THEN 1 ELSE 0 END
        |   + CASE WHEN monetary > m2 THEN 1 ELSE 0 END
        |   + CASE WHEN monetary > m3 THEN 1 ELSE 0 END) + 1 AS m_score
        | FROM pr CROSS JOIN b)
        |SELECT user_id, recency_days, frequency, monetary,
        | r_score, f_score, m_score,
        | r_score * 100 + f_score * 10 + m_score AS segment
        |FROM sc""".stripMargin,
    "q207_transitions" ->
      """WITH p AS (SELECT event_type AS from_state,
        |  lead(event_type, 1) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS to_state
        | FROM events),
        |c AS (SELECT from_state, to_state, count(*) AS n_trans FROM p
        | WHERE to_state IS NOT NULL GROUP BY 1, 2)
        |SELECT from_state, to_state, n_trans,
        | CAST(sum(n_trans) OVER (PARTITION BY from_state) AS BIGINT)
        |   AS n_from,
        | round(CAST(n_trans AS DOUBLE) /
        |   CAST(sum(n_trans) OVER (PARTITION BY from_state) AS BIGINT), 6)
        |   AS prob
        |FROM c""".stripMargin,
    "q208_gini" ->
      """WITH ut AS (SELECT event_type, user_id,
        |  CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS user_total
        | FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |pv AS (SELECT event_type, user_total AS v, count(*) AS c,
        |  sum(CAST(user_total AS DECIMAL(28,10))) AS m
        | FROM ut GROUP BY 1, 2),
        |cc AS (SELECT event_type, v, c, m,
        |  CAST(sum(c) OVER (PARTITION BY event_type ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum
        | FROM pv),
        |t AS (SELECT event_type, c, m,
        |  CAST(v * CAST(c * (cum - c) + (c * (c + 1)) // 2 AS DOUBLE)
        |    AS DECIMAL(28,10)) AS iw
        | FROM cc),
        |a AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n_obs,
        |  CAST(sum(m) AS DOUBLE) AS s, CAST(sum(iw) AS DOUBLE) AS w
        | FROM t GROUP BY 1)
        |SELECT event_type, n_obs,
        | CASE WHEN s > 0
        |  THEN round(2.0 * w / (CAST(n_obs AS DOUBLE) * s)
        |    - (CAST(n_obs AS DOUBLE) + 1.0) / CAST(n_obs AS DOUBLE), 6)
        | END AS gini
        |FROM a""".stripMargin,
    "q212_risk_ratios" ->
      """WITH b AS (SELECT user_id, value,
        |  value - lag(value, 1) OVER w AS ret,
        |  max(value) OVER wc AS peak
        | FROM events WHERE value IS NOT NULL
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
        |  wc AS (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |m AS (SELECT user_id, ret,
        |  CASE WHEN peak > 0 THEN value / peak - 1.0 END AS dd FROM b),
        |a AS (SELECT user_id, count(ret) AS n_rets,
        |  CAST(sum(CAST(ret AS DECIMAL(28,10))) AS DOUBLE) AS s,
        |  CAST(sum(CAST(ret * ret AS DECIMAL(28,10))) AS DOUBLE) AS ss,
        |  CAST(sum(CAST(CASE WHEN ret < 0 THEN ret * ret ELSE 0.0 END
        |    AS DECIMAL(28,10))) AS DOUBLE) AS sd,
        |  min(dd) AS mdd
        | FROM m GROUP BY 1),
        |v AS (SELECT user_id, n_rets, s, ss, sd, mdd,
        |  CAST(n_rets AS DOUBLE) AS n FROM a)
        |SELECT user_id, n_rets,
        | CASE WHEN n_rets > 0 THEN round(s / n, 6) END AS mean_ret,
        | CASE WHEN n_rets > 1 AND (ss - s * s / n) / (n - 1.0) > 0
        |   THEN round(s / n / sqrt((ss - s * s / n) / (n - 1.0)), 6)
        | END AS sharpe,
        | CASE WHEN n_rets > 0 AND sqrt(sd / n) > 0
        |   THEN round(s / n / sqrt(sd / n), 6) END AS sortino,
        | CASE WHEN mdd IS NOT NULL THEN round(mdd, 6) END AS max_drawdown,
        | CASE WHEN mdd < 0 THEN round(s / n / (-mdd), 6) END AS calmar
        |FROM v""".stripMargin,
    "q213_ar_halflife" ->
      """WITH p AS (SELECT user_id, value AS y,
        |  lag(value, 1) OVER w AS xl FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |a AS (SELECT user_id, count(*) AS n_pairs,
        |  CAST(sum(CAST(y AS DECIMAL(28,10))) AS DOUBLE) AS sy,
        |  CAST(sum(CAST(xl AS DECIMAL(28,10))) AS DOUBLE) AS sx,
        |  CAST(sum(CAST(xl * xl AS DECIMAL(28,10))) AS DOUBLE) AS sxx,
        |  CAST(sum(CAST(xl * y AS DECIMAL(28,10))) AS DOUBLE) AS sxy
        | FROM p WHERE y IS NOT NULL AND xl IS NOT NULL GROUP BY 1),
        |v AS (SELECT user_id, n_pairs,
        |  CAST(n_pairs AS DOUBLE) * sxx - sx * sx AS den,
        |  (CAST(n_pairs AS DOUBLE) * sxy - sx * sy) /
        |    (CAST(n_pairs AS DOUBLE) * sxx - sx * sx) AS phi
        | FROM a)
        |SELECT user_id, n_pairs,
        | CASE WHEN den != 0.0 THEN round(phi, 6) END AS phi,
        | CASE WHEN den != 0.0 AND phi > 0 AND phi < 1
        |   THEN round(-ln(2.0) / ln(phi), 6) END AS half_life
        |FROM v""".stripMargin,
    "q214_perm_entropy" ->
      """WITH t AS (SELECT user_id, value AS a,
        |  lead(value, 1) OVER w AS b, lead(value, 2) OVER w AS c
        | FROM events WHERE value IS NOT NULL
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |f AS (SELECT user_id,
        |  CASE WHEN a <= b THEN 4 ELSE 0 END
        |   + CASE WHEN a <= c THEN 2 ELSE 0 END
        |   + CASE WHEN b <= c THEN 1 ELSE 0 END AS pat
        | FROM t WHERE b IS NOT NULL AND c IS NOT NULL),
        |g AS (SELECT user_id, pat, count(*) AS cg FROM f GROUP BY 1, 2),
        |h AS (SELECT user_id, pat, cg,
        |  CAST(sum(cg) OVER (PARTITION BY user_id) AS BIGINT) AS n FROM g),
        |e AS (SELECT user_id, n,
        |  CAST(-(CAST(cg AS DOUBLE) / n) * ln(CAST(cg AS DOUBLE) / n)
        |    AS DECIMAL(28,12)) AS term
        | FROM h)
        |SELECT user_id, max(n) AS n_triples, count(*) AS n_patterns,
        | round(CAST(sum(term) AS DOUBLE) / ln(6.0), 6) AS perm_entropy
        |FROM e GROUP BY 1""".stripMargin,
    "q218_basket_lift" ->
      """WITH b AS (SELECT DISTINCT user_id AS u, event_type AS i
        | FROM events),
        |t AS (SELECT count(DISTINCT u) AS n_users FROM b),
        |it AS (SELECT i, count(*) AS n FROM b GROUP BY 1),
        |p AS (SELECT a.i AS item_a, c.i AS item_b, count(*) AS n_ab
        | FROM b a JOIN b c ON a.u = c.u AND a.i < c.i GROUP BY 1, 2)
        |SELECT item_a, item_b, n_ab, ia.n AS n_a, ib.n AS n_b, t.n_users,
        | round(CAST(n_ab AS DOUBLE) / n_users, 6) AS support,
        | round(CAST(n_ab AS DOUBLE) / ia.n, 6) AS conf_a_b,
        | round(CAST(n_ab AS DOUBLE) / ib.n, 6) AS conf_b_a,
        | round(CAST(n_ab * n_users AS DOUBLE) /
        |   CAST(ia.n * ib.n AS DOUBLE), 6) AS lift
        |FROM p JOIN it ia ON ia.i = item_a JOIN it ib ON ib.i = item_b
        |CROSS JOIN t WHERE n_ab >= 1""".stripMargin,
    "q219_kpss" ->
      """WITH m AS (SELECT user_id,
        |  CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS sv,
        |  count(*) AS cn FROM events WHERE value IS NOT NULL GROUP BY 1),
        |e AS (SELECT ev.user_id, ev.ts, ev.event_id,
        |  ev.value - m.sv / m.cn AS e
        | FROM events ev JOIN m USING (user_id) WHERE ev.value IS NOT NULL),
        |s AS (SELECT user_id, ts, event_id, e,
        |  CAST(sum(CAST(e AS DECIMAL(28,10))) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS sc
        | FROM e),
        |l AS (SELECT user_id, e, sc,
        |  lag(e, 1) OVER w AS el1, lag(e, 2) OVER w AS el2,
        |  lag(e, 3) OVER w AS el3, lag(e, 4) OVER w AS el4
        | FROM s WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |a AS (SELECT user_id, count(*) AS n_obs,
        |  CAST(sum(CAST(sc * sc AS DECIMAL(28,10))) AS DOUBLE) AS ss2,
        |  CAST(sum(CAST(e * e AS DECIMAL(28,10))) AS DOUBLE) AS g0,
        |  CAST(sum(CAST(e * el1 AS DECIMAL(28,10))) AS DOUBLE) AS g1,
        |  CAST(sum(CAST(e * el2 AS DECIMAL(28,10))) AS DOUBLE) AS g2,
        |  CAST(sum(CAST(e * el3 AS DECIMAL(28,10))) AS DOUBLE) AS g3,
        |  CAST(sum(CAST(e * el4 AS DECIMAL(28,10))) AS DOUBLE) AS g4
        | FROM l GROUP BY 1),
        |v AS (SELECT user_id, n_obs, CAST(n_obs AS DOUBLE) AS n,
        |  ss2, g0, g1, g2, g3, g4 FROM a),
        |f AS (SELECT user_id, n_obs, ss2 / (n * n) AS eta,
        |  g0 / n + 2.0 * (1.0 - 1.0 / 5.0) * (g1 / n)
        |       + 2.0 * (1.0 - 2.0 / 5.0) * (g2 / n)
        |       + 2.0 * (1.0 - 3.0 / 5.0) * (g3 / n)
        |       + 2.0 * (1.0 - 4.0 / 5.0) * (g4 / n) AS lrv
        | FROM v)
        |SELECT user_id, n_obs,
        | CASE WHEN lrv > 0 THEN round(eta / lrv, 6) END AS kpss_stat
        |FROM f""".stripMargin,
    "q224_funnel_timing" ->
      """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |  JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1),
        |d1 AS (SELECT 'view->click' AS transition,
        |  date_diff('second', TIMESTAMP '1970-01-01', t2)
        |   - date_diff('second', TIMESTAMP '1970-01-01', t1) AS dt
        | FROM v JOIN c USING (user_id)),
        |d2 AS (SELECT 'click->purchase' AS transition,
        |  date_diff('second', TIMESTAMP '1970-01-01', t3)
        |   - date_diff('second', TIMESTAMP '1970-01-01', t2) AS dt
        | FROM c JOIN p USING (user_id)),
        |u2 AS (SELECT * FROM d1 UNION ALL SELECT * FROM d2)
        |SELECT transition, count(*) AS n_converted,
        | round(CAST(sum(dt) AS DOUBLE) / count(*), 6) AS mean_seconds,
        | round(quantile_cont(dt, 0.5), 6) AS median_seconds,
        | round(quantile_cont(dt, 0.9), 6) AS p90_seconds
        |FROM u2 GROUP BY 1""".stripMargin,
    "q230_ewm_vol" -> {
      // the SAME Scala doubles the operator interpolates into its fold
      val alpha = 1 - 0.94
      val a = s"CAST($alpha AS DOUBLE)"
      val b = s"CAST(${1 - alpha} AS DOUBLE)"
      s"""WITH r AS (SELECT user_id, event_id, ts,
         |  value - lag(value, 1) OVER w AS ret FROM events
         |  WHERE value IS NOT NULL
         | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |p AS (SELECT user_id,
         |  list(event_id ORDER BY ts, event_id) AS ids,
         |  list(ret * ret ORDER BY ts, event_id) AS xs
         | FROM r WHERE ret IS NOT NULL GROUP BY 1),
         |i AS (SELECT user_id, unnest(range(1, len(xs) + 1)) AS rn,
         |  ids, xs FROM p),
         |e AS (SELECT user_id, ids[rn] AS event_id, xs[rn] AS sq_ret,
         |  floor(list_reduce(xs[1:rn], (acc, x) -> $b * acc + $a * x)
         |    * 1000000.0 + 0.5) / 1000000.0 AS ewm_var
         | FROM i)
         |SELECT user_id, event_id, sq_ret, ewm_var,
         | floor(sqrt(ewm_var) * 1000000.0 + 0.5) / 1000000.0 AS ewm_vol
         |FROM e""".stripMargin
    },
    "q231_market_beta" ->
      """WITH b AS (SELECT user_id, date_trunc('hour', ts) AS bar, value
        | FROM events WHERE value IS NOT NULL),
        |u AS (SELECT user_id, bar,
        |  CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE)
        |    / count(value) AS uv FROM b GROUP BY 1, 2),
        |m AS (SELECT bar,
        |  CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE)
        |    / count(value) AS mv FROM b GROUP BY 1),
        |ur AS (SELECT user_id, bar,
        |  uv - lag(uv, 1) OVER (PARTITION BY user_id ORDER BY bar) AS urr
        | FROM u),
        |mr AS (SELECT bar, mv - lag(mv, 1) OVER (ORDER BY bar) AS mrr
        | FROM m),
        |j AS (SELECT ur.user_id, ur.urr, mr.mrr FROM ur JOIN mr USING (bar)
        | WHERE ur.urr IS NOT NULL AND mr.mrr IS NOT NULL),
        |a AS (SELECT user_id, count(*) AS n_obs,
        |  CAST(sum(CAST(urr AS DECIMAL(28,10))) AS DOUBLE) AS sy,
        |  CAST(sum(CAST(mrr AS DECIMAL(28,10))) AS DOUBLE) AS sx,
        |  CAST(sum(CAST(mrr * mrr AS DECIMAL(28,10))) AS DOUBLE) AS sxx,
        |  CAST(sum(CAST(urr * urr AS DECIMAL(28,10))) AS DOUBLE) AS syy,
        |  CAST(sum(CAST(mrr * urr AS DECIMAL(28,10))) AS DOUBLE) AS sxy
        | FROM j GROUP BY 1),
        |v AS (SELECT user_id, n_obs, sy, sx, sxx, syy, sxy,
        |  CAST(n_obs AS DOUBLE) AS n,
        |  CAST(n_obs AS DOUBLE) * sxx - sx * sx AS den,
        |  CAST(n_obs AS DOUBLE) * syy - sy * sy AS vy,
        |  (CAST(n_obs AS DOUBLE) * sxy - sx * sy) /
        |    (CAST(n_obs AS DOUBLE) * sxx - sx * sx) AS beta
        | FROM a)
        |SELECT user_id, n_obs,
        | CASE WHEN den != 0.0 THEN round(beta, 6) END AS beta,
        | CASE WHEN den != 0.0 AND n > 0
        |   THEN round((sy - beta * sx) / n, 6) END AS alpha,
        | CASE WHEN den > 0 AND vy > 0
        |   THEN round((n * sxy - sx * sy) / sqrt(den * vy), 6) END AS corr
        |FROM v""".stripMargin,
    "q232_bh_fdr" ->
      """WITH base AS (SELECT user_id, ts, event_id, value FROM events
        | WHERE value IS NOT NULL),
        |r AS (SELECT user_id,
        |  2 * rank() OVER (PARTITION BY user_id ORDER BY value)
        |   + count(*) OVER (PARTITION BY user_id, value) - 1 AS r2,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    AS t,
        |  count(*) OVER (PARTITION BY user_id) AS n
        | FROM base),
        |uu AS (SELECT user_id, t, n,
        |  CAST(sum(r2) OVER (PARTITION BY user_id ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |   - t * (n + 1) AS u
        | FROM r),
        |w2 AS (SELECT user_id, t, n, abs(u) AS absu FROM uu WHERE t < n),
        |k AS (SELECT user_id, max(n) AS n_obs, max(absu) AS k_stat
        | FROM w2 GROUP BY 1),
        |d AS (SELECT user_id,
        |  round(2.0 * exp(-6.0 * CAST(k_stat AS DOUBLE)
        |    * CAST(k_stat AS DOUBLE) /
        |    (CAST(n_obs AS DOUBLE) * CAST(n_obs AS DOUBLE)
        |      * CAST(n_obs AS DOUBLE)
        |     + CAST(n_obs AS DOUBLE) * CAST(n_obs AS DOUBLE))), 6)
        |    AS p_approx
        | FROM k),
        |mm AS (SELECT count(*) AS m FROM d WHERE p_approx IS NOT NULL),
        |r3 AS (SELECT user_id, p_approx,
        |  row_number() OVER (ORDER BY p_approx) AS i FROM d
        | WHERE p_approx IS NOT NULL),
        |th AS (SELECT max(p_approx) AS thresh FROM r3 CROSS JOIN mm
        | WHERE p_approx <= CAST(i AS DOUBLE) * 0.05 / CAST(m AS DOUBLE))
        |SELECT d.user_id, d.p_approx,
        | CASE WHEN d.p_approx IS NOT NULL
        |  THEN th.thresh IS NOT NULL AND d.p_approx <= th.thresh
        |  ELSE FALSE END AS significant,
        | th.thresh AS bh_threshold
        |FROM d CROSS JOIN th""".stripMargin,
    // day-of-week parity: Spark Sunday=1..7, DuckDB Sunday=0..6 → +1
    "q242_chi2" ->
      """WITH base AS (SELECT event_type AS a,
        |  CAST(dayofweek(ts) + 1 AS INT) AS b FROM events
        | WHERE event_type IS NOT NULL AND ts IS NOT NULL),
        |cells AS (SELECT a, b, count(*) AS o FROM base GROUP BY 1, 2),
        |m AS (SELECT a, b, o,
        |  CAST(sum(o) OVER (PARTITION BY a) AS BIGINT) AS ra,
        |  CAST(sum(o) OVER (PARTITION BY b) AS BIGINT) AS cb,
        |  CAST(sum(o) OVER () AS BIGINT) AS n FROM cells),
        |t AS (SELECT a, b, o, n,
        |  CAST(ra * cb AS DOUBLE) / CAST(n AS DOUBLE) AS e FROM m),
        |t2 AS (SELECT n, a, b,
        |  CAST(((CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e)) / e
        |    AS DECIMAL(28,12)) AS term FROM t),
        |g AS (SELECT max(n) AS n, count(DISTINCT a) AS r,
        |  count(DISTINCT b) AS c, CAST(sum(term) AS DOUBLE) AS chi2r
        | FROM t2)
        |SELECT n, r, c, (r - 1) * (c - 1) AS dof, round(chi2r, 6) AS chi2,
        | CASE WHEN n > 0 AND CAST(least(r, c) AS DOUBLE) - 1.0 > 0
        |  THEN round(sqrt(chi2r / (CAST(n AS DOUBLE)
        |    * (CAST(least(r, c) AS DOUBLE) - 1.0))), 6) END AS cramers_v
        |FROM g""".stripMargin,
    "q243_cuped" ->
      """WITH base AS (SELECT event_id, value AS y,
        |  CAST(json_extract(props, '$.k') AS DOUBLE) AS x FROM events
        | WHERE value IS NOT NULL
        |   AND CAST(json_extract(props, '$.k') AS DOUBLE) IS NOT NULL),
        |m AS (SELECT count(*) AS nn,
        |  CAST(sum(CAST(x AS DECIMAL(28,10))) AS DOUBLE) AS sx,
        |  CAST(sum(CAST(y AS DECIMAL(28,10))) AS DOUBLE) AS sy,
        |  CAST(sum(CAST(x * x AS DECIMAL(28,10))) AS DOUBLE) AS sxx,
        |  CAST(sum(CAST(x * y AS DECIMAL(28,10))) AS DOUBLE) AS sxy
        | FROM base),
        |v AS (SELECT nn, sx, sy, sxx, sxy,
        |  CAST(nn AS DOUBLE) * sxx - sx * sx AS vx,
        |  (CAST(nn AS DOUBLE) * sxy - sx * sy)
        |    / (CAST(nn AS DOUBLE) * sxx - sx * sx) AS theta,
        |  sx / CAST(nn AS DOUBLE) AS xbar FROM m)
        |SELECT b.event_id, b.y, b.x,
        | CASE WHEN vx != 0.0 THEN round(theta, 6) END AS theta,
        | CASE WHEN vx != 0.0 THEN round(b.y - theta * (b.x - xbar), 6)
        |  ELSE b.y END AS y_adj
        |FROM base b CROSS JOIN v""".stripMargin,
    "q239_hill" ->
      """WITH t AS (SELECT event_type, value,
        |  row_number() OVER (PARTITION BY event_type ORDER BY value DESC)
        |    AS rn
        | FROM events WHERE value IS NOT NULL AND value > 0),
        |f AS (SELECT event_type, value, rn FROM t WHERE rn <= 51),
        |a AS (SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(CASE WHEN rn <= 50 THEN ln(value) END
        |    AS DECIMAL(28,10))) AS DOUBLE) AS slog,
        |  max(CASE WHEN rn = 51 THEN value END) AS xk1
        | FROM f GROUP BY 1)
        |SELECT event_type, n AS n_top,
        | CASE WHEN n = 51 AND xk1 > 0 AND slog - 50.0 * ln(xk1) > 0
        |  THEN round(50.0 / (slog - 50.0 * ln(xk1)), 6) END AS hill_alpha
        |FROM a""".stripMargin,
    "q240_trimmed_mean" ->
      """WITH f AS (SELECT event_type,
        |  quantile_cont(value, 0.05) AS lo, quantile_cont(value, 0.95) AS hi
        | FROM events GROUP BY 1)
        |SELECT e.event_type, count(*) AS n_kept,
        | round(CAST(sum(CAST(e.value AS DECIMAL(28,10))) AS DOUBLE)
        |   / count(*), 6) AS trimmed_mean
        |FROM events e JOIN f USING (event_type)
        |WHERE e.value IS NOT NULL AND e.value >= f.lo AND e.value <= f.hi
        |GROUP BY 1""".stripMargin,
    "q241_ab_test" ->
      """WITH u AS (SELECT user_id,
        |  max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |    AS converted
        | FROM events GROUP BY 1),
        |g AS (SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END
        |    AS grp, converted FROM u),
        |a AS (SELECT count(CASE WHEN grp = 'A' THEN 1 END) AS n1,
        |  count(CASE WHEN grp = 'B' THEN 1 END) AS n2,
        |  CAST(sum(CASE WHEN grp = 'A' THEN converted ELSE 0 END)
        |    AS BIGINT) AS s1,
        |  CAST(sum(CASE WHEN grp = 'B' THEN converted ELSE 0 END)
        |    AS BIGINT) AS s2
        | FROM g),
        |v AS (SELECT n1, n2, s1, s2,
        |  CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1d,
        |  CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS p2d,
        |  CAST(s1 + s2 AS DOUBLE)
        |    / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) AS pp
        | FROM a)
        |SELECT n1, n2, s1, s2,
        | round(p1d, 6) AS p1, round(p2d, 6) AS p2,
        | CASE WHEN n1 > 0 AND n2 > 0 AND
        |   sqrt(pp * (1.0 - pp) * (1.0 / CAST(n1 AS DOUBLE)
        |     + 1.0 / CAST(n2 AS DOUBLE))) > 0
        |  THEN round((p1d - p2d) / sqrt(pp * (1.0 - pp)
        |    * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE))), 6)
        | END AS z
        |FROM v""".stripMargin,
    "q235_lorenz" ->
      """WITH ut AS (SELECT event_type, user_id,
        |  CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS user_total
        | FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |pv AS (SELECT event_type, user_total AS v, count(*) AS c,
        |  sum(CAST(user_total AS DECIMAL(28,10))) AS m
        | FROM ut GROUP BY 1, 2),
        |cum AS (SELECT event_type, v, c, m,
        |  CAST(sum(c) OVER wc AS BIGINT) AS cc, sum(m) OVER wc AS cm,
        |  CAST(sum(c) OVER wk AS BIGINT) AS n, sum(m) OVER wk AS tm
        | FROM pv WINDOW wc AS (PARTITION BY event_type ORDER BY v
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  wk AS (PARTITION BY event_type)),
        |g AS (SELECT event_type, c, cc, cm, tm, dd,
        |  CAST(ceil(n * dd / 10) AS BIGINT) AS need FROM cum
        | CROSS JOIN (SELECT unnest(range(1, 11)) AS dd) x)
        |SELECT event_type, dd AS decile, cc AS n_rows_covered,
        | CASE WHEN CAST(tm AS DOUBLE) > 0
        |  THEN round(CAST(cm AS DOUBLE) / CAST(tm AS DOUBLE), 6)
        | END AS cum_share
        |FROM g WHERE cc >= need AND cc - c < need""".stripMargin,
    "q236_hhi" ->
      """WITH pe AS (SELECT event_type, user_id,
        |  sum(CAST(value AS DECIMAL(28,10))) AS m
        | FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT event_type, m,
        |  sum(m) OVER (PARTITION BY event_type) AS tm FROM pe),
        |s AS (SELECT event_type,
        |  CASE WHEN CAST(tm AS DOUBLE) > 0
        |   THEN CAST(m AS DOUBLE) / CAST(tm AS DOUBLE) END AS share
        | FROM t),
        |a AS (SELECT event_type, count(*) AS n_entities,
        |  CAST(sum(CAST(share * share AS DECIMAL(28,12))) AS DOUBLE) AS h
        | FROM s GROUP BY 1)
        |SELECT event_type, n_entities, round(h, 6) AS hhi,
        | CASE WHEN h > 0 THEN round(1.0 / h, 6) END AS effective_n
        |FROM a""".stripMargin,
    "q237_churn" ->
      """WITH pu AS (SELECT user_id, min(CAST(ts AS DATE)) AS f,
        |  max(CAST(ts AS DATE)) AS l FROM events GROUP BY 1),
        |r AS (SELECT max(CAST(ts AS DATE)) AS ref FROM events),
        |c AS (SELECT f,
        |  CASE WHEN date_diff('day', l, ref) > 7 THEN 1 ELSE 0 END AS ch
        | FROM pu CROSS JOIN r)
        |SELECT f AS cohort, count(*) AS n_users,
        | CAST(sum(ch) AS BIGINT) AS churned,
        | round(CAST(sum(ch) AS DOUBLE) / count(*), 6) AS churn_rate
        |FROM c GROUP BY 1""".stripMargin,
    "q238_stickiness" ->
      """WITH pb AS (SELECT DISTINCT
        |  CAST(date_trunc('day', ts) AS TIMESTAMP) AS b, user_id AS k
        | FROM events),
        |d1 AS (SELECT b AS bucket_ts, count(DISTINCT k) AS dau
        | FROM pb GROUP BY 1),
        |e30 AS (SELECT b + to_days(CAST(off AS INT)) AS bucket_ts, k
        | FROM pb CROSS JOIN (SELECT unnest(range(0, 30)) AS off) o),
        |d30 AS (SELECT bucket_ts, count(DISTINCT k) AS mau
        | FROM e30 GROUP BY 1)
        |SELECT bucket_ts, dau, mau,
        | round(CAST(dau AS DOUBLE) / mau, 6) AS stickiness
        |FROM d1 JOIN d30 USING (bucket_ts)""".stripMargin,
    "q233_weighted_median" ->
      """WITH base AS (SELECT l_returnflag AS g, l_extendedprice AS v,
        |  l_quantity AS w FROM lineitem
        | WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
        |   AND l_quantity > 0),
        |pv AS (SELECT g, v, sum(CAST(w AS DECIMAL(28,10))) AS wsum
        | FROM base GROUP BY 1, 2),
        |c AS (SELECT g, v,
        |  sum(wsum) OVER (PARTITION BY g ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
        |  sum(wsum) OVER (PARTITION BY g) AS tw FROM pv)
        |SELECT g AS l_returnflag, min(v) AS weighted_median,
        | CAST(max(tw) AS DOUBLE) AS total_weight
        |FROM c WHERE cw * 2 >= tw GROUP BY 1""".stripMargin,
    "q234_rolling_actives" ->
      """WITH pb AS (SELECT DISTINCT date_trunc('hour', ts) AS b,
        |  user_id AS k FROM events),
        |e AS (SELECT b + to_hours(off) AS bucket_ts, k FROM pb
        | CROSS JOIN (SELECT unnest(range(0, 24)) AS off) o)
        |SELECT bucket_ts, count(DISTINCT k) AS active_keys
        |FROM e GROUP BY 1""".stripMargin,
    "q229_event_ngrams" ->
      """WITH l AS (SELECT event_type AS e0,
        |  lead(event_type, 1) OVER w AS e1,
        |  lead(event_type, 2) OVER w AS e2
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT concat(e0, '>', e1, '>', e2) AS ngram,
        | count(*) AS n_occurrences
        |FROM l WHERE e0 IS NOT NULL AND e1 IS NOT NULL AND e2 IS NOT NULL
        |GROUP BY 1 ORDER BY n_occurrences DESC, ngram LIMIT 20""".stripMargin,
    "q227_coerce_ts" ->
      """SELECT event_id,
        | CASE WHEN event_id % 97 = 0
        |  THEN try_cast('not-a-time' AS TIMESTAMP)
        |  ELSE try_cast(strftime(ts, '%Y-%m-%d %H:%M:%S') AS TIMESTAMP)
        | END AS parsed_ts
        |FROM events""".stripMargin,
    "q122_drawdown" ->
      """SELECT user_id, event_id, value,
        | max(value) OVER w AS peak,
        | CASE WHEN max(value) OVER w > 0
        |   THEN round(value / max(value) OVER w - 1.0, 6) END AS drawdown
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,
    "q105_outlier_iqr" ->
      """WITH f AS (SELECT event_type,
        |  quantile_cont(value, 0.25) AS q1, quantile_cont(value, 0.75) AS q3
        | FROM events GROUP BY 1),
        |b AS (SELECT event_type, q1 - 1.5 * (q3 - q1) AS lo,
        |  q3 + 1.5 * (q3 - q1) AS hi FROM f)
        |SELECT event_id, event_type, value, lo, hi
        |FROM events JOIN b USING (event_type)
        |WHERE value < lo OR value > hi""".stripMargin,
    "q120_interval_overlap" ->
      """WITH f AS (SELECT user_id, event_type, ts,
        |  CASE WHEN date_diff('second',
        |      lag(ts) OVER (PARTITION BY user_id, event_type ORDER BY ts), ts) > 172800
        |    THEN 1 ELSE 0 END AS newf
        |  FROM events WHERE event_type IN ('view', 'click')),
        |wi AS (SELECT user_id, event_type, ts,
        |  sum(newf) OVER (PARTITION BY user_id, event_type ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM f),
        |s AS (SELECT user_id, event_type, sid, min(ts) AS st, max(ts) AS en
        |  FROM wi GROUP BY 1, 2, 3),
        |es AS (SELECT *, date_diff('second', TIMESTAMP '1970-01-01', st) AS sts,
        |  date_diff('second', TIMESTAMP '1970-01-01', en) AS ens FROM s)
        |SELECT a.user_id, a.st AS a_start, a.en AS a_end,
        |  b.st AS b_start, b.en AS b_end,
        |  least(a.ens, b.ens) - greatest(a.sts, b.sts) AS overlap_seconds
        |FROM es a JOIN es b ON a.user_id = b.user_id
        |  AND a.event_type = 'view' AND b.event_type = 'click'
        |  AND a.sts <= b.ens AND b.sts <= a.ens""".stripMargin,
    "q119_asof_forward" ->
      """WITH l AS (SELECT user_id, ts, event_id, value FROM events
        |  WHERE event_type = 'purchase'),
        |r AS (SELECT user_id, ts, value AS view_value FROM events
        |  WHERE event_type = 'view'),
        |u AS (
        |  SELECT user_id, ts, event_id, value,
        |    CAST(NULL AS STRUCT(rts TIMESTAMP, view_value DOUBLE)) AS pack,
        |    1 AS src FROM l
        |  UNION ALL
        |  SELECT user_id, ts, NULL, NULL,
        |    struct_pack(rts := ts, view_value := view_value), 2 FROM r),
        |c AS (SELECT user_id, ts, event_id, value, src,
        |  first_value(pack IGNORE NULLS) OVER w AS pack
        |  FROM u WINDOW w AS (PARTITION BY user_id ORDER BY ts, src
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
        |m AS (SELECT *, pack IS NOT NULL AND
        |    date_diff('second', ts, pack.rts) <= 7200 AS ok
        |  FROM c)
        |SELECT user_id, ts, event_id, value,
        |  CASE WHEN ok THEN pack.view_value END AS view_value,
        |  CASE WHEN ok THEN pack.rts END AS matched_ts
        |FROM m WHERE src = 1""".stripMargin,
    "q117_funnel" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |v AS (SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |  JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1)
        |SELECT u.user_id, t1, t2, t3,
        | CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
        |      WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS stage
        |FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
        |  LEFT JOIN p USING (user_id)""".stripMargin,
    "q118_retention" ->
      """WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort
        |  FROM events GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
        |SELECT cohort, date_diff('day', cohort, day) AS day_n,
        |  count(*) AS n_users
        |FROM a JOIN f USING (user_id) GROUP BY 1, 2""".stripMargin,
    "q138_top_share" ->
      """WITH b AS (SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(28,10))) OVER w AS DOUBLE) AS cum,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(28,10)))
        |    OVER (PARTITION BY l_returnflag) AS DOUBLE) AS tot
        | FROM lineitem
        | WINDOW w AS (PARTITION BY l_returnflag
        |   ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        | round(cum / tot, 6) AS cum_share
        |FROM b WHERE (cum - l_extendedprice) / tot < 0.5""".stripMargin,
    "q139_kfold" ->
      """WITH f AS (SELECT n_chars,
        |  ('0x' || substr(md5(doc_id || ':fold'), 1, 15))::BIGINT % 5 AS fold
        | FROM documents)
        |SELECT fold, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM f GROUP BY 1""".stripMargin,
    "q131_feature_scale" ->
      """WITH s AS (SELECT user_id, count(value) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS sx,
        |  CAST(sum(CAST(value * value AS DECIMAL(28,10))) AS DOUBLE) AS sxx,
        |  min(value) AS lo, max(value) AS hi
        | FROM events GROUP BY 1)
        |SELECT user_id, event_id, value,
        | CASE WHEN n > 1 AND (sxx - sx * sx / n) / (n - 1) > 0
        |   THEN round((value - sx / n) / sqrt((sxx - sx * sx / n) / (n - 1)), 6)
        | END AS zscore,
        | CASE WHEN hi > lo THEN round((value - lo) / (hi - lo), 6) END AS minmax
        |FROM events JOIN s USING (user_id)""".stripMargin,
    "q132_one_hot" ->
      """WITH cats AS (SELECT event_type,
        |  row_number() OVER (ORDER BY event_type) - 1 AS cat_index
        |  FROM (SELECT DISTINCT event_type FROM events)),
        |n AS (SELECT count(*) AS nc FROM cats)
        |SELECT event_id, event_type, cat_index,
        | array_to_string(list_transform(generate_series(1, nc),
        |   i -> CAST(CASE WHEN i = cat_index + 1 THEN 1 ELSE 0 END AS INT)), ',') AS onehot_str
        |FROM events JOIN cats USING (event_type) CROSS JOIN n""".stripMargin,
    "q135_twap" ->
      """WITH l AS (SELECT user_id, value,
        |  date_diff('second', TIMESTAMP '1970-01-01',
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts))
        |  - date_diff('second', TIMESTAMP '1970-01-01', ts) AS dt
        | FROM events)
        |SELECT user_id, CAST(sum(dt) AS BIGINT) AS span_seconds,
        | CASE WHEN sum(dt) > 0
        |   THEN round(CAST(sum(CAST(value * dt AS DECIMAL(28,10))) AS DOUBLE)
        |     / sum(dt), 6) END AS twap
        |FROM l WHERE dt IS NOT NULL GROUP BY 1""".stripMargin,
    "q136_ohlc_bars" ->
      """SELECT user_id, date_trunc('hour', ts) AS bar,
        | arg_min(value, ts) AS open, max(value) AS high, min(value) AS low,
        | arg_max(value, ts) AS close, count(*) AS n_ticks,
        | round(CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE) / count(*), 6)
        |   AS vwap_proxy
        |FROM events WHERE value IS NOT NULL GROUP BY 1, 2""".stripMargin,
    "q129_ols_per_key" ->
      """WITH e AS (SELECT user_id, value AS y,
        |  CAST(json_extract(props, '$.k') AS DOUBLE) AS x FROM events),
        |a AS (SELECT user_id,
        |  count(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN 1 END) AS n_obs,
        |  CAST(sum(CASE WHEN x IS NOT NULL AND y IS NOT NULL
        |    THEN CAST(x AS DECIMAL(28,10)) END) AS DOUBLE) AS sx,
        |  CAST(sum(CASE WHEN x IS NOT NULL AND y IS NOT NULL
        |    THEN CAST(y AS DECIMAL(28,10)) END) AS DOUBLE) AS sy,
        |  CAST(sum(CASE WHEN x IS NOT NULL AND y IS NOT NULL
        |    THEN CAST(x * x AS DECIMAL(28,10)) END) AS DOUBLE) AS sxx,
        |  CAST(sum(CASE WHEN x IS NOT NULL AND y IS NOT NULL
        |    THEN CAST(y * y AS DECIMAL(28,10)) END) AS DOUBLE) AS syy,
        |  CAST(sum(CASE WHEN x IS NOT NULL AND y IS NOT NULL
        |    THEN CAST(x * y AS DECIMAL(28,10)) END) AS DOUBLE) AS sxy
        | FROM e GROUP BY 1)
        |SELECT user_id, n_obs,
        | CASE WHEN n_obs * sxx - sx * sx > 0
        |   THEN round((n_obs * sxy - sx * sy) / (n_obs * sxx - sx * sx), 6) END AS slope,
        | CASE WHEN n_obs * sxx - sx * sx > 0
        |   THEN round((sy - (n_obs * sxy - sx * sy) / (n_obs * sxx - sx * sx) * sx)
        |     / n_obs, 6) END AS intercept,
        | CASE WHEN n_obs * sxx - sx * sx > 0 AND n_obs * syy - sy * sy > 0
        |   THEN round((n_obs * sxy - sx * sy) * (n_obs * sxy - sx * sy) /
        |     ((n_obs * sxx - sx * sx) * (n_obs * syy - sy * sy)), 6) END AS r2
        |FROM a""".stripMargin,
    "q130_entropy" ->
      """WITH c AS (SELECT user_id, event_type, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT user_id, event_type, c, sum(c) OVER (PARTITION BY user_id) AS n
        |  FROM c)
        |SELECT user_id, CAST(max(n) AS BIGINT) AS n_rows,
        | count(*) AS n_categories,
        | round(CAST(sum(CAST(-(c / n) * ln(c / n) AS DECIMAL(28,12))) AS DOUBLE), 6)
        |   AS entropy_nats
        |FROM t GROUP BY 1""".stripMargin,
    "q124_column_stats" ->
      """SELECT 'event_id' AS col_name, count(*) AS n_rows,
        |  CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        |  count(DISTINCT event_id) AS ndv FROM events
        |UNION ALL SELECT 'ts', count(*),
        |  CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT ts) FROM events
        |UNION ALL SELECT 'user_id', count(*),
        |  CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT user_id) FROM events
        |UNION ALL SELECT 'event_type', count(*),
        |  CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT event_type) FROM events
        |UNION ALL SELECT 'value', count(*),
        |  CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT value) FROM events
        |UNION ALL SELECT 'props', count(*),
        |  CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT props) FROM events""".stripMargin,
    "q123_equidepth" ->
      """WITH q AS (SELECT quantile_cont(value,
        |  [0.0, 0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875, 1.0]) AS e
        | FROM events)
        |SELECT CAST(i - 1 AS BIGINT) AS bin, e[CAST(i AS BIGINT)] AS lo,
        |  e[CAST(i + 1 AS BIGINT)] AS hi
        |FROM q, unnest(generate_series(1, 8)) AS t(i)""".stripMargin,
    "q111_mad_outliers" ->
      """WITH m AS (SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY 1),
        |a AS (SELECT event_type, quantile_cont(abs(value - med), 0.5) AS mad
        |  FROM events JOIN m USING (event_type) GROUP BY 1),
        |j AS (SELECT event_id, event_type, value, (value - med) / mad AS rz
        |  FROM events JOIN m USING (event_type) JOIN a USING (event_type)
        |  WHERE mad > 0)
        |SELECT event_id, event_type, value, round(rz, 6) AS robust_z
        |FROM j WHERE abs(rz) > 4.0""".stripMargin,
    "q109_agg_merge" ->
      """SELECT event_type, count(value) AS n,
        | CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
        | min(value) AS min_value, max(value) AS max_value,
        | CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(value) AS avg_value
        |FROM events GROUP BY 1""".stripMargin,
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
      "SELECT user_id, count(*) AS n FROM events GROUP BY 1 HAVING count(*) >= 60",
    "q82_drop_allnull_cols" ->
      """SELECT n_nationkey, n_name, n_regionkey,
        | CASE WHEN n_nationkey % 5 = 0 THEN n_regionkey END AS sparse
        |FROM nation""".stripMargin,
    "q49_rollup" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q55_cube" ->
      """SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY CUBE (event_type, CAST(ts AS DATE))""".stripMargin,
    "q156_interpolate" ->
      """WITH src AS (SELECT user_id, ts, event_id,
        |    CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
        |  FROM events),
        |p AS (SELECT *,
        |  last_value(CASE WHEN v IS NOT NULL
        |      THEN struct_pack(t := ts, x := v) END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |  first_value(CASE WHEN v IS NOT NULL
        |      THEN struct_pack(t := ts, x := v) END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv
        |  FROM src)
        |SELECT user_id, event_id, v,
        |  round(CASE WHEN v IS NOT NULL THEN v
        |    WHEN pv IS NOT NULL AND nv IS NOT NULL AND pv.t <> nv.t THEN
        |      pv.x + (nv.x - pv.x)
        |        * (CAST(epoch_us(ts) AS DOUBLE) / CAST(1000000 AS DOUBLE)
        |          - CAST(epoch_us(pv.t) AS DOUBLE) / CAST(1000000 AS DOUBLE))
        |        / (CAST(epoch_us(nv.t) AS DOUBLE) / CAST(1000000 AS DOUBLE)
        |          - CAST(epoch_us(pv.t) AS DOUBLE) / CAST(1000000 AS DOUBLE))
        |    WHEN pv IS NOT NULL THEN pv.x
        |    WHEN nv IS NOT NULL THEN nv.x END, 6) AS v_lerp
        |FROM p""".stripMargin,
    "q153_rolling_median" ->
      """WITH f AS (SELECT user_id, event_id, value,
        |    list(CAST(value AS DOUBLE)) OVER (PARTITION BY user_id
        |      ORDER BY ts ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS fr
        |  FROM events),
        |s AS (SELECT user_id, event_id, value, list_sort(fr) AS sf,
        |    len(fr) AS m FROM f)
        |SELECT user_id, event_id, value,
        |  round(CASE WHEN m % 2 = 1 THEN sf[m // 2 + 1]
        |    ELSE (sf[m // 2] + sf[m // 2 + 1]) / 2 END, 6) AS rolling_median
        |FROM s""".stripMargin,
    "q144_ema" ->
      """WITH p AS (SELECT user_id, list(value ORDER BY ts) AS xs
        |  FROM events WHERE value IS NOT NULL GROUP BY 1)
        |SELECT user_id, CAST(len(xs) AS BIGINT) AS n_obs,
        |  round(list_reduce(list_transform(xs, x -> CAST(x AS DOUBLE)),
        |    (acc, x) -> CAST(0.75 AS DOUBLE) * acc + CAST(0.25 AS DOUBLE) * x),
        |    6) AS ema
        |FROM p""".stripMargin,
    "q42b_granger_f" ->
      """WITH base AS (
        |  SELECT 's' || (range % 4) AS sym, range // 4 + 1 AS t,
        |    CAST(((range // 4 + 1) * 7 + (range % 4) * 3) % 19 AS DOUBLE) AS x,
        |    CAST(((range // 4) * 7 + (range % 4) * 3) % 19 * 2
        |         + (range // 4 + 1) % 5 AS DOUBLE) AS y
        |  FROM range(10000)),
        |lagged AS (
        |  SELECT sym, y,
        |    lag(y) OVER (PARTITION BY sym ORDER BY t) AS a,
        |    lag(x) OVER (PARTITION BY sym ORDER BY t) AS b
        |  FROM base),
        |m AS (
        |  SELECT sym, count(*) AS n,
        |    sum(y) AS sy, sum(a) AS sa, sum(b) AS sb,
        |    sum(y*y) AS syy, sum(a*a) AS saa, sum(b*b) AS sbb,
        |    sum(y*a) AS sya, sum(y*b) AS syb, sum(a*b) AS sab
        |  FROM lagged WHERE a IS NOT NULL AND b IS NOT NULL GROUP BY sym),
        |c AS (
        |  SELECT sym, n,
        |    syy - sy*sy/n AS cyy, saa - sa*sa/n AS caa, sbb - sb*sb/n AS cbb,
        |    sya - sy*sa/n AS cya, syb - sy*sb/n AS cyb, sab - sa*sb/n AS cab
        |  FROM m),
        |f AS (
        |  SELECT sym, n, cyy - cya*cya/caa AS rssr,
        |    cyy - ((cya*cbb - cyb*cab) * cya + (cyb*caa - cya*cab) * cyb)
        |          / (caa*cbb - cab*cab) AS rssu
        |  FROM c)
        |SELECT sym AS symbol, 'x' AS predictor, 1 AS lag,
        |  floor((rssr - rssu) / (rssu / (n - 3)) * 100 + 0.5) / 100 AS f_stat,
        |  CAST(n AS BIGINT) AS n_obs
        |FROM f""".stripMargin,
    "q157_ema_series" ->
      """WITH p AS (SELECT user_id,
        |    list(event_id ORDER BY ts) AS ids,
        |    list(CAST(value AS DOUBLE) ORDER BY ts) AS xs
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |i AS (SELECT user_id, unnest(range(1, len(xs) + 1)) AS rn, ids, xs
        |  FROM p)
        |SELECT user_id, ids[rn] AS event_id, xs[rn] AS value,
        |  floor(list_reduce(xs[1:rn],
        |    (acc, x) -> CAST(0.75 AS DOUBLE) * acc + CAST(0.25 AS DOUBLE) * x)
        |    * 1000000.0 + 0.5) / 1000000.0 AS ema
        |FROM i""".stripMargin,
    "q145_winsorize" ->
      """WITH b AS (SELECT event_type,
        |    quantile_cont(value, 0.05) AS lo,
        |    quantile_cont(value, 0.95) AS hi
        |  FROM events WHERE value IS NOT NULL GROUP BY 1)
        |SELECT e.event_type, e.event_id, e.value, b.lo, b.hi,
        |  least(greatest(CAST(e.value AS DOUBLE), b.lo), b.hi) AS value_w
        |FROM events e JOIN b USING (event_type)
        |WHERE e.value IS NOT NULL""".stripMargin,
    // hybrid check: exact columns value-checked; the sketch columns arrive
    // as in-bound flags the oracle expects to be TRUE
    "q52_approx_stats" ->
      """SELECT event_type,
        | count(DISTINCT user_id) AS exact_users,
        | quantile_cont(value, 0.5) AS exact_median,
        | TRUE AS approx_users_ok,
        | TRUE AS approx_median_ok
        |FROM events GROUP BY 1""".stripMargin,
    "q51_percentiles" ->
      """SELECT l_returnflag,
        | quantile_cont(l_quantity, 0.25) AS p25,
        | quantile_cont(l_quantity, 0.5) AS p50,
        | quantile_cont(l_quantity, 0.75) AS p75,
        | quantile_cont(l_extendedprice, 0.9) AS price_p90
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q50_rolling_mean" ->
      """SELECT user_id, event_id,
        | CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) / count(value) OVER w
        |   AS rolling_mean_2h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY date_diff('second', TIMESTAMP '1970-01-01', ts)
        |  RANGE BETWEEN 7200 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q44_asof_join" ->
      """WITH l AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'),
        |r AS (SELECT user_id, ts, value AS view_value, ts AS view_ts FROM events WHERE event_type = 'view'),
        |u AS (
        |  SELECT user_id, ts, event_id, value, CAST(NULL AS DOUBLE) AS view_value,
        |    CAST(NULL AS TIMESTAMP) AS view_ts, 1 AS src FROM l
        |  UNION ALL
        |  SELECT user_id, ts, NULL, NULL, view_value, view_ts, 0 FROM r),
        |c AS (SELECT user_id, ts, event_id, value,
        |  last_value(view_value IGNORE NULLS) OVER w AS view_value,
        |  last_value(view_ts IGNORE NULLS) OVER w AS view_ts, src
        |  FROM u WINDOW w AS (PARTITION BY user_id ORDER BY ts, src
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT user_id, ts, event_id, value, view_value, view_ts FROM c WHERE src = 1""".stripMargin,
    "q45_session_window" ->
      """WITH f AS (SELECT user_id, ts, value,
        |  CASE WHEN date_diff('second', lag(ts) OVER (PARTITION BY user_id ORDER BY ts), ts) > 1800
        |    THEN 1 ELSE 0 END AS newf
        |  FROM events),
        |wi AS (SELECT user_id, ts, value,
        |  CAST(sum(newf) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM f)
        |SELECT user_id, session_id, min(ts) AS session_start, max(ts) AS session_end,
        | count(*) AS n_events,
        | CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM wi GROUP BY 1, 2""".stripMargin)
}
