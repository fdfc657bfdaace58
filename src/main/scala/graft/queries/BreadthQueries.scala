package graft.queries

import graft.Tables
import graft.ops.{Relational => R}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational-breadth queries beyond the reference's own surface (SURVEY.md
  * §2.4/§2.7 "absent" list): grouping sets, unpivot, interval/range join,
  * full ranking-function battery, INTERSECT/EXCEPT, full outer join,
  * FILTER-style conditional aggregation, ordered string aggregation,
  * explicit window frames, exact median / mode, correlated scalar subquery,
  * and mixed DISTINCT aggregates (Expand-based plan).
  *
  * A user of the reference never writes these, but an engine claiming the
  * same *capabilities* on 100 TB needs them; each is oracle-checked against
  * DuckDB and uses exact decimal/integer aggregation where double sums
  * would be order-dependent across engines.
  */
object BreadthQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Nation-level trade graph: an undirected edge between a customer's
    * nation and a supplier's nation whenever a line item connects them —
    * the entity graph the triangle/clustering/modularity queries share. */
  private def tradeEdges(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .select(col("c_nationkey").as("x"), col("s_nationkey").as("y"))

  /** Part co-purchase graph: an undirected edge between two parts that
    * appear in the same order at least `minCount` times. The self-join
    * fans out per order by the order's line count — bounded by the data
    * model (≤ 7 lines in TPC-H-shaped data), so candidate pairs stay
    * linear in the lineitem count at any scale. */
  private def coPurchaseEdges(s: SparkSession, d: String,
                              minCount: Int = 2): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    li.select(col("ok"), col("pk").as("lo"))
      .join(li.select(col("ok"), col("pk").as("hi")), "ok")
      .filter(col("lo") < col("hi"))
      .groupBy("lo", "hi").agg(count(lit(1)).as("_c"))
      .filter(col("_c") >= minCount)
      .select("lo", "hi")
  }

  val queries: Map[String, Q] = Map(
    // ── GROUPING SETS ((type, hr), (type), ()) — finer than rollup/cube
    //    (q49/q55); gid computed from grouping() bits so the encoding is
    //    engine-agnostic.
    "q56_grouping_sets" -> ((s, d) => {
      val e = Tables.events(s, d).withColumn("hr", hour(col("ts")))
      e.groupingSets(
          Seq(Seq(col("event_type"), col("hr")), Seq(col("event_type")), Seq()),
          col("event_type"), col("hr"))
        .agg(
          (grouping(col("event_type")) * 2 + grouping(col("hr"))).as("gid"),
          count(lit(1)).as("n"),
          R.exactSum(col("value")).as("sum_v"))
        .select("event_type", "hr", "gid", "n", "sum_v")
    }),

    // ── UNPIVOT / melt: wide lineitem measures → long (metric, val)
    "q57_unpivot" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") % 100 === 0)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "metric", "val")),

    // ── interval/range join: per error event, activity by the same user in
    //    the following hour. Equi-key on user_id keeps it a hash/SMJ join
    //    (the range is a residual predicate) — no cross product at scale.
    "q58_range_join" -> ((s, d) => {
      val e = Tables.events(s, d)
      val err = e.filter(col("event_type") === "error")
        .select(col("user_id").as("u"), col("ts").as("err_ts"), col("event_id").as("err_id"))
      err.join(e,
          col("u") === col("user_id") &&
            col("ts") > col("err_ts") &&
            col("ts") <= col("err_ts") + expr("INTERVAL 1 HOUR"), "left")
        .groupBy(col("err_id"))
        .agg(count(col("event_id")).as("n_after"),
          R.exactSum(col("value")).as("sum_after"))
    }),

    // ── ranking battery: rank / dense_rank / ntile / percent_rank /
    //    cume_dist (reference uses only row_number — SURVEY §2.5 note)
    "q59_ranking" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("value").desc, col("event_id"))
      Tables.events(s, d)
        .filter(col("value").isNotNull)
        .select(col("user_id"), col("event_id"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("prnk"),
          cume_dist().over(w).as("cd"))
    }),

    // ── INTERSECT / EXCEPT (set ops absent from reference, §2.7)
    "q60_intersect_except" -> ((s, d) => {
      val e = Tables.events(s, d)
      def users(t: String) = e.filter(col("event_type") === t).select("user_id").distinct()
      users("click").intersect(users("purchase")).withColumn("segment", lit("click_and_buy"))
        .unionByName(
          users("click").except(users("purchase")).withColumn("segment", lit("click_only")))
    }),

    // ── FULL OUTER join of two per-user aggregates
    "q61_full_outer" -> ((s, d) => {
      val e = Tables.events(s, d)
      val clicks = e.filter(col("event_type") === "click").groupBy(col("user_id").as("cu"))
        .agg(count(lit(1)).as("n_clicks"))
      val buys = e.filter(col("event_type") === "purchase").groupBy(col("user_id").as("bu"))
        .agg(count(lit(1)).as("n_buys"))
      clicks.join(buys, col("cu") === col("bu"), "full_outer")
        .select(coalesce(col("cu"), col("bu")).as("user_id"),
          coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
          coalesce(col("n_buys"), lit(0L)).as("n_buys"))
    }),

    // ── conditional aggregation (FILTER-clause semantics via count_if /
    //    null-skipping when()): one pass, no self-joins
    "q62_conditional_agg" -> ((s, d) =>
      Tables.events(s, d).groupBy(col("user_id"))
        .agg(
          count_if(col("event_type") === "click").as("n_click"),
          count_if(col("event_type") === "error").as("n_error"),
          R.exactSum(when(col("event_type") === "purchase", col("value"))).as("purchase_v"),
          R.exactAvg(when(col("event_type") === "view", col("value"))).as("avg_view_v"))),

    // ── ordered string aggregation (deterministic: sorted distinct set)
    "q63_string_agg" -> ((s, d) =>
      Tables.events(s, d).groupBy(col("user_id"))
        .agg(array_join(array_sort(collect_set(col("event_type"))), ",").as("types"))),

    // ── explicit window frames: running first, whole-partition last/nth,
    //    sliding 3-row min/max (frame specs beyond the reference's defaults)
    "q64_window_frames" -> ((s, d) => {
      val ord = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val slide = ord.rowsBetween(-2, Window.currentRow)
      Tables.events(s, d).select(col("user_id"), col("event_id"),
        first(col("value")).over(run).as("first_v"),
        last(col("value")).over(full).as("last_v"),
        nth_value(col("value"), 3).over(full).as("third_v"),
        min(col("value")).over(slide).as("min3"),
        max(col("value")).over(slide).as("max3"))
    }),

    // ── exact median (interpolated) + deterministic mode of a discretized
    //    key (smallest value wins ties)
    "q65_median_mode" -> ((s, d) => {
      val e = Tables.events(s, d).withColumn("k", col("user_id") % 50)
      val counts = e.groupBy(col("event_type"), col("k")).agg(count(lit(1)).as("n"))
      val mode = counts.withColumn("rn",
          row_number().over(Window.partitionBy(col("event_type"))
            .orderBy(col("n").desc, col("k"))))
        .filter(col("rn") === 1).select(col("event_type"), col("k").as("mode_k"))
      val median = Tables.events(s, d).groupBy(col("event_type"))
        .agg(expr("percentile(value, 0.5)").as("median_v"))
      median.join(mode, Seq("event_type"))
    }),

    // ── correlated scalar subquery: orders 50% above their customer's
    //    exact mean (SQL surface; Catalyst rewrites to an aggregate+join).
    //    Per-invocation unique view name: a session-global name would race
    //    when two invocations with different data dirs interleave.
    "q66_corr_subquery" -> ((s, d) => {
      val v = s"orders_v_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      Tables.orders(s, d).createOrReplaceTempView(v)
      s.sql(
        s"""SELECT o_orderkey, o_custkey, o_totalprice FROM $v o
           |WHERE o_totalprice > 1.5 * (
           |  SELECT CAST(avg(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
           |  FROM $v o2 WHERE o2.o_custkey = o.o_custkey)""".stripMargin)
    }),

    // ── mixed DISTINCT + plain aggregates in one pass (Expand-based plan)
    "q67_distinct_agg" -> ((s, d) =>
      Tables.events(s, d).groupBy(col("event_type"))
        .agg(
          countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n"),
          R.exactSum(col("value")).as("sum_v"))),

    // ── JSON extraction from a string payload column (the semi-structured
    //    ingest shape): parse per row, aggregate per type
    "q93_json_extract" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))),

    // ── Z-order (Morton) clustering key over (custkey, order day): the
    //    bit-interleave that makes parquet min/max prune BOTH dimensions
    //    when files are written in z order (ops.Layout; LayoutSpec proves
    //    the locality). Pure integer bit ops — exactly portable.
    "q91_zorder_key" -> ((s, d) => {
      val days = datediff(col("o_orderdate"), to_date(lit("1995-01-01"))).cast("long")
      Tables.orders(s, d).select(col("o_orderkey"),
        graft.ops.Layout.zValue2(col("o_custkey"), days, 16).as("zval"))
    }),

    // ── SCD-1 MERGE (CDC upsert): deterministic change batch derived from
    //    the base — updates (%10=3, price +10), deletes (%10=7), inserts
    //    (%10=1 cloned to new keys); latest version per key wins
    "q97_merge_upsert" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val updates = o.filter(col("o_orderkey") % 10 === 3)
        .withColumn("o_orderstatus", lit("U"))
        .withColumn("o_totalprice", col("o_totalprice") + lit(10.0))
        .withColumn("_op", lit("U")).withColumn("_v", lit(1L))
      val deletes = o.filter(col("o_orderkey") % 10 === 7)
        .withColumn("_op", lit("D")).withColumn("_v", lit(1L))
      val inserts = o.filter(col("o_orderkey") % 10 === 1)
        .withColumn("o_orderkey", col("o_orderkey") + lit(100000000L))
        .withColumn("_op", lit("I")).withColumn("_v", lit(1L))
      graft.ops.Merge.upsert(o,
        updates.unionByName(deletes).unionByName(inserts),
        "o_orderkey", "_v", "_op")
    }),

    // ── SCD-2 history build: per-user change log → validity intervals
    "q98_scd2" -> ((s, d) =>
      graft.ops.Merge.scd2(
        Tables.events(s, d).select("user_id", "ts", "event_type", "value"),
        "user_id", "ts")),

    // ── snapshot diff: recover the change log between two snapshot
    //    versions (adds %10=1 under new keys, deletes %10=7, price bump
    //    %10=3) — the inverse of the q97 upsert
    "q110_snapshot_diff" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val next = o.filter(col("o_orderkey") % 10 =!= 7)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 10 === 3, col("o_totalprice") + 10.0)
            .otherwise(col("o_totalprice")))
        .unionByName(o.filter(col("o_orderkey") % 10 === 1)
          .withColumn("o_orderkey", col("o_orderkey") + 100000000L))
      graft.ops.Merge.snapshotDiff(o, next, "o_orderkey",
        Seq("o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
          "o_orderpriority"))
    }),

    // ── two-phase salted aggregation: result must equal the plain
    //    groupBy (oracle computes it directly) — hot-key spreading is a
    //    pure plan change, never a semantics change
    "q127_salted_agg" -> ((s, d) =>
      graft.ops.Skew.saltedAggregate(
        Tables.events(s, d).withColumn("_v",
          col("value").cast(graft.ops.Relational.ExactDec)),
        Seq("event_type"), salt = 16,
        partials = Seq((count(lit(1)), "n"), (sum(col("_v")), "sum_v"),
          (min(col("value")), "min_v"), (max(col("value")), "max_v")),
        merges = Seq((c => sum(col(c)), "n"),
          (c => sum(col(c)), "sum_v"),
          (c => min(col(c)), "min_v"),
          (c => max(col(c)), "max_v")))
        .withColumn("sum_v", col("sum_v").cast("double"))),

    // ── count-min sketch frequency estimates (Cormode-Muthukrishnan):
    //    portable md5 hashes, so the oracle rebuilds the IDENTICAL sketch —
    //    estimates value-checked, plus the one-sided-error guarantee
    //    (est ≥ exact, always) checked as a flag
    "q142_countmin" -> ((s, d) => {
      val e = Tables.events(s, d)
      val est = graft.ops.Stats.countMinEstimates(e, "user_id")
      val exact = e.groupBy(col("user_id").cast("string").as("key"))
        .agg(count(lit(1)).as("exact_n"))
      exact.join(est, "key")
        .select(col("key"), col("exact_n"), col("cm_est"),
          (col("cm_est") >= col("exact_n")).as("no_underestimate"))
    }),

    // ── Bloom-filter decontamination probe: portable-hash bit-set built
    //    over the "eval" key set, every corpus key probed against it — the
    //    whole filter is engine-reproducible, so the oracle rebuilds the
    //    IDENTICAL bits and the no-false-negative guarantee checks as a flag
    "q159_bloom_probe" -> ((s, d) => {
      val e = Tables.events(s, d)
      val evalSet = e.filter(col("user_id") < 30)
        .select(col("user_id").cast("string").as("key"))
      val bits = graft.ops.Stats.bloomBits(evalSet, "key", m = 1024, k = 3)
      val cands = e.select(col("user_id").cast("string").as("key")).distinct()
      graft.ops.Stats.bloomProbe(bits, cands, "key", m = 1024, k = 3)
        .join(evalSet.distinct().withColumn("_in", lit(1)), Seq("key"), "left")
        .select(col("key"), col("maybe_present"),
          coalesce(col("_in"), lit(0)).as("exact_present"))
        .withColumn("no_false_negative",
          col("maybe_present") >= col("exact_present"))
    }),

    // ── weighted sampling without replacement (Efraimidis-Spirakis A-Res):
    //    priority u^(1/w) from the salted portable hash, top-50 per event
    //    type — quality-weighted curation picks, reproducible cross-engine
    "q160_weighted_sample" -> ((s, d) =>
      graft.text.Mix.weightedSample(
        Tables.events(s, d).filter(col("value") > 0)
          .select(col("event_id"), col("event_type"), col("value")),
        "event_id", "value", "event_type", n = 50)),

    // ── blocked edit-distance join (entity resolution): equi-join on
    //    (p_brand, p_size) blocks, exact Levenshtein ≤ 4 within blocks —
    //    pair space Σ|block|², never n²
    "q154_fuzzy_blocked" -> ((s, d) =>
      graft.ops.Relational.fuzzyJoinBlocked(
        Tables.part(s, d).select("p_partkey", "p_name", "p_brand", "p_size"),
        "p_partkey", "p_name", Seq("p_brand", "p_size"), maxDist = 4)),

    // ── quantile normalization: map per-source score ranks onto the global
    //    distribution (cross-source calibration before one global filter)
    "q150_quantile_norm" -> ((s, d) =>
      graft.ops.Stats.quantileNormalize(
        Tables.events(s, d).filter(col("value").isNotNull)
          .select("event_id", "event_type", "value"),
        "value", "event_type", Seq(col("event_id")))),

    // ── linear-counting distinct estimate (portable occupancy sketch —
    //    the estimate itself is oracle-reproducible, unlike HLL)
    "q148_linear_count" -> ((s, d) => {
      val e = Tables.events(s, d)
      val lc = graft.ops.Stats.linearCountDistinct(e, "user_id", Seq("event_type"))
      val ex = e.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact_distinct"))
      ex.join(lc, Seq("event_type"))
        .withColumn("rel_err", round(
          abs(col("lc_est") - col("exact_distinct")) / col("exact_distinct"), 6))
    }),

    // ── join-size estimation from two count-min sketches (the CM/AMS
    //    inner-product bound an optimizer uses to size a join from KB of
    //    state): est ≥ exact always, both value-checked
    "q146_join_estimate" -> ((s, d) => {
      val e = Tables.events(s, d)
      val est = graft.ops.Stats.cmJoinSize(e, e, "user_id")
      val exact = e.groupBy("user_id").agg(count(lit(1)).as("n"))
        .agg(sum(col("n") * col("n")).as("exact_join_size"))
      est.crossJoin(broadcast(exact))
        .select(col("exact_join_size"), col("est_join_size"),
          (col("est_join_size") >= col("exact_join_size")).as("no_underestimate"))
    }),

    // ── skew-safe salted equi-join: hot probe keys split across 8 salt
    //    buckets, build side replicated 8× — result ≡ the plain join (the
    //    oracle runs the unsalted join)
    "q143_salted_join" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity")
      val o = Tables.orders(s, d)
        .select(col("o_orderkey").as("l_orderkey"), col("o_custkey"),
          col("o_orderdate"))
      graft.ops.Relational.saltedJoin(li, o, Seq("l_orderkey"),
        saltFrom = col("l_linenumber"), nSalts = 8)
    }),

    // ── SQL surface: TPC-H Q5 (local-supplier volume) verbatim in both
    //    engines — a 6-table join chain Catalyst must broadcast/reorder
    "q128_sql_tpch_q5" -> ((s, d) => {
      Seq("region", "nation", "customer", "supplier", "orders", "lineitem")
        .foreach(t => Tables.t(s, d, t).createOrReplaceTempView(t))
      s.sql(TpchQ5Sql)
    }),

    // ── file-level scan statistics: rows per physical file (the
    //    small-file report that drives `Layout.compact`; at 100 TB this is
    //    the table-maintenance health metric)
    "q140_file_stats" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(regexp_extract(input_file_name(), "([^/]+)$", 1).as("file"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("l_orderkey")).as("n_orders"))),

    // ── SQL surface: TPC-H Q6 (forecast revenue change) verbatim — the
    //    pure scan-filter-aggregate shape where pushdown is everything
    "q133_sql_tpch_q6" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql(TpchQ6Sql)
    }),

    // ── datetime-function battery: calendar fields, truncation, month
    //    arithmetic (clamping), day/epoch differences
    "q125_datetime_battery" -> ((s, d) =>
      Tables.events(s, d).select(col("event_id"),
        year(col("ts")).as("y"),
        quarter(col("ts")).as("qr"),
        month(col("ts")).as("mo"),
        dayofmonth(col("ts")).as("dom"),
        dayofweek(col("ts")).as("dow"),
        dayofyear(col("ts")).as("doy"),
        weekofyear(col("ts")).as("wk"),
        hour(col("ts")).as("hh"),
        minute(col("ts")).as("mi"),
        second(col("ts")).as("ss"),
        trunc(col("ts"), "month").as("mstart"),
        last_day(col("ts")).as("ldom"),
        add_months(to_date(col("ts")), 2).as("plus2m"),
        datediff(to_date(col("ts")), lit("2024-01-01")).as("d_since"),
        col("ts").cast("long").as("epoch_s"))),

    // ── string-function battery: padding, repetition, translation,
    //    reversal, char codes, slicing, search, edit distance
    "q126_string_battery" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_custkey"),
        lpad(col("c_name"), 25, "*").as("lp"),
        rpad(col("c_name"), 25, "-").as("rp"),
        repeat(substring(col("c_name"), 1, 2), 3).as("rep"),
        translate(col("c_name"), "Customer", "KUSTOMER").as("tr"),
        reverse(col("c_name")).as("rev"),
        ascii(col("c_name")).as("asc"),
        expr("chr(65 + c_custkey % 26)").as("ch"),
        expr("left(c_name, 3)").as("lft"),
        expr("right(c_name, 3)").as("rgt"),
        instr(col("c_name"), "0").as("ins"),
        levenshtein(col("c_name"), lit("Customer#000000000")).as("lev"),
        col("c_name").contains("00").as("has00"))),

    // ── array-function battery (the collection surface a training pipeline
    //    lives on): distinct/sort/slice/join, position, element_at(-1),
    //    filter/transform/aggregate HOFs, contains, set intersection —
    //    all codegen'd per-row, no shuffle
    "q114_array_battery" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("_w", split(trim(col("text")), "\\s+"))
        .select(col("doc_id"),
          size(col("_w")).cast("long").as("n_toks"),
          size(array_distinct(col("_w"))).cast("long").as("n_distinct"),
          array_position(col("_w"), "the").as("pos_the"),
          array_join(slice(array_sort(array_distinct(col("_w"))), 1, 3), ",")
            .as("head3"),
          element_at(col("_w"), -1).as("last_tok"),
          size(filter(col("_w"), t => length(t) > 3)).cast("long").as("n_long"),
          aggregate(col("_w"), lit(0L), (a, t) => a + length(t)).as("total_chars"),
          array_contains(col("_w"), "data").as("has_data"),
          size(array_distinct(array_intersect(col("_w"),
            array(lit("the"), lit("a"), lit("of"), lit("data")))))
            .cast("long").as("n_common"))),

    // ── HyperLogLog distinct estimate per group — completes the sketch
    //    family (count-min q142, linear-count q148, bloom q159): portable
    //    md5-derived registers, integer-exact indicator sum, so the oracle
    //    rebuilds the WHOLE estimate bit-for-bit; exact distinct alongside
    "q161_hll_distinct" -> ((s, d) => {
      val e = Tables.events(s, d)
      val est = graft.ops.Stats.hllEstimate(
        e.select(col("event_type"), col("user_id").cast("string").as("key")),
        "key", Seq("event_type"))
      e.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_distinct"))
        .join(est, "event_type")
        .select(col("event_type"), col("exact_distinct"), col("hll_est"))
    }),

    // ── PageRank, 3 power iterations with dangling-mass redistribution,
    //    over the two-hop customer→nation→region containment graph: rank
    //    flows customer→nation on iteration 1 and reaches regions by
    //    iteration 2, and regions are pure sinks, so both the multi-hop
    //    propagation AND the dangling path are genuinely exercised — the
    //    catalog's first iterative graph-rank plan: one shuffle/iteration
    "q162_pagerank" -> ((s, d) => {
      val edges = Tables.customer(s, d).select(
          concat(lit("c"), col("c_custkey").cast("string")).as("src"),
          concat(lit("n"), col("c_nationkey").cast("string")).as("dst"))
        .union(Tables.nation(s, d).select(
          concat(lit("n"), col("n_nationkey").cast("string")).as("src"),
          concat(lit("r"), col("n_regionkey").cast("string")).as("dst")))
      val nodes = edges.select(col("src").as("id"))
        .union(edges.select(col("dst").as("id")))
      graft.analytics.Graph.pageRank(edges, "src", "dst", nodes, "id",
        iters = 3)
    }),

    // ── personalized PageRank on the q162 geo tree, restarting at the
    //    region roots: mass concentrates around the seeds instead of
    //    spreading uniformly — the seed-expansion relatedness measure
    "q276_ppr" -> ((s, d) => {
      val edges = Tables.customer(s, d).select(
          concat(lit("c"), col("c_custkey").cast("string")).as("src"),
          concat(lit("n"), col("c_nationkey").cast("string")).as("dst"))
        .union(Tables.nation(s, d).select(
          concat(lit("n"), col("n_nationkey").cast("string")).as("src"),
          concat(lit("r"), col("n_regionkey").cast("string")).as("dst")))
      val nodes = edges.select(col("src").as("id"))
        .union(edges.select(col("dst").as("id")))
      graft.analytics.Graph.pageRankPersonalized(edges, "src", "dst",
        nodes, "id", seeds = nodes.filter(col("id").startsWith("r")),
        iters = 3)
    }),

    // ── HITS hubs/authorities over the supplier→part supply graph from
    //    line items (suppliers hub-score parts, parts authority-score
    //    suppliers — the bipartite duality PageRank can't separate):
    //    3 alternating L1-normalized power iterations, DECIMAL-exact
    //    cross-row sums → CTE-for-CTE oracle replay
    "q286_hits" -> ((s, d) => {
      val edges = Tables.lineitem(s, d).select(
        concat(lit("s"), col("l_suppkey").cast("string")).as("src"),
        concat(lit("p"), col("l_partkey").cast("string")).as("dst"))
      graft.analytics.Graph.hits(edges, "src", "dst", iters = 3)
    }),

    // ── per-node triangle counts on the nation trade graph (edges =
    //    customer-nation ↔ supplier-nation pairs observed on line items)
    "q220_triangles" -> ((s, d) =>
      graft.analytics.Graph.triangles(tradeEdges(s, d), "x", "y")),

    // ── 3-CORE of the co-purchase graph (parts sharing an order ≥ 2
    //    times): iterative peel to fixpoint — the dense backbone the
    //    "frequently bought together" features come from
    "q269_kcore" -> ((s, d) =>
      graft.analytics.Graph.kCore(coPurchaseEdges(s, d), "lo", "hi", k = 3)),

    // ── connected components of the co-purchase graph (alternating
    //    star contraction; min-id labels) — the explicit CC operator the
    //    dedup-cluster family builds on
    "q309_connected_components" -> ((s, d) =>
      graft.analytics.Graph.connectedComponents(
        coPurchaseEdges(s, d), "lo", "hi")),

    // ── degree assortativity of the full co-purchase graph (Newman 2002):
    //    do heavily-co-purchased parts pair with each other or with the
    //    long tail?
    "q270_assortativity" -> ((s, d) =>
      graft.analytics.Graph.assortativity(
        coPurchaseEdges(s, d, minCount = 1), "lo", "hi")),

    // ── 3-TRUSS of the co-purchase graph: every surviving edge must sit
    //    in a triangle of survivors — the community backbone (bridges
    //    peel first), one level sharper than the q269 core
    "q275_ktruss" -> ((s, d) =>
      graft.analytics.Graph.kTruss(coPurchaseEdges(s, d), "lo", "hi", k = 3)),

    // ── BFS hop distance from region roots down the reversed geo tree
    "q221_bfs_hops" -> ((s, d) => {
      val edges = Tables.nation(s, d).select(
          concat(lit("r"), col("n_regionkey").cast("string")).as("src"),
          concat(lit("n"), col("n_nationkey").cast("string")).as("dst"))
        .union(Tables.customer(s, d).select(
          concat(lit("n"), col("c_nationkey").cast("string")).as("src"),
          concat(lit("c"), col("c_custkey").cast("string")).as("dst")))
      val sources = Tables.region(s, d).select(
        concat(lit("r"), col("r_regionkey").cast("string")).as("id"))
      graft.analytics.Graph.bfsHops(edges, "src", "dst", sources, "id",
        maxHops = 3)
    }),

    // ── local clustering coefficient per nation on the trade graph
    "q222_clustering" -> ((s, d) =>
      graft.analytics.Graph.clusteringCoeff(tradeEdges(s, d), "x", "y")),

    // ── modularity of the region partition over the trade graph
    "q223_modularity" -> ((s, d) =>
      graft.analytics.Graph.modularity(tradeEdges(s, d), "x", "y",
        Tables.nation(s, d), "n_nationkey", "n_regionkey")),

    // ── Louvain community DETECTION (3 synchronized sweeps, integer-exact
    //    gains) on the bipartite customer↔supplier purchase graph — where
    //    q223 scores a given partition, this finds one (market segments).
    //    The nation trade graph is near-complete (any split has negative
    //    Q, so everything correctly collapses to one community); the
    //    customer-supplier graph is sparse and genuinely clustered. Node
    //    encoding: customer c → 2c, supplier s → 2s+1 (disjoint integer
    //    id spaces, so the monotone label order is well-defined). The
    //    oracle replays every sweep move-for-move.
    "q245_louvain" -> ((s, d) => {
      val edges = Tables.lineitem(s, d)
        .filter(col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("cu"),
          (col("l_suppkey") * 2 + 1).as("su"))
      graft.analytics.Graph.louvain(edges, "cu", "su", rounds = 3)
    }),

    // ── synchronous label propagation (min-label deterministic variant,
    //    4 rounds) on the purchase graph — the parameter-free community
    //    baseline; the oracle replays every round's argmax
    "q290_lpa" -> ((s, d) => {
      val edges = Tables.lineitem(s, d)
        .filter(col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("cu"),
          (col("l_suppkey") * 2 + 1).as("su"))
      graft.analytics.Graph.labelPropagation(edges, "cu", "su", rounds = 4)
    }),

    // ── TPC-H Q17 shape (small-quantity revenue for a brand/size slice):
    //    the dimension filter broadcast onto the fact scan; the correlated
    //    per-part average joins back WITHOUT a forced broadcast — avgq is
    //    bounded by the brand/size slice at sf0.1 but grows linearly with
    //    SF, so AQE picks the join strategy (it still broadcasts when the
    //    runtime size is small, and degrades to a shuffled join at scale
    //    instead of OOMing the driver)
    "q297_tpch_q17" -> ((s, d) => {
      val p = Tables.part(s, d)
        .filter(col("p_brand") === "Brand#4" && col("p_size") <= 10)
        .select("p_partkey")
      val base = Tables.lineitem(s, d)
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      val avgq = base.groupBy("l_partkey")
        .agg((sum(col("l_quantity").cast("decimal(28,6)")).cast("double") /
          count(lit(1))).as("_avg"))
      base.join(avgq, "l_partkey")
        .filter(col("l_quantity") < col("_avg") / lit(5.0))
        .agg(count(lit(1)).as("n_rows"),
          round(sum(col("l_extendedprice").cast("decimal(28,6)"))
            .cast("double") / lit(7.0), 6).as("avg_yearly"))
    }),

    // ── HIERARCHICAL (two-level) Louvain: phase-1 sweep → coarsen to the
    //    weighted community graph (self-loops = internal mass) → weighted
    //    phase-1 on the coarse graph — Blondel et al.'s full recursion,
    //    one level of it, every move replayed by the oracle across BOTH
    //    levels including the coarsening
    "q247_louvain_l2" -> ((s, d) => {
      val g = graft.analytics.Graph
      // the edge frame feeds level 1 AND the coarsening join — lazy
      // localCheckpoint so the lineitem scan + order join runs once and
      // the blocks free with the plan (a persist here would stay
      // CacheManager-pinned for the session with no unpersist point)
      val edges = Tables.lineitem(s, d)
        .filter(col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("cu"),
          (col("l_suppkey") * 2 + 1).as("su"))
        .transform(graft.ops.Checkpoint.cut(_, eager = false))
      val l1 = g.louvain(edges, "cu", "su", rounds = 2)
      val cg = g.communityGraph(edges, "cu", "su", l1, "id", "community")
      val l2 = g.louvainWeighted(cg, "ca", "cb", "weight", rounds = 2)
      l1.select(col("id"), col("community").as("community_l1"))
        .join(l2.select(col("id").as("community_l1"),
          col("community").as("community_l2")), "community_l1")
        .select("id", "community_l1", "community_l2")
    }),

    // ── AUTO-LEVEL Louvain (full Blondel recursion): sweep → coarsen →
    //    sweep until a sweep stops moving nodes (the fixpoint rule;
    //    ≤ 3 levels) — the oracle replays every sweep move-for-move AND
    //    the stopping gates themselves
    "q258_louvain_hier" -> ((s, d) => {
      val edges = Tables.lineitem(s, d)
        .filter(col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("cu"),
          (col("l_suppkey") * 2 + 1).as("su"))
      graft.analytics.Graph.louvainHierarchy(edges, "cu", "su",
        maxLevels = 3, rounds = 2)
    }),

    // ── SNAPSHOT DIFF: classify keys as added/removed/changed between two
    //    table versions, naming the columns that differ (the incremental-
    //    pipeline "what changed since yesterday's load" primitive; one
    //    co-partitioned full outer join, unchanged rows dropped)
    "q261_snapshot_diff" -> ((s, d) => {
      val orders = Tables.orders(s, d)
      val oldSnap = orders.filter(col("o_orderkey") % 13 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 11 === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")))
      val newSnap = orders.filter(col("o_orderkey") % 17 =!= 0)
      graft.ops.Relational.snapshotDiff(oldSnap, newSnap, Seq("o_orderkey"))
    }),

    // ── KMV distinct-count sketch estimate vs exact, per event type
    "q225_kmv_distinct" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val exact = ev.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact_distinct"))
      graft.ops.Stats.kmvEstimate(ev, "user_id", Seq("event_type"), k = 64)
        .join(exact, Seq("event_type"))
    }),

    // ── KMV sketch Jaccard between the view and purchase user sets
    "q226_kmv_jaccard" -> ((s, d) => {
      val ev = Tables.events(s, d)
      def sk(label: String, out: String) =
        graft.ops.Stats.kmvSketch(ev.filter(col("event_type") === label),
          "user_id", Nil, k = 64)
          .select(col("kmv").as(out))
      sk("view", "a").crossJoin(sk("purchase", "b"))
        .select(graft.ops.Stats.kmvJaccardExpr(col("a"), col("b"), 64)
          .as("j"))
        .select(col("j.jaccard").as("jaccard"),
          col("j.inter_est").as("inter_est"),
          col("j.union_est").as("union_est"))
    }),

    // ── leave-one-out target encoding with a smoothing prior: the
    //    high-cardinality categorical feature without target leakage
    "q163_target_encode" -> ((s, d) =>
      graft.ops.Stats.targetEncode(
        Tables.events(s, d).filter(col("value").isNotNull)
          .select("event_id", "event_type", "value"),
        "event_type", "value")
        .select("event_id", "event_type", "value", "value_te")),

    // ── EXACT per-group median by two-pass histogram narrowing (no global
    //    sort; pass 2 touches ~n/bins rows) — oracle is DuckDB's exact
    //    median, so the narrowing is proven correct, not approximate
    "q164_median_twopass" -> ((s, d) =>
      graft.ops.Stats.exactMedianTwoPass(
        Tables.events(s, d).filter(col("value").isNotNull)
          .select("event_type", "value"),
        "value", Seq("event_type"))),

    // ── inverted index with gap-encoded postings (df-capped): the
    //    retrieval storage layout; gaps stringified for the cross-engine
    //    compare, RetrievalSpec round-trips the decode
    "q165_inverted_index" -> ((s, d) =>
      graft.text.Retrieval.invertedIndex(
        Tables.documents(s, d), "doc_id", "text", minDf = 5, maxDf = 400)
        .withColumn("gaps", array_join(col("gaps"), ","))),

    // ── seasonal-naive decomposition + residual z-score anomaly flags
    //    (portable epoch-day dow so both engines agree on the slot)
    "q166_seasonal_anomaly" -> ((s, d) =>
      graft.ops.TimeSeriesOps.seasonalDecompose(
        Tables.events(s, d).select("event_id", "ts", "event_type", "value"),
        "ts", "value", Seq("event_type"))
        .select("event_id", "event_type", "seasonal", "residual", "z",
          "is_anomaly")))

  /** TPC-H Q5 shape (local-supplier volume) — runs verbatim in both Spark
    * SQL and DuckDB, like q46's Q3. */
  private val TpchQ5Sql =
    """SELECT n_name,
      | CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** TPC-H Q6 shape — scan-filter-aggregate, runs verbatim in both engines. */
  private val TpchQ6Sql =
    """SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
      | count(*) AS n
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  /** Shared CTE chain for the trade-graph oracles: canonical undirected
    * nation edge set + degree frame (mirrors `tradeEdges` → the operators'
    * internal canonicalization). */
  private val TradeCtes =
    """tr AS (SELECT c.c_nationkey AS x, s.s_nationkey AS y
      | FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      | JOIN customer c ON o.o_custkey = c.c_custkey
      | JOIN supplier s ON l.l_suppkey = s.s_suppkey),
      |und AS (SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b
      | FROM tr WHERE least(x, y) != greatest(x, y)),
      |deg AS (SELECT id, CAST(count(*) AS BIGINT) AS deg FROM
      | (SELECT a AS id FROM und UNION ALL SELECT b AS id FROM und)
      | GROUP BY 1)""".stripMargin

  /** Generated DuckDB oracle pieces for q245/q247: replay every
    * synchronized Louvain sweep move-for-move over a WEIGHTED canonical
    * edge CTE `und(a, b, w)` (w ≡ 1 reproduces the unweighted level; the
    * level-2 run feeds the coarsened graph with self-loops). All
    * quantities (strengths, community strength sums, node→community edge
    * weights, the 2W²-scaled gain) are integers, so the argmax + tie-break
    * order is EXACT cross-engine — one CTE block per round mirrors
    * `Graph.louvainCore`'s join/aggregate shape, including the monotone
    * smaller-label move restriction. `p` prefixes every CTE name so two
    * levels coexist in one statement. */
  private def louvainBaseCtes(p: String, und: String): String =
    s"""${p}sym AS MATERIALIZED (SELECT a AS v, b AS u, w FROM $und WHERE a != b
       | UNION ALL SELECT b AS v, a AS u, w FROM $und WHERE a != b),
       |${p}deg AS MATERIALIZED (SELECT v AS id, CAST(sum(w) AS BIGINT) AS deg FROM
       | (SELECT v, w FROM ${p}sym
       |  UNION ALL SELECT a AS v, 2*w AS w FROM $und WHERE a = b)
       | GROUP BY 1),
       |${p}tot AS (SELECT CAST(sum(w) AS BIGINT) AS m FROM $und),
       |${p}lab0 AS MATERIALIZED (SELECT id AS v, id AS c FROM ${p}deg)""".stripMargin

  private def louvainRoundCtes(p: String, rounds: Int): String =
    (1 to rounds).map { r =>
      val prev = s"${p}lab${r - 1}"
      s"""${p}ct$r AS (SELECT l.c, CAST(sum(d.deg) AS BIGINT) AS ctot
         | FROM $prev l JOIN ${p}deg d ON d.id = l.v GROUP BY 1),
         |${p}nb$r AS (SELECT s.v, l.c AS cand, CAST(sum(s.w) AS BIGINT) AS kvc
         | FROM ${p}sym s JOIN $prev l ON l.v = s.u GROUP BY 1, 2),
         |${p}cd$r AS (SELECT v, cand, CAST(sum(kvc) AS BIGINT) AS kvc FROM (
         |  SELECT v, cand, kvc FROM ${p}nb$r
         |  UNION ALL SELECT v, c AS cand, 0 AS kvc FROM $prev) GROUP BY 1, 2),
         |${p}g$r AS (SELECT cd.v, cd.cand, lb.c,
         |  2*t.m*cd.kvc - d.deg*(ca.ctot -
         |    CASE WHEN cd.cand = lb.c THEN d.deg ELSE 0 END) AS g
         | FROM ${p}cd$r cd JOIN $prev lb ON lb.v = cd.v
         | JOIN ${p}deg d ON d.id = cd.v
         | JOIN ${p}ct$r ca ON ca.c = cd.cand
         | CROSS JOIN ${p}tot t
         | WHERE cd.cand <= lb.c),
         |${p}lab$r AS MATERIALIZED (SELECT v, cand AS c FROM (
         |  SELECT v, cand, row_number() OVER (PARTITION BY v ORDER BY g DESC,
         |    CASE WHEN cand = c THEN 0 ELSE 1 END, cand) AS rn FROM ${p}g$r)
         | WHERE rn = 1)""".stripMargin
    }.mkString(",\n")

  /** The bipartite customer↔supplier purchase graph as a canonical
    * unit-weight edge CTE (node encoding c → 2c, s → 2s+1). */
  private val PurchaseUndCtes =
    """bi AS (SELECT o.o_custkey * 2 AS x, l.l_suppkey * 2 + 1 AS y
      | FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      | WHERE l.l_shipdate < TIMESTAMP '1996-01-01'),
      |und AS MATERIALIZED (SELECT a, b, 1 AS w FROM (
      | SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b
      | FROM bi WHERE least(x, y) != greatest(x, y)))""".stripMargin

  /** Label-propagation oracle: round CTEs replaying the synchronous
    * most-frequent-neighbor-label argmax (ties to the smaller label) —
    * the same replay idiom as the Louvain round CTEs. */
  private def lpaOracleSql(rounds: Int): String = {
    val roundCtes = (1 to rounds).map { r =>
      s"""lc$r AS (SELECT s.v, l.c AS cand, count(*) AS n
         | FROM lsym s JOIN lp${r - 1} l ON l.v = s.u GROUP BY 1, 2),
         |lp$r AS MATERIALIZED (SELECT v, cand AS c FROM (
         |  SELECT v, cand, row_number() OVER (PARTITION BY v
         |    ORDER BY n DESC, cand) AS rn FROM lc$r) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH $PurchaseUndCtes,
       |lsym AS MATERIALIZED (SELECT a AS v, b AS u FROM und
       | UNION ALL SELECT b AS v, a AS u FROM und),
       |lp0 AS (SELECT DISTINCT v, v AS c FROM lsym),
       |$roundCtes,
       |sz AS (SELECT c, CAST(count(*) AS BIGINT) AS community_size
       | FROM lp$rounds GROUP BY 1)
       |SELECT l.v AS id, l.c AS community, sz.community_size
       |FROM lp$rounds l JOIN sz USING (c)""".stripMargin
  }

  private def louvainOracleSql(rounds: Int): String =
    s"""WITH $PurchaseUndCtes,
       |${louvainBaseCtes("", "und")},
       |${louvainRoundCtes("", rounds)},
       |sz AS (SELECT c, CAST(count(*) AS BIGINT) AS community_size
       | FROM lab$rounds GROUP BY 1)
       |SELECT l.v AS id, l.c AS community, sz.community_size
       |FROM lab$rounds l JOIN sz USING (c)""".stripMargin

  /** Two-level Louvain oracle: level-1 sweep, coarsen (weights = collapsed
    * multiplicities, intra-community edges → self-loops), weighted level-2
    * sweep, then map every node to its level-2 community. */
  /** Auto-level Louvain oracle (q258): up to `maxLevels` sweep+coarsen
    * blocks, each gated by the EXACT stopping test the Scala side drives
    * its recursion with — "did this level's sweep move any coarse node"
    * (count of labels with v ≠ c, an integer both engines replay
    * identically; see `Graph.louvainHierarchy`'s scaladoc for why the
    * fixpoint rule, not a floating modularity comparison, is the faithful
    * Blondel stop under synchronized sweeps). Level 1 is unconditional;
    * level ℓ ≥ 2 rows appear iff every sweep 2..ℓ moved something — the
    * oracle computes every level's CTEs regardless (collapsed graphs are
    * tiny) and lets the WHERE chain discard post-fixpoint levels, which
    * replays the driver loop's break exactly. */
  private def louvainHierOracleSql(maxLevels: Int, rounds: Int): String = {
    val prefixes = Seq("", "y", "z", "u", "x").take(maxLevels)
    def undName(i: Int) = if (i == 1) "und" else s"cg$i"
    val blocks = (1 to maxLevels).map { i =>
      val p = prefixes(i - 1)
      val coarsen = if (i == 1) "" else {
        val pp = prefixes(i - 2)
        s"""cg$i AS MATERIALIZED (SELECT least(la.c, lb.c) AS a,
           |  greatest(la.c, lb.c) AS b, CAST(sum(u.w) AS BIGINT) AS w
           | FROM ${undName(i - 1)} u
           | JOIN ${pp}lab$rounds la ON la.v = u.a
           | JOIN ${pp}lab$rounds lb ON lb.v = u.b GROUP BY 1, 2),
           |""".stripMargin
      }
      coarsen +
        s"""${louvainBaseCtes(p, undName(i))},
           |${louvainRoundCtes(p, rounds)},
           |mv$i AS (SELECT count(*) AS n FROM ${p}lab$rounds WHERE v != c)""".stripMargin
    }.mkString(",\n")
    def gate(i: Int): String =
      (2 to i).map(j => s"(SELECT n FROM mv$j) > 0").mkString(" AND ")
    val selects = (1 to maxLevels).map { i =>
      val joins = (2 to i).map { j =>
        s"JOIN ${prefixes(j - 1)}lab$rounds l$j ON l$j.v = l${j - 1}.c"
      }.mkString(" ")
      val where = if (i == 1) "" else s" WHERE ${gate(i)}"
      s"""SELECT l1.v AS id, $i AS level, l$i.c AS community
         |FROM lab$rounds l1 $joins$where""".stripMargin
    }
    s"""WITH $PurchaseUndCtes,
       |$blocks
       |${selects.mkString("\nUNION ALL\n")}""".stripMargin
  }

  private def louvain2OracleSql(r1: Int, r2: Int): String =
    s"""WITH $PurchaseUndCtes,
       |${louvainBaseCtes("", "und")},
       |${louvainRoundCtes("", r1)},
       |cg AS MATERIALIZED (SELECT least(la.c, lb.c) AS a, greatest(la.c, lb.c) AS b,
       |  CAST(sum(u.w) AS BIGINT) AS w
       | FROM und u JOIN lab$r1 la ON la.v = u.a
       | JOIN lab$r1 lb ON lb.v = u.b GROUP BY 1, 2),
       |${louvainBaseCtes("y", "cg")},
       |${louvainRoundCtes("y", r2)}
       |SELECT l1.v AS id, l1.c AS community_l1, l2.c AS community_l2
       |FROM lab$r1 l1 JOIN ylab$r2 l2 ON l2.v = l1.c""".stripMargin

  private val TriangleCtes =
    s"""$TradeCtes,
       |wd AS (SELECT und.a, und.b, da.deg AS da, db.deg AS db FROM und
       | JOIN deg da ON da.id = und.a JOIN deg db ON db.id = und.b),
       |ori AS (SELECT
       |  CASE WHEN da < db OR (da = db AND a < b) THEN a ELSE b END AS u,
       |  CASE WHEN da < db OR (da = db AND a < b) THEN b ELSE a END AS v
       | FROM wd),
       |twedge AS (SELECT e1.u AS u, e1.v AS v1, e2.v AS v2 FROM ori e1
       | JOIN ori e2 ON e1.u = e2.u AND e1.v < e2.v
       | JOIN ori cl ON cl.u = e1.v AND cl.v = e2.v),
       |tri AS (SELECT id, count(*) AS triangles FROM (
       | SELECT u AS id FROM twedge UNION ALL SELECT v1 AS id FROM twedge
       | UNION ALL SELECT v2 AS id FROM twedge) GROUP BY 1)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q225_kmv_distinct" ->
      """WITH h AS (SELECT DISTINCT event_type,
        |  ('0x' || substr(md5(user_id::VARCHAR || ':kmv'), 1, 15))::BIGINT
        |    AS hv
        | FROM events),
        |r AS (SELECT event_type, hv,
        |  row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
        | FROM h),
        |s AS (SELECT event_type, count(*) AS n_sketch,
        |  max(CASE WHEN rn = 64 THEN hv END) AS h64th
        | FROM r WHERE rn <= 64 GROUP BY 1),
        |ex AS (SELECT event_type, count(DISTINCT user_id) AS exact_distinct
        | FROM events GROUP BY 1)
        |SELECT s.event_type, CAST(s.n_sketch AS BIGINT) AS n_sketch,
        | round(CASE WHEN s.n_sketch < 64 THEN CAST(s.n_sketch AS DOUBLE)
        |   ELSE 63.0 * power(2.0, 60) / h64th END, 6) AS kmv_est,
        | ex.exact_distinct
        |FROM s JOIN ex USING (event_type)""".stripMargin,
    "q226_kmv_jaccard" ->
      """WITH va AS (SELECT DISTINCT
        |  ('0x' || substr(md5(user_id::VARCHAR || ':kmv'), 1, 15))::BIGINT
        |    AS hv FROM events WHERE event_type = 'view'),
        |ra AS (SELECT hv FROM (SELECT hv,
        |  row_number() OVER (ORDER BY hv) AS rn FROM va) WHERE rn <= 64),
        |la AS (SELECT list(hv ORDER BY hv) AS a FROM ra),
        |vb AS (SELECT DISTINCT
        |  ('0x' || substr(md5(user_id::VARCHAR || ':kmv'), 1, 15))::BIGINT
        |    AS hv FROM events WHERE event_type = 'purchase'),
        |rb AS (SELECT hv FROM (SELECT hv,
        |  row_number() OVER (ORDER BY hv) AS rn FROM vb) WHERE rn <= 64),
        |lb AS (SELECT list(hv ORDER BY hv) AS b FROM rb),
        |j AS (SELECT a, b, list_sort(list_distinct(a || b))[1:64] AS u
        | FROM la CROSS JOIN lb),
        |r2 AS (SELECT u,
        |  len(list_filter(u,
        |    x -> list_contains(a, x) AND list_contains(b, x))) AS rho,
        |  CASE WHEN len(u) < 64 THEN CAST(len(u) AS DOUBLE)
        |       ELSE 63.0 * power(2.0, 60) / u[64] END AS uest
        | FROM j)
        |SELECT round(CAST(rho AS DOUBLE) / least(len(u), 64), 6) AS jaccard,
        | round(CAST(rho AS DOUBLE) / least(len(u), 64) * uest, 6)
        |   AS inter_est,
        | round(uest, 6) AS union_est
        |FROM r2""".stripMargin,
    "q220_triangles" ->
      s"""WITH $TriangleCtes
         |SELECT id, triangles FROM tri""".stripMargin,
    // HITS: unrolled 3-iteration replay; every neighbor aggregation and
    // L1 norm sums DECIMAL-quantized terms (order-free), each score one
    // pinned division — bit-identical to Graph.hits
    "q286_hits" -> {
      val body = (1 to 3).map { i =>
        s"""ar$i AS (SELECT e.dst AS id,
           |  CAST(sum(CAST(h.h AS DECIMAL(28,12))) AS DOUBLE) AS ar
           |  FROM e0 e JOIN h${i - 1} h ON e.src = h.id GROUP BY 1),
           |an$i AS (SELECT CAST(sum(CAST(ar AS DECIMAL(28,12))) AS DOUBLE)
           |    AS s FROM ar$i),
           |a$i AS (SELECT nodes.id, coalesce(ar.ar, 0.0)
           |    / (CASE WHEN an.s > 0 THEN an.s END) AS a
           |  FROM nodes CROSS JOIN an$i an
           |  LEFT JOIN ar$i ar ON nodes.id = ar.id),
           |hr$i AS (SELECT e.src AS id,
           |  CAST(sum(CAST(a.a AS DECIMAL(28,12))) AS DOUBLE) AS hr
           |  FROM e0 e JOIN a$i a ON e.dst = a.id GROUP BY 1),
           |hn$i AS (SELECT CAST(sum(CAST(hr AS DECIMAL(28,12))) AS DOUBLE)
           |    AS s FROM hr$i),
           |h$i AS (SELECT nodes.id, coalesce(hr.hr, 0.0)
           |    / (CASE WHEN hn.s > 0 THEN hn.s END) AS h
           |  FROM nodes CROSS JOIN hn$i hn
           |  LEFT JOIN hr$i hr ON nodes.id = hr.id)""".stripMargin
      }.mkString(",\n")
      s"""WITH e0 AS (SELECT DISTINCT 's' || l_suppkey::VARCHAR AS src,
         |    'p' || l_partkey::VARCHAR AS dst FROM lineitem),
         |nodes AS (SELECT DISTINCT id FROM
         |  (SELECT src AS id FROM e0 UNION ALL SELECT dst FROM e0)),
         |h0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS h FROM nodes),
         |$body
         |SELECT h3.id, round(h3.h, 6) AS hub, round(a3.a, 6) AS authority
         |FROM h3 JOIN a3 ON h3.id = a3.id""".stripMargin
    },
    // 3-core: the peel replayed as a bounded recursion — survivors at the
    // iteration cap are the fixpoint (rows re-emit unchanged once the peel
    // settles, and sf0.01 settles in far fewer than 30 rounds)
    "q269_kcore" ->
      """WITH RECURSIVE ed AS (SELECT lo, hi FROM (
        |  SELECT a.l_partkey AS lo, b.l_partkey AS hi, count(*) AS c
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2) WHERE c >= 2),
        |sym AS (SELECT lo AS u, hi AS v FROM ed UNION ALL SELECT hi, lo FROM ed),
        |core AS (
        |  SELECT 0 AS it, u AS id FROM (SELECT DISTINCT u FROM sym)
        |  UNION ALL
        |  SELECT it + 1, id FROM (
        |    SELECT a.it, s.u AS id, count(*) AS deg
        |    FROM core a JOIN sym s ON s.u = a.id
        |    JOIN core b ON b.it = a.it AND b.id = s.v
        |    GROUP BY 1, 2) p WHERE deg >= 3 AND it < 30),
        |fin AS (SELECT DISTINCT id FROM core WHERE it = 30)
        |SELECT s.u AS id, CAST(count(*) AS BIGINT) AS core_deg
        |FROM sym s JOIN fin a ON s.u = a.id JOIN fin b ON s.v = b.id
        |GROUP BY 1""".stripMargin,
    // 3-truss: the edge peel replayed as a bounded recursion (same
    // contract as q269 — the fixpoint re-emits unchanged to the cap),
    // support recomputed on the cap's survivors for the output
    "q275_ktruss" ->
      """WITH RECURSIVE ed AS (SELECT lo, hi FROM (
        |  SELECT a.l_partkey AS lo, b.l_partkey AS hi, count(*) AS c
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2) WHERE c >= 2),
        |tr AS (
        |  SELECT 0 AS it, lo, hi FROM ed
        |  UNION ALL
        |  SELECT it + 1, lo, hi FROM (
        |    SELECT e.it, e.lo, e.hi, count(*) AS s
        |    FROM (SELECT * FROM tr) e
        |    JOIN (SELECT it, lo AS u, hi AS v FROM tr
        |          UNION ALL SELECT it, hi, lo FROM tr) s1
        |      ON s1.it = e.it AND s1.u = e.lo
        |    JOIN (SELECT it, lo AS u, hi AS v FROM tr
        |          UNION ALL SELECT it, hi, lo FROM tr) s2
        |      ON s2.it = e.it AND s2.u = e.hi AND s2.v = s1.v
        |    GROUP BY 1, 2, 3) p WHERE s >= 1 AND it < 25),
        |fin AS (SELECT lo, hi FROM tr WHERE it = 25),
        |fsym AS (SELECT lo AS u, hi AS v FROM fin
        |  UNION ALL SELECT hi, lo FROM fin)
        |SELECT e.lo, e.hi, CAST(count(*) AS BIGINT) AS support
        |FROM fin e JOIN fsym s1 ON s1.u = e.lo
        |JOIN fsym s2 ON s2.u = e.hi AND s2.v = s1.v
        |GROUP BY 1, 2""".stripMargin,
    // degree assortativity: exact integer sufficient statistics, the
    // one-row double arithmetic pinned op-for-op against the Spark side
    "q270_assortativity" ->
      """WITH ed AS (SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS lo,
        |    greatest(a.l_partkey, b.l_partkey) AS hi
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |sym AS (SELECT lo AS u, hi AS v FROM ed UNION ALL SELECT hi, lo FROM ed),
        |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY u),
        |pr AS (SELECT dj.d AS dj, dk.d AS dk FROM sym
        |  JOIN deg dj ON sym.u = dj.u JOIN deg dk ON sym.v = dk.u),
        |st AS (SELECT count(*) AS m, sum(dj*dk) AS sjk, sum(dj) AS sj,
        |  sum(dk) AS sk, sum(dj*dj) AS sjj, sum(dk*dk) AS skk FROM pr)
        |SELECT CAST(m AS BIGINT) AS m_edges,
        |  CASE WHEN CAST(m AS DOUBLE)*CAST(sjj AS DOUBLE) - CAST(sj AS DOUBLE)*CAST(sj AS DOUBLE) > 0
        |        AND CAST(m AS DOUBLE)*CAST(skk AS DOUBLE) - CAST(sk AS DOUBLE)*CAST(sk AS DOUBLE) > 0
        |  THEN round((CAST(m AS DOUBLE)*CAST(sjk AS DOUBLE) - CAST(sj AS DOUBLE)*CAST(sk AS DOUBLE)) /
        |   (sqrt(CAST(m AS DOUBLE)*CAST(sjj AS DOUBLE) - CAST(sj AS DOUBLE)*CAST(sj AS DOUBLE)) *
        |    sqrt(CAST(m AS DOUBLE)*CAST(skk AS DOUBLE) - CAST(sk AS DOUBLE)*CAST(sk AS DOUBLE))), 6)
        |  END AS assortativity
        |FROM st""".stripMargin,
    "q221_bfs_hops" ->
      """SELECT concat('r', CAST(r_regionkey AS VARCHAR)) AS id, 0 AS hops
        | FROM region
        |UNION ALL
        |SELECT concat('n', CAST(n_nationkey AS VARCHAR)), 1 FROM nation
        |UNION ALL
        |SELECT concat('c', CAST(c_custkey AS VARCHAR)), 2 FROM customer""".stripMargin,
    "q222_clustering" ->
      s"""WITH $TriangleCtes
         |SELECT deg.id, deg.deg, coalesce(tri.triangles, 0) AS triangles,
         | CASE WHEN deg.deg >= 2
         |   THEN round(2.0 * coalesce(tri.triangles, 0)
         |     / CAST(deg.deg * (deg.deg - 1) AS DOUBLE), 6)
         | END AS clustering
         |FROM deg LEFT JOIN tri USING (id)""".stripMargin,
    "q223_modularity" ->
      s"""WITH $TradeCtes,
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS m FROM und),
         |tag AS (SELECT und.a, und.b, na.n_regionkey AS ca,
         |  nb.n_regionkey AS cb
         | FROM und JOIN nation na ON na.n_nationkey = und.a
         | JOIN nation nb ON nb.n_nationkey = und.b),
         |wi AS (SELECT ca AS community, count(*) AS e_within FROM tag
         | WHERE ca = cb GROUP BY 1),
         |dc AS (SELECT n.n_regionkey AS community,
         |  CAST(count(*) AS BIGINT) AS d_sum FROM
         | (SELECT a AS id FROM und UNION ALL SELECT b AS id FROM und) ids
         | JOIN nation n ON n.n_nationkey = ids.id GROUP BY 1),
         |pc AS (SELECT dc.community, coalesce(wi.e_within, 0) AS e_within,
         |  dc.d_sum, tot.m,
         |  round(CAST(coalesce(wi.e_within, 0) AS DOUBLE)
         |      / CAST(tot.m AS DOUBLE)
         |    - (CAST(dc.d_sum AS DOUBLE) / (2.0 * CAST(tot.m AS DOUBLE)))
         |      * (CAST(dc.d_sum AS DOUBLE) / (2.0 * CAST(tot.m AS DOUBLE))),
         |    6) AS contribution
         | FROM dc LEFT JOIN wi ON wi.community = dc.community CROSS JOIN tot)
         |SELECT community, e_within, d_sum, m, contribution,
         | round(CAST(sum(CAST(contribution AS DECIMAL(28,12))) OVER ()
         |   AS DOUBLE), 6) AS modularity
         |FROM pc""".stripMargin,
    "q245_louvain" -> louvainOracleSql(3),
    "q247_louvain_l2" -> louvain2OracleSql(2, 2),
    "q258_louvain_hier" -> louvainHierOracleSql(3, 2),
    "q290_lpa" -> lpaOracleSql(4),
    // connected components: the q75/q268 recursive reachability closure
    // over the q269 co-purchase edge set, min-id labels. ed/sym are
    // hinted AS MATERIALIZED: DuckDB inlines multiply-referenced CTEs,
    // re-evaluating the lineitem self-join inside every recursion step
    // (the q288 trap; 5.8 s -> 2.1 s at sf0.01, value-identical)
    "q309_connected_components" ->
      """WITH RECURSIVE ed AS MATERIALIZED (SELECT lo, hi FROM (
        |  SELECT a.l_partkey AS lo, b.l_partkey AS hi, count(*) AS c
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2) WHERE c >= 2),
        |sym AS MATERIALIZED (SELECT lo AS u, hi AS v FROM ed UNION ALL SELECT hi, lo FROM ed),
        |nodes AS (SELECT DISTINCT u AS v FROM sym),
        |reach AS (SELECT v, v AS lbl FROM nodes
        |  UNION
        |  SELECT s.v, r.lbl FROM sym s JOIN reach r ON r.v = s.u),
        |cl AS (SELECT v, min(lbl) AS comp FROM reach GROUP BY 1),
        |sz AS (SELECT comp, CAST(count(*) AS BIGINT) AS component_size
        | FROM cl GROUP BY 1)
        |SELECT cl.v AS id, cl.comp AS component, sz.component_size
        |FROM cl JOIN sz ON sz.comp = cl.comp""".stripMargin,
    "q297_tpch_q17" ->
      """WITH p AS (SELECT p_partkey FROM part
        | WHERE p_brand = 'Brand#4' AND p_size <= 10),
        |base AS (SELECT l.* FROM lineitem l JOIN p
        | ON l.l_partkey = p.p_partkey),
        |av AS (SELECT l_partkey,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) / count(*)
        |    AS avgq
        | FROM base GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        | round(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
        |   / CAST(7 AS DOUBLE), 6) AS avg_yearly
        |FROM base JOIN av USING (l_partkey)
        |WHERE l_quantity < avgq / CAST(5 AS DOUBLE)""".stripMargin,
    // snapshot diff: null-safe column compare (IS NOT DISTINCT FROM);
    // concat_ws skips the NULL CASE arms, assembling the changed list
    "q261_snapshot_diff" -> {
      val cols = Seq("o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      val diffs = cols.map(c =>
        s"NOT (o.$c IS NOT DISTINCT FROM n.$c)")
      val changed = cols.zip(diffs)
        .map { case (c, dd) => s"CASE WHEN $dd THEN '$c' END" }
        .mkString(", ")
      s"""WITH o AS (SELECT o_orderkey, o_custkey, o_orderstatus,
         |  CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice + 1.0
         |    ELSE o_totalprice END AS o_totalprice,
         |  o_orderdate, o_orderpriority
         | FROM orders WHERE o_orderkey % 13 != 0),
         |n AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         |  o_orderdate, o_orderpriority FROM orders
         | WHERE o_orderkey % 17 != 0),
         |j AS (SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
         |  o.o_orderkey IS NOT NULL AS in_old,
         |  n.o_orderkey IS NOT NULL AS in_new,
         |  CASE WHEN ${diffs.mkString(" OR ")} THEN 1 ELSE 0 END AS any_diff,
         |  concat_ws(',', $changed) AS ch
         | FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey)
         |SELECT o_orderkey,
         |  CASE WHEN NOT in_old THEN 'added'
         |       WHEN NOT in_new THEN 'removed'
         |       WHEN any_diff = 1 THEN 'changed' END AS change_type,
         |  CASE WHEN in_old AND in_new AND any_diff = 1 THEN ch
         |       ELSE '' END AS changed_cols
         |FROM j
         |WHERE (NOT in_old) OR (NOT in_new) OR any_diff = 1""".stripMargin
    },
    "q128_sql_tpch_q5" -> TpchQ5Sql,
    "q133_sql_tpch_q6" -> TpchQ6Sql,
    // HLL rebuilt register-for-register: identical md5 hash, identical
    // integer rho chain (Stats.rhoSql), identical exact indicator sum —
    // the only doubles are the final division/ln, rounded at 6 dp
    "q161_hll_distinct" -> {
      val rho = graft.ops.Stats.rhoSql("w")
      s"""WITH h AS (SELECT event_type,
         |    ('0x' || substr(md5(user_id::VARCHAR || ':hll'), 1, 15))::BIGINT
         |      AS hv
         |  FROM events),
         |regs AS (SELECT event_type, hv % 64 AS reg, max($rho) AS rho
         |  FROM (SELECT event_type, hv, hv // 64 AS w FROM h) GROUP BY 1, 2),
         |agg AS (SELECT event_type,
         |    sum(1::BIGINT << (55 - rho)) AS seen, count(*) AS nreg
         |  FROM regs GROUP BY 1),
         |est AS (SELECT event_type,
         |    seen + (64 - nreg) * (1::BIGINT << 55) AS denom,
         |    64 - nreg AS zeros FROM agg),
         |raw AS (SELECT event_type, zeros,
         |    0.7213 / (1.0 + 1.079 / 64) * 64 * 64 * 36028797018963968.0
         |      / denom AS r
         |  FROM est),
         |he AS (SELECT event_type,
         |    round(CASE WHEN r <= 160.0 AND zeros > 0
         |               THEN 64.0 * ln(64.0 / zeros) ELSE r END, 6) AS hll_est
         |  FROM raw),
         |ex AS (SELECT event_type, count(DISTINCT user_id) AS exact_distinct
         |  FROM events GROUP BY 1)
         |SELECT event_type, exact_distinct, hll_est
         |FROM ex JOIN he USING (event_type)""".stripMargin
    },
    // the 3 power iterations unrolled as CTEs; every float literal written
    // as the same expression Spark evaluates ((1.0 - 0.85), not 0.15) so
    // both engines hit identical IEEE constants
    "q162_pagerank" -> {
      val body = (1 to 3).map { i =>
        val p = s"r${i - 1}"
        s"""c$i AS (SELECT e.dst AS id, sum(p.r / d.deg) AS c
           |  FROM e0 e JOIN $p p ON e.src = p.id JOIN deg d ON e.src = d.src
           |  GROUP BY 1),
           |d$i AS (SELECT coalesce(sum(p.r), 0.0) AS dm FROM $p p
           |  LEFT JOIN srcs s ON p.id = s.src WHERE s.src IS NULL),
           |r$i AS (SELECT nodes.id,
           |    (1.0 - 0.85) / nn.n
           |      + 0.85 * (coalesce(c$i.c, 0.0) + d$i.dm / nn.n) AS r
           |  FROM nodes CROSS JOIN nn CROSS JOIN d$i
           |  LEFT JOIN c$i ON nodes.id = c$i.id)""".stripMargin
      }.mkString(",\n")
      s"""WITH e0 AS (SELECT DISTINCT src, dst FROM (
         |    SELECT 'c' || c_custkey::VARCHAR AS src,
         |           'n' || c_nationkey::VARCHAR AS dst FROM customer
         |    UNION ALL
         |    SELECT 'n' || n_nationkey::VARCHAR,
         |           'r' || n_regionkey::VARCHAR FROM nation)),
         |nodes AS (SELECT DISTINCT id FROM
         |  (SELECT src AS id FROM e0 UNION ALL SELECT dst FROM e0)),
         |deg AS (SELECT src, count(*) AS deg FROM e0 GROUP BY 1),
         |srcs AS (SELECT DISTINCT src FROM e0),
         |nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
         |r0 AS (SELECT id, 1.0 / nn.n AS r FROM nodes CROSS JOIN nn),
         |$body
         |SELECT id, round(r, 6) AS rank FROM r3""".stripMargin
    },
    // personalized PageRank: the q162 replay with the uniform 1/N restart
    // replaced by the region-seed vector (restart AND dangling mass)
    "q276_ppr" -> {
      val body = (1 to 3).map { i =>
        val p = s"r${i - 1}"
        s"""c$i AS (SELECT e.dst AS id, sum(p.r / d.deg) AS c
           |  FROM e0 e JOIN $p p ON e.src = p.id JOIN deg d ON e.src = d.src
           |  GROUP BY 1),
           |d$i AS (SELECT coalesce(sum(p.r), 0.0) AS dm FROM $p p
           |  LEFT JOIN srcs s2 ON p.id = s2.src WHERE s2.src IS NULL),
           |r$i AS (SELECT sv.id,
           |    (1.0 - 0.85) * sv.s
           |      + 0.85 * (coalesce(c$i.c, 0.0) + d$i.dm * sv.s) AS r
           |  FROM sv CROSS JOIN d$i
           |  LEFT JOIN c$i ON sv.id = c$i.id)""".stripMargin
      }.mkString(",\n")
      s"""WITH e0 AS (SELECT DISTINCT src, dst FROM (
         |    SELECT 'c' || c_custkey::VARCHAR AS src,
         |           'n' || c_nationkey::VARCHAR AS dst FROM customer
         |    UNION ALL
         |    SELECT 'n' || n_nationkey::VARCHAR,
         |           'r' || n_regionkey::VARCHAR FROM nation)),
         |nodes AS (SELECT DISTINCT id FROM
         |  (SELECT src AS id FROM e0 UNION ALL SELECT dst FROM e0)),
         |deg AS (SELECT src, count(*) AS deg FROM e0 GROUP BY 1),
         |srcs AS (SELECT DISTINCT src FROM e0),
         |sd AS (SELECT id FROM nodes WHERE id LIKE 'r%'),
         |nsd AS (SELECT count(*)::DOUBLE AS ns FROM sd),
         |sv AS (SELECT nodes.id,
         |    CASE WHEN sd.id IS NOT NULL THEN 1.0 / nsd.ns ELSE 0.0 END AS s
         |  FROM nodes CROSS JOIN nsd LEFT JOIN sd ON nodes.id = sd.id),
         |r0 AS (SELECT id, s AS r FROM sv),
         |$body
         |SELECT id, round(r, 6) AS rank FROM r3""".stripMargin
    },
    "q163_target_encode" ->
      """WITH e AS (SELECT event_id, event_type, value FROM events
        |  WHERE value IS NOT NULL),
        |st AS (SELECT event_type, sum(value) AS sum_y, count(*) AS n_cat
        |  FROM e GROUP BY 1),
        |g AS (SELECT avg(value) AS gmean FROM e)
        |SELECT event_id, event_type, value,
        |  round((sum_y - value + 10.0 * gmean) / (n_cat - 1 + 10.0), 6)
        |    AS value_te
        |FROM e JOIN st USING (event_type) CROSS JOIN g""".stripMargin,
    // the oracle is the EXACT median — proving the histogram narrowing
    // selects the true order statistics, not an approximation
    "q164_median_twopass" ->
      """SELECT event_type, round(median(value), 6) AS median
        |FROM events WHERE value IS NOT NULL GROUP BY 1""".stripMargin,
    "q165_inverted_index" ->
      raw"""WITH toks AS (SELECT DISTINCT doc_id, t.term
        |  FROM documents,
        |    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS t(term)
        |  WHERE length(t.term) > 0),
        |pl AS (SELECT term, list_sort(list(doc_id)) AS ids,
        |    count(*) AS df_docs
        |  FROM toks GROUP BY 1),
        |f AS (SELECT * FROM pl WHERE df_docs BETWEEN 5 AND 400)
        |SELECT term, df_docs, ids[1] AS first_id, ids[-1] AS last_id,
        |  CASE WHEN len(ids) = 1 THEN 0
        |       ELSE list_max(list_transform(range(2, len(ids) + 1),
        |                     i -> ids[i] - ids[i - 1])) END AS max_gap,
        |  array_to_string(list_transform(range(1, len(ids) + 1),
        |    i -> CASE WHEN i = 1 THEN ids[1] ELSE ids[i] - ids[i - 1] END),
        |    ',') AS gaps
        |FROM f""".stripMargin,
    "q166_seasonal_anomaly" ->
      """WITH e AS (SELECT event_id, event_type, ts, value FROM events
        |  WHERE value IS NOT NULL),
        |sl AS (SELECT *, (ts::DATE - DATE '1970-01-01') % 7 AS dow,
        |    extract(hour FROM ts) AS hr FROM e),
        |prof AS (SELECT event_type, dow, hr, avg(value) AS seasonal
        |  FROM sl GROUP BY 1, 2, 3),
        |r AS (SELECT sl.event_id, sl.event_type, prof.seasonal,
        |    sl.value - prof.seasonal AS resid
        |  FROM sl JOIN prof USING (event_type, dow, hr)),
        |sd AS (SELECT event_type, stddev_samp(resid) AS sd FROM r GROUP BY 1)
        |SELECT event_id, event_type, round(seasonal, 6) AS seasonal,
        |  round(resid, 6) AS residual,
        |  round(CASE WHEN sd > 0 THEN resid / sd END, 6) AS z,
        |  CASE WHEN sd > 0 THEN abs(resid / sd) > 3.0 ELSE false END
        |    AS is_anomaly
        |FROM r JOIN sd USING (event_type)""".stripMargin,
    // the driver tables are one physical file each, so the oracle can pin
    // the basename literally — the check is that Spark's
    // input_file_name-derived grouping lands every row in that file
    "q140_file_stats" ->
      """SELECT 'lineitem.parquet' AS file, count(*) AS n_rows,
        | count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem""".stripMargin,
    "q142_countmin" ->
      """WITH h AS (SELECT user_id::VARCHAR AS key FROM events),
        |hashed AS (SELECT key, j,
        |    ('0x' || substr(md5(key || ':cm' || j::VARCHAR), 1, 15))::BIGINT
        |      % 256 AS bucket
        |  FROM h, unnest([0, 1, 2, 3]) AS t(j)),
        |sketch AS (SELECT j, bucket, count(*) AS c FROM hashed GROUP BY 1, 2),
        |kh AS (SELECT DISTINCT key, j, bucket FROM hashed),
        |est AS (SELECT key, min(c) AS cm_est
        |  FROM kh JOIN sketch USING (j, bucket) GROUP BY 1),
        |ex AS (SELECT user_id::VARCHAR AS key, count(*) AS exact_n
        |  FROM events GROUP BY 1)
        |SELECT key, exact_n, cm_est, cm_est >= exact_n AS no_underestimate
        |FROM ex JOIN est USING (key)""".stripMargin,
    "q159_bloom_probe" ->
      """WITH eval AS (SELECT DISTINCT user_id::VARCHAR AS key
        |  FROM events WHERE user_id < 30),
        |bits AS (SELECT DISTINCT
        |    ('0x' || substr(md5(key || ':bf' || j::VARCHAR), 1, 15))::BIGINT
        |      % 1024 AS bit
        |  FROM eval, unnest([0, 1, 2]) AS t(j)),
        |cand AS (SELECT DISTINCT user_id::VARCHAR AS key FROM events),
        |pos AS (SELECT key,
        |    ('0x' || substr(md5(key || ':bf' || j::VARCHAR), 1, 15))::BIGINT
        |      % 1024 AS bit
        |  FROM cand, unnest([0, 1, 2]) AS t(j)),
        |probe AS (SELECT key, CAST(count(b.bit) = 3 AS INT) AS maybe_present
        |  FROM pos LEFT JOIN bits b USING (bit) GROUP BY key)
        |SELECT p.key, p.maybe_present,
        |  CASE WHEN e.key IS NULL THEN 0 ELSE 1 END AS exact_present,
        |  p.maybe_present >= (CASE WHEN e.key IS NULL THEN 0 ELSE 1 END)
        |    AS no_false_negative
        |FROM probe p LEFT JOIN eval e USING (key)""".stripMargin,
    "q160_weighted_sample" ->
      """WITH e AS (SELECT event_id, event_type, value FROM events
        |  WHERE value > 0),
        |p AS (SELECT event_id, event_type, value,
        |    pow(((('0x' || substr(md5('ws:' || event_id::VARCHAR), 1, 15))::BIGINT
        |          % 1000000) + 1) / 1000000.0,
        |      1.0 / CAST(value AS DOUBLE)) AS pri
        |  FROM e),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY pri DESC, event_id ASC) AS rank
        |  FROM p)
        |SELECT event_id, event_type, value, CAST(rank AS INT) AS rank,
        |  round(pri, 6) AS priority
        |FROM r WHERE rank <= 50""".stripMargin,
    "q154_fuzzy_blocked" ->
      """WITH ok AS (SELECT p_brand, p_size FROM part
        |  GROUP BY 1, 2 HAVING count(*) <= 10000),
        |p AS (SELECT p_partkey, p_name, p_brand, p_size
        |  FROM part JOIN ok USING (p_brand, p_size))
        |SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
        |  a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        |FROM p a JOIN p b
        |  ON a.p_brand = b.p_brand AND a.p_size = b.p_size
        |  AND a.p_partkey < b.p_partkey
        |WHERE levenshtein(a.p_name, b.p_name) <= 4""".stripMargin,
    "q150_quantile_norm" ->
      """WITH g AS (SELECT quantile_cont(value,
        |    list_transform(generate_series(0, 100),
        |      i -> i / CAST(100 AS DOUBLE))) AS q
        |  FROM events WHERE value IS NOT NULL),
        |r AS (SELECT event_id, event_type, value,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY value, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events WHERE value IS NOT NULL),
        |p AS (SELECT event_id, event_type, value,
        |    CASE WHEN n > 1 THEN CAST(rn - 1 AS DOUBLE) / (n - 1)
        |         ELSE CAST(0 AS DOUBLE) END AS r
        |  FROM r),
        |x AS (SELECT event_id, event_type, value, r, r * 100 AS pp,
        |    CAST(floor(r * 100) AS INT) AS lo FROM p)
        |SELECT event_id, event_type, value, round(r, 6) AS src_rank,
        |  round(CASE WHEN lo >= 100 THEN q[101]
        |    ELSE q[lo + 1] + (pp - lo) * (q[lo + 2] - q[lo + 1]) END, 6)
        |    AS value_qn
        |FROM x, g""".stripMargin,
    "q148_linear_count" ->
      """WITH b AS (SELECT event_type,
        |    ('0x' || substr(md5(user_id::VARCHAR || ':lc'), 1, 15))::BIGINT
        |      % 256 AS bucket
        |  FROM events),
        |lc AS (SELECT event_type, count(DISTINCT bucket) AS occupied
        |  FROM b GROUP BY 1),
        |ex AS (SELECT event_type, count(DISTINCT user_id) AS exact_distinct
        |  FROM events GROUP BY 1)
        |SELECT event_type, exact_distinct, occupied,
        |  CASE WHEN occupied < 256 THEN round(-CAST(256 AS DOUBLE) *
        |    ln(1 - occupied / CAST(256 AS DOUBLE)), 6) END AS lc_est,
        |  round(abs(CASE WHEN occupied < 256 THEN round(-CAST(256 AS DOUBLE) *
        |      ln(1 - occupied / CAST(256 AS DOUBLE)), 6) END - exact_distinct)
        |    / exact_distinct, 6) AS rel_err
        |FROM ex JOIN lc USING (event_type)""".stripMargin,
    "q146_join_estimate" ->
      """WITH h AS (SELECT user_id::VARCHAR AS key FROM events),
        |hashed AS (SELECT key, j,
        |    ('0x' || substr(md5(key || ':cm' || j::VARCHAR), 1, 15))::BIGINT
        |      % 256 AS bucket
        |  FROM h, unnest([0, 1, 2, 3]) AS t(j)),
        |sketch AS (SELECT j, bucket, count(*) AS c FROM hashed GROUP BY 1, 2),
        |dots AS (SELECT j, CAST(sum(c * c) AS BIGINT) AS dot
        |  FROM sketch GROUP BY 1),
        |est AS (SELECT min(dot) AS est_join_size FROM dots),
        |ex AS (SELECT CAST(sum(n * n) AS BIGINT) AS exact_join_size FROM
        |  (SELECT count(*) AS n FROM events GROUP BY user_id))
        |SELECT exact_join_size, est_join_size,
        |  est_join_size >= exact_join_size AS no_underestimate
        |FROM ex, est""".stripMargin,
    "q143_salted_join" ->
      """SELECT l.l_orderkey, l.l_linenumber, l.l_quantity,
        |  o.o_custkey, o.o_orderdate
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey""".stripMargin,
    "q127_salted_agg" ->
      """SELECT event_type, count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_v,
        | min(value) AS min_v, max(value) AS max_v
        |FROM events GROUP BY 1""".stripMargin,
    "q125_datetime_battery" ->
      """SELECT event_id,
        | CAST(year(ts) AS INT) AS y,
        | CAST(quarter(ts) AS INT) AS qr,
        | CAST(month(ts) AS INT) AS mo,
        | CAST(day(ts) AS INT) AS dom,
        | CAST(dayofweek(ts) + 1 AS INT) AS dow,
        | CAST(dayofyear(ts) AS INT) AS doy,
        | CAST(week(ts) AS INT) AS wk,
        | CAST(hour(ts) AS INT) AS hh,
        | CAST(minute(ts) AS INT) AS mi,
        | CAST(second(ts) AS INT) AS ss,
        | date_trunc('month', ts)::DATE AS mstart,
        | last_day(ts::DATE) AS ldom,
        | (ts::DATE + INTERVAL 2 MONTH)::DATE AS plus2m,
        | CAST(date_diff('day', DATE '2024-01-01', ts::DATE) AS INT) AS d_since,
        | date_diff('second', TIMESTAMP '1970-01-01', ts) AS epoch_s
        |FROM events""".stripMargin,
    "q126_string_battery" ->
      """SELECT c_custkey,
        | lpad(c_name, 25, '*') AS lp,
        | rpad(c_name, 25, '-') AS rp,
        | repeat(c_name[1:2], 3) AS rep,
        | translate(c_name, 'Customer', 'KUSTOMER') AS tr,
        | reverse(c_name) AS rev,
        | CAST(ascii(c_name) AS INT) AS asc,
        | chr(CAST(65 + c_custkey % 26 AS INT)) AS ch,
        | left(c_name, 3) AS lft,
        | right(c_name, 3) AS rgt,
        | CAST(strpos(c_name, '0') AS INT) AS ins,
        | CAST(levenshtein(c_name, 'Customer#000000000') AS INT) AS lev,
        | contains(c_name, '00') AS has00
        |FROM customer""".stripMargin,
    "q114_array_battery" ->
      raw"""WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM documents)
        |SELECT doc_id,
        | CAST(len(w) AS BIGINT) AS n_toks,
        | CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
        | CAST(list_position(w, 'the') AS BIGINT) AS pos_the,
        | array_to_string(list_sort(list_distinct(w))[1:3], ',') AS head3,
        | w[-1] AS last_tok,
        | CAST(len(list_filter(w, t -> length(t) > 3)) AS BIGINT) AS n_long,
        | CAST(list_sum(list_transform(w, t -> length(t))) AS BIGINT) AS total_chars,
        | list_contains(w, 'data') AS has_data,
        | CAST(len(list_distinct(list_intersect(w, ['the','a','of','data']))) AS BIGINT) AS n_common
        |FROM toks""".stripMargin,
    "q110_snapshot_diff" ->
      """WITH nxt AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 10 = 3 THEN o_totalprice + 10.0
        |         ELSE o_totalprice END AS o_totalprice,
        |    o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 10 != 7
        |  UNION ALL
        |  SELECT o_orderkey + 100000000, o_custkey, o_orderstatus,
        |    o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 10 = 1),
        |d AS (SELECT coalesce(b.o_orderkey, n.o_orderkey) AS o_orderkey,
        |  CASE WHEN b.o_orderkey IS NULL THEN 'A'
        |       WHEN n.o_orderkey IS NULL THEN 'D'
        |       WHEN b.o_custkey IS DISTINCT FROM n.o_custkey
        |         OR b.o_orderstatus IS DISTINCT FROM n.o_orderstatus
        |         OR b.o_totalprice IS DISTINCT FROM n.o_totalprice
        |         OR b.o_orderdate IS DISTINCT FROM n.o_orderdate
        |         OR b.o_orderpriority IS DISTINCT FROM n.o_orderpriority
        |       THEN 'C' END AS change_type
        | FROM orders b FULL OUTER JOIN nxt n ON b.o_orderkey = n.o_orderkey)
        |SELECT o_orderkey, change_type FROM d WHERE change_type IS NOT NULL""".stripMargin,
    "q97_merge_upsert" ->
      """WITH ch AS (
        |  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
        |         o_totalprice + 10.0 AS o_totalprice, o_orderdate,
        |         o_orderpriority, 'U' AS _op, 1 AS _v
        |  FROM orders WHERE o_orderkey % 10 = 3
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |         o_orderdate, o_orderpriority, 'D', 1
        |  FROM orders WHERE o_orderkey % 10 = 7
        |  UNION ALL
        |  SELECT o_orderkey + 100000000, o_custkey, o_orderstatus,
        |         o_totalprice, o_orderdate, o_orderpriority, 'I', 1
        |  FROM orders WHERE o_orderkey % 10 = 1),
        |allv AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |         o_orderdate, o_orderpriority, 'I' AS _op, 0 AS _v FROM orders
        |  UNION ALL SELECT * FROM ch)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |       o_orderdate, o_orderpriority
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY _v DESC) AS rn
        |      FROM allv)
        |WHERE rn = 1 AND _op != 'D'""".stripMargin,
    "q98_scd2" ->
      """SELECT user_id, ts, event_type, value,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to,
        |  CAST(lead(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL AS INT) AS is_current
        |FROM events""".stripMargin,
    "q93_json_extract" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(json_extract(props, '$.k')::BIGINT) AS BIGINT) AS sum_k,
        |  min(json_extract(props, '$.k')::BIGINT) AS min_k,
        |  max(json_extract(props, '$.k')::BIGINT) AS max_k
        |FROM events GROUP BY 1""".stripMargin,
    "q91_zorder_key" ->
      s"""WITH z AS (SELECT o_orderkey, o_custkey AS a,
         |  date_diff('day', DATE '1995-01-01', o_orderdate) AS b FROM orders)
         |SELECT o_orderkey, ${graft.ops.Layout.zValue2Sql("a", "b", 16)} AS zval
         |FROM z""".stripMargin,
    "q56_grouping_sets" ->
      """SELECT event_type, hr, 2*grouping(event_type) + grouping(hr) AS gid,
        | count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_v
        |FROM (SELECT event_type, hour(ts) AS hr, value FROM events)
        |GROUP BY GROUPING SETS ((event_type, hr), (event_type), ())""".stripMargin,
    "q57_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS val
        |FROM lineitem WHERE l_orderkey % 100 = 0
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
        |FROM lineitem WHERE l_orderkey % 100 = 0
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        |FROM lineitem WHERE l_orderkey % 100 = 0""".stripMargin,
    "q58_range_join" ->
      """SELECT err.err_id, count(e.event_id) AS n_after,
        | CAST(sum(CAST(e.value AS DECIMAL(38,6))) AS DOUBLE) AS sum_after
        |FROM (SELECT user_id AS u, ts AS err_ts, event_id AS err_id
        |      FROM events WHERE event_type = 'error') err
        |LEFT JOIN events e ON err.u = e.user_id
        |  AND e.ts > err.err_ts AND e.ts <= err.err_ts + INTERVAL 1 HOUR
        |GROUP BY err.err_id""".stripMargin,
    "q59_ranking" ->
      """SELECT user_id, event_id,
        | rank() OVER w AS rnk,
        | dense_rank() OVER w AS drnk,
        | ntile(4) OVER w AS quartile,
        | percent_rank() OVER w AS prnk,
        | cume_dist() OVER w AS cd
        |FROM events WHERE value IS NOT NULL
        |WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id)""".stripMargin,
    "q60_intersect_except" ->
      """SELECT user_id, 'click_and_buy' AS segment FROM (
        | SELECT user_id FROM events WHERE event_type='click'
        | INTERSECT
        | SELECT user_id FROM events WHERE event_type='purchase')
        |UNION ALL
        |SELECT user_id, 'click_only' FROM (
        | SELECT user_id FROM events WHERE event_type='click'
        | EXCEPT
        | SELECT user_id FROM events WHERE event_type='purchase')""".stripMargin,
    "q61_full_outer" ->
      """SELECT coalesce(cu, bu) AS user_id,
        | coalesce(n_clicks, 0) AS n_clicks, coalesce(n_buys, 0) AS n_buys
        |FROM (SELECT user_id AS cu, count(*) AS n_clicks FROM events
        |      WHERE event_type='click' GROUP BY 1) c
        |FULL OUTER JOIN (SELECT user_id AS bu, count(*) AS n_buys FROM events
        |      WHERE event_type='purchase' GROUP BY 1) b ON cu = bu""".stripMargin,
    "q62_conditional_agg" ->
      """SELECT user_id,
        | count(*) FILTER (WHERE event_type='click') AS n_click,
        | count(*) FILTER (WHERE event_type='error') AS n_error,
        | CAST(sum(CAST(value AS DECIMAL(38,6))) FILTER (WHERE event_type='purchase') AS DOUBLE) AS purchase_v,
        | CAST(sum(CAST(value AS DECIMAL(38,6))) FILTER (WHERE event_type='view') AS DOUBLE)
        |   / count(value) FILTER (WHERE event_type='view') AS avg_view_v
        |FROM events GROUP BY user_id""".stripMargin,
    "q63_string_agg" ->
      """SELECT user_id, string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types
        |FROM events GROUP BY user_id""".stripMargin,
    "q64_window_frames" ->
      """SELECT user_id, event_id,
        | first_value(value) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_v,
        | last_value(value) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_v,
        | nth_value(value, 3) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS third_v,
        | min(value) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS min3,
        | max(value) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS max3
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,
    "q65_median_mode" ->
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS median_v FROM events GROUP BY 1),
        |counts AS (
        |  SELECT event_type, user_id % 50 AS k, count(*) AS n FROM events GROUP BY 1, 2),
        |mode AS (
        |  SELECT event_type, k AS mode_k FROM (
        |    SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY n DESC, k) AS rn
        |    FROM counts) WHERE rn = 1)
        |SELECT med.event_type, med.median_v, mode.mode_k
        |FROM med JOIN mode ON med.event_type = mode.event_type""".stripMargin,
    "q66_corr_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        |WHERE o_totalprice > 1.5 * (
        |  SELECT CAST(avg(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
        |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)""".stripMargin,
    "q67_distinct_agg" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_v
        |FROM events GROUP BY event_type""".stripMargin)
}
