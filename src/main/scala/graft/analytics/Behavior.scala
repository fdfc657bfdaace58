package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-sequence analytics: funnel progression and cohort retention — the
  * standard behavioral-OLAP pair over an event log.
  *
  * Scale shape: both operators reduce the event log to per-user rows with
  * group aggregates (map-side combined, shuffle keyed by user), then join
  * user-cardinality frames — bytes ∝ users, never events². No window over
  * the raw log, no self-join of events.
  */
object Behavior {

  /** Ordered funnel: for each user, the earliest time of step 1, the
    * earliest step-2 time AFTER that, and so on (strict ordering — a
    * click before the first view doesn't count). Output: one row per user
    * with t1..tN (NULL once the funnel breaks) and `stage` = furthest step
    * reached (0 = none). Each step is one filtered aggregate joined on the
    * user key; steps are few and fixed, so the plan is a short chain of
    * user-sized hash joins. */
  def funnel(df: DataFrame, user: String, ts: String, etype: String,
             steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var acc = df.select(col(user)).distinct()
    var prevT: Option[String] = None
    steps.zipWithIndex.foreach { case (step, i) =>
      val tcol = s"t${i + 1}"
      val stepEvents = df.filter(col(etype) === step)
      val stepTs = prevT match {
        case None =>
          stepEvents.groupBy(col(user)).agg(min(col(ts)).as(tcol))
        case Some(p) =>
          stepEvents
            .join(acc.filter(col(p).isNotNull).select(col(user), col(p)), Seq(user))
            .filter(col(ts) > col(p))
            .groupBy(col(user)).agg(min(col(ts)).as(tcol))
      }
      acc = acc.join(stepTs, Seq(user), "left_outer")
      prevT = Some(tcol)
    }
    val stage = steps.indices
      .map(i => when(col(s"t${i + 1}").isNotNull, i + 1).otherwise(0))
      .reduce(greatest(_, _))
    acc.withColumn("stage", stage)
  }

  /** Cohort retention: users grouped by first-activity day, counted on each
    * subsequent active day. Output: (cohort, day_n, n_users). Two passes
    * over the log (first-day aggregate + distinct active days), one
    * user-keyed join, one small aggregate. */
  def retention(df: DataFrame, user: String, ts: String): DataFrame = {
    val first = df.groupBy(col(user))
      .agg(min(to_date(col(ts))).as("cohort"))
    val active = df.select(col(user), to_date(col(ts)).as("day")).distinct()
    active.join(first, Seq(user))
      .groupBy(col("cohort"), datediff(col("day"), col("cohort")).as("day_n"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** RFM segmentation over conversion events: per user, recency (days from
    * last conversion to the data's reference date = the global max event
    * day), frequency (conversion count), monetary (exact decimal value
    * sum), each scored 1–5 by QUANTILE BREAKPOINTS rather than a global
    * ntile — score = 1 + #{q ∈ {.2,.4,.6,.8} : metric beats the q-th
    * exact interpolated percentile}. Breakpoint scoring keeps the plan
    * fully parallel (a 1-row quantile aggregate broadcast onto the
    * user frame — no single-partition global sort the way ntile would)
    * and is deterministic under ties without inventing a tiebreak. The
    * composite `segment` is r·100 + f·10 + m, the standard RFM cell. */
  def rfm(df: DataFrame, user: String, ts: String, etype: String,
          valueCol: String, label: String): DataFrame = {
    val conv = df.filter(col(etype) === label && col(valueCol).isNotNull)
    val ref = conv.agg(max(to_date(col(ts))).as("_ref"))
    val perUser = conv.groupBy(col(user)).agg(
      max(to_date(col(ts))).as("_last"),
      count(lit(1)).as("frequency"),
      sum(col(valueCol).cast("decimal(28,10)")).cast("double")
        .as("monetary"))
      .crossJoin(broadcast(ref))
      .withColumn("recency_days", datediff(col("_ref"), col("_last")))
      .drop("_ref", "_last")
    val qs = Seq(0.2, 0.4, 0.6, 0.8)
    val brkCols =
      qs.zipWithIndex.map { case (q, i) =>
        expr(s"percentile(recency_days, $q)").as(s"_r$i") } ++
      qs.zipWithIndex.map { case (q, i) =>
        expr(s"percentile(frequency, $q)").as(s"_f$i") } ++
      qs.zipWithIndex.map { case (q, i) =>
        expr(s"percentile(monetary, $q)").as(s"_m$i") }
    val brk = perUser.agg(brkCols.head, brkCols.tail: _*)
    def score(metric: Column, pre: String, lowIsGood: Boolean): Column =
      qs.indices.map { i =>
        val p = col(s"_$pre$i")
        when(if (lowIsGood) metric < p else metric > p, 1).otherwise(0)
      }.reduce(_ + _) + lit(1)
    perUser.crossJoin(broadcast(brk))
      .withColumn("r_score", score(col("recency_days"), "r", lowIsGood = true))
      .withColumn("f_score", score(col("frequency"), "f", lowIsGood = false))
      .withColumn("m_score", score(col("monetary"), "m", lowIsGood = false))
      .withColumn("segment",
        col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
      .select(col(user), col("recency_days"), col("frequency"),
        col("monetary"), col("r_score"), col("f_score"), col("m_score"),
        col("segment"))
  }

  /** First-order Markov transition matrix over per-user event sequences:
    * P(next = b | current = a) estimated from adjacent pairs, with the row
    * marginal attached. One lead window over the log + one pair aggregate;
    * the matrix itself is |states|² rows. The from-state marginal rides a
    * states-sized window, so nothing beyond the event shuffle is wide. */
  def transitionMatrix(df: DataFrame, user: String, ts: String,
                       etype: String, tiebreak: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(user))
      .orderBy((col(ts) +: tiebreak): _*)
    val pairs = df
      .withColumn("_next", lead(col(etype), 1).over(w))
      .filter(col("_next").isNotNull)
      .groupBy(col(etype).as("from_state"), col("_next").as("to_state"))
      .agg(count(lit(1)).as("n_trans"))
    val wFrom = Window.partitionBy(col("from_state"))
    pairs
      .withColumn("n_from", sum(col("n_trans")).over(wFrom))
      .withColumn("prob",
        round(col("n_trans").cast("double") / col("n_from"), 6))
  }

  /** Cohort churn analysis: per first-activity-day cohort, how many users
    * went silent more than `inactiveDays` before the data's reference date
    * (the global max event day — the same data-derived anchor as
    * [[rfm]]). Two user-sized aggregates + one broadcast reference row;
    * churn_rate = churned/n_users from exact integer counts. The
    * product-analytics companion to [[retention]]: retention counts who
    * came back, churn counts who never did. */
  def churnRate(df: DataFrame, user: String, ts: String,
                inactiveDays: Int = 7): DataFrame = {
    val perUser = df.groupBy(col(user)).agg(
      min(to_date(col(ts))).as("_first"),
      max(to_date(col(ts))).as("_last"))
    val ref = df.agg(max(to_date(col(ts))).as("_ref"))
    perUser.crossJoin(broadcast(ref))
      .withColumn("_churned",
        (datediff(col("_ref"), col("_last")) > inactiveDays).cast("int"))
      .groupBy(col("_first").as("cohort"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("_churned")).cast("long").as("churned"))
      .withColumn("churn_rate",
        round(col("churned").cast("double") / col("n_users"), 6))
  }

  /** Rolling distinct actives per time bucket (rolling DAU/WAU): for each
    * bucket, the distinct `key` count over the trailing `windowN` buckets.
    * A naive trailing-window count-distinct would re-scan the window per
    * bucket; instead each DISTINCT (bucket, key) row fans out to the ≤
    * `windowN` target buckets it keeps alive (explode of a bounded offset
    * range — ×windowN on the deduped frame, not the event log), then one
    * distinct-count per target. This is the standard scalable shape: work
    * ∝ actives·window, shuffle keyed by target bucket, no self-join of
    * the log. Target buckets with no activity in range are absent (a
    * zero-filled calendar is a `sequence` join away if needed). */
  def rollingActives(df: DataFrame, ts: String, key: String,
                     bucket: String = "hour", windowN: Int = 24): DataFrame = {
    require(windowN >= 1, s"windowN must be ≥ 1, got $windowN")
    val shift = bucket.toLowerCase match {
      case "hour" => expr("_b + make_interval(0, 0, 0, 0, _off, 0, 0)")
      case "day"  => expr("_b + make_interval(0, 0, 0, _off, 0, 0, 0)")
      case other =>
        throw new IllegalArgumentException(s"unsupported bucket: $other")
    }
    df.select(date_trunc(bucket, col(ts)).as("_b"), col(key).as("_k"))
      .distinct()
      .withColumn("_off", explode(sequence(lit(0), lit(windowN - 1))))
      .withColumn("bucket_ts", shift)
      .groupBy(col("bucket_ts"))
      .agg(countDistinct(col("_k")).as("active_keys"))
  }

  /** Top-k frequent event n-grams over per-user sequences: the sequence-
    * mining screen for dominant behavioral motifs (view>click>purchase vs
    * error>error>error). One lead-window fan-out per offset + one global
    * count; top-k by (count desc, ngram asc) is a deterministic total
    * order feeding TakeOrderedAndProject. N-grams never cross user
    * boundaries (lead windows are per-user). */
  def eventNgrams(df: DataFrame, user: String, ts: String, etype: String,
                  tiebreak: Seq[Column], n: Int = 3,
                  topK: Int = 20): DataFrame = {
    require(n >= 2, s"n must be ≥ 2, got $n")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(user)).orderBy((col(ts) +: tiebreak): _*)
    val withLeads = (1 until n).foldLeft(df) { (acc, j) =>
      acc.withColumn(s"_l$j", lead(col(etype), j).over(w))
    }
    val parts = col(etype) +: (1 until n).map(j => col(s"_l$j"))
    withLeads
      .filter(parts.map(_.isNotNull).reduce(_ && _))
      .select(concat_ws(">", parts: _*).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("ngram"))
      .limit(topK)
  }

  /** Time-to-convert distribution per funnel transition: for users who
    * completed step i+1, the seconds from their step-i time — count, mean,
    * median, and p90 (exact interpolated percentiles; swap approx at true
    * scale). Composes [[funnel]] (user-sized frame), so the only work past
    * the funnel itself is |steps|−1 small aggregates over converted users.
    * Long-format output, one row per transition. */
  def funnelTiming(df: DataFrame, user: String, ts: String, etype: String,
                   steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, "need at least two steps for timing")
    val f = funnel(df, user, ts, etype, steps)
    val transitions = steps.indices.dropRight(1).map { i =>
      val (t1, t2) = (s"t${i + 1}", s"t${i + 2}")
      f.filter(col(t2).isNotNull)
        .select(lit(s"${steps(i)}->${steps(i + 1)}").as("transition"),
          (col(t2).cast("long") - col(t1).cast("long")).as("dt"))
    }.reduce(_ union _)
    transitions.groupBy("transition").agg(
      count(lit(1)).as("n_converted"),
      round(sum(col("dt")).cast("double") / count(lit(1)), 6)
        .as("mean_seconds"),
      round(expr("percentile(dt, 0.5)"), 6).as("median_seconds"),
      round(expr("percentile(dt, 0.9)"), 6).as("p90_seconds"))
  }

  /** Market-basket association rules over per-user item sets: for every
    * ordered item pair (a < b lexicographically), support n_ab/n_users,
    * both directional confidences, and lift = n_ab·n_users/(n_a·n_b) — the
    * classic cross-activity affinity screen. The self-join runs on the
    * DISTINCT (user, item) frame, so pair volume is Σ_u |basket_u|²,
    * bounded by the item domain, not the event log; item marginals and the
    * user total ride broadcast. `minPairUsers` prunes the noise tail the
    * way a-priori support thresholds do. */
  def basketLift(df: DataFrame, user: String, item: String,
                 minPairUsers: Long = 1L): DataFrame = {
    val baskets = df.select(col(user).as("_u"), col(item).as("_i")).distinct()
    val totals = baskets.agg(countDistinct(col("_u")).as("n_users"))
    val items = baskets.groupBy(col("_i")).agg(count(lit(1)).as("_n"))
    val pairs = baskets.as("a")
      .join(baskets.withColumnRenamed("_i", "_j").as("b"), Seq("_u"))
      .filter(col("_i") < col("_j"))
      .groupBy(col("_i").as("item_a"), col("_j").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairUsers)
    pairs
      .join(broadcast(items.select(col("_i").as("item_a"),
        col("_n").as("n_a"))), Seq("item_a"))
      .join(broadcast(items.select(col("_i").as("item_b"),
        col("_n").as("n_b"))), Seq("item_b"))
      .crossJoin(broadcast(totals))
      .withColumn("support",
        round(col("n_ab").cast("double") / col("n_users"), 6))
      .withColumn("conf_a_b",
        round(col("n_ab").cast("double") / col("n_a"), 6))
      .withColumn("conf_b_a",
        round(col("n_ab").cast("double") / col("n_b"), 6))
      .withColumn("lift",
        round((col("n_ab") * col("n_users")).cast("double") /
          (col("n_a") * col("n_b")).cast("double"), 6))
      .select("item_a", "item_b", "n_ab", "n_a", "n_b", "n_users",
        "support", "conf_a_b", "conf_b_a", "lift")
  }

  /** Gini concentration coefficient per group over NON-NEGATIVE weights
    * (e.g. how concentrated total spend is across users):
    * G = 2·Σᵢ i·x₍ᵢ₎ / (n·Σx) − (n+1)/n with x ascending, i = 1..n.
    * Σ i·x is invariant under permutations of tied values, so row_number
    * needs no tiebreak to be deterministic. Rank products accumulate in
    * exact DECIMAL; one per-group window + one aggregate. NULL for empty
    * or zero-mass groups.
    *
    * Scale shape: the input here is an already-aggregated per-entity frame
    * (entity-cardinality-sized, not data-sized); for raw-row inputs at
    * 100 TB prefer [[graft.ops.Stats.giniPerValue]], which pre-aggregates
    * per distinct value so the rank window rides over a bounded frame. */
  def gini(df: DataFrame, value: String, keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(value))
    val ranked = df.filter(col(value).isNotNull)
      .withColumn("_i", row_number().over(w).cast("long"))
    val agged = ranked.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n_obs"),
      sum(col(value).cast("decimal(28,10)")).cast("double").as("_s"),
      sum((col("_i").cast("double") * col(value)).cast("decimal(28,10)"))
        .cast("double").as("_w"))
    val n = col("n_obs").cast("double")
    agged
      .withColumn("gini",
        when(col("_s") > 0,
          round(lit(2.0) * col("_w") / (n * when(col("_s") > 0, col("_s"))) -
            (n + lit(1.0)) / n, 6)))
      .drop("_s", "_w")
  }

  /** Cohort LTV curve: users cohorted by first-seen day, revenue rolled
    * up per (cohort, week-of-life), and the running cumulative value per
    * cohort member — the "how much is a week-0 user worth by week N"
    * curve that pairs with [[retention]].
    *
    * Scale shape: one per-user min (cohort assignment, user-keyed
    * shuffle), one (cohort, week) revenue aggregate with per-row values
    * quantized to DECIMAL(28,10) pre-sum, then a cumulative window over
    * the calendar-bounded week-of-life axis per cohort. Weeks with no
    * revenue emit no row; the cumulative sum over present weeks is
    * unchanged by the gaps. Emits (cohort, age_week, n_users, wk_value,
    * ltv) with money at 6 dp. */
  def ltvCurve(df: DataFrame, user: String, ts: String,
               value: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val first = df.groupBy(col(user))
      .agg(min(to_date(col(ts))).as("cohort"))
    val sizes = first.groupBy("cohort").agg(count(lit(1)).as("n_users"))
    val rev = df.filter(col(value).isNotNull)
      .join(first, Seq(user))
      .groupBy(col("cohort"),
        floor(datediff(to_date(col(ts)), col("cohort")) / lit(7.0))
          .cast("long").as("age_week"))
      .agg(sum(col(value).cast("decimal(28,10)")).as("_wk"))
    val wCum = Window.partitionBy(col("cohort")).orderBy(col("age_week"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rev.join(sizes, Seq("cohort"))
      .withColumn("_cum", sum(col("_wk")).over(wCum))
      .select(col("cohort"), col("age_week"), col("n_users"),
        round(col("_wk").cast("double"), 6).as("wk_value"),
        round(col("_cum").cast("double") / col("n_users"), 6).as("ltv"))
  }

  /** First/last-touch conversion attribution — the marketing-OLAP
    * standard: each conversion event credits (a) the user's most recent
    * preceding touch (last-touch) and (b) the user's earliest preceding
    * touch (first-touch); conversions with no preceding touch land on
    * the explicit "(none)" channel rather than silently dropping.
    *
    * Both running touches come from ONE per-user ordered window
    * (first/last with ignoreNulls over UNBOUNDED PRECEDING..1 PRECEDING)
    * — per-user partitions at user-cardinality parallelism, the same
    * contract as the funnel/retention family; `ts` must be unique within
    * a user (it is globally unique in the events table). The channel
    * rollup is a |channels|-sized aggregate. Emits one row per channel:
    * (channel, first_touch, last_touch, first_share, last_share). */
  def attribution(df: DataFrame, user: String, ts: String, etype: String,
                  conversion: String, touches: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(user)).orderBy(col(ts))
      .rowsBetween(Window.unboundedPreceding, -1)
    val conv = df
      .withColumn("_touch", when(col(etype).isin(touches: _*), col(etype)))
      .withColumn("_lt", last(col("_touch"), ignoreNulls = true).over(w))
      .withColumn("_ft", first(col("_touch"), ignoreNulls = true).over(w))
      .filter(col(etype) === conversion)
      .select(coalesce(col("_lt"), lit("(none)")).as("_lt"),
        coalesce(col("_ft"), lit("(none)")).as("_ft"))
    val ft = conv.groupBy(col("_ft").as("channel"))
      .agg(count(lit(1)).as("first_touch"))
    val lt = conv.groupBy(col("_lt").as("channel"))
      .agg(count(lit(1)).as("last_touch"))
    val both = ft.join(lt, Seq("channel"), "full_outer")
      .select(col("channel"),
        coalesce(col("first_touch"), lit(0L)).as("first_touch"),
        coalesce(col("last_touch"), lit(0L)).as("last_touch"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    both
      .withColumn("first_share", round(col("first_touch").cast("double") /
        sum(col("first_touch")).over(wAll), 6))
      .withColumn("last_share", round(col("last_touch").cast("double") /
        sum(col("last_touch")).over(wAll), 6))
  }

  /** Kaplan–Meier survival estimator (Kaplan & Meier, JASA 1958) with
    * right censoring: subjects are the distinct `keys` combinations, a
    * subject's duration is last-seen − first-seen in whole hours, and a
    * subject whose last event falls within `censorDays` of the global
    * window end is CENSORED (still alive when observation stopped) —
    * counted in the at-risk denominator up to its duration but never as
    * an event. S(t) = Π_{dᵢ ≤ t} (1 − eventsᵢ/at-riskᵢ), the product over
    * event times only.
    *
    * Scale shape: one per-subject aggregate (shuffle keyed by subject),
    * then everything rides the per-duration frame — whose axis is
    * calendar-bounded (whole hours inside the observation window), the
    * adjudicated market-index-window contract, so the ordered windows
    * here sort a few-hundred-row aggregate, never the event log. The
    * survival product is exp(Σ ln(1−dᵢ/nᵢ)) with per-duration ln terms
    * quantized to DECIMAL(28,12) before the cumulative sum (cross-engine
    * parity); a duration where every at-risk subject dies (factor 0)
    * pins survival to exactly 0 from there on via a cumulative flag —
    * never a ln(0). Emits one row per distinct duration:
    * (duration_hr, n_risk, n_events, n_censored, survival@6dp). */
  def kaplanMeier(df: DataFrame, keys: Seq[String], ts: String,
                  censorDays: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ss = df.groupBy(keys.map(col): _*)
      .agg(min(col(ts)).cast("long").as("_a"), max(col(ts)).cast("long").as("_b"))
    val mx = ss.agg(max(col("_b")).as("_mx"))
    val byDur = ss.crossJoin(broadcast(mx))
      .withColumn("_dur",
        floor((col("_b") - col("_a")) / lit(3600.0)).cast("long"))
      .withColumn("_obs",
        (col("_b") < col("_mx") - lit(censorDays * 86400L)).cast("int"))
      .groupBy(col("_dur").as("duration_hr"))
      .agg(sum(col("_obs")).as("n_events"),
        sum(lit(1) - col("_obs")).as("n_censored"),
        count(lit(1)).as("_tot"))
    val wCum = Window.orderBy(col("duration_hr"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wRisk = Window.orderBy(col("duration_hr"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    byDur
      .withColumn("n_risk", sum(col("_tot")).over(wRisk))
      .withColumn("_f",
        lit(1.0) - col("n_events").cast("double") / col("n_risk").cast("double"))
      .withColumn("_lnf",
        when(col("_f") > 0, log(col("_f"))).otherwise(lit(0.0))
          .cast("decimal(28,12)"))
      .withColumn("_hit0", max((col("_f") === 0).cast("int")).over(wCum))
      .withColumn("survival", when(col("_hit0") === 1, lit(0.0))
        .otherwise(round(exp(sum(col("_lnf")).over(wCum).cast("double")), 6)))
      .select(col("duration_hr"), col("n_risk"), col("n_events"),
        col("n_censored"), col("survival"))
  }

  /** Data-driven Shapley-value attribution (Shapley 1953; Dalessandro,
    * Perlich et al., "Causally motivated attribution", ADKDD 2012): the
    * game's players are the touch channels, a user's coalition is the
    * SET of channels present anywhere in their history, and the
    * characteristic function v(S) is the observed conversion rate of
    * users with exactly coalition S (unobserved coalitions contribute
    * v = 0, and v(∅) is the no-touch baseline measured from the data).
    * φ_c = Σ_{S ∌ c} |S|!·(n−1−|S|)!/n! · (v(S∪{c}) − v(S)) — the unique
    * credit split that is efficient, symmetric, and dummy-free.
    *
    * Scale shape: ONE user-keyed aggregate folds the event log to
    * (coalition bitmask, converted) rows; the v table is 2ⁿ-bounded and
    * everything after — the coefficient join (n·2ⁿ⁻¹ literal rows built
    * driver-side from the channel list) and the marginal sums — rides
    * it. Weights stay exact rationals (integer factorial numerators over
    * the common n! denominator, one pinned division per term, quantized
    * to DECIMAL(28,12) pre-sum). Emits one row per channel:
    * (channel, shapley@6dp). `touches` must be small (n ≤ ~10 — the 2ⁿ
    * coalition table is driver-built). */
  def shapleyAttribution(df: DataFrame, user: String, etype: String,
                         conversion: String,
                         touches: Seq[String]): DataFrame = {
    val n = touches.length
    require(n >= 1 && n <= 10, s"need 1..10 touch channels, got $n")
    val spark = df.sparkSession
    import spark.implicits._
    val maskExpr = touches.zipWithIndex.map { case (t, i) =>
      max(when(col(etype) === t, 1L).otherwise(0L)) * (1L << i)
    }.reduce(_ + _)
    val users = df.groupBy(col(user))
      .agg(maskExpr.as("_mask"),
        max((col(etype) === conversion).cast("long")).as("_conv"))
    val vtab = users.groupBy("_mask")
      .agg((sum(col("_conv")).cast("double") / count(lit(1))).as("_v"))
    def fact(x: Int): Long = (1 to x).foldLeft(1L)(_ * _)
    val den = fact(n).toDouble
    val coef = for {
      (t, i) <- touches.zipWithIndex
      s <- 0 until (1 << n) if (s & (1 << i)) == 0
    } yield (t, (s | (1 << i)).toLong, s.toLong,
      fact(java.lang.Long.bitCount(s.toLong))
        * fact(n - 1 - java.lang.Long.bitCount(s.toLong)))
    val coefDf = coef.toDF("channel", "_mwith", "_mwo", "_num")
    coefDf
      .join(broadcast(vtab.withColumnRenamed("_mask", "_mwith")
        .withColumnRenamed("_v", "_vw")), Seq("_mwith"), "left")
      .join(broadcast(vtab.withColumnRenamed("_mask", "_mwo")
        .withColumnRenamed("_v", "_vo")), Seq("_mwo"), "left")
      .select(col("channel"),
        ((col("_num").cast("double") *
          (coalesce(col("_vw"), lit(0.0)) - coalesce(col("_vo"), lit(0.0))))
          / lit(den)).cast("decimal(28,12)").as("_t"))
      .groupBy("channel")
      .agg(round(sum(col("_t")).cast("double"), 6).as("shapley"))
  }

  /** Markov-chain (removal-effect) attribution (Anderl, Becker, Wangenheim
    * & Schumann, IJRM 2016): model pre-conversion journeys as a first-order
    * chain over {start} ∪ touches ∪ {conv, null}, estimate transition
    * probabilities from the event log, and credit each channel by its
    * REMOVAL EFFECT — how much the start→conv absorption probability drops
    * when the channel is deleted (transitions into it redirected to null,
    * which is exactly "drop those edges": null's absorption value is 0).
    *
    * Scale split: the DATA plane is distributed — one first-conversion
    * aggregate, per-user lag windows, and a (src, dst) count aggregate
    * whose result is (|touches|+1)·(|touches|+2)-BOUNDED; only that tiny
    * matrix is collected (the [[graft.analytics.Graph.bfsHops]] bounded-
    * control-action contract). The CONTROL plane solves absorption by
    * `iters` fixed Jacobi iterations per variant in quantized decimal
    * arithmetic — p quantized to DECIMAL(28,12) from one pinned double
    * division, every product re-quantized to 12 dp before the exact
    * decimal sum — so a recursive SQL oracle replays every iteration
    * bit-for-bit (a float linear solve would be engine-order-dependent).
    * Fixed iteration count, not a tolerance: the absorption error decays
    * geometrically in the non-absorbing mass, and a data-dependent stop
    * would not be replayable. `ts` must be unique within a user.
    * Emits per channel: (channel, p_conv, p_conv_removed,
    * removal_effect@6dp — NULL when p_conv = 0). */
  def markovAttribution(df: DataFrame, user: String, ts: String,
                        etype: String, conversion: String,
                        touches: Seq[String], iters: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val fc = df.filter(col(etype) === conversion)
      .groupBy(col(user)).agg(min(col(ts)).as("_cts"))
    val tl = df.filter(col(etype).isin(touches: _*))
      .join(fc, Seq(user), "left")
      .filter(col("_cts").isNull || col(ts) < col("_cts"))
    val wAsc = Window.partitionBy(col(user)).orderBy(col(ts).asc)
    val t1 = tl.withColumn("_prev", lag(col(etype), 1).over(wAsc))
      .select(coalesce(col("_prev"), lit("start")).as("_src"),
        col(etype).as("_dst"))
    val lastT = tl.groupBy(col(user))
      .agg(max_by(col(etype), col(ts)).as("_lch"))
    val convU = df.groupBy(col(user))
      .agg(max((col(etype) === conversion).cast("int")).as("_cv"))
    val t2 = convU.join(lastT, Seq(user), "left")
      .select(coalesce(col("_lch"), lit("start")).as("_src"),
        when(col("_cv") === 1, "conv").otherwise("null").as("_dst"))
    val mat = t1.unionByName(t2).groupBy("_src", "_dst")
      .agg(count(lit(1)).as("_c"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val tot = mat.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    def q12(b: BigDecimal) =
      b.setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val edges = mat.map { case (s, t, c) =>
      (s, t, q12(BigDecimal(c.toDouble / tot(s)))) }
    val one = q12(BigDecimal(1)); val zero = q12(BigDecimal(0))
    def absorb(skip: Option[String]): BigDecimal = {
      val es = edges.filter(e => skip.forall(_ != e._2))
      var p = Map("conv" -> one, "null" -> zero)
      for (_ <- 1 to iters) {
        val next = es.groupBy(_._1).map { case (s, out) =>
          s -> out.map(e => q12(e._3 * p.getOrElse(e._2, zero))).sum }
        p = next ++ Map("conv" -> one, "null" -> zero)
      }
      p.getOrElse("start", zero)
    }
    def r6(d: Double) = BigDecimal(d)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pf = absorb(None).toDouble
    val out = touches.map { c =>
      val pr = absorb(Some(c)).toDouble
      (c, r6(pf), r6(pr),
        if (pf > 0) Some(r6(1.0 - pr / pf)) else None)
    }
    out.toDF("channel", "p_conv", "p_conv_removed", "removal_effect")
  }

  /** U-shaped (position-based) multi-touch attribution: each converting
    * user's pre-conversion touch path splits one unit of credit 40/20/40
    * — 2/5 to the first touch, 2/5 to the last, the middle 1/5 shared
    * equally; single-touch paths keep the whole unit, two-touch paths
    * split it evenly. Paths are the touch events strictly BEFORE the
    * user's FIRST conversion (the [[attribution]] contract, extended
    * from endpoints to the whole path). Credits are exact rationals
    * evaluated as one pinned integer-over-integer division per touch
    * (2/5, 1/(5·(k−2)), 1/1, …), quantized to DECIMAL(28,12) before the
    * per-channel sum.
    *
    * Scale shape: one first-conversion aggregate (user-keyed), one
    * broadcast-back join, per-user position windows (path-length
    * bounded), then a channels-sized sum. `ts` must be unique within a
    * user (the events contract) — positions are total-ordered by it.
    * Emits (channel, credit@6dp, n_first = paths opened by the
    * channel). */
  def positionAttribution(df: DataFrame, user: String, ts: String,
                          etype: String, conversion: String,
                          touches: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val firstConv = df.filter(col(etype) === conversion)
      .groupBy(col(user)).agg(min(col(ts)).as("_cts"))
    val path = df.filter(col(etype).isin(touches: _*))
      .join(firstConv, Seq(user))
      .filter(col(ts) < col("_cts"))
    val wAsc = Window.partitionBy(col(user)).orderBy(col(ts).asc)
    val wAll = Window.partitionBy(col(user))
    val credited = path
      .withColumn("_pos", row_number().over(wAsc))
      .withColumn("_k", count(lit(1)).over(wAll))
      .withColumn("_credit",
        when(col("_k") === 1, lit(1.0))
          .when(col("_k") === 2, lit(1) / lit(2.0))
          .when(col("_pos") === 1 || col("_pos") === col("_k"),
            lit(2) / lit(5.0))
          .otherwise(lit(1) / (lit(5.0) * (col("_k") - 2))))
    credited
      .groupBy(col(etype).as("channel"))
      .agg(round(sum(col("_credit").cast("decimal(28,12)"))
          .cast("double"), 6).as("credit"),
        sum((col("_pos") === 1).cast("long")).as("n_first"))
  }

  /** Nelson–Aalen cumulative-hazard estimator (Nelson 1972; Aalen 1978)
    * — the integral companion to [[kaplanMeier]]: H(t) = Σ_{dᵢ ≤ t}
    * eventsᵢ/at-riskᵢ, with the standard variance estimate
    * Var(H(t)) = Σ_{dᵢ ≤ t} eventsᵢ/at-riskᵢ². Subjects, durations, and
    * right censoring follow the KM contract exactly (same per-subject
    * aggregate, same calendar-bounded duration axis), so the two curves
    * are directly comparable on the same axis — H is the preferred
    * estimator for hazard-ratio eyeballing and for small risk sets where
    * the KM product degenerates.
    *
    * Scale shape: identical to [[kaplanMeier]] — one subject-keyed
    * aggregate, then ordered windows over the calendar-bounded duration
    * frame only. Per-duration hazard and variance terms quantize to
    * DECIMAL(28,12) before the cumulative sums (cross-engine parity).
    * Emits one row per distinct duration: (duration_hr, n_risk,
    * n_events, n_censored, cum_hazard@6dp, hazard_var@6dp). */
  def nelsonAalen(df: DataFrame, keys: Seq[String], ts: String,
                  censorDays: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ss = df.groupBy(keys.map(col): _*)
      .agg(min(col(ts)).cast("long").as("_a"), max(col(ts)).cast("long").as("_b"))
    val mx = ss.agg(max(col("_b")).as("_mx"))
    val byDur = ss.crossJoin(broadcast(mx))
      .withColumn("_dur",
        floor((col("_b") - col("_a")) / lit(3600.0)).cast("long"))
      .withColumn("_obs",
        (col("_b") < col("_mx") - lit(censorDays * 86400L)).cast("int"))
      .groupBy(col("_dur").as("duration_hr"))
      .agg(sum(col("_obs")).as("n_events"),
        sum(lit(1) - col("_obs")).as("n_censored"),
        count(lit(1)).as("_tot"))
    val wCum = Window.orderBy(col("duration_hr"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wRisk = Window.orderBy(col("duration_hr"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    byDur
      .withColumn("n_risk", sum(col("_tot")).over(wRisk))
      .withColumn("_h", (col("n_events").cast("double") /
        col("n_risk").cast("double")).cast("decimal(28,12)"))
      .withColumn("_v", (col("n_events").cast("double") /
        (col("n_risk").cast("double") * col("n_risk").cast("double")))
        .cast("decimal(28,12)"))
      .withColumn("cum_hazard",
        round(sum(col("_h")).over(wCum).cast("double"), 6))
      .withColumn("hazard_var",
        round(sum(col("_v")).over(wCum).cast("double"), 6))
      .select(col("duration_hr"), col("n_risk"), col("n_events"),
        col("n_censored"), col("cum_hazard"), col("hazard_var"))
  }

  /** Two-group log-rank test (Mantel 1966; Peto & Peto 1972) — "do the
    * two survival curves differ?", the canonical companion to
    * [[kaplanMeier]]. Subjects, durations, and censoring follow the KM
    * contract exactly; `treat` must be constant per subject (it is read
    * through a per-subject max). At each duration with ≥1 event:
    * expected treated events E_t = d_t·n1_t/n_t and hypergeometric
    * variance V_t = d_t·(n1_t/n_t)·(1−n1_t/n_t)·(n_t−d_t)/(n_t−1);
    * χ² = (Σ(d1_t − E_t))²/ΣV_t, asymptotically χ²(1) under equal
    * hazards.
    *
    * Scale shape: one per-subject aggregate, then everything rides the
    * calendar-bounded duration axis (the KM contract); per-duration O−E
    * and V terms quantize to DECIMAL(28,12) before their sums, and the
    * final ratio is one row of double arithmetic. Emits one row:
    * (n_treat, n_ctrl, events_treat, events_ctrl, chi2@6dp — NULL when
    * the variance sum is 0, e.g. a single shared event time exhausts
    * one side). */
  def logRank(df: DataFrame, keys: Seq[String], ts: String, treat: Column,
              censorDays: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ss = df.groupBy(keys.map(col): _*)
      .agg(min(col(ts)).cast("long").as("_a"), max(col(ts)).cast("long").as("_b"),
        max(treat.cast("int")).as("_t"))
    val mx = ss.agg(max(col("_b")).as("_mx"))
    val bd = ss.crossJoin(broadcast(mx))
      .withColumn("_dur",
        floor((col("_b") - col("_a")) / lit(3600.0)).cast("long"))
      .withColumn("_obs",
        (col("_b") < col("_mx") - lit(censorDays * 86400L)).cast("int"))
      .groupBy(col("_dur"))
      .agg(sum(col("_t")).as("_tot1"),
        sum(lit(1) - col("_t")).as("_tot0"),
        sum(col("_t") * col("_obs")).as("_d1"),
        sum((lit(1) - col("_t")) * col("_obs")).as("_d0"))
    val wRisk = Window.orderBy(col("_dur"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val terms = bd
      .withColumn("_n1", sum(col("_tot1")).over(wRisk))
      .withColumn("_n0", sum(col("_tot0")).over(wRisk))
      .withColumn("_n", col("_n1") + col("_n0"))
      .withColumn("_d", col("_d1") + col("_d0"))
      .filter(col("_d") > 0)
      .withColumn("_p1", col("_n1").cast("double") / col("_n").cast("double"))
      .withColumn("_oe", (col("_d1").cast("double") -
          col("_d").cast("double") * col("_p1")).cast("decimal(28,12)"))
      .withColumn("_v", when(col("_n") > 1,
        (col("_d").cast("double") * col("_p1") * (lit(1.0) - col("_p1")) *
          (col("_n") - col("_d")).cast("double") /
          (col("_n") - 1).cast("double")).cast("decimal(28,12)"))
        .otherwise(lit(0.0).cast("decimal(28,12)")))
    val tots = ss.agg(sum(col("_t")).as("n_treat"),
      sum(lit(1) - col("_t")).as("n_ctrl"))
    terms.agg(
        sum(col("_d1")).as("events_treat"), sum(col("_d0")).as("events_ctrl"),
        sum(col("_oe")).cast("double").as("_soe"),
        sum(col("_v")).cast("double").as("_sv"))
      .crossJoin(broadcast(tots))
      .select(col("n_treat"), col("n_ctrl"),
        col("events_treat"), col("events_ctrl"),
        when(col("_sv") > 0,
          round(col("_soe") * col("_soe") / col("_sv"), 6)).as("chi2"))
  }

  /** 2×2 difference-in-differences: the causal-inference workhorse for
    * "did the launch move the metric" questions.
    *   DiD = (ȳ_treat,post − ȳ_treat,pre) − (ȳ_ctrl,post − ȳ_ctrl,pre)
    * with the unpooled standard error √(Σ s²_cell/n_cell) and its t
    * statistic (equivalent to the OLS interaction coefficient with
    * heteroskedasticity-robust cell variances).
    *
    * One scan, one 12-statistic aggregate (per-cell n/Σy/Σy² through
    * conditional sums; y and y² quantize to DECIMAL(28,10) per row before
    * summing, so the means and variances are partition-order-independent
    * and oracle-exact). Cells with fewer than 2 observations yield NULL
    * variance (guarded before the n−1 division — ANSI mode raises), which
    * nulls se/t but never the point estimate. Emits one row:
    * per-cell means + (did, se, t_stat), all at 6 dp. */
  def diffInDiff(df: DataFrame, outcome: String, isTreat: Column,
                 isPost: Column): DataFrame = {
    val base = df.filter(col(outcome).isNotNull)
      .select(isTreat.cast("int").as("_t"), isPost.cast("int").as("_p"),
        col(outcome).cast("double").as("_y"))
    def cell(t: Int, p: Int, c: Column): Column =
      sum(when(col("_t") === t && col("_p") === p, c))
    val aggs = for ((t, p) <- Seq((1, 1), (1, 0), (0, 1), (0, 0))) yield Seq(
      cell(t, p, lit(1L)).as(s"_n$t$p"),
      cell(t, p, col("_y").cast("decimal(28,10)")).as(s"_s$t$p"),
      cell(t, p, (col("_y") * col("_y")).cast("decimal(28,10)")).as(s"_q$t$p"))
    val a = base.agg(aggs.flatten.head, aggs.flatten.tail: _*)
    def nD(t: Int, p: Int) = col(s"_n$t$p").cast("double")
    def mean(t: Int, p: Int) = col(s"_s$t$p").cast("double") / nD(t, p)
    def variance(t: Int, p: Int) = when(col(s"_n$t$p") > 1,
      (col(s"_q$t$p").cast("double") -
        col(s"_s$t$p").cast("double") * col(s"_s$t$p").cast("double") / nD(t, p))
        / (nD(t, p) - 1.0))
    val did = (mean(1, 1) - mean(1, 0)) - (mean(0, 1) - mean(0, 0))
    val se = sqrt(variance(1, 1) / nD(1, 1) + variance(1, 0) / nD(1, 0) +
      variance(0, 1) / nD(0, 1) + variance(0, 0) / nD(0, 0))
    a.select(
      col("_n11").as("n_treat_post"), col("_n10").as("n_treat_pre"),
      col("_n01").as("n_ctrl_post"), col("_n00").as("n_ctrl_pre"),
      round(mean(1, 1), 6).as("m_treat_post"),
      round(mean(1, 0), 6).as("m_treat_pre"),
      round(mean(0, 1), 6).as("m_ctrl_post"),
      round(mean(0, 0), 6).as("m_ctrl_pre"),
      round(did, 6).as("did"),
      round(se, 6).as("se"),
      round(did / se, 6).as("t_stat"))
  }
}
