package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Technical-indicator windows over price series — the feature family the
  * reference's analysis stage derives from closing prices (rolling
  * volatility at `analysis_part/main.py`; pct-change features feeding the
  * forecaster). Bollinger bands and Cutler's RSI are the two classic
  * fixed-window indicators; both are ONE ordered window per series key —
  * a single hash-partition shuffle on the series key, then per-partition
  * sorted scans. At 100 TB the frame never leaves the executor: window
  * state is O(n) rows per series position, no driver involvement.
  *
  * Cross-engine determinism: all window sums accumulate in DECIMAL — the
  * per-row cast double→DECIMAL is exact and engine-portable, the decimal
  * sum is associative, and only the final band/ratio math runs in double,
  * so results are bit-identical across engines before the final `round`.
  */
object Indicators {

  private val Dec = "decimal(28,10)"

  /** Bollinger bands: `n`-row rolling mean ± `k`·sample-stddev per series,
    * NULL until a full `n`-row frame exists (the standard chart contract).
    * Stddev is computed from exact decimal Σx and Σx² (textbook
    * (Σx² − (Σx)²/n)/(n−1)) rather than a streaming variance kernel, so
    * both engines evaluate the identical closed form. */
  def bollinger(df: DataFrame, value: String, keys: Seq[String],
                ord: Seq[Column], n: Int = 20, k: Double = 2.0): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(-(n - 1), 0)
    val x     = col(value).cast(Dec)
    val cnt   = count(col(value)).over(w)
    val sx    = sum(x).over(w).cast("double")
    val sxx   = sum((col(value) * col(value)).cast(Dec)).over(w).cast("double")
    val mid   = sx / cnt
    val sd    = sqrt((sxx - sx * sx / cnt) / (cnt - 1))
    val full  = cnt === n
    df.withColumn("bb_mid",   when(full, round(mid, 6)))
      .withColumn("bb_upper", when(full, round(mid + lit(k) * sd, 6)))
      .withColumn("bb_lower", when(full, round(mid - lit(k) * sd, 6)))
  }

  /** Cutler's RSI: 100·ΣgainsₙΔ / (ΣgainsₙΔ + ΣlossesₙΔ) over the last `n`
    * one-step diffs (the SMA variant of RSI — Wilder's smoothed form is a
    * recursive EWMA, deliberately not used so the indicator stays a pure
    * window expression). NULL until `n` diffs exist or when the frame is
    * flat (Σgain + Σloss = 0); a frame with zero losses reads 100. */
  def rsi(df: DataFrame, value: String, keys: Seq[String],
          ord: Seq[Column], n: Int = 14): DataFrame = {
    val wLag = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val wSum = wLag.rowsBetween(-(n - 1), 0)
    val d    = col("_diff")
    val withDiff = df
      .withColumn("_diff", (col(value) - lag(col(value), 1).over(wLag)).cast(Dec))
      .withColumn("_gain", when(d > 0, d).otherwise(lit(0).cast(Dec)))
      .withColumn("_loss", when(d < 0, -d).otherwise(lit(0).cast(Dec)))
    val g  = sum(col("_gain")).over(wSum).cast("double")
    val l  = sum(col("_loss")).over(wSum).cast("double")
    val nd = count(d).over(wSum)
    withDiff
      .withColumn("rsi",
        when(nd === n && g + l > 0, round(lit(100.0) * g / (g + l), 6)))
      .drop("_diff", "_gain", "_loss")
  }

  /** Rolling Pearson correlation between two columns over the last `n`
    * rows per series — the pairwise co-movement signal (rolling beta's
    * numerator). Same exact-decimal scheme as [[bollinger]]: the five
    * window sums (Σx, Σy, Σxy, Σx², Σy²) accumulate in DECIMAL, only the
    * closed-form ratio runs in double. NULL until the frame is full or
    * when either side is constant in the frame. */
  def rollingCorr(df: DataFrame, x: String, y: String, keys: Seq[String],
                  ord: Seq[Column], n: Int = 20): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(-(n - 1), 0)
    val bothNotNull = col(x).isNotNull && col(y).isNotNull
    def dsum(e: Column) = sum(when(bothNotNull, e.cast(Dec))).over(w).cast("double")
    val cnt = count(when(bothNotNull, 1)).over(w)
    val (sx, sy)   = (dsum(col(x)), dsum(col(y)))
    val (sxx, syy) = (dsum(col(x) * col(x)), dsum(col(y) * col(y)))
    val sxy        = dsum(col(x) * col(y))
    val cov  = cnt * sxy - sx * sy
    val vx   = cnt * sxx - sx * sx
    val vy   = cnt * syy - sy * sy
    df.withColumn("rolling_corr",
      when(cnt === n && vx > 0 && vy > 0,
        round(cov / sqrt(vx * vy), 6)))
  }

  /** Rolling OLS of y on x over a trailing n-row frame per series — the
    * rolling hedge ratio / market beta every desk computes (slope of the
    * regression line in the window, plus its intercept). Same
    * exact-decimal sufficient-statistic scheme as [[rollingCorr]]: five
    * DECIMAL window sums, the closed form in double. NULL until the frame
    * is full or when x is constant in it. */
  def rollingBeta(df: DataFrame, y: String, x: String, keys: Seq[String],
                  ord: Seq[Column], n: Int = 20): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(-(n - 1), 0)
    val bothNotNull = col(x).isNotNull && col(y).isNotNull
    def dsum(e: Column) = sum(when(bothNotNull, e.cast(Dec))).over(w).cast("double")
    val cnt = count(when(bothNotNull, 1)).over(w)
    val (sx, sy) = (dsum(col(x)), dsum(col(y)))
    val sxx      = dsum(col(x) * col(x))
    val sxy      = dsum(col(x) * col(y))
    val cov = cnt * sxy - sx * sy
    val vx  = cnt * sxx - sx * sx
    df.withColumn("rolling_beta",
        when(cnt === n && vx > 0, round(cov / vx, 6)))
      .withColumn("rolling_alpha",
        when(cnt === n && vx > 0,
          round((sy - cov / vx * sx) / cnt, 6)))
  }

  /** Time-weighted average price (TWAP) per series: each observation holds
    * until the next one, so its weight is that interval's duration; the
    * final observation of a series carries no forward interval and drops
    * out (the standard TWAP convention for an open-ended tail). One lead
    * window + one exact-decimal aggregate. */
  def twap(df: DataFrame, value: String, keys: Seq[String],
           ts: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(ts))
    val dt = (lead(col(ts), 1).over(w).cast("long") - col(ts).cast("long"))
    df.withColumn("_dt", dt)
      .filter(col("_dt").isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("_dt")).as("span_seconds"),
        sum((col(value) * col("_dt")).cast(Dec)).cast("double").as("_wsum"))
      .withColumn("twap",
        when(col("span_seconds") > 0,
          round(col("_wsum") / col("span_seconds"), 6)))
      .drop("_wsum")
  }

  /** Rolling median (the robust smoother — spikes don't drag it the way
    * they drag a rolling mean): exact interpolated median over the
    * trailing `n`-row frame per key. Spark has no percentile window
    * aggregate, so the frame rides as a collected array per row — memory
    * O(n) per in-flight row, keep `n` modest (it's a smoothing window, not
    * a history). Even frames average the two middle values; both engines
    * sort and index the same array, so q153 value-checks. NULL handling:
    * `collect_list` DROPS nulls, so the result is the median of the
    * OBSERVED values in the frame; a frame whose values are all NULL
    * yields NULL (guarded — element_at on an empty array would throw).
    * An oracle's `list()` keeps nulls — mirror with `list(x) FILTER
    * (x IS NOT NULL)` or filter upstream when cross-checking a
    * null-bearing column. The sorted frame is bound ONCE (`_sorted`)
    * so each output row pays exactly one sort. */
  def rollingMedian(df: DataFrame, value: String, keys: Seq[String],
                    ord: Seq[Column], n: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(-(n - 1), 0)
    df.withColumn("_sorted",
        array_sort(collect_list(col(value).cast("double")).over(w)))
      .withColumn("rolling_median", round(expr(
        """CASE WHEN size(_sorted) = 0 THEN CAST(NULL AS DOUBLE)
          |WHEN size(_sorted) % 2 = 1
          |THEN element_at(_sorted, CAST(size(_sorted) div 2 + 1 AS INT))
          |ELSE (element_at(_sorted, CAST(size(_sorted) div 2 AS INT))
          |    + element_at(_sorted, CAST(size(_sorted) div 2 + 1 AS INT))) / 2
          |END""".stripMargin), 6))
      .drop("_sorted")
  }

  /** Exponentially-weighted moving average per key (pandas
    * `ewm(alpha, adjust=False)` semantics: ema₁ = x₁, emaₜ = (1−α)·emaₜ₋₁ +
    * α·xₜ), evaluated as ONE per-key ordered fold over the collected series
    * — the recursion is inherently sequential per key, so the honest
    * distributed shape is per-key arrays (fine for time series: a key's
    * history fits an executor; for 10⁸-row single keys, fold per chunk and
    * stitch with pow((1−α), chunk_len) carries). The fold runs left-to-
    * right in both engines (Spark `aggregate` ≡ DuckDB `list_reduce` with
    * the first element as init), so the q144 oracle matches bit-for-bit
    * before the final round. Pass an exactly-representable α (0.25, 0.5…)
    * for cross-engine checks. Emits (keys, n_obs, ema = final smoothed
    * value). */
  def ema(df: DataFrame, value: String, keys: Seq[String], ts: String,
          alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha $alpha outside (0, 1]")
    val packed = df.filter(col(value).isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(array_sort(collect_list(struct(col(ts).as("t"),
        col(value).cast("double").as("x")))).as("seq"))
    packed.select(keys.map(col) :+
      size(col("seq")).cast("long").as("n_obs") :+
      round(expr(
        s"aggregate(slice(transform(seq, p -> p.x), 2, size(seq) - 1), " +
          s"element_at(seq, 1).x, " +
          s"(acc, x) -> ${1 - alpha}D * acc + ${alpha}D * x)"), 6).as("ema"): _*)
  }

  /** Per-row running EMA (pandas `ewm(alpha, adjust=False).mean()` as a
    * COLUMN): every row gets the smoothed value at its own position, the
    * feature-engineering shape (lag features, signal crossovers) — [[ema]]
    * keeps only the final value. One per-key `aggregate` fold builds the
    * running array left-to-right (identical arithmetic to DuckDB's prefix
    * `list_reduce`, so q157 value-checks bit-for-bit before the round),
    * then `arrays_zip` + explode re-seats each value on its row. `carry`
    * columns ride the packed struct and come back out (e.g. a row id).
    * The array append is O(n²) per key in copies — fine for series that
    * fit an executor; for 10⁸-row keys use [[emaSeriesChunked]], which is
    * the same math restated with bounded per-chunk state. */
  def emaSeries(df: DataFrame, value: String, keys: Seq[String], ts: String,
                alpha: Double, carry: Seq[String] = Nil): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha $alpha outside (0, 1]")
    // "_gt"/"_gx" struct aliases: deliberately obscure so a carry column
    // named "t" or "x" (or ts/value themselves) can't collide with them
    val fields = (col(ts).as("_gt") +: carry.map(col)) :+
      col(value).cast("double").as("_gx")
    val packed = df.filter(col(value).isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(array_sort(collect_list(struct(fields: _*))).as("seq"))
    // native O(n) EMA scan — same IEEE step order as the SQL fold it
    // replaces, minus the per-step accumulator-array copy
    graft.expressions.SeriesScan.register(df.sparkSession)
    val runFold = expr(
      s"graft_ema_scan(transform(seq, p -> p._gx), " +
        s"CAST('$alpha' AS DOUBLE), CAST('${1 - alpha}' AS DOUBLE))")
    packed.withColumn("_emas", runFold)
      .select((keys.map(col) :+
        explode(arrays_zip(col("seq"), col("_emas"))).as("_z")): _*)
      .select((keys.map(col) ++
        carry.map(c => col(s"_z.seq.$c").as(c)) :+
        col("_z.seq._gx").as(value) :+
        quant6(col("_z._emas")).as("ema")): _*)
  }

  /** 6-decimal quantization in PURE double arithmetic (floor(x·10⁶+½)/10⁶):
    * unlike `round(x, 6)`, every step is IEEE-double and engine-portable,
    * so a value sitting a few ulps under a .5 boundary (e.g. …3749999999)
    * quantizes identically in Spark and DuckDB — decimal-string rounders
    * disagree exactly there. Used where a long fold makes boundary
    * stragglers statistically certain (10⁴ running EMAs hit ~3). */
  private def quant6(c: Column): Column =
    floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  /** Scale-safe default for per-row EMA (round-6 ask): keys whose series
    * fit comfortably in one task run the sequential fold ([[emaSeries]] —
    * bit-identical to an oracle engine's left-to-right recursion), keys
    * beyond `inlineMax` rows run the chunk-stitch form
    * ([[emaSeriesChunked]] — O(n/chunkLen) state, no quadratic array).
    * Routing is value-based (one per-key count + two semi-joins), so a
    * catalog/oracle workload where every key is modest takes the
    * fold path unchanged, while a 10⁸-row hot key can no longer pick the
    * quadratic plan. The two forms agree to ≤1 quant6 ulp (FP
    * non-associativity makes bit-exact parallel replication of a
    * sequential recursion impossible — measured: ~1.5e-3 of rows flip the
    * 6dp rounding, which is why routing, not blanket chunking, is the
    * hash-stable default). */
  def emaSeriesAuto(df: DataFrame, value: String, keys: Seq[String],
                    ts: String, alpha: Double, carry: Seq[String] = Nil,
                    chunkLen: Int = 64, inlineMax: Long = 1 << 20): DataFrame = {
    // only the OVERSIZED key set is materialized for routing — it has at
    // most total/inlineMax members by construction, so it broadcasts even
    // when the overall key population is billions. The routing joins are
    // NULL-SAFE (<=>): groupBy pools all-null keys into one group, and a
    // missing-key hot group is the classic skew case — plain equality
    // would silently drop it back onto the quadratic fold path
    // α = 1 degenerates to the identity (emaₜ = xₜ): a per-row projection,
    // no fold, no routing — and the chunked leg (which requires α < 1)
    // must not be constructed at all
    if (alpha == 1.0)
      return df.filter(col(value).isNotNull)
        .select((keys.map(col) ++ carry.map(col) :+
          col(value).cast("double").as(value) :+
          quant6(col(value).cast("double")).as("ema")): _*)
    val bigKeys = df.filter(col(value).isNotNull)
      .groupBy(keys.map(col): _*).agg(count(lit(1)).as("_kn"))
      .filter(col("_kn") > inlineMax).select(keys.map(col): _*)
    // explicit (tiny: ≤ total/inlineMax rows) driver check before building
    // the routed union: BOTH legs re-evaluate the input subplan — which
    // may itself carry aggregates and windows (e.g. ATR's bar frame) — so
    // the common no-oversized-key case would pay that twice plus the
    // broadcast machinery of a provably empty chunked leg
    if (bigKeys.isEmpty)
      return emaSeries(df, value, keys, ts, alpha, carry)
    val bk = broadcast(bigKeys).as("_bk")
    val lhs = df.as("_lhs")
    val cond = keys.map(k => col(s"_lhs.$k") <=> col(s"_bk.$k"))
      .reduce(_ && _)
    emaSeries(lhs.join(bk, cond, "left_anti"), value, keys, ts, alpha,
        carry)
      .unionByName(
        emaSeriesChunked(lhs.join(bk, cond, "left_semi"), value, keys,
          ts, alpha, chunkLenFor(alpha, chunkLen), carry))
  }

  /** Largest chunk length the 2^40 intra-chunk dynamic-range bound allows
    * for this α, capped at `want`. The chunked leg is often built eagerly
    * (before knowing whether any key is oversized), so its α-precision
    * guard must hold for ANY α — fast EMAs (large α) down-weight history
    * so hard that the short chunks this forces lose nothing. */
  private def chunkLenFor(alpha: Double, want: Int = 64): Int =
    math.min(want, math.max(2,
      (40 * math.log(2.0) / math.log1p(alpha / (1 - alpha))).toInt))

  /** [[emaSeries]] at unbounded key size: the chunk-and-stitch form. Rows
    * split into `chunkLen`-row chunks per key; within a chunk the EMA
    * prefix is the CLOSED FORM intraₜ = (1−α)^posₜ · Σ_{j≤t} coefⱼ·xⱼ·
    * (1−α)^(−posⱼ) (one window cumsum — no per-row array), and chunks
    * stitch through the carry recursion carry_c = intraEnd_c +
    * pow(1−α, len_c)·carry_{c−1} folded over the (n/chunkLen)-element
    * chunk-summary array. Per-key state is O(n/chunkLen), the full-series
    * array never materializes, and each row's result is intraₜ +
    * (1−α)^(posₜ+1)·carry — IndicatorsSpec pins ≡ [[emaSeries]] across
    * chunk sizes. `chunkLen` is capped per α so the intra-chunk weight
    * ratio (1−α)^(−pos) stays within ~2⁴⁰ (precision headroom; older
    * terms are exponentially down-weighted in the true EMA anyway). */
  def emaSeriesChunked(df: DataFrame, value: String, keys: Seq[String],
                       ts: String, alpha: Double, chunkLen: Int = 64,
                       carry: Seq[String] = Nil): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha $alpha outside (0, 1)")
    require(chunkLen >= 2, s"chunkLen $chunkLen < 2")
    require((chunkLen - 1) * math.log1p(alpha / (1 - alpha)) <
      40 * math.log(2.0),
      s"chunkLen $chunkLen too large for alpha $alpha: intra-chunk weight " +
        "dynamic range exceeds 2^40 — shrink the chunk")
    val beta = 1 - alpha
    val wKey = Window.partitionBy(keys.map(col): _*).orderBy(col(ts))
    val base = df.filter(col(value).isNotNull)
      .withColumn("_rn", row_number().over(wKey) - 1)
      .withColumn("_chunk", (col("_rn") / lit(chunkLen)).cast("int"))
      .withColumn("_pos", pmod(col("_rn"), lit(chunkLen)).cast("int"))
      .withColumn("_coef",
        when(col("_rn") === 0, lit(1.0)).otherwise(lit(alpha)))
    val wChunk = Window
      .partitionBy((keys :+ "_chunk").map(col): _*).orderBy(col(ts))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withIntra = base
      .withColumn("_cum", sum(col("_coef") * col(value).cast("double") *
        pow(lit(beta), -col("_pos"))).over(wChunk))
      .withColumn("_intra", pow(lit(beta), col("_pos")) * col("_cum"))
    val chunkSummaries = withIntra
      .groupBy((keys :+ "_chunk").map(col): _*)
      .agg(count(lit(1)).as("_len"),
        max_by(col("_intra"), col("_pos")).as("_intra_end"))
    val carries = chunkSummaries
      .groupBy(keys.map(col): _*)
      .agg(array_sort(collect_list(struct(col("_chunk"), col("_len"),
        col("_intra_end")))).as("_cs"))
      .withColumn("_carr", expr(
        s"""aggregate(_cs,
           |  named_struct('arr', CAST(array() AS ARRAY<DOUBLE>), 'prev', 0.0D),
           |  (acc, c) -> named_struct(
           |    'arr', concat(acc.arr, array(acc.prev)),
           |    'prev', c._intra_end + pow(${beta}D, c._len) * acc.prev),
           |  acc -> acc.arr)""".stripMargin))
      .select((keys.map(col) :+
        posexplode(col("_carr")).as(Seq("_chunk", "_carry_in"))): _*)
    // NULL-SAFE stitch join: groupBy pools all-null keys into a real group
    // (the missing-key hot-group case emaSeriesAuto routes here), and a
    // plain equality join would silently drop exactly those rows
    val stitch = (keys :+ "_chunk")
      .map(c => col(s"_wi.$c") <=> col(s"_cr.$c")).reduce(_ && _)
    withIntra.as("_wi").join(carries.as("_cr"), stitch)
      .withColumn("ema", quant6(col("_intra") +
        pow(lit(beta), col("_pos") + 1) * col("_carry_in")))
      .select((keys.map(k => col(s"_wi.$k").as(k)) ++ carry.map(col) :+
        col(value).cast("double").as(value) :+ col("ema")): _*)
  }

  /** OHLC bars: open/high/low/close (+ mean and tick count) per series per
    * time bucket — the canonical market-data downsample. One hash
    * aggregate with positional first/last picked by `max_by`/`min_by` on
    * the (unique) timestamp, so bars are deterministic under any
    * partitioning. */
  def ohlcBars(df: DataFrame, value: String, keys: Seq[String], ts: String,
               bucket: String = "hour"): DataFrame =
    df.filter(col(value).isNotNull)
      .groupBy((keys.map(col) :+ date_trunc(bucket, col(ts)).as("bar")): _*)
      .agg(
        min_by(col(value), col(ts)).as("open"),
        max(col(value)).as("high"),
        min(col(value)).as("low"),
        max_by(col(value), col(ts)).as("close"),
        count(lit(1)).as("n_ticks"),
        (sum(col(value).cast(Dec)).cast("double") / count(lit(1)))
          .as("mean_raw"))
      .withColumn("vwap_proxy", round(col("mean_raw"), 6))
      .drop("mean_raw")

  /** Per-key simple OLS: slope/intercept/R² of y on x per group, from the
    * five exact-decimal sufficient statistics (the closed form — no
    * iterative fit, one aggregate pass; the per-symbol beta every market
    * analytics stack computes). NULL slope when x is constant; NULL R²
    * when either side is constant. */
  def olsPerKey(df: DataFrame, x: String, y: String,
                keys: Seq[String]): DataFrame = {
    val ok = col(x).isNotNull && col(y).isNotNull
    def dsum(e: Column) = sum(when(ok, e.cast(Dec))).cast("double")
    val agged = df.groupBy(keys.map(col): _*).agg(
      count(when(ok, 1)).as("n_obs"),
      dsum(col(x)).as("_sx"), dsum(col(y)).as("_sy"),
      dsum(col(x) * col(x)).as("_sxx"), dsum(col(y) * col(y)).as("_syy"),
      dsum(col(x) * col(y)).as("_sxy"))
    val n   = col("n_obs")
    val cov = n * col("_sxy") - col("_sx") * col("_sy")
    val vx  = n * col("_sxx") - col("_sx") * col("_sx")
    val vy  = n * col("_syy") - col("_sy") * col("_sy")
    agged
      .withColumn("slope", when(vx > 0, round(cov / vx, 6)))
      .withColumn("intercept",
        when(vx > 0, round((col("_sy") - cov / vx * col("_sx")) / n, 6)))
      .withColumn("r2", when(vx > 0 && vy > 0, round(cov * cov / (vx * vy), 6)))
      .drop("_sx", "_sy", "_sxx", "_syy", "_sxy")
  }

  /** Shannon entropy of a categorical column per group (nats): −Σ p·ln p
    * over exact category counts. Two hash aggregates; the per-category
    * terms are cast to DECIMAL before the final sum so accumulation order
    * can't wiggle low bits. */
  def entropy(df: DataFrame, category: String, keys: Seq[String]): DataFrame = {
    val counts = df.groupBy((keys.map(col) :+ col(category)): _*)
      .agg(count(lit(1)).as("_c"))
    val totals = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
    counts
      .withColumn("_n", sum(col("_c")).over(totals))
      .withColumn("_term",
        (-(col("_c") / col("_n")) * log(col("_c") / col("_n")))
          .cast("decimal(28,12)"))
      .groupBy(keys.map(col): _*)
      .agg(max(col("_n")).as("n_rows"),
        count(lit(1)).as("n_categories"),
        round(sum(col("_term")).cast("double"), 6).as("entropy_nats"))
  }

  /** Drawdown from the running peak: value / max-so-far − 1 per series
    * (≤ 0 by construction; NULL while the running peak is non-positive).
    * One cumulative-max window — the classic risk curve. */
  def drawdown(df: DataFrame, value: String, keys: Seq[String],
               ord: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val peak = max(col(value)).over(w)
    df.withColumn("peak", peak)
      .withColumn("drawdown",
        when(peak > 0, round(col(value) / peak - 1.0, 6)))
  }

  /** MACD(fast, slow, signal): the classic EMA-crossover momentum triple —
    * macd = EMA_fast − EMA_slow, signal = EMA_signal(macd), hist = macd −
    * signal. Built by COMPOSING [[emaSeriesAuto]] (three passes + one
    * row-key join) rather than a bespoke one-pass fold, so every EMA leg
    * inherits the size-routed scale guard: modest keys run the sequential
    * fold bit-identical to an oracle engine's recursion, oversized keys
    * take the chunk-stitch path instead of a quadratic array build. The
    * spans' α = 2/(span+1) need not be exactly representable — both
    * engines start from the identical correctly-rounded double (the oracle
    * embeds this JVM's shortest-repr constant), so the folds agree
    * bit-for-bit before the 6-dp quantization each leg applies.
    * `carry` must, together with `ts`, uniquely identify rows in a key
    * (it is the join key that re-seats the two EMA legs on the same row). */
  def macd(df: DataFrame, value: String, keys: Seq[String], ts: String,
           fast: Int = 12, slow: Int = 26, signalSpan: Int = 9,
           carry: Seq[String] = Nil, inlineMax: Long = 1 << 20): DataFrame = {
    require(0 < fast && fast < slow, s"need 0 < fast($fast) < slow($slow)")
    // same size routing as [[emaSeriesAuto]] (including its explicit
    // driver check on the tiny ≤ total/inlineMax big-key frame): modest
    // keys take the fused folds (ONE wide shuffle, no row-key join);
    // oversized keys take the three-leg chunk-stitch composition, which
    // never materializes a quadratic array.
    val bigKeys = df.filter(col(value).isNotNull)
      .groupBy(keys.map(col): _*).agg(count(lit(1)).as("_kn"))
      .filter(col("_kn") > inlineMax).select(keys.map(col): _*)
    if (bigKeys.isEmpty)
      macdFused(df, value, keys, ts, fast, slow, signalSpan, carry)
    else {
      val bk = broadcast(bigKeys).as("_bk")
      val lhs = df.as("_lhs")
      val cond = keys.map(k => col(s"_lhs.$k") <=> col(s"_bk.$k"))
        .reduce(_ && _)
      macdFused(lhs.join(bk, cond, "left_anti"), value, keys, ts,
          fast, slow, signalSpan, carry)
        .unionByName(macdComposed(lhs.join(bk, cond, "left_semi"),
          value, keys, ts, fast, slow, signalSpan, carry))
    }
  }

  /** The fused small-key MACD path: one groupBy packs the series, one
    * `aggregate` fold carries BOTH EMA states left-to-right (identical
    * arithmetic to the two independent folds — each state only reads
    * itself), the macd list derives per-position from the 6-dp-quantized
    * legs, and the signal fold replays emaSeries over that list. Array
    * appends are O(n²) per key in copies like [[emaSeries]] — which is
    * exactly why [[macd]] routes oversized keys elsewhere. */
  private def macdFused(df: DataFrame, value: String, keys: Seq[String],
                        ts: String, fast: Int, slow: Int, signalSpan: Int,
                        carry: Seq[String]): DataFrame = {
    val aF = 2.0 / (fast + 1); val aS = 2.0 / (slow + 1)
    val aG = 2.0 / (signalSpan + 1)
    val bF = 1.0 - aF; val bS = 1.0 - aS; val bG = 1.0 - aG
    val fields = (col(ts).as("_gt") +: carry.map(col)) :+
      col(value).cast("double").as("_gx")
    val packed = df.filter(col(value).isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(array_sort(collect_list(struct(fields: _*))).as("seq"))
    // two independent double-array folds over the SAME packed column —
    // plain double appends (the q157 shape; an array-of-struct append
    // costs ~10× per copy), and `seq` is an aggregate output so neither
    // fold can be re-evaluated by project collapse
    graft.expressions.SeriesScan.register(df.sparkSession)
    def emaFold(field: String, a: Double, b: Double) = expr(
      s"graft_ema_scan(transform(seq, p -> p.$field), " +
        s"CAST('$a' AS DOUBLE), CAST('$b' AS DOUBLE))")
    // explode immediately after the folds: derived array chains would be
    // inlined by project collapse and re-evaluate the O(n²) folds — here
    // each fold result feeds exactly one generator
    val leg = packed
      .withColumn("_ff", emaFold("_gx", aF, bF))
      .withColumn("_sf", emaFold("_gx", aS, bS))
      .select((keys.map(col) :+
        explode(arrays_zip(col("seq"), col("_ff"), col("_sf"))).as("_z")): _*)
      .select((keys.map(col) :+ col("_z.seq._gt").as("_gt")) ++
        (carry.map(c => col(s"_z.seq.$c").as(c)) :+
        col("_z.seq._gx").as("_gx") :+
        quant6(col("_z._ff")).as("ema_fast") :+
        quant6(col("_z._sf")).as("ema_slow")): _*)
      .withColumn("_gm", col("ema_fast") - col("ema_slow"))
    val fields2 = (col("_gt") +: carry.map(col)) ++
      Seq(col("_gx"), col("ema_fast"), col("ema_slow"), col("_gm"))
    val packed2 = leg.groupBy(keys.map(col): _*)
      .agg(array_sort(collect_list(struct(fields2: _*))).as("seq2"))
    val sigFold = expr(
      s"graft_ema_scan(transform(seq2, p -> p._gm), " +
        s"CAST('$aG' AS DOUBLE), CAST('$bG' AS DOUBLE))")
    packed2.withColumn("_sg", sigFold)
      .select((keys.map(col) :+
        explode(arrays_zip(col("seq2"), col("_sg"))).as("_z")): _*)
      .select((keys.map(col) :+
        col("_z.seq2._gt").as(ts)) ++ // composed leg carries ts — match it
        (carry.map(c => col(s"_z.seq2.$c").as(c)) :+
        col("_z.seq2._gx").as(value) :+
        col("_z.seq2.ema_fast").as("ema_fast") :+
        col("_z.seq2.ema_slow").as("ema_slow") :+
        col("_z.seq2._gm").as("macd") :+
        quant6(col("_z._sg")).as("macd_signal") :+
        (col("_z.seq2._gm") - quant6(col("_z._sg"))).as("macd_hist")): _*)
  }

  /** The oversized-key MACD path: three chunk-stitch EMA legs re-seated by
    * a row-key join. Every key here is KNOWN oversized (the caller routed
    * them), so the legs call [[emaSeriesChunked]] directly — re-routing
    * through emaSeriesAuto would rebuild its broadcast machinery thrice
    * for keys whose size is already established. Bounded per-key state,
    * no quadratic array. */
  private def macdComposed(df: DataFrame, value: String, keys: Seq[String],
                           ts: String, fast: Int, slow: Int,
                           signalSpan: Int, carry: Seq[String]): DataFrame = {
    def leg(d: DataFrame, v: String, span: Int, cr: Seq[String]): DataFrame = {
      val a = 2.0 / (span + 1)
      if (a == 1.0) // span 1: EMA ≡ identity (see emaSeriesAuto)
        d.filter(col(v).isNotNull)
          .select((keys.map(col) ++ cr.map(col) :+
            col(v).cast("double").as(v) :+
            quant6(col(v).cast("double")).as("ema")): _*)
      else emaSeriesChunked(d, v, keys, ts, a, chunkLenFor(a), cr)
    }
    val thread = ts +: carry // ts rides along so each pass can re-order
    val f = leg(df, value, fast, thread)
      .withColumnRenamed("ema", "ema_fast")
    val s = leg(df, value, slow, thread)
      .select((keys ++ thread).map(col) :+ col("ema").as("ema_slow"): _*)
    val m = f.join(s, keys ++ thread)
      .withColumn("macd", col("ema_fast") - col("ema_slow"))
    leg(m, "macd", signalSpan, thread ++ Seq(value, "ema_fast", "ema_slow"))
      .withColumnRenamed("ema", "macd_signal")
      .withColumn("macd_hist", col("macd") - col("macd_signal"))
  }

  /** Stochastic oscillator: %K = 100·(x − minₙ)/(maxₙ − minₙ) over the
    * trailing `n`-row frame, %D = the 3-point SMA of %K. NULL until the
    * frame holds `n` observations or when the frame is flat. %D is the
    * explicit ((k + k₋₁) + k₋₂)/3 — a fixed left-to-right sum, not a
    * window AVG, so accumulation order is pinned across engines. Both
    * outputs quantize via the portable floor(x·10⁶+½)/10⁶ (see quant6). */
  def stochastic(df: DataFrame, value: String, keys: Seq[String],
                 ord: Seq[Column], n: Int = 14, smooth: Int = 3): DataFrame = {
    require(smooth == 3, "smooth is fixed at 3 (the explicit pinned-order sum)")
    val wBase = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val wN = wBase.rowsBetween(-(n - 1), 0)
    val hi  = max(col(value)).over(wN)
    val lo  = min(col(value)).over(wN)
    val cnt = count(col(value)).over(wN)
    val withK = df.withColumn("pct_k",
      when(cnt === n && hi > lo,
        quant6((col(value) - lo) / (hi - lo) * lit(100.0))))
    val k1 = lag(col("pct_k"), 1).over(wBase)
    val k2 = lag(col("pct_k"), 2).over(wBase)
    withK.withColumn("pct_d",
      when(col("pct_k").isNotNull && k1.isNotNull && k2.isNotNull,
        quant6((col("pct_k") + k1 + k2) / lit(3.0))))
  }

  /** Autocorrelation function: Pearson corr(xₜ, xₜ₋ℓ) per series for ℓ =
    * 1..maxLag — the mean-reversion / momentum fingerprint. ONE window
    * pass computes every lag column (a single Window exec, the q09
    * fan-out shape), an explode stacks (lag, pair) rows, and one hash
    * aggregate derives each lag's correlation from exact-decimal moment
    * sums. NULL when fewer than `minPairs` complete pairs or either side
    * is constant. */
  def acf(df: DataFrame, value: String, keys: Seq[String], ord: Seq[Column],
          maxLag: Int = 5, minPairs: Long = 10L): DataFrame = {
    val wBase = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    // window exprs can't sit inside a generator: materialize the lag
    // columns first (still ONE Window exec — shared spec), then explode
    val lagged = (1 to maxLag).foldLeft(df) { (acc, l) =>
      acc.withColumn(s"_l$l", lag(col(value), l).over(wBase))
    }
    val pairs = (1 to maxLag).map(l =>
      struct(lit(l).as("lag_k"), col(s"_l$l").as("xl")))
    val ex = lagged.withColumn("_p", explode(array(pairs: _*)))
      .select(keys.map(col) :+ col(value).as("x") :+
        col("_p.lag_k").as("lag_k") :+ col("_p.xl").as("xl"): _*)
    val ok = col("x").isNotNull && col("xl").isNotNull
    def dsum(e: Column) = sum(when(ok, e.cast(Dec))).cast("double")
    val agged = ex.groupBy((keys.map(col) :+ col("lag_k")): _*).agg(
      count(when(ok, 1)).as("n_pairs"),
      dsum(col("x")).as("_sx"), dsum(col("xl")).as("_sy"),
      dsum(col("x") * col("x")).as("_sxx"),
      dsum(col("xl") * col("xl")).as("_syy"),
      dsum(col("x") * col("xl")).as("_sxy"))
    val n  = col("n_pairs")
    val cov = n * col("_sxy") - col("_sx") * col("_sy")
    val vx  = n * col("_sxx") - col("_sx") * col("_sx")
    val vy  = n * col("_syy") - col("_sy") * col("_sy")
    agged.withColumn("acf",
        when(n >= minPairs && vx > 0 && vy > 0,
          round(cov / sqrt(vx * vy), 6)))
      .drop("_sx", "_sy", "_sxx", "_syy", "_sxy")
  }

  /** Candlestick pattern flags over [[ohlcBars]]: doji (body ≤ a tenth of
    * the range, scaled as |body|·10 ≤ range to avoid a 0.1 literal),
    * hammer (lower wick ≥ 2·|body| and upper wick ≤ |body|), and bullish
    * engulfing (previous bar red, this bar green, and this body spans the
    * previous one). All comparisons are on the exact bar doubles — no
    * rounded intermediates — so the booleans are engine-portable. One
    * aggregate (the bars) + one lag window per series. */
  def candlePatterns(df: DataFrame, value: String, keys: Seq[String],
                     ts: String, bucket: String = "hour"): DataFrame = {
    val bars = ohlcBars(df, value, keys, ts, bucket)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("bar"))
    val body = col("close") - col("open")
    val rng  = col("high") - col("low")
    val po = lag(col("open"), 1).over(w)
    val pc = lag(col("close"), 1).over(w)
    bars
      .withColumn("doji", rng > 0 && abs(body) * lit(10.0) <= rng)
      .withColumn("hammer", rng > 0 &&
        least(col("open"), col("close")) - col("low") >= abs(body) * lit(2.0) &&
        col("high") - greatest(col("open"), col("close")) <= abs(body))
      .withColumn("bull_engulf", pc.isNotNull &&
        pc < po && body > 0 && col("open") <= pc && col("close") >= po)
  }

  /** Donchian channel: upper/lower = max/min over the trailing `n`-row
    * frame, mid = their midpoint, plus the classic breakout flag — the
    * current value strictly exceeding the PREVIOUS row's upper band (the
    * turtle-trading entry signal; comparing against the own-row band would
    * always be false, value ≤ its own frame max). One window spec, all
    * columns in a single Window exec. NULL bands until the frame is full. */
  def donchian(df: DataFrame, value: String, keys: Seq[String],
               ord: Seq[Column], n: Int = 20): DataFrame = {
    val wBase = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val wN = wBase.rowsBetween(-(n - 1), 0)
    val cnt = count(col(value)).over(wN)
    val up  = when(cnt === n, max(col(value)).over(wN))
    val lo  = when(cnt === n, min(col(value)).over(wN))
    df.withColumn("dc_upper", up)
      .withColumn("dc_lower", lo)
      .withColumn("dc_mid",
        when(cnt === n, (max(col(value)).over(wN) + min(col(value)).over(wN))
          / lit(2.0)))
      .withColumn("breakout",
        coalesce(col(value) > lag(col("dc_upper"), 1).over(wBase), lit(false)))
  }

  /** On-balance volume: OBVₜ = Σ_{i≤t} sign(xᵢ − xᵢ₋₁)·volᵢ — volume flows
    * toward the side of each price move (Granville's accumulation proxy).
    * The signed terms accumulate in exact DECIMAL (associative, so the
    * running sum is partitioning- and engine-stable); the first row of a
    * series contributes 0 (no prior move). One window spec. */
  def obv(df: DataFrame, value: String, volume: String, keys: Seq[String],
          ord: Seq[Column]): DataFrame = {
    val wBase = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val wCum = wBase.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col(value), 1).over(wBase)
    val term = when(prev.isNull, lit(0).cast(Dec))
      .when(col(value) > prev, col(volume).cast(Dec))
      .when(col(value) < prev, -col(volume).cast(Dec))
      .otherwise(lit(0).cast(Dec))
    df.withColumn("_obv_term", term)
      .withColumn("obv", round(sum(col("_obv_term")).over(wCum)
        .cast("double"), 6))
      .drop("_obv_term")
  }

  /** Engle–Granger cointegration check per series pair: stage 1 fits the
    * long-run relation y = a + b·x by exact-moment OLS, stage 2 runs the
    * (lag-0, no-intercept) Dickey–Fuller regression Δeₜ = φ·eₜ₋₁ + u on
    * the residuals and reports the DF t-statistic φ̂/se(φ̂) — strongly
    * negative ⇒ residuals mean-revert ⇒ the pair cointegrates (Engle &
    * Granger 1987). All sums accumulate in exact DECIMAL; the closed forms
    * evaluate in a pinned operation order (rss via Σd² − 2φ·Σld + φ²·Σl²,
    * se via √, never pow), so both engines agree bit-for-bit before the
    * final round. Two aggregate passes + one broadcast join back — the
    * series rows shuffle once. */
  def engleGranger(df: DataFrame, y: String, x: String, keys: Seq[String],
                   ord: Seq[Column]): DataFrame = {
    val fit = olsPerKey(df, x, y, keys)
      .select(keys.map(col) :+ col("n_obs") :+ col("slope") :+
        col("intercept"): _*)
    val wBase = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val resid = df.filter(col(x).isNotNull && col(y).isNotNull)
      .join(broadcast(fit), keys)
      .filter(col("slope").isNotNull)
      .withColumn("_e",
        col(y) - (col("intercept") + col("slope") * col(x)))
      .withColumn("_l", lag(col("_e"), 1).over(wBase))
      .withColumn("_d", col("_e") - col("_l"))
      .filter(col("_l").isNotNull)
    def dsum(e: Column) = sum(e.cast(Dec)).cast("double")
    val agged = resid.groupBy(keys.map(col): _*).agg(
      max(col("n_obs")).as("n_obs"),
      max(col("slope")).as("beta"),
      max(col("intercept")).as("alpha_int"),
      count(lit(1)).as("m"),
      dsum(col("_l") * col("_d")).as("_sld"),
      dsum(col("_l") * col("_l")).as("_sll"),
      dsum(col("_d") * col("_d")).as("_sdd"))
    // divisors are null-guarded (not CASE-wrapped around the division):
    // ANSI mode raises DIVIDE_BY_ZERO even under a guarding CASE when the
    // division is hoisted as a common subexpression — a NULL divisor
    // instead null-propagates through every downstream form
    val sllSafe = when(col("_sll") > 0, col("_sll"))
    val mSafe   = when(col("m") > 1, col("m") - 1)
    val phi = col("_sld") / sllSafe
    val rss = col("_sdd") - lit(2.0) * phi * col("_sld") +
      phi * phi * col("_sll")
    val se  = sqrt((rss / mSafe) / sllSafe)
    agged
      .withColumn("phi", when(col("_sll") > 0, round(phi, 6)))
      .withColumn("df_stat",
        when(col("m") >= 3 && col("_sll") > 0 && rss > 0,
          round(phi / se, 6)))
      .drop("_sld", "_sll", "_sdd")
  }

  /** Average true range over [[ohlcBars]]: TRₜ = max(h−l, |h−pcₜ₋₁|,
    * |l−pcₜ₋₁|) (first bar: h−l), smoothed by Wilder's recursion — which
    * is exactly an EMA with α = 1/n seeded at TR₁, so the smoothing IS
    * [[emaSeriesAuto]] (size-routed, chunk-stitch safe) applied to the TR
    * column. One bar aggregate + one lag window + the EMA machinery. */
  def atr(df: DataFrame, value: String, keys: Seq[String], ts: String,
          bucket: String = "hour", n: Int = 14): DataFrame = {
    val bars = ohlcBars(df, value, keys, ts, bucket)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("bar"))
    val pc = lag(col("close"), 1).over(w)
    val withTr = bars.withColumn("tr",
      when(pc.isNull, col("high") - col("low"))
        .otherwise(greatest(col("high") - col("low"),
          abs(col("high") - pc), abs(col("low") - pc))))
    emaSeriesAuto(withTr, "tr", keys, "bar", alpha = 1.0 / n,
        carry = Seq("bar", "open", "high", "low", "close"))
      .withColumnRenamed("ema", "atr")
  }

  /** Wilder's directional system over [[ohlcBars]]: +DM/−DM per bar, the
    * three Wilder smoothings (α = 1/n folds — the [[macdFused]] shape:
    * one packed aggregate, three double-array folds over the same
    * column), DI± = 100·S(±DM)/S(TR), DX = 100·|DI⁺−DI⁻|/(DI⁺+DI⁻), and
    * ADX = the Wilder smoothing of DX (second pack, fourth fold — each
    * fold result crosses a shuffle boundary exactly once, never
    * re-evaluated by project collapse). NULL DI/DX where S(TR) = 0 or
    * DI⁺+DI⁻ = 0 (null-guarded divisors — ANSI). Bars per key are
    * time-bucket-bounded, so the packed arrays stay small. */
  def adx(df: DataFrame, value: String, keys: Seq[String], ts: String,
          bucket: String = "hour", n: Int = 14): DataFrame = {
    val a = 1.0 / n; val b = 1.0 - a
    val bars = ohlcBars(df, value, keys, ts, bucket)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("bar"))
    val pc = lag(col("close"), 1).over(w)
    val ph = lag(col("high"), 1).over(w)
    val pl = lag(col("low"), 1).over(w)
    val up = col("high") - ph
    val dn = pl - col("low")
    val withDm = bars
      .withColumn("_tr",
        when(pc.isNull, col("high") - col("low"))
          .otherwise(greatest(col("high") - col("low"),
            abs(col("high") - pc), abs(col("low") - pc))))
      .withColumn("_pdm",
        when(ph.isNull, lit(0.0))
          .otherwise(when(up > dn && up > 0, up).otherwise(lit(0.0))))
      .withColumn("_mdm",
        when(ph.isNull, lit(0.0))
          .otherwise(when(dn > up && dn > 0, dn).otherwise(lit(0.0))))
    val packed = withDm
      .groupBy(keys.map(col): _*)
      .agg(array_sort(collect_list(struct(col("bar"), col("_tr"),
        col("_pdm"), col("_mdm")))).as("seq"))
    graft.expressions.SeriesScan.register(df.sparkSession)
    def fold(field: String) = expr(
      s"graft_ema_scan(transform(seq, p -> p.$field), " +
        s"CAST('$a' AS DOUBLE), CAST('$b' AS DOUBLE))")
    val leg = packed
      .withColumn("_st", fold("_tr"))
      .withColumn("_sp", fold("_pdm"))
      .withColumn("_sm", fold("_mdm"))
      .select((keys.map(col) :+
        explode(arrays_zip(col("seq"), col("_st"), col("_sp"), col("_sm")))
          .as("_z")): _*)
      .select((keys.map(col) :+
        col("_z.seq.bar").as("bar") :+
        quant6(col("_z._st")).as("str") :+
        quant6(col("_z._sp")).as("spdm") :+
        quant6(col("_z._sm")).as("smdm")): _*)
      // DI from the quantized smoothings (pinned); divisors null-guarded
      .withColumn("di_plus",
        quant6(lit(100.0) * col("spdm") / when(col("str") > 0, col("str"))))
      .withColumn("di_minus",
        quant6(lit(100.0) * col("smdm") / when(col("str") > 0, col("str"))))
      .withColumn("_gdx",
        quant6(lit(100.0) * abs(col("di_plus") - col("di_minus")) /
          when(col("di_plus") + col("di_minus") > 0,
            col("di_plus") + col("di_minus"))))
    val packed2 = leg.groupBy(keys.map(col): _*)
      .agg(array_sort(collect_list(struct(col("bar"), col("str"),
        col("spdm"), col("smdm"), col("di_plus"), col("di_minus"),
        col("_gdx")))).as("seq2"))
    // ADX fold skips NULL DX rows' effect by folding coalesce(dx, last):
    // a NULL DX (flat bar) holds the smoothing — deterministic, pinned
    val adxFold = expr(
      s"graft_adx_scan(transform(seq2, p -> p._gdx), " +
        s"CAST('$a' AS DOUBLE), CAST('$b' AS DOUBLE))")
    packed2.withColumn("_adx", adxFold)
      .select((keys.map(col) :+
        explode(arrays_zip(col("seq2"), col("_adx"))).as("_z")): _*)
      .select((keys.map(col) :+
        col("_z.seq2.bar").as("bar") :+
        col("_z.seq2.str").as("str") :+
        col("_z.seq2.di_plus").as("di_plus") :+
        col("_z.seq2.di_minus").as("di_minus") :+
        col("_z.seq2._gdx").as("dx") :+
        quant6(col("_z._adx")).as("adx")): _*)
  }

  /** Cross-correlation function: Pearson corr(yₜ, xₜ₋ℓ) per series for
    * ℓ = −maxLag..maxLag (negative ℓ = x LEADS y — the lead–lag discovery
    * companion to [[acf]]; ℓ = 0 is the plain contemporaneous corr). Same
    * shape as acf: one Window exec fans out every shift, one exact-decimal
    * moment aggregate. */
  def ccf(df: DataFrame, y: String, x: String, keys: Seq[String],
          ord: Seq[Column], maxLag: Int = 5, minPairs: Long = 10L): DataFrame = {
    val wBase = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val shifted = (-maxLag to maxLag).foldLeft(df) { (acc, l) =>
      val c = if (l >= 0) lag(col(x), l).over(wBase)
      else lead(col(x), -l).over(wBase)
      acc.withColumn(s"_s${l + maxLag}", c)
    }
    val pairs = (-maxLag to maxLag).map(l =>
      struct(lit(l).as("lag_k"), col(s"_s${l + maxLag}").as("xl")))
    val ex = shifted.withColumn("_p", explode(array(pairs: _*)))
      .select(keys.map(col) :+ col(y).as("yv") :+
        col("_p.lag_k").as("lag_k") :+ col("_p.xl").as("xl"): _*)
    val ok = col("yv").isNotNull && col("xl").isNotNull
    def dsum(e: Column) = sum(when(ok, e.cast(Dec))).cast("double")
    val agged = ex.groupBy((keys.map(col) :+ col("lag_k")): _*).agg(
      count(when(ok, 1)).as("n_pairs"),
      dsum(col("yv")).as("_sy"), dsum(col("xl")).as("_sx"),
      dsum(col("yv") * col("yv")).as("_syy"),
      dsum(col("xl") * col("xl")).as("_sxx"),
      dsum(col("yv") * col("xl")).as("_sxy"))
    val n  = col("n_pairs")
    val cov = n * col("_sxy") - col("_sx") * col("_sy")
    val vx  = n * col("_sxx") - col("_sx") * col("_sx")
    val vy  = n * col("_syy") - col("_sy") * col("_sy")
    agged.withColumn("ccf",
        when(n >= minPairs && vx > 0 && vy > 0,
          round(cov / sqrt(vx * vy), 6)))
      .drop("_sx", "_sy", "_sxx", "_syy", "_sxy")
  }

  /** Lo–MacKinlay variance-ratio test statistics: VR(q) = σ²_q/(q·σ²₁)
    * where σ²ₖ is the mean-adjusted variance of k-period differences —
    * VR ≈ 1 under a random walk, > 1 momentum, < 1 mean reversion (Lo &
    * MacKinlay 1988). One Window exec fans out every q-difference; exact
    * DECIMAL sums; the 1-period variance is computed once per key and
    * joined back broadcast. NULL where either variance degenerates. */
  def varianceRatio(df: DataFrame, value: String, keys: Seq[String],
                    ord: Seq[Column], qs: Seq[Int] = Seq(2, 3, 4, 5)): DataFrame = {
    require(qs.nonEmpty && qs.forall(_ >= 2), s"qs $qs must all be ≥ 2")
    val wBase = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val lags = (1 +: qs).distinct
    val shifted = lags.foldLeft(df) { (acc, l) =>
      acc.withColumn(s"_d$l", col(value) - lag(col(value), l).over(wBase))
    }
    def dsum(e: Column) = sum(e.cast(Dec)).cast("double")
    // per-key stats of the k-period differences, one row per (key, q)
    val pairs = lags.map(l => struct(lit(l).as("q"), col(s"_d$l").as("d")))
    val ex = shifted.withColumn("_p", explode(array(pairs: _*)))
      .select(keys.map(col) :+ col("_p.q").as("q") :+ col("_p.d").as("d"): _*)
      .filter(col("d").isNotNull)
    val stats = ex.groupBy((keys.map(col) :+ col("q")): _*).agg(
      count(lit(1)).as("n_d"),
      dsum(col("d")).as("_sd"),
      dsum(col("d") * col("d")).as("_sdd"))
      // mean-adjusted variance: (Σd² − (Σd)²/n)/n, pinned order
      .withColumn("_var",
        (col("_sdd") - col("_sd") * col("_sd") /
          when(col("n_d") > 0, col("n_d"))) /
          when(col("n_d") > 0, col("n_d")))
    val base = stats.filter(col("q") === 1)
      .select(keys.map(col) :+ col("_var").as("_var1") :+
        col("n_d").as("n_base"): _*)
    stats.filter(col("q") =!= 1)
      .join(broadcast(base), keys)
      .withColumn("vr",
        when(col("_var1") > 0 && col("_var") >= 0,
          round(col("_var") / (col("q") * when(col("_var1") > 0,
            col("_var1"))), 6)))
      .select(keys.map(col) :+ col("q") :+ col("n_d") :+ col("n_base") :+
        col("vr"): _*)
  }

  /** Time-under-water analysis per series: drawdown episodes (maximal runs
    * where value sits below the running peak), their lengths, and the
    * deepest drawdown — the risk-duration companion to [[drawdown]].
    * Episode ids come from a cumulative count of at-peak rows (the gaps-
    * and-islands idiom: two window passes over one sort), so the whole
    * analysis is two Window execs + one aggregate. Returns one row per
    * series: n_obs, n_episodes, max_underwater_len, max_drawdown. */
  def underwater(df: DataFrame, value: String, keys: Seq[String],
                 ord: Seq[Column]): DataFrame = {
    val wBase = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val wCum = wBase.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = df.filter(col(value).isNotNull)
    val peak = max(col(value)).over(wCum)
    val marked = base
      .withColumn("_under", (col(value) < peak).cast("int"))
      .withColumn("_dd",
        when(peak > 0, round(col(value) / peak - 1.0, 6)))
    val withEp = marked
      .withColumn("_ep", sum(lit(1) - col("_under")).over(wCum))
    val episodes = withEp.filter(col("_under") === 1)
      .groupBy((keys.map(col) :+ col("_ep")): _*)
      .agg(count(lit(1)).as("_len"), min(col("_dd")).as("_depth"))
    val perKey = episodes.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n_episodes"),
      max(col("_len")).as("max_underwater_len"),
      min(col("_depth")).as("max_drawdown"))
    base.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n_obs"))
      .join(perKey, keys, "left")
      .na.fill(0L, Seq("n_episodes", "max_underwater_len"))
  }

  /** One-way ANOVA of 1-step returns across a calendar bucket (default
    * day-of-week): per-bucket mean returns plus the F statistic
    * F = (SSB/(k−1)) / (SSW/(N−k)) from exact DECIMAL group sums — the
    * classic calendar-effect screen. The bucket frame is ≤ 7 rows, so the
    * grand totals ride a broadcast; every closed form is pinned. The F
    * statistic repeats on each bucket row (the q52 attach pattern). */
  def calendarAnova(df: DataFrame, value: String, keys: Seq[String],
                    ts: String, ord: Seq[Column]): DataFrame = {
    val wBase = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val rets = df
      .withColumn("_ret", col(value) - lag(col(value), 1).over(wBase))
      .filter(col("_ret").isNotNull)
      .withColumn("dow", dayofweek(col(ts)))
    def dsum(e: Column) = sum(e.cast(Dec)).cast("double")
    val groups = rets.groupBy(col("dow")).agg(
      count(lit(1)).as("n"),
      dsum(col("_ret")).as("_s"),
      dsum(col("_ret") * col("_ret")).as("_ss"))
    val tot = groups.agg(
      sum(col("n")).as("_nt"),
      sum(col("_s").cast(Dec)).cast("double").as("_st"),
      sum(col("_ss").cast(Dec)).cast("double").as("_sst"),
      count(lit(1)).as("_k"))
    val withTot = groups.crossJoin(broadcast(tot))
    val mg = col("_s") / col("n")
    val m  = col("_st") / col("_nt")
    val terms = withTot
      .withColumn("mean_ret", round(mg, 6))
      .withColumn("_ssb_g", col("n") * (mg - m) * (mg - m))
      .withColumn("_ssw_g", col("_ss") - col("_s") * col("_s") / col("n"))
    val f = terms.agg(
      max(col("_nt")).as("_nt"), max(col("_k")).as("_k"),
      sum(col("_ssb_g").cast(Dec)).cast("double").as("_ssb"),
      sum(col("_ssw_g").cast(Dec)).cast("double").as("_ssw"))
      .withColumn("f_stat",
        when(col("_k") > 1 && col("_nt") > col("_k") && col("_ssw") > 0,
          round((col("_ssb") / when(col("_k") > 1, col("_k") - 1)) /
            (col("_ssw") / when(col("_nt") > col("_k"),
              col("_nt") - col("_k"))), 6)))
      .select(col("_ssb"), col("_ssw"), col("f_stat"),
        col("_k").as("k_groups"), col("_nt").as("n_total"))
    terms.select(col("dow"), col("n"), col("mean_ret"))
      .crossJoin(broadcast(f.select(col("f_stat"), col("k_groups"),
        col("n_total"))))
  }

  /** Heikin-Ashi smoothing over [[ohlcBars]]: hcₜ = (o+h+l+c)/4 per bar,
    * hoₜ = (hoₜ₋₁ + hcₜ₋₁)/2 (ho₁ = (o₁+c₁)/2), hh = max(h, ho, hc),
    * hl = min(l, ho, hc) — the noise-reduced candle series. The ho
    * recursion folds left-to-right per key ([[emaSeries]] shape; both
    * divisions are by powers of two, and the adds round identically in
    * any IEEE engine, so an oracle replaying the same fold matches
    * bit-for-bit). Bars per key are time-bucket-bounded, so the packed
    * array stays small by construction. */
  def heikinAshi(df: DataFrame, value: String, keys: Seq[String], ts: String,
                 bucket: String = "hour"): DataFrame = {
    val bars = ohlcBars(df, value, keys, ts, bucket)
    val packed = bars
      .groupBy(keys.map(col): _*)
      .agg(array_sort(collect_list(struct(col("bar"), col("open"),
        col("high"), col("low"), col("close"), col("n_ticks")))).as("seq"))
      // hc per element is closed-form; computed ONCE here, referenced by
      // the fold below and by the output projection
      .withColumn("_hc", expr(
        "transform(seq, p -> (((p.open + p.high) + p.low) + p.close) / 4.0D)"))
    // the ho recurrence runs in the native O(n) HeikinScan (seeded with
    // the closed-form ho₁ = (o₁+c₁)/2) — identical dyadic arithmetic to
    // the SQL fold it replaces, minus the Θ(n²) accumulator-array copies
    graft.expressions.SeriesScan.register(df.sparkSession)
    packed.withColumn("_ho", expr(
        "graft_heikin_scan(_hc, " +
          "(element_at(seq, 1).open + element_at(seq, 1).close) / 2.0D)"))
      .select((keys.map(col) :+
        explode(arrays_zip(col("seq"), col("_hc"), col("_ho"))).as("_z")): _*)
      .select((keys.map(col) :+
        col("_z.seq.bar").as("bar") :+
        col("_z.seq.open").as("open") :+
        col("_z.seq.high").as("high") :+
        col("_z.seq.low").as("low") :+
        col("_z.seq.close").as("close") :+
        quant6(col("_z._ho")).as("ha_open") :+
        quant6(col("_z._hc")).as("ha_close") :+
        quant6(greatest(col("_z.seq.high"), col("_z._ho"), col("_z._hc")))
          .as("ha_high") :+
        quant6(least(col("_z.seq.low"), col("_z._ho"), col("_z._hc")))
          .as("ha_low")): _*)
  }

  /** Ichimoku Kinkō Hyō over a per-bucket close series: tenkan/kijun/
    * senkou-B are trailing (max+min)/2 midlines at spans 9/26/52, senkou-A
    * the tenkan–kijun midline shifted 26 forward, chikou the close shifted
    * 26 back — all from ONE ordered window chain per series (shared sort),
    * NULL until each span's frame is full. Operates on bars (one value per
    * bucket), the standard charting contract. */
  def ichimoku(df: DataFrame, value: String, keys: Seq[String],
               ord: Seq[Column], tenkanN: Int = 9, kijunN: Int = 26,
               senkouN: Int = 52): DataFrame = {
    val wBase = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    def midline(n: Int): Column = {
      val w = wBase.rowsBetween(-(n - 1), 0)
      when(count(col(value)).over(w) === n,
        (max(col(value)).over(w) + min(col(value)).over(w)) / lit(2.0))
    }
    val withLines = df
      .withColumn("tenkan", midline(tenkanN))
      .withColumn("kijun", midline(kijunN))
      .withColumn("senkou_b_raw", midline(senkouN))
    withLines
      .withColumn("senkou_a",
        lag((col("tenkan") + col("kijun")) / lit(2.0), kijunN).over(wBase))
      .withColumn("senkou_b", lag(col("senkou_b_raw"), kijunN).over(wBase))
      .withColumn("chikou", lead(col(value), kijunN).over(wBase))
      .drop("senkou_b_raw")
  }

  /** Two-sided CUSUM change-point statistic per series: with μ the series
    * mean, s⁺ₜ = max(0, s⁺ₜ₋₁ + (xₜ − μ)) and s⁻ₜ = min(0, s⁻ₜ₋₁ +
    * (xₜ − μ)) — the Page (1954) cumulative-sum drift detectors, reported
    * per row so a monitor can threshold them. μ comes from the exact
    * decimal Σx/n of the SAME groupBy that packs the series (one shuffle
    * total); the fold is inherently sequential per key, the [[emaSeries]]
    * shape — series are assumed to fit an executor (time-series contract;
    * the chunk-stitch carry that rescues EMA has no CUSUM analog because
    * max(0,·) is not linear, so oversized keys must be windowed upstream). */
  def cusumSeries(df: DataFrame, value: String, keys: Seq[String],
                  ts: String, carry: Seq[String] = Nil): DataFrame = {
    // same collision-proof struct aliases as [[emaSeries]]
    val fields = (col(ts).as("_gt") +: carry.map(col)) :+
      col(value).cast("double").as("_gx")
    val packed = df.filter(col(value).isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(array_sort(collect_list(struct(fields: _*))).as("seq"),
        (sum(col(value).cast(Dec)).cast("double") /
          count(col(value))).as("mu"))
    // native O(n) CUSUM scan — same IEEE step order as the SQL fold it
    // replaces, minus the per-step accumulator-array copy
    graft.expressions.SeriesScan.register(df.sparkSession)
    val runFold = expr("graft_cusum_scan(transform(seq, p -> p._gx), mu)")
    packed.withColumn("_cs", runFold)
      .select((keys.map(col) :+ col("mu") :+
        explode(arrays_zip(col("seq"), col("_cs"))).as("_z")): _*)
      .select((keys.map(col) ++
        carry.map(c => col(s"_z.seq.$c").as(c)) :+
        col("_z.seq._gx").as(value) :+
        quant6(col("mu")).as("mu") :+
        quant6(col("_z._cs.u")).as("cusum_pos") :+
        quant6(col("_z._cs.d")).as("cusum_neg")): _*)
  }

  /** Wald–Wolfowitz runs test on the signs of 1-step moves per series:
    * with n₁ up-moves, n₂ down-moves and R observed sign runs,
    * z = (R − μ)/σ where μ = 2n₁n₂/n + 1 and
    * σ² = 2n₁n₂(2n₁n₂ − n) / (n²(n − 1)) — the classic randomness screen
    * (a random walk has z ≈ 0; trending series too few runs, mean-
    * reverting too many). Zero moves are dropped before run counting
    * (the standard convention), which forces a second ordered window
    * over the surviving rows to restore adjacency; both windows share
    * one sort key, so the plan is one shuffle + two sorted passes.
    * Every closed form is pinned left-associated; divisors null-guarded. */
  def runsTest(df: DataFrame, value: String, keys: Seq[String],
               ord: Seq[Column]): DataFrame = {
    val wBase = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val signed = df
      .withColumn("_ret", col(value) - lag(col(value), 1).over(wBase))
      .filter(col("_ret").isNotNull && col("_ret") =!= 0.0)
      .withColumn("_sgn", (col("_ret") > 0).cast("int"))
    val chg = signed
      .withColumn("_prev", lag(col("_sgn"), 1).over(wBase))
      .withColumn("_new",
        when(col("_prev").isNull || col("_prev") =!= col("_sgn"), 1)
          .otherwise(0))
    val agged = chg.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n_moves"),
      sum(col("_sgn")).cast("long").as("n_up"),
      sum(col("_new")).cast("long").as("n_runs"))
      .withColumn("n_down", col("n_moves") - col("n_up"))
    val n1 = col("n_up").cast("double"); val n2 = col("n_down").cast("double")
    val n  = n1 + n2
    val mu = lit(2.0) * n1 * n2 / when(n > 0, n) + lit(1.0)
    val variance = lit(2.0) * n1 * n2 * (lit(2.0) * n1 * n2 - n) /
      when(n > 1, n * n * (n - lit(1.0)))
    agged
      .withColumn("z",
        when(col("n_up") > 0 && col("n_down") > 0 && variance > 0,
          round((col("n_runs").cast("double") - mu) / sqrt(variance), 6)))
      .select(keys.map(col) :+ col("n_moves") :+ col("n_up") :+
        col("n_down") :+ col("n_runs") :+ col("z"): _*)
  }

  /** Pettitt (1979) rank-based change-point test per series. With pooled
    * average ranks rᵢ over the key's values, Uₜ = 2·Σ_{i≤t} rᵢ − t(N+1);
    * the statistic is K = max_{t<N} |Uₜ|, the change point the EARLIEST t
    * attaining it (deterministic tie), and p ≈ 2·exp(−6K²/(N³+N²)).
    * 2·avg-rank = 2·min-rank + (ties − 1) is integral, so U accumulates in
    * exact BIGINT — both engines compare integers, never doubles. Shapes:
    * one value-ordered rank window + one time-ordered cumsum window + one
    * aggregate; nothing leaves the executor. Keys with N < 2 drop (no
    * interior point to test). */
  def pettitt(df: DataFrame, value: String, keys: Seq[String],
              ord: Seq[Column]): DataFrame = {
    val base  = df.filter(col(value).isNotNull)
    val wOrd  = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val wKey  = Window.partitionBy(keys.map(col): _*)
    val wRank = Window.partitionBy(keys.map(col): _*).orderBy(col(value))
    val wTies = Window.partitionBy((keys.map(col) :+ col(value)): _*)
    val ranked = base
      .withColumn("_r2",
        lit(2L) * rank().over(wRank).cast("long") +
          count(lit(1)).over(wTies).cast("long") - lit(1L))
      .withColumn("_t", row_number().over(wOrd).cast("long"))
      .withColumn("_n", count(lit(1)).over(wKey).cast("long"))
    val withU = ranked
      .withColumn("_cum2", sum(col("_r2")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_u", col("_cum2") - col("_t") * (col("_n") + lit(1L)))
      .filter(col("_t") < col("_n"))
      .withColumn("_absu", abs(col("_u")))
    val withK = withU.withColumn("_k", max(col("_absu")).over(wKey))
    val kd = col("k_stat").cast("double"); val nd = col("n_obs").cast("double")
    withK.groupBy(keys.map(col): _*).agg(
        max(col("_n")).as("n_obs"),
        max(col("_absu")).as("k_stat"),
        min(when(col("_absu") === col("_k"), col("_t"))).as("t_change"))
      .withColumn("p_approx",
        round(lit(2.0) * exp(lit(-6.0) * kd * kd /
          when(nd > 0, nd * nd * nd + nd * nd)), 6))
  }

  /** Hurst exponent per series by the aggregated-variance method
    * (Beran 1994): for each block size m, the variance of means of
    * complete m-blocks of the 1-step differences scales as m^(2H−2);
    * H = 1 + slope/2 from the log-log OLS over the m-grid. Everything is
    * aggregates — diff window, block groupBy, scale groupBy, per-key OLS —
    * so the operator is shuffle-bound, never driver-bound, and block means
    * divide exact decimal block sums by power-of-two m (dyadic-exact in
    * double). NULL H when fewer than two usable scales survive (a scale
    * needs ≥ 2 complete blocks and positive variance). */
  def hurst(df: DataFrame, value: String, keys: Seq[String],
            ord: Seq[Column], ms: Seq[Int] = Seq(1, 2, 4, 8, 16)): DataFrame = {
    require(ms.distinct.size >= 2 && ms.forall(_ >= 1),
      s"need ≥ 2 distinct block sizes ≥ 1, got $ms")
    val wBase = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val rets = df
      .withColumn("_ret", col(value) - lag(col(value), 1).over(wBase))
      .filter(col("_ret").isNotNull)
      .withColumn("_pos", row_number().over(wBase).cast("long") - lit(1L))
    val exploded = rets
      .withColumn("_m", explode(array(ms.distinct.sorted.map(lit): _*)))
      .withColumn("_blk", floor(col("_pos") / col("_m")))
    val blocks = exploded
      .groupBy((keys.map(col) :+ col("_m") :+ col("_blk")): _*)
      .agg(count(lit(1)).as("_bn"), sum(col("_ret").cast(Dec)).as("_bs"))
      .filter(col("_bn") === col("_m"))
      .withColumn("_bm", col("_bs").cast("double") / col("_m"))
    val scales = blocks.groupBy((keys.map(col) :+ col("_m")): _*)
      .agg(count(lit(1)).as("_k"),
        sum(col("_bm").cast(Dec)).cast("double").as("_sb"),
        sum((col("_bm") * col("_bm")).cast(Dec)).cast("double").as("_sbb"))
      .filter(col("_k") >= 2)
      .withColumn("_var",
        (col("_sbb") - col("_sb") * col("_sb") /
          when(col("_k") > 0, col("_k").cast("double"))) /
          (col("_k").cast("double") - lit(1.0)))
      .filter(col("_var") > 0)
      .withColumn("_lx", log(col("_m").cast("double")))
      .withColumn("_ly", log(col("_var")))
    val ols = scales.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n_scales"),
      sum(col("_lx").cast(Dec)).cast("double").as("_sx"),
      sum(col("_ly").cast(Dec)).cast("double").as("_sy"),
      sum((col("_lx") * col("_lx")).cast(Dec)).cast("double").as("_sxx"),
      sum((col("_lx") * col("_ly")).cast(Dec)).cast("double").as("_sxy"))
    val k = col("n_scales").cast("double")
    val den = k * col("_sxx") - col("_sx") * col("_sx")
    val slope = (k * col("_sxy") - col("_sx") * col("_sy")) /
      when(den =!= 0.0, den)
    ols
      .withColumn("hurst",
        when(col("n_scales") >= 2 && den =!= 0.0,
          round(lit(1.0) + slope / lit(2.0), 6)))
      .select(keys.map(col) :+ col("n_scales") :+ col("hurst"): _*)
  }

  /** 1-D local-level Kalman filter per series (state-space smoothing of a
    * noisy level, Harvey 1989): level₁ = x₁, P₁ = r, and for t ≥ 2 with
    * P⁻ = P + q: gain k = P⁻/(P⁻ + r), level ← level + k(xₜ − level),
    * P ← (1 − k)·P⁻. Process/measurement variances (q, r) are fixed
    * hyper-parameters. The recursion is inherently sequential per key —
    * the [[cusumSeries]] fold shape (pack-sort-fold one shuffle); the
    * gain sequence converges geometrically to the steady state where the
    * filter degenerates to an EMA, which is why the time-varying early
    * transient is the part worth computing exactly. Operates on bar-level
    * series (one value per `ordCol`); oversized keys belong upstream in
    * [[ohlcBars]] bucketing. */
  def kalmanLevel(df: DataFrame, value: String, keys: Seq[String],
                  ordCol: String, qVar: Double = 0.01,
                  rVar: Double = 1.0): DataFrame = {
    require(qVar > 0 && rVar > 0, s"variances must be positive: q=$qVar r=$rVar")
    val packed = df.filter(col(value).isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(array_sort(collect_list(struct(col(ordCol).as("_gt"),
        col(value).cast("double").as("_gx")))).as("seq"))
    // the gain/level recurrence runs in the native O(n) KalmanScan — the
    // same ppred/gain arithmetic the SQL fold evaluated, minus the
    // per-step accumulator-array copy (Θ(n²) on long series); the oracle
    // keeps replaying the identical expression tree via DuckDB list_reduce
    graft.expressions.SeriesScan.register(df.sparkSession)
    packed.withColumn("_kf", expr(
        "graft_kalman_scan(transform(seq, p -> p._gx), " +
          s"CAST('$qVar' AS DOUBLE), CAST('$rVar' AS DOUBLE))"))
      .filter(size(col("seq")) >= 1)
      .select((keys.map(col) :+
        explode(arrays_zip(col("seq"), col("_kf"))).as("_z")): _*)
      .select(keys.map(col) :+
        col("_z.seq._gt").as(ordCol) :+
        col("_z.seq._gx").as(value) :+
        quant6(col("_z._kf")).as("kf_level"): _*)
  }

  /** Goertzel-style periodogram at candidate integer periods per series:
    * spectral power I(p) = (S_c² + S_s²)/n with S_c = Σ x'ₜ·cos(2πt/p),
    * S_s = Σ x'ₜ·sin(2πt/p) over the mean-removed series — the cheap
    * seasonality screen when only a few candidate periods matter (hourly/
    * daily/weekly), O(n·|periods|) instead of an FFT. Because cos(2πt/p)
    * only takes p distinct values, rows are first reduced per (key, period,
    * t mod p) RESIDUE — an exact decimal sum — and the trig factors touch
    * only the ≤p cell rows, quantized to 9 dp so both engines multiply
    * bit-identical factors. Two hash aggregates, no window over the data
    * beyond the position numbering. */
  def periodogram(df: DataFrame, value: String, keys: Seq[String],
                  ord: Seq[Column],
                  periods: Seq[Int] = Seq(4, 6, 12, 24)): DataFrame = {
    require(periods.nonEmpty && periods.forall(_ >= 2),
      s"periods must all be ≥ 2, got $periods")
    val wBase = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val wKey  = Window.partitionBy(keys.map(col): _*)
    val base = df.filter(col(value).isNotNull)
      .withColumn("_pos", row_number().over(wBase).cast("long") - lit(1L))
      .withColumn("_mean",
        sum(col(value).cast(Dec)).over(wKey).cast("double") /
          count(lit(1)).over(wKey))
      .withColumn("_x", col(value) - col("_mean"))
    val exploded = base
      .withColumn("_p", explode(array(periods.distinct.sorted.map(lit): _*)))
      .withColumn("_res", (col("_pos") % col("_p")).cast("int"))
    val cells = exploded
      .groupBy((keys.map(col) :+ col("_p") :+ col("_res")): _*)
      .agg(count(lit(1)).as("_cn"),
        sum(col("_x").cast(Dec)).cast("double").as("_sx"))
    val ang = lit(2.0) * lit(math.Pi) * col("_res").cast("double") /
      col("_p").cast("double")
    val withTrig = cells
      .withColumn("_c", round(cos(ang), 9))
      .withColumn("_s", round(sin(ang), 9))
    withTrig.groupBy((keys.map(col) :+ col("_p").as("period")): _*)
      .agg(sum(col("_cn")).cast("long").as("n_obs"),
        sum((col("_sx") * col("_c")).cast(Dec)).cast("double").as("_sc"),
        sum((col("_sx") * col("_s")).cast(Dec)).cast("double").as("_ss"))
      .withColumn("power",
        when(col("n_obs") > 0,
          round((col("_sc") * col("_sc") + col("_ss") * col("_ss")) /
            col("n_obs").cast("double"), 6)))
      .drop("_sc", "_ss")
  }

  /** Per-period risk-adjusted performance ratios per series, from 1-step
    * differences: Sharpe = mean/sd (sample sd), Sortino = mean/downside
    * deviation (√(Σ min(r,0)²/n) — target 0), Calmar = mean/|max
    * drawdown| of the level series. Unannualized (pure per-period units —
    * scaling by √T is the caller's frequency decision). One diff window +
    * one exact-decimal moment aggregate; the drawdown peak rides the same
    * sort. NULL where the denominator degenerates. */
  def riskRatios(df: DataFrame, value: String, keys: Seq[String],
                 ord: Seq[Column]): DataFrame = {
    val wBase = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val wCum = wBase.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = df.filter(col(value).isNotNull)
      .withColumn("_ret", col(value) - lag(col(value), 1).over(wBase))
      .withColumn("_peak", max(col(value)).over(wCum))
      .withColumn("_dd",
        when(col("_peak") > 0, col(value) / col("_peak") - lit(1.0)))
    def dsum(e: Column) = sum(e.cast(Dec)).cast("double")
    val agged = base.groupBy(keys.map(col): _*).agg(
      count(col("_ret")).as("n_rets"),
      dsum(col("_ret")).as("_s"),
      dsum(col("_ret") * col("_ret")).as("_ss"),
      dsum(when(col("_ret") < 0, col("_ret") * col("_ret"))
        .otherwise(lit(0.0))).as("_sd"),
      min(col("_dd")).as("_mdd"))
    val n = col("n_rets").cast("double")
    val mean = col("_s") / when(n > 0, n)
    val variance = (col("_ss") - col("_s") * col("_s") / when(n > 0, n)) /
      when(n > 1, n - lit(1.0))
    val downside = sqrt(col("_sd") / when(n > 0, n))
    agged
      .withColumn("mean_ret", when(col("n_rets") > 0, round(mean, 6)))
      .withColumn("sharpe",
        when(col("n_rets") > 1 && variance > 0,
          round(mean / sqrt(variance), 6)))
      .withColumn("sortino",
        when(col("n_rets") > 0 && downside > 0, round(mean / downside, 6)))
      .withColumn("max_drawdown",
        when(col("_mdd").isNotNull, round(col("_mdd"), 6)))
      .withColumn("calmar",
        when(col("_mdd") < 0, round(mean / -col("_mdd"), 6)))
      .drop("_s", "_ss", "_sd", "_mdd")
  }

  /** AR(1) mean-reversion fit per series: OLS of xₜ on xₜ₋₁ gives the
    * autoregressive coefficient φ and, when 0 < φ < 1, the mean-reversion
    * half-life −ln 2 / ln φ (periods for a shock to decay halfway — the
    * pairs-trading holding-period heuristic; the speed view of what the
    * [[engleGranger]] Dickey–Fuller stat tests). Exact-decimal pair
    * moments over one lag window; every closed form pinned. */
  def arHalfLife(df: DataFrame, value: String, keys: Seq[String],
                 ord: Seq[Column]): DataFrame = {
    val wBase = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val pairs = df
      .withColumn("_xl", lag(col(value), 1).over(wBase))
      .filter(col(value).isNotNull && col("_xl").isNotNull)
    def dsum(e: Column) = sum(e.cast(Dec)).cast("double")
    val agged = pairs.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n_pairs"),
      dsum(col(value)).as("_sy"), dsum(col("_xl")).as("_sx"),
      dsum(col("_xl") * col("_xl")).as("_sxx"),
      dsum(col("_xl") * col(value)).as("_sxy"))
    val n = col("n_pairs").cast("double")
    val den = n * col("_sxx") - col("_sx") * col("_sx")
    val phi = (n * col("_sxy") - col("_sx") * col("_sy")) /
      when(den =!= 0.0, den)
    agged
      .withColumn("phi", when(den =!= 0.0, round(phi, 6)))
      .withColumn("half_life",
        when(den =!= 0.0 && phi > 0 && phi < 1,
          round(-log(lit(2.0)) / log(phi), 6)))
      .drop("_sy", "_sx", "_sxx", "_sxy")
  }

  /** RiskMetrics EWMA volatility per series (J.P. Morgan 1996): σ²ₜ =
    * λ·σ²ₜ₋₁ + (1−λ)·r²ₜ over 1-step differences, σ²₁ = r²₁ — exactly an
    * EMA with α = 1−λ on the squared return, so the whole size-routed
    * [[emaSeriesAuto]] machinery (sequential fold for modest keys,
    * chunk-stitch beyond) applies unchanged; this wrapper adds the diff
    * window and the final √. The classic zero-mean volatility filter
    * (λ = 0.94 is the RiskMetrics daily standard). */
  def ewmVolatility(df: DataFrame, value: String, keys: Seq[String],
                    ts: String, lambda: Double = 0.94,
                    carry: Seq[String] = Nil): DataFrame = {
    require(lambda > 0 && lambda < 1, s"lambda $lambda outside (0, 1)")
    val wBase = Window.partitionBy(keys.map(col): _*)
      .orderBy((col(ts) +: carry.map(col)): _*)
    val rets = df.filter(col(value).isNotNull)
      .withColumn("_r", col(value) - lag(col(value), 1).over(wBase))
      .filter(col("_r").isNotNull)
      .withColumn("_r2", col("_r") * col("_r"))
    emaSeriesAuto(rets, "_r2", keys, ts, alpha = 1 - lambda, carry = carry)
      .withColumnRenamed("_r2", "sq_ret")
      .withColumnRenamed("ema", "ewm_var")
      .withColumn("ewm_vol", quant6(sqrt(col("ewm_var"))))
  }

  /** Market beta per series: OLS of each key's bucket returns on the
    * cross-sectional market return (the per-bucket mean over ALL keys) —
    * the CAPM exposure estimate. Both leg series come from exact-decimal
    * bucket means; the market frame is |buckets|-sized (its ordered
    * window is bucket-bounded, never data-bounded) and broadcast onto
    * the per-key frame. Emits (key, n_obs, beta, alpha, corr) from one
    * moment aggregate with every closed form pinned. */
  def marketBeta(df: DataFrame, value: String, key: String, ts: String,
                 bucket: String = "hour"): DataFrame = {
    def dmean(c: Column) =
      sum(c.cast(Dec)).cast("double") / count(c)
    val base = df.filter(col(value).isNotNull)
      .withColumn("_bar", date_trunc(bucket, col(ts)))
    val userHr = base.groupBy(col(key), col("_bar"))
      .agg(dmean(col(value)).as("_uv"))
    val mktHr = base.groupBy(col("_bar"))
      .agg(dmean(col(value)).as("_mv"))
    val wU = Window.partitionBy(col(key)).orderBy(col("_bar"))
    val wM = Window.orderBy(col("_bar"))
    val uRet = userHr
      .withColumn("_ur", col("_uv") - lag(col("_uv"), 1).over(wU))
      .filter(col("_ur").isNotNull)
    val mRet = mktHr
      .withColumn("_mr", col("_mv") - lag(col("_mv"), 1).over(wM))
      .filter(col("_mr").isNotNull)
      .select("_bar", "_mr")
    def dsum(e: Column) = sum(e.cast(Dec)).cast("double")
    val agged = uRet.join(broadcast(mRet), Seq("_bar"))
      .groupBy(col(key)).agg(
        count(lit(1)).as("n_obs"),
        dsum(col("_ur")).as("_sy"), dsum(col("_mr")).as("_sx"),
        dsum(col("_mr") * col("_mr")).as("_sxx"),
        dsum(col("_ur") * col("_ur")).as("_syy"),
        dsum(col("_mr") * col("_ur")).as("_sxy"))
    val n = col("n_obs").cast("double")
    val den = n * col("_sxx") - col("_sx") * col("_sx")
    val beta = (n * col("_sxy") - col("_sx") * col("_sy")) /
      when(den =!= 0.0, den)
    val vy = n * col("_syy") - col("_sy") * col("_sy")
    agged
      .withColumn("beta", when(den =!= 0.0, round(beta, 6)))
      .withColumn("alpha",
        when(den =!= 0.0 && n > 0,
          round((col("_sy") - beta * col("_sx")) / when(n > 0, n), 6)))
      .withColumn("corr",
        when(den > 0 && vy > 0,
          round((n * col("_sxy") - col("_sx") * col("_sy")) /
            sqrt(den * vy), 6)))
      .drop("_sy", "_sx", "_sxx", "_syy", "_sxy")
  }

  /** KPSS level-stationarity statistic per series (Kwiatkowski et al.
    * 1992) — the null-reversed complement to the [[engleGranger]]
    * Dickey–Fuller stat: with eₜ the demeaned series and Sₜ its partial
    * sums, η = Σ Sₜ²/n² over the Newey–West long-run variance s²(l) = γ₀ +
    * 2·Σⱼ (1 − j/(l+1))·γⱼ with Bartlett weights and γⱼ = Σ eₜeₜ₋ⱼ/n.
    * Large values reject stationarity. One key window (mean), one ordered
    * cumsum window sharing the lag fan-out's sort, one aggregate of exact
    * decimal moments; the Bartlett combination evaluates j-ascending in a
    * pinned order. NULL when the long-run variance degenerates. */
  def kpss(df: DataFrame, value: String, keys: Seq[String],
           ord: Seq[Column], lags: Int = 4): DataFrame = {
    require(lags >= 0, s"lags must be ≥ 0, got $lags")
    val wKey = Window.partitionBy(keys.map(col): _*)
    val wOrd = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = df.filter(col(value).isNotNull)
      .withColumn("_mean",
        sum(col(value).cast(Dec)).over(wKey).cast("double") /
          count(lit(1)).over(wKey))
      .withColumn("_e", col(value) - col("_mean"))
      .withColumn("_s", sum((col(value) - col("_mean")).cast(Dec))
        .over(wCum).cast("double"))
    val lagged = (1 to lags).foldLeft(base) { (acc, j) =>
      acc.withColumn(s"_el$j", lag(col("_e"), j).over(wOrd))
    }
    def dsum(e: Column) = sum(e.cast(Dec)).cast("double")
    val aggCols = Seq(
      count(lit(1)).as("n_obs"),
      dsum(col("_s") * col("_s")).as("_ss2"),
      dsum(col("_e") * col("_e")).as("_g0")) ++
      (1 to lags).map(j => dsum(col("_e") * col(s"_el$j")).as(s"_g$j"))
    val agged = lagged.groupBy(keys.map(col): _*)
      .agg(aggCols.head, aggCols.tail: _*)
    val n = col("n_obs").cast("double")
    val eta = col("_ss2") / (n * n)
    val lrv = (0 to lags).map { j =>
      if (j == 0) col("_g0") / n
      else lit(2.0) * (lit(1.0) -
        lit(j.toDouble) / lit((lags + 1).toDouble)) * (col(s"_g$j") / n)
    }.reduce(_ + _)
    agged
      .withColumn("kpss_stat", when(lrv > 0, round(eta / lrv, 6)))
      .select(keys.map(col) :+ col("n_obs") :+ col("kpss_stat"): _*)
  }

  /** Permutation entropy of order 3 (Bandt & Pompe 2002) per series: the
    * Shannon entropy of the distribution over the 6 ordinal patterns of
    * consecutive value triples, normalized by ln 6 — a model-free
    * complexity score (≈1 for noise, →0 for regular dynamics). Ties break
    * by temporal precedence (≤ on the earlier element), the standard
    * convention, making the pattern id an exact integer in both engines.
    * One lead window + a 6-row-per-key aggregate; entropy terms quantize
    * to DECIMAL before the final sum. */
  def permutationEntropy(df: DataFrame, value: String, keys: Seq[String],
                         ord: Seq[Column]): DataFrame = {
    val wBase = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val wKey  = Window.partitionBy(keys.map(col): _*)
    val trip = df.filter(col(value).isNotNull)
      .withColumn("_x1", lead(col(value), 1).over(wBase))
      .withColumn("_x2", lead(col(value), 2).over(wBase))
      .filter(col("_x1").isNotNull && col("_x2").isNotNull)
    val a = col(value); val b = col("_x1"); val c = col("_x2")
    // pattern = 4·[a≤b] + 2·[a≤c] + 1·[b≤c]; 0b010/0b101 are infeasible
    // (transitivity: a>b ∧ a≤c forces b<c, and a≤b ∧ a>c forces b>c)
    val pattern = (when(a <= b, 4).otherwise(0) +
      when(a <= c, 2).otherwise(0) + when(b <= c, 1).otherwise(0))
    val counts = trip.withColumn("_pat", pattern)
      .groupBy((keys.map(col) :+ col("_pat")): _*)
      .agg(count(lit(1)).as("_c"))
      .withColumn("_n", sum(col("_c")).over(wKey))
    val p = col("_c").cast("double") / col("_n")
    counts
      .withColumn("_term", (-p * log(p)).cast("decimal(28,12)"))
      .groupBy(keys.map(col): _*)
      .agg(max(col("_n")).cast("long").as("n_triples"),
        count(lit(1)).as("n_patterns"),
        round(sum(col("_term")).cast("double") / log(lit(6.0)), 6)
          .as("perm_entropy"))
  }

  /** Holt linear (double exponential) smoothing per series (Holt 1957):
    * lₜ = α·xₜ + (1−α)(lₜ₋₁+bₜ₋₁), bₜ = β(lₜ−lₜ₋₁) + (1−β)bₜ₋₁, seeded
    * l₁ = x₁, b₁ = x₂−x₁ (the textbook data seeds — deterministic, no
    * optimizer). `fitted` is the one-step-ahead forecast lₜ₋₁+bₜ₋₁ (= x₁
    * at t=1), so residuals are honest out-of-sample errors. Pack-sort-fold
    * per key ([[kalmanLevel]] shape); with dyadic α, β every engine
    * replays the recursion bit-for-bit. Keys need ≥ 2 points (the trend
    * seed); output (keys, ord, x, level, trend, fitted) at 6 dp. */
  def holtLinear(df: DataFrame, value: String, keys: Seq[String],
                 ordCol: String, alpha: Double, beta: Double): DataFrame = {
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1,
      s"smoothing parameters must lie in (0,1): ($alpha, $beta)")
    val packed = df.filter(col(value).isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(array_sort(collect_list(struct(col(ordCol).as("_gt"),
        col(value).cast("double").as("_gx")))).as("seq"))
      .filter(size(col("seq")) >= 2)
    // the two-state (level, trend) recurrence runs in the native O(n)
    // HoltScan — identical IEEE step order to the SQL fold it replaces,
    // minus the per-step accumulator-array copy (Θ(n²) on long series)
    graft.expressions.SeriesScan.register(df.sparkSession)
    packed.withColumn("_hw", expr(
        "graft_holt_scan(transform(seq, p -> p._gx), " +
          s"CAST('$alpha' AS DOUBLE), CAST('$beta' AS DOUBLE))"))
      .select((keys.map(col) :+
        explode(arrays_zip(col("seq"), col("_hw"))).as("_z")): _*)
      .select(keys.map(col) :+
        col("_z.seq._gt").as(ordCol) :+
        col("_z.seq._gx").as(value) :+
        quant6(col("_z._hw.l")).as("level") :+
        quant6(col("_z._hw.b")).as("trend") :+
        quant6(col("_z._hw.f")).as("fitted"): _*)
  }

  /** Holt–Winters ADDITIVE triple exponential smoothing per series
    * (Winters 1960) — [[holtLinear]] plus a `period`-phase seasonal state,
    * the classic fit for hourly/daily cycles: level, trend, seasonal, and
    * the one-step-ahead forecast ℓ+b+s (honest out-of-sample residuals).
    * The recurrence and its deterministic data seeds live in the native
    * O(n) [[graft.expressions.HwScan]] (ring-buffered seasonal state —
    * the pack-sort-fold family contract: no Θ(n²) accumulator copies, and
    * every IEEE step replayable by the oracle's recursive CTE). Keys need
    * ≥ 2·period points (the trend seed window); warm-up rows t ≤ period
    * are consumed by the seed and not emitted. Output (keys, ord, x,
    * level, trend, seasonal, fitted) at 6 dp. */
  def holtWinters(df: DataFrame, value: String, keys: Seq[String],
                  ordCol: String, period: Int, alpha: Double, beta: Double,
                  gamma: Double): DataFrame = {
    require(period >= 2, s"period must be >= 2, got $period")
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1 &&
      gamma > 0 && gamma < 1,
      s"smoothing parameters must lie in (0,1): ($alpha, $beta, $gamma)")
    val packed = df.filter(col(value).isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(array_sort(collect_list(struct(col(ordCol).as("_gt"),
        col(value).cast("double").as("_gx")))).as("seq"))
      .filter(size(col("seq")) >= 2 * period)
    graft.expressions.SeriesScan.register(df.sparkSession)
    packed.withColumn("_hw", expr(
        s"graft_hw_scan(transform(seq, p -> p._gx), $period, " +
          s"CAST('$alpha' AS DOUBLE), CAST('$beta' AS DOUBLE), " +
          s"CAST('$gamma' AS DOUBLE))"))
      // align outputs to t = period+1..n: drop the seed prefix of seq
      .withColumn("_tail", expr(s"slice(seq, ${period + 1}, size(seq))"))
      .select((keys.map(col) :+
        explode(arrays_zip(col("_tail"), col("_hw"))).as("_z")): _*)
      .select(keys.map(col) :+
        col("_z._tail._gt").as(ordCol) :+
        col("_z._tail._gx").as(value) :+
        quant6(col("_z._hw.l")).as("level") :+
        quant6(col("_z._hw.b")).as("trend") :+
        quant6(col("_z._hw.s")).as("seasonal") :+
        quant6(col("_z._hw.f")).as("fitted"): _*)
  }

  /** Classic additive seasonal decomposition per series (the
    * statsmodels/STL-lite shape): trend = centered moving average over an
    * ODD `period` (NULL until the window is full), seasonal = per-phase
    * mean of the detrended series re-centered to sum to zero across
    * phases, remainder = x − trend − seasonal. Three bounded passes: one
    * ordered window (trend + phase index share the sort), one phase-sized
    * aggregate, one broadcast join back — no global sort, all means from
    * exact-decimal sums. Output (keys, ord, x, phase, trend, seasonal,
    * resid).
    *
    * Re-centering convention: the offset is the mean over phases that
    * HAVE detrended rows, so the seasonal component sums to zero across
    * the phases that actually carry one. On series long enough for every
    * phase to fall inside a full trend window (≥ 2·period rows — the
    * statsmodels regime, which requires two full cycles) all `period`
    * phases are present and this is exactly the statsmodels offset; on
    * degenerate shorter series statsmodels refuses to decompose at all,
    * so the present-phases mean is this implementation's defined
    * extension (IndicatorsSpec pins it). */
  def seasonalDecompose(df: DataFrame, value: String, keys: Seq[String],
                        ord: Seq[Column], period: Int): DataFrame = {
    require(period >= 3 && period % 2 == 1,
      s"period must be odd and >= 3 (centered window), got $period")
    val h = (period - 1) / 2
    val wBase = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val wCtr = wBase.rowsBetween(-h, h)
    val base = df.filter(col(value).isNotNull)
      .withColumn("_pos", row_number().over(wBase))
      .withColumn("phase", (col("_pos") - 1) % period)
      .withColumn("_wn", count(lit(1)).over(wCtr))
      .withColumn("trend",
        when(col("_wn") === period,
          sum(col(value).cast(Dec)).over(wCtr).cast("double") / period))
      .withColumn("_det", col(value) - col("trend"))
    val seas = base.filter(col("_det").isNotNull)
      .groupBy((keys.map(col) :+ col("phase")): _*)
      .agg((sum(col("_det").cast(Dec)).cast("double") /
        count(lit(1))).as("_sraw"))
      // re-center so the seasonal component carries no level: subtract the
      // mean of the phase means (phase-count-sized window per key)
      .withColumn("_soff",
        sum(col("_sraw").cast(Dec)).over(Window.partitionBy(keys.map(col): _*))
          .cast("double") /
          count(lit(1)).over(Window.partitionBy(keys.map(col): _*)))
      .withColumn("seasonal", round(col("_sraw") - col("_soff"), 6))
      .select((keys.map(col) :+ col("phase") :+ col("seasonal")): _*)
    // seas is (keys × period)-sized: small enough that AQE broadcasts it
    // for modest key counts, correctly shuffle-joined beyond — no hint
    base.join(seas, keys :+ "phase", "left")
      .withColumn("trend", round(col("trend"), 6))
      .withColumn("resid",
        when(col("trend").isNotNull && col("seasonal").isNotNull,
          round(col(value) - col("trend") - col("seasonal"), 6)))
      .select(keys.map(col) ++ ord :+ col(value) :+ col("phase") :+
        col("trend") :+ col("seasonal") :+ col("resid"): _*)
  }

  /** Forecast accuracy per series: MAE, RMSE, SMAPE, and MASE (Hyndman &
    * Koehler 2006) of a prediction column against actuals. MASE scales MAE
    * by the in-sample naive one-step MAE (mean |yₜ − yₜ₋₁| over the same
    * rows) — the scale-free benchmark ratio (< 1 beats the naive
    * forecast); NULL when the series never moves. SMAPE terms skip rows
    * where |y|+|ŷ| = 0 (0/0 is undefined, not zero error). Error terms
    * quantize to exact decimals before summing, so the metrics are
    * partition-order-independent. One lag window + one aggregate per key.
    * Output: (keys, n_obs, mae, rmse, smape, mase). */
  def forecastAccuracy(df: DataFrame, actual: String, predicted: String,
                       keys: Seq[String], ord: Seq[Column]): DataFrame = {
    val wBase = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val base = df.filter(col(actual).isNotNull && col(predicted).isNotNull)
      .withColumn("_e", col(actual) - col(predicted))
      .withColumn("_nv", col(actual) - lag(col(actual), 1).over(wBase))
      .withColumn("_sden", abs(col(actual)) + abs(col(predicted)))
      .withColumn("_st", when(col("_sden") > 0,
        (lit(2.0) * abs(col("_e")) / col("_sden")).cast("decimal(28,12)")))
    val agged = base.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n_obs"),
      (sum(abs(col("_e")).cast(Dec)).cast("double") / count(lit(1)))
        .as("_mae"),
      sqrt(sum((col("_e") * col("_e")).cast(Dec)).cast("double") /
        count(lit(1))).as("_rmse"),
      (sum(col("_st")).cast("double") / count(col("_st"))).as("_smape"),
      (sum(abs(col("_nv")).cast(Dec)).cast("double") / count(col("_nv")))
        .as("_nmae"))
    agged
      .withColumn("mae", round(col("_mae"), 6))
      .withColumn("rmse", round(col("_rmse"), 6))
      .withColumn("smape", round(col("_smape"), 6))
      .withColumn("mase",
        when(col("_nmae") > 0, round(col("_mae") / col("_nmae"), 6)))
      .drop("_mae", "_rmse", "_smape", "_nmae")
  }

  /** Roll (1984) implied bid-ask spread per series: transaction prices
    * bouncing between bid and ask make successive price changes negatively
    * autocorrelated, and s = 2·√(−cov(Δpₜ, Δpₜ₋₁)) (population covariance)
    * recovers the effective spread from trade prices alone — the classic
    * microstructure estimator when quote data is absent. NULL when the
    * autocovariance is non-negative (trending market, no bounce signal —
    * Roll's own documented failure mode) or under 2 change-pairs. One lag
    * fan-out window (shared sort) + one exact-decimal moment aggregate —
    * the [[arHalfLife]] plan shape. Output (keys, n_pairs, dcov,
    * roll_spread). */
  def rollSpread(df: DataFrame, value: String, keys: Seq[String],
                 ord: Seq[Column]): DataFrame = {
    val wBase = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val pairs = df.filter(col(value).isNotNull)
      .withColumn("_d", col(value) - lag(col(value), 1).over(wBase))
      .withColumn("_dl", lag(col("_d"), 1).over(wBase))
      .filter(col("_d").isNotNull && col("_dl").isNotNull)
    def dsum(e: Column) = sum(e.cast(Dec)).cast("double")
    val agged = pairs.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n_pairs"),
      dsum(col("_d")).as("_sd"), dsum(col("_dl")).as("_sdl"),
      dsum(col("_d") * col("_dl")).as("_sddl"))
    val n = col("n_pairs").cast("double")
    val cov = (col("_sddl") - col("_sd") * col("_sdl") / n) / n
    agged
      .withColumn("dcov", round(cov, 6))
      .withColumn("roll_spread",
        when(cov < 0, round(lit(2.0) * sqrt(-cov), 6)))
      .drop("_sd", "_sdl", "_sddl")
  }

  /** Amihud (2002) illiquidity per series: ILLIQ = mean(|rₜ| / volumeₜ) —
    * the price impact per unit traded, the standard cheap liquidity proxy.
    * Rows with NULL price/volume or volume ≤ 0 drop (a zero-volume bar has
    * no impact estimate, and counting it would divide by zero). Each
    * per-row ratio quantizes to DECIMAL(28,12) before the mean so the
    * aggregate is partition-order-independent. One lag window + one
    * aggregate. Output (keys, n_obs, illiq). */
  def amihud(df: DataFrame, value: String, volume: String,
             keys: Seq[String], ord: Seq[Column]): DataFrame = {
    val wBase = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val rows = df.filter(col(value).isNotNull)
      .withColumn("_r", col(value) - lag(col(value), 1).over(wBase))
      .filter(col("_r").isNotNull && col(volume).isNotNull && col(volume) > 0)
      .withColumn("_t",
        (abs(col("_r")) / col(volume).cast("double")).cast("decimal(28,12)"))
    rows.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n_obs"),
      round(sum(col("_t")).cast("double") / count(lit(1)), 6).as("illiq"))
  }

  /** GARCH(1,1) variance FILTER with fixed parameters (Bollerslev 1986):
    * σ²ₜ = ω + α·r²ₜ₋₁ + β·σ²ₜ₋₁ over 1-step price differences, seeded at
    * the model's unconditional variance σ²₁ = ω/(1−α−β) (data-independent,
    * so the recursion is pure arithmetic both engines replay bit-for-bit).
    * This is the FILTER given (ω, α, β) — parameter ESTIMATION is an MLE
    * the reference stack would also delegate to a solver; with α+β < 1
    * enforced the filter is stationary. Mean-reverting generalisation of
    * [[ewmVolatility]] (λ-EWMA is the ω=0, α=1−λ, β=λ edge). Pack-sort-
    * fold per key ([[kalmanLevel]] shape, same single-return closed-form
    * guard). Output per return row: (keys, ord, ret, sigma2, sigma). */
  def garch(df: DataFrame, value: String, keys: Seq[String],
            ordCol: String, omega: Double, alpha: Double,
            beta: Double): DataFrame = {
    require(omega > 0 && alpha >= 0 && beta >= 0 && alpha + beta < 1,
      s"GARCH(1,1) needs omega>0, alpha,beta>=0, alpha+beta<1: " +
        s"($omega, $alpha, $beta)")
    val s21 = omega / (1.0 - alpha - beta)
    val packed = df.filter(col(value).isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(array_sort(collect_list(struct(col(ordCol).as("_gt"),
        col(value).cast("double").as("_gx")))).as("seq"))
      .filter(size(col("seq")) >= 2)
      // returns r[i] = x[i+1] − x[i]; _rts carries each return's ord key
      .withColumn("_rs", expr(
        "zip_with(slice(seq, 2, size(seq) - 1), slice(seq, 1, size(seq) - 1), (a, b) -> a._gx - b._gx)"))
      .withColumn("_rts", expr("transform(slice(seq, 2, size(seq) - 1), p -> p._gt)"))
    // the recurrence runs in the native O(n) GarchScan (r² via plain
    // multiplication, NOT pow — x*x is the identical IEEE op in any
    // engine, while pow(x, 2) is a libm call parity can't rely on); the
    // SQL-fold formulation it replaces copied the accumulator array per
    // step — Θ(n²) element copies inside one task on long series
    graft.expressions.SeriesScan.register(df.sparkSession)
    packed
      .withColumn("_s2", expr(
        s"graft_garch_scan(_rs, CAST('$omega' AS DOUBLE), " +
          s"CAST('$alpha' AS DOUBLE), CAST('$beta' AS DOUBLE))"))
      .select((keys.map(col) :+
        explode(arrays_zip(col("_rts"), col("_rs"), col("_s2"))).as("_z")): _*)
      .select(keys.map(col) :+
        col("_z._rts").as(ordCol) :+
        quant6(col("_z._rs")).as("ret") :+
        quant6(col("_z._s2")).as("sigma2") :+
        quant6(sqrt(col("_z._s2"))).as("sigma"): _*)
  }

  /** Split-conformal prediction intervals (Vovk et al. 2005; the
    * Lei et al. JASA 2018 split recipe) around the naive one-step
    * forecast ŷ_t = y_{t−1}: per series, the chronologically-first
    * ⌈calFrac·n⌉ forecastable bars calibrate, q̂ = the k-th smallest
    * absolute residual with k = ⌈(n_cal+1)·(1−α)⌉ — the finite-sample
    * marginal-coverage quantile — and every later bar gets
    * [ŷ−q̂, ŷ+q̂] plus its empirical coverage flag. α is taken as the
    * RATIONAL alphaNum/alphaDen so k comes from pure integer arithmetic
    * (⌈m·(d−n)/d⌉ = (m·(d−n)+d−1) div d) — no engine-dependent
    * float-times-count ceil at the rank boundary.
    *
    * Scale shape: two ordered windows per series (lag + running index)
    * and one calibration rank — per-key partitions, and a series' bar
    * count is calendar-bounded, not data-bounded (the adjudicated
    * market-index window contract). Residual ties at rank k break by
    * bar timestamp, so q̂ is deterministic cross-engine. Emits holdout
    * rows (keys…, ord, y, yhat, lo, hi, covered, n_cal, qhat, coverage)
    * with lo/hi/qhat/coverage rounded at 6 dp; series whose calibration
    * or holdout side is empty emit nothing. */
  /** Winkler interval score (Gneiting & Raftery, JASA 2007 eq. 43) — the
    * proper scoring rule for interval forecasts, penalizing width always
    * and misses by (2/α)·overshoot: narrow-but-honest intervals win, and
    * no forecaster can game it by widening or narrowing. 2/α arrives as
    * the precomputed `invAlpha` (20 for the 90% interval). One
    * map-side-combined aggregate; per-row score terms quantize to
    * DECIMAL(28,10) pre-sum (partition-order independence). Composes with
    * [[conformalNaive]]'s output (q277). Emits per key:
    * (n_obs, mean_width, coverage, mean_interval_score) at 6 dp. */
  def intervalScore(df: DataFrame, y: String, lo: String, hi: String,
                    keys: Seq[String], invAlpha: Double = 20.0): DataFrame = {
    val width = col(hi) - col(lo)
    val below = when(col(y) < col(lo),
      lit(invAlpha) * (col(lo) - col(y))).otherwise(lit(0.0))
    val above = when(col(y) > col(hi),
      lit(invAlpha) * (col(y) - col(hi))).otherwise(lit(0.0))
    val term = width + below + above
    df.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n_obs"),
      round(sum(width.cast("decimal(28,10)")).cast("double") /
        count(lit(1)), 6).as("mean_width"),
      round(sum((col(y) >= col(lo) && col(y) <= col(hi)).cast("int"))
        .cast("double") / count(lit(1)), 6).as("coverage"),
      round(sum(term.cast("decimal(28,10)")).cast("double") /
        count(lit(1)), 6).as("mean_interval_score"))
  }

  def conformalNaive(df: DataFrame, value: String, keys: Seq[String],
                     ordCol: String, alphaNum: Int = 1, alphaDen: Int = 10,
                     calFrac: Double = 0.8): DataFrame = {
    require(alphaNum > 0 && alphaNum < alphaDen,
      s"alpha must be in (0,1): $alphaNum/$alphaDen")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(ordCol))
    val base = df.filter(col(value).isNotNull)
      .withColumn("_yhat", lag(col(value), 1).over(w))
      .filter(col("_yhat").isNotNull)
    val wk = Window.partitionBy(keys.map(col): _*)
    val idx = base.withColumn("_rn", row_number().over(w.orderBy(col(ordCol))))
      .withColumn("_n", count(lit(1)).over(wk))
      // ⌈calFrac·n⌉ via integer-exact ceil on the decimal product
      .withColumn("_ncal",
        ceil(col("_n").cast("decimal(20,0)") * lit(calFrac).cast("decimal(3,2)"))
          .cast("long"))
    val cal = idx.filter(col("_rn") <= col("_ncal"))
      .withColumn("_r", abs(col(value) - col("_yhat")))
    val kExpr = (col("_ncal") + 1) * (alphaDen - alphaNum) + (alphaDen - 1)
    val qhat = cal
      .withColumn("_rr", row_number().over(wk.orderBy(col("_r"), col(ordCol))))
      .filter(col("_rr") ===
        least(floor(kExpr.cast("double") / alphaDen).cast("long"), col("_ncal")))
      .select((keys.map(col) :+ col("_r").as("_qhat")): _*)
    idx.filter(col("_rn") > col("_ncal"))
      .join(qhat, keys)
      .withColumn("_lo", col("_yhat") - col("_qhat"))
      .withColumn("_hi", col("_yhat") + col("_qhat"))
      .withColumn("covered",
        (col(value) >= col("_lo") && col(value) <= col("_hi")).cast("int"))
      .withColumn("coverage",
        round(sum(col("covered")).over(wk).cast("double") /
          count(lit(1)).over(wk), 6))
      .select(keys.map(col) :+ col(ordCol) :+
        col(value).as("y") :+ col("_yhat").as("yhat") :+
        round(col("_lo"), 6).as("lo") :+ round(col("_hi"), 6).as("hi") :+
        col("covered") :+ col("_ncal").as("n_cal") :+
        round(col("_qhat"), 6).as("qhat") :+ col("coverage"): _*)
  }
}
