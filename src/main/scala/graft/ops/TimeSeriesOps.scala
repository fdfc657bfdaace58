package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators covering SURVEY.md §2.5 (W1–W8) and A3/A4/A9.
  *
  * All operators are window/agg compositions keyed on the series id, so the
  * only shuffle is the hash exchange on the key — per-key work then runs
  * sort-locally inside each partition. A per-symbol driver loop (what the
  * reference does, integrate/main.py:95-128) is deliberately absent: the key
  * IS the partition.
  */
object TimeSeriesOps {

  private def w(keys: Seq[String], ord: Seq[Column]) =
    Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)

  /** W1 — 1-step percentage change over event time
    * (reference: pct_change, integrate/main.py:120). A zero previous value
    * yields NULL rather than pandas' ±inf — under ANSI SQL the bare
    * division would otherwise ABORT the job on the first zero (a
    * scale-dependent time bomb: small samples may contain none). */
  def pctChange(df: DataFrame, value: String, keys: Seq[String], ord: Seq[Column], out: String): DataFrame = {
    val prev = lag(col(value), 1).over(w(keys, ord))
    df.withColumn(out, when(prev =!= 0, (col(value) - prev) / prev))
  }

  /** W2 — next-step lead (reference: shift(-1) label, integrate/main.py:121). */
  def leadNext(df: DataFrame, value: String, keys: Seq[String], ord: Seq[Column], out: String): DataFrame =
    df.withColumn(out, lead(col(value), 1).over(w(keys, ord)))

  /** W3 — lag-feature fan-out 1..n (reference: analysis_part/main.py:83-85).
    * All lags share one window spec → Catalyst plans a single sort + one
    * Window exec reading n frames; no repeated shuffles. */
  def lagFeatures(df: DataFrame, value: String, n: Int, keys: Seq[String], ord: Seq[Column]): DataFrame = {
    val win = w(keys, ord)
    (1 to n).foldLeft(df)((d, i) => d.withColumn(s"${value}_lag$i", lag(col(value), i).over(win)))
  }

  /** A3 (helper) — collapse to one row per (keys, time-bucket) keeping the
    * positionally-last value, made deterministic via max_by on (ts, tie)
    * (reference pivot aggfunc="last", integrate/main.py:71). */
  def bucketLast(df: DataFrame, keys: Seq[String], ts: String, unit: String,
                 value: String, tie: Seq[String]): DataFrame = {
    val ordKey = struct((col(ts) +: tie.map(col)): _*)
    df.groupBy((keys.map(col) :+ date_trunc(unit, col(ts)).as("bucket")): _*)
      .agg(max_by(col(value), ordKey).as(value))
  }

  /** W4 + F9 — resample to a fixed step and forward-fill: generate the full
    * per-key grid (sequence + explode — a generator, not a driver loop), left
    * join observations, then last(ignoreNulls) over an unbounded-preceding
    * frame (reference: resample("1H").ffill(), integrate/main.py:72).
    * One shuffle on keys; grid generation is embarrassingly parallel. */
  def gapFillFFill(df: DataFrame, keys: Seq[String], bucket: String,
                   step: String, value: String, out: String): DataFrame = {
    val bounds = df.groupBy(keys.map(col): _*)
      .agg(min(col(bucket)).as("_lo"), max(col(bucket)).as("_hi"))
    val grid = bounds.select(
      keys.map(col) :+ explode(sequence(col("_lo"), col("_hi"), expr(step))).as(bucket): _*)
    val ffillW = w(keys, Seq(col(bucket))).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(df, keys :+ bucket, "left")
      .select((keys.map(col) :+ col(bucket) :+
        last(col(value), ignoreNulls = true).over(ffillW).as(out)): _*)
  }

  /** Multi-column variant of gapFillFFill: one generated grid, one window,
    * all value columns forward-filled in the same pass. With empty `keys`
    * the grid/ffill window is global — only appropriate for small frames
    * (e.g. a 3-indicator macro panel), since a global window is a single
    * partition. */
  def gapFillFFillMulti(df: DataFrame, keys: Seq[String], bucket: String,
                        step: String, values: Seq[String]): DataFrame = {
    val bounds = if (keys.isEmpty) df.agg(min(col(bucket)).as("_lo"), max(col(bucket)).as("_hi"))
      else df.groupBy(keys.map(col): _*).agg(min(col(bucket)).as("_lo"), max(col(bucket)).as("_hi"))
    val grid = bounds.select(
      keys.map(col) :+ explode(sequence(col("_lo"), col("_hi"), expr(step))).as(bucket): _*)
    val ffillW = Window.partitionBy(keys.map(col): _*).orderBy(col(bucket))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(df, keys :+ bucket, "left")
      .select(keys.map(col) ++ (col(bucket) +:
        values.map(v => last(col(v), ignoreNulls = true).over(ffillW).as(v))): _*)
  }

  /** W5 / A4 — group-mean imputation keeping row alignment (window, not
    * groupBy — reference: transform(mean) fillna, integrate/main.py:114-117).
    * The mean uses an exact decimal sum (see Relational.exactSum) so imputed
    * values are identical regardless of partition merge order. */
  def groupMeanImpute(df: DataFrame, value: String, groupExpr: Column, out: String): DataFrame = {
    val gw = Window.partitionBy(groupExpr)
    val mean = sum(col(value).cast(Relational.ExactDec)).over(gw).cast("double") /
      count(col(value)).over(gw)
    df.withColumn(out, coalesce(col(value), mean))
  }

  /** W6 — chronological train/test split tag (reference: int(len*0.8) iloc
    * slicing, analysis_part/main.py:91-93). floor() keeps pandas truncation
    * semantics. */
  def chronoSplitTag(df: DataFrame, keys: Seq[String], ord: Seq[Column],
                     frac: Double, out: String): DataFrame = {
    val rn = row_number().over(w(keys, ord))
    val n  = count(lit(1)).over(Window.partitionBy(keys.map(col): _*))
    df.withColumn(out, rn <= floor(n * frac))
  }

  /** W8 — previous-day value per key with latest-value fallback (reference:
    * dashboard/app.py:17-30). Two hash aggregates + a broadcastable join of
    * per-key scalars; no full-table window. */
  def prevDayValue(df: DataFrame, keys: Seq[String], ts: String, value: String,
                   tie: Seq[String], out: String): DataFrame = {
    val ordKey = struct((col(ts) +: tie.map(col)): _*)
    val latest = df.groupBy(keys.map(col): _*).agg(
      max(to_date(col(ts))).as("_latest_date"),
      max_by(col(value), ordKey).as("_last_v"))
    val prev = df.join(latest, keys)
      .filter(to_date(col(ts)) === date_sub(col("_latest_date"), 1))
      .groupBy(keys.map(col): _*).agg(max_by(col(value), ordKey).as("_prev_v"))
    latest.join(prev, keys, "left")
      .select(keys.map(col) :+ coalesce(col("_prev_v"), col("_last_v")).as(out): _*)
  }

  /** As-of join (J5 made explicit): for every left row, the latest right row
    * with right.ts ≤ left.ts within the same keys. Implemented as the
    * union-and-carry composition: tag both sides, union, one window pass
    * carrying the last right value forward, keep left rows. ONE shuffle on
    * (keys) and one per-key sort — same cost shape as a sort-merge join, no
    * custom physical operator needed (preference (a) of the builder's
    * custom-op ladder). `payload` names right-side columns to carry.
    * Right rows at exactly left.ts sort BEFORE left rows (tag order), so a
    * same-timestamp right row IS visible to the left row (ASOF <= match). */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String], ts: String,
               payload: Seq[String]): DataFrame = {
    val lTag = left.withColumn("_src", lit(1))
    val rTag = right.withColumn("_src", lit(0))
    val unioned = lTag.unionByName(rTag, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col("_src").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(unioned) { (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("_src") === 1).drop("_src")
      .select(left.columns.map(col) ++ payload.map(col): _*)
  }

  /** Forward as-of join with tolerance (pandas `merge_asof(direction=
    * 'forward', tolerance=...)` analog): for every left row, the EARLIEST
    * right row with left.ts ≤ right.ts ≤ left.ts + tolerance in the same
    * keys. Same union-and-carry shape as [[asofJoin]], with the window
    * frame flipped to (current, unbounded following) and a post-carry
    * tolerance mask (the carried right timestamp rides along as
    * `matched_ts`; NULL when nothing lands inside the tolerance). Right
    * rows at exactly left.ts sort AFTER left rows, so a same-timestamp
    * right row IS visible (ASOF ≥ match). Still ONE shuffle + one sort. */
  def asofJoinForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                      ts: String, payload: Seq[String],
                      toleranceSeconds: Long): DataFrame = {
    val lTag = left.withColumn("_src", lit(1))
    // The whole right row rides in ONE struct so the matched timestamp and
    // every payload field come from the SAME row (merge_asof row semantics):
    // a NULL payload on the nearest forward row stays NULL instead of being
    // back-filled from a later — possibly out-of-tolerance — right row.
    val rTag = right.select(keys.map(col) :+ col(ts) :+ lit(2).as("_src") :+
      struct(col(ts).as("_rts") +: payload.map(col): _*).as("_pack"): _*)
    val unioned = lTag.unionByName(rTag, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col("_src").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = unioned
      .withColumn("_pack", first(col("_pack"), ignoreNulls = true).over(w))
    val within = col("_pack").isNotNull &&
      (col("_pack._rts").cast("long") - col(ts).cast("long")) <= toleranceSeconds
    carried.filter(col("_src") === 1)
      .select(left.columns.map(col) ++
        payload.map(c => when(within, col(s"_pack.`$c`")).as(c)) :+
        when(within, col("_pack._rts")).as("matched_ts"): _*)
  }

  /** Linear interpolation of missing values per key (pandas
    * `interpolate(method='time')` analog — completes the imputation family
    * next to W4's ffill and W5's group-mean): a NULL between two
    * observations lerps on the time axis; leading/trailing NULLs back/
    * forward-fill from the nearest observation. Both neighbours ride as
    * ATOMIC (ts, value) structs (the asofJoinForward lesson: per-column
    * carries can mix rows), so the lerp always uses one real row on each
    * side. Two frame-bounded windows over one key sort — a single shuffle;
    * equal-timestamp neighbours fall back to the previous value instead of
    * dividing by zero. */
  def interpolateLinear(df: DataFrame, keys: Seq[String], ts: String,
                        value: String): DataFrame = {
    val wB = Window.partitionBy(keys.map(col): _*).orderBy(col(ts).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(keys.map(col): _*).orderBy(col(ts).asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val packed = when(col(value).isNotNull,
      struct(col(ts).as("t"), col(value).cast("double").as("x")))
    df.withColumn("_p", last(packed, ignoreNulls = true).over(wB))
      .withColumn("_n", first(packed, ignoreNulls = true).over(wF))
      .withColumn(s"${value}_lerp", round(
        when(col(value).isNotNull, col(value).cast("double"))
          .when(col("_p").isNotNull && col("_n").isNotNull &&
              col("_n.t") =!= col("_p.t"),
            col("_p.x") + (col("_n.x") - col("_p.x")) *
              (col(ts).cast("double") - col("_p.t").cast("double")) /
              (col("_n.t").cast("double") - col("_p.t").cast("double")))
          .when(col("_p").isNotNull, col("_p.x"))
          .when(col("_n").isNotNull, col("_n.x")), 6))
      .drop("_p", "_n")
  }

  /** Batch session windows (gaps-and-islands): rows within `gap` of the
    * previous row share a session; emits per-session aggregates. The
    * streaming analog is streaming.Sessionize (flatMapGroupsWithState). */
  def sessionAgg(df: DataFrame, keys: Seq[String], ts: String, value: String,
                 gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(ts))
    val flagged = df.withColumn("_new",
      when(col(ts).cast("long") - lag(col(ts), 1).over(w).cast("long") > gapSeconds, 1)
        .otherwise(lit(0)))
    val withId = flagged.withColumn("_sid",
      sum(col("_new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withId.groupBy((keys.map(col) :+ col("_sid").as("session_id")): _*)
      .agg(min(col(ts)).as("session_start"), max(col(ts)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col(value).cast(Relational.ExactDec)).cast("double").as("sum_value"))
  }

  /** A9 — fixed-bin histogram with probability-density normalization
    * (reference: px.histogram nbins=60 histnorm="probability density",
    * dashboard/app.py:333-336). min/max are a 1-row agg broadcast via cross
    * join; bucketing is a pure per-row expression (codegen'd). */
  def histogramDensity(df: DataFrame, value: String, bins: Int): DataFrame = {
    val stats = df.agg(min(col(value)).as("_lo"), max(col(value)).as("_hi"),
      count(col(value)).as("_n"))
    // degenerate constant column (hi = lo): everything lands in bucket 0
    // with NULL density, instead of an ANSI divide-by-zero abort
    val span = col("_hi") - col("_lo")
    val bucket = when(span =!= 0, least(greatest(
      floor((col(value) - col("_lo")) / span * bins), lit(0.0)),
      lit((bins - 1).toDouble)).cast("int")).otherwise(lit(0))
    df.crossJoin(stats)
      .groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"),
        when(first(col("_hi")) =!= first(col("_lo")),
          count(lit(1)) / (first(col("_n")) *
            ((first(col("_hi")) - first(col("_lo"))) / bins)))
          .as("density"))
  }

  /** Seasonal-naive decomposition + residual z-score anomaly flags: the
    * classic ops-metrics shape (a metric with a strong weekly/daily cycle;
    * "is this value weird FOR a Tuesday 3pm?" rather than "is it weird
    * overall?"). seasonal(key, slot) = mean over the series' (day-of-week,
    * hour-of-day) slot; residual = value − seasonal; z = residual /
    * stddev_samp(residual | key); anomaly = |z| > `zThresh`.
    *
    * Day-of-week is the PORTABLE epoch-day mod 7 (0 = Thursday — 1970-01-01
    * was one), not `dayofweek()`: engines disagree on week-start numbering
    * (Spark 1=Sun..7, DuckDB 0=Sun..6) and a calendar off-by-one would
    * silently shift every seasonal slot.
    *
    * Scale shape: the seasonal profile is ≤ |keys|·168 rows and the
    * residual-σ frame |keys| rows — both broadcast back onto the scan, so
    * the data itself never shuffles; two map-side-combined aggregates + two
    * broadcast joins total. Rounding only at the emitted columns (6 dp). */
  def seasonalDecompose(df: DataFrame, ts: String, value: String,
                        keys: Seq[String], zThresh: Double = 3.0): DataFrame = {
    val k = keys.map(col)
    val v = col(value).cast("double")
    val slotted = df.filter(v.isNotNull)
      .withColumn("_dow", pmod(datediff(to_date(col(ts)), lit("1970-01-01")), lit(7)))
      .withColumn("_hr", hour(col(ts)))
    val prof = slotted.groupBy((k :+ col("_dow") :+ col("_hr")): _*)
      .agg(avg(v).as("_seasonal"))
    val withSeasonal = slotted
      .join(broadcast(prof), keys ++ Seq("_dow", "_hr"))
      .withColumn("_resid", v - col("_seasonal"))
    val sds = withSeasonal.groupBy(k: _*)
      .agg(stddev_samp(col("_resid")).as("_sd"))
    withSeasonal.join(broadcast(sds), keys)
      .withColumn("seasonal", round(col("_seasonal"), 6))
      .withColumn("residual", round(col("_resid"), 6))
      .withColumn("z", round(when(col("_sd") > 0, col("_resid") / col("_sd")), 6))
      .withColumn("is_anomaly",
        when(col("_sd") > 0, abs(col("_resid") / col("_sd")) > zThresh)
          .otherwise(lit(false)))
      .drop("_dow", "_hr", "_seasonal", "_resid", "_sd")
  }
}
