package graft.pipeline

import graft.ops.TimeSeriesOps
import graft.schemas.Schemas
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage 2 — integration (reference: integrate/main.py:31-135).
  *
  * The reference's per-symbol Python loop (`:95-128`) is a manual
  * partition-wise join; here the symbol key IS the partitioning, so the
  * whole pipeline is ONE plan: hash exchanges on (symbol[, hour]) feed the
  * joins and windows, dims (fred, trends) broadcast, and Catalyst pushes the
  * cutoff filter into every scan. At 1000 executors nothing about this plan
  * changes — there is no driver-side iteration anywhere.
  */
object Integrate {

  /** F5 — floor timestamps to the hour (integrate/main.py:57,90). */
  def floorHour(df: DataFrame, ts: String, out: String = "hour"): DataFrame =
    df.withColumn(out, date_trunc("hour", col(ts)))

  /** P5 — history cutoff (integrate/main.py:60-67); a plain pushed-down
    * range predicate. */
  def applyCutoff(df: DataFrame, ts: String, cutoff: java.sql.Timestamp): DataFrame =
    df.filter(col(ts) >= lit(cutoff))

  /** A3 + W4 — FRED long→wide with positional-last semantics, then hourly
    * grid + forward fill (integrate/main.py:71-72). Deterministic `last` via
    * max_by on the observation timestamp. The indicator panel is tiny
    * relative to quotes → broadcast downstream. */
  def fredHourly(fred: DataFrame, cutoff: java.sql.Timestamp): DataFrame = {
    val pivoted = applyCutoff(fred, "timestamp", cutoff)
      .groupBy(date_trunc("hour", col("timestamp")).as("hour"))
      .pivot("indicator", Schemas.Indicators)
      .agg(max_by(col("value"), col("timestamp")))
    TimeSeriesOps.gapFillFFillMulti(pivoted, Nil, "hour", "interval 1 hour", Schemas.Indicators)
  }

  /** J4 — fuzzy trend-keyword → symbol mapping (integrate/main.py:16-29):
    * lower-containment against the symbol universe, else the leading
    * A-Z token of the keyword when it looks like a ticker. Data-side
    * expression (the reference does it over column names on the driver). */
  def keywordToSymbol(kw: Column, symbols: Seq[String]): Column = {
    val contained = symbols.foldLeft(lit(null).cast("string")) { (acc, s) =>
      coalesce(acc, when(lower(kw).contains(s.toLowerCase), lit(s)))
    }
    val tok = split(kw, "\\s|[:\\-]").getItem(0)
    coalesce(contained, when(tok.rlike("^[A-Z]{1,5}$"), tok))
  }

  /** Trends wide-map → long (timestamp, symbol, trend_score)
    * (integrate/main.py:75-90: melt + fuzzy map + re-floor). */
  def trendsLong(trends: DataFrame, cutoff: java.sql.Timestamp): DataFrame =
    applyCutoff(trends, "timestamp", cutoff)
      .select(col("timestamp"), explode(col("scores")).as(Seq("keyword", "trend_score")))
      .withColumn("symbol", keywordToSymbol(col("keyword"), Schemas.Symbols))
      .filter(col("symbol").isNotNull)
      .groupBy(date_trunc("hour", col("timestamp")).as("hour"), col("symbol"))
      .agg(max_by(col("trend_score"), col("timestamp")).as("trend_score"))

  /** Collapse a source to one row per (symbol, hour) keeping the latest
    * observation of every column — the reference relies on upstream dedup
    * for this; we make it explicit and deterministic. */
  private def hourlyLatest(df: DataFrame, payload: Seq[String]): DataFrame = {
    val g = floorHour(df, "timestamp")
    g.groupBy(col("symbol"), col("hour"))
      .agg(max_by(struct(payload.map(col): _*), col("timestamp")).as("_r"))
      .select(Seq(col("symbol"), col("hour")) ++ payload.map(c => col(s"_r.$c").as(c)): _*)
  }

  /** Suffix right-side columns clashing with the left (pandas join
    * rsuffix="_y", integrate/main.py:101). */
  def suffixClashes(left: DataFrame, right: DataFrame, keys: Seq[String], suffix: String): DataFrame =
    right.columns.filterNot(keys.contains).filter(left.columns.contains)
      .foldLeft(right)((d, c) => d.withColumnRenamed(c, c + suffix))

  /** The full integrate query (§3.1): returns the per-symbol hourly panel
    * with quote + yahoo + trend + macro columns, daily-mean-imputed, plus
    * ret_1h / ret_1h_next. */
  def integrate(quotes: DataFrame, yahoo: DataFrame, fred: DataFrame,
                trends: DataFrame, cutoff: java.sql.Timestamp): DataFrame = {
    val quoteCols = Seq("c", "h", "l", "o", "pc", "d", "dp", "t")
    val yahooCols = Schemas.ohlcvData.fieldNames.toSeq
    val q = hourlyLatest(applyCutoff(quotes, "timestamp", cutoff), quoteCols)
    val y = suffixClashes(q, hourlyLatest(applyCutoff(yahoo, "timestamp", cutoff), yahooCols),
      Seq("symbol", "hour"), "_y")
    val t = trendsLong(trends, cutoff)
    val f = fredHourly(fred, cutoff)

    val joined = q
      .join(y, Seq("symbol", "hour"), "left")                 // J1
      .join(t, Seq("hour", "symbol"), "left")                 // J2
      .join(broadcast(f), Seq("hour"), "left")                // J3 (small dim)
      .filter(col("c").isNotNull)                             // P6

    // W5 — daily-mean imputation per (symbol, day), row-aligned
    val numeric = joined.schema.fields.collect {
      case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
        && f.name != "t" => f.name
    }
    val dayW = Window.partitionBy(col("symbol"), to_date(col("hour")))
    val imputed = numeric.foldLeft(joined) { (d, c) =>
      d.withColumn(c, coalesce(col(c),
        sum(col(c).cast(graft.ops.Relational.ExactDec)).over(dayW).cast("double") /
          count(col(c)).over(dayW)))
    }

    // W1/W2 — hourly return and next-hour label (integrate/main.py:120-121).
    // NULL return on a zero previous price: under ANSI the bare division
    // would abort the whole pipeline on the first zero at scale.
    val w = Window.partitionBy("symbol").orderBy("hour")
    val prev = lag(col("c"), 1).over(w)
    imputed
      .withColumn("ret_1h", when(prev =!= 0, (col("c") - prev) / prev))
      .withColumn("ret_1h_next", lead(col("ret_1h"), 1).over(w))
  }

  /** S6 — per-symbol partitioned sink (integrate/main.py:123-124): readers
    * of one symbol prune to one partition directory. */
  def writePartitioned(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").partitionBy("symbol").parquet(path)
}
