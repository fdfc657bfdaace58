package graft.schemas

import org.apache.spark.sql.types._

/** Canonical schemas for the reference's data model (SURVEY.md §1.4) — the
  * engine's "catalog". The reference infers schemas everywhere
  * (pd.DataFrame(list_of_dicts), read_csv inference); we declare them, which
  * is what makes parquet pruning/pushdown and streaming ingestion reliable.
  */
object Schemas {

  /** Finnhub /quote document (finnhub/main.py:14-23): nested `data` struct
    * holding the quote payload, stamped with ingest time. */
  val quoteData: StructType = StructType(Seq(
    StructField("c", DoubleType),   // current price
    StructField("h", DoubleType),   // high
    StructField("l", DoubleType),   // low
    StructField("o", DoubleType),   // open
    StructField("pc", DoubleType),  // previous close
    StructField("d", DoubleType),   // change
    StructField("dp", DoubleType),  // percent change
    StructField("t", LongType)))    // quote epoch seconds

  val quoteDoc: StructType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("data", quoteData),
    StructField("timestamp", TimestampType)))

  /** yfinance daily history row (yahoo/main.py:10-18). */
  val ohlcvData: StructType = StructType(Seq(
    StructField("Open", DoubleType),
    StructField("High", DoubleType),
    StructField("Low", DoubleType),
    StructField("Close", DoubleType),
    StructField("Volume", DoubleType),
    StructField("Dividends", DoubleType),
    StructField("Stock Splits", DoubleType)))

  val ohlcvDoc: StructType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("data", ohlcvData),
    StructField("timestamp", TimestampType)))

  /** FRED macro observation, long/EAV form (fred/main.py:21-25). */
  val macroDoc: StructType = StructType(Seq(
    StructField("indicator", StringType), // GDP | CPIAUCSL | UNRATE
    StructField("value", DoubleType),
    StructField("timestamp", TimestampType)))

  /** Google Trends wide snapshot (google_trends/main.py:16-20): one column
    * per keyword, modeled as a map for schema stability, plus the pytrends
    * `isPartial` flag (true when the trailing window hadn't closed at fetch
    * time). The flag is record fidelity only: the reference's fuzzy
    * keyword→symbol map (integrate/main.py:16-29) can never match the
    * `isPartial` column name, so integration drops it there — and
    * [[graft.pipeline.Integrate.trendsLong]] drops it here. */
  val trendsDoc: StructType = StructType(Seq(
    StructField("scores", MapType(StringType, LongType)),
    StructField("is_partial", BooleanType),
    StructField("timestamp", TimestampType)))

  /** Tweet batch document (twitter/main.py:24-28): ≤50 packed per doc. */
  val tweet: StructType = StructType(Seq(
    StructField("content", StringType),
    StructField("username", StringType),
    StructField("date", StringType))) // iso8601 string, parsed downstream

  val tweetsDoc: StructType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("tweets", ArrayType(tweet)),
    StructField("timestamp", TimestampType)))

  val Symbols: Seq[String]    = Seq("AAPL", "MSFT", "AMZN", "TSLA")
  val Indicators: Seq[String] = Seq("GDP", "CPIAUCSL", "UNRATE")
}
