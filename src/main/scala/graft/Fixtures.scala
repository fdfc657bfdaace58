package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic domain fixtures mirroring the reference's source schemas
  * (FIXTURES.md B, SURVEY.md 1.4): 4 symbols x 240 hourly snapshots,
  * seed 42, injected duplicates/nulls. In main sources (not test) so the
  * examples and any library consumer can generate a working corpus. */
object Fixtures {
  import java.sql.Timestamp

  final case class QuoteData(c: Option[Double], h: Option[Double], l: Option[Double],
                             o: Option[Double], pc: Option[Double], d: Option[Double],
                             dp: Option[Double], t: Option[Long])
  final case class QuoteDoc(symbol: String, data: QuoteData, timestamp: Timestamp)
  final case class FredDoc(indicator: String, value: Option[Double], timestamp: Timestamp)
  final case class TrendsDoc(scores: Map[String, Long], is_partial: Boolean,
                             timestamp: Timestamp)
  final case class YahooRow(symbol: String, Open: Double, High: Double, Low: Double,
                            Close: Double, Volume: Double, Dividends: Double,
                            timestamp: Timestamp)

  val Symbols: Seq[String] = Seq("AAPL", "MSFT", "AMZN", "TSLA")
  val T0: Long = Timestamp.valueOf("2025-08-01 00:00:00").getTime
  def ts(hour: Int, minuteOffset: Int = 7): Timestamp =
    new Timestamp(T0 + hour * 3600000L + minuteOffset * 60000L)
  val Hours = 240

  private def price(sym: String, h: Int): Double = {
    val base = 100.0 + Symbols.indexOf(sym) * 50
    BigDecimal(base + math.sin(h * 0.3 + Symbols.indexOf(sym)) * 5 + h * 0.01)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** Quote docs: nested struct, ~2% duplicated rows, ~3% null `c`. */
  def quotes(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = for {
      sym <- Symbols; h <- 0 until Hours
      cNull = rnd.nextDouble() < 0.03
      p = price(sym, h)
      row = QuoteDoc(sym, QuoteData(
        if (cNull) None else Some(p), Some(p + 1), Some(p - 1), Some(p - 0.5),
        Some(p - 0.2), Some(0.2), Some(0.1), Some(ts(h).getTime / 1000)), ts(h))
      dup <- if (rnd.nextDouble() < 0.02) Seq(row, row) else Seq(row)
    } yield dup
    rows.toDF()
  }

  /** Yahoo rows (already flat — the reference's preprocess emits them flat):
    * one observation per day at hour 0. */
  def yahoo(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows = for { sym <- Symbols; day <- 0 until Hours / 24 } yield {
      val p = price(sym, day * 24)
      YahooRow(sym, p, p + 2, p - 2, p + 0.5, 1e6 + day * 1000 + Symbols.indexOf(sym), 0.0,
        ts(day * 24, 1))
    }
    val df = rows.toDF()
    df.withColumnRenamed("Dividends", "Dividends")
      .withColumn("Stock Splits", org.apache.spark.sql.functions.lit(0.0))
  }

  /** FRED long-form: GDP every 72h, CPIAUCSL every 24h, UNRATE every 12h —
    * exercises ffill across publication gaps. */
  def fred(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val specs = Seq(("GDP", 72, 27000.0), ("CPIAUCSL", 24, 310.0), ("UNRATE", 12, 3.9))
    val rows = for {
      (ind, every, base) <- specs
      h <- 0 until Hours if h % every == 0
    } yield FredDoc(ind, Some(base + h * 0.01), ts(h, 3))
    rows.toDF()
  }

  /** Trends wide map every 6h; includes an unmapped ticker-looking keyword.
    * The final snapshot carries pytrends' isPartial = true (trailing window
    * still open at fetch time, google_trends/main.py:16-19). */
  def trends(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val last = ((Hours - 1) / 6) * 6
    val rows = for (h <- 0 until Hours if h % 6 == 0) yield TrendsDoc(
      Map("AAPL stock" -> (50L + h % 40), "MSFT stock" -> (40L + h % 30),
        "AMZN stock" -> (30L + h % 20), "TSLA stock" -> (60L + h % 25),
        "NVDA stock" -> (20L + h % 10)), h == last, ts(h, 5))
    rows.toDF()
  }
}
