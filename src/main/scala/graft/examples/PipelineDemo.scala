package graft.examples

import graft.analytics.{Forecast, Granger}
import graft.pipeline.{Integrate, Preprocess, Serve}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end library consumer: the reference's full DAG (SURVEY.md §3) —
  * ingest fixtures → preprocess → integrate → serve panels → Granger →
  * forecast — as one Spark program. Run:
  *   sbt "runMain graft.examples.PipelineDemo"
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cutoff = java.sql.Timestamp.valueOf("2025-08-01 12:00:00")
    val quotes = graft.Fixtures.quotes(spark)
    println(s"[demo] raw quote docs: ${quotes.count()}")

    val clean = Preprocess.clean(quotes)
    println(s"[demo] cleaned quotes: ${clean.count()} (flattened cols: ${clean.columns.mkString(",")})")

    val integrated = Integrate.integrate(clean, graft.Fixtures.yahoo(spark),
      graft.Fixtures.fred(spark), graft.Fixtures.trends(spark), cutoff).cache()
    println(s"[demo] integrated panel: ${integrated.count()} rows × ${integrated.columns.length} cols")

    println("[demo] market overview (last price / pct change):")
    Serve.lastChange(integrated).orderBy("symbol").show(truncate = false)
    println("[demo] volatility stability:")
    Serve.volatilityStability(integrated).orderBy("symbol").show(truncate = false)

    val granger = Granger.sweep(integrated, "symbol", "hour", "c",
      Seq("trend_score", "UNRATE"), maxLag = 3)
    println("[demo] granger (c ~ predictors):")
    granger.orderBy("symbol", "predictor", "lag").show(30, truncate = false)

    val aapl = integrated.filter(col("symbol") === "AAPL").select(col("hour"), col("c"))
    val fc = Forecast.forecastSymbol(aapl, "hour", "c", nLags = 12, horizon = 24, maxIter = 30)
    println(f"[demo] AAPL forecast rmse=${fc.rmse}%.4f, first steps:")
    fc.forecast.orderBy("step").show(5, truncate = false)

    // §3.2 entry point: the whole analytics stage with artifact sinks
    val outDir = java.nio.file.Files.createTempDirectory("graft_demo_analysis").toString
    val report = graft.pipeline.Analysis.run(integrated, maxLag = 2, nLags = 12,
      horizon = 24, maxIter = 30, outDir = Some(outDir))
    println(s"[demo] analysis: corr=${report.correlation.count()} rows, " +
      s"causality=${report.causality.count()} rows, " +
      s"forecasts=${report.forecasts.count()} rows, errors=${report.errors.size} → $outDir")

    spark.stop()
  }
}
