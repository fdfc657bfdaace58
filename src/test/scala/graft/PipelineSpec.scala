package graft

import graft.pipeline.{Integrate, Preprocess, Serve}
import org.apache.spark.sql.functions._

/** Golden end-to-end pipeline test (SURVEY.md §5.3): preprocess → integrate
  * → serve over the seed-42 domain fixtures. */
class PipelineSpec extends SparkSpec {
  import java.sql.Timestamp
  private val cutoff = Timestamp.valueOf("2025-08-01 12:00:00")

  private lazy val quotesClean =
    Preprocess.clean(Fixtures.quotes(spark))
  private lazy val integrated = Integrate.integrate(
    quotesClean, Fixtures.yahoo(spark), Fixtures.fred(spark),
    Fixtures.trends(spark), cutoff).cache()

  test("preprocess flattens the nested data struct and dedups/drops nulls") {
    assert(quotesClean.columns.toSet ==
      Set("symbol", "timestamp", "c", "h", "l", "o", "pc", "d", "dp", "t"))
    // dedup removed injected duplicates: (symbol, timestamp) now unique
    assert(quotesClean.groupBy("symbol", "timestamp").count()
      .filter(col("count") > 1).count() == 0)
    // dropna removed null-c rows entirely
    assert(quotesClean.filter(col("c").isNull).count() == 0)
  }

  test("integrated panel has the reference's column surface") {
    val cols = integrated.columns.toSet
    assert(Set("symbol", "hour", "c", "h", "l", "o", "pc", "d", "dp",
      "Open", "Close", "Volume", "trend_score", "GDP", "CPIAUCSL", "UNRATE",
      "ret_1h", "ret_1h_next").subsetOf(cols))
  }

  test("cutoff filter drops pre-cutoff hours") {
    assert(integrated.filter(col("hour") < lit(cutoff)).count() == 0)
  }

  test("fred forward-fill covers every hour after first observation") {
    // UNRATE publishes every 12h; first post-cutoff obs is h=12 → every
    // integrated hour (all ≥ cutoff=h12) carries a value
    assert(integrated.filter(col("UNRATE").isNull).count() == 0)
    // GDP's h=0 obs falls BEFORE the cutoff (reference filters fred too,
    // integrate/main.py:60-67) → h=13 has no GDP (daily imputation can't
    // help: no GDP obs that day), while h=73 carries the h=72 publication
    val gdp = integrated.filter(col("symbol") === "AAPL")
      .select(col("hour"), col("GDP")).collect()
      .map(r => r.getTimestamp(0).toString -> Option(r.get(1))).toMap
    assert(gdp("2025-08-01 13:00:00.0").isEmpty)
    assert(math.abs(gdp("2025-08-04 01:00:00.0").get.asInstanceOf[Double]
      - (27000.0 + 72 * 0.01)) < 1e-9)
  }

  test("daily-mean imputation fills join-sparse Volume with the day's value") {
    // yahoo lands once per day → 23 of 24 hours start null → imputed to the
    // day's single observed value
    val d2 = integrated.filter(col("symbol") === "AAPL" &&
      to_date(col("hour")) === lit(java.sql.Date.valueOf("2025-08-02")))
    val vols = d2.select("Volume").na.drop().distinct().collect()
    assert(vols.length == 1)
    assert(d2.filter(col("Volume").isNull).count() == 0)
  }

  test("ret_1h matches manual pct_change and lead is null at series end") {
    val aapl = integrated.filter(col("symbol") === "AAPL").orderBy("hour")
      .select("hour", "c", "ret_1h", "ret_1h_next").collect()
    val i = 5
    val expected = (aapl(i).getDouble(1) - aapl(i - 1).getDouble(1)) / aapl(i - 1).getDouble(1)
    assert(math.abs(aapl(i).getDouble(2) - expected) < 1e-12)
    assert(aapl.last.isNullAt(3)) // lead at partition end
    // ret_1h_next is next row's ret_1h
    assert(math.abs(aapl(i).getDouble(3) - aapl(i + 1).getDouble(2)) < 1e-12)
  }

  test("trend keyword fuzzy-mapping hits the universe and ticker-like extras") {
    val t = Integrate.trendsLong(Fixtures.trends(spark), cutoff)
    val syms = t.select("symbol").distinct().collect().map(_.getString(0)).toSet
    assert(syms == Set("AAPL", "MSFT", "AMZN", "TSLA", "NVDA"))
  }

  test("trends docs carry pytrends isPartial; integration drops it untouched") {
    // record fidelity (google_trends/main.py:16-19): the flag lands in the
    // doc schema and marks exactly the trailing open window — but the fuzzy
    // keyword→symbol map can never match it, so the long form excludes it
    val docs = Fixtures.trends(spark)
    assert(docs.schema.fieldNames.contains("is_partial"))
    val flagged = docs.filter(col("is_partial")).collect()
    assert(flagged.length == 1)
    assert(flagged.head.getAs[java.sql.Timestamp]("timestamp") ==
      docs.agg(max("timestamp")).collect().head.getTimestamp(0))
    val t = Integrate.trendsLong(docs, cutoff)
    assert(t.schema.fieldNames.toSet ==
      Set("hour", "symbol", "trend_score"))
  }

  test("serve: lastChange/latestVolumes/volatility/causality panels") {
    val lc = Serve.lastChange(integrated)
    assert(lc.count() == 4 && lc.filter(col("pct_change").isNull).count() == 0)
    val lv = Serve.latestVolumes(integrated).collect()
    assert(lv.length == 4)
    assert(lv.map(_.getDouble(1)).sliding(2).forall(p => p(0) >= p(1))) // desc
    val vs = Serve.volatilityStability(integrated)
    assert(vs.count() == 4 &&
      vs.filter(!col("stability").isin("Stable", "Volatile")).count() == 0)
    import spark.implicits._
    val causality = Seq(("GDP", 1, 0.001), ("GDP", 2, 0.05), ("UNRATE", 1, 0.0))
      .toDF("predictor", "lag", "p_value")
    val cs = Serve.causalitySummary(causality).collect()
    assert(cs.head.getString(0) == "UNRATE") // p=0 → 1e-10 guard → top
    val hist = Serve.returnsHistogram(integrated, "AAPL")
    assert(hist.agg(sum("n")).head().getLong(0) ==
      integrated.filter(col("symbol") === "AAPL" && col("ret_1h").isNotNull).count())
  }

  test("integrate plans broadcast the macro dim and avoid cartesian joins") {
    val plan = integrated.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "fred dim should broadcast")
    assert(!plan.contains("CartesianProduct"), "no cartesian join in the pipeline")
  }

  test("per-symbol partitioned sink prunes by symbol directory") {
    val dir = java.nio.file.Files.createTempDirectory("graft_int").toString
    Integrate.writePartitioned(integrated, dir)
    assert(new java.io.File(s"$dir/symbol=AAPL").exists())
    val back = spark.read.parquet(dir)
    assert(back.count() == integrated.count())
  }
}
