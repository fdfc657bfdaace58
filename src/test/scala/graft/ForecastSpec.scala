package graft

import graft.analytics.Forecast

/** C2/C3/C4: determinism under fixed seed + RMSE sanity bound
  * (GBT ≠ XGBoost numerically — SURVEY.md §5.3/§7.4 #7). */
class ForecastSpec extends SparkSpec {
  import spark.implicits._

  // predictable series: AR-ish sine with mild noise
  private lazy val series = {
    val rnd = new scala.util.Random(42)
    (0 until 300).map(t => (t, math.sin(t * 0.2) * 10 + 50 + rnd.nextGaussian() * 0.1))
      .toDF("t", "c")
  }

  test("forecast is deterministic under a fixed seed") {
    val r1 = Forecast.forecastSymbol(series, "t", "c", nLags = 12, horizon = 24, maxIter = 20)
    val r2 = Forecast.forecastSymbol(series, "t", "c", nLags = 12, horizon = 24, maxIter = 20)
    assert(r1.rmse == r2.rmse)
    val f1 = r1.forecast.orderBy("step").collect().map(_.getDouble(1))
    val f2 = r2.forecast.orderBy("step").collect().map(_.getDouble(1))
    assert(f1.sameElements(f2))
    assert(f1.length == 24)
  }

  test("model beats the trivial mean predictor on the holdout") {
    val r = Forecast.forecastSymbol(series, "t", "c", nLags = 12, horizon = 12, maxIter = 20)
    // series stddev ≈ 7; a lag-informed model must do much better
    assert(r.rmse < 3.0, s"rmse=${r.rmse}")
    // recursive forecast stays within the series envelope
    val fs = r.forecast.orderBy("step").collect().map(_.getDouble(1))
    assert(fs.forall(v => v > 30 && v < 70))
  }

  test("model artifact round-trips through save/load") {
    val r = Forecast.forecastSymbol(series, "t", "c", nLags = 6, horizon = 4, maxIter = 5)
    val dir = java.nio.file.Files.createTempDirectory("graft_model").toString + "/m"
    Forecast.save(r.model, dir)
    val back = org.apache.spark.ml.regression.GBTRegressionModel.load(dir)
    assert(back.getMaxDepth == 6 && back.getNumTrees == 5)
  }
}
