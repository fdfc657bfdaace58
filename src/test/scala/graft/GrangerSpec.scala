package graft

import graft.analytics.Granger
import org.apache.spark.sql.functions._

/** C1 validation: F statistics golden-checked against a NumPy OLS
  * implementation of the same ssr_ftest formula (SURVEY.md §7.4 #5), plus
  * behavioral discrimination on causal vs independent series. */
class GrangerSpec extends SparkSpec {
  import spark.implicits._

  // deterministic series mirrored in the golden generator:
  //   x_t = round(sin(0.7 t)·10 + (t mod 5), 6)
  //   y_t = round(0.8·x_{t-1} + 0.1·y_{t-1} + ((37 t mod 11) − 5)·0.05, 6)
  private val n = 80
  private val xs = (0 until n).map(t =>
    BigDecimal(math.sin(t * 0.7) * 10 + (t % 5)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  private val ys = {
    val a = Array.fill(n)(0.0)
    for (t <- 1 until n)
      a(t) = BigDecimal(0.8 * xs(t - 1) + 0.1 * a(t - 1) + ((t * 37) % 11 - 5) * 0.05)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    a.toSeq
  }
  private lazy val df = (0 until n).map(t => ("S", t, ys(t), xs(t)))
    .toDF("symbol", "t", "y", "x")

  test("F statistics match the NumPy golden values") {
    val res = Granger.test(df, "symbol", "t", "y", "x", maxLag = 5)
      .orderBy("lag").collect()
    val golden = Map(1 -> 54437.3226, 2 -> 6807.0853, 3 -> 3621.5289,
      4 -> 2444.1914, 5 -> 2043.9146)
    res.foreach { r =>
      val lag = r.getInt(2); val f = r.getDouble(4)
      assert(math.abs(f - golden(lag)) / golden(lag) < 1e-4,
        s"lag $lag: f=$f golden=${golden(lag)}")
      assert(r.getDouble(3) <= 1e-5) // overwhelming causality → p ~ 0
      assert(r.getLong(5) == n - lag)
    }
  }

  test("independent white noise is not flagged as causal") {
    val rnd = new scala.util.Random(7)
    val noise = (0 until 200).map(t => ("S", t, rnd.nextGaussian(), rnd.nextGaussian()))
      .toDF("symbol", "t", "y", "x")
    val ps = Granger.test(noise, "symbol", "t", "y", "x", maxLag = 3)
      .select("p_value").collect().map(_.getDouble(0))
    assert(ps.forall(_ > 0.01), s"independent series flagged causal: ${ps.mkString(",")}")
  }

  test("degenerate predictors: constant x never flags causality; zero-variance pins NaN") {
    // constant predictor: the unrestricted design is singular (x lags are
    // collinear with the intercept), exact-arithmetic F = 0. statsmodels'
    // pinv-backed OLS reports p ≈ 1; this engine emits p = 1 or NaN (float
    // cancellation can land f just below 0, taking the NaN guard) — in
    // either case, never a causality claim.
    val constX = (0 until 60).map(t => ("S", t, ys(t % n), 3.0))
      .toDF("symbol", "t", "y", "x")
    val px = Granger.test(constX, "symbol", "t", "y", "x", maxLag = 3)
      .select("p_value", "f_stat").collect()
    assert(px.nonEmpty && px.forall(r =>
      r.getDouble(0).isNaN || r.getDouble(0) > 0.99))
    // zero-variance target AND predictor: the restricted fit is already
    // perfect (rss_r = rss_u = 0), F = 0/0 — the NaN p-value path
    // (Granger.scala:83-88) must fire rather than fabricating a number
    val constBoth = (0 until 40).map(t => ("S", t, 2.0, 3.0))
      .toDF("symbol", "t", "y", "x")
    val pb = Granger.test(constBoth, "symbol", "t", "y", "x", maxLag = 2)
      .select("p_value").collect().map(_.getDouble(0))
    assert(pb.length == 2 && pb.forall(_.isNaN))
  }

  test("regIncBeta continued fraction matches commons-math FDistribution " +
       "to 1e-10 across the F-test parameter grid") {
    import org.apache.commons.math3.distribution.FDistribution
    for {
      d1 <- Seq(1.0, 2.0, 3.0, 4.0, 5.0)
      d2 <- Seq(5.0, 11.0, 41.0, 71.0, 500.0, 5000.0)
      f  <- Seq(0.001, 0.05, 0.3, 0.7, 1.0, 1.5, 2.37, 5.0, 20.0, 100.0)
    } {
      val want = 1.0 - new FDistribution(d1, d2).cumulativeProbability(f)
      val got = Granger.pFromF(f, d1, d2)
      assert(math.abs(got - want) < 1e-10,
        s"p(F=$f; $d1, $d2): cf $got vs commons-math $want")
    }
    // closed-interval edges
    assert(Granger.pFromF(0.0, 2, 40) == 1.0)
    assert(Granger.regIncBeta(0.0, 3, 4) == 0.0 &&
      Granger.regIncBeta(1.0, 3, 4) == 1.0)
  }

  test("sweep runs per predictor and rounds p to 5 decimals") {
    val res = Granger.sweep(df.withColumn("z", col("x") * 2), "symbol", "t", "y",
      Seq("x", "z"), maxLag = 2)
    assert(res.count() == 4)
    val ps = res.select("p_value").collect().map(_.getDouble(0))
    assert(ps.forall(p => (BigDecimal(p) * 100000).isWhole))
  }
}
