package graft.analytics

import org.apache.commons.math3.special.Gamma
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** C1 — Granger causality (reference: analysis_part/main.py:58-78, which
  * calls statsmodels `grangercausalitytests` and reads the `ssr_ftest`
  * p-value per lag 1..maxLag).
  *
  * Semantics reproduced exactly:
  *  - per (symbol, predictor): take rows where target and predictor are both
  *    present (pandas dropna on the pair), ordered by time; lags are
  *    POSITIONAL over that sequence (statsmodels lags the array, not the
  *    clock).
  *  - for each lag L: restricted OLS y ~ [1, y_lag1..L]; unrestricted adds
  *    [x_lag1..L]; F = ((rss_r − rss_u)/L) / (rss_u/(n − 2L − 1)); p-value
  *    = I_x(d2/2, d1/2) at x = d2/(d2 + d1·F) — the regularized incomplete
  *    beta evaluated by the classic continued fraction (Numerical Recipes
  *    betacf / cephes incbet scheme; GrangerSpec pins it against
  *    commons-math3's FDistribution to < 1e-10 across a parameter grid),
  *    rounded to 5 (analysis_part/main.py:68). Evaluating the CDF with an
  *    explicit, engine-portable algorithm (instead of calling a library)
  *    is what lets the q42 DuckDB oracle replay the IDENTICAL arithmetic
  *    via a recursive CTE and hash-check the p-values themselves.
  *
  * Scale design: the data never reaches the driver. One window pass builds
  * positional lags; one hash aggregate per (symbol) accumulates the Gram
  * moments Σ z_i·z_j (fixed-width state, map-side combined, quantized to
  * DECIMAL(38,12) per product so the sums are partition-order-independent
  * AND cross-engine exact). Only those O(k²) sums are collected; the tiny
  * OLS solves and CDF evaluations run on the driver. This is the
  * Aggregator-style design SURVEY.md §7.3 calls for — expressed with
  * built-in aggregates, so it stays in whole-stage codegen.
  */
object Granger {

  /** p-values for target ~ one predictor, all symbols, lags 1..maxLag.
    * Output: (symbol, predictor, lag, p_value, f_stat, n_obs). */
  def test(df: DataFrame, symbol: String, ts: String, target: String,
           predictor: String, maxLag: Int = 5): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    // positional sequence after pairwise dropna (statsmodels semantics)
    val base = df.select(col(symbol).as("sym"), col(ts).as("t"),
        col(target).cast("double").as("y"), col(predictor).cast("double").as("x"))
      .na.drop(Seq("y", "x"))
    val w = Window.partitionBy("sym").orderBy("t")
    val lagged = (1 to maxLag).foldLeft(base) { (d, i) =>
      d.withColumn(s"yl$i", lag(col("y"), i).over(w))
        .withColumn(s"xl$i", lag(col("x"), i).over(w))
    }

    // Gram moments. The lag-l validity sets are NESTED (positional lags:
    // row p of a series has lags 1..p−1 — valid_l = positions ≥ l+1), so
    // only the MAX-lag Gram is aggregated distributed (79 decimal sums at
    // maxLag = 5, not 205 across all lags), and each lower order derives
    // on the driver as G_l = G_maxLag + the ≤ maxLag−1 BOUNDARY rows per
    // series (positions l+1..maxLag) — each product quantized with the
    // IDENTICAL double→DECIMAL(38,12) rounding Spark's cast applies, and
    // decimal addition is associative, so G_l is bit-for-bit what the
    // per-lag aggregate produced (the q42/q42c oracles are unchanged).
    // This matters because the double→decimal cast is expensive (a
    // string-format round-trip per product per row): dropping 2.6× of the
    // casts took q42c from 3.8 s back under 2 s at sf0.1.
    def vars(l: Int): Seq[(String, Column)] =
      ("y" -> col("y")) +: ("one" -> lit(1.0)) +:
        ((1 to l).map(i => s"yl$i" -> col(s"yl$i")) ++
          (1 to l).map(i => s"xl$i" -> col(s"xl$i")))
    val vsMax = vars(maxLag)
    val namesMax = vsMax.map(_._1)
    val valid = col(s"yl$maxLag").isNotNull && col(s"xl$maxLag").isNotNull
    val aggs: Seq[Column] =
      count(when(valid, 1)).as(s"n_$maxLag") +:
        (for (i <- vsMax.indices; j <- vsMax.indices if j >= i) yield {
          val (ni, ci) = vsMax(i); val (nj, cj) = vsMax(j)
          sum(when(valid, (ci * cj).cast("decimal(38,12)")))
            .as(s"g_${ni}_$nj")
        })
    val withPos = lagged.withColumn("_pos", row_number().over(w))
    val grams = withPos.groupBy(col("sym")).agg(aggs.head, aggs.tail: _*)
      .collect()
    // boundary rows: ≤ maxLag−1 per series — a bounded collect (the same
    // contract as the Gram sums themselves)
    val boundary: Map[String, Array[org.apache.spark.sql.Row]] =
      if (maxLag == 1) Map.empty
      else withPos.filter(col("_pos") >= 2 && col("_pos") <= maxLag)
        .select(col("sym") +: col("_pos") +: col("y") +:
          ((1 until maxLag).map(i => col(s"yl$i")) ++
            (1 until maxLag).map(i => col(s"xl$i"))): _*)
        .collect().groupBy(_.getString(0))
    // Spark's Cast(double → decimal(38,12)): shortest-repr BigDecimal of
    // the double, then setScale(12, HALF_UP) — replicated exactly
    def quant12(v: Double): java.math.BigDecimal =
      new java.math.BigDecimal(java.lang.Double.toString(v))
        .setScale(12, java.math.RoundingMode.HALF_UP)

    val results = grams.flatMap { row =>
      val sym = row.getString(0)
      val nMax = row.getLong(row.fieldIndex(s"n_$maxLag"))
      def aggDec(a: String, b: String): java.math.BigDecimal = {
        val idx = row.fieldIndex(
          if (namesMax.indexOf(a) <= namesMax.indexOf(b)) s"g_${a}_$b"
          else s"g_${b}_$a")
        if (row.isNullAt(idx)) java.math.BigDecimal.ZERO else row.getDecimal(idx)
      }
      val brows = boundary.getOrElse(sym, Array.empty)
      def zval(r: org.apache.spark.sql.Row, name: String): Double =
        if (name == "one") 1.0 else r.getDouble(r.fieldIndex(name))
      (1 to maxLag).flatMap { l =>
        val rowsL =
          if (l == maxLag) Array.empty[org.apache.spark.sql.Row]
          else brows.filter(r => r.getInt(r.fieldIndex("_pos")) >= l + 1)
        val n = nMax + rowsL.length
        val names = vars(l).map(_._1)
        def g(a: String, b: String): Double = {
          var acc = aggDec(a, b)
          rowsL.foreach { r =>
            acc = acc.add(quant12(zval(r, a) * zval(r, b)))
          }
          acc.doubleValue()
        }
        val kU = 2 * l + 1
        if (n < kU + 1) Seq((sym, predictor, l, Double.NaN, Double.NaN, n)) // too few obs
        else {
          val restricted = names.drop(1).take(l + 1)            // one + ylags
          val unrestricted = names.drop(1)                      // + xlags
          val rssR = rss(restricted, g)
          val rssU = rss(unrestricted, g)
          val f = ((rssR - rssU) / l) / (rssU / (n - kU))
          val p =
            if (f.isNaN || f < 0) Double.NaN
            else pFromF(f, l.toDouble, (n - kU).toDouble)
          // round(5) per the reference; NaN p (degenerate/constant predictor
          // → singular OLS) passes through un-rounded
          val p5 = if (p.isNaN) p
            else BigDecimal(p).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
          Seq((sym, predictor, l, p5, f, n))
        }
      }
    }
    results.toSeq.toDF("symbol", "predictor", "lag", "p_value", "f_stat", "n_obs")
  }

  /** All predictors (reference sweeps every numeric column,
    * analysis_part/main.py:159-161). The projected base is persisted so the
    * per-predictor passes (each needs its own pairwise-dropna sequence, so
    * they can't share one window) re-read cached columns instead of
    * re-scanning the source — at 100 TB the scan would otherwise dominate
    * ×|predictors|. */
  def sweep(df: DataFrame, symbol: String, ts: String, target: String,
            predictors: Seq[String], maxLag: Int = 5): DataFrame = {
    val base = df.select((Seq(symbol, ts, target) ++ predictors).distinct.map(col): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // per-predictor passes are INDEPENDENT actions over the same cached
    // base (each collects its own Gram row + boundary rows and finishes
    // with driver-local math) — overlap them on the shared pool
    // (guide §2.6); Par.map preserves input order, so the union is the
    // same frame the sequential map produced
    try graft.ops.Par.map(predictors)(p =>
        test(base, symbol, ts, target, p, maxLag))
      .reduce(_.unionByName(_))
    finally base.unpersist(blocking = false)
  }

  /** rss of y ~ X from Gram moments: y'y − β'X'y with β from the normal
    * equations (Gaussian elimination with partial pivoting; k ≤ 11). */
  private def rss(xs: Seq[String], g: (String, String) => Double): Double = {
    val k = xs.length
    val a = Array.tabulate(k, k)((i, j) => g(xs(i), xs(j)))
    val b = Array.tabulate(k)(i => g(xs(i), "y"))
    val beta = solve(a, b)
    val xty = Array.tabulate(k)(i => g(xs(i), "y"))
    g("y", "y") - beta.zip(xty).map { case (x, y) => x * y }.sum
  }

  /** Rank-aware elimination: a pivot below `tol` (relative to the largest
    * Gram entry) marks a linearly dependent column — its coefficient is
    * pinned to 0 instead of dividing by rounding noise, matching the
    * pinv-backed OLS the reference's statsmodels uses. Without this, a
    * constant predictor (singular normal equations) yields a garbage β and a
    * fabricated F statistic; with it, rss_unrestricted = rss_restricted and
    * F ≈ 0 → p ≈ 1 / NaN, the honest "no information" answer. */
  private def solve(a0: Array[Array[Double]], b0: Array[Double]): Array[Double] = {
    val k = b0.length
    val a = a0.map(_.clone()); val b = b0.clone()
    val scale = a0.iterator.flatten.map(math.abs).foldLeft(1e-300)(math.max)
    val tol = scale * 1e-10
    for (col <- 0 until k) {
      val piv = (col until k).maxBy(r => math.abs(a(r)(col)))
      val tmpA = a(col); a(col) = a(piv); a(piv) = tmpA
      val tmpB = b(col); b(col) = b(piv); b(piv) = tmpB
      val d = a(col)(col)
      if (math.abs(d) > tol) {
        for (r <- col + 1 until k) {
          val f = a(r)(col) / d
          for (c <- col until k) a(r)(c) -= f * a(col)(c)
          b(r) -= f * b(col)
        }
      } else a(col)(col) = 0.0 // dependent column: β pinned to 0 below
    }
    val x = new Array[Double](k)
    for (r <- k - 1 to 0 by -1) {
      var s = b(r)
      for (c <- r + 1 until k) s -= a(r)(c) * x(c)
      x(r) = if (math.abs(a(r)(r)) <= tol) 0.0 else s / a(r)(r)
    }
    x
  }

  /** F-test upper tail: P(F > f) = I_x(d2/2, d1/2) at x = d2/(d2+d1·f). */
  private[graft] def pFromF(f: Double, d1: Double, d2: Double): Double =
    regIncBeta(d2 / (d2 + d1 * f), d2 / 2.0, d1 / 2.0)

  /** Regularized incomplete beta I_x(a, b) by the classic continued
    * fraction (Numerical Recipes `betai`/`betacf`, the cephes `incbet`
    * scheme): I_x = x^a (1−x)^b / (a·B(a,b)) · cf(x, a, b), mirrored to
    * the symmetric form when x past the crossover (a+1)/(a+b+2). The
    * arithmetic is written STEP-FOR-STEP the way the q42 oracle's
    * recursive CTE replays it, so both engines converge to the same
    * value to ~1e-14; GrangerSpec pins it against commons-math3's
    * FDistribution on a grid. Log-gamma is the one library call
    * (commons-math3 vs DuckDB lgamma — both accurate to ulps, washed out
    * by the round(5)). */
  private[graft] def regIncBeta(x: Double, a: Double, b: Double): Double = {
    if (x <= 0.0) 0.0
    else if (x >= 1.0) 1.0
    else {
      val swap = !(x < (a + 1.0) / (a + b + 2.0))
      val (xx, aa, bb) = if (swap) (1.0 - x, b, a) else (x, a, b)
      val lnB = Gamma.logGamma(aa) + Gamma.logGamma(bb) -
        Gamma.logGamma(aa + bb)
      val front = math.exp(aa * math.log(xx) + bb * math.log1p(-xx) - lnB)
      val res = front * betacf(xx, aa, bb) / aa
      if (swap) 1.0 - res else res
    }
  }

  /** Lentz-style continued fraction for [[regIncBeta]] — two rank-1 term
    * updates per iteration, stop at |δ − 1| < 3e-16 (≤ 300 iterations;
    * convergence is a few dozen for the F-test's parameter ranges). The
    * FPMIN floors guard degenerate cancellation only — for x in (0,
    * crossover) they never fire, so the SQL replay (which omits them)
    * computes the identical sequence. */
  private def betacf(x: Double, a: Double, b: Double): Double = {
    val MaxIt = 300; val Eps = 3e-16; val FpMin = 1e-300
    val qab = a + b; val qap = a + 1.0; val qam = a - 1.0
    var c = 1.0
    var d = 1.0 - qab * x / qap
    if (math.abs(d) < FpMin) d = FpMin
    d = 1.0 / d
    var h = d
    var m = 1
    var done = false
    while (m <= MaxIt && !done) {
      val m2 = 2 * m
      val aa1 = m * (b - m) * x / ((qam + m2) * (a + m2))
      d = 1.0 + aa1 * d; if (math.abs(d) < FpMin) d = FpMin
      c = 1.0 + aa1 / c; if (math.abs(c) < FpMin) c = FpMin
      d = 1.0 / d
      h *= d * c
      val aa2 = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
      d = 1.0 + aa2 * d; if (math.abs(d) < FpMin) d = FpMin
      c = 1.0 + aa2 / c; if (math.abs(c) < FpMin) c = FpMin
      d = 1.0 / d
      val del = d * c
      h *= del
      if (math.abs(del - 1.0) < Eps) done = true
      m += 1
    }
    h
  }
}
