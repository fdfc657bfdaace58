package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression,
  GenericInternalRow, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType,
  StructField, StructType}

/** Native O(n) sequential scans for the pack-sort-fold recurrence family
  * (GARCH variance, Holt linear smoothing, the 1-D Kalman level, Heikin-Ashi
  * open). The SQL-HOF formulation — `aggregate(seq, acc, concat(acc.arr,
  * array(step)))` — copies the accumulator ARRAY on every step, so an
  * n-element series does Θ(n²) element copies inside one task: fine for
  * time-bucketed bars, a scale-killer on a 1M-row series (~5·10¹¹ copies).
  * These expressions run the identical recurrence in one mutable-buffer
  * loop: O(n), allocation-free per step.
  *
  * Bit-compatibility is the contract: each step evaluates the SAME IEEE
  * operations in the SAME order as the SQL fold it replaces (Java `a + b *
  * c` parses exactly like the SQL expression text — left-to-right adds,
  * multiplications first), and the fixed parameters are embedded as the
  * same Scala doubles the folds interpolated into their SQL, so every
  * oracle that replays the fold cross-engine keeps matching hash-for-hash
  * (IndicatorsSpec pins this per operator).
  *
  * Codegen: the double-array scans emit a fused loop via doGenCode
  * (UnsafeArrayData.fromPrimitiveArray — no boxing); the struct-emitting
  * Holt scan uses CodegenFallback — it is invoked once per PACKED series
  * row, so the interpreted-call overhead is amortized over the O(n) loop
  * and whole-stage codegen still fuses everything around it.
  *
  * The per-key series still packs into one task (the time-series contract
  * shared with [[graft.analytics.Indicators.cusumSeries]]); what these
  * scans remove is the quadratic blow-up WITHIN that task, which was the
  * binding constraint (a 1M-bar key is ~8 MB of array — fine to hold,
  * fatal to re-copy 10⁶ times).
  */
object SeriesScan {
  /** Literal parameter → double, tolerant of how Spark typed the literal
    * (a `0.1` SQL literal parses as DECIMAL; `CAST('0.1' AS DOUBLE)` and
    * scientific notation parse as DOUBLE — all exact for round-trip
    * Scala-double strings). */
  private def litD(e: Expression): Double = e.eval(InternalRow.empty) match {
    case d: Double => d
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case f: Float => f.toDouble
    case n: Number => n.doubleValue()
    case other => other.toString.toDouble
  }

  /** Register the four scan functions. Idempotent. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_garch_scan",
      es => GarchScan(es.head, litD(es(1)), litD(es(2)), litD(es(3))),
      "scala_udf")
    reg.createOrReplaceTempFunction("graft_kalman_scan",
      es => KalmanScan(es.head, litD(es(1)), litD(es(2))), "scala_udf")
    reg.createOrReplaceTempFunction("graft_holt_scan",
      es => HoltScan(es.head, litD(es(1)), litD(es(2))), "scala_udf")
    reg.createOrReplaceTempFunction("graft_heikin_scan",
      es => HeikinScan(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_ema_scan",
      es => EmaScan(es.head, litD(es(1)), litD(es(2))), "scala_udf")
    reg.createOrReplaceTempFunction("graft_adx_scan",
      es => AdxScan(es.head, litD(es(1)), litD(es(2))), "scala_udf")
    reg.createOrReplaceTempFunction("graft_cusum_scan",
      es => CusumScan(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_hw_scan",
      es => HwScan(es.head, litD(es(1)).toInt, litD(es(2)), litD(es(3)),
        litD(es(4))), "scala_udf")
  }
}

/** EMA recursion over an ARRAY<DOUBLE>: out₁ = x₁, outₜ = b·outₜ₋₁ + a·xₜ
  * — the [[graft.analytics.Indicators.emaSeries]]/MACD/ADX-smoothing fold
  * (a = span smoothing, b = 1−a, both precomputed Scala doubles as the
  * folds interpolated them). */
case class EmaScan(child: Expression, a: Double, b: Double)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_ema_scan"

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val out = new Array[Double](n)
    if (n > 0) {
      out(0) = xs.getDouble(0)
      var i = 1
      while (i < n) {
        out(i) = b * out(i - 1) + a * xs.getDouble(i)
        i += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      s"""
         |int $n = $x.numElements();
         |double[] $out = new double[$n];
         |if ($n > 0) {
         |  $out[0] = $x.getDouble(0);
         |  for (int $i = 1; $i < $n; $i++)
         |    $out[$i] = $b * $out[$i - 1] + $a * $x.getDouble($i);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ADX's NULL-holding EMA over an ARRAY<DOUBLE> with nullable elements
  * (the DX series — NULL on flat bars): out₁ = x₁ (NULL passes through),
  * running state seeds at coalesce(x₁, 0); outₜ = b·last + a·coalesce(xₜ,
  * last) — a NULL DX holds the smoothing, exactly the fold
  * [[graft.analytics.Indicators.adx]] ran. */
case class AdxScan(child: Expression, a: Double, b: Double)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "graft_adx_scan"

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n)
    out(0) = if (xs.isNullAt(0)) null else xs.getDouble(0)
    var last = if (xs.isNullAt(0)) 0.0 else xs.getDouble(0)
    var i = 1
    while (i < n) {
      val x = if (xs.isNullAt(i)) last else xs.getDouble(i)
      last = b * last + a * x
      out(i) = last
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Page's two-sided CUSUM over an ARRAY<DOUBLE> around mean `mu` →
  * ARRAY<STRUCT<u, d>>: uₜ = max(0, uₜ₋₁ + (xₜ − μ)), dₜ = min(0, dₜ₋₁ +
  * (xₜ − μ)), seeded at 0 — the [[graft.analytics.Indicators.cusumSeries]]
  * fold (max(0,·) is not linear, so unlike EMA there is no chunk-stitch
  * rescue; this scan at least makes the single-task pass linear). */
case class CusumScan(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("u", DoubleType), StructField("d", DoubleType))),
    containsNull = false)
  override def prettyName: String = "graft_cusum_scan"

  override def nullSafeEval(xsIn: Any, muIn: Any): Any = {
    val xs = xsIn.asInstanceOf[ArrayData]
    val mu = muIn.asInstanceOf[Double]
    val n = xs.numElements()
    val out = new Array[Any](n)
    var u = 0.0; var d = 0.0
    var i = 0
    while (i < n) {
      val x = xs.getDouble(i)
      u = math.max(0.0, u + (x - mu))
      d = math.min(0.0, d + (x - mu))
      out(i) = new GenericInternalRow(Array[Any](u, d))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** σ²ₜ over an ARRAY<DOUBLE> of returns: σ²₁ = ω/(1−α−β), σ²ᵢ = ω + α·r²ᵢ₋₁
  * + β·σ²ᵢ₋₁ — the [[graft.analytics.Indicators.garch]] filter recurrence.
  * r² via plain multiplication (never pow — libm parity). */
case class GarchScan(child: Expression, omega: Double, alpha: Double,
                     beta: Double) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_garch_scan"
  private val s21 = omega / (1.0 - alpha - beta)

  override def nullSafeEval(input: Any): Any = {
    val rs = input.asInstanceOf[ArrayData]
    val n = rs.numElements()
    val out = new Array[Double](n)
    if (n > 0) {
      out(0) = s21
      var i = 1
      while (i < n) {
        val r = rs.getDouble(i - 1)
        out(i) = omega + alpha * r * r + beta * out(i - 1)
        i += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val i = ctx.freshName("i"); val r = ctx.freshName("r")
      s"""
         |int $n = $a.numElements();
         |double[] $out = new double[$n];
         |if ($n > 0) {
         |  $out[0] = $s21;
         |  for (int $i = 1; $i < $n; $i++) {
         |    double $r = $a.getDouble($i - 1);
         |    $out[$i] = $omega + $alpha * $r * $r + $beta * $out[$i - 1];
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Local-level Kalman filter over an ARRAY<DOUBLE> series: level₁ = x₁,
  * P₁ = r; for t ≥ 2 with P⁻ = P + q, k = P⁻/(P⁻ + r): level ← level +
  * k(xₜ − level), P ← (1−k)·P⁻ — the [[graft.analytics.Indicators
  * .kalmanLevel]] recurrence. */
case class KalmanScan(child: Expression, qVar: Double, rVar: Double)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_kalman_scan"

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val out = new Array[Double](n)
    if (n > 0) {
      var lv = xs.getDouble(0)
      var p = rVar
      out(0) = lv
      var i = 1
      while (i < n) {
        val pp = p + qVar
        val k = pp / (pp + rVar)
        lv = lv + k * (xs.getDouble(i) - lv)
        out(i) = lv
        p = (1.0 - k) * pp
        i += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val i = ctx.freshName("i"); val lv = ctx.freshName("lv")
      val p = ctx.freshName("p"); val pp = ctx.freshName("pp")
      val k = ctx.freshName("k")
      s"""
         |int $n = $a.numElements();
         |double[] $out = new double[$n];
         |if ($n > 0) {
         |  double $lv = $a.getDouble(0);
         |  double $p = $rVar;
         |  $out[0] = $lv;
         |  for (int $i = 1; $i < $n; $i++) {
         |    double $pp = $p + $qVar;
         |    double $k = $pp / ($pp + $rVar);
         |    $lv = $lv + $k * ($a.getDouble($i) - $lv);
         |    $out[$i] = $lv;
         |    $p = (1.0 - $k) * $pp;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Holt linear smoothing over an ARRAY<DOUBLE> series → ARRAY<STRUCT<l, b,
  * f>>: l₁ = x₁, b₁ = x₂−x₁, f = lₜ₋₁+bₜ₋₁ (one-step-ahead, = x₁ at t=1);
  * lₜ = α·xₜ + (1−α)(lₜ₋₁+bₜ₋₁), bₜ = β(lₜ−lₜ₋₁) + (1−β)bₜ₋₁ — the
  * [[graft.analytics.Indicators.holtLinear]] recurrence. Series with fewer
  * than 2 points have no trend seed → NULL (callers filter them). */
case class HoltScan(child: Expression, alpha: Double, beta: Double)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("l", DoubleType), StructField("b", DoubleType),
    StructField("f", DoubleType))), containsNull = false)
  override def prettyName: String = "graft_holt_scan"
  // the folds interpolated `1 - alpha` (a Scala double) into their SQL —
  // same constant here, so every step multiplies the identical value
  private val oneMA = 1 - alpha
  private val oneMB = 1 - beta

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n < 2) return null
    val out = new Array[Any](n)
    var l = xs.getDouble(0)
    var b = xs.getDouble(1) - xs.getDouble(0)
    out(0) = new GenericInternalRow(Array[Any](l, b, xs.getDouble(0)))
    var i = 1
    while (i < n) {
      val f = l + b
      val lNew = alpha * xs.getDouble(i) + oneMA * (l + b)
      val bNew = beta * (lNew - l) + oneMB * b
      out(i) = new GenericInternalRow(Array[Any](lNew, bNew, f))
      l = lNew; b = bNew
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Holt–Winters ADDITIVE triple smoothing over an ARRAY<DOUBLE> series
  * (Winters 1960; Hyndman & Athanasopoulos §8.3 component form), period
  * `m` — ARRAY<STRUCT<l, b, s, f>> for t = m+1..n (length n−m):
  *
  *   f_t = ℓ_{t−1} + b_{t−1} + s_{t−m}            (one-step forecast)
  *   ℓ_t = α(x_t − s_{t−m}) + (1−α)(ℓ_{t−1} + b_{t−1})
  *   b_t = β(ℓ_t − ℓ_{t−1}) + (1−β)·b_{t−1}
  *   s_t = γ(x_t − ℓ_{t−1} − b_{t−1}) + (1−γ)·s_{t−m}
  *
  * Deterministic data seeds (no optimizer): ℓ_m = mean(x_1..x_m), b_m =
  * (mean(x_{m+1}..x_{2m}) − mean(x_1..x_m))/m, s_i = x_i − ℓ_m for i ≤ m;
  * series shorter than 2m have no trend seed → NULL (callers filter).
  * The seed means run over DECIMAL(28,10)-quantized terms (exact,
  * associative — the cross-row-sum house rule), so the DuckDB replay's
  * `sum(CAST(x AS DECIMAL(28,10)))` reproduces them bit-for-bit; every
  * recurrence step is pinned left-to-right double IEEE, identical to the
  * oracle's recursive-CTE expression text. The m seasonal states live in
  * a ring buffer — O(n + m) time, O(m) extra space, vs the Θ(n²) copies
  * an `aggregate`-fold formulation would do. CodegenFallback (struct
  * output, one interpreted call per PACKED series — the HoltScan
  * contract). */
case class HwScan(child: Expression, m: Int, alpha: Double, beta: Double,
                  gamma: Double) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("l", DoubleType), StructField("b", DoubleType),
    StructField("s", DoubleType), StructField("f", DoubleType))),
    containsNull = false)
  override def prettyName: String = "graft_hw_scan"
  private val oneMA = 1 - alpha
  private val oneMB = 1 - beta
  private val oneMG = 1 - gamma

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (m < 2 || n < 2 * m) return null
    import java.math.{BigDecimal => JBD, RoundingMode}
    def dec(x: Double) = new JBD(x).setScale(10, RoundingMode.HALF_UP)
    var s1 = JBD.ZERO; var s2 = JBD.ZERO
    var i = 0
    while (i < m) { s1 = s1.add(dec(xs.getDouble(i))); i += 1 }
    while (i < 2 * m) { s2 = s2.add(dec(xs.getDouble(i))); i += 1 }
    val l0 = s1.doubleValue() / m
    val b0 = (s2.doubleValue() / m - l0) / m
    val ring = new Array[Double](m) // ring(t % m) holds s_{t−m} at step t
    i = 0
    while (i < m) { ring(i) = xs.getDouble(i) - l0; i += 1 }
    val out = new Array[Any](n - m)
    var l = l0; var b = b0
    var t = m
    while (t < n) {
      val x = xs.getDouble(t)
      val sm = ring(t % m)
      val f = l + b + sm
      val lN = alpha * (x - sm) + oneMA * (l + b)
      val bN = beta * (lN - l) + oneMB * b
      val sN = gamma * (x - l - b) + oneMG * sm
      out(t - m) = new GenericInternalRow(Array[Any](lN, bN, sN, f))
      ring(t % m) = sN
      l = lN; b = bN
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Heikin-Ashi open over an ARRAY<DOUBLE> of ha-closes: ho₁ = `init`
  * ((o₁+c₁)/2, computed by the caller from the first bar), hoᵢ =
  * (hoᵢ₋₁ + hcᵢ₋₁)/2 — the [[graft.analytics.Indicators.heikinAshi]]
  * recurrence (all dyadic, bit-exact in any IEEE engine). */
case class HeikinScan(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_heikin_scan"

  override def nullSafeEval(hcIn: Any, initIn: Any): Any = {
    val hc = hcIn.asInstanceOf[ArrayData]
    val n = hc.numElements()
    val out = new Array[Double](n)
    if (n > 0) {
      out(0) = initIn.asInstanceOf[Double]
      var i = 1
      while (i < n) {
        out(i) = (out(i - 1) + hc.getDouble(i - 1)) / 2.0
        i += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |double[] $out = new double[$n];
         |if ($n > 0) {
         |  $out[0] = $b;
         |  for (int $i = 1; $i < $n; $i++)
         |    $out[$i] = ($out[$i - 1] + $a.getDouble($i - 1)) / 2.0;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
