package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** A8 / C6 — pairwise-complete Pearson correlation matrix in long form
  * (col_x, col_y, corr), matching pandas `df.corr()` null semantics
  * (reference: analysis_part/main.py:51-55).
  *
  * Implementation: ONE full-table pass accumulating, per pair, the Gram sums
  * (n, Σx, Σy, Σxy, Σx², Σy²) restricted to rows where both are non-null
  * (pairwise-complete-observations — what pandas does, and what a naive
  * VectorAssembler + ml.stat.Correlation would get wrong under nulls).
  * Sums are DECIMAL(38,6) so they are exact and therefore independent of
  * partition count / merge order: the same query returns bit-identical
  * correlations on 1 core or 1000 executors. The final scalar formula runs
  * in double on those exact sums.
  *
  * Cost model at scale: k columns → k(k+1)/2 pairs × 6 aggregates in a single
  * partial+final hash aggregate (map-side combine), i.e. one reduce of
  * O(k²) fixed-width state — no shuffle of the data itself.
  */
object Correlation {

  private val Dec = DecimalType(38, 6)

  /** Long-form full square matrix (includes diagonal, corr = 1). */
  def matrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    val pairs = for (i <- cols.indices; j <- cols.indices if j >= i) yield (cols(i), cols(j))
    val aggs: Seq[Column] = pairs.flatMap { case (x, y) =>
      val both = col(x).isNotNull && col(y).isNotNull
      def s(c: Column, name: String) =
        sum(when(both, c).otherwise(lit(null)).cast(Dec)).cast("double").as(name)
      Seq(
        count(when(both, lit(1))).as(s"n_${x}_$y"),
        s(col(x), s"sx_${x}_$y"),
        s(col(y), s"sy_${x}_$y"),
        s(col(x) * col(y), s"sxy_${x}_$y"),
        s(col(x) * col(x), s"sxx_${x}_$y"),
        s(col(y) * col(y), s"syy_${x}_$y"))
    }
    val g = df.agg(aggs.head, aggs.tail: _*)
    val rows: Seq[Column] = pairs.flatMap { case (x, y) =>
      val (n, sx, sy, sxy, sxx, syy) =
        (col(s"n_${x}_$y").cast("double"), col(s"sx_${x}_$y"), col(s"sy_${x}_$y"),
          col(s"sxy_${x}_$y"), col(s"sxx_${x}_$y"), col(s"syy_${x}_$y"))
      val corr = (n * sxy - sx * sy) /
        sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      val fwd = struct(lit(x).as("col_x"), lit(y).as("col_y"), corr.as("corr"))
      if (x == y) Seq(fwd)
      else Seq(fwd, struct(lit(y).as("col_x"), lit(x).as("col_y"), corr.as("corr")))
    }
    g.select(explode(array(rows: _*)).as("r")).select(col("r.col_x"), col("r.col_y"), col("r.corr"))
  }

  /** DuckDB oracle SQL computing the identical exact-decimal formula, for the
    * driver's correctness gate. Kept adjacent to the implementation so the
    * two stay in sync. */
  def oracleSql(table: String, cols: Seq[String]): String = {
    val pairs = for (i <- cols.indices; j <- cols.indices if j >= i) yield (cols(i), cols(j))
    val aggs = pairs.flatMap { case (x, y) =>
      val both = s"$x IS NOT NULL AND $y IS NOT NULL"
      def s(e: String, n: String) =
        s"CAST(sum(CAST(CASE WHEN $both THEN $e END AS DECIMAL(38,6))) AS DOUBLE) AS $n"
      Seq(
        s"count(CASE WHEN $both THEN 1 END) AS n_${x}_$y",
        s(x, s"sx_${x}_$y"), s(y, s"sy_${x}_$y"),
        s(s"$x*$y", s"sxy_${x}_$y"), s(s"$x*$x", s"sxx_${x}_$y"), s(s"$y*$y", s"syy_${x}_$y"))
    }.mkString(", ")
    val arms = pairs.flatMap { case (x, y) =>
      def corr =
        s"(CAST(n_${x}_$y AS DOUBLE)*sxy_${x}_$y - sx_${x}_$y*sy_${x}_$y) / " +
          s"sqrt((CAST(n_${x}_$y AS DOUBLE)*sxx_${x}_$y - sx_${x}_$y*sx_${x}_$y)" +
          s"*(CAST(n_${x}_$y AS DOUBLE)*syy_${x}_$y - sy_${x}_$y*sy_${x}_$y))"
      val fwd = s"SELECT '$x' AS col_x, '$y' AS col_y, $corr AS corr FROM g"
      if (x == y) Seq(fwd)
      else Seq(fwd, s"SELECT '$y' AS col_x, '$x' AS col_y, $corr AS corr FROM g")
    }.mkString(" UNION ALL ")
    s"WITH g AS (SELECT $aggs FROM $table) $arms"
  }
}
