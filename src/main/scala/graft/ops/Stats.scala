package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-based data-quality operators: robust outlier fences and
  * mergeable partial aggregates (the incremental-rollup maintenance a
  * warehouse runs nightly instead of rescanning the fact table).
  */
object Stats {

  /** Tukey-fence outlier rows per group: values outside
    * [q1 − k·IQR, q3 + k·IQR] with the fences attached. The quantile pass
    * is one per-group aggregate (exact interpolated percentile — the 100 TB
    * path swaps in approx_percentile, same plan shape); the fences frame is
    * group-cardinality-sized and broadcast back onto the scan, so the
    * filter costs one corpus read + a broadcast hash join, no wide shuffle
    * of the data itself. */
  def iqrOutliers(df: DataFrame, value: String, keys: Seq[String],
                  k: Double = 1.5): DataFrame = {
    val fences = df.groupBy(keys.map(col): _*).agg(
      expr(s"percentile($value, 0.25)").as("_q1"),
      expr(s"percentile($value, 0.75)").as("_q3"))
      .withColumn("lo", col("_q1") - lit(k) * (col("_q3") - col("_q1")))
      .withColumn("hi", col("_q3") + lit(k) * (col("_q3") - col("_q1")))
      .drop("_q1", "_q3")
    df.join(broadcast(fences), keys)
      .filter(col(value) < col("lo") || col(value) > col("hi"))
  }

  /** Mergeable partial-aggregate state per (keys, bucket): count / exact
    * decimal sum / min / max — the standard incremental-view state. Computed
    * per ingest bucket (a day, an hour, a file batch), stored, and folded
    * with [[mergePartials]] instead of rescanning history. */
  def partialAgg(df: DataFrame, keys: Seq[String], bucket: Column,
                 value: String): DataFrame =
    df.groupBy((keys.map(col) :+ bucket.as("_bucket")): _*).agg(
      count(col(value)).as("n"),
      sum(col(value).cast(Relational.ExactDec)).as("sum_state"),
      min(col(value)).as("min_value"),
      max(col(value)).as("max_value"))

  /** Fold stored partial states down to per-key totals. Identity:
    * mergePartials(partialAgg(df)) == direct groupBy(keys).agg(...) — the
    * algebraic-aggregate contract (count/sum/min/max are all mergeable;
    * avg derives as sum/count). One tiny shuffle over state rows, never
    * the base data. */
  def mergePartials(partials: DataFrame, keys: Seq[String]): DataFrame =
    partials.groupBy(keys.map(col): _*).agg(
      sum(col("n")).as("n"),
      sum(col("sum_state")).cast("double").as("sum_value"),
      min(col("min_value")).as("min_value"),
      max(col("max_value")).as("max_value"))
      .withColumn("avg_value", col("sum_value") / col("n"))
}
