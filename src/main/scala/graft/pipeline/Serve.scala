package graft.pipeline

import graft.ops.{Relational, TimeSeriesOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage 4 — the dashboard's read path as a query set (reference:
  * dashboard/app.py; SURVEY.md §3.3). The reference re-reads and re-computes
  * everything per page render; here each panel is a small declarative plan
  * over the integrated table, suitable for `.persist()` of the shared scan.
  */
object Serve {

  /** Serve-layer cache: persist the integrated panel ONCE and build every
    * dashboard panel on the returned frame. The reference re-reads and
    * re-computes the full CSV on every page render (dashboard/app.py:33-36,
    * module top runs per Streamlit rerun) — the one §3.3 behavior not worth
    * replicating: a served dashboard pays the scan once per refresh, after
    * which every panel plan reads `InMemoryTableScan` (audited in PLANS.md
    * via q141_serve_page). Storage is MEMORY_AND_DISK so an over-sized
    * panel degrades to disk instead of evicting; release with
    * `.unpersist()` on refresh. */
  def cached(integrated: DataFrame): DataFrame =
    integrated.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** [[cached]] memoized per (session, key): the first call persists, every
    * later call with the same key returns the SAME cached frame instead of
    * registering a fresh CacheManager entry — Spark's cache entries are not
    * GC-reclaimed, so an unkeyed re-cache per page render accumulates
    * MEMORY_AND_DISK entries across a long-lived serving session. Key on
    * the data's identity (e.g. the scale dir); the session's identity hash is mixed in
    * so a frame is never handed to a different SparkSession. Release with
    * [[uncache]] on refresh. */
  def cachedFor(spark: org.apache.spark.sql.SparkSession, key: String,
                build: => DataFrame): DataFrame =
    cacheRegistry.computeIfAbsent(s"${System.identityHashCode(spark)}:$key",
      _ => cached(build))

  /** Drop one keyed serve-cache entry (data refreshed): unpersists and
    * forgets it, so the next [[cachedFor]] re-reads. */
  def uncache(spark: org.apache.spark.sql.SparkSession, key: String): Unit = {
    val k = s"${System.identityHashCode(spark)}:$key"
    Option(cacheRegistry.remove(k)).foreach(_.unpersist())
  }

  private val cacheRegistry =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** Market overview (dashboard/app.py:75-84): per symbol, last price and
    * the % change between the last two observations (W7 + W1). */
  def lastChange(integrated: DataFrame): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy(col("hour").desc)
    integrated
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= 2)
      .groupBy("symbol")
      .agg(max_by(col("c"), col("hour")).as("last_price"),
        min_by(col("c"), col("hour")).as("prev_price"),
        count(lit(1)).as("_n"))
      .withColumn("pct_change",
        when(col("_n") === 2 && col("prev_price") =!= 0,
          (col("last_price") - col("prev_price")) / col("prev_price") * 100))
      .drop("prev_price", "_n")
  }

  /** Previous-day macro value with latest fallback (dashboard/app.py:17-30),
    * global (macro is symbol-independent). */
  def prevDayMacro(integrated: DataFrame, indicator: String): DataFrame =
    TimeSeriesOps.prevDayValue(
      integrated.filter(col(indicator).isNotNull).withColumn("_g", lit(1)),
      Seq("_g"), "hour", indicator, Nil, s"prev_$indicator").drop("_g")

  /** Latest volume per symbol, descending (dashboard/app.py:173-174). */
  def latestVolumes(integrated: DataFrame): DataFrame =
    Relational.latestPerGroup(integrated.filter(col("Volume").isNotNull),
        Seq("symbol"), Seq(col("hour")), Seq("Volume"))
      .orderBy(col("Volume").desc)

  /** Returns distribution for one symbol (dashboard/app.py:329-339):
    * 60-bin probability-density histogram over hourly returns. */
  def returnsHistogram(integrated: DataFrame, symbol: String): DataFrame =
    TimeSeriesOps.histogramDensity(
      integrated.filter(col("symbol") === symbol && col("ret_1h").isNotNull), "ret_1h", 60)

  /** Volatility + stability label (dashboard/app.py:342-343): sample stddev
    * of returns (pandas ddof=1 ≙ stddev_samp), threshold 0.02. */
  def volatilityStability(integrated: DataFrame): DataFrame =
    integrated.filter(col("ret_1h").isNotNull)
      .groupBy("symbol")
      .agg(stddev_samp(col("ret_1h")).as("volatility"))
      .withColumn("stability",
        when(col("volatility") < 0.02, "Stable").otherwise("Volatile"))

  /** Causality summary (dashboard/app.py:408-413): per predictor the best
    * (min) p-value, −log10 significance with zero-guard, top-10. */
  def causalitySummary(causality: DataFrame): DataFrame =
    Relational.topK(
      causality.groupBy("predictor").agg(min(col("p_value")).as("p_value"))
        .withColumn("significance",
          -log10(when(col("p_value") === 0, 1e-10).otherwise(col("p_value")))),
      10, col("significance").desc, col("predictor").asc)
}
