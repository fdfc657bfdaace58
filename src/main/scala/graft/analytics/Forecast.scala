package graft.analytics

import graft.ops.TimeSeriesOps
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.ml.regression.{GBTRegressionModel, GBTRegressor}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** C2/C3/C4 — lag-feature gradient-boosted forecaster (reference:
  * analysis_part/main.py:81-125 — imports SARIMAX but actually trains
  * XGBRegressor(n_estimators=300, lr=.05, depth=6, subsample=.8) on 24 lag
  * features; SURVEY.md §2.10 "naming trap").
  *
  * Spark-first shape: the lag design is one window pass (W3), the
  * chronological 80/20 split a row_number tag (W6); training is Spark ML
  * GBTRegressor. The 168-step recursive forecast is inherently sequential —
  * each prediction feeds lag-1 of the next — so it runs as a driver loop on
  * the LOCAL model (`GBTRegressionModel.predict` on one vector; no per-step
  * Spark job), exactly as SURVEY.md §7.4 #4 prescribes.
  *
  * GBT ≠ XGBoost numerically (different split/regularization details), so
  * parity with the reference is behavioral (determinism under fixed seed,
  * RMSE bound), not value-equality — SURVEY.md §5.3.
  */
object Forecast {

  final case class Result(model: GBTRegressionModel, rmse: Double, forecast: DataFrame)

  /** Train on one symbol's series and produce an `horizon`-step recursive
    * forecast. `df` must hold (ts, target) rows for a single symbol. */
  def forecastSymbol(df: DataFrame, ts: String, target: String,
                     nLags: Int = 24, horizon: Int = 168,
                     maxIter: Int = 300, seed: Long = 42L): Result = {
    val spark = df.sparkSession
    import spark.implicits._

    val lagCols = (1 to nLags).map(i => s"${target}_lag$i")
    val designed = TimeSeriesOps.lagFeatures(
        df.select(col(ts), col(target).cast("double").as(target)),
        target, nLags, Nil, Seq(col(ts)))
      .na.drop()
    val tagged = TimeSeriesOps.chronoSplitTag(designed, Nil, Seq(col(ts)), 0.8, "is_train")

    val assembler = new VectorAssembler().setInputCols(lagCols.toArray).setOutputCol("features")
    val train = assembler.transform(tagged.filter(col("is_train"))).cache()
    val test  = assembler.transform(tagged.filter(!col("is_train")))

    val gbt = new GBTRegressor()
      .setLabelCol(target).setFeaturesCol("features")
      .setMaxIter(maxIter).setStepSize(0.05).setMaxDepth(6)
      .setSubsamplingRate(0.8)
      // mirror of the reference's colsample_bytree=0.8
      // (analysis_part/main.py:102); Spark's nearest knob subsamples the
      // 0.8 fraction per tree NODE rather than per tree
      .setFeatureSubsetStrategy("0.8").setSeed(seed)
    val model = gbt.fit(train)

    // C4 — RMSE on the chronological holdout
    val rmse = model.transform(test)
      .select(sqrt(avg(pow(col(target) - col("prediction"), 2))).as("rmse"))
      .head().getDouble(0)
    train.unpersist(blocking = false) // release the per-symbol training cache

    // C3 — recursive multi-step forecast: driver loop on the local model
    val lastRows = designed.orderBy(col(ts).desc).limit(1)
      .select((target +: lagCols.dropRight(1).toList).map(col): _*).head()
    var lags = (0 until nLags).map(i => lastRows.getDouble(i)).toArray // newest first
    val preds = (1 to horizon).map { step =>
      val yhat = model.predict(Vectors.dense(lags))
      lags = (yhat +: lags.toSeq.dropRight(1)).toArray
      (step, yhat)
    }
    val fc = preds.toDF("step", s"forecast_$target").withColumn("rmse", lit(rmse))
    Result(model, rmse, fc)
  }

  /** S7 — persist the model artifact (reference saves joblib pickles named
    * `{company}_sarimax.pkl`, analysis_part/main.py:166 — name kept for
    * output-path parity only). */
  def save(model: GBTRegressionModel, path: String): Unit =
    model.write.overwrite().save(path)
}
