package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature.{PCA, StandardScaler, VectorAssembler}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MLlib pipelines mirroring the reference's modelling notebooks
  * (SURVEY.md §2.12, §3.3): feature assembly → PercentageCalc →
  * StandardScaler → PCA → LogisticRegression, with group-aware folds.
  *
  * The reference predicts "will the player play" from lagged player
  * features (modelling_1); here the stand-in task predicts purchase
  * events from event features — same pipeline shape, same estimators.
  */
object Pipelines {

  /** events → labeled feature frame. Label: is-purchase. Features:
    * value, hour-of-day cyclics, user-normalized value (PercentageCalc). */
  def eventFeatures(events: DataFrame): DataFrame = {
    val base = events
      .withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))
      .withColumn("label", (col("event_type") === "purchase").cast("double"))
      .withColumn("hour_sin", sin(hour(col("event_time")) * lit(2 * math.Pi) / 24))
      .withColumn("hour_cos", cos(hour(col("event_time")) * lit(2 * math.Pi) / 24))
      .select(col("event_id"), col("user_id"), col("label"),
        col("value"), col("hour_sin"), col("hour_cos"))
    new PercentageCalc()
      .setByGroup("user_id")
      .setVariables(Array("value"))
      .setConstant(15.0)
      .fit(base)
      .transform(base)
  }

  /** Assemble → scale → PCA → logistic regression. */
  def playsPipeline(pcaK: Int = 3): Pipeline = {
    val assembler = new VectorAssembler()
      .setInputCols(Array("value", "hour_sin", "hour_cos"))
      .setOutputCol("features_raw")
    val scaler = new StandardScaler()
      .setInputCol("features_raw").setOutputCol("features_std")
      .setWithMean(true).setWithStd(true)
    val pca = new PCA()
      .setInputCol("features_std").setOutputCol("features").setK(pcaK)
    val lr = new LogisticRegression()
      .setMaxIter(25).setRegParam(0.01).setElasticNetParam(0.0)
    new Pipeline().setStages(Array(assembler, scaler, pca, lr))
  }

  def auc(predictions: DataFrame): Double =
    new BinaryClassificationEvaluator()
      .setMetricName("areaUnderROC")
      .evaluate(predictions)
}
