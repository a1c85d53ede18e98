package graft.ml

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.tuning.{CrossValidator, ParamGridBuilder}

import graft.{SparkSpec, Tables}

/** Grouped nested CV via MLlib's foldCol (SURVEY.md §2.12; ref:
  * GroupKFold + GridSearchCV, modelling_1 cells 12-17). */
class CrossValidationSpec extends SparkSpec {

  test("CrossValidator with group-derived foldCol and a small grid") {
    val events = Tables(spark, sf("sf0.001"), "events")
    val data = GroupedFolds.withFold(
      Pipelines.eventFeatures(events), "user_id", k = 3)
    val assembled = new VectorAssembler()
      .setInputCols(Array("value", "hour_sin", "hour_cos"))
      .setOutputCol("features")
      .transform(data)

    val lr = new LogisticRegression().setMaxIter(10)
    val grid = new ParamGridBuilder()
      .addGrid(lr.regParam, Array(0.01, 0.1))
      .build()
    val cv = new CrossValidator()
      .setEstimator(lr)
      .setEvaluator(new BinaryClassificationEvaluator().setMetricName("areaUnderROC"))
      .setEstimatorParamMaps(grid)
      .setNumFolds(3)
      .setFoldCol("fold")
    val model = cv.fit(assembled)
    assert(model.avgMetrics.length === 2)
    assert(model.avgMetrics.forall(m => m >= 0.0 && m <= 1.0))
  }
}
