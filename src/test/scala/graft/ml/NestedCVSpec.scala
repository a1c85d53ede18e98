package graft.ml

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.tuning.ParamGridBuilder
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The composed nested-CV driver (ref cross_val_scorer_grouped,
  * modelling_1 cells 12-17): seeded reproducible outer score vector,
  * groups never straddling the boundary at EITHER level. */
class NestedCVSpec extends SparkSpec {

  private def assembled = {
    val events = Tables(spark, sf("sf0.001"), "events")
    new VectorAssembler()
      .setInputCols(Array("value", "hour_sin", "hour_cos"))
      .setOutputCol("features")
      .transform(Pipelines.eventFeatures(events))
  }

  test("outer score vector: right length, valid scores, zero straddling groups, reproducible") {
    val data = assembled
    val lr = new LogisticRegression().setMaxIter(10)
    val grid = new ParamGridBuilder()
      .addGrid(lr.regParam, Array(0.01, 0.5))
      .build()
    val eval = new BinaryClassificationEvaluator().setMetricName("areaUnderROC")
    def run() = NestedCV.crossValScorerGrouped(
      data, "user_id", lr, grid, eval,
      cvOuter = 3, cvInner = 3, testSplitOuter = 0.2, seed = 7L)

    val scores = run()
    assert(scores.map(_.split) === Seq(0, 1, 2))
    scores.foreach { s =>
      assert(s.score >= 0.0 && s.score <= 1.0, s"split ${s.split}")
      assert(s.nStraddling === 0L, s"split ${s.split}: outer leakage")
      assert(s.nTrainGroups > 0 && s.nTestGroups > 0)
      // 20% holdout of groups, loosely: test side is the minority
      assert(s.nTestGroups < s.nTrainGroups)
    }
    // seeded determinism: same seed → identical vector + identical tuning
    val again = run()
    assert(again.map(_.score) === scores.map(_.score))
    assert(again.map(_.bestParams.toString) === scores.map(_.bestParams.toString))
    // different seed → different group partition (nearly surely)
    val other = NestedCV.crossValScorerGrouped(
      data, "user_id", lr, grid, eval,
      cvOuter = 3, cvInner = 3, testSplitOuter = 0.2, seed = 8L)
    assert(other.map(_.nTestGroups) !== scores.map(_.nTestGroups))
  }

  test("inner folds are group-constant: no group straddles a fold boundary") {
    val data = assembled
    val (train, _) = GroupedFolds.groupSplit(data, "user_id", 0.8, 7L)
    val folded = GroupedFolds.withFold(train, "user_id", 3, "__ncv_fold")
    val perGroup = folded.groupBy(col("user_id"))
      .agg(countDistinct(col("__ncv_fold")).as("nf"))
      .agg(max(col("nf")).as("mx")).head.getLong(0)
    assert(perGroup === 1L)
    // and the folds are actually populated (k=3 → 3 non-empty folds)
    assert(folded.select(col("__ncv_fold")).distinct().count() === 3L)
  }
}
