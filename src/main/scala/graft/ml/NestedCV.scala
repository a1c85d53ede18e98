package graft.ml

import org.apache.spark.ml.Estimator
import org.apache.spark.ml.evaluation.Evaluator
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.ml.tuning.CrossValidator
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Nested grouped cross-validation — the reference's
  * `cross_val_scorer_grouped` (modelling_1_player_plays.ipynb cells
  * 12-17, repeated in modelling_2 cell ~4179): an OUTER
  * GroupShuffleSplit holds out test_split_outer of the GROUPS per
  * split; on each outer train an INNER GridSearchCV tunes the
  * hyper-parameters with group-aware folds; the tuned model is scored
  * once on the held-out outer test. The result is the score VECTOR over
  * outer splits — the unbiased generalization estimate the notebook
  * prints as mean ± std.
  *
  * Spark mapping: outer split = [[GroupedFolds.groupSplit]] (split the
  * DISTINCT group ids, semi-join back — groups can never straddle);
  * inner loop = MLlib `CrossValidator` with `foldCol` derived from the
  * group hash ([[GroupedFolds.foldCol]] — every row of a group shares a
  * fold). Seeded: split i uses seed + i, so a rerun reproduces the
  * exact score vector.
  *
  * Scale notes: the outer loop is a driver-side loop over cvOuter
  * fits — each fit/score is fully distributed; the only driver data is
  * the score vector itself. Group assignment is a pure hash (no
  * shuffle); the outer split shuffles only the distinct-id frame.
  */
object NestedCV {

  /** One outer split's outcome: the tuned best params, the held-out
    * score, group counts on both sides, and the (must-be-zero) count of
    * groups straddling the boundary. */
  final case class OuterScore(split: Int, bestParams: ParamMap, score: Double,
      nTrainGroups: Long, nTestGroups: Long, nStraddling: Long)

  /** `data` must already carry the estimator's feature/label columns.
    * Returns one [[OuterScore]] per outer split, in split order. */
  def crossValScorerGrouped(data: DataFrame, groupCol: String,
      estimator: Estimator[_], grid: Array[ParamMap], evaluator: Evaluator,
      cvOuter: Int = 5, cvInner: Int = 3, testSplitOuter: Double = 0.2,
      seed: Long = 42L): Seq[OuterScore] =
    (0 until cvOuter).map { i =>
      val (train, test) =
        GroupedFolds.groupSplit(data, groupCol, 1 - testSplitOuter, seed + i)
      val trainFolded = GroupedFolds.withFold(train, groupCol, cvInner,
        foldColName = "__ncv_fold")
      val cv = new CrossValidator()
        .setEstimator(estimator)
        .setEstimatorParamMaps(grid)
        .setEvaluator(evaluator)
        .setNumFolds(cvInner)
        .setFoldCol("__ncv_fold")
        .setSeed(seed + i)
      val model = cv.fit(trainFolded)
      // NaN-safe argmax: a grid point whose metric is NaN (degenerate
      // fold, undefined AUC) must lose to any real score — maxBy/minBy
      // over raw doubles would let NaN win the comparison chain and
      // silently report a garbage "best". All-NaN is an error, not a pick.
      val metrics = model.avgMetrics.zipWithIndex.filterNot(_._1.isNaN)
      require(metrics.nonEmpty,
        s"outer split $i: every grid point's CV metric is NaN — " +
          "the evaluator produced no usable score on any fold")
      val bestIdx =
        (if (evaluator.isLargerBetter) metrics.maxBy(_._1)
         else metrics.minBy(_._1))._2
      val best = grid(bestIdx)
      // Reuse CrossValidator's own fitted bestModel only when EVERY
      // argmax convention must land on the same grid point as the
      // NaN-safe pick above: no NaN anywhere and a strictly unique best
      // metric. Under ties or NaNs, WHICH point bestModel was fitted
      // from depends on Spark's internal tie-break / NaN ordering — an
      // implementation detail we must not re-derive here (it can change
      // across Spark/Scala versions and the divergence would be silent).
      // In those degenerate cases pay one refit of the known-good point.
      val bestMetric = model.avgMetrics(bestIdx)
      val reuseSafe = !model.avgMetrics.exists(_.isNaN) &&
        model.avgMetrics.count(_ == bestMetric) == 1
      val scored =
        if (reuseSafe) model.bestModel
        else estimator.copy(best).fit(trainFolded)
          .asInstanceOf[org.apache.spark.ml.Transformer]
      val score = evaluator.evaluate(scored.transform(test))
      val trainG = train.select(col(groupCol)).distinct()
      val testG = test.select(col(groupCol)).distinct()
      OuterScore(i, best, score,
        trainG.count(), testG.count(),
        trainG.join(testG, Seq(groupCol), "inner").count())
    }
}
