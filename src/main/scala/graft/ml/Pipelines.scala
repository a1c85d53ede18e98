package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.{GBTClassifier, LogisticRegression, RandomForestClassifier}
import org.apache.spark.ml.evaluation.{BinaryClassificationEvaluator, MulticlassClassificationEvaluator}
import org.apache.spark.ml.feature.{PCA, StandardScaler, UnivariateFeatureSelector, VectorAssembler}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.ml.tuning.ParamGridBuilder
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

  /** Accuracy evaluator (ref: modelling_1_player_plays.ipynb cells 5, 16
    * print sklearn accuracy_score alongside ROC-AUC). */
  def accuracy(predictions: DataFrame): Double =
    new MulticlassClassificationEvaluator()
      .setMetricName("accuracy")
      .evaluate(predictions)

  /** Class-balanced sample weights (ref: modelling_1 cell 13,
    * LogisticRegression(class_weight='balanced')): w_c = n / (k · n_c),
    * sklearn's formula. The per-class counts are a k-row driver-side
    * reduction (k = #classes, here 2) — not a data collect. */
  def withBalancedWeights(df: DataFrame, labelCol: String = "label",
      weightCol: String = "class_weight"): DataFrame = {
    val counts = df.groupBy(col(labelCol)).count()
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    val n = counts.values.sum.toDouble
    val k = counts.size
    val w = df.withColumn(weightCol, lit(0.0))
    counts.foldLeft(w) { case (acc, (c, nc)) =>
      acc.withColumn(weightCol,
        when(col(labelCol) === c, lit(n / (k * nc))).otherwise(col(weightCol)))
    }
  }

  /** Logistic regression honoring a class-balanced weight column —
    * MLlib's weightCol is the exact analogue of sklearn class_weight. */
  def balancedLr(weightCol: String = "class_weight"): LogisticRegression =
    new LogisticRegression()
      .setMaxIter(25).setRegParam(0.01).setElasticNetParam(0.0)
      .setWeightCol(weightCol)

  /** SelectKBest(f_classif) (ref: modelling_2_player_points.ipynb cell 9):
    * ANOVA-F univariate top-k selection; continuous features vs a
    * categorical label is exactly sklearn's f_classif scoring. */
  def selectKBest(k: Int, inputCol: String = "features_std",
      outputCol: String = "features_sel"): UnivariateFeatureSelector =
    new UnivariateFeatureSelector()
      .setFeatureType("continuous").setLabelType("categorical")
      .setSelectionMode("numTopFeatures").setSelectionThreshold(k)
      .setFeaturesCol(inputCol).setOutputCol(outputCol)
      .setLabelCol("label")

  /** Smallest k whose cumulative explained variance ≥ `threshold` (ref:
    * modelling_1 cells 7-9: PCA fit to 0.95 of variance). One full-rank
    * fit on the (scaled) training frame; covariance estimation is a
    * single distributed pass, the eigendecomposition is driver-side on a
    * d×d matrix — the standard scalable split. */
  def pcaKForVariance(df: DataFrame, inputCol: String,
      threshold: Double = 0.95): Int = {
    val dim = df.select(inputCol).head.getAs[Vector](0).size
    val full = new PCA().setInputCol(inputCol).setOutputCol("__pca_probe")
      .setK(dim).fit(df)
    val cum = full.explainedVariance.toArray.scanLeft(0.0)(_ + _).drop(1)
    cum.indexWhere(_ >= threshold) match {
      case -1 => dim
      case i => i + 1
    }
  }

  /** The POINTS pipeline — modelling_2's tree-ensemble recipe (ref:
    * modelling/modelling_2_player_points.ipynb cells 17/20: Pipeline =
    * PercentageCalc → StandardScaler → PCA(n_components=0.95) →
    * SelectKBest(f_classif) → classifier), composed as MLlib stages
    * with the notebook's param grid, ready to hand to
    * [[NestedCV.crossValScorerGrouped]] (the notebook's
    * cross_val_scorer_grouped, cell 15).
    *
    * Classifier mapping: "rf" → RandomForestClassifier (the notebook's
    * RandomForestClassifier(n_estimators=100), grid max_depth ×
    * max_features → maxDepth × featureSubsetStrategy, cell 20);
    * "gbt" → GBTClassifier (the XGBClassifier stand-in — MLlib's
    * gradient-boosted trees are the same model family; xgboost itself
    * is not an MLlib estimator), grid over maxDepth;
    * "xgb" → GBTClassifier with the notebook's ACTUAL params_xg grid
    * translated knob-for-knob (modelling_1 cell 24; mapping table in
    * COVERAGE.md — reg_alpha/reg_lambda have no MLlib counterpart and
    * are documented as the stand-in's hyperparameter-surface gap).
    *
    * PCA k is chosen from explained variance on `train` exactly like
    * [[playsPipelineAuto]] (sklearn's fractional n_components has no
    * MLlib equivalent); `selectK` caps at k since the selector runs on
    * the PCA output. `pctByGroup` optionally prepends the notebook's
    * PercentageCalc stage (fit per training fold, so refits inside CV
    * re-learn totals on fold data only — the leak-avoidance reason it
    * lives INSIDE the ref pipeline); the normalized variables must then
    * be part of `inputCols`.
    *
    * `numTrees`/`gbtIters` default far below the notebook's 100 to keep
    * the nested-CV fit count tractable on test fixtures; production
    * callers pass the real budget. */
  def pointsPipeline(train: DataFrame,
      inputCols: Array[String] = Array("value", "hour_sin", "hour_cos"),
      classifier: String = "rf",
      selectK: Int = 2,
      numTrees: Int = 20,
      gbtIters: Int = 10,
      varianceThreshold: Double = 0.95,
      pctByGroup: Option[String] = None,
      pctVariables: Array[String] = Array("value"),
      seed: Long = 42L): (Pipeline, Array[ParamMap]) = {
    val pct = pctByGroup.map(g => new PercentageCalc()
      .setByGroup(g).setVariables(pctVariables).setConstant(15.0))
    val assembler = new VectorAssembler()
      .setInputCols(inputCols).setOutputCol("features_raw")
    val scaler = new StandardScaler()
      .setInputCol("features_raw").setOutputCol("features_std")
      .setWithMean(true).setWithStd(true)
    val prepStages = pct.toArray[org.apache.spark.ml.PipelineStage] ++
      Array[org.apache.spark.ml.PipelineStage](assembler, scaler)
    val prep = new Pipeline().setStages(prepStages).fit(train)
    val k = pcaKForVariance(prep.transform(train), "features_std",
      varianceThreshold)
    val pca = new PCA()
      .setInputCol("features_std").setOutputCol("features_pca").setK(k)
    val sel = selectKBest(math.min(selectK, k),
      inputCol = "features_pca", outputCol = "features")
    val (clf, grid) = classifier match {
      case "rf" =>
        val rf = new RandomForestClassifier()
          .setNumTrees(numTrees).setSeed(seed).setFeaturesCol("features")
        (rf: org.apache.spark.ml.PipelineStage,
          new ParamGridBuilder()
            .addGrid(rf.maxDepth, Array(2, 4))
            .addGrid(rf.featureSubsetStrategy, Array("auto", "0.5"))
            .build())
      case "gbt" =>
        val gbt = new GBTClassifier()
          .setMaxIter(gbtIters).setSeed(seed).setFeaturesCol("features")
        (gbt: org.apache.spark.ml.PipelineStage,
          new ParamGridBuilder()
            .addGrid(gbt.maxDepth, Array(2, 4))
            .build())
      case "xgb" =>
        // The documented XGBClassifier→GBTClassifier hyperparameter
        // mapping (ref: modelling_1_player_plays.ipynb cell 24, params_xg;
        // full table in COVERAGE.md "XGBoost stand-in"):
        //   learning_rate [0.3]   → stepSize [0.3]   (same shrinkage knob)
        //   max_depth    [2, 6]   → maxDepth [2, 6]  (identical meaning)
        //   n_estimators (default 100) → maxIter (`gbtIters`; callers pass
        //                           100 for the notebook budget)
        //   reg_alpha / reg_lambda [0.1, 1, 10] → NO MLlib counterpart:
        //     GBT has no L1/L2 penalty on leaf weights. The nearest
        //     overfit controls are maxDepth (already in the grid) and
        //     minInstancesPerNode/subsamplingRate — deliberately NOT
        //     grid-searched here so the grid stays an honest translation,
        //     not a pretend-equivalent. This is the stand-in's real
        //     hyperparameter-surface divergence.
        val gbt = new GBTClassifier()
          .setMaxIter(gbtIters).setSeed(seed).setFeaturesCol("features")
        (gbt: org.apache.spark.ml.PipelineStage,
          new ParamGridBuilder()
            .addGrid(gbt.stepSize, Array(0.3))
            .addGrid(gbt.maxDepth, Array(2, 6))
            .build())
      case other => throw new IllegalArgumentException(
        s"classifier must be 'rf', 'gbt' or 'xgb', got '$other'")
    }
    val stages = prepStages ++ Array[org.apache.spark.ml.PipelineStage](
      pca, sel, clf)
    (new Pipeline().setStages(stages), grid)
  }

  /** playsPipeline with PCA k chosen from explained variance on `train`
    * and class-balanced logistic regression — the full modelling_1 recipe
    * (cells 7-9 variance-threshold PCA, cell 13 balanced class weights).
    * Returns the pipeline and the chosen k. `train` must already carry the
    * weight column (see [[withBalancedWeights]]). */
  def playsPipelineAuto(train: DataFrame,
      varianceThreshold: Double = 0.95): (Pipeline, Int) = {
    val assembler = new VectorAssembler()
      .setInputCols(Array("value", "hour_sin", "hour_cos"))
      .setOutputCol("features_raw")
    val scaler = new StandardScaler()
      .setInputCol("features_raw").setOutputCol("features_std")
      .setWithMean(true).setWithStd(true)
    val prep = new Pipeline().setStages(Array(assembler, scaler)).fit(train)
    val k = pcaKForVariance(prep.transform(train), "features_std", varianceThreshold)
    val pca = new PCA()
      .setInputCol("features_std").setOutputCol("features").setK(k)
    (new Pipeline().setStages(Array(assembler, scaler, pca, balancedLr())), k)
  }
}
