package graft.ml

import graft.{SparkSpec, Tables}

class MlSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("PercentageCalc: learned totals normalize; unseen groups computed on the fly") {
    val train = Seq(("a", 10.0), ("a", 20.0), ("b", 30.0)).toDF("g", "x")
    val model = new PercentageCalc()
      .setByGroup("g").setVariables(Array("x")).setConstant(15.0)
      .fit(train)
    // seen group: x / (total/15) → 10 / (30/15) = 5
    val out = model.transform(train).orderBy("g", "x")
      .select("x").as[Double].collect()
    assert(out.toSeq === Seq(5.0, 10.0, 15.0))
    // unseen group "c": totals computed from the transform input
    val test = Seq(("c", 4.0), ("c", 8.0)).toDF("g", "x")
    val out2 = model.transform(test).orderBy("x").select("x").as[Double].collect()
    assert(out2.toSeq === Seq(5.0, 10.0)) // 4/(12/15)=5, 8/(12/15)=10
  }

  test("GroupedFolds: same group → same fold; folds cover [0,k)") {
    val df = (1 to 200).map(i => (i % 17, i)).toDF("g", "v")
    val folded = GroupedFolds.withFold(df, "g", 5)
    val perGroup = folded.groupBy("g").agg(countDistinct("fold").as("nf"))
    assert(perGroup.filter($"nf" > 1).count() === 0)
    val folds = folded.select("fold").distinct().as[Int].collect().sorted
    assert(folds.forall(f => f >= 0 && f < 5))
  }

  test("GroupedFolds: group-level split is leak-free") {
    val df = (1 to 300).map(i => (i % 23, i)).toDF("g", "v")
    val (train, test) = GroupedFolds.groupSplit(df, "g", 0.7, seed = 42)
    val overlap = train.select("g").distinct()
      .join(test.select("g").distinct(), Seq("g"), "inner")
    assert(overlap.count() === 0)
    assert(train.count() + test.count() === 300)
  }

  test("tree ensembles: RandomForest and GBT fit the same feature frame") {
    import org.apache.spark.ml.classification.{GBTClassifier, RandomForestClassifier}
    import org.apache.spark.ml.feature.VectorAssembler
    val data = new VectorAssembler()
      .setInputCols(Array("value", "hour_sin", "hour_cos"))
      .setOutputCol("features")
      .transform(Pipelines.eventFeatures(
        graft.Tables(spark, sf("sf0.001"), "events")))
    val rf = new RandomForestClassifier().setNumTrees(5).setSeed(1L).fit(data)
    val gbt = new GBTClassifier().setMaxIter(3).setSeed(1L).fit(data)
    assert(rf.transform(data).columns.contains("prediction"))
    assert(gbt.transform(data).columns.contains("prediction"))
  }

  test("playsPipeline: fit + evaluate on events (smoke, AUC defined)") {
    val events = Tables(spark, sf("sf0.001"), "events")
    val data = Pipelines.eventFeatures(events)
    val (train, test) = GroupedFolds.groupSplit(data, "user_id", 0.8, seed = 7)
    val model = Pipelines.playsPipeline().fit(train)
    val preds = model.transform(test)
    val auc = Pipelines.auc(preds)
    assert(auc >= 0.0 && auc <= 1.0)
    assert(preds.columns.contains("prediction"))
  }

  test("balanced weights: per-class totals equal (sklearn class_weight='balanced')") {
    val df = (1 to 90).map(i => (if (i <= 75) 0.0 else 1.0, i.toDouble)).toDF("label", "x")
    val w = Pipelines.withBalancedWeights(df)
    val sums = w.groupBy("label").agg(sum("class_weight").as("sw"))
      .select("sw").as[Double].collect()
    // each class's weights sum to n/k = 45
    assert(sums.forall(s => math.abs(s - 45.0) < 1e-9))
  }

  test("balanced LR trains with weightCol and predicts") {
    val events = Tables(spark, sf("sf0.001"), "events")
    val data = Pipelines.withBalancedWeights(Pipelines.eventFeatures(events))
    val assembled = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(Array("value", "hour_sin", "hour_cos"))
      .setOutputCol("features").transform(data)
    val model = Pipelines.balancedLr().setFeaturesCol("features").fit(assembled)
    assert(model.transform(assembled).columns.contains("prediction"))
  }

  test("accuracy evaluator returns a value in [0,1]") {
    val events = Tables(spark, sf("sf0.001"), "events")
    val data = Pipelines.eventFeatures(events)
    val model = Pipelines.playsPipeline().fit(data)
    val acc = Pipelines.accuracy(model.transform(data))
    assert(acc >= 0.0 && acc <= 1.0)
  }

  test("SelectKBest(f_classif): keeps exactly k features") {
    val events = Tables(spark, sf("sf0.001"), "events")
    val data = Pipelines.eventFeatures(events)
    val assembled = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(Array("value", "hour_sin", "hour_cos"))
      .setOutputCol("features_std").transform(data)
    val sel = Pipelines.selectKBest(2).fit(assembled)
    val out = sel.transform(assembled)
      .select("features_sel").head.getAs[org.apache.spark.ml.linalg.Vector](0)
    assert(out.size === 2)
    assert(sel.selectedFeatures.length === 2)
  }

  test("PCA k from explained variance: minimal k reaching the threshold") {
    val events = Tables(spark, sf("sf0.001"), "events")
    val data = Pipelines.eventFeatures(events)
    val assembled = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(Array("value", "hour_sin", "hour_cos"))
      .setOutputCol("features_std").transform(data)
    val k = Pipelines.pcaKForVariance(assembled, "features_std", 0.95)
    assert(k >= 1 && k <= 3)
    // cumulative variance at k reaches the threshold, at k-1 it does not
    val full = new org.apache.spark.ml.feature.PCA()
      .setInputCol("features_std").setOutputCol("p").setK(3).fit(assembled)
    val cum = full.explainedVariance.toArray.scanLeft(0.0)(_ + _).drop(1)
    assert(cum(k - 1) >= 0.95 || k == 3)
    if (k > 1) assert(cum(k - 2) < 0.95)
  }

  test("playsPipelineAuto: variance-k PCA + balanced LR end-to-end") {
    val events = Tables(spark, sf("sf0.001"), "events")
    val data = Pipelines.withBalancedWeights(Pipelines.eventFeatures(events))
    val (train, test) = GroupedFolds.groupSplit(data, "user_id", 0.8, seed = 7)
    val (pipe, k) = Pipelines.playsPipelineAuto(train)
    assert(k >= 1 && k <= 3)
    val preds = pipe.fit(train).transform(test)
    assert(preds.columns.contains("prediction"))
    val auc = Pipelines.auc(preds)
    assert(auc >= 0.0 && auc <= 1.0)
  }
}
