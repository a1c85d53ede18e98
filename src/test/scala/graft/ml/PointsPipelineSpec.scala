package graft.ml

import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** modelling_2's points pipeline composed end to end (ref:
  * modelling/modelling_2_player_points.ipynb cells 15-20): tree
  * ensembles + SelectKBest behind variance-k PCA, driven through the
  * grouped nested CV — seeded-reproducible structure on the events
  * fixture, and a QUALITY band on the separable text-length task
  * (ModelQualitySpec's rationale: the events purchase label is
  * feature-independent by fixture construction, so only structure can
  * be asserted there; the band needs a label the features determine).
  */
class PointsPipelineSpec extends SparkSpec {

  private def assembledEvents: DataFrame =
    Pipelines.eventFeatures(Tables(spark, sf("sf0.001"), "events"))

  test("rf and gbt points pipelines fit and predict (notebook stages, both classifiers)") {
    val data = assembledEvents
    for (clf <- Seq("rf", "gbt")) {
      val (pipe, grid) = Pipelines.pointsPipeline(data, classifier = clf,
        numTrees = 5, gbtIters = 3)
      assert(grid.nonEmpty, s"$clf: empty param grid")
      val preds = pipe.fit(data).transform(data)
      assert(preds.columns.contains("prediction"), clf)
      // the selector actually ran: its output is the features col
      assert(preds.columns.contains("features"), clf)
      val auc = Pipelines.auc(preds)
      assert(auc >= 0.0 && auc <= 1.0, clf)
    }
  }

  test("nested grouped CV over the rf points pipeline: reproducible scores, zero straddling groups") {
    val data = assembledEvents
    val (pipe, grid) = Pipelines.pointsPipeline(data, classifier = "rf",
      numTrees = 5)
    val eval = new BinaryClassificationEvaluator().setMetricName("areaUnderROC")
    def run() = NestedCV.crossValScorerGrouped(
      data, "user_id", pipe, grid.take(2), eval,
      cvOuter = 2, cvInner = 2, testSplitOuter = 0.2, seed = 7L)
    val scores = run()
    assert(scores.map(_.split) === Seq(0, 1))
    scores.foreach { s =>
      assert(s.score >= 0.0 && s.score <= 1.0, s"split ${s.split}")
      assert(s.nStraddling === 0L, s"split ${s.split}: outer leakage")
      assert(s.nTrainGroups > 0 && s.nTestGroups > 0)
    }
    val again = run()
    assert(again.map(_.score) === scores.map(_.score))
    assert(again.map(_.bestParams.toString) === scores.map(_.bestParams.toString))
  }

  test("quality band: separable length task through the points pipeline stays near-perfect") {
    val docs = Tables(spark, sf("sf0.001"), "documents")
      .select(col("doc_id"), col("text"),
        size(split(col("text"), " ")).as("n_toks"))
      .withColumn("n_chars", length(col("text")).cast("double"))
      .withColumn("n_spaces", (size(split(col("text"), " ")) - 1).cast("double"))
      .withColumn("awl", col("n_chars") / (col("n_spaces") + 1))
    val trainRaw = docs.filter(col("doc_id") % 5 =!= 0)
    val median = trainRaw.stat.approxQuantile("n_toks", Array(0.5), 0.0)(0)
    def lab(df: DataFrame) = df
      .withColumn("label", (col("n_toks") > median).cast("double"))
      .select(col("doc_id"), col("n_chars"), col("n_spaces"), col("awl"),
        col("label"))
    val train = lab(trainRaw)
    val test = lab(docs.filter(col("doc_id") % 5 === 0))
    val (pipe, _) = Pipelines.pointsPipeline(train,
      inputCols = Array("n_chars", "n_spaces", "awl"),
      classifier = "rf", numTrees = 20)
    val preds = pipe.fit(train).transform(test)
    val acc = Pipelines.accuracy(preds)
    val majority = {
      val n = test.count().toDouble
      val pos = test.filter(col("label") === 1.0).count().toDouble
      math.max(pos, n - pos) / n
    }
    info(f"acc=$acc%.4f majority=$majority%.4f")
    // token count is a function of the features: a healthy composition
    // sits ≈1.0; a dead stage (empty selector, k=0 PCA, collapsed
    // scaler) falls to the majority floor
    assert(acc >= 0.90, f"accuracy $acc%.4f out of band — stage composition regressed")
    assert(acc > majority + 0.2)
  }
}
