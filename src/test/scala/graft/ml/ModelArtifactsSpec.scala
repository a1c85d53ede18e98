package graft.ml

import graft.{SparkSpec, Tables}

class ModelArtifactsSpec extends SparkSpec {
  import spark.implicits._

  test("K8: save + reload round-trip preserves predictions and metadata") {
    val events = Tables(spark, sf("sf0.001"), "events")
    val data = Pipelines.eventFeatures(events)
    val model = Pipelines.playsPipeline().fit(data)
    val dir = java.nio.file.Files.createTempDirectory("graft-artifact").toString

    ModelArtifacts.save(model, dir,
      Map("run_id" -> "r2-test", "features" -> "value,hour_sin,hour_cos",
        "auc" -> Pipelines.auc(model.transform(data)).toString))

    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/metadata.json")))
    val (loaded, meta) = ModelArtifacts.load(spark, dir)
    assert(meta("run_id") === "r2-test")
    assert(meta("features") === "value,hour_sin,hour_cos")

    val orig = model.transform(data)
      .select($"event_id", $"prediction").orderBy($"event_id")
      .as[(Long, Double)].collect()
    val again = loaded.transform(data)
      .select($"event_id", $"prediction").orderBy($"event_id")
      .as[(Long, Double)].collect()
    assert(orig.sameElements(again))
  }

  test("K8: the points pipeline WITH its PercentageCalc stage round-trips through save/load") {
    // the ref pickles the whole sklearn pipeline, PercentageCalc
    // included (modelling_2 cell 17) — so the custom stage must speak
    // MLlib persistence: standard metadata via the GraftParamsIO shim,
    // learned totals as parquet, loadable by plain PipelineModel.load
    import org.apache.spark.sql.functions._
    val events = Tables(spark, sf("sf0.001"), "events")
    val raw = events
      .withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))
      .withColumn("label", (col("event_type") === "purchase").cast("double"))
      .withColumn("hour_sin", sin(hour(col("event_time")) * lit(2 * math.Pi) / 24))
      .withColumn("hour_cos", cos(hour(col("event_time")) * lit(2 * math.Pi) / 24))
      .select(col("event_id"), col("user_id").cast("string").as("user_id"),
        col("label"), col("value"), col("hour_sin"), col("hour_cos"))
    val (pipe, _) = Pipelines.pointsPipeline(raw, classifier = "rf",
      numTrees = 5, pctByGroup = Some("user_id"))
    val model = pipe.fit(raw)
    val dir = java.nio.file.Files.createTempDirectory("graft-points-art").toString
    ModelArtifacts.save(model, dir, Map("run_id" -> "points-rt"))
    val (loaded, meta) = ModelArtifacts.load(spark, dir)
    assert(meta("run_id") === "points-rt")
    // the custom stage survived with its learned totals intact
    val pct = loaded.stages.collectFirst { case m: PercentageCalcModel => m }.get
    assert(pct.totals.count() > 0)
    val orig = model.transform(raw)
      .select($"event_id", $"prediction").orderBy($"event_id")
      .as[(Long, Double)].collect()
    val again = loaded.transform(raw)
      .select($"event_id", $"prediction").orderBy($"event_id")
      .as[(Long, Double)].collect()
    assert(orig.sameElements(again))
  }
}
