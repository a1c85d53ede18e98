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
}
