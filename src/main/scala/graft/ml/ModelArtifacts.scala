package graft.ml

import java.nio.file.{Files, Paths}

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.SparkSession

/** K8 — model artifact + metadata save/load (ref: modelling_1_player_plays
  * .ipynb cells 38-39: pickle the fitted model and a metadata dict side by
  * side on S3).
  *
  * Spark-native form: `PipelineModel.save` writes a directory of parquet +
  * JSON parts — unlike a pickle it is written BY THE CLUSTER (each stage's
  * coefficients land as distributed parquet), versioned by MLlib, and
  * readable from any Spark app. The metadata sidecar is a flat JSON object
  * (feature list, params, training metrics, run id) exactly like the
  * reference's dict.
  */
object ModelArtifacts {

  private def esc(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Save the fitted pipeline under `dir/model` and the metadata map as
    * `dir/metadata.json`. */
  def save(model: PipelineModel, dir: String, metadata: Map[String, String]): Unit = {
    model.write.overwrite().save(s"$dir/model")
    val json = metadata.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }
      .mkString("{", ", ", "}")
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(s"$dir/metadata.json"), json)
  }

  /** Load the pipeline + metadata saved by [[save]]. */
  def load(spark: SparkSession, dir: String): (PipelineModel, Map[String, String]) = {
    val model = PipelineModel.load(s"$dir/model")
    val row = spark.read.json(s"$dir/metadata.json").head()
    val meta = row.schema.fieldNames.map(f => f -> row.getAs[String](f)).toMap
    (model, meta)
  }
}
