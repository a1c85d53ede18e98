package org.apache.spark.ml.graft

import org.apache.spark.ml.param.Params
import org.apache.spark.ml.util.{DefaultParamsReader, DefaultParamsWriter}
import org.apache.spark.sql.SparkSession

/** Thin forwarder exposing MLlib's `private[ml]` metadata (de)serializers
  * to graft's custom estimator/model pair — the standard third-party-
  * MLlib-extension shim (a subpackage of `org.apache.spark.ml` sees
  * `private[ml]` members). Only these two entry points are exposed; no
  * Spark internals are reimplemented, so the on-disk metadata format
  * stays EXACTLY the one `Pipeline`/`PipelineModel.load` expect — which
  * is the whole point: a `PipelineModel` containing a
  * [[graft.ml.PercentageCalcModel]] stage must round-trip through the
  * standard `model.save`/`PipelineModel.load` path (SURVEY §2.2 K8; the
  * ref pickles the entire sklearn pipeline, PercentageCalc included).
  */
object GraftParamsIO {

  /** Standard-format stage metadata write (class/uid/params JSON). */
  def saveMetadata(instance: Params, path: String, spark: SparkSession): Unit =
    DefaultParamsWriter.saveMetadata(instance, path, spark)

  /** Load standard-format metadata, construct the instance via `mk(uid)`,
    * and restore its params. `expectedClassName` guards against loading
    * a foreign stage's directory. */
  def loadAndSetParams[T <: Params](path: String, spark: SparkSession,
      expectedClassName: String, mk: String => T): T = {
    val meta = DefaultParamsReader.loadMetadata(path, spark, expectedClassName)
    val inst = mk(meta.uid)
    meta.getAndSetParams(inst)
    inst
  }
}
