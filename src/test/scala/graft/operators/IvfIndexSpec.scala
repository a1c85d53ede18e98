package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.expressions.GraftExtensions

class IvfIndexSpec extends SparkSpec {

  private lazy val emb = Tables(spark, sf("sf0.001"), "embeddings")

  test("IVF search: probes touch only probed cells; recall@1 beats random") {
    GraftExtensions.register(spark)
    val index = IvfIndex.build(emb, k = 8)
    assert(index.assignments.select("cluster").distinct().count() <= 8)

    val probes = emb.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
    val ivf = IvfIndex.search(index, probes, topK = 1, nProbe = 3)
      .select(col("probe_id"), col("cand_id"))

    // brute-force ground truth
    val cands = emb.select(col("vec_id").as("cand_id"), col("embedding").as("ce"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id")).orderBy(col("sim").desc, col("cand_id"))
    val exact = probes.crossJoin(cands)
      .filter(col("probe_id") =!= col("cand_id"))
      .withColumn("sim", expr("graft_fdot(pe, ce)"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("probe_id"), col("cand_id").as("true_id"))

    val nProbes = probes.count().toDouble
    val hits = ivf.join(exact, "probe_id")
      .filter(col("cand_id") === col("true_id")).count()
    val recall = hits / nProbes
    assert(recall >= 0.5, s"recall@1 = $recall")
    assert(ivf.count() === nProbes) // every probe answered
  }
}
