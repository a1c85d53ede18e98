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

  test("multi-probe: recall@1 monotone in nProbe; exact when probing all cells") {
    GraftExtensions.register(spark)
    val k = 8
    val index = IvfIndex.build(emb, k = k)
    val probes = emb.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
    // brute-force COSINE ground truth (the metric search() ranks by)
    val cands = emb.select(col("vec_id").as("cand_id"), col("embedding").as("ce"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id")).orderBy(col("sim").desc, col("cand_id"))
    val exact = probes.crossJoin(cands)
      .filter(col("probe_id") =!= col("cand_id"))
      .withColumn("sim", expr("graft_fdot(pe, ce)") /
        (sqrt(expr("graft_fdot(pe, pe)")) * sqrt(expr("graft_fdot(ce, ce)"))))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("probe_id"), col("cand_id").as("true_id"))
    val nProbes = probes.count().toDouble

    def recallAt(nProbe: Int): Double = {
      val ivf = IvfIndex.search(index, probes, topK = 1, nProbe = nProbe)
      ivf.join(exact, "probe_id")
        .filter(col("cand_id") === col("true_id")).count() / nProbes
    }

    val r1 = recallAt(1)
    val r3 = recallAt(3)
    val rAll = recallAt(k)
    assert(r1 <= r3 && r3 <= rAll,
      s"recall must be monotone in nProbe: $r1, $r3, $rAll")
    assert(r3 > 0.0)
    // probing every cell == brute force (same metric, same tie-break)
    assert(rAll === 1.0, s"recall@1 with nProbe=k must be exact, got $rAll")
  }

  test("buildLloyd: DataFrame-native quantizer partitions and searches") {
    GraftExtensions.register(spark)
    val k = 8
    val index = IvfIndex.buildLloyd(emb, k = k, iters = 3)
    assert(index.centers.size === k)
    assert(index.centers.map(_._1).sorted === (0 until k))
    // every vector assigned to exactly one cell
    assert(index.assignments.count() === emb.count())
    assert(index.assignments.select("cluster").distinct().count() <= k)
    // assignments are nearest-centroid: re-deriving them changes nothing
    val probes = emb.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
    val out = IvfIndex.search(index, probes, topK = 1, nProbe = k)
    assert(out.count() === probes.count())
    // nProbe=k search over the Lloyd index is exact brute-force cosine:
    // same result set as the MLlib index at nProbe=k (metric identical)
    val mlIndex = IvfIndex.build(emb, k = k)
    val mlOut = IvfIndex.search(mlIndex, probes, topK = 1, nProbe = k)
      .select(col("probe_id"), col("cand_id"))
    assert(out.select(col("probe_id"), col("cand_id"))
      .except(mlOut).count() === 0)
  }
}
