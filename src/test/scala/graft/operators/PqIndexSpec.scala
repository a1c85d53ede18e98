package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.expressions.GraftExtensions

class PqIndexSpec extends SparkSpec {

  private lazy val emb = Tables(spark, sf("sf0.001"), "embeddings")

  test("PQ encode: m codes per vector, all within the codebook range") {
    GraftExtensions.register(spark)
    val cb = PqIndex.train(emb, m = 4, k = 8, iters = 3)
    assert(cb.sub * cb.m === 64)
    val enc = PqIndex.encode(emb, cb)
    assert(enc.count() === emb.count())
    val bad = enc.filter(
      size(col("codes")) =!= 4 ||
        exists(col("codes"), c => c < 0 || c >= 8)).count()
    assert(bad === 0)
    // deterministic: encoding twice yields identical codes
    val enc2 = PqIndex.encode(emb, cb)
    assert(enc.exceptAll(enc2).count() === 0)
  }

  test("ADC distances are partitioning-invariant (integer-micro sums)") {
    GraftExtensions.register(spark)
    // a float sum of the m partial distances would drift with shuffle
    // order; the micro-quantized sum must make search output (values AND
    // tie-breaks) identical under any repartitioning
    val cb = PqIndex.train(emb, m = 4, k = 8, iters = 2)
    val enc = PqIndex.encode(emb, cb)
    val probes = emb.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
    val a = PqIndex.search(cb, enc, probes, 5)
    val b = PqIndex.search(cb, enc.repartition(13), probes.repartition(7), 5)
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  // The synthetic embeddings are near-uniform in 64 dims, so the exact
  // NN is barely closer than the bulk (curse of dimensionality) — top-1
  // recall is the wrong bar for this data. The ADC ordering's QUALITY is
  // asserted instead: the true NN's position in the full ADC ranking
  // must beat the uniform-random expectation by a wide margin, and with
  // 16-entry codebooks the true NN must actually land in the top-10 for
  // a fixed fraction of probes. The whole pipeline is deterministic
  // (lowest-vec_id Lloyd init, no RNG), so these are stable thresholds,
  // not flaky statistics.
  test("PQ ADC search: every probe answered; ordering beats random by 2x+") {
    GraftExtensions.register(spark)
    val probes = emb.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
    val nProbes = probes.count() // 20 of 500
    val n = emb.count().toInt

    // exact squared-L2 nearest neighbour (excluding self) as ground truth
    val cands = emb.select(col("vec_id").as("cand_id"), col("embedding").as("ce"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("d2"), col("cand_id"))
    val exact = probes.crossJoin(cands)
      .filter(col("probe_id") =!= col("cand_id"))
      .withColumn("d2",
        expr("graft_fdot(pe, pe)") + expr("graft_fdot(ce, ce)") -
          lit(2.0) * expr("graft_fdot(pe, ce)"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("probe_id"), col("cand_id").as("true_id"))

    val cb8 = PqIndex.train(emb, m = 4, k = 8, iters = 3)
    val enc8 = PqIndex.encode(emb, cb8)
    val top10 = PqIndex.search(cb8, enc8, probes, 10)
    assert(top10.groupBy("probe_id").count()
      .filter(col("count") === 10).count() === nProbes)
    // mean rank of the true NN in the full ADC ordering: random ≈ n/2
    val meanRank = PqIndex.search(cb8, enc8, probes, n)
      .join(exact, "probe_id")
      .filter(col("cand_id") === col("true_id"))
      .agg(avg(col("rnk"))).head().getDouble(0)
    assert(meanRank < n / 4.0, s"mean ADC rank of true NN = $meanRank (random ≈ ${n / 2})")

    // richer codebooks must land the true NN in the top-10 for ≥ 25% of
    // probes (measured 0.30; random would be 10/n = 2%)
    val cb16 = PqIndex.train(emb, m = 4, k = 16, iters = 5)
    val enc16 = PqIndex.encode(emb, cb16)
    val hits = PqIndex.search(cb16, enc16, probes, 10)
      .join(exact, "probe_id")
      .filter(col("cand_id") === col("true_id")).count()
    val recall = hits.toDouble / nProbes
    assert(recall >= 0.25, s"k=16 recall@10 = $recall")
  }

  test("k=64 codebooks on the 10x corpus: codes valid, recall floor holds") {
    // the production setting scales k with the corpus; exercise the PQ
    // path at k=64 over the sf0.01 corpus (500 vectors — k=64 needs a
    // corpus larger than the codebook, which sf0.001's 50 cannot seed)
    val emb01 = Tables(spark, sf("sf0.01"), "embeddings")
    val n = emb01.count().toInt
    assert(n > 64)
    val cb = PqIndex.train(emb01, m = 4, k = 64, iters = 3)
    assert(cb.books.size === 4 && cb.books.forall(_._2.size === 64))
    val enc = PqIndex.encode(emb01, cb)
    assert(enc.count() === n)
    assert(enc.select(explode(col("codes")).as("c"))
      .filter(col("c") < 0 || col("c") >= 64).count() === 0)

    val probes = emb01.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
    val nProbes = probes.count().toInt
    val cands = emb01.select(col("vec_id").as("cand_id"),
      col("embedding").as("ce"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("d2"), col("cand_id"))
    val exact = probes.crossJoin(cands)
      .filter(col("probe_id") =!= col("cand_id"))
      .withColumn("d2",
        expr("graft_fdot(pe, pe)") + expr("graft_fdot(ce, ce)") -
          lit(2.0) * expr("graft_fdot(pe, ce)"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("probe_id"), col("cand_id").as("true_id"))
    val hits = PqIndex.search(cb, enc, probes, 10)
      .join(exact, "probe_id")
      .filter(col("cand_id") === col("true_id")).count()
    val recall = hits.toDouble / nProbes
    // 10x corpus, 4x codebook: the k=16 floor must at least carry over
    // (random recall@10 here is 10/500 = 2%)
    assert(recall >= 0.25, s"k=64 recall@10 = $recall on n=$n")
  }
}
