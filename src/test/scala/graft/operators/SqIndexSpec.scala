package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.expressions.GraftExtensions

class SqIndexSpec extends SparkSpec {

  private lazy val emb = Tables(spark, sf("sf0.001"), "embeddings")

  test("SQ8 encode: dim codes per vector, all in [0, 255], deterministic") {
    GraftExtensions.register(spark)
    val b = SqIndex.train(emb)
    assert(b.dim === 64)
    assert(b.lo.indices.forall(i => b.lo(i) <= b.hi(i)))
    val enc = SqIndex.encode(emb, b)
    assert(enc.count() === emb.count())
    val bad = enc.filter(
      size(col("codes")) =!= 64 ||
        exists(col("codes"), c => c < 0 || c > 255)).count()
    assert(bad === 0)
    val enc2 = SqIndex.encode(emb, b)
    assert(enc.exceptAll(enc2).count() === 0)
  }

  test("SQ8 reconstruction error is bounded by half a quantization step") {
    GraftExtensions.register(spark)
    val b = SqIndex.train(emb)
    val rec = SqIndex.reconstruct(SqIndex.encode(emb, b), b)
    // per-dim worst |x − x̂| must be ≤ (hi − lo)/255/2 plus float slack:
    // the defining guarantee of a min/max-trained linear quantizer
    val halfStep = b.lo.indices.map(i => (b.hi(i) - b.lo(i)) / 255.0 / 2.0)
    val worst = emb.select(col("vec_id"), col("embedding"))
      .join(rec, "vec_id")
      .select(posexplode(expr(
        "zip_with(embedding, rvec, (x, r) -> abs(CAST(x AS DOUBLE) - CAST(r AS DOUBLE)))"))
        .as(Seq("i", "err")))
      .groupBy(col("i")).agg(max(col("err")).as("worst"))
      .collect().map(r => (r.getInt(0), r.getDouble(1)))
    worst.foreach { case (i, e) =>
      assert(e <= halfStep(i) + 1e-6, s"dim $i: err $e > half-step ${halfStep(i)}")
    }
  }

  test("SQ8 search is partitioning-invariant (integer-micro distances)") {
    GraftExtensions.register(spark)
    val b = SqIndex.train(emb)
    val enc = SqIndex.encode(emb, b)
    val probes = emb.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
    val a = SqIndex.search(b, enc, probes, 5)
    val c = SqIndex.search(b, enc.repartition(13), probes.repartition(7), 5)
    assert(a.exceptAll(c).count() === 0 && c.exceptAll(a).count() === 0)
  }

  // 8 bits per dimension is a FINE quantization (max reconstruction
  // error (hi−lo)/510 per dim), so unlike PQ — whose 16-entry codebooks
  // genuinely blur the near-uniform synthetic corpus — SQ8's distance
  // ordering should essentially agree with the exact one: the true
  // squared-L2 nearest neighbour must stay top-1 under SQ8 for almost
  // every probe. Deterministic pipeline (no RNG) → a stable threshold.
  test("SQ8 search: top-1 matches the exact-L2 top-1 for ≥90% of probes") {
    GraftExtensions.register(spark)
    val b = SqIndex.train(emb)
    val enc = SqIndex.encode(emb, b)
    val probes = emb.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
    val sq1 = SqIndex.search(b, enc, probes, 2)
      .filter(col("probe_id") =!= col("cand_id"))
      .withColumn("r2", row_number().over(
        Window.partitionBy(col("probe_id")).orderBy(col("adist"), col("cand_id"))))
      .filter(col("r2") === 1)
      .select(col("probe_id"), col("cand_id").as("sq_nn"))
    val cands = emb.select(col("vec_id").as("cand_id"), col("embedding").as("ce"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("d2"), col("cand_id"))
    val exact = probes.crossJoin(cands)
      .filter(col("probe_id") =!= col("cand_id"))
      .withColumn("d2",
        expr("graft_fdot(pe, pe) - 2 * graft_fdot(pe, ce) + graft_fdot(ce, ce)"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("probe_id"), col("cand_id").as("true_nn"))
    val n = probes.count().toDouble
    val hits = sq1.join(exact, "probe_id")
      .filter(col("sq_nn") === col("true_nn")).count().toDouble
    assert(hits / n >= 0.9, s"SQ8 top-1 recall ${hits / n} < 0.9 ($hits/$n)")
  }

  test("persisted SQ index round-trips: bounds, codes, and search output") {
    GraftExtensions.register(spark)
    val b = SqIndex.train(emb)
    val enc = SqIndex.encode(emb, b)
    val dir = java.nio.file.Files.createTempDirectory("sqix").toString
    VectorIndex.writeSq(spark, b, enc, dir)
    val (b2, enc2) = VectorIndex.loadSq(spark, dir)
    assert(b2 === b)
    assert(enc.exceptAll(enc2).count() === 0 && enc2.exceptAll(enc).count() === 0)
    val probes = emb.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
    val a = SqIndex.search(b, enc, probes, 3)
    val c = SqIndex.search(b2, enc2, probes, 3)
    assert(a.exceptAll(c).count() === 0 && c.exceptAll(a).count() === 0)
    // frozen-bounds add: a batch encodes exactly as a fresh encode would
    val batch = emb.filter(col("vec_id") % 10 === 0)
    assert(VectorIndex.addSq(b2, batch).exceptAll(SqIndex.encode(batch, b)).count() === 0)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
