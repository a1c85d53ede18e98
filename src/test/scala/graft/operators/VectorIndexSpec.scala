package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.expressions.GraftExtensions

/** The persisted vector index: parquet round trip preserves the trained
  * quantizer bit for bit, ensure* serves the read-back (not a rebuild),
  * and the frozen-quantizer add contract — an added vector lands in
  * exactly the cell a from-scratch assignment against the same centroids
  * gives it. (Cross-engine, q_ann_index_update's DuckDB oracle re-proves
  * the add contract at every SF.) */
class VectorIndexSpec extends SparkSpec {

  private def embeddings = Tables(spark, sf("sf0.001"), "embeddings")

  test("IVF parquet round trip: centroids bit-exact, assignments set-equal") {
    GraftExtensions.register(spark)
    val built = IvfIndex.buildLloyd(embeddings, k = 4, iters = 2)
    val dir = Files.createTempDirectory("vix-ivf").toString
    VectorIndex.writeIvf(built, dir)
    val loaded = VectorIndex.loadIvf(spark, dir)
    assert(loaded.centers.map(_._1) === built.centers.map(_._1))
    loaded.centers.zip(built.centers).foreach { case ((_, a), (_, b)) =>
      assert(a.toSeq === b.toSeq) // float bits survive parquet
    }
    val l = loaded.assignments.select("vec_id", "cluster").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val b = built.assignments.select("vec_id", "cluster").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(l === b)
  }

  test("PQ parquet round trip: codebooks and codes survive, m/sub re-derived") {
    GraftExtensions.register(spark)
    val cb = PqIndex.train(embeddings, m = 4, k = 8, iters = 2)
    val codes = PqIndex.encode(embeddings, cb)
    val dir = Files.createTempDirectory("vix-pq").toString
    VectorIndex.writePq(cb, codes, dir)
    val (cb2, codes2) = VectorIndex.loadPq(spark, dir)
    assert(cb2.m === cb.m && cb2.sub === cb.sub)
    cb2.books.zip(cb.books).foreach { case ((s2, c2), (s1, c1)) =>
      assert(s2 === s1)
      c2.zip(c1).foreach { case ((k2, a2), (k1, a1)) =>
        assert(k2 === k1 && a2.toSeq === a1.toSeq)
      }
    }
    val m1 = codes.collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toMap
    val m2 = codes2.collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toMap
    assert(m1 === m2)
  }

  test("ensureIvf builds once per key and serves identical read-backs") {
    GraftExtensions.register(spark)
    var builds = 0
    def build = { builds += 1; IvfIndex.buildLloyd(embeddings, k = 4, iters = 2) }
    val key = s"spec#${System.nanoTime()}"
    val a = VectorIndex.ensureIvf(spark, key, build)
    val b = VectorIndex.ensureIvf(spark, key, build)
    assert(builds === 1)
    assert(a.centers.map(_._2.toSeq) === b.centers.map(_._2.toSeq))
    assert(b.assignments.count() === embeddings.count())
  }

  test("addIvf: frozen-quantizer assignment, extended index covers base ∪ batch") {
    GraftExtensions.register(spark)
    val e = embeddings
    val base = e.filter(col("vec_id") % 10 =!= 0)
    val batch = e.filter(col("vec_id") % 10 === 0)
    val ix = {
      val dir = Files.createTempDirectory("vix-add").toString
      VectorIndex.writeIvf(IvfIndex.buildLloyd(base, k = 4, iters = 2), dir)
      VectorIndex.loadIvf(spark, dir)
    }
    val centersBefore = ix.centers.map { case (i, a) => (i, a.toSeq) }
    val added = VectorIndex.addIvf(spark, ix, batch)
    val ext = VectorIndex.extendIvf(ix, added)
    // centroids untouched by the add
    assert(ext.centers.map { case (i, a) => (i, a.toSeq) } === centersBefore)
    // every vector covered exactly once
    assert(ext.assignments.count() === e.count())
    assert(ext.assignments.select("vec_id").distinct().count() === e.count())
    // add ≡ from-scratch assignment against the same frozen centroids
    val fresh = IvfIndex.assignFrozen(batch, ix.centers)
      .select("vec_id", "cluster").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    added.select("vec_id", "cluster").collect().foreach { r =>
      assert(fresh(r.getLong(0)) === r.getInt(1))
    }
    // search over the extended index can surface batch vectors
    val probes = batch.limit(3)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
    val hits = IvfIndex.search(ext, probes, topK = 5, nProbe = 4).collect()
    assert(hits.nonEmpty)
  }
}
