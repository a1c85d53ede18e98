package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expressions.GraftExtensions

/** Persisted, incrementally-extendable VECTOR index — the ANN sibling of
  * [[DedupIndex]], giving the IVF coarse quantizer and the PQ codebooks
  * the same production shape the near-dup index already has: built once,
  * persisted as parquet, read back by every consumer, and EXTENDED per
  * ingest batch without retraining.
  *
  * Why this exists: the trained quantizer is a corpus asset, not a
  * per-query throwaway. An [[IvfIndex.buildLloyd]] / [[PqIndex.train]]
  * run is a full multi-pass scan (3 Lloyd rounds × corpus, with a
  * driver-side centroid collect per round) — at 100 TB that is a
  * scheduled maintenance job, never something a search query pays. The
  * persisted artifacts are exactly what a vector store keeps:
  *
  *  - IVF: `centroids/` (cluster, centroid — k rows, driver-tiny) and
  *    `vectors/` (vec_id, embedding, cluster — at scale this is the
  *    vector table itself, PARTITIONED BY cluster so a probe's
  *    nProbe/k cell scan is partition pruning);
  *  - PQ: `codebooks/` (s, code, centroid — m·k rows) and `codes/`
  *    (vec_id, codes — the 4-byte compressed corpus the ADC scan
  *    reads while the float vectors stay cold).
  *
  * Ingest contract ([[addIvf]] / [[addPq]]): new vectors are assigned /
  * encoded against the FROZEN quantizer — FAISS `IndexIVF.add` /
  * `IndexPQ.add` semantics. This is deliberately NOT "add ≡ full
  * retrain": a retrained k-means moves every centroid, so matching a
  * fresh build would require the full multi-pass scan the index exists
  * to avoid (unlike [[DedupIndex.update]], whose min-label components
  * ARE exactly recomputable from the touched clusters alone). What IS
  * exact — and what q_ann_index_update hash-proves cross-engine — is
  * that an added vector lands in precisely the cell a from-scratch
  * assignment against the same centroids would give it, so
  * search-after-add ≡ search-over-rebuilt-with-frozen-quantizer. The
  * standard operational tripwire for quantizer staleness (cell-count
  * drift → schedule a retrain) is a one-line groupBy over `vectors/`.
  *
  * [[ensureIvf]]/[[ensurePq]] are the build-once-per-JVM caches (the
  * [[DedupIndex.ensure]] pattern): first caller for a key trains +
  * persists, every caller — including the builder — consumes the
  * parquet read-back, proving the persisted form is sufficient and
  * pricing consumers at read-back cost, not train cost.
  */
object VectorIndex {

  // ---- persistence root (one shared implementation: FrameCache) ------

  private def ensureDir(key: String)(build: String => Unit): String =
    FrameCache.ensureDir(key)(build)

  // ---- IVF ------------------------------------------------------------

  def writeIvf(ix: IvfIndex.Index, dir: String): Unit = {
    val spark = ix.assignments.sparkSession
    IvfIndex.centersDf(spark, ix.centers)
      .write.mode("overwrite").parquet(s"$dir/centroids")
    ix.assignments.select(col("vec_id"), col("embedding"), col("cluster"))
      .write.mode("overwrite").parquet(s"$dir/vectors")
  }

  /** Read back: centroids collect to the driver (k rows — the quantizer
    * is dim-table-sized by construction), vectors stay a lazy scan. */
  def loadIvf(spark: SparkSession, dir: String): IvfIndex.Index = {
    val centers = spark.read.parquet(s"$dir/centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1).toSeq
    IvfIndex.Index(centers, spark.read.parquet(s"$dir/vectors"))
  }

  /** Build-once-per-JVM persisted IVF index: `build` runs only for the
    * first caller of `key`; everyone consumes the parquet read-back. */
  def ensureIvf(spark: SparkSession, key: String,
      build: => IvfIndex.Index): IvfIndex.Index = {
    val dir = ensureDir(key)(d => writeIvf(build, d))
    loadIvf(spark, dir)
  }

  /** Assign a (vec_id, embedding) batch against the frozen quantizer —
    * one broadcast-join pass over the batch, the corpus never rescans.
    * Returns the batch rows in the `vectors/` schema. */
  def addIvf(spark: SparkSession, ix: IvfIndex.Index,
      batch: DataFrame): DataFrame = {
    GraftExtensions.register(spark)
    IvfIndex.assignFrozen(batch, ix.centers)
      .select(col("vec_id"), col("embedding"), col("cluster"))
  }

  /** The index AFTER an add: same centroids, vectors ∪ batch. */
  def extendIvf(ix: IvfIndex.Index, added: DataFrame): IvfIndex.Index =
    IvfIndex.Index(ix.centers, ix.assignments.unionByName(added))

  // ---- PQ -------------------------------------------------------------

  def writePq(cb: PqIndex.Codebooks, codes: DataFrame, dir: String): Unit = {
    PqIndex.entriesDf(codes.sparkSession, cb)
      .write.mode("overwrite").parquet(s"$dir/codebooks")
    codes.select(col("vec_id"), col("codes"))
      .write.mode("overwrite").parquet(s"$dir/codes")
  }

  /** Read back: codebooks collect to the driver (m·k rows), codes stay
    * a lazy scan. m and sub are re-derived from the frame itself. */
  def loadPq(spark: SparkSession, dir: String): (PqIndex.Codebooks, DataFrame) = {
    val rows = spark.read.parquet(s"$dir/codebooks").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toArray))
    require(rows.nonEmpty, s"empty PQ codebooks under $dir — partial or corrupt index")
    val books = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (s, rs) =>
      (s, rs.sortBy(_._2).map(r => (r._2, r._3)).toSeq)
    }
    val cb = PqIndex.Codebooks(books.size, books.head._2.head._2.length, books)
    (cb, spark.read.parquet(s"$dir/codes"))
  }

  def ensurePq(spark: SparkSession, key: String,
      build: => (PqIndex.Codebooks, DataFrame)): (PqIndex.Codebooks, DataFrame) = {
    val dir = ensureDir(key) { d =>
      val (cb, codes) = build
      writePq(cb, codes, d)
    }
    loadPq(spark, dir)
  }

  /** Encode a batch against the frozen codebooks (PQ `add`). */
  def addPq(cb: PqIndex.Codebooks, batch: DataFrame): DataFrame =
    PqIndex.encode(batch, cb)

  // ---- SQ8 ------------------------------------------------------------

  def writeSq(spark: SparkSession, b: SqIndex.Bounds, codes: DataFrame,
      dir: String): Unit = {
    import spark.implicits._
    b.lo.indices.map(i => (i, b.lo(i), b.hi(i))).toDF("i", "lo", "hi")
      .write.mode("overwrite").parquet(s"$dir/bounds")
    codes.select(col("vec_id"), col("codes"))
      .write.mode("overwrite").parquet(s"$dir/codes")
  }

  /** Read back: bounds collect to the driver (dim rows — 2·dim floats,
    * the quantizer IS the bound table), codes stay a lazy scan. */
  def loadSq(spark: SparkSession, dir: String): (SqIndex.Bounds, DataFrame) = {
    val rows = spark.read.parquet(s"$dir/bounds").collect()
      .map(r => (r.getInt(0), r.getFloat(1), r.getFloat(2))).sortBy(_._1)
    require(rows.nonEmpty, s"empty SQ bounds under $dir — partial or corrupt index")
    val b = SqIndex.Bounds(rows.map(_._2).toIndexedSeq, rows.map(_._3).toIndexedSeq)
    (b, spark.read.parquet(s"$dir/codes"))
  }

  def ensureSq(spark: SparkSession, key: String,
      build: => (SqIndex.Bounds, DataFrame)): (SqIndex.Bounds, DataFrame) = {
    val dir = ensureDir(key) { d =>
      val (b, codes) = build
      writeSq(spark, b, codes, d)
    }
    loadSq(spark, dir)
  }

  /** Encode a batch against the frozen bounds (SQ `add`). */
  def addSq(b: SqIndex.Bounds, batch: DataFrame): DataFrame =
    SqIndex.add(b, batch)
}
