package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.GraftExtensions

/** Scalar quantization (SQ8) — the per-DIMENSION compression member of
  * the ANN family, sitting between brute force (full floats) and PQ
  * (`PqIndex`, per-SUBSPACE codebooks): each dimension linearly maps to
  * an 8-bit code against trained per-dim [lo, hi] bounds, so a 64-dim
  * float vector compresses 4× to 64 bytes with no codebook training —
  * FAISS `IndexScalarQuantizer(QT_8bit)` semantics.
  *
  * Search is reconstruct-and-score: a candidate's codes decode to the
  * bound-snapped float vector once (map-only, broadcast bounds), and the
  * probe's exact squared-L2 against the RECONSTRUCTION ranks candidates.
  * Unlike PQ's ADC there is no per-probe table — the whole per-pair cost
  * is one `graft_fdot` over the reconstruction, and the corpus float
  * column is never read at query time.
  *
  * Scale notes: bounds are 2·dim floats — driver-bounded at any corpus
  * size (the centroid-collect class). Train is one posexplode + min/max
  * aggregation (map-side partial, dim-keyed — never wider than dim
  * rows). Encode/decode are map-only with the bounds as broadcast
  * literals. Search crosses the FIXED probe set (workload-sized,
  * broadcast) against the code scan and keeps per-pair state to one
  * integer — the same fixed-probe-universe discipline as q_ann_pq.
  *
  * Engine-portability: codes and reconstructions are computed in DOUBLE
  * with the half-up `floor(x + 0.5)` rule and a final CAST to FLOAT /
  * INT — every step is IEEE-exact and replayed bit-for-bit by the
  * DuckDB oracle (SimilarityQueries.sqDuck); per-pair distances quantize
  * to integer micros BEFORE ranking, so order and ties are partition-
  * and engine-invariant.
  */
object SqIndex {

  /** Per-dimension quantization bounds; 2·dim floats, driver-tiny. */
  final case class Bounds(lo: Seq[Float], hi: Seq[Float]) {
    require(lo.size == hi.size, s"bounds dim mismatch: ${lo.size} vs ${hi.size}")
    def dim: Int = lo.size
  }

  /** Train = per-dim min/max over the corpus. One narrow aggregation
    * (posexplode → dim-keyed min/max, map-side partials); the collect is
    * dim rows — bounded at any corpus size. */
  def train(embeddings: DataFrame): Bounds = {
    val rows = embeddings
      .select(posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy(col("i"))
      .agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
      .orderBy(col("i"))
      .collect()
    Bounds(rows.map(_.getFloat(1)).toIndexedSeq, rows.map(_.getFloat(2)).toIndexedSeq)
  }

  private def withBounds(df: DataFrame, b: Bounds): DataFrame =
    df.withColumn("__lo", typedLit(b.lo)).withColumn("__hi", typedLit(b.hi))

  /** code_i = round(255 · (x_i − lo_i) / (hi_i − lo_i)) clamped to
    * [0, 255], in DOUBLE with half-up floor; degenerate dims
    * (hi ≤ lo) code to 0. */
  private val encodeSql: String =
    "transform(embedding, (x, i) -> CASE " +
      "WHEN element_at(__hi, i + 1) <= element_at(__lo, i + 1) THEN 0 " +
      "ELSE CAST(least(255.0, greatest(0.0, floor(" +
      "(CAST(x AS DOUBLE) - CAST(element_at(__lo, i + 1) AS DOUBLE)) / " +
      "(CAST(element_at(__hi, i + 1) AS DOUBLE) - CAST(element_at(__lo, i + 1) AS DOUBLE)) " +
      "* 255.0 + 0.5))) AS INT) END)"

  /** x̂_i = lo_i + code_i/255 · (hi_i − lo_i), computed in DOUBLE and
    * cast once to FLOAT (the stored precision of the index). */
  private val decodeSql: String =
    "transform(codes, (q, i) -> CAST(" +
      "CAST(element_at(__lo, i + 1) AS DOUBLE) + CAST(q AS DOUBLE) / 255.0 * " +
      "(CAST(element_at(__hi, i + 1) AS DOUBLE) - CAST(element_at(__lo, i + 1) AS DOUBLE)) " +
      "AS FLOAT))"

  /** Encode the corpus: (vec_id, codes ARRAY<INT>), map-only. */
  def encode(embeddings: DataFrame, b: Bounds): DataFrame =
    withBounds(embeddings, b)
      .select(col("vec_id"), expr(encodeSql).as("codes"))

  /** Decode codes back to the snapped float vectors: (vec_id, rvec). */
  def reconstruct(codes: DataFrame, b: Bounds): DataFrame =
    withBounds(codes, b)
      .select(col("vec_id"), expr(decodeSql).as("rvec"))

  /** Top-k by squared-L2 between the probe and each candidate's
    * RECONSTRUCTION: ‖p‖² − 2·p·x̂ + ‖x̂‖², all three terms the portable
    * graft_fdot double fold, quantized to integer micros per pair before
    * the (dist, cand_id) rank — one scalar of per-pair state, bit-stable
    * under any partitioning. Probes broadcast (fixed workload-sized
    * set); self-matches are not filtered — callers drop
    * probe_id == cand_id if unwanted. */
  def search(b: Bounds, codes: DataFrame, probes: DataFrame,
      topK: Int): DataFrame = {
    val spark = probes.sparkSession
    GraftExtensions.register(spark)
    val rec = reconstruct(codes, b)
      .select(col("vec_id").as("cand_id"), col("rvec"),
        expr("graft_fdot(rvec, rvec)").as("rn2"))
    val p = probes.select(col("probe_id"), col("pe"),
      expr("graft_fdot(pe, pe)").as("pn2"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("dist_micro"), col("cand_id"))
    rec.crossJoin(broadcast(p))
      .select(col("probe_id"), col("cand_id"),
        floor((col("pn2") - lit(2.0) * expr("graft_fdot(pe, rvec)") +
          col("rn2")) * 1000000 + 0.5).cast("long").as("dist_micro"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("probe_id"), col("cand_id"),
        (col("dist_micro").cast("double") / 1000000.0).as("adist"), col("rnk"))
  }

  /** Encode a batch against the frozen bounds (SQ `add` — FAISS
    * IndexScalarQuantizer.add semantics: bounds never retrain). */
  def add(b: Bounds, batch: DataFrame): DataFrame = encode(batch, b)
}
