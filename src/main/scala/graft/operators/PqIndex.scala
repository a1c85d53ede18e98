package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.GraftExtensions

/** Product quantization (PQ) — the compression-based ANN path next to the
  * coarse-quantizer IVF (`IvfIndex`) and hyperplane LSH (`q_ann_lsh`):
  * the vector splits into `m` subvectors, each subspace trains its own
  * tiny k-means codebook, and a vector compresses to `m` small codes
  * (4×16 codes = 4 bytes for a 64-dim float vector, a 64× compression).
  *
  * Search is asymmetric distance computation (ADC): the probe computes a
  * (m × k) distance table against the codebooks — probe-side only, tiny,
  * broadcast — and a candidate's approximate distance is just `m` table
  * lookups summed. No float vector math ever runs per (probe, candidate)
  * pair.
  *
  * Scale notes: codebooks are m·k subvectors (driver-tiny at any corpus
  * size); encoding is m broadcast-assign passes over the corpus (narrow,
  * linear); search shuffles only (probe_id, cand_id, partial-dist) rows
  * after a map-side broadcast join — the corpus embedding column itself
  * is never read at query time, which is the point: at 100 TB the float
  * vectors stay cold while the 4-byte codes serve candidates.
  */
object PqIndex {

  /** Per-subspace codebooks: (subspace, centers(code, subvector)). */
  final case class Codebooks(m: Int, sub: Int,
      books: Seq[(Int, Seq[(Int, Array[Float])])])

  /** Train one codebook per subspace with the DataFrame-native Lloyd
    * build (deterministic init — see IvfIndex.buildLloyd). The m
    * subproblems are INDEPENDENT, so they submit concurrently — Spark's
    * scheduler interleaves the per-round jobs across the executor pool
    * instead of running m Lloyd loops back to back (the driver loop, not
    * the cluster, was the bottleneck: each round is a small job plus a
    * k·dim collect). Results assemble in subspace order, so the
    * codebooks are identical to the sequential build's. */
  def train(embeddings: DataFrame, m: Int = 4, k: Int = 16,
      iters: Int = 3): Codebooks = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val dim = embeddings.select(size(col("embedding")).as("d")).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m
    val books = Await.result(Future.sequence((0 until m).map { s =>
      Future {
        val subv = embeddings.select(col("vec_id"),
          expr(s"slice(embedding, ${s * sub + 1}, $sub)").as("embedding"))
        (s, IvfIndex.buildLloyd(subv, k, iters).centers)
      }
    }), Duration.Inf).toSeq
    Codebooks(m, sub, books)
  }

  /** All codebook entries as a broadcastable frame (s, code, centroid) —
    * also the persisted `codebooks/` layout ([[VectorIndex.writePq]]). */
  private[operators] def entriesDf(spark: SparkSession, cb: Codebooks): DataFrame = {
    import spark.implicits._
    cb.books.flatMap { case (s, centers) =>
      centers.map { case (code, arr) => (s, code, arr.toSeq) }
    }.toDF("s", "code", "centroid")
      .select(col("s"), col("code"),
        col("centroid").cast("array<float>").as("centroid"))
  }

  /** Encode the corpus: per subspace, nearest codebook entry by squared
    * euclidean distance (broadcast cross join + min_by hash agg — the
    * same sort-free argmin shape as IvfIndex.assign), then the m codes
    * assemble into one array column. Output: (vec_id, codes). */
  def encode(embeddings: DataFrame, cb: Codebooks): DataFrame = {
    val spark = embeddings.sparkSession
    GraftExtensions.register(spark)
    val entries = entriesDf(spark, cb)
    val subCodes = embeddings
      .select(col("vec_id"), posexplode(
        expr(s"transform(sequence(0, ${cb.m - 1}), s -> " +
          s"slice(embedding, s * ${cb.sub} + 1, ${cb.sub}))"))
        .as(Seq("s", "sv")))
      .join(broadcast(entries), Seq("s"))
      .withColumn("dist",
        expr("graft_fdot(centroid, centroid)") -
          lit(2.0) * expr("graft_fdot(sv, centroid)"))
      .groupBy(col("vec_id"), col("s"))
      .agg(min_by(col("code"), struct(col("dist"), col("code"))).as("code"))
    subCodes.groupBy(col("vec_id"))
      .agg(array_sort(collect_list(struct(col("s"), col("code")))).as("sc"))
      .select(col("vec_id"),
        expr("transform(sc, x -> x.code)").as("codes"))
  }

  /** Auxiliary oracle-checkable projection of the PQ machinery — the
    * hash anchor symmetric with IvfIndex.probeStats: one row per
    * (subspace, code) carrying the code's corpus membership (from the
    * encode path) and the BIGINT sum over all probes of the exact
    * integer-micro ADC table entry (from the search path). Every input
    * is deterministic — each subspace codebook is the same seeded,
    * integer-exact Lloyd build the DuckDB oracle replays per subspace,
    * encode's argmin tie-break is (dist, code), and the micro
    * quantization happens BEFORE any sum — so a SQL twin reproduces all
    * m·k rows bit for bit, upgrading the PQ path from rows-only to
    * oracle-checked. */
  def codeStats(cb: Codebooks, encoded: DataFrame, probes: DataFrame): DataFrame = {
    val spark = probes.sparkSession
    GraftExtensions.register(spark)
    val entries = entriesDf(spark, cb)
    val members = encoded
      .select(posexplode(col("codes")).as(Seq("s", "code")))
      .groupBy(col("s"), col("code"))
      .agg(count(lit(1)).as("n_members"))
    probes
      .select(col("probe_id"), posexplode(
        expr(s"transform(sequence(0, ${cb.m - 1}), s -> " +
          s"slice(pe, s * ${cb.sub} + 1, ${cb.sub}))"))
        .as(Seq("s", "psv")))
      .join(broadcast(entries), Seq("s"))
      .select(col("s"), col("code"),
        floor((expr("graft_fdot(centroid, centroid)") -
          lit(2.0) * expr("graft_fdot(psv, centroid)")) * 1000000 + 0.5)
          .cast("long").as("pdist_micro"))
      .groupBy(col("s"), col("code"))
      .agg(sum(col("pdist_micro")).as("adc_micro_sum"))
      .join(broadcast(members), Seq("s", "code"), "left")
      .select(col("s"), col("code"),
        coalesce(col("n_members"), lit(0L)).as("n_members"),
        col("adc_micro_sum"))
  }

  /** ADC top-k: probes (probe_id, pe) against the encoded corpus.
    * Probe-side distance tables (probes × m × k rows) broadcast; each
    * candidate contributes m lookup rows; the sum per (probe, candidate)
    * ranks. Distances omit the constant ‖probe_sub‖² terms (rank-
    * invariant per probe). The m partial distances are quantized to
    * integer micros BEFORE the sum (floor(x·10⁶ + 0.5), the engine-
    * portable half-up rule), so the aggregated distance — and therefore
    * the ranking and its ties — is bit-identical at any partitioning
    * (a float sum of the m partials would drift with shuffle order);
    * `adist` is the exact micro sum divided back once. Self-matches are
    * not filtered — callers exclude probe_id == cand_id if unwanted. */
  def search(cb: Codebooks, encoded: DataFrame, probes: DataFrame,
      topK: Int): DataFrame = {
    val spark = probes.sparkSession
    GraftExtensions.register(spark)
    val entries = entriesDf(spark, cb)
    val tab = probes
      .select(col("probe_id"), posexplode(
        expr(s"transform(sequence(0, ${cb.m - 1}), s -> " +
          s"slice(pe, s * ${cb.sub} + 1, ${cb.sub}))"))
        .as(Seq("s", "psv")))
      .join(broadcast(entries), Seq("s"))
      .select(col("probe_id"), col("s"), col("code"),
        floor((expr("graft_fdot(centroid, centroid)") -
          lit(2.0) * expr("graft_fdot(psv, centroid)")) * 1000000 + 0.5)
          .cast("long").as("pdist_micro"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("adist_micro"), col("cand_id"))
    encoded.select(col("vec_id").as("cand_id"),
        posexplode(col("codes")).as(Seq("s", "code")))
      .join(broadcast(tab), Seq("s", "code"))
      .groupBy(col("probe_id"), col("cand_id"))
      .agg(sum(col("pdist_micro")).as("adist_micro"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("probe_id"), col("cand_id"),
        (col("adist_micro").cast("double") / 1000000.0).as("adist"), col("rnk"))
  }
}
