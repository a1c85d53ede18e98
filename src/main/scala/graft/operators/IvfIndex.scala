package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.GraftExtensions

/** IVF (inverted-file) approximate nearest neighbour — the coarse-
  * quantizer alternative to random-hyperplane LSH (`q_ann_lsh`): k-means
  * partitions the vector space; probes search only the `nProbe` nearest
  * cells with exact cosine.
  *
  * Scale notes: the index is just a (vec_id, cluster) assignment column —
  * at 100 TB it becomes the partition key of the vector table, so a probe
  * touches nProbe/k of the data (partition pruning does the rest).
  * Training samples the corpus; assignment is one narrow pass. Search is
  * an equi-join on cluster + exact scoring (graft_fdot codegen kernel) +
  * per-probe top-k window.
  *
  * Two quantizer builds:
  *  - [[build]] — MLlib KMeans (k-means||). Its internal RDD shuffle is
  *    Kryo-serialized and on JDK 17 needs the `--add-opens` flags Spark's
  *    launch scripts add; fine under spark-submit/sbt, unavailable under
  *    a bare `java` launcher.
  *  - [[buildLloyd]] — the same Lloyd iteration expressed in DataFrame
  *    ops only (broadcast centroids → codegen distance → argmin window;
  *    posexplode mean update). Deterministic seeded init, no MLlib on the
  *    execution path — this is what the declared q_ann_ivf query uses.
  */
object IvfIndex {

  /** Trained coarse quantizer: cell centroids (tiny, driver-held — k
    * vectors, the size of a dim table) + per-vector cell assignment. */
  final case class Index(centers: Seq[(Int, Array[Float])], assignments: DataFrame)

  /** Scale-adaptive cluster count: k = ceil(n / targetCell), clamped.
    * This is the published SemDeDup prescription — k grows with the
    * corpus so expected cluster size stays ~targetCell and
    * within-cluster pair work is n·targetCell, never n²/k with a frozen
    * k. Integer-exact (no float log), so a SQL oracle recomputes the
    * same k from its own count(*). */
  def adaptiveK(n: Long, targetCell: Long = 64L, minK: Int = 2,
      maxK: Int = 1 << 20): Int =
    math.min(maxK.toLong, math.max(minK.toLong,
      (n + targetCell - 1) / targetCell)).toInt

  /** MLlib k-means|| build (see class doc for the launcher caveat). */
  def build(embeddings: DataFrame, k: Int, seed: Long = 42L,
      maxIter: Int = 20): Index = {
    val vecs = embeddings.withColumn("features",
      array_to_vector(col("embedding")))
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(maxIter).fit(vecs)
    val assigned = model.transform(vecs)
      .select(col("vec_id"), col("embedding"), col("prediction").as("cluster"))
    val centers = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }.toSeq
    Index(centers, assigned)
  }

  /** DataFrame-native Lloyd build: init = the k lowest-vec_id vectors
    * (deterministic), then `iters` rounds of assign (one distributed
    * pass: broadcast k centroids, squared-distance argmin) and update
    * (posexplode → per-(cluster, dim) mean → k·dim-row collect — the only
    * driver data is the centroid table itself). Empty cells keep their
    * previous centroid.
    *
    * The centroid mean is computed EXACTLY — elements quantized to
    * integer micros (floor(x·10⁶ + 0.5)), summed as LONG
    * (order-invariant), one double division at the end,
    * cast to float — so the trained centroids are bit-identical at any
    * partitioning AND reproducible by an engine-portable SQL twin (a
    * plain float `avg` differs in final ulps run to run; the rounding
    * loses ~1e-6 of centroid precision, irrelevant to a coarse
    * quantizer, and buys a hash-checkable assignment — q_ivf_probe_stats'
    * DuckDB oracle replays the whole Lloyd iteration). */
  def buildLloyd(embeddings: DataFrame, k: Int, iters: Int = 5): Index = {
    val spark = embeddings.sparkSession
    GraftExtensions.register(spark)
    val e = embeddings.select(col("vec_id"), col("embedding"))
    var centers: Seq[(Int, Array[Float])] =
      e.orderBy(col("vec_id")).limit(k).collect()
        .zipWithIndex.map { case (r, i) =>
          (i, r.getSeq[Float](1).toArray)
        }.toSeq
    var assigned: DataFrame = null
    var it = 0
    while (it < iters) {
      assigned = assign(spark, e, centers)
      val means = assigned
        .select(col("cluster"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("cluster"), col("pos"))
        .agg(
          // floor(x·10⁶ + 0.5): the JL kernel's half-up micro quantizer —
          // exact LONG sums, no decimal overhead, tie rule identical on
          // both engines (round() would be half-even here, half-away in
          // DuckDB)
          sum(floor(col("v").cast("double") * 1000000 + 0.5).cast("long"))
            .as("micro"),
          count(lit(1)).as("n"))
        .collect()
      val byCluster = means.groupBy(_.getInt(0))
      centers = centers.map { case (c, old) =>
        byCluster.get(c) match {
          case Some(rows) =>
            val arr = new Array[Float](old.length)
            rows.foreach { r =>
              arr(r.getInt(1)) =
                (r.getLong(2).toDouble / 1000000.0 / r.getLong(3).toDouble).toFloat
            }
            (c, arr)
          case None => (c, old) // empty cell: keep previous centroid
        }
      }
      it += 1
    }
    Index(centers, assign(spark, e, centers))
  }

  /** One assignment pass: nearest centroid by squared euclidean distance
    * (‖c‖² − 2c·x tie-broken by cluster id; ‖x‖² is constant per row).
    * argmin is a `min_by` HASH AGGREGATE over the k-way cross join — a
    * partial-aggregating, sort-free shape (a per-vec_id window would
    * exchange + sort n·k rows every Lloyd round). */
  private def assign(spark: SparkSession, e: DataFrame,
      centers: Seq[(Int, Array[Float])]): DataFrame = {
    val cents = centersDf(spark, centers)
    e.crossJoin(broadcast(cents))
      .withColumn("dist",
        expr("graft_fdot(centroid, centroid)") -
          lit(2.0) * expr("graft_fdot(embedding, centroid)"))
      .groupBy(col("vec_id"))
      .agg(
        min_by(col("cluster"), struct(col("dist"), col("cluster"))).as("cluster"),
        first(col("embedding")).as("embedding"))
      .select(col("vec_id"), col("embedding"), col("cluster"))
  }

  /** Assignment of a (vec_id, embedding) batch against a FROZEN center
    * set — the index `add` path (FAISS `IndexIVF.add` semantics: the
    * quantizer does not retrain on ingest). Same argmin + tie-break as
    * the in-build assignment, so an added vector lands exactly where a
    * from-scratch assignment against the same centroids would put it. */
  def assignFrozen(e: DataFrame,
      centers: Seq[(Int, Array[Float])]): DataFrame =
    assign(e.sparkSession, e.select(col("vec_id"), col("embedding")), centers)

  private[operators] def centersDf(spark: SparkSession,
      centers: Seq[(Int, Array[Float])]): DataFrame = {
    import spark.implicits._
    centers.map { case (i, a) => (i, a.toSeq) }.toDF("cluster", "centroid")
      .select(col("cluster"), col("centroid").cast("array<float>").as("centroid"))
  }

  /** Nearest `nProbe` cells per probe vector (tiny centroid table —
    * computed via a broadcast cross join). Keeps the cell rank
    * (`cell_rnk`) for consumers that report the probe funnel. */
  private def probeCells(spark: SparkSession, index: Index, probes: DataFrame,
      nProbe: Int): DataFrame = {
    val w = Window.partitionBy(col("probe_id")).orderBy(col("dist"), col("cluster"))
    probes.crossJoin(broadcast(centersDf(spark, index.centers)))
      .withColumn("dist",
        -expr("graft_fdot(pe, centroid)")) // cosine-normalized corpus → max dot
      .withColumn("cell_rnk", row_number().over(w))
      .filter(col("cell_rnk") <= nProbe)
      .select(col("probe_id"), col("cluster"), col("cell_rnk"))
  }

  /** Auxiliary oracle-checkable projection of the search funnel: for each
    * probe, the probed cells in rank order plus each cell's member count.
    * Every input is deterministic (seeded init, exact centroid means, the
    * portable graft_fdot fold), so a SQL twin replaying the Lloyd rounds
    * reproduces it bit for bit — the hash anchor for the otherwise
    * rows-only k-means family. */
  def probeStats(index: Index, probes: DataFrame, nProbe: Int): DataFrame = {
    val spark = probes.sparkSession
    GraftExtensions.register(spark)
    val hist = index.assignments.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"))
    probeCells(spark, index, probes, nProbe)
      .join(broadcast(hist), Seq("cluster"), "left")
      .select(col("probe_id"), col("cell_rnk"), col("cluster"),
        coalesce(col("n_members"), lit(0L)).as("n_members"))
  }

  /** Exact top-k within the probed cells. Norms are computed once per row
    * (probe and candidate sides), never inside the pair loop. */
  def search(index: Index, probes: DataFrame, topK: Int,
      nProbe: Int): DataFrame = {
    val spark = probes.sparkSession
    GraftExtensions.register(spark)
    val cells = probeCells(spark, index, probes, nProbe)
      .select(col("probe_id"), col("cluster"))
    val probesN = probes.withColumn("pnorm", sqrt(expr("graft_fdot(pe, pe)")))
    val cands = index.assignments.select(
      col("vec_id").as("cand_id"), col("embedding").as("ce"), col("cluster"))
      .withColumn("cnorm", sqrt(expr("graft_fdot(ce, ce)")))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("cand_id"))
    probesN.join(cells, "probe_id")
      .join(cands, "cluster")
      .filter(col("probe_id") =!= col("cand_id"))
      .withColumn("sim", expr("graft_fdot(pe, ce)") / (col("pnorm") * col("cnorm")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("probe_id"), col("cand_id"), col("sim"), col("rnk"))
  }
}
