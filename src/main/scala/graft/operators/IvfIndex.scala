package graft.operators

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
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
  */
object IvfIndex {

  final case class Index(model: KMeansModel, assignments: DataFrame)

  /** Train the coarse quantizer and assign every vector to its cell. */
  def build(embeddings: DataFrame, k: Int, seed: Long = 42L): Index = {
    val vecs = embeddings.withColumn("features",
      array_to_vector(col("embedding")))
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(20).fit(vecs)
    val assigned = model.transform(vecs)
      .select(col("vec_id"), col("embedding"), col("prediction").as("cluster"))
    Index(model, assigned)
  }

  /** Nearest `nProbe` cells per probe vector (tiny centroid table —
    * computed via a broadcast cross join). */
  private def probeCells(spark: SparkSession, index: Index, probes: DataFrame,
      nProbe: Int): DataFrame = {
    import spark.implicits._
    val centroids = index.model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }
      .toSeq.toDF("cluster", "centroid")
    val w = Window.partitionBy(col("probe_id")).orderBy(col("dist"), col("cluster"))
    probes.crossJoin(broadcast(centroids))
      .withColumn("dist",
        -expr("graft_fdot(pe, centroid)")) // cosine-normalized corpus → max dot
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= nProbe)
      .select(col("probe_id"), col("cluster"))
  }

  /** Exact top-k within the probed cells. Norms are computed once per row
    * (probe and candidate sides), never inside the pair loop. */
  def search(index: Index, probes: DataFrame, topK: Int,
      nProbe: Int): DataFrame = {
    val spark = probes.sparkSession
    GraftExtensions.register(spark)
    val cells = probeCells(spark, index, probes, nProbe)
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
