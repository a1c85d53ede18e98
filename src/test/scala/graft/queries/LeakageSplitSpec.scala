package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contract of the cluster-aware split: near-duplicate documents can
  * NEVER straddle train/val/test (that's the leakage the operator
  * exists to prevent), the buckets are deterministic, and the ratios
  * land near 80/10/10. */
class LeakageSplitSpec extends SparkSpec {

  test("q_leakage_split: zero leaky clusters, all splits populated, ~80/10/10") {
    val out = graft.SparkEntry.queries("q_leakage_split")(spark, sf("sf0.001"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out.keySet === Set("train", "val", "test"))
    // the whole point: no near-dup cluster straddles two splits
    out.values.foreach { case (_, _, leaky) => assert(leaky === 0L) }
    val total = out.values.map(_._1).sum.toDouble
    val trainFrac = out("train")._1 / total
    assert(trainFrac > 0.7 && trainFrac < 0.9,
      s"train fraction $trainFrac far from 0.8")
    // every doc lands in exactly one split
    val docs = graft.Tables(spark, sf("sf0.001"), "documents").count()
    assert(out.values.map(_._1).sum === docs)
  }

  test("q_leakage_split is deterministic across runs") {
    val a = graft.SparkEntry.queries("q_leakage_split")(spark, sf("sf0.001"))
      .collect().toSeq
    val b = graft.SparkEntry.queries("q_leakage_split")(spark, sf("sf0.001"))
      .collect().toSeq
    assert(a === b)
  }

  test("near-dup pairs share a split end to end (member level)") {
    // Recompute the PER-DOC assignment exactly the way the query does
    // (cluster_id = coalesce(component, doc_id) → hash bucket → split),
    // with membership taken from q_dedup_components — then check it two
    // ways. The pre-round-7 form derived the bucket from component_id
    // and grouped by component_id, which made countDistinct(bucket)=1
    // true by construction; this version drills to members and ties the
    // recomputation back to the query's published aggregates.
    val dir = sf("sf0.001")
    val docs = graft.Tables(spark, dir, "documents").select(col("doc_id"))
    val comp = graft.SparkEntry.queries("q_dedup_components")(spark, dir)
    val assignDoc = docs.join(comp, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("component_id"), col("doc_id")))
      .withColumn("bucket",
        expr("cluster_id % 1000000007 * 2654435761 % 1000000007 % 10"))
      .withColumn("split",
        when(col("bucket") < 8, lit("train"))
          .when(col("bucket") === 8, lit("val"))
          .otherwise(lit("test")))
    // 1. member level: no multi-member component sees >1 split label
    val straddle = assignDoc.filter(col("component_id").isNotNull)
      .groupBy(col("component_id"))
      .agg(countDistinct(col("split")).as("ns"))
      .filter(col("ns") > 1)
    assert(straddle.isEmpty)
    // 2. the recomputed member-level assignment aggregates to EXACTLY
    //    the query's published (split, n_docs, n_clusters) rows — so the
    //    query's internal per-doc assignment is what we recomputed
    val recomputed = assignDoc.groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("cluster_id")).as("n_clusters"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val published = graft.SparkEntry.queries("q_leakage_split")(spark, dir)
      .select(col("split"), col("n_docs"), col("n_clusters"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(recomputed === published)
  }
}
