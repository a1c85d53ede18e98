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

  test("near-dup pairs share a split end to end") {
    // reconstruct the assignment at doc level: components + hash buckets
    // (the declared query outputs aggregates; this drills to members)
    val comp = graft.SparkEntry.queries("q_dedup_components")(spark, sf("sf0.001"))
    val bucketed = comp
      .withColumn("bucket",
        expr("component_id % 1000000007 * 2654435761 % 1000000007 % 10"))
    // every member of a component gets the same bucket ⇒ same split
    val distinctBuckets = bucketed.groupBy(col("component_id"))
      .agg(countDistinct(col("bucket")).as("nb"))
      .filter(col("nb") > 1)
    assert(distinctBuckets.isEmpty)
  }
}
