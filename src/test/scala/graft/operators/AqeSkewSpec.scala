package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** AQE skew-join handling — the runtime half of the skew story next to
  * the explicit salting operator (SkewJoin): Spark's adaptive execution
  * detects an oversized shuffle partition at runtime and splits it into
  * multiple tasks, which is what keeps one hot key from serializing a
  * 1000-executor join. The spec forces cluster-tuned thresholds down so
  * the mechanism itself is pinned on local data.
  */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed shuffle partition (skew=true in the final plan)") {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set(keys(0), "true")
      conf.set(keys(1), "true")
      conf.set(keys(2), "1.0")
      conf.set(keys(3), "16KB")
      conf.set(keys(4), "8KB")
      conf.set(keys(5), "false")
      conf.set(keys(6), "-1") // no broadcast: force the shuffle join
      // one hot key (0) carrying ~99% of the left side
      val left = spark.range(0, 200000)
        .select(when(col("id") % 100 =!= 0, lit(0L)).otherwise(col("id"))
          .as("k"), col("id").as("v"))
      val right = spark.range(0, 2000)
        .select((col("id") % 500).as("k"), col("id").as("w"))
      // a GLOBAL aggregate consumes the join: a groupBy on the join key
      // would impose a distribution requirement that forbids splitting
      // the skewed partition (the split breaks hash-partitioning)
      val j = left.join(right, "k").agg(sum(col("v") + col("w")).as("s"))
      // run THIS dataframe's own query execution (count() would plan a
      // separate job and leave j's adaptive plan unexecuted)
      assert(j.collect().nonEmpty)
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), s"AQE did not mark the skew join:\n$p")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }
}
