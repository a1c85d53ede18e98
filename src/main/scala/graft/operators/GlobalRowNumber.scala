package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contiguous global row numbers in a total order WITHOUT a single-task
  * global sort — the scale-correct form of zipWithIndex / monotonic ID
  * assignment. A plain `row_number() OVER (ORDER BY ...)` funnels the
  * whole dataset through ONE task; at 100 TB that is the job that never
  * finishes.
  *
  * Decomposition (the q_spearman / q_ks_test prefix-sum pattern, made a
  * first-class operator): sampled equi-depth buckets over the sort value
  * ([[RangeBuckets]]) split the data into ~nb ≈-equal ranges; the bucket
  * COUNT table (nb rows) prefix-sums into per-bucket offsets; a
  * bucket-local window adds the within-bucket rank. rn = offset + local
  * rank reproduces the exact global order because the bucket index is
  * monotone in the value — boundary approximation moves work between
  * buckets, never the answer.
  *
  * `tieBreak` columns must make (value, tieBreak...) unique for the
  * numbering to be deterministic.
  *
  * Size `nb` to the data: each bucket sorts ~n/nb rows in one task, so
  * pick nb ≈ n / (rows that sort comfortably per task) — the same knob
  * as shuffle partitions. Buckets are sampled equi-depth, so skew does
  * not concentrate them.
  */
object GlobalRowNumber {

  def withRowNumber(df: DataFrame, valueCol: String, rnCol: String,
      tieBreak: Seq[String], nb: Int = 64): DataFrame = {
    val bucketed = RangeBuckets.withEquiDepthBucket(df, valueCol, "__bucket", nb)
    val wOff = Window.orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // nb rows: the only global window in the plan runs over the bucket
    // count table, never the data
    val offsets = bucketed.groupBy(col("__bucket"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum(col("__cnt")).over(wOff), lit(0L)))
      .select(col("__bucket"), col("__off"))
    val wLoc = Window.partitionBy(col("__bucket"))
      .orderBy(col(valueCol) +: tieBreak.map(col): _*)
    bucketed.join(broadcast(offsets), "__bucket")
      .withColumn(rnCol, col("__off") + row_number().over(wLoc))
      .drop("__bucket", "__off")
  }

  /** Per-key generalization of [[withRowNumber]] — the exact value of
    * `row_number() OVER (PARTITION BY keys ORDER BY value, tieBreak)`
    * WITHOUT a per-key window over the data rows. A low-cardinality
    * partition key (language, domain, market segment) makes the plain
    * window a handful of giant tasks: at 100 TB a dominant language is
    * ONE 20+ TB sort task. Here the same sampled equi-depth buckets
    * split every key's rows across ~nb tasks: the bucket index is
    * monotone in the value WITHIN ANY KEY, so per-(key, bucket) local
    * windows plus a per-key prefix sum over the (key, bucket) COUNT
    * table (|keys|·nb rows — the only per-key window in the plan)
    * reproduce the exact per-key rank. First built inline for CCNet
    * perplexity buckets (q_ppl_buckets); promoted to an operator so
    * every per-key-rank consumer shares one audited decomposition.
    *
    * The bucketed frame feeds both the count table and the final rank
    * join WITHOUT a checkpoint: the seeded boundary sample is
    * deterministic over a deterministic input partitioning, so both
    * branches compute identical buckets (same guarantee the global
    * [[withRowNumber]] has relied on since round 4). Callers whose `df`
    * is an expensive derivation should checkpoint it themselves before
    * calling — that is a recompute-cost decision, not a correctness one.
    *
    * `tieBreak` must make (value, tieBreak...) unique within a key for
    * the numbering to be deterministic.
    *
    * `descending = true` ranks by `valueCol` DESC (ties still ascending
    * on `tieBreak`) — the `ORDER BY v DESC, id` shape of keep-the-best
    * capping (domain caps, quality top-k per key). Implemented by
    * negating the value into a scratch column, so it requires a numeric
    * `valueCol`; the bucket boundaries are sampled on the negated value
    * and stay equi-depth.
    */
  def withKeyedRowNumber(df: DataFrame, keys: Seq[String], valueCol: String,
      rnCol: String, tieBreak: Seq[String], nb: Int = 64,
      descending: Boolean = false): DataFrame = {
    if (descending) {
      val negged = df.withColumn("__negv", negate(col(valueCol)))
      return withKeyedRowNumber(negged, keys, "__negv", rnCol, tieBreak, nb)
        .drop("__negv")
    }
    val bucketed = RangeBuckets
      .withEquiDepthBucket(df, valueCol, "__bucket", nb)
    val keyCols = keys.map(col)
    val wOff = Window.partitionBy(keyCols: _*).orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed
      .groupBy(keyCols :+ col("__bucket"): _*)
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum(col("__cnt")).over(wOff), lit(0L)))
      .select(keyCols :+ col("__bucket") :+ col("__off"): _*)
    val wLoc = Window.partitionBy(keyCols :+ col("__bucket"): _*)
      .orderBy(col(valueCol) +: tieBreak.map(col): _*)
    bucketed.join(broadcast(offsets), keys :+ "__bucket")
      .withColumn(rnCol, col("__off") + row_number().over(wLoc))
      .drop("__bucket", "__off")
  }
}
