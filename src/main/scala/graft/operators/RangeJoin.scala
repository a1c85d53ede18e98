package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join: match fact rows whose point `p` falls inside
  * interval rows' `[lo, hi]`.
  *
  * Spark plans a raw `p BETWEEN lo AND hi` join as BroadcastNestedLoop
  * (dim-sized intervals) or a cartesian product (fact-sized intervals) —
  * the latter is the scale-killer. [[bucketed]] makes it an EQUI-join:
  * each interval explodes into the fixed-width buckets it overlaps, the
  * fact row computes its single bucket, the join runs hash-partitioned on
  * the bucket key, and the exact containment predicate filters within
  * buckets. Cost is |facts| + Σ interval spans/width joined rows — linear,
  * shuffle on a high-cardinality key, skew-safe for bounded interval
  * length. Pick `bucketWidth` ≈ the typical interval length so each
  * interval lands in O(1) buckets.
  */
object RangeJoin {

  /** Scale path: bucketed equi-join. `point`/`lo`/`hi` must be numeric
    * (days, epoch seconds, …); inclusive on both ends like SQL BETWEEN. */
  def bucketed(facts: DataFrame, intervals: DataFrame,
      point: Column, lo: Column, hi: Column,
      bucketWidth: Long): DataFrame = {
    val f = facts.withColumn("__bucket", floor(point / bucketWidth).cast("long"))
    val iv = intervals
      .withColumn("__bucket",
        explode(sequence(floor(lo / bucketWidth).cast("long"),
          floor(hi / bucketWidth).cast("long"))))
    f.join(iv, Seq("__bucket"))
      .filter(point >= lo && point <= hi)
      .drop("__bucket")
  }

  /** Dim path: broadcast nested loop with the pushed range predicate —
    * correct and fine when `intervals` is broadcast-sized. */
  def broadcastRange(facts: DataFrame, intervals: DataFrame,
      point: Column, lo: Column, hi: Column): DataFrame =
    facts.join(broadcast(intervals), point >= lo && point <= hi)
}
