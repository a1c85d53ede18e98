package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sampled equi-depth range bucketing — the scale-correct replacement for
  * fixed-width buckets (`floor(x / 1000)`) in the distributed prefix-sum
  * pattern (q_ks_test, q_spearman and any two-pass cumulative sum).
  *
  * Fixed-width buckets serialize under skew: if most rows share a narrow
  * value range they land in a handful of buckets and the per-bucket local
  * window degrades toward a single-task sort. Equi-depth boundaries keep
  * each bucket at ~n/nb rows regardless of the distribution.
  *
  * Everything stays in ONE lazy DAG — no driver-side action: a seeded
  * sample feeds a `percentile_approx` sketch (distributed, mergeable),
  * the one-row boundary ARRAY broadcasts in a single-row cross join, and
  * each row picks its bucket with the codegen'd `graft_bucket` binary
  * search (⌈log₂ nb⌉ comparisons/row — expressions.BucketBinarySearch).
  * An earlier driver-side `approxQuantile` variant cost a full extra
  * pass per query build, and the round-4 form ran a broadcast
  * nested-loop RANGE join against ~65 exploded (bucket, lo, hi)
  * interval rows — nb comparisons per row in the hot scan;
  * RangeBucketsSpec pins bit-parity between that join formulation and
  * the binary search on skewed/duplicate-boundary data.
  *
  * Correctness is boundary-independent: the bucket index is monotone in
  * the value and the intervals partition (−∞, +∞), so (bucket,
  * within-bucket order) decompositions reproduce the exact global order
  * whatever the sample returned — approximation error moves work between
  * buckets, never the answer. Duplicate boundaries (heavy skew) yield
  * empty [b, b) intervals that simply never match.
  */
object RangeBuckets {

  /** `df` plus a `bucketCol` LONG column: ~`nb` equi-depth buckets of
    * `valueCol`, boundaries sampled at `frac` with a fixed seed. */
  def withEquiDepthBucket(df: DataFrame, valueCol: String, bucketCol: String,
      nb: Int = 64, frac: Double = 0.05): DataFrame =
    withEquiDepthBucketFrom(df, df, valueCol, bucketCol, nb, frac)

  /** [[withEquiDepthBucket]] with an explicit boundary SOURCE frame: when
    * `df` is itself derived (e.g. an aggregation), sketching boundaries
    * from the cheaper upstream frame (a raw single-column scan) avoids
    * recomputing the derivation inside the sketch branch. Correctness is
    * boundary-independent (object doc), so any distribution-representative
    * source yields the same final answers — only bucket balance shifts. */
  def withEquiDepthBucketFrom(boundSrc: DataFrame, df: DataFrame,
      valueCol: String, bucketCol: String,
      nb: Int = 64, frac: Double = 0.05): DataFrame = {
    val probs = array((1 until nb).map(i => lit(i.toDouble / nb)): _*)
    // coalesce: an empty/too-small sample makes percentile_approx NULL,
    // which would null the sequence and silently drop EVERY row — the
    // empty boundary set instead degrades to one (−∞, ∞) bucket
    graft.expressions.GraftExtensions.register(df.sparkSession)
    val bs = boundSrc.sample(frac, 42L)
      .agg(coalesce(percentile_approx(col(valueCol), probs, lit(100)),
        expr("CAST(array() AS ARRAY<DOUBLE>)")).as("__bs"))
    // filter mirrors the former inner range join's null-row drop
    df.filter(col(valueCol).isNotNull)
      .crossJoin(broadcast(bs))
      .withColumn(bucketCol,
        expr(s"graft_bucket(CAST(`$valueCol` AS DOUBLE), __bs)"))
      .drop("__bs")
  }
}
