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
  * the ~nb boundary values explode into (bucket, lo, hi) interval rows,
  * and the big frame picks its bucket via a BROADCAST range join (65
  * tiny rows, codegen'd comparisons — no per-row lambda, no extra job).
  * An earlier driver-side `approxQuantile` variant cost a full extra
  * pass per query build; this formulation benches at parity with the
  * fixed-width form it replaces.
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
    val bs = boundSrc.sample(frac, 42L)
      .agg(coalesce(percentile_approx(col(valueCol), probs, lit(100)),
        expr("CAST(array() AS ARRAY<DOUBLE>)")).as("bs"))
    val bounds = bs.select(explode(expr(
      "transform(sequence(0, size(bs)), i -> struct(CAST(i AS BIGINT) AS bucket, " +
        "IF(i = 0, CAST('-Infinity' AS DOUBLE), element_at(bs, i)) AS lo, " +
        "IF(i = size(bs), CAST('Infinity' AS DOUBLE), element_at(bs, i + 1)) AS hi))")
      ).as("b"))
      .select(col("b.bucket").as(bucketCol), col("b.lo").as("__lo"), col("b.hi").as("__hi"))
    df.join(broadcast(bounds),
        col(valueCol) >= col("__lo") && col(valueCol) < col("__hi"))
      .drop("__lo", "__hi")
  }
}
