package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Equi-depth bucket properties on a PATHOLOGICALLY skewed column — the
  * case fixed-width buckets serialize on. Correctness must be
  * boundary-independent: the (bucket, within-bucket order) decomposition
  * reproduces the exact global prefix sum whatever the sampled
  * boundaries are, and on skewed data the buckets actually divide the
  * off-mode mass instead of collapsing into one hot bucket.
  */
class RangeBucketsSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows share one value (the skew mode), the rest spread wide
  private lazy val skewed = spark.range(0, 20000).select(
    col("id"),
    when(col("id") % 10 =!= 0, lit(42.0))
      .otherwise((col("id") % 1000).cast("double") * 7.3).as("x"))

  test("bucketed two-pass prefix sum == single-task global prefix sum under skew") {
    val b = RangeBuckets.withEquiDepthBucket(skewed, "x", "bucket")
    // two-pass form (the q_ks_test / q_seq_packing shape)
    val btot = b.groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
    val wOff = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = btot.withColumn("boff", coalesce(sum(col("cnt")).over(wOff), lit(0L)))
      .select(col("bucket"), col("boff"))
    val wLoc = Window.partitionBy(col("bucket")).orderBy(col("x"), col("id"))
    val twoPass = b.join(broadcast(off), Seq("bucket"))
      .withColumn("pos", col("boff") + row_number().over(wLoc))
      .select(col("id"), col("pos"))
    // truth: one global window (single task — fine in a test)
    val wG = Window.orderBy(col("x"), col("id"))
    val global = skewed.withColumn("pos_g", row_number().over(wG).cast("long"))
      .select(col("id"), col("pos_g"))
    assert(twoPass.join(global, "id")
      .filter(col("pos") =!= col("pos_g")).count() === 0)
  }

  test("skewed data: off-mode mass is spread over many buckets") {
    val b = RangeBuckets.withEquiDepthBucket(skewed, "x", "bucket")
    val sizes = b.groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the 90% mode is indivisible (equal values cannot be split) but the
    // OTHER 10% must not share its bucket wholesale: fixed-width
    // floor(x/1000) puts everything in one bucket here
    val n = 20000L
    val modeBucketMax = sizes.values.max
    assert(modeBucketMax < n * 95 / 100,
      s"mode bucket swallowed everything: $sizes")
    // duplicate quantile boundaries collapse at the mode, so the bucket
    // count reflects the spread mass only — several buckets, not one
    assert(sizes.size >= 5, s"too few buckets on the spread mass: ${sizes.size}")
    // every non-mode bucket is small (~n/nb, not O(n))
    val nonMode = sizes.values.toSeq.sorted.dropRight(1)
    assert(nonMode.forall(_ <= n / 10), s"a non-mode bucket is hot: $sizes")
  }

  test("every row lands in exactly one bucket (intervals partition the line)") {
    val b = RangeBuckets.withEquiDepthBucket(skewed, "x", "bucket")
    assert(b.count() === skewed.count())
    assert(b.groupBy(col("id")).agg(count(lit(1)).as("c"))
      .filter(col("c") =!= 1).count() === 0)
  }

  test("binary-search assignment == the interval range-join formulation") {
    // the round-4 form: boundaries explode into (bucket, lo, hi) interval
    // rows and a broadcast range join picks the bucket. Rebuilt here with
    // the SAME sample seed/fraction as the operator, so the sampled
    // boundary array is identical and every row's bucket id must match
    // graft_bucket's upper-bound binary search bit for bit — including
    // at the duplicate boundaries the skew mode produces (empty [b, b)
    // intervals that must never match).
    val bs = skewed.sample(0.05, 42L)
      .agg(coalesce(percentile_approx(col("x"),
        array((1 until 64).map(i => lit(i.toDouble / 64)): _*), lit(100)),
        expr("CAST(array() AS ARRAY<DOUBLE>)")).as("bs"))
    val bounds = bs.select(explode(expr(
      "transform(sequence(0, size(bs)), i -> struct(CAST(i AS BIGINT) AS bucket, " +
        "IF(i = 0, CAST('-Infinity' AS DOUBLE), element_at(bs, i)) AS lo, " +
        "IF(i = size(bs), CAST('Infinity' AS DOUBLE), element_at(bs, i + 1)) AS hi))")
      ).as("b"))
      .select(col("b.bucket").as("jbucket"), col("b.lo").as("lo"), col("b.hi").as("hi"))
    val joined = skewed.join(broadcast(bounds),
        col("x") >= col("lo") && col("x") < col("hi"))
      .select(col("id"), col("jbucket"))
    val fast = RangeBuckets.withEquiDepthBucket(skewed, "x", "bucket")
      .select(col("id"), col("bucket"))
    assert(fast.join(joined, "id")
      .filter(col("bucket") =!= col("jbucket")).count() === 0)
    assert(fast.count() === joined.count())
  }

  test("graft_bucket edge cases: empty bounds, ends, duplicates") {
    graft.expressions.GraftExtensions.register(spark)
    val rows = spark.sql(
      """SELECT
        |  graft_bucket(CAST(5.0 AS DOUBLE), CAST(array() AS ARRAY<DOUBLE>)) AS empty_b,
        |  graft_bucket(CAST(-1e9 AS DOUBLE), array(1.0D, 2.0D, 3.0D)) AS below,
        |  graft_bucket(CAST(1e9 AS DOUBLE), array(1.0D, 2.0D, 3.0D)) AS above,
        |  graft_bucket(CAST(2.0 AS DOUBLE), array(1.0D, 2.0D, 3.0D)) AS at_bound,
        |  graft_bucket(CAST(2.0 AS DOUBLE), array(2.0D, 2.0D, 3.0D)) AS dup_skips,
        |  graft_bucket(CAST(NULL AS DOUBLE), array(1.0D)) AS null_v
        |""".stripMargin).head()
    assert(rows.getLong(0) === 0L) // single (-inf, inf) bucket
    assert(rows.getLong(1) === 0L)
    assert(rows.getLong(2) === 3L)
    assert(rows.getLong(3) === 2L) // [b, hi) intervals: v == b goes up
    assert(rows.getLong(4) === 2L) // duplicate boundary: empty [2,2) skipped
    assert(rows.isNullAt(5))
  }

  test("explicit boundary source: still a total partition, buckets monotone in value") {
    // q_ks_test's shape: boundaries sketched from a RAW frame, buckets
    // assigned to a DERIVED frame — the intervals must still cover every
    // derived row exactly once, and bucket ids must be monotone in the
    // value so (bucket, in-bucket order) reproduces the global order
    val raw = skewed
    val derived = skewed.groupBy(col("x")).agg(count(lit(1)).as("cnt"))
    val b = RangeBuckets.withEquiDepthBucketFrom(raw, derived, "x", "bucket")
    assert(b.count() === derived.count())
    assert(b.groupBy(col("x")).agg(count(lit(1)).as("c"))
      .filter(col("c") =!= 1).count() === 0)
    // monotone: max value of bucket i < min value of bucket j for i < j
    val stats = b.groupBy(col("bucket"))
      .agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
      .orderBy(col("bucket")).collect()
    stats.sliding(2).foreach {
      case Array(a, c) =>
        assert(a.getDouble(2) <= c.getDouble(1),
          s"bucket ${a.getLong(0)} overlaps ${c.getLong(0)}")
      case _ =>
    }
  }
}
