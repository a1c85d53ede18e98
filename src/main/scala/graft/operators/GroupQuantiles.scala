package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Materialize.CutSyntax

/** Buffer-free EXACT per-group quantiles — the generalization of
  * q_median_scalable's two-pass bucketed selection from the global
  * median to arbitrary quantile sets, closing the last scale-killer
  * shape in the robust-stats family (q_mad_outlier / q_winsorize /
  * q_grouped_quantiles previously ran Spark's `percentile`, whose
  * implementation BUFFERS THE WHOLE GROUP per aggregation state — an
  * executor OOM when one group holds billions of rows).
  *
  * Semantics: linear interpolation at rank p·(n−1) (0-based) — the
  * `quantile_cont` / pandas / Spark-`percentile` contract, computed as
  * `v[k1]·(1−frac) + v[k2]·frac` with k1 = ⌊pos⌋, k2 = ⌈pos⌉. The
  * EXPRESSION SHAPE matters: DuckDB's quantile_cont evaluates exactly
  * this weighted form (verified by a 5000-case fuzz against duckdb —
  * the algebraically-equal `v1 + frac·(v2−v1)` differs in the last ulp
  * on ~18% of draws), so hashes agree bit-for-bit with the oracle even
  * before any presentation rounding.
  *
  * Shape (two scans of the fact, NO full-fact shuffle, ~n/64 peak task
  * state):
  *  1. sampled equi-depth buckets ([[RangeBuckets]], in-plan, no driver
  *     action) feed a per-(group, bucket) count — partial aggregation
  *     means only tiny (group, bucket, cnt) state shuffles, never rows;
  *  2. the tiny offsets frame locates each quantile's straddling
  *     bucket(s) (≤ 2·|ps| buckets per group);
  *  3. the second scan broadcast-semi-joins the straddle set BEFORE any
  *     exchange, so only surviving rows (~|ps|·n/64) shuffle into the
  *     bucket-local rank window (offset + row_number — one bucket's rows
  *     is the peak window state, ~n/64 WHATEVER the group size); rows AT
  *     the needed ranks broadcast-join out (≤ 2·|ps| rows per group) and
  *     the interpolation runs on the tiny frame.
  *
  * Every count is exact and the bucket decomposition reproduces the
  * exact global order (RangeBuckets doc), so the result is bit-identical
  * to a whole-group sort whatever the sampled boundaries were.
  */
object GroupQuantiles {

  /** One row per group: `groupCol`, `n` (non-null count), and one DOUBLE
    * column per `(name, p)` in `ps` holding the exact p-quantile of
    * `valueCol` (nulls ignored, as in `percentile`/`quantile_cont`).
    * `cut = false` disables the lazy lineage cuts on the tiny frames —
    * test-only, so PlanSpec can assert on the full expanded plan (the
    * cuts change plan MATERIALIZATION, never values). */
  def exact(df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[(String, Double)], cut: Boolean = true): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (_, p) => p >= 0.0 && p <= 1.0 },
      s"quantiles must be in [0,1], got $ps")
    val base = df
      .filter(col(valueCol).isNotNull)
      .select(col(groupCol), col(valueCol).cast("double").as("__v"))
    val bucketed = RangeBuckets.withEquiDepthBucket(base, "__v", "__bucket")

    // pass 1: per-(group, bucket) counts -> offsets / totals (tiny frame;
    // partial agg — no row ever shuffles here)
    val wOff = Window.partitionBy(col(groupCol)).orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(col(groupCol))
    val off = bucketed.groupBy(col(groupCol), col("__bucket"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__boff", coalesce(sum(col("__cnt")).over(wOff), lit(0L)))
      .withColumn("__n", sum(col("__cnt")).over(wAll))

    // each quantile's target ranks: pos = p(n-1) 0-based, 1-based ranks
    // k1/k2, interpolation fraction frac = pos - floor(pos).
    // Materialize.cut(lazy): the targets frame is REFERENCED by several
    // downstream branches (straddle set, needed ranks, interpolation
    // weights) — without a lineage cut each reference re-expands the
    // whole counts-pass subtree into the plan (a chained call like
    // q_mad_outlier's med→mad multiplied to ~200 parquet scans of the
    // fact). The frame is O(groups · buckets · |ps|) rows — bounded at
    // any data scale — and the cut is lazy (no driver action; the tiny
    // RDD materializes once at first use and every branch shares it).
    val qArr = array(ps.map { case (nm, p) =>
      struct(lit(nm).as("qname"), lit(p).as("p"))
    }: _*)
    val targets0 = off
      .withColumn("__q", explode(qArr))
      .withColumn("__pos", col("__q.p") * (col("__n") - 1).cast("double"))
      .withColumn("__k1", floor(col("__pos")).cast("long") + 1)
      .withColumn("__k2",
        when(col("__pos") > floor(col("__pos")), col("__k1") + 1)
          .otherwise(col("__k1")))
      .withColumn("__frac", col("__pos") - floor(col("__pos")))
    val targets = if (cut) targets0.cut(false) else targets0

    // straddling buckets only (distinct: one bucket may carry ranks of
    // several quantiles)
    def inBucket(k: String) =
      col(k) > col("__boff") && col(k) <= col("__boff") + col("__cnt")
    val straddle = targets
      .filter(inBucket("__k1") || inBucket("__k2"))
      .select(col(groupCol), col("__bucket"), col("__boff"))
      .distinct()

    // pass 2: rank bucket-locally inside straddling buckets, keep the
    // rows AT any needed rank (equi broadcast joins throughout)
    val wLoc = Window.partitionBy(col(groupCol), col("__bucket"))
      .orderBy(col("__v"))
    val ranked = bucketed
      .join(broadcast(straddle), Seq(groupCol, "__bucket"))
      .withColumn("__rnk", col("__boff") + row_number().over(wLoc))
    val needed = targets
      .select(col(groupCol), explode(array(col("__k1"), col("__k2"))).as("__rnk"))
      .distinct()
    // kv is ≤ 2·|ps| rows per group; the lazy cut stops the v1/v2 double
    // reference below from running the rank pass twice
    val kv0 = ranked
      .join(broadcast(needed), Seq(groupCol, "__rnk"))
      .select(col(groupCol), col("__rnk"), col("__v"))
    val kv = if (cut) kv0.cut(false) else kv0

    // interpolate on the tiny frames: v = v1·(1−frac) + v2·frac (the
    // bit-exact quantile_cont expression shape — see object doc)
    val tq = targets
      .select(col(groupCol), col("__q.qname").as("__qname"),
        col("__k1"), col("__k2"), col("__frac"), col("__n"))
      .distinct()
    val v1 = kv.select(col(groupCol), col("__rnk").as("__k1"), col("__v").as("__v1"))
    val v2 = kv.select(col(groupCol), col("__rnk").as("__k2"), col("__v").as("__v2"))
    val vals = tq
      .join(v1, Seq(groupCol, "__k1"))
      .join(v2, Seq(groupCol, "__k2"))
      .withColumn("__val",
        col("__v1") * (lit(1.0) - col("__frac")) + col("__v2") * col("__frac"))

    val aggs = max(col("__n")).as("n") +: ps.map { case (nm, _) =>
      max(when(col("__qname") === nm, col("__val"))).as(nm)
    }
    vals.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }
}
