package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.QueryKit._

/** Remaining inventory rows (SURVEY.md §2.3 P7/P15/P18, §2.4 F6/F7,
  * §2.6 A11-spearman): fillna/dropna, math scalars, combine_first
  * coalesce after a double join, and rank-based (Spearman) correlation.
  */
object MiscQueries extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // P15/F7/F6 — na.fill constant + na.drop + boolean-flag filter
    // (ref: helpers.py:47 fillna, modelling_1 cell 2 dropna).
    "q_fillna_dropna" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .withColumn("maybe_price",
          when(col("o_orderkey") % 7 === 0, lit(null).cast("double"))
            .otherwise(col("o_totalprice")))
        .withColumn("maybe_prio",
          when(col("o_orderkey") % 11 === 0, lit(null).cast("string"))
            .otherwise(col("o_orderpriority")))
      val filled = o.na.fill(Map("maybe_price" -> 0.0, "maybe_prio" -> "NONE"))
      val dropped = o.na.drop(Seq("maybe_price", "maybe_prio"))
        .select(col("o_orderkey")).withColumn("survived", lit(1))
      filled
        .filter(col("o_orderstatus") === "F") // F6 boolean-flag subset
        .join(dropped, Seq("o_orderkey"), "left")
        .select(col("o_orderkey"), col("maybe_price"), col("maybe_prio"),
          coalesce(col("survived"), lit(0)).as("survived"))
        .orderBy(col("o_orderkey"))
    }),

    // P18 — math scalars: log/exp/floor/ceil (ref: EDA cells 32,55,59
    // log-log imputation; additional_fifa.py:320 ceil).
    "q_math_scalars" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          r6(log(col("o_totalprice"))).as("log_price"),
          r6(exp(log(col("o_totalprice")) / 10)).as("exp_tenth"),
          floor(col("o_totalprice") / 1000).cast("long").as("price_k_floor"),
          ceil(col("o_totalprice") / 1000).cast("long").as("price_k_ceil"))
        .orderBy(col("o_orderkey"))
    }),

    // P7 — combine_first: double left join then coalesce _x/_y
    // (ref: EDA cell 19 home/away difficulty coalesce).
    "q_combine_first" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val rich = t(s, dir, "customer").filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("k1"), col("c_name").as("name_rich"))
      val any = t(s, dir, "customer")
        .select(col("c_custkey").as("k2"), col("c_name").as("name_any"))
      o.join(broadcast(rich), o("o_custkey") === col("k1"), "left")
        .join(broadcast(any), o("o_custkey") === col("k2"), "left")
        .select(col("o_orderkey"),
          coalesce(col("name_rich"), col("name_any"), lit("unknown")).as("cust_name"),
          col("name_rich").isNotNull.cast("int").as("from_rich"))
        .orderBy(col("o_orderkey"))
    }),

    // EXCEPT set-op (beyond-reference — the ref does anti-membership via
    // isin, F4; the relational form completes the set-op family).
    "q_except" -> ((s, dir) => {
      val all = t(s, dir, "orders").select(col("o_custkey").as("custkey"))
      val urgent = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("custkey"))
      all.except(urgent).orderBy(col("custkey"))
    }),

    // BPE-ish regex token counting (training-data brief: whitespace + a
    // BPE-style segmentation) — letter runs, digit runs, punct runs.
    "q_bpe_tokens" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          expr("size(split(text, ' '))").as("ws_tokens"),
          expr("regexp_count(text, '[a-z]+|[0-9]+|[^a-z0-9\\\\s]+')").as("bpe_tokens"))
        .orderBy(col("doc_id"))
    }),

    // Two-sample Kolmogorov–Smirnov statistic in pure SQL (ref: modelling_2
    // cell 17 KS test): D = max |F1 − F2| over the pooled sorted sample.
    //
    // Distributed form — no global single-task sort. Per-row prefix maxima
    // are attained at (price, is_f) RUN ENDS (within a run only one CDF
    // moves, and |F1−F2| along a path where one coordinate is monotone
    // peaks at an endpoint), so it suffices to pre-aggregate counts per
    // (price, is_f) and prefix-sum those. The prefix sum itself is the
    // classic two-pass: range-bucket the price axis, per-bucket totals →
    // a tiny offsets frame (one global window over the aggregated bucket
    // rows), then a per-bucket window adds local cumulative to the bucket
    // offset. Bucket boundaries come from a sampled equi-depth sketch
    // (operators.RangeBuckets) so per-bucket work stays ~n/nb under ANY
    // value skew; boundaries are monotone, so the answer is unchanged.
    //
    // One-scan shape (round 4): boundaries sketch from the RAW price
    // column (withEquiDepthBucketFrom — correctness is boundary-
    // independent, and the round-3 form recomputed the (price, is_f)
    // aggregation inside the sketch branch); the explicit
    // repartition(bucket) is the SHARED exchange both consumers (bucket
    // totals, bucket-local window) read, so AQE's ReuseExchange computes
    // scan + agg + bucket join ONCE; per-group totals n_f/n_o fall out of
    // the same 65-row offsets window (full-frame sum) instead of a third
    // scan of orders.
    "q_ks_test" -> ((s, dir) => {
      val o = t(s, dir, "orders").filter(col("o_orderstatus").isin("F", "O"))
        .select(col("o_totalprice"),
          (col("o_orderstatus") === "F").cast("int").as("is_f"))
      val r = graft.operators.RangeBuckets.withEquiDepthBucketFrom(
        o, o.groupBy(col("o_totalprice"), col("is_f"))
          .agg(count(lit(1)).as("cnt")),
        "o_totalprice", "bucket")
        .repartition(col("bucket"))
      val btot = r.groupBy(col("bucket"))
        .agg(sum(col("is_f") * col("cnt")).as("bf"),
          sum((lit(1) - col("is_f")) * col("cnt")).as("bo"))
      val wOff = Window.orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wAll = Window.orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val off = btot
        .withColumn("off_f", coalesce(sum(col("bf")).over(wOff), lit(0L)))
        .withColumn("off_o", coalesce(sum(col("bo")).over(wOff), lit(0L)))
        .withColumn("n_f", sum(col("bf")).over(wAll))
        .withColumn("n_o", sum(col("bo")).over(wAll))
        .select(col("bucket"), col("off_f"), col("off_o"), col("n_f"), col("n_o"))
      val wLoc = Window.partitionBy(col("bucket"))
        .orderBy(col("o_totalprice"), col("is_f"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      r.join(broadcast(off), Seq("bucket"))
        .withColumn("cum_f", sum(col("is_f") * col("cnt")).over(wLoc) + col("off_f"))
        .withColumn("cum_o", sum((lit(1) - col("is_f")) * col("cnt")).over(wLoc) + col("off_o"))
        .groupBy()
        .agg(r6(max(abs(col("cum_f") / col("n_f") - col("cum_o") / col("n_o")))).as("ks_d"),
          max(col("n_f")).as("n_f"), max(col("n_o")).as("n_o"))
    }),

    // ROLLUP hierarchy totals (beyond-reference; Catalyst expands to
    // grouping sets with one shuffle).
    "q_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    // CUBE totals (beyond-reference; completes the grouping-sets family
    // with q_rollup — Catalyst expands to grouping sets, one shuffle).
    "q_cube" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    // PIVOT wide reshape (beyond-reference — pandas pivot_table; the
    // values are enumerated explicitly, so no extra distinct-values job
    // and a deterministic schema).
    "q_pivot" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(dsum(col("l_quantity")))
        .orderBy(col("l_returnflag"))
    }),

    // UNPIVOT/melt long reshape (beyond-reference — pandas melt; Spark
    // Dataset.unpivot is the built-in since 3.4).
    "q_unpivot" -> ((s, dir) => {
      t(s, dir, "part")
        .select(col("p_partkey"), col("p_retailprice"),
          col("p_size").cast("double").as("p_size"))
        .unpivot(Array(col("p_partkey")),
          Array(col("p_retailprice"), col("p_size")), "metric", "value")
        .orderBy(col("p_partkey"), col("metric"))
    }),

    // Scale-path approximate aggregates: HLL distinct + the rank-bounded
    // quantile sketch. These are the 100 TB substitutes for exact
    // countDistinct/percentile (one pass, bounded sketch memory, no
    // exact-sort). Sketch INTERNALS differ per engine, so the raw
    // estimates can't hash-match DuckDB — instead the output is
    // ERROR-GATED (the q_group_quantile_approx trick): each estimate is
    // verified against an exact computation in the same plan and only
    // the BAND VERDICTS (plus the exact sides) are emitted; both
    // estimators are deterministic on fixed data (HLL++ is hash-based,
    // percentile_approx is rank-bounded), so the verdicts are stable and
    // the DuckDB oracle reproduces the exact columns + TRUE literals.
    // The gates check exactly what each sketch guarantees:
    //  - HLL: estimate within ±10% of exact distinct (rsd = 0.02 → 5σ);
    //    the exact side is the two-stage distinct-pair aggregation
    //    (partial agg on (flag, part), then count — never an Expand of
    //    the fact, never a buffer);
    //  - percentile_approx(acc = 1000): returned element's RANK within
    //    ±3 percentile points of 0.5 (guarantee is n/1000 = 0.1) — one
    //    aggregated pass counts values strictly below / at-or-below the
    //    estimate, and the verdict is the tie-robust interval test
    //    ([cnt_lt+1, cnt_le] ∩ [0.47n, 0.53n] ≠ ∅). Rank is the
    //    sketch's own contract, so no exact quantile is ever computed.
    // Three cheap hash-agg passes + two broadcast joins of 3-row frames;
    // every pass partial-aggregates, so the shape survives 100×.
    "q_approx_stats" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_partkey"), col("l_extendedprice"))
      val sk = li.groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey"), 0.02).as("nd_a"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
            .as("p50_a"),
          count(lit(1)).as("n"))
      val nd = li.select(col("l_returnflag"), col("l_partkey")).distinct()
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("nd_parts"))
      val rk = li
        .join(broadcast(sk.select(col("l_returnflag"), col("p50_a"))),
          Seq("l_returnflag"))
        .groupBy(col("l_returnflag"))
        .agg(
          sum((col("l_extendedprice") < col("p50_a")).cast("long")).as("cnt_lt"),
          sum((col("l_extendedprice") <= col("p50_a")).cast("long")).as("cnt_le"))
      sk.join(broadcast(nd), Seq("l_returnflag"))
        .join(broadcast(rk), Seq("l_returnflag"))
        .select(col("l_returnflag"), col("n"), col("nd_parts"),
          (col("nd_a") >= col("nd_parts").cast("double") * 0.9 &&
            col("nd_a") <= col("nd_parts").cast("double") * 1.1)
            .as("nd_in_band"),
          (col("cnt_lt").cast("double") < col("n").cast("double") * 0.53 &&
            col("cnt_le").cast("double") >= col("n").cast("double") * 0.47)
            .as("p50_in_band"))
        .orderBy(col("l_returnflag"))
    }),

    // A11 — Spearman correlation over ranks: AVERAGE rank for ties on the
    // discrete quantity axis (the pandas/textbook treatment), sequential
    // (orderkey, linenumber)-deterministic rank on the near-continuous
    // price axis.
    //
    // Distributed ranking — no window partitioned by the 3-value flag.
    // rank(row) = (#rows in the flag group with a smaller sort key) +
    // (position within the tie/bucket group): the first term comes from a
    // prefix sum over a SMALL aggregated frame (per (flag, quantity) for
    // rq — ~50 distinct quantities; per (flag, price-bucket) for rp —
    // price is continuous, so a sampled equi-depth bucket
    // (operators.RangeBuckets) stands in for the tie group and keeps
    // per-bucket work ~n/nb under any skew), the second from a window
    // partitioned by the high-cardinality (flag, value-bucket) key.
    // BOTH offset tables come from ONE shared (flag, pbucket, quantity)
    // micro-cube aggregation (~flags × 64 buckets × 50 quantities rows),
    // referenced exactly ONCE: the four offset/count sums are window
    // functions over the tiny cube (range frames include the full peer
    // group, so cum − group = the exclusive prefix with no tie-spacing
    // assumption), and the single enriched cube broadcasts back in ONE
    // hash join. The round-3 grouping-sets form pushed every input row
    // through the shuffle TWICE (Expand) and joined two broadcasts; a
    // two-aggregation variant rebuilt the cube per branch (broadcast
    // subtrees don't share stages). One big exchange, 1× rows, one
    // broadcast.
    //
    // The one big exchange is EXPLICIT (the q_ks_test shared-exchange
    // trick): repartition on (flag, pbucket) right after bucketing, so
    // (a) AQE's ReuseExchange computes the scan + boundary-sample +
    // bucket assignment ONCE for both consumers (the cube aggregation
    // and the join's big side — separate subtrees otherwise recompute
    // it), (b) the cube's groupBy needs no further exchange (hash on
    // (flag, pbucket) already clusters (flag, pbucket, quantity)), and
    // (c) the bucket-local rank window's required distribution is the
    // partitioning itself — only the local sort remains.
    "q_spearman" -> ((s, dir) => {
      val base = t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"),
          col("l_orderkey"), col("l_linenumber"))
      val li = graft.operators.RangeBuckets.withEquiDepthBucket(
        base, "l_extendedprice", "pbucket")
        .repartition(col("l_returnflag"), col("pbucket"))
      val cube = li
        .groupBy(col("l_returnflag"), col("pbucket"), col("l_quantity"))
        .agg(count(lit(1)).as("cnt"))
      // Quantity is DISCRETE (~50 values): ties take their AVERAGE rank
      // (the textbook Spearman treatment), which is a pure function of
      // the (flag, quantity) totals — rank = prefix + (cnt+1)/2 — so the
      // per-row rank needs NO window over the big frame at all, just the
      // broadcast join. Price is near-continuous: ties are broken by
      // (orderkey, linenumber) and its rank keeps the bucket-local
      // window. One full-frame window total.
      val wq = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      val wqg = Window.partitionBy(col("l_returnflag"), col("l_quantity"))
      val wp = Window.partitionBy(col("l_returnflag")).orderBy(col("pbucket"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      val wpg = Window.partitionBy(col("l_returnflag"), col("pbucket"))
      val enriched = cube
        .withColumn("qcnt", sum(col("cnt")).over(wqg))
        .withColumn("qcum", sum(col("cnt")).over(wq))
        .withColumn("pcnt", sum(col("cnt")).over(wpg))
        .withColumn("pcum", sum(col("cnt")).over(wp))
        .select(col("l_returnflag"), col("pbucket"), col("l_quantity"),
          (col("qcum") - col("qcnt") + (col("qcnt") + 1) / 2.0).as("rq"),
          (col("pcum") - col("pcnt")).as("poff"))
      val wpLoc = Window.partitionBy(col("l_returnflag"), col("pbucket"))
        .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      li.join(broadcast(enriched),
          Seq("l_returnflag", "pbucket", "l_quantity"))
        .withColumn("rp", (col("poff") + row_number().over(wpLoc)).cast("double"))
        .groupBy(col("l_returnflag"))
        .agg(r6(corr(col("rq"), col("rp"))).as("spearman"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    // Z-order (Morton) clustering key — the data-layout operator behind
    // multi-dimensional file skipping (operators.ZOrder; ZOrderSpec
    // quantifies the pruning win). The declared query pins BIT-PARITY of
    // the interleave ladder against DuckDB running the same shift/mask
    // SQL — pure integer ops, so it is exact at any scale.
    "q_zorder" -> ((s, dir) => {
      t(s, dir, "customer")
        .select(col("c_custkey"),
          graft.operators.ZOrder.zvalue(
            col("c_nationkey"), col("c_custkey") % 65536).as("zv"))
        .orderBy(col("c_custkey"))
    })
  )

  val oracle: Map[String, String] = Map(
    // The sketch estimates themselves are engine-specific; the oracle
    // checks the EXACT side and asserts every band verdict is TRUE —
    // if a Spark sketch ever lands outside its error band, the boolean
    // flips and the hash breaks.
    "q_approx_stats" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  COUNT(DISTINCT l_partkey) AS nd_parts,
        |  TRUE AS nd_in_band, TRUE AS p50_in_band
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_zorder" ->
      """WITH b AS (
        |  SELECT c_custkey, c_nationkey & 65535 AS x0, (c_custkey % 65536) & 65535 AS y0
        |  FROM customer
        |), s1 AS (
        |  SELECT c_custkey, (x0 | (x0 << 8)) & 16711935 AS x1, (y0 | (y0 << 8)) & 16711935 AS y1 FROM b
        |), s2 AS (
        |  SELECT c_custkey, (x1 | (x1 << 4)) & 252645135 AS x2, (y1 | (y1 << 4)) & 252645135 AS y2 FROM s1
        |), s3 AS (
        |  SELECT c_custkey, (x2 | (x2 << 2)) & 858993459 AS x3, (y2 | (y2 << 2)) & 858993459 AS y3 FROM s2
        |), s4 AS (
        |  SELECT c_custkey, (x3 | (x3 << 1)) & 1431655765 AS x4, (y3 | (y3 << 1)) & 1431655765 AS y4 FROM s3
        |)
        |SELECT c_custkey, x4 | (y4 << 1) AS zv FROM s4 ORDER BY c_custkey""".stripMargin,

    "q_fillna_dropna" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_totalprice END AS maybe_price,
        |    CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE o_orderpriority END AS maybe_prio
        |  FROM orders
        |)
        |SELECT o_orderkey,
        |  COALESCE(maybe_price, 0.0) AS maybe_price,
        |  COALESCE(maybe_prio, 'NONE') AS maybe_prio,
        |  CASE WHEN maybe_price IS NOT NULL AND maybe_prio IS NOT NULL THEN 1 ELSE 0 END AS survived
        |FROM o WHERE o_orderstatus = 'F'
        |ORDER BY o_orderkey""".stripMargin,

    "q_math_scalars" ->
      """SELECT o_orderkey,
        |  ROUND(ln(o_totalprice), 6) AS log_price,
        |  ROUND(exp(ln(o_totalprice) / 10), 6) AS exp_tenth,
        |  CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS price_k_floor,
        |  CAST(CEIL(o_totalprice / 1000) AS BIGINT) AS price_k_ceil
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_combine_first" ->
      """SELECT o_orderkey,
        |  COALESCE(r.name_rich, a.name_any, 'unknown') AS cust_name,
        |  CAST(r.name_rich IS NOT NULL AS INT) AS from_rich
        |FROM orders
        |LEFT JOIN (SELECT c_custkey, c_name AS name_rich FROM customer WHERE c_acctbal > 5000) r
        |  ON o_custkey = r.c_custkey
        |LEFT JOIN (SELECT c_custkey, c_name AS name_any FROM customer) a
        |  ON o_custkey = a.c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "q_except" ->
      """SELECT o_custkey AS custkey FROM orders
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY custkey""".stripMargin,

    "q_bpe_tokens" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]+')) AS INT) AS bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_ks_test" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_totalprice,
        |    CAST(o_orderstatus = 'F' AS INT) AS is_f
        |  FROM orders WHERE o_orderstatus IN ('F', 'O')
        |), n AS (
        |  SELECT CAST(SUM(is_f) AS BIGINT) AS n_f,
        |         CAST(SUM(1 - is_f) AS BIGINT) AS n_o FROM o
        |), c AS (
        |  SELECT
        |    CAST(SUM(is_f) OVER w AS BIGINT) / CAST(n_f AS DOUBLE) AS cum_f,
        |    CAST(SUM(1 - is_f) OVER w AS BIGINT) / CAST(n_o AS DOUBLE) AS cum_o,
        |    n_f, n_o
        |  FROM o CROSS JOIN n
        |  WINDOW w AS (ORDER BY o_totalprice, is_f, o_orderkey
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |)
        |SELECT ROUND(MAX(ABS(cum_f - cum_o)), 6) AS ks_d,
        |  MAX(n_f) AS n_f, MAX(n_o) AS n_o
        |FROM c""".stripMargin,

    "q_rollup" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sql.dsum("l_quantity")} AS sum_qty, COUNT(*) AS n
         |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_cube" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sql.dsum("l_quantity")} AS sum_qty, COUNT(*) AS n
         |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_pivot" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS F,
        |  CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS O
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_unpivot" ->
      """SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
        |ORDER BY p_partkey, metric""".stripMargin,

    "q_spearman" ->
      """WITH q AS (
        |  SELECT l_returnflag, l_quantity, COUNT(*) AS cnt
        |  FROM lineitem GROUP BY l_returnflag, l_quantity
        |), qr AS (
        |  SELECT l_returnflag, l_quantity,
        |    CAST(COALESCE(SUM(cnt) OVER (PARTITION BY l_returnflag
        |      ORDER BY l_quantity
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      + (cnt + 1) / 2.0 AS rq
        |  FROM q
        |), r AS (
        |  SELECT l.l_returnflag, qr.rq,
        |    CAST(row_number() OVER (PARTITION BY l.l_returnflag
        |      ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS DOUBLE) AS rp
        |  FROM lineitem l JOIN qr USING (l_returnflag, l_quantity)
        |)
        |SELECT l_returnflag, ROUND(corr(rq, rp), 6) AS spearman, COUNT(*) AS n
        |FROM r GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
