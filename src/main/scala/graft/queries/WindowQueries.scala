package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.Tables
import graft.QueryKit._

/** Window-function coverage (SURVEY.md §2.7 W1–W6, A5–A8) plus the
  * sessionization pattern (streaming-adjacent, ref has none — this is the
  * batch form of the Structured Streaming session window).
  *
  * Scale notes: every window over data rows partitions by a
  * high-cardinality key (user, customer, nation×segment) or by a
  * (key, equi-depth bucket) pair → one hash shuffle + bounded
  * per-partition sorts; identical plan shape on a 1000-executor
  * cluster. Low-cardinality keys (the 5-value market segment,
  * event_type) never get whole-partition windows: aggregate frames
  * (group sums, min_by/max_by ends, bucket firsts) are computed with
  * groupBy and broadcast back, and offset functions decompose per
  * (key, bucket) with a boundary handoff (q_window_lead). The only
  * unpartitioned windows run over dimension-sized aggregates (W4
  * league table, bucket-count offset tables). PlanSpec's skew-key
  * sweep enforces this for every query in the surface.
  */
object WindowQueries extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // W1/W3 — lag features + grouped diff (ref: EDA cells 23-24, 31:
    // 24 "previous_*" features per player ordered by kickoff).
    "q_window_lag" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("tkey"), col("event_id"))
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          Tables.tsMicros.as("tkey"), col("value"))
        .withColumn("prev_value", lag(col("value"), 1).over(w))
        .withColumn("delta_us", col("tkey") - lag(col("tkey"), 1).over(w))
        .orderBy(col("event_id"))
    }),

    // W2 — lead with default (ref: quantile upper bound, EDA cell 26).
    // c_mktsegment has 5 values, so a plain per-segment window is five
    // giant tasks at 100 TB. Offset functions decompose over the same
    // equi-depth buckets as GlobalRowNumber: global order (bal, key) =
    // (bucket, bal, key) because the bucket index is monotone in the
    // value, so lead is bucket-local everywhere EXCEPT the last row of
    // each (segment, bucket) — and that row's successor is the first
    // value of the segment's next non-empty bucket, a one-row-per-
    // (segment, bucket) boundary handoff computed on the count-table-
    // sized firsts frame and broadcast back. (The first value of a
    // bucket in (bal, key) order is just min(bal) — ties share the
    // value.) c_acctbal is non-null in the schema; RangeBuckets drops
    // null sort values, same as a window over a null-free column.
    "q_window_lead" -> ((s, dir) => {
      val c = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      val b = graft.operators.RangeBuckets
        .withEquiDepthBucket(c, "c_acctbal", "__b", 64)
      val wLoc = Window.partitionBy(col("c_mktsegment"), col("__b"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      val wSeg = Window.partitionBy(col("c_mktsegment")).orderBy(col("__b"))
      val nexts = b.groupBy(col("c_mktsegment"), col("__b"))
        .agg(min(col("c_acctbal")).as("bfirst"))
        .withColumn("bnext", lead(col("bfirst"), 1).over(wSeg))
        .select(col("c_mktsegment"), col("__b"), col("bnext"))
      b.withColumn("ll", lead(col("c_acctbal"), 1).over(wLoc))
        .join(broadcast(nexts), Seq("c_mktsegment", "__b"))
        .withColumn("next_bal",
          coalesce(col("ll"), col("bnext"), lit(9999).cast("double")))
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
          col("next_bal"))
        .orderBy(col("c_custkey"))
    }),

    // W4 — league-table position: aggregate then rank, 0-based like the
    // reference (ref: etl/run_transform.py:441-446 — emits positions 0..19).
    "q_rank_position" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val per = c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_regionkey"), col("n_name"))
        .agg(dsum(col("c_acctbal")).as("total_bal"), count(lit(1)).as("n_cust"))
      val w = Window.partitionBy(col("n_regionkey"))
        .orderBy(col("total_bal").desc, col("n_name"))
      per.withColumn("table_position", row_number().over(w).cast("long") - 1)
        .select(col("n_regionkey"), col("n_name"), col("total_bal"),
          col("n_cust"), col("table_position"))
        .orderBy(col("n_regionkey"), col("table_position"))
    }),

    // W5 — top-1 per group with deterministic tiebreak (ref: best fuzzy
    // match per player, etl/additional_fifa.py:165-172).
    "q_top1_per_group" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, dir, "customer")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"))
        .orderBy(col("c_mktsegment"))
    }),

    // A5 — group-total normalization (ref: PercentageCalc,
    // modelling/helpers.py:30-69: value / (group_sum / constant)).
    // event_type is low-cardinality, so the whole-partition sum window
    // would be a handful of giant tasks at 100 TB; the scale-safe (and
    // strictly cheaper) form aggregates the sums — the shuffle carries
    // |event_type| partial sums, not the rows — and broadcast-joins
    // them back. DECIMAL sums are order-independent, so the value is
    // bit-identical to the window form the oracle keeps.
    "q_window_norm" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(col("event_id"), col("event_type"), col("value"))
      val totals = e.groupBy(col("event_type"))
        .agg(sum(col("value").cast(DecimalType(18, 2))).as("__tot"))
      e.join(broadcast(totals), Seq("event_type"))
        .withColumn("pct_of_type",
          r6(col("value") / (col("__tot").cast(DoubleType) / lit(15))))
        .select(col("event_id"), col("event_type"), col("value"),
          col("pct_of_type"))
        .orderBy(col("event_id"))
    }),

    // A6/A8 — group-transform max/min flags (ref: etl/additional_fifa.py
    // :140-142, EDA cell 32 first-kickoff-per-gameweek).
    "q_window_minmax" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"),
          Tables.tsMicros.as("tkey"))
        .withColumn("is_peak", (col("value") === max(col("value")).over(w)).cast("int"))
        .withColumn("us_since_first", col("tkey") - min(col("tkey")).over(w))
        .drop("tkey")
        .orderBy(col("event_id"))
    }),

    // A7 — two-tier group-mean imputation (ref: modelling/helpers.py
    // :97-106: team+pos+bin mean, then pos+bin mean). Nulls injected on
    // c_custkey%10 to exercise both tiers. Tier 1 windows on the
    // high-cardinality (nation, segment) key — fine at scale; tier 2's
    // key is the 5-value segment alone, so its mean comes from a
    // groupBy aggregate broadcast-joined back (the whole-partition
    // window would be five giant tasks at 100 TB). DECIMAL sums keep
    // the value bit-identical to the oracle's window form.
    "q_group_impute" -> ((s, dir) => {
      val w1 = Window.partitionBy(col("c_nationkey"), col("c_mktsegment"))
      val c = t(s, dir, "customer")
        .withColumn("bal",
          when(col("c_custkey") % 10 === 0, lit(null).cast("double"))
            .otherwise(col("c_acctbal")))
      val segMean = c.groupBy(col("c_mktsegment"))
        .agg((sum(col("bal").cast(DecimalType(18, 2))).cast(DoubleType) /
          count(col("bal"))).as("__seg_mean"))
      c.join(broadcast(segMean), Seq("c_mktsegment"))
        .withColumn("bal_imputed",
          r4(coalesce(col("bal"),
            sum(col("bal").cast(DecimalType(18, 2))).over(w1).cast(DoubleType) /
              count(col("bal")).over(w1),
            col("__seg_mean"))))
        .select(col("c_custkey"), col("bal"), col("bal_imputed"))
        .orderBy(col("c_custkey"))
    }),

    // Running aggregate over an explicit row frame (beyond-reference:
    // the ref only uses whole-partition/offset frames, SURVEY §2.7).
    "q_running_total" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderdate"))
        .withColumn("running_total",
          sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
            .cast(DoubleType))
        .withColumn("order_seq", row_number().over(
          Window.partitionBy(col("o_custkey"))
            .orderBy(col("o_orderdate"), col("o_orderkey"))))
        .drop("o_orderdate")
        .orderBy(col("o_orderkey"))
    }),

    // first_value / last_value over the full partition frame. The
    // unbounded frame on the 5-value segment key would be five giant
    // tasks at 100 TB; first/last in (c_custkey) order are exactly
    // min_by/max_by on the key — one aggregate shuffle carrying
    // |segment| rows, broadcast-joined back. c_custkey is unique, so
    // the pick is deterministic.
    "q_first_last" -> ((s, dir) => {
      val c = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      val ends = c.groupBy(col("c_mktsegment"))
        .agg(min_by(col("c_acctbal"), col("c_custkey")).as("first_bal"),
          max_by(col("c_acctbal"), col("c_custkey")).as("last_bal"))
      c.join(broadcast(ends), Seq("c_mktsegment"))
        .select(col("c_custkey"), col("c_mktsegment"),
          col("first_bal"), col("last_bal"))
        .orderBy(col("c_custkey"))
    }),

    // Sessionization — 30-minute-gap sessions per user: batch equivalent of
    // a Structured Streaming session window (graft.streaming runs the same
    // logic incrementally). Gap flag via lag, session id via running sum.
    "q_sessionize" -> ((s, dir) => {
      val wo = Window.partitionBy(col("user_id"))
        .orderBy(col("tkey"), col("event_id"))
      val wrun = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          Tables.tsMicros.as("tkey"), col("value"))
        .withColumn("new_sess",
          when(lag(col("tkey"), 1).over(wo).isNull ||
            col("tkey") - lag(col("tkey"), 1).over(wo) > 1800000000L, 1)
            .otherwise(0))
        .withColumn("session_id", sum(col("new_sess")).over(wrun))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("tkey")).as("session_start"),
          dsum(col("value")).as("session_value"))
        .orderBy(col("user_id"), col("session_id"))
    }),

    // RANGE-frame rolling aggregate — trailing 1h per user by EVENT TIME
    // (a range frame, not a row frame: the window is defined by the time
    // axis, so tied timestamps share one frame and the result is
    // deterministic with no tie-break). Money goes through DECIMAL so
    // the windowed sum is partition-order-independent.
    "q_rolling_1h" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("tkey"))
        .rangeBetween(-3600000000L, 0L)
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          Tables.tsMicros.as("tkey"), col("value"))
        .withColumn("n_last_hour", count(lit(1)).over(w))
        .withColumn("sum_last_hour",
          sum(col("value").cast("decimal(18,2)")).over(w)
            .cast("double"))
        .select(col("event_id"), col("user_id"), col("n_last_hour"),
          col("sum_last_hour"))
        .orderBy(col("event_id"))
    }),

    // Global contiguous row numbering WITHOUT a single-task sort
    // (operators.GlobalRowNumber): equi-depth buckets + nb-row offset
    // prefix + bucket-local rank. The oracle is the plain global
    // row_number the operator must reproduce exactly.
    "q_global_rownum" -> ((s, dir) => {
      graft.operators.GlobalRowNumber.withRowNumber(
          t(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice")),
          "o_totalprice", "rn", Seq("o_orderkey"))
        .select(col("o_orderkey"), col("o_totalprice"), col("rn"))
        .orderBy(col("rn"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_global_rownum" ->
      """SELECT o_orderkey, o_totalprice,
        |  CAST(row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS rn
        |FROM orders ORDER BY rn""".stripMargin,

    "q_rolling_1h" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_ns(ts) // 1000 AS tkey, value FROM events
        |)
        |SELECT event_id, user_id,
        |  CAST(COUNT(*) OVER w AS BIGINT) AS n_last_hour,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_last_hour
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY tkey
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "q_window_lag" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ns(ts)//1000 AS tkey, value FROM events)
        |SELECT event_id, user_id, tkey, value,
        |  lag(value, 1) OVER (PARTITION BY user_id ORDER BY tkey, event_id) AS prev_value,
        |  tkey - lag(tkey, 1) OVER (PARTITION BY user_id ORDER BY tkey, event_id) AS delta_us
        |FROM e ORDER BY event_id""".stripMargin,

    "q_window_lead" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        |  lead(c_acctbal, 1, 9999) OVER
        |    (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS next_bal
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_rank_position" ->
      s"""WITH per AS (
         |  SELECT n_regionkey, n_name,
         |    ${sql.dsum("c_acctbal")} AS total_bal, COUNT(*) AS n_cust
         |  FROM customer JOIN nation ON c_nationkey = n_nationkey
         |  GROUP BY n_regionkey, n_name
         |)
         |SELECT n_regionkey, n_name, total_bal, n_cust,
         |  row_number() OVER (PARTITION BY n_regionkey
         |    ORDER BY total_bal DESC, n_name) - 1 AS table_position
         |FROM per ORDER BY n_regionkey, table_position""".stripMargin,

    "q_top1_per_group" ->
      """WITH r AS (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer
        |)
        |SELECT c_mktsegment, c_custkey, c_acctbal FROM r WHERE rn = 1
        |ORDER BY c_mktsegment""".stripMargin,

    "q_window_norm" ->
      """SELECT event_id, event_type, value,
        |  ROUND(value / (CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER
        |    (PARTITION BY event_type) AS DOUBLE) / 15), 6) AS pct_of_type
        |FROM events ORDER BY event_id""".stripMargin,

    "q_window_minmax" ->
      """WITH e AS (SELECT event_id, user_id, value, epoch_ns(ts)//1000 AS tkey FROM events)
        |SELECT event_id, user_id, value,
        |  CAST(value = max(value) OVER (PARTITION BY user_id) AS INT) AS is_peak,
        |  tkey - min(tkey) OVER (PARTITION BY user_id) AS us_since_first
        |FROM e ORDER BY event_id""".stripMargin,

    "q_group_impute" ->
      """WITH c AS (
        |  SELECT c_custkey, c_nationkey, c_mktsegment,
        |    CASE WHEN c_custkey % 10 = 0 THEN NULL ELSE c_acctbal END AS bal
        |  FROM customer
        |)
        |SELECT c_custkey, bal,
        |  ROUND(COALESCE(bal,
        |    CAST(SUM(CAST(bal AS DECIMAL(18,2))) OVER
        |      (PARTITION BY c_nationkey, c_mktsegment) AS DOUBLE)
        |      / COUNT(bal) OVER (PARTITION BY c_nationkey, c_mktsegment),
        |    CAST(SUM(CAST(bal AS DECIMAL(18,2))) OVER
        |      (PARTITION BY c_mktsegment) AS DOUBLE)
        |      / COUNT(bal) OVER (PARTITION BY c_mktsegment)), 4) AS bal_imputed
        |FROM c ORDER BY c_custkey""".stripMargin,

    "q_running_total" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
        |  CAST(row_number() OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INT) AS order_seq
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_first_last" ->
      """SELECT c_custkey, c_mktsegment,
        |  first_value(c_acctbal) OVER w AS first_bal,
        |  last_value(c_acctbal) OVER w AS last_bal
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_custkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY c_custkey""".stripMargin,

    "q_sessionize" ->
      s"""WITH e AS (
         |  SELECT event_id, user_id, epoch_ns(ts)//1000 AS tkey, value FROM events
         |), g AS (
         |  SELECT *,
         |    CASE WHEN lag(tkey, 1) OVER w IS NULL
         |           OR tkey - lag(tkey, 1) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_sess
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tkey, event_id)
         |), sid AS (
         |  SELECT *, CAST(SUM(new_sess) OVER
         |    (PARTITION BY user_id ORDER BY tkey, event_id
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
         |  FROM g
         |)
         |SELECT user_id, session_id, COUNT(*) AS n_events,
         |  MIN(tkey) AS session_start, ${sql.dsum("value")} AS session_value
         |FROM sid GROUP BY user_id, session_id
         |ORDER BY user_id, session_id""".stripMargin
  )
}
