package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.QueryKit._

/** Product-analytics and semi-structured coverage: JSON extraction from
  * the events payload column, cohort retention, funnel conversion,
  * month-over-month growth, and the array/higher-order-function surface.
  * Every query has a DuckDB oracle.
  */
object AnalyticsQueries extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Semi-structured extraction: events.props is a JSON string column;
    // pull a typed field out with get_json_object and aggregate on it.
    // The parse stays inside codegen (no UDF, no shuffle before the
    // group-by) — the 100 TB shape for log-payload analytics where the
    // JSON never leaves the scan stage.
    "q_json_extract" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"),
          sum((col("k") >= 50).cast("long")).as("n_high"))
        .orderBy(col("event_type"))
    }),

    // Cohort retention: each user's cohort is their first activity week;
    // the matrix counts distinct users active at each week offset from
    // their cohort. Weeks are pure integer arithmetic on microseconds
    // (no calendar functions), so bucket edges are engine-exact. The
    // per-user cohort frame is user-sized — broadcast back to events.
    "q_cohort_retention" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(col("user_id"),
          expr("ts DIV 1000 DIV 86400000000 DIV 7").as("week"))
      val cohort = e.groupBy(col("user_id"))
        .agg(min(col("week")).as("cohort_week"))
      e.join(broadcast(cohort), Seq("user_id"))
        .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_week"), col("offset"))
    }),

    // Funnel conversion (view → click → purchase, strictly ordered in
    // time per user): stage 2 only counts clicks after the user's first
    // view, stage 3 only purchases after that click. Three conditional
    // min-aggregations chained by broadcast joins — each stage frame is
    // user-sized, the event log is scanned per stage but never shuffled
    // on anything wider than user_id.
    "q_funnel" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(col("user_id"), col("event_type"), expr("ts DIV 1000").as("tk"))
      val v = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("tk")).as("t_view"))
      val c = e.join(broadcast(v), Seq("user_id"))
        .filter(col("event_type") === "click" && col("tk") > col("t_view"))
        .groupBy(col("user_id")).agg(min(col("tk")).as("t_click"))
      val p = e.join(broadcast(c), Seq("user_id"))
        .filter(col("event_type") === "purchase" && col("tk") > col("t_click"))
        .groupBy(col("user_id")).agg(min(col("tk")).as("t_purchase"))
      v.select(count(lit(1)).as("n_view"))
        .crossJoin(c.select(count(lit(1)).as("n_click_after")))
        .crossJoin(p.select(count(lit(1)).as("n_purchase_after")))
    }),

    // Month-over-month revenue: aggregate to a month frame (tiny), then
    // lag/delta/growth windows run over that aggregate — never over the
    // fact table. Exact DECIMAL sums; growth rounded for float parity.
    "q_mom_growth" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("month"))
      t(s, dir, "orders")
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
        .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
        .withColumn("prev_revenue", lag(col("revenue"), 1).over(w))
        .withColumn("growth_pct",
          r6((col("revenue") - col("prev_revenue")) / col("prev_revenue") * 100))
        .orderBy(col("month"))
    }),

    // URL parsing (C4-style provenance filtering): synthesize a URL per
    // doc, split it with Spark's dedicated parse_url kernel (HOST / PATH
    // / QUERY), and flag blocklisted domains. Map-only; the oracle
    // re-derives the parts with regexes, so the kernel's semantics are
    // pinned, not just its plumbing.
    "q_url_parse" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("url",
          concat(lit("https://"), col("source"), lit(".example.com/docs/"),
            col("doc_id").cast("string"), lit("?lang="), col("lang")))
        .select(col("doc_id"),
          parse_url(col("url"), lit("HOST")).as("host"),
          parse_url(col("url"), lit("PATH")).as("path"),
          parse_url(col("url"), lit("QUERY")).as("query"),
          parse_url(col("url"), lit("HOST"))
            .isin("src0.example.com", "src13.example.com")
            .cast("int").as("is_blocked"))
        .orderBy(col("doc_id"))
    }),

    // Date-spine fill: a complete (month × status) reporting grid even
    // where no orders exist — sequence() generates the month spine from
    // the observed bounds, cross-joined with the status dim and
    // left-joined to the aggregate, zeros filled. The spine is
    // bounds-derived (two-row broadcast), never hand-enumerated.
    "q_date_spine" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .select(date_trunc("month", col("o_orderdate")).as("m"),
          col("o_orderstatus"), col("o_totalprice"))
      val spine = o.agg(min(col("m")).as("mn"), max(col("m")).as("mx"))
        .select(explode(sequence(col("mn"), col("mx"),
          expr("interval 1 month"))).as("m"))
      val grid = spine.crossJoin(o.select(col("o_orderstatus")).distinct())
      val agg = o.groupBy(col("m"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("revenue"))
      grid.join(agg, Seq("m", "o_orderstatus"), "left")
        .select(date_format(col("m"), "yyyy-MM").as("month"),
          col("o_orderstatus"),
          coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("revenue"), lit(0.0)).as("revenue"))
        .orderBy(col("month"), col("o_orderstatus"))
    }),

    // Array / higher-order-function surface in one pass: tokenize, dedup
    // + sort, set-intersect against a literal vocabulary, fold token
    // lengths, and slice a preview — all codegen-resident per-row array
    // kernels (zero explodes, zero shuffles before the final sort).
    // Set-valued intermediates are sorted before use because Spark and
    // DuckDB order set-op results differently.
    "q_array_ops" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("toks", split(col("text"), " "))
        .withColumn("uniq", array_sort(array_distinct(col("toks"))))
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("n_tok"),
          size(col("uniq")).cast("long").as("n_uniq"),
          array_join(slice(col("uniq"), 1, 5), ",").as("uniq_head"),
          size(array_sort(array_intersect(col("uniq"),
            array(lit("table"), lit("join"), lit("scan"), lit("vector")))))
            .cast("long").as("n_vocab_hits"),
          expr("aggregate(toks, 0L, (acc, x) -> acc + length(x))").as("sum_len"))
        .orderBy(col("doc_id"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_json_extract" ->
      """WITH e AS (
        |  SELECT event_type, CAST(props->>'k' AS INT) AS k FROM events
        |)
        |SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(k) AS BIGINT) AS sum_k,
        |  MIN(k) AS min_k, MAX(k) AS max_k,
        |  CAST(SUM(CASE WHEN k >= 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_high
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_cohort_retention" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts)//1000//86400000000//7 AS week FROM events
        |), c AS (
        |  SELECT user_id, MIN(week) AS cohort_week FROM e GROUP BY user_id
        |)
        |SELECT cohort_week, week - cohort_week AS "offset",
        |  COUNT(DISTINCT e.user_id) AS n_users
        |FROM e JOIN c ON e.user_id = c.user_id
        |GROUP BY cohort_week, week - cohort_week
        |ORDER BY cohort_week, "offset"""".stripMargin,

    "q_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_ns(ts)//1000 AS tk FROM events
        |), v AS (
        |  SELECT user_id, MIN(tk) AS t_view FROM e
        |  WHERE event_type = 'view' GROUP BY user_id
        |), c AS (
        |  SELECT e.user_id, MIN(tk) AS t_click FROM e JOIN v ON e.user_id = v.user_id
        |  WHERE event_type = 'click' AND tk > t_view GROUP BY e.user_id
        |), p AS (
        |  SELECT e.user_id, MIN(tk) AS t_purchase FROM e JOIN c ON e.user_id = c.user_id
        |  WHERE event_type = 'purchase' AND tk > t_click GROUP BY e.user_id
        |)
        |SELECT (SELECT COUNT(*) FROM v) AS n_view,
        |  (SELECT COUNT(*) FROM c) AS n_click_after,
        |  (SELECT COUNT(*) FROM p) AS n_purchase_after""".stripMargin,

    "q_mom_growth" ->
      s"""WITH m AS (
         |  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         |    ${sql.dsum("o_totalprice")} AS revenue,
         |    COUNT(*) AS n_orders
         |  FROM orders GROUP BY strftime(o_orderdate, '%Y-%m')
         |)
         |SELECT month, revenue, n_orders,
         |  lag(revenue, 1) OVER (ORDER BY month) AS prev_revenue,
         |  ROUND((revenue - lag(revenue, 1) OVER (ORDER BY month))
         |    / lag(revenue, 1) OVER (ORDER BY month) * 100, 6) AS growth_pct
         |FROM m ORDER BY month""".stripMargin,

    "q_url_parse" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    'https://' || source || '.example.com/docs/'
        |      || CAST(doc_id AS VARCHAR) || '?lang=' || lang AS url
        |  FROM documents
        |)
        |SELECT doc_id,
        |  regexp_extract(url, 'https://([^/]+)(/[^?]*)', 1) AS host,
        |  regexp_extract(url, 'https://([^/]+)(/[^?]*)', 2) AS path,
        |  regexp_extract(url, '\?(.*)$', 1) AS query,
        |  CAST(regexp_extract(url, 'https://([^/]+)(/[^?]*)', 1)
        |    IN ('src0.example.com', 'src13.example.com') AS INT) AS is_blocked
        |FROM d ORDER BY doc_id""".stripMargin,

    "q_date_spine" ->
      s"""WITH o AS (
         |  SELECT date_trunc('month', o_orderdate) AS m, o_orderstatus, o_totalprice
         |  FROM orders
         |), spine AS (
         |  SELECT unnest(generate_series((SELECT MIN(m) FROM o),
         |    (SELECT MAX(m) FROM o), INTERVAL 1 MONTH)) AS m
         |), grid AS (
         |  SELECT spine.m, st.o_orderstatus
         |  FROM spine CROSS JOIN (SELECT DISTINCT o_orderstatus FROM o) st
         |), agg AS (
         |  SELECT m, o_orderstatus, COUNT(*) AS n,
         |    ${sql.dsum("o_totalprice")} AS revenue
         |  FROM o GROUP BY m, o_orderstatus
         |)
         |SELECT strftime(grid.m, '%Y-%m') AS month,
         |  grid.o_orderstatus AS o_orderstatus,
         |  COALESCE(agg.n, 0) AS n, COALESCE(agg.revenue, 0.0) AS revenue
         |FROM grid LEFT JOIN agg
         |  ON grid.m = agg.m AND grid.o_orderstatus = agg.o_orderstatus
         |ORDER BY month, o_orderstatus""".stripMargin,

    "q_array_ops" ->
      """WITH d AS (
        |  SELECT doc_id, str_split(text, ' ') AS toks,
        |    list_sort(list_distinct(str_split(text, ' '))) AS uniq
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CAST(len(toks) AS BIGINT) AS n_tok,
        |  CAST(len(uniq) AS BIGINT) AS n_uniq,
        |  array_to_string(list_slice(uniq, 1, 5), ',') AS uniq_head,
        |  CAST(len(list_sort(list_intersect(uniq,
        |    ['table', 'join', 'scan', 'vector']))) AS BIGINT) AS n_vocab_hits,
        |  CAST(list_aggregate(list_transform(toks, x -> len(x)), 'sum') AS BIGINT)
        |    AS sum_len
        |FROM d ORDER BY doc_id""".stripMargin
  )
}
