package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.QueryKit._

/** Core relational operator coverage (SURVEY.md §2.3–§2.8).
  *
  * Each query maps one or more inventory rows (P*, F*, J*, A*, W*, O*) of
  * the reference (Hazzais/fantasy_premier_league, see SURVEY.md citations)
  * onto the benchmark tables. All joins against dimension tables are
  * broadcast (dims are tiny relative to fact tables at any scale); all
  * aggregates are hash aggregates with map-side partials — both survive a
  * 1000-executor scale-up without plan changes.
  */
object RelationalQueries extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A1/A10 — grouped sums over the fact table (ref: league-table group-sum,
    // etl/run_transform.py:426-440). TPC-H Q1 shape: partial agg map-side,
    // 6-group output → no skew, shuffle is 6 rows per partition.
    "q_agg_groupsum" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          revSum(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
          r6(avg(col("l_discount"))).as("avg_disc"),
          count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // P1/P2/P3/P10 — projection, rename, scalar string fn
    // (ref: bulk renames etl/run_transform.py:87-114).
    "q_proj_rename" -> ((s, dir) => {
      t(s, dir, "customer")
        .select(
          col("c_custkey").as("id"),
          lower(col("c_name")).as("name_lc"),
          col("c_mktsegment").as("segment"))
        .orderBy(col("id"))
    }),

    // P4 — NaN-safe int-string coercion (ref: pandas_integerstr_to_int,
    // etl/transform.py:59-66). floor() first: Spark's double→long cast
    // truncates while DuckDB's rounds, floor makes both exact.
    "q_intstr_coercion" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          floor(when(col("l_discount") > 0.05, lit(null))
            .otherwise(col("l_quantity")))
            .cast("long").cast("string")
            .as("qty_str"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // P5 — lenient timestamp parse, null on failure (ref:
    // etl/run_transform.py:111-112 errors='coerce').
    "q_ts_parse" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          date_format(
            try_to_timestamp(
              when(col("o_orderkey") % 7 === 0, lit("not a date"))
                .otherwise(date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"))),
            "yyyy-MM-dd HH:mm:ss").as("ts_str"))
        .orderBy(col("o_orderkey"))
    }),

    // P6/P8/P9 — conditional select, boolean arithmetic, masked null
    // (ref: etl/run_transform.py:358-360,392-400,399).
    "q_conditional_flags" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          when(col("o_orderstatus") === "F", 1).otherwise(0).as("is_finished"),
          (when(col("o_totalprice") > 200000, 3).otherwise(0) +
            when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0)).as("score"),
          when(col("o_orderstatus") =!= "O",
            when(col("o_totalprice") > 100000, 1).otherwise(0)).as("big_when_closed"))
        .orderBy(col("o_orderkey"))
    }),

    // P10/P11/P13/P24 — lower+regex_replace, containment flag, concat_ws,
    // regex strip (ref: etl/additional_fifa.py:193-201,348-352).
    "q_string_ops" -> ((s, dir) => {
      t(s, dir, "part")
        .select(
          col("p_partkey"),
          regexp_replace(lower(col("p_name")), "[aeiou]", "").as("name_novowel"),
          col("p_type").contains("ECO").cast("int").as("is_eco"),
          concat_ws("#", col("p_brand"), col("p_type")).as("brand_type"),
          regexp_replace(col("p_brand"), "\\d+$", "").as("brand_stem"))
        .orderBy(col("p_partkey"))
    }),

    // Exact edit distance (beyond-reference — the exact-metric cousin of
    // the token_set_ratio fuzzy family; Levenshtein is deterministic, so
    // unlike the rapidfuzz kernel it is oracle-checkable directly).
    "q_edit_distance" -> ((s, dir) => {
      t(s, dir, "part")
        .select(col("p_partkey"),
          levenshtein(lower(col("p_name")),
            regexp_replace(lower(col("p_name")), "[aeiou]", "")).as("vowel_dist"),
          levenshtein(col("p_brand"), lit("Brand#00")).as("brand_dist"))
        .orderBy(col("p_partkey"))
    }),

    // P12/P14/P20 — split→columns, dict-map lookup (missing→null), binning
    // (ref: EDA cell 42, etl/additional_fifa.py:40-61, helpers.py:86-94).
    "q_split_map_bin" -> ((s, dir) => {
      t(s, dir, "part")
        .select(
          col("p_partkey"),
          element_at(split(col("p_name"), " "), 1).as("name_head"),
          element_at(split(col("p_name"), " "), 2).as("name_tail"),
          when(col("p_size") < 10, "small")
            .when(col("p_size") < 25, "moderate")
            .when(col("p_size") < 40, "big")
            .otherwise("bigger").as("size_bin"),
          when(col("p_type") === "ECONOMY", 1)
            .when(col("p_type") === "PROMO", 2)
            .when(col("p_type") === "LARGE", 3).as("type_code"))
        .orderBy(col("p_partkey"))
    }),

    // P16/P17/P18 — datetime parts, cyclic features, datediff
    // (ref: EDA cells 29-32).
    "q_datetime_features" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("d"),
          dayofweek(col("o_orderdate")).as("dow"),
          r6(sin(dayofyear(col("o_orderdate")).cast("double") * lit(6.283185307179586) / lit(365))).as("doy_sin"),
          r6(cos(dayofyear(col("o_orderdate")).cast("double") * lit(6.283185307179586) / lit(365))).as("doy_cos"),
          datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")).as("days_since"))
        .orderBy(col("o_orderkey"))
    }),

    // F1/F2/O5 — null-key drop + duplicate-PK resolution via window count
    // (ref: etl/run_transform.py:327-335,365-370). At scale: the window is
    // partitioned by the PK → same shuffle as the dedup groupBy, no skew.
    "q_dedup_pk" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val dup = o.filter(col("o_orderkey") % 100 === 0)
        .withColumn("o_totalprice", lit(null).cast("double"))
      val u = o.unionByName(dup)
      val w = Window.partitionBy(col("o_orderkey"))
      u.withColumn("cnt", count(lit(1)).over(w))
        .filter(!(col("cnt") > 1 && col("o_totalprice").isNull))
        .select(col("o_orderkey"), col("o_totalprice"), col("cnt"))
        .orderBy(col("o_orderkey"))
    }),

    // J1/A1 — fact ⋈ broadcast dim + grouped agg (ref: etl/run_transform.py
    // :295-300). part is a dimension: broadcast, no shuffle on the fact side.
    "q_join_broadcast_agg" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val p = t(s, dir, "part")
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(
          revSum(col("l_extendedprice"), col("l_discount")).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy(col("p_brand"))
    }),

    // F4 — anti membership as left_anti join (ref: etl/additional_fifa.py
    // :303-311). At scale: broadcast the distinct key set if small, else
    // shuffled anti-join — Catalyst/AQE picks per stats.
    "q_anti_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val pending = t(s, dir, "orders").filter(col("o_orderstatus") === "P")
      c.join(pending, c("c_custkey") === pending("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // O2/O4 — global sort + top-k. Spark runs TakeOrderedAndProject: no
    // full sort, each partition keeps k rows → scales to any input size.
    "q_topk" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("o_totalprice"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_agg_groupsum" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sql.dsum("l_quantity")} AS sum_qty,
         |  ${sql.dsum("l_extendedprice")} AS sum_base_price,
         |  ${sql.revSum("l_extendedprice", "l_discount")} AS sum_disc_price,
         |  ROUND(AVG(l_discount), 6) AS avg_disc,
         |  COUNT(*) AS cnt
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_proj_rename" ->
      """SELECT c_custkey AS id, lower(c_name) AS name_lc, c_mktsegment AS segment
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_intstr_coercion" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(FLOOR(CASE WHEN l_discount > 0.05 THEN NULL ELSE l_quantity END) AS BIGINT) AS VARCHAR) AS qty_str
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_ts_parse" ->
      """SELECT o_orderkey,
        |  strftime(TRY_CAST(CASE WHEN o_orderkey % 7 = 0 THEN 'not a date'
        |    ELSE strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') END AS TIMESTAMP),
        |    '%Y-%m-%d %H:%M:%S') AS ts_str
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_conditional_flags" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS is_finished,
        |  (CASE WHEN o_totalprice > 200000 THEN 3 ELSE 0 END
        |   + CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS score,
        |  CASE WHEN o_orderstatus <> 'O'
        |    THEN (CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END) END AS big_when_closed
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_edit_distance" ->
      """SELECT p_partkey,
        |  CAST(levenshtein(lower(p_name),
        |    regexp_replace(lower(p_name), '[aeiou]', '', 'g')) AS INT) AS vowel_dist,
        |  CAST(levenshtein(p_brand, 'Brand#00') AS INT) AS brand_dist
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_string_ops" ->
      """SELECT p_partkey,
        |  regexp_replace(lower(p_name), '[aeiou]', '', 'g') AS name_novowel,
        |  CAST(contains(p_type, 'ECO') AS INT) AS is_eco,
        |  concat_ws('#', p_brand, p_type) AS brand_type,
        |  regexp_replace(p_brand, '\d+$', '', 'g') AS brand_stem
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_split_map_bin" ->
      """SELECT p_partkey,
        |  string_split(p_name, ' ')[1] AS name_head,
        |  string_split(p_name, ' ')[2] AS name_tail,
        |  CASE WHEN p_size < 10 THEN 'small' WHEN p_size < 25 THEN 'moderate'
        |       WHEN p_size < 40 THEN 'big' ELSE 'bigger' END AS size_bin,
        |  CASE WHEN p_type = 'ECONOMY' THEN 1 WHEN p_type = 'PROMO' THEN 2
        |       WHEN p_type = 'LARGE' THEN 3 END AS type_code
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_datetime_features" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS y, month(o_orderdate) AS m,
        |  dayofmonth(o_orderdate) AS d, dayofweek(o_orderdate) + 1 AS dow,
        |  ROUND(sin(CAST(dayofyear(o_orderdate) AS DOUBLE) * 6.283185307179586 / 365), 6) AS doy_sin,
        |  ROUND(cos(CAST(dayofyear(o_orderdate) AS DOUBLE) * 6.283185307179586 / 365), 6) AS doy_cos,
        |  datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_dedup_pk" ->
      """WITH u AS (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, NULL AS o_totalprice FROM orders WHERE o_orderkey % 100 = 0
        |), c AS (
        |  SELECT o_orderkey, o_totalprice, COUNT(*) OVER (PARTITION BY o_orderkey) AS cnt FROM u
        |)
        |SELECT o_orderkey, o_totalprice, cnt FROM c
        |WHERE NOT (cnt > 1 AND o_totalprice IS NULL) ORDER BY o_orderkey""".stripMargin,

    "q_join_broadcast_agg" ->
      s"""SELECT p_brand,
         |  ${sql.revSum("l_extendedprice", "l_discount")} AS revenue,
         |  COUNT(*) AS n
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,

    "q_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin
  )
}
