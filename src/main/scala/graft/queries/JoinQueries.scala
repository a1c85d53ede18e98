package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.QueryKit._
import graft.expressions.GraftExtensions
import graft.operators.{AsOfJoin, RangeJoin, SkewJoin}

/** Join coverage (SURVEY.md §2.5): outer joins, semi/anti, intersect,
  * role-playing self joins, theta/cartesian, and the as-of join.
  *
  * Scale notes: all dimension joins are explicit `broadcast()`; the
  * fact-fact joins (lineitem ⋈ orders) shuffle on the join key, which is
  * also the natural bucketing key at cluster scale. The as-of join uses a
  * union + window carry-forward (no candidate-pair explosion; see
  * graft.operators.AsOfJoin).
  */
object JoinQueries extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Interval (range) join via the bucketed equi-join operator — the
    // non-equi join Spark would otherwise plan as a nested loop /
    // cartesian. Shipments falling inside sampled 7-day promo windows,
    // counted per window. PlanSpec asserts the plan has no
    // CartesianProduct / BroadcastNestedLoop.
    "q_range_join" -> ((s, dir) => {
      val epoch = to_date(lit("1990-01-01"))
      val li = t(s, dir, "lineitem")
        .select(datediff(col("l_shipdate"), epoch).cast("long").as("ship_day"))
      val iv = t(s, dir, "orders").filter(col("o_orderkey") % 199 === 0)
        .select(col("o_orderkey").as("promo_id"),
          datediff(col("o_orderdate"), epoch).cast("long").as("lo"))
        .withColumn("hi", col("lo") + 7)
      RangeJoin.bucketed(li, iv, col("ship_day"), col("lo"), col("hi"), 7L)
        .groupBy(col("promo_id"))
        .agg(count(lit(1)).as("n_ships"))
        .orderBy(col("promo_id"))
    }),

    // J3 — left join with genuinely unmatched rows (ref: attach position_id
    // etl/run_transform.py:361-364). Build side filtered → nulls appear.
    "q_join_left" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val rich = t(s, dir, "customer").filter(col("c_acctbal") > 5000)
        .select(col("c_custkey"), col("c_name"))
      o.join(broadcast(rich), o("o_custkey") === rich("c_custkey"), "left")
        .select(col("o_orderkey"), col("o_custkey"), col("c_name"))
        .orderBy(col("o_orderkey"))
    }),

    // J11 — right join (ref: EDA cell 39 how='right').
    "q_join_right" -> ((s, dir) => {
      val big = t(s, dir, "orders").filter(col("o_totalprice") > 400000)
        .select(col("o_orderkey"), col("o_custkey"))
      val c = t(s, dir, "customer")
      big.join(c, big("o_custkey") === c("c_custkey"), "right")
        .select(col("c_custkey"), col("o_orderkey"))
        .orderBy(col("c_custkey"), col("o_orderkey"))
    }),

    // J12 — role-playing dimension: nation joined twice as supplier-nation
    // and customer-nation (ref: EDA cell 72 teams-as-opponent). TPC-H Q7
    // shape; both nation joins broadcast, fact-fact join shuffles on
    // orderkey.
    "q_self_role_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val sup = t(s, dir, "supplier")
      val n1 = t(s, dir, "nation").select(
        col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val n2 = t(s, dir, "nation").select(
        col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("sn_key"))
        .join(broadcast(n2), col("c_nationkey") === col("cn_key"))
        .groupBy(col("supp_nation"), col("cust_nation"))
        .agg(revSum(col("l_extendedprice"), col("l_discount")).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy(col("supp_nation"), col("cust_nation"))
    }),

    // J8+F5 — cartesian with non-equi predicate (theta join; ref: fuzzy
    // candidate pairs etl/additional_fifa.py:314-340 + position prune
    // :174-190). Catalyst plans BroadcastNestedLoop — fine because one side
    // is a broadcastable dim; at scale the prune predicate bounds output.
    "q_cross_theta" -> ((s, dir) => {
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      n.crossJoin(broadcast(r))
        .filter(col("n_nationkey") % 3 === col("r_regionkey") &&
          col("n_regionkey") =!= col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"), col("r_regionkey"), col("r_name"))
        .orderBy(col("n_nationkey"), col("r_regionkey"))
    }),

    // J7/O9 — INTERSECT (ref: etl/additional_fifa.py:232-241).
    "q_intersect" -> ((s, dir) => {
      val a = t(s, dir, "orders").select(col("o_custkey").as("custkey"))
      val b = t(s, dir, "customer").filter(col("c_acctbal") > 7000)
        .select(col("c_custkey").as("custkey"))
      a.intersect(b).orderBy(col("custkey"))
    }),

    // F4 — left_semi membership (ref: isin splits, modelling_1 cell 3).
    "q_semi_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val urgent = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
      c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }),

    // F4b — anti join, non-empty: customers with no order above 300k.
    "q_anti_join_threshold" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val big = t(s, dir, "orders").filter(col("o_totalprice") > 300000)
      c.join(big, c("c_custkey") === big("o_custkey"), "left_anti")
        .select(col("c_custkey"))
        .orderBy(col("c_custkey"))
    }),

    // J10 — backward as-of join: for each purchase event, the latest click
    // of the same user at or before it (ref: gameweek snapshot as-of,
    // modelling_1 cell 19). Time key = microseconds since epoch (events.ts
    // is ns parquet; Spark truncates to us, oracle uses epoch_ns//1000).
    "q_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), Tables.tsMicros.as("tkey"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_event_id"), col("user_id"),
          Tables.tsMicros.as("click_tkey"))
      AsOfJoin.backward(
        left = purchases, right = clicks,
        key = "user_id", leftTime = "tkey", rightTime = "click_tkey",
        rightPayload = Seq("click_event_id", "click_tkey"),
        leftTieBreak = "event_id", rightTieBreak = "click_event_id")
        .select(col("event_id"), col("user_id"), col("tkey"),
          col("asof_click_event_id").as("click_event_id"),
          col("asof_click_tkey").as("click_tkey"))
        .orderBy(col("event_id"))
    }),

    // J10 forward + tolerance — the rest of the pandas merge_asof surface:
    // for each purchase, the NEXT click at/after it, nulled when farther
    // than 2 days out. Same union+window shape, mirrored.
    "q_asof_forward" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), Tables.tsMicros.as("tkey"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_event_id"), col("user_id"),
          Tables.tsMicros.as("click_tkey"))
      val twoDaysUs = 2L * 24 * 3600 * 1000000
      val joined = AsOfJoin.forward(
        left = purchases, right = clicks,
        key = "user_id", leftTime = "tkey", rightTime = "click_tkey",
        rightPayload = Seq("click_event_id", "click_tkey"),
        leftTieBreak = "event_id", rightTieBreak = "click_event_id")
      AsOfJoin.applyTolerance(joined, "tkey", "asof_click_tkey",
        lit(twoDaysUs), Seq("asof_click_event_id", "asof_click_tkey"),
        forwardDir = true)
        .select(col("event_id"), col("user_id"), col("tkey"),
          col("asof_click_event_id").as("next_click_event_id"),
          col("asof_click_tkey").as("next_click_tkey"))
        .orderBy(col("event_id"))
    }),

    // NULL-SAFE equi-join (<=> / IS NOT DISTINCT FROM): null keys match
    // each other instead of silently dropping — the semantics pandas
    // merge users trip over when NaN keys vanish from an inner join.
    // Still a hash-partitionable equi-join (null is just one more key
    // value), so the plan is identical to a plain join at any scale.
    // SALTED skewed equi-join (operators.SkewJoin): events joined to a
    // tiny per-type dim on event_type — a handful of key values, each
    // owning a fat slice of a 100 TB fact table, exactly the shape where
    // a plain shuffle join serializes each hot key into ONE reducer.
    // saltedJoin spreads every key over 8 reducers by joining on
    // (key, salt) with the dim replicated 8×; the salt is internal and
    // dropped, so the result — and the oracle — is the plain join. The
    // post-join per-type aggregate is safe on the same grounds: partial
    // aggregation combines each reducer's slice before the final 5-row
    // exchange. (AQE skew-split is the automatic alternative; salting is
    // the explicit form that also works for broadcast-ineligible builds.)
    "q_salted_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val dim = t(s, dir, "events")
        .select(col("event_type")).distinct()
        .withColumn("type_weight", length(col("event_type")).cast("long"))
      SkewJoin.saltedJoin(ev, dim, "event_type", salts = 8)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)") * col("type_weight"))
            .cast("double").as("weighted_value"))
        .orderBy(col("event_type"))
    }),

    // BLOOM-PREFILTERED semi join (expressions.BloomMightContain): the
    // platinum-customer key set is assumed too large to broadcast as a
    // hash relation at 100 TB, but its ~10-bits/key bloom fits in every
    // executor. The filter is built DISTRIBUTED (stat.bloomFilter is a
    // treeAggregate; only the final sketch reaches the driver), embedded
    // as a plan literal, and probes orders BEFORE the join's exchange —
    // the shuffle then moves only might-match rows (~fpp overshoot). The
    // exact semi join afterwards removes false positives, which is why
    // this hash-matches the plain semi-join oracle at any fpp. Spark's
    // own InjectRuntimeFilter produces this exact shape but is internal
    // and gated on 10 GB scans; this is the explicit, always-on form.
    "q_bloom_prefilter" -> ((s, dir) => {
      GraftExtensions.register(s)
      val platinum = t(s, dir, "customer")
        .filter(col("c_acctbal") > 9000)
        .select(col("c_custkey"))
      // Capacity sized FROM THE DATA: an HLL approx count of the build
      // side (one tiny aggregate; deterministic) with 2× headroom so the
      // realized fpp stays at-or-under the nominal 2% even at the HLL's
      // error bound. A fixed literal capacity either wastes executor
      // memory (oversized) or silently degrades the prefilter to a
      // pass-through (undersized — fpp → 1 and the shuffle moves
      // everything again); correctness is unaffected either way, which
      // is exactly why the sizing must be engineered, not assumed.
      val nKeys = math.max(1024L,
        platinum.agg(approx_count_distinct("c_custkey")).head.getLong(0))
      val bf = platinum.stat.bloomFilter("c_custkey", 2L * nKeys, 0.02)
      val bytes = {
        val bos = new java.io.ByteArrayOutputStream()
        bf.writeTo(bos)
        bos.toByteArray
      }
      val o = t(s, dir, "orders")
        .filter(call_function("graft_bloom_contains",
          lit(bytes), col("o_custkey")))
      o.join(platinum, o("o_custkey") === platinum("c_custkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderpriority"))
    }),

    "q_nullsafe_join" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .withColumn("k",
          when(col("o_orderkey") % 13 === 0, lit(null).cast("long"))
            .otherwise(col("o_custkey") % 100))
      val dim = t(s, dir, "customer")
        .select(
          when(col("c_custkey") % 11 === 0, lit(null).cast("long"))
            .otherwise(col("c_custkey") % 100).as("k"))
        .distinct()
        .withColumn("dim_hit", lit(1L))
      o.join(dim, o("k") <=> dim("k"))
        .groupBy(o("k").as("k"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("k").asc_nulls_first)
    })
  )

  val oracle: Map[String, String] = Map(
    "q_salted_join" ->
      """WITH dim AS (
        |  SELECT DISTINCT event_type,
        |    CAST(length(event_type) AS BIGINT) AS type_weight
        |  FROM events
        |)
        |SELECT e.event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(e.value AS DECIMAL(18,2)) * dim.type_weight) AS DOUBLE)
        |    AS weighted_value
        |FROM events e JOIN dim ON e.event_type = dim.event_type
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    "q_bloom_prefilter" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM customer
        |  WHERE c_custkey = o_custkey AND c_acctbal > 9000)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_nullsafe_join" ->
      """WITH o AS (
        |  SELECT CASE WHEN o_orderkey % 13 = 0 THEN NULL
        |    ELSE o_custkey % 100 END AS k
        |  FROM orders
        |), dim AS (
        |  SELECT DISTINCT CASE WHEN c_custkey % 11 = 0 THEN NULL
        |    ELSE c_custkey % 100 END AS k
        |  FROM customer
        |)
        |SELECT o.k, COUNT(*) AS n_orders
        |FROM o JOIN dim ON o.k IS NOT DISTINCT FROM dim.k
        |GROUP BY o.k ORDER BY o.k NULLS FIRST""".stripMargin,

    "q_range_join" ->
      """WITH li AS (
        |  SELECT date_diff('day', DATE '1990-01-01', l_shipdate) AS ship_day FROM lineitem
        |), iv AS (
        |  SELECT o_orderkey AS promo_id,
        |    date_diff('day', DATE '1990-01-01', o_orderdate) AS lo,
        |    date_diff('day', DATE '1990-01-01', o_orderdate) + 7 AS hi
        |  FROM orders WHERE o_orderkey % 199 = 0
        |)
        |SELECT promo_id, COUNT(*) AS n_ships
        |FROM li JOIN iv ON ship_day BETWEEN lo AND hi
        |GROUP BY promo_id ORDER BY promo_id""".stripMargin,

    "q_join_left" ->
      """SELECT o_orderkey, o_custkey, c_name
        |FROM orders LEFT JOIN (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 5000) r
        |  ON o_custkey = r.c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "q_join_right" ->
      """SELECT c_custkey, o_orderkey
        |FROM (SELECT o_orderkey, o_custkey FROM orders WHERE o_totalprice > 400000) b
        |RIGHT JOIN customer ON b.o_custkey = c_custkey
        |ORDER BY c_custkey, o_orderkey""".stripMargin,

    "q_self_role_join" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  ${sql.revSum("l_extendedprice", "l_discount")} AS revenue,
         |  COUNT(*) AS n
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |GROUP BY n1.n_name, n2.n_name
         |ORDER BY supp_nation, cust_nation""".stripMargin,

    "q_cross_theta" ->
      """SELECT n_nationkey, n_name, r_regionkey, r_name
        |FROM nation CROSS JOIN region
        |WHERE n_nationkey % 3 = r_regionkey AND n_regionkey <> r_regionkey
        |ORDER BY n_nationkey, r_regionkey""".stripMargin,

    "q_intersect" ->
      """SELECT o_custkey AS custkey FROM orders
        |INTERSECT
        |SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 7000
        |ORDER BY custkey""".stripMargin,

    "q_semi_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q_anti_join_threshold" ->
      """SELECT c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,

    "q_asof_join" ->
      """WITH p AS (
        |  SELECT event_id, user_id, epoch_ns(ts)//1000 AS tkey
        |  FROM events WHERE event_type = 'purchase'
        |), c AS (
        |  SELECT event_id AS click_event_id, user_id, epoch_ns(ts)//1000 AS click_tkey
        |  FROM events WHERE event_type = 'click'
        |), u AS (
        |  SELECT user_id, tkey AS t, 1 AS is_left, event_id, tkey,
        |         NULL::BIGINT AS r_id, NULL::BIGINT AS r_t FROM p
        |  UNION ALL
        |  SELECT user_id, click_tkey AS t, 0 AS is_left, NULL, NULL,
        |         click_event_id, click_tkey FROM c
        |), f AS (
        |  SELECT *,
        |    last_value(r_id IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY t, is_left, r_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_event_id,
        |    last_value(r_t IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY t, is_left, r_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_tkey
        |  FROM u
        |)
        |SELECT event_id, user_id, tkey, click_event_id, click_tkey
        |FROM f WHERE is_left = 1 ORDER BY event_id""".stripMargin,

    "q_asof_forward" ->
      """WITH p AS (
        |  SELECT event_id, user_id, epoch_ns(ts)//1000 AS tkey
        |  FROM events WHERE event_type = 'purchase'
        |), c AS (
        |  SELECT event_id AS click_event_id, user_id, epoch_ns(ts)//1000 AS click_tkey
        |  FROM events WHERE event_type = 'click'
        |), u AS (
        |  SELECT user_id, tkey AS t, 1 AS is_left, 0 AS ord, event_id, tkey,
        |         NULL::BIGINT AS r_id, NULL::BIGINT AS r_t FROM p
        |  UNION ALL
        |  SELECT user_id, click_tkey AS t, 0 AS is_left, 1 AS ord, NULL, NULL,
        |         click_event_id, click_tkey FROM c
        |), f AS (
        |  SELECT *,
        |    first_value(r_id IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY t, ord, r_id
        |       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nid,
        |    first_value(r_t IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY t, ord, r_id
        |       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
        |  FROM u
        |)
        |SELECT event_id, user_id, tkey,
        |  CASE WHEN nt IS NOT NULL AND nt - tkey <= 172800000000 THEN nid END AS next_click_event_id,
        |  CASE WHEN nt IS NOT NULL AND nt - tkey <= 172800000000 THEN nt END AS next_click_tkey
        |FROM f WHERE is_left = 1 ORDER BY event_id""".stripMargin
  )
}
