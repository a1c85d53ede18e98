package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.QueryKit._

/** Warehouse / ETL maintenance operators: SCD2 history compression, CDC
  * snapshot diffing, event-path mining, per-group top-k, equal-width
  * histograms, and MapType machinery. Every query has a DuckDB oracle.
  */
object WarehouseQueries extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // SCD Type-2 history build from an event log: consecutive equal
    // attribute values collapse into one validity interval (only change
    // rows open a new one), valid_to comes from the next change, the
    // open interval is flagged current. Both windows share one (user_id)
    // partitioning — a single shuffle end-to-end.
    "q_scd2" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("tk"), col("event_id"))
      val chg = t(s, dir, "events")
        .select(col("user_id"), col("event_id"), expr("ts DIV 1000").as("tk"),
          col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      val w2 = Window.partitionBy(col("user_id"))
        .orderBy(col("tk"), col("event_id"))
      chg.withColumn("valid_to", lead(col("tk"), 1).over(w2))
        .select(col("user_id"), col("event_type").as("status"),
          col("tk").as("valid_from"), col("valid_to"),
          col("valid_to").isNull.cast("int").as("is_current"))
        .orderBy(col("user_id"), col("valid_from"))
    }),

    // CDC snapshot diff: two simulated snapshots of the orders dimension
    // (disjoint 10% slices removed, a third of prices adjusted) full-outer
    // joined on the PK and classified added / removed / changed. The join
    // shuffles on the PK only; at 100 TB both sides prune columns to
    // (key, compared attrs) at the scan.
    "q_snapshot_diff" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val old = o.filter(col("o_orderkey") % 10 =!= 0)
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("old_price"))
      val neu = o.filter(col("o_orderkey") % 10 =!= 1)
        .select(col("o_orderkey").as("k"),
          when(col("o_orderkey") % 3 === 0, col("o_totalprice") + 1000.0)
            .otherwise(col("o_totalprice")).as("new_price"))
      old.join(neu, Seq("k"), "full_outer")
        .withColumn("change_type",
          when(col("old_price").isNull, lit("added"))
            .when(col("new_price").isNull, lit("removed"))
            .when(col("old_price") =!= col("new_price"), lit("changed"))
            .otherwise(lit("same")))
        .filter(col("change_type") =!= "same")
        .select(col("k").as("o_orderkey"), col("change_type"),
          col("old_price"), col("new_price"))
        .orderBy(col("o_orderkey"))
    }),

    // MERGE-style upsert (the apply side of the CDC diff): a changes
    // batch full-outer joins the target on the PK — matched rows take
    // the source values (update), unmatched source rows insert,
    // unmatched target rows carry over — emitting the merged table plus
    // the per-row action. One PK shuffle; at 100 TB this is the
    // copy-on-write MERGE INTO plan without a table format.
    "q_merge_upsert" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val target = o.filter(col("o_orderkey") % 10 =!= 0)
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("t_price"),
          col("o_orderstatus").as("t_status"))
      val source = o.filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey").as("k"),
          (col("o_totalprice") + 1000.0).as("s_price"),
          lit("U").as("s_status"))
      target.join(source, Seq("k"), "full_outer")
        .select(col("k").as("o_orderkey"),
          coalesce(col("s_price"), col("t_price")).as("price"),
          coalesce(col("s_status"), col("t_status")).as("status"),
          when(col("s_price").isNotNull && col("t_price").isNotNull, "update")
            .when(col("t_price").isNull, "insert")
            .otherwise("keep").as("action"))
        .orderBy(col("o_orderkey"))
    }),

    // Incremental view maintenance: a materialized aggregate updates
    // from a CDC delta batch (inserts weight +1, deletes −1) by MERGING
    // partials — the base aggregate is never recomputed and the delta
    // is the only data scanned twice. Counts and exact-DECIMAL sums are
    // mergeable, so (base ⊎ delta) is bit-identical to the full
    // recompute over (base ∖ deletes) ∪ inserts, which is exactly what
    // the oracle computes. At 100 TB this is the difference between
    // touching a day's delta and re-scanning the table.
    "q_incremental_agg" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val baseAgg = o.filter(col("o_orderkey") % 10 =!= 0)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
      val delta = o.filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderpriority"), col("o_totalprice"), lit(1L).as("w"))
        .unionAll(o.filter(col("o_orderkey") % 10 =!= 0 &&
            col("o_orderkey") % 7 === 0)
          .select(col("o_orderpriority"), col("o_totalprice"), lit(-1L).as("w")))
      val deltaAgg = delta.groupBy(col("o_orderpriority"))
        .agg(sum(col("w")).as("dn"),
          sum(col("o_totalprice").cast("decimal(18,2)") * col("w")).as("drev"))
      baseAgg.join(deltaAgg, Seq("o_orderpriority"), "full_outer")
        .select(col("o_orderpriority"),
          (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
          (coalesce(col("rev"), lit(0).cast("decimal(18,2)")) +
            coalesce(col("drev"), lit(0).cast("decimal(18,2)")))
            .cast("double").as("revenue"))
        .filter(col("n") > 0)
        .orderBy(col("o_orderpriority"))
    }),

    // Event-path mining: each user's first five event types in time order
    // become a '>'-joined journey string; journeys are counted and the
    // top 20 reported. The per-user path assembly sorts tiny 5-element
    // arrays; nothing global is ever single-task.
    "q_event_paths" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("tk"), col("event_id"))
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"), expr("ts DIV 1000").as("tk"),
          col("event_type"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .groupBy(col("user_id"))
        .agg(array_join(
          expr("transform(array_sort(collect_list(struct(rn, event_type))), x -> x.event_type)"),
          ">").as("path"))
        .groupBy(col("path"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("n_users").desc, col("path"))
        .limit(20)
    }),

    // Top-k per group (k=3): rank window partitioned by the group key,
    // unique tie-break, filter — the canonical distributed top-N-per-key
    // (partial top-k per partition would also work; the window form keeps
    // rank numbers in the output).
    "q_topk_per_group" -> ((s, dir) => {
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("p_retailprice").desc, col("p_partkey"))
      t(s, dir, "part")
        .select(col("p_brand"), col("p_partkey"), col("p_retailprice"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .orderBy(col("p_brand"), col("rnk"))
    }),

    // Equal-width histogram via width_bucket (20k-wide bins over order
    // totals): one map-side bucket assignment + one hash agg. Bin edges
    // land only on exact 2-decimal multiples of the width, so the
    // assignment is engine-exact.
    "q_histogram" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(width_bucket(col("o_totalprice"), lit(0d), lit(700000d), lit(35))
          .as("bucket"), col("o_totalprice"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("revenue"))
        .orderBy(col("bucket"))
    }),

    // Explicit GROUPING SETS (the general form behind cube/rollup, both
    // already covered): detail, one-dimension subtotal and grand total in
    // ONE aggregation pass, disambiguated by grouping_id. Spark expands
    // the sets before the shuffle, so this stays a single hash-agg plan.
    "q_grouping_sets" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderpriority"), col("o_orderstatus")),
            Seq(col("o_orderpriority")), Seq()),
          col("o_orderpriority"), col("o_orderstatus"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
          dsum(col("o_totalprice")).as("revenue"))
        .select(col("gid").cast("long").as("gid"), col("o_orderpriority"),
          col("o_orderstatus"), col("n"), col("revenue"))
        .orderBy(col("gid"), col("o_orderpriority").asc_nulls_first,
          col("o_orderstatus").asc_nulls_first)
    }),

    // Schema-evolution union: merge two snapshots whose column sets
    // diverged (old has price, new has status/priority) — unionByName
    // with allowMissingColumns null-fills, the append path every
    // long-lived ingestion pipeline eventually needs.
    "q_union_evolve" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val old = o.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_totalprice"))
      val neu = o.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"))
      old.unionByName(neu, allowMissingColumns = true)
        .orderBy(col("o_orderkey"))
    }),

    // Islands-and-gaps: find missing o_orderkey ranges WITHOUT a global
    // single-task sort — keys bucket by (key div 4096), within-bucket
    // gaps come from a bucket-partitioned lead window, and cross-bucket
    // gaps from a lead over the per-bucket min/max frame (4096× smaller
    // than the data; the same aggregate-frame compromise as the KS /
    // Spearman offset tables — for exact global numbering at any size
    // see operators.GlobalRowNumber). Covers empty buckets: the bounds
    // lead skips them, so a gap spanning whole buckets is still one row.
    // The generator emits CONTIGUOUS keys, so deletions are planted
    // (every key ≡ 3,4 mod 19 dropped) — the detector is checked against
    // known ground truth instead of passing vacuously on zero rows.
    "q_id_gaps" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .filter(!(col("o_orderkey") % 19).isin(3, 4))
        .select(col("o_orderkey").as("k"), expr("o_orderkey div 4096").as("b"))
      val within = o
        .withColumn("nxt", lead(col("k"), 1).over(
          Window.partitionBy(col("b")).orderBy(col("k"))))
        .filter(col("nxt") - col("k") > 1)
        .select((col("k") + 1).as("gap_start"), (col("nxt") - 1).as("gap_end"))
      val bounds = o.groupBy(col("b"))
        .agg(min(col("k")).as("mn"), max(col("k")).as("mx"))
      val across = bounds
        .withColumn("nxt_mn", lead(col("mn"), 1).over(Window.orderBy(col("b"))))
        .filter(col("nxt_mn") - col("mx") > 1)
        .select((col("mx") + 1).as("gap_start"), (col("nxt_mn") - 1).as("gap_end"))
      within.unionAll(across)
        .select(col("gap_start"), col("gap_end"),
          (col("gap_end") - col("gap_start") + 1).as("gap_len"))
        .orderBy(col("gap_start"))
    }),

    // Anti-entropy table fingerprint: an order- and partitioning-
    // invariant checksum per key range, from overflow-safe portable
    // row hashes (pure integer arithmetic — both engines agree bit for
    // bit). Sum-merge makes it associative: two replicas compare range
    // checksums and ship only mismatching ranges, the replication-
    // verification primitive at 100 TB.
    "q_table_checksum" -> ((s, dir) => {
      t(s, dir, "orders")
        .withColumn("cents", floor(col("o_totalprice") * 100 + 0.5).cast("long"))
        .withColumn("h", expr(
          s"""(${idHash("o_orderkey")}
            | + cents % 1000000007 * 1315423911 % 1000000007
            | + ascii(substring(o_orderstatus, 1, 1))) % 1000000007""".stripMargin))
        .groupBy(expr("o_orderkey div 10000").as("range_id"))
        .agg(count(lit(1)).as("n"), sum(col("h")).as("checksum"))
        .orderBy(col("range_id"))
    }),

    // MapType machinery: per-document token histogram built as a real
    // Spark map (map_from_entries over the grouped counts), then probed
    // with element_at / size / map_keys. Outputs are scalars so the
    // oracle can check them without sharing Spark's (unordered) map
    // representation.
    "q_map_ops" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("doc_id"))
        .agg(map_from_entries(collect_list(struct(col("tok"), col("cnt"))))
          .as("hist"))
        .select(col("doc_id"),
          coalesce(element_at(col("hist"), "table"), lit(0L)).as("n_table"),
          size(col("hist")).cast("long").as("n_uniq"),
          array_join(slice(array_sort(map_keys(col("hist"))), 1, 3), ",")
            .as("keys_head"))
        .orderBy(col("doc_id"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_scd2" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ns(ts)//1000 AS tk, event_type,
        |    lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts)//1000, event_id)
        |      AS prev_type
        |  FROM events
        |), chg AS (
        |  SELECT user_id, event_id, tk, event_type FROM e
        |  WHERE prev_type IS NULL OR prev_type <> event_type
        |)
        |SELECT user_id, event_type AS status, tk AS valid_from,
        |  lead(tk, 1) OVER (PARTITION BY user_id ORDER BY tk, event_id) AS valid_to,
        |  CAST(lead(tk, 1) OVER (PARTITION BY user_id ORDER BY tk, event_id) IS NULL
        |    AS INT) AS is_current
        |FROM chg ORDER BY user_id, valid_from""".stripMargin,

    "q_snapshot_diff" ->
      """WITH old AS (
        |  SELECT o_orderkey AS k, o_totalprice AS old_price
        |  FROM orders WHERE o_orderkey % 10 <> 0
        |), neu AS (
        |  SELECT o_orderkey AS k,
        |    CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1000.0
        |         ELSE o_totalprice END AS new_price
        |  FROM orders WHERE o_orderkey % 10 <> 1
        |), d AS (
        |  SELECT COALESCE(old.k, neu.k) AS o_orderkey, old_price, new_price,
        |    CASE WHEN old_price IS NULL THEN 'added'
        |         WHEN new_price IS NULL THEN 'removed'
        |         WHEN old_price <> new_price THEN 'changed'
        |         ELSE 'same' END AS change_type
        |  FROM old FULL OUTER JOIN neu ON old.k = neu.k
        |)
        |SELECT o_orderkey, change_type, old_price, new_price
        |FROM d WHERE change_type <> 'same' ORDER BY o_orderkey""".stripMargin,

    "q_merge_upsert" ->
      """WITH target AS (
        |  SELECT o_orderkey AS k, o_totalprice AS t_price, o_orderstatus AS t_status
        |  FROM orders WHERE o_orderkey % 10 <> 0
        |), source AS (
        |  SELECT o_orderkey AS k, o_totalprice + 1000.0 AS s_price, 'U' AS s_status
        |  FROM orders WHERE o_orderkey % 3 = 0
        |)
        |SELECT COALESCE(target.k, source.k) AS o_orderkey,
        |  COALESCE(s_price, t_price) AS price,
        |  COALESCE(s_status, t_status) AS status,
        |  CASE WHEN s_price IS NOT NULL AND t_price IS NOT NULL THEN 'update'
        |       WHEN t_price IS NULL THEN 'insert'
        |       ELSE 'keep' END AS action
        |FROM target FULL OUTER JOIN source ON target.k = source.k
        |ORDER BY o_orderkey""".stripMargin,

    "q_incremental_agg" ->
      """WITH final AS (
        |  SELECT o_orderpriority, o_totalprice FROM orders
        |  WHERE o_orderkey % 10 <> 0 AND o_orderkey % 7 <> 0
        |  UNION ALL
        |  SELECT o_orderpriority, o_totalprice FROM orders
        |  WHERE o_orderkey % 10 = 0
        |)
        |SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM final GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q_event_paths" ->
      """WITH e AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_ns(ts)//1000, event_id)
        |      AS rn
        |  FROM events
        |), p AS (
        |  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
        |  FROM e WHERE rn <= 5 GROUP BY user_id
        |)
        |SELECT path, COUNT(*) AS n_users FROM p GROUP BY path
        |ORDER BY n_users DESC, path LIMIT 20""".stripMargin,

    "q_topk_per_group" ->
      """SELECT p_brand, p_partkey, p_retailprice, rnk FROM (
        |  SELECT p_brand, p_partkey, p_retailprice,
        |    row_number() OVER (PARTITION BY p_brand
        |      ORDER BY p_retailprice DESC, p_partkey) AS rnk
        |  FROM part
        |) WHERE rnk <= 3 ORDER BY p_brand, rnk""".stripMargin,

    // least/greatest mirror width_bucket's domain clamp (below 0 → 0,
    // ≥ 700000 → overflow bucket 36) so both engines share ONE formula
    // even if a larger SF ever produces an out-of-range total
    "q_histogram" ->
      s"""SELECT least(36, greatest(0,
         |    CAST(floor(o_totalprice / 20000) AS BIGINT) + 1)) AS bucket,
         |  COUNT(*) AS n,
         |  ${sql.dsum("o_totalprice")} AS revenue
         |FROM orders GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q_grouping_sets" ->
      s"""SELECT CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
         |  o_orderpriority, o_orderstatus, COUNT(*) AS n,
         |  ${sql.dsum("o_totalprice")} AS revenue
         |FROM orders
         |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
         |  (o_orderpriority), ())
         |ORDER BY gid, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST"""
        .stripMargin,

    "q_union_evolve" ->
      """SELECT * FROM (
        |  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 2 = 0
        |) UNION ALL BY NAME (
        |  SELECT o_orderkey, o_orderstatus, o_orderpriority
        |  FROM orders WHERE o_orderkey % 2 = 1
        |) ORDER BY o_orderkey""".stripMargin,

    "q_id_gaps" ->
      """WITH o AS (
        |  SELECT o_orderkey AS k,
        |    lead(o_orderkey) OVER (ORDER BY o_orderkey) AS nxt
        |  FROM orders WHERE o_orderkey % 19 NOT IN (3, 4)
        |)
        |SELECT k + 1 AS gap_start, nxt - 1 AS gap_end, nxt - k - 1 AS gap_len
        |FROM o WHERE nxt - k > 1 ORDER BY gap_start""".stripMargin,

    "q_table_checksum" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders
        |)
        |SELECT o_orderkey // 10000 AS range_id, COUNT(*) AS n,
        |  CAST(SUM((o_orderkey % 1000000007 * 2654435761 % 1000000007
        |    + cents % 1000000007 * 1315423911 % 1000000007
        |    + ord(substring(o_orderstatus, 1, 1))) % 1000000007) AS BIGINT)
        |    AS checksum
        |FROM o GROUP BY range_id ORDER BY range_id""".stripMargin,

    "q_map_ops" ->
      """WITH d AS (
        |  SELECT doc_id, str_split(text, ' ') AS toks,
        |    list_sort(list_distinct(str_split(text, ' '))) AS uniq
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CAST(len(list_filter(toks, x -> x = 'table')) AS BIGINT) AS n_table,
        |  CAST(len(uniq) AS BIGINT) AS n_uniq,
        |  array_to_string(list_slice(uniq, 1, 3), ',') AS keys_head
        |FROM d ORDER BY doc_id""".stripMargin
  )
}
