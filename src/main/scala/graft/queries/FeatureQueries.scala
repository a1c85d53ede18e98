package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.QueryKit._
import graft.features.{Features, Impute}

/** Feature-engineering coverage (SURVEY.md §3.3): multi-column lag
  * features and per-group quantile-bucket assignment, oracle-checked.
  */
object FeatureQueries extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // W1×N — lag features at offsets 1 and 2 over two columns.
    "q_lag_features" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          Tables.tsMicros.as("tkey"), col("value"), col("event_type"))
      Features.lagFeatures(e, "user_id", Seq("tkey", "event_id"),
        Seq("value", "event_type"), offsets = Seq(1, 2))
        .select(col("event_id"), col("user_id"), col("value"),
          col("prev1_value"), col("prev2_value"),
          col("prev1_event_type"), col("prev2_event_type"))
        .orderBy(col("event_id"))
    }),

    // A4 — per-segment decile buckets of customer balance.
    "q_quantile_buckets" -> ((s, dir) => {
      Features.quantileBuckets(
        t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment"),
          col("c_acctbal")),
        "c_mktsegment", "c_acctbal")
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
          col("bucket"))
        .orderBy(col("c_custkey"))
    }),

    // Deterministic hash-based stratified sampling — reproducible
    // train/test selection with per-stratum rates (urgent 50%, high 25%,
    // rest 10%). Seeded RNG sampling is run- and partitioning-dependent;
    // a key-hash threshold is stable across engines, runs and cluster
    // sizes, which is what a 100 TB split actually requires.
    "q_stratified_sample" -> ((s, dir) => {
      t(s, dir, "orders")
        .withColumn("h",
          expr("o_orderkey * 2654435761 % 1000000007 % 100"))
        .withColumn("rate",
          when(col("o_orderpriority") === "1-URGENT", 50)
            .when(col("o_orderpriority") === "2-HIGH", 25)
            .otherwise(10))
        .filter(col("h") < col("rate"))
        .select(col("o_orderkey"), col("o_orderpriority"))
        .orderBy(col("o_orderkey"))
    }),

    // Log-log OLS imputation (ref: EDA cells 50-59 — release_clause from
    // value; stand-in: retail price from size, nulls injected). Closed-form
    // slope/intercept match DuckDB regr_slope/regr_intercept.
    "q_linreg_impute" -> ((s, dir) => {
      val p = t(s, dir, "part")
        .withColumn("maybe_price",
          when(col("p_partkey") % 7 === 0, lit(null).cast("double"))
            .otherwise(col("p_retailprice")))
      Impute.logLogImpute(p, "p_size", "maybe_price", "price_filled")
        .select(col("p_partkey"), col("p_size"), col("maybe_price"),
          col("price_filled"), col("was_imputed"), col("slope"), col("intercept"))
        .orderBy(col("p_partkey"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_lag_features" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_ns(ts)//1000 AS tkey, value, event_type FROM events
        |)
        |SELECT event_id, user_id, value,
        |  lag(value, 1) OVER w AS prev1_value,
        |  lag(value, 2) OVER w AS prev2_value,
        |  lag(event_type, 1) OVER w AS prev1_event_type,
        |  lag(event_type, 2) OVER w AS prev2_event_type
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tkey, event_id)
        |ORDER BY event_id""".stripMargin,

    "q_quantile_buckets" ->
      """WITH b0 AS (
        |  SELECT c_mktsegment,
        |    quantile_cont(c_acctbal, [0.0,0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS qs
        |  FROM customer GROUP BY c_mktsegment
        |), b1 AS (
        |  SELECT c_mktsegment,
        |    unnest(generate_series(0, 9)) AS bucket,
        |    unnest(qs) AS lower
        |  FROM b0
        |), b2 AS (
        |  SELECT c_mktsegment, CAST(bucket AS INT) AS bucket, lower,
        |    lead(lower, 1, 9999999.0) OVER (PARTITION BY c_mktsegment ORDER BY bucket) AS upper
        |  FROM b1
        |)
        |SELECT c_custkey, c.c_mktsegment, c_acctbal, bucket
        |FROM customer c JOIN b2 b
        |  ON c.c_mktsegment = b.c_mktsegment
        | AND c_acctbal >= b.lower AND c_acctbal < b.upper
        |ORDER BY c_custkey""".stripMargin,

    "q_stratified_sample" ->
      """SELECT o_orderkey, o_orderpriority FROM (
        |  SELECT o_orderkey, o_orderpriority,
        |    o_orderkey * 2654435761 % 1000000007 % 100 AS h,
        |    CASE WHEN o_orderpriority = '1-URGENT' THEN 50
        |         WHEN o_orderpriority = '2-HIGH' THEN 25
        |         ELSE 10 END AS rate
        |  FROM orders
        |) WHERE h < rate ORDER BY o_orderkey""".stripMargin,

    "q_linreg_impute" ->
      """WITH p AS (
        |  SELECT p_partkey, p_size,
        |    CASE WHEN p_partkey % 7 = 0 THEN NULL ELSE p_retailprice END AS maybe_price
        |  FROM part
        |), c AS (
        |  SELECT ROUND(regr_slope(ln(maybe_price), ln(p_size)), 6) AS slope,
        |    ROUND(avg(ln(maybe_price))
        |      - ROUND(regr_slope(ln(maybe_price), ln(p_size)), 6) * avg(ln(p_size)),
        |      6) AS intercept
        |  FROM p WHERE maybe_price IS NOT NULL
        |)
        |SELECT p_partkey, p_size, maybe_price,
        |  CASE WHEN maybe_price IS NOT NULL THEN maybe_price
        |       ELSE ROUND(exp(intercept + slope * ln(p_size)), 6) END AS price_filled,
        |  CAST(maybe_price IS NULL AS INT) AS was_imputed,
        |  slope, intercept
        |FROM p CROSS JOIN c
        |ORDER BY p_partkey""".stripMargin
  )
}
