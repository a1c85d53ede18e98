package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query packs each cover one slice of the SURVEY.md §2 operator inventory;
  * every query has a matching DuckDB oracle unless its semantics are not
  * SQL-expressible (then the driver records a rows-only check).
  */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(
    RelationalQueries,
    JoinQueries,
    WindowQueries,
    AggregateQueries,
    TextQueries,
    SimilarityQueries,
    FuzzyQueries,
    MlQueries,
    TransformQueries,
    MiscQueries,
    FeatureQueries,
    PipelineQueries,
    MixtureQueries,
    AnalyticsQueries,
    WarehouseQueries
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Revenue per nation: fact ⋈ fact shuffle join + three broadcast dims +
    * hash agg — exercises the whole join/agg path in one plan. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li = Tables(spark, dir, "lineitem")
    val o = Tables(spark, dir, "orders")
    val c = Tables(spark, dir, "customer")
    val n = Tables(spark, dir, "nation")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(QueryKit.revSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("n_name"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracle).toMap
}
