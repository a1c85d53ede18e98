package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the benchmark tables (TESTDATA.md).
  *
  * Scale notes: each table is a plain parquet scan — at cluster scale these
  * would be partitioned/bucketed datasets; all queries below are written so
  * Catalyst can push filters + prune columns into this scan (verify with
  * `.explain("formatted")` → `PushedFilters` / `ReadSchema`).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
