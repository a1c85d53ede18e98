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

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) which Spark 4 refuses by
      // default; read it as a raw nanosecond long (matches DuckDB's
      // epoch_ns) and derive micros with `ts DIV 1000` where needed.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** events.ts (nanos-as-long) → microseconds-since-epoch (the precision
    * DuckDB and Spark share; oracle side is `epoch_ns(ts)//1000`). */
  def tsMicros: org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.expr("ts DIV 1000")
}
