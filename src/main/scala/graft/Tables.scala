package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
    val path = s"$dir/$name.parquet"
    if (name == "events") normalizeEvents(spark, path)
    else spark.read.parquet(path)
  }

  /** events.ts → canonical nanoseconds-since-epoch LongType, whatever
    * physical type the parquet carries. Testdata generations have shipped
    * `ts` as TIMESTAMP(NANOS) (Spark 4 refuses it unless read as a raw
    * long) and as TIMESTAMP_MICROS with isAdjustedToUTC=false (loads as
    * TIMESTAMP_NTZ). Downstream code and every DuckDB oracle assume the
    * nanos-long form (`ts DIV 1000` == DuckDB `epoch_ns(ts)//1000`), so
    * the drift is absorbed here, once. The NTZ→long conversion uses
    * `timestampdiff` against an NTZ epoch literal: timezone-free, exact
    * to the microsecond, and matches DuckDB's `epoch_ns` on the same
    * file bit-for-bit.
    */
  private def normalizeEvents(spark: SparkSession, path: String): DataFrame = {
    val df =
      try spark.read.parquet(path)
      catch {
        case e: Exception if describes(e, "NANOS") =>
          // Legacy TIMESTAMP(NANOS) data: only readable as a raw long.
          // The conf must stay set for the scan's execution, so it is
          // intentionally not reset here (harmless for micros data, and
          // only reachable when the data actually is nanos).
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          spark.read.parquet(path)
      }
    df.schema("ts").dataType match {
      case LongType => df // already nanos-since-epoch
      case TimestampNTZType =>
        df.withColumn(
          "ts",
          expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) * 1000L"))
      case TimestampType =>
        df.withColumn("ts", expr("unix_micros(ts) * 1000L"))
      case other =>
        throw new IllegalStateException(
          s"events.ts arrived as unsupported type $other; expected long nanos, " +
            "TIMESTAMP_NTZ, or TIMESTAMP — update Tables.normalizeEvents")
    }
  }

  private def describes(e: Throwable, needle: String): Boolean =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(5)
      .exists(t => Option(t.getMessage).exists(_.contains(needle)))

  /** events.ts (canonical nanos long) → microseconds-since-epoch (the
    * precision DuckDB and Spark share; oracle side is `epoch_ns(ts)//1000`,
    * which DuckDB evaluates identically on both nanos and micros parquet). */
  def tsMicros: Column = expr("ts DIV 1000")
}
