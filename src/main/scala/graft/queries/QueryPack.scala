package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of (query, DuckDB-oracle) pairs.
  *
  * Contract (see the driver's Verify/CORRECTNESS gate):
  *  - `queries(name)(spark, sfDir)` produces the result DataFrame;
  *  - `oracle(name)` is ANSI SQL DuckDB runs over the same parquet tables;
  *  - column names must match exactly (the compare sorts columns by name);
  *  - every query emits a deterministic total order (unique ORDER BY keys)
  *    so the row stream is reproducible across engines and partitionings.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  /** DuckDB SQL per query name; omit a name for rows-only checking. */
  def oracle: Map[String, String]
}
