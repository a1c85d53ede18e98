package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-location (SURVEY.md §4 / scale brief: "repartition/
  * bucketing for co-located joins").
  *
  * Writing both fact tables bucketed by the join key makes the join
  * shuffle-free forever after: each bucket pair joins locally. At 100 TB
  * this converts the dominant repeated cost (shuffling the fact table on
  * every join) into a one-time write-side sort — the standard
  * lakehouse layout for star-schema facts.
  */
object Bucketing {

  /** Persist `df` bucketed (and sorted) by `key` as a table; `path` makes
    * it external (outside the static warehouse dir). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, path: Option[String] = None): Unit = {
    val w = df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket key — no ShuffleExchange
    * appears in the plan when bucket counts match. The merge hint keeps
    * Catalyst from broadcasting a small side (at real fact-fact scale it
    * would pick sort-merge anyway; the hint makes the demo scale-honest). */
  def coLocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).hint("merge")
      .join(spark.table(rightTable).hint("merge"), key)
}
