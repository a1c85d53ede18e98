package graft.features

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Feature-engineering operators from the reference's modelling path
  * (SURVEY.md §3.3; EDA notebook cells 23-32).
  *
  * Scale notes: lag features are one shuffle on the partition key shared
  * by all lagged columns (a single Window). Quantile buckets compute one
  * small bounds table per group (10 rows/group) and bucket-assign via a
  * broadcast range join — rows never shuffle on value.
  */
object Features {

  /** W1 — `prev<n>_<col>` lagged features per key (ref: 24 previous_*
    * columns, EDA cells 23-24). All lags share one window → one sort. */
  def lagFeatures(df: DataFrame, partitionCol: String, orderCols: Seq[String],
      cols: Seq[String], offsets: Seq[Int] = Seq(1)): DataFrame = {
    val w = Window.partitionBy(col(partitionCol))
      .orderBy(orderCols.map(col): _*)
    offsets.foldLeft(df) { (acc, n) =>
      cols.foldLeft(acc) { (a, c) =>
        a.withColumn(s"prev${n}_$c", lag(col(c), n).over(w))
      }
    }
  }

  /** W3 — time since previous row per key, in the unit of `timeCol`. */
  def timeSincePrev(df: DataFrame, partitionCol: String, timeCol: String,
      orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(partitionCol))
      .orderBy(orderCols.map(col): _*)
    df.withColumn(s"${timeCol}_since_prev",
      col(timeCol) - lag(col(timeCol), 1).over(w))
  }

  /** A4 — per-group decile bucket assignment (ref: EDA cell 26): exact
    * interpolated percentiles 0.0..0.9 → [lower, upper) membership, upper
    * of the last bucket open-ended (lead default). Returns df + `bucket`
    * (0-based decile). */
  def quantileBuckets(df: DataFrame, groupCol: String, valueCol: String,
      nBuckets: Int = 10, upperDefault: Double = 9999999.0): DataFrame = {
    val ps = array((0 until nBuckets).map(i => lit(i.toDouble / nBuckets)): _*)
    val bounds = df.groupBy(col(groupCol))
      .agg(percentile(col(valueCol), ps).as("qs"))
      .select(col(groupCol), posexplode(col("qs")).as(Seq("bucket", "lower")))
    val wb = Window.partitionBy(col(groupCol)).orderBy(col("bucket"))
    val ranged = bounds.withColumn("upper",
      lead(col("lower"), 1, upperDefault).over(wb))
    df.join(broadcast(ranged),
      df(groupCol) === ranged(groupCol) &&
        col(valueCol) >= col("lower") && col(valueCol) < col("upper"))
      .drop(ranged(groupCol))
      .drop("lower", "upper")
  }
}
