package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed backward as-of join (SURVEY.md §2.5 J10 — ref:
  * modelling_1_player_plays.ipynb cell 19 `get_closest_dates`: for each
  * left row, the right row with the greatest timestamp <= left timestamp,
  * per key).
  *
  * Implementation is the union + ordered-window carry-forward pattern, NOT
  * a range join: tag both sides, union, and per key take the last non-null
  * right payload at or before each left row. Cost is one shuffle on the key
  * plus a per-partition sort — O(n log n) per key group with no candidate
  *-pair explosion, so it scales to arbitrarily large sides (a range join
  * would materialize |L|×|R| candidates per key). Skewed keys are handled
  * by AQE's skew-join split since the shuffle is a plain hash partition.
  */
object AsOfJoin {

  /** @param left      probe side (keeps all rows)
    * @param right     reference side
    * @param key       equi-key column name present on both sides
    * @param leftTime  ordering column on left (numeric or timestamp)
    * @param rightTime ordering column on right (same type)
    * @param rightPayload right columns to carry (renamed in output)
    * @param leftTieBreak  deterministic per-row tiebreaker on the left
    * @param rightTieBreak deterministic per-row tiebreaker on the right:
    *   among right rows with equal time, the greatest tiebreaker wins.
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      leftTieBreak: String,
      rightTieBreak: String): DataFrame = {

    val leftCols = left.columns
    // tiebreakers keep their natural (orderable) type — no numeric cast
    val rTbType = right.schema(rightTieBreak).dataType
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__is_left", lit(1))
      .withColumn("__tb", lit(null).cast(rTbType))
      .withColumn("__ltb", col(leftTieBreak))
    val lAligned = rightPayload.foldLeft(l) { (df, c) =>
      df.withColumn(s"__r_$c", lit(null).cast(right.schema(c).dataType))
    }

    val rBase = right
      .withColumn("__t", col(rightTime))
      .withColumn("__is_left", lit(0))
      .withColumn("__tb", col(rightTieBreak))
      .withColumn("__ltb", lit(null).cast(left.schema(leftTieBreak).dataType))
    val rAligned = rightPayload.foldLeft(rBase) { (df, c) =>
      df.withColumn(s"__r_$c", col(c))
    }

    val cols = Seq(key, "__t", "__is_left", "__tb", "__ltb") ++
      rightPayload.map(c => s"__r_$c")
    val lSel = lAligned.select((cols.map(col) ++ leftCols.filterNot(_ == key).map(col)): _*)
    val rSel = rAligned.select(cols.map(col): _*)
    val unioned = lSel.unionByName(rSel, allowMissingColumns = true)

    // Right rows sort before left rows at equal time (__is_left 0 < 1) so a
    // right row at exactly t matches a left row at t (<= semantics); among
    // equal-time right rows the greatest tiebreaker is carried last → wins;
    // the left tiebreaker makes the full ordering deterministic.
    val w = Window
      .partitionBy(col(key))
      .orderBy(col("__t"), col("__is_left"), col("__tb"), col("__ltb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = rightPayload.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }

    carried
      .filter(col("__is_left") === 1)
      .select((leftCols.map(col) ++ rightPayload.map(c => col(s"asof_$c"))): _*)
  }
}
