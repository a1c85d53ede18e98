package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join (SURVEY.md §2.5 J10 — ref:
  * modelling_1_player_plays.ipynb cell 19 `get_closest_dates`: for each
  * left row, the right row with the greatest timestamp <= left timestamp,
  * per key). [[forward]] and [[applyTolerance]] complete the pandas
  * merge_asof surface (direction='forward', tolerance=...).
  *
  * Implementation is the union + ordered-window carry-forward pattern, NOT
  * a range join: tag both sides, union, and per key take the last (resp.
  * first) non-null right payload at or before (resp. after) each left row.
  * Cost is one shuffle on the key plus a per-partition sort — O(n log n)
  * per key group with no candidate-pair explosion, so it scales to
  * arbitrarily large sides (a range join would materialize |L|×|R|
  * candidates per key). Skewed keys are handled by AQE's skew-join split
  * since the shuffle is a plain hash partition.
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
    *   among right rows with equal time, the greatest tiebreaker wins
    *   (backward) / the smallest wins (forward).
    */
  def backward(
      left: DataFrame, right: DataFrame,
      key: String, leftTime: String, rightTime: String,
      rightPayload: Seq[String],
      leftTieBreak: String, rightTieBreak: String): DataFrame =
    asof(left, right, key, leftTime, rightTime, rightPayload,
      leftTieBreak, rightTieBreak, forwardDir = false)

  /** Forward as-of: for each left row, the right row with the SMALLEST
    * time >= left time, per key (pandas merge_asof direction='forward'). */
  def forward(
      left: DataFrame, right: DataFrame,
      key: String, leftTime: String, rightTime: String,
      rightPayload: Seq[String],
      leftTieBreak: String, rightTieBreak: String): DataFrame =
    asof(left, right, key, leftTime, rightTime, rightPayload,
      leftTieBreak, rightTieBreak, forwardDir = true)

  /** pandas merge_asof `tolerance`: null out every carried payload column
    * where the matched right time is farther than `tol` from the left
    * time (backward: left − right; forward: right − left). `matchedTime`
    * must be one of the carried columns (e.g. `asof_<rightTime>`). */
  def applyTolerance(joined: DataFrame, leftTime: String, matchedTime: String,
      tol: Column, payload: Seq[String], forwardDir: Boolean): DataFrame = {
    val dist =
      if (forwardDir) col(matchedTime) - col(leftTime)
      else col(leftTime) - col(matchedTime)
    val withOk = joined
      .withColumn("__tol_ok", col(matchedTime).isNotNull && dist <= tol)
    payload.foldLeft(withOk) { (df, c) =>
      df.withColumn(c, when(col("__tol_ok"), col(c)))
    }.drop("__tol_ok")
  }

  private def asof(
      left: DataFrame, right: DataFrame,
      key: String, leftTime: String, rightTime: String,
      rightPayload: Seq[String],
      leftTieBreak: String, rightTieBreak: String,
      forwardDir: Boolean): DataFrame = {

    val leftCols = left.columns
    // tiebreakers keep their natural (orderable) type — no numeric cast
    val rTbType = right.schema(rightTieBreak).dataType
    // ordering position of left vs right rows at EQUAL time: backward
    // needs equal-time rights BEFORE the left row (<= matches), forward
    // needs them AFTER (>= matches)
    val (leftOrd, rightOrd) = if (forwardDir) (0, 1) else (1, 0)
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__is_left", lit(1))
      .withColumn("__ord", lit(leftOrd))
      .withColumn("__tb", lit(null).cast(rTbType))
      .withColumn("__ltb", col(leftTieBreak))
    val lAligned = rightPayload.foldLeft(l) { (df, c) =>
      df.withColumn(s"__r_$c", lit(null).cast(right.schema(c).dataType))
    }

    val rBase = right
      .withColumn("__t", col(rightTime))
      .withColumn("__is_left", lit(0))
      .withColumn("__ord", lit(rightOrd))
      .withColumn("__tb", col(rightTieBreak))
      .withColumn("__ltb", lit(null).cast(left.schema(leftTieBreak).dataType))
    val rAligned = rightPayload.foldLeft(rBase) { (df, c) =>
      df.withColumn(s"__r_$c", col(c))
    }

    val cols = Seq(key, "__t", "__is_left", "__ord", "__tb", "__ltb") ++
      rightPayload.map(c => s"__r_$c")
    val lSel = lAligned.select((cols.map(col) ++ leftCols.filterNot(_ == key).map(col)): _*)
    val rSel = rAligned.select(cols.map(col): _*)
    val unioned = lSel.unionByName(rSel, allowMissingColumns = true)

    // Backward: rights sort before lefts at equal time; among equal-time
    // rights the greatest tiebreaker is carried LAST (last() wins).
    // Forward: lefts sort before rights at equal time; among equal-time
    // rights the smallest tiebreaker comes FIRST (first() wins). The left
    // tiebreaker makes the full ordering deterministic either way.
    val w0 = Window
      .partitionBy(col(key))
      .orderBy(col("__t"), col("__ord"), col("__tb"), col("__ltb"))
    val carried =
      if (forwardDir) {
        val w = w0.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        rightPayload.foldLeft(unioned) { (df, c) =>
          df.withColumn(s"asof_$c", first(col(s"__r_$c"), ignoreNulls = true).over(w))
        }
      } else {
        val w = w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        rightPayload.foldLeft(unioned) { (df, c) =>
          df.withColumn(s"asof_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
        }
      }

    carried
      .filter(col("__is_left") === 1)
      .select((leftCols.map(col) ++ rightPayload.map(c => col(s"asof_$c"))): _*)
  }
}
