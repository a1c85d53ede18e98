package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Group-aware cross-validation folds (SURVEY.md §2.12; ref: GroupKFold /
  * GroupShuffleSplit with groups=player_id, modelling_1 cells 12-17):
  * every row of a group lands in the same fold, so no group leaks across
  * the train/validation boundary. Feeds MLlib's `CrossValidator.foldCol`.
  *
  * Scale notes: fold assignment is a pure hash of the group key — no
  * shuffle, no state, identical on any cluster size.
  */
object GroupedFolds {

  /** Deterministic fold id in [0, k) from the group column. Uses the
    * engine-portable polynomial rolling hash (graft.functions
    * .TextAnalytics) — not JVM hashCode — so assignment is stable across
    * runs, languages, and engines. */
  def foldCol(group: Column, k: Int): Column =
    pmod(
      aggregate(
        split(group.cast("string"), ""),
        lit(0L),
        (acc, ch) => (acc * 31 + ascii(ch)) % lit(1000000007L)),
      lit(k.toLong)).cast("int")

  def withFold(df: DataFrame, groupCol: String, k: Int,
      foldColName: String = "fold"): DataFrame =
    df.withColumn(foldColName, foldCol(col(groupCol), k))

  /** Group-level train/test split (ref: train_test_split on distinct ids,
    * modelling_1 cell 3): split the distinct group ids, then semi-join. */
  def groupSplit(df: DataFrame, groupCol: String, trainFraction: Double,
      seed: Long): (DataFrame, DataFrame) = {
    val ids = df.select(col(groupCol)).distinct()
    val Array(trainIds, testIds) =
      ids.randomSplit(Array(trainFraction, 1 - trainFraction), seed)
    (df.join(trainIds, Seq(groupCol), "left_semi"),
      df.join(testIds, Seq(groupCol), "left_semi"))
  }
}
