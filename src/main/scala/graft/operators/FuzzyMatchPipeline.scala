package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.GraftExtensions

/** The reference's record-linkage pipeline (SURVEY.md §2.10 + §4; ref:
  * etl/additional_fifa.py): match left entities to right entities by
  * fuzzy name similarity with
  *  - an optional blocking key (F5 — prunes the cartesian),
  *  - exact-match short-circuit (no kernel call when names are equal),
  *  - two-pass scoring (long name then short name, greatest wins — ref
  *    :127-154),
  *  - threshold masking (score <= τ → no match; the ref's `<=` comparator
  *    kept exactly, :162),
  *  - deterministic top-1 per left entity (W5),
  *  - incremental mode: an `already` frame of previously-matched left ids
  *    is anti-joined away before the expensive kernel (ref :303-311).
  *
  * Scale notes: the blocked cross join is the only quadratic stage; the
  * reference bounded it with manual 500k-pair batches (config.ini:8) —
  * Spark partitions the pair space instead, and the blocking key bounds
  * |pairs| per block. Names are tokenized ONCE PER ROW (sorted-distinct
  * arrays) before the pair join, and scoring runs through the codegen
  * native expression graft_token_set_ratio — same plan as q_fuzzy_match,
  * no ScalaUDF converter layer in the pair loop.
  */
object FuzzyMatchPipeline {

  /** @param left  (leftId, leftLong, leftShort [, blockCol]) frame
    * @param right (rightId, rightLong, rightShort [, blockCol]) frame
    * @param threshold scores <= threshold are discarded (ref semantics)
    * @param already optional frame with column `leftId` of already-matched
    *                ids to skip (incremental run)
    * @param prune optional candidate-pair predicate applied before scoring
    *              (F5 — the ref's position-compatibility prune,
    *              etl/additional_fifa.py:174-190)
    * @return (leftId, rightId, score) — best match per remaining left row
    */
  def bestMatches(
      left: DataFrame, right: DataFrame,
      leftId: String, rightId: String,
      leftLong: String, rightLong: String,
      leftShort: String, rightShort: String,
      blockCol: Option[String] = None,
      threshold: Double = 90.0,
      already: Option[DataFrame] = None,
      prune: Option[org.apache.spark.sql.Column] = None): DataFrame = {

    GraftExtensions.register(left.sparkSession)

    def toks(c: org.apache.spark.sql.Column) =
      sort_array(array_distinct(split(c, " ")))

    val remaining = already.fold(left)(prev =>
        left.join(prev.select(col(leftId)), Seq(leftId), "left_anti"))
      .withColumn("__lt_long", toks(col(leftLong)))
      .withColumn("__lt_short", toks(col(leftShort)))
    val rightTok = right
      .withColumn("__rt_long", toks(col(rightLong)))
      .withColumn("__rt_short", toks(col(rightShort)))

    val joined = blockCol match {
      case Some(b) => remaining.join(rightTok, Seq(b))
      case None => remaining.crossJoin(rightTok)
    }
    val pairs = prune.fold(joined)(joined.filter)

    def score(l: String, r: String, lt: String, rt: String) =
      when(col(l) === col(r), 100.0)
        .otherwise(expr(s"graft_token_set_ratio($lt, $rt)"))

    val w = Window.partitionBy(col(leftId))
      .orderBy(col("score").desc, col(rightId))

    pairs
      .withColumn("__s_long", score(leftLong, rightLong, "__lt_long", "__rt_long"))
      // second pass only where the first is not already exact (ref skips
      // players completed by the long pass, :140-150)
      .withColumn("__s_short",
        when(col("__s_long") === 100.0, lit(null))
          .otherwise(score(leftShort, rightShort, "__lt_short", "__rt_short")))
      .withColumn("score", greatest(col("__s_long"), col("__s_short")))
      .filter(col("score") > threshold) // ref: `<= threshold` → masked null
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(leftId), col(rightId), round(col("score"), 4).as("score"))
  }
}
