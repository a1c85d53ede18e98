package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's "constraint engine" re-expressed as distributed
  * aggregations (SURVEY.md §2.9 V1–V4; ref: etl/transform.py:14-56,
  * etl/load.py:112-472 DDL constraints).
  *
  * Every check is a DataFrame → DataFrame transform (no collect): at
  * cluster scale the checks run as ordinary shuffled aggregations and the
  * raise-vs-log decision reads only the (tiny) violation summary.
  */
object Checks {

  /** V1 — keys appearing more than once, with their multiplicity. */
  def duplicateKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("dup_count"))
      .filter(col("dup_count") > 1)

  /** V1 as an assertion: true iff `keys` is a unique key of df. */
  def isUniqueKey(df: DataFrame, keys: Seq[String]): Boolean =
    duplicateKeys(df, keys).isEmpty

  /** V2 — one-row summary: per-key null counts + total rows. */
  def nullKeyCounts(df: DataFrame, keys: Seq[String]): DataFrame =
    df.agg(
      sum(col(keys.head).isNull.cast("long")).as(s"null_${keys.head}"),
      keys.tail.map(k => sum(col(k).isNull.cast("long")).as(s"null_$k")) :+
        count(lit(1)).as("n_rows"): _*)

  /** V2 as an assertion: true iff no key column holds a null. */
  def hasNoNullKeys(df: DataFrame, keys: Seq[String]): Boolean =
    df.filter(keys.map(col(_).isNull).reduce(_ || _)).isEmpty

  /** V4 — referential integrity: child keys with no parent, with counts.
    * left_anti keeps this fully distributed; Catalyst broadcasts the
    * parent when it is dim-sized. */
  def fkOrphans(child: DataFrame, parent: DataFrame,
      childKey: String, parentKey: String): DataFrame =
    child
      .join(parent, child(childKey) === parent(parentKey), "left_anti")
      .groupBy(col(childKey))
      .agg(count(lit(1)).as("n_orphans"))

  /** O8/W5 — keyed dedup keeping the first row per key under an explicit
    * deterministic order (pandas sort + drop_duplicates keep-first; ref:
    * etl/additional_fifa.py:165-172). */
  def dedupKeepFirst(df: DataFrame, keys: Seq[String],
      orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Raise-or-log wrapper (ref: etl/transform.py:33-43 `raiseErrors`).
    * Runs `check`; on violation either throws or logs via `warn`. */
  def enforce(name: String, ok: => Boolean, raiseErrors: Boolean,
      warn: String => Unit = msg => System.err.println(msg)): Boolean = {
    val passed = ok
    if (!passed) {
      val msg = s"[quality] check failed: $name"
      if (raiseErrors) throw new IllegalStateException(msg) else warn(msg)
    }
    passed
  }
}
