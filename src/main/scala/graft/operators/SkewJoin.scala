package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salting for skewed equi-joins (SURVEY.md §4 / builder scale brief).
  *
  * AQE's skew-join split handles sort-merge skew automatically; salting is
  * the explicit fallback when a handful of hot keys dominate (e.g. one
  * user owning 10% of events at 100 TB): the skewed (large) side gets a
  * random salt in [0, n); the build side is replicated n× with every
  * salt value; the join key becomes (key, salt) so hot keys spread over n
  * reducers. Replication cost is |build| × n — use only when the build
  * side is small relative to the skew being fixed.
  */
object SkewJoin {

  /** Inner/left equi-join of `big` (skewed) with `small` on `key`,
    * spreading each key over `salts` reducers. `seed` keeps the salt
    * deterministic for tests. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int, joinType: String = "inner", seed: Long = 42L): DataFrame = {
    require(salts > 0, "salts must be positive")
    val salted = big.withColumn("__salt",
      (rand(seed) * salts).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    salted
      .join(replicated, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Top-n heavy-hitter keys with their share — the diagnostic that
    * decides whether salting is warranted. One aggregation pass; the total
    * comes from a window over the (tiny) grouped frame, not a second scan
    * of the input. Empty input → empty diagnostic (no division). */
  def keySkew(df: DataFrame, key: String, topN: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("n"))
    counts
      .withColumn("share",
        round(col("n") / sum(col("n")).over(Window.partitionBy()), 6))
      .orderBy(col("n").desc, col(key))
      .limit(topN)
  }
}
