package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.QueryKit._
import graft.ml.{GroupedFolds, PercentageCalc}

/** ML-adjacent operators with deterministic semantics, oracle-checked:
  * the custom PercentageCalc Estimator (SURVEY.md §2.12) and the
  * group-aware fold assignment. Model training itself is covered in
  * MlSpec (no cross-engine oracle exists for fitted coefficients).
  */
object MlQueries extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // PercentageCalc end-to-end: fit per-user totals on events, transform.
    "q_percentage_calc" -> ((s, dir) => {
      val base = t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"))
      val model = new PercentageCalc()
        .setByGroup("user_id").setVariables(Array("value")).setConstant(15.0)
        .fit(base)
      model.transform(base)
        .select(col("event_id"), col("user_id"), r6(col("value")).as("value_pct"))
        .orderBy(col("event_id"))
    }),

    // Deterministic group-fold assignment (crc32-based, engine-portable).
    "q_grouped_folds" -> ((s, dir) => {
      GroupedFolds.withFold(
        t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey")),
        "c_nationkey", 5)
        .orderBy(col("c_custkey"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_percentage_calc" ->
      """WITH tot AS (
        |  SELECT user_id,
        |    CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS t
        |  FROM events GROUP BY user_id
        |)
        |SELECT event_id, e.user_id, ROUND(value / (t / 15.0), 6) AS value_pct
        |FROM events e JOIN tot USING (user_id)
        |ORDER BY event_id""".stripMargin,

    "q_grouped_folds" -> {
      val h = graft.functions.TextAnalytics.charHashDuck("CAST(c_nationkey AS VARCHAR)")
      s"""SELECT c_custkey, c_nationkey,
         |  CAST($h % 5 AS INT) AS fold
         |FROM customer ORDER BY c_custkey""".stripMargin
    }
  )
}
