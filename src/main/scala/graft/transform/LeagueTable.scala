package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryKit.dsum

/** The reference's flagship transform (SURVEY.md §7.2): match results →
  * home/away role split → win/draw/loss flags (null when unplayed) →
  * union → per-team group-sum → points/GD → 0-based table position.
  * (ref: etl/run_transform.py:386-446.)
  *
  * Input contract: one row per fixture with columns
  *   home_id, away_id, home_score, away_score, played (boolean).
  *
  * Scale notes: the role split is two narrow projections of the same scan
  * (Catalyst reuses the exchange); the only shuffle is the per-team hash
  * aggregate; the final rank runs on a team-sized frame (bounded by the
  * number of teams, not fixtures) so the unpartitioned window is safe.
  */
object LeagueTable {

  private def side(results: DataFrame, home: Boolean): DataFrame = {
    val (tid, gs, gc) =
      if (home) (col("home_id"), col("home_score"), col("away_score"))
      else (col("away_id"), col("away_score"), col("home_score"))
    def flag(c: Column): Column = when(col("played"), c.cast("int")) // null when unplayed (P9)
    results.select(
      tid.as("team_id"),
      when(col("played"), gs).as("goals_scored"),
      when(col("played"), gc).as("goals_conceded"),
      flag(gs > gc).as("win"),
      flag(gs === gc).as("draw"),
      flag(gs < gc).as("loss"),
      col("played").cast("int").as("played_n"))
  }

  /** Full league table with 0-based `table_position` (the reference emits
    * 0..19 against a CHECK(≤20) — reproduced; SURVEY.md §7.4 item 3). */
  def fromResults(results: DataFrame): DataFrame = {
    val both = side(results, home = true).unionByName(side(results, home = false))
    val table = both.groupBy(col("team_id")).agg(
      sum(col("played_n")).as("played"),
      sum(col("win")).as("won"),
      sum(col("draw")).as("drawn"),
      sum(col("loss")).as("lost"),
      sum(col("goals_scored")).as("goals_scored"),
      sum(col("goals_conceded")).as("goals_conceded"))
      .withColumn("goal_difference", col("goals_scored") - col("goals_conceded"))
      .withColumn("points", col("won") * 3 + col("drawn"))
    val w = Window.orderBy(
      col("points").desc, col("goal_difference").desc,
      col("goals_scored").desc, col("team_id"))
    table.withColumn("table_position", row_number().over(w).cast("long") - 1)
  }

  /** Deterministic synthetic fixtures derived from `orders` so the
    * transform is oracle-checkable on the benchmark tables: team ids and
    * scores are arithmetic on the order key, played = status <> 'O'. */
  def resultsFromOrders(orders: DataFrame, nTeams: Int = 20): DataFrame =
    orders.select(
      (col("o_orderkey") % nTeams).as("home_id"),
      ((col("o_orderkey") + col("o_custkey")) % nTeams).as("away_id"),
      (col("o_orderkey") % 5).as("home_score"),
      (col("o_custkey") % 4).as("away_score"),
      (col("o_orderstatus") =!= "O").as("played"))
      .filter(col("home_id") =!= col("away_id"))
}
