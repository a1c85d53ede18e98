package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.transform.LeagueTable

/** The reference's flagship end-to-end transform as an oracle-checked
  * query: synthetic fixtures derived from `orders` → LeagueTable
  * (role split → flags → union → group-sum → rank). SURVEY.md §7.2.
  */
object TransformQueries extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_league_table" -> ((s, dir) => {
      LeagueTable.fromResults(
        LeagueTable.resultsFromOrders(Tables(s, dir, "orders")))
        .orderBy(col("table_position"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_league_table" ->
      """WITH r AS (
        |  SELECT o_orderkey % 20 AS home_id, (o_orderkey + o_custkey) % 20 AS away_id,
        |         o_orderkey % 5 AS home_score, o_custkey % 4 AS away_score,
        |         o_orderstatus <> 'O' AS played
        |  FROM orders
        |  WHERE o_orderkey % 20 <> (o_orderkey + o_custkey) % 20
        |), sides AS (
        |  SELECT home_id AS team_id,
        |    CASE WHEN played THEN home_score END AS goals_scored,
        |    CASE WHEN played THEN away_score END AS goals_conceded,
        |    CASE WHEN played THEN CAST(home_score > away_score AS INT) END AS win,
        |    CASE WHEN played THEN CAST(home_score = away_score AS INT) END AS draw,
        |    CASE WHEN played THEN CAST(home_score < away_score AS INT) END AS loss,
        |    CAST(played AS INT) AS played_n
        |  FROM r
        |  UNION ALL
        |  SELECT away_id,
        |    CASE WHEN played THEN away_score END,
        |    CASE WHEN played THEN home_score END,
        |    CASE WHEN played THEN CAST(away_score > home_score AS INT) END,
        |    CASE WHEN played THEN CAST(away_score = home_score AS INT) END,
        |    CASE WHEN played THEN CAST(away_score < home_score AS INT) END,
        |    CAST(played AS INT)
        |  FROM r
        |), t AS (
        |  SELECT team_id,
        |    CAST(SUM(played_n) AS BIGINT) AS played,
        |    CAST(SUM(win) AS BIGINT) AS won,
        |    CAST(SUM(draw) AS BIGINT) AS drawn,
        |    CAST(SUM(loss) AS BIGINT) AS lost,
        |    CAST(SUM(goals_scored) AS BIGINT) AS goals_scored,
        |    CAST(SUM(goals_conceded) AS BIGINT) AS goals_conceded
        |  FROM sides GROUP BY team_id
        |)
        |SELECT team_id, played, won, drawn, lost, goals_scored, goals_conceded,
        |  goals_scored - goals_conceded AS goal_difference,
        |  won * 3 + drawn AS points,
        |  row_number() OVER (ORDER BY won * 3 + drawn DESC,
        |    goals_scored - goals_conceded DESC, goals_scored DESC, team_id) - 1
        |    AS table_position
        |FROM t ORDER BY table_position""".stripMargin
  )
}
