package graft.load

import org.apache.spark.sql.types._

import graft.load.JdbcSink.TableSpec

/** Constraint-bearing DDL for the 11 FPL tables (SURVEY.md §2.9 V4; ref:
  * etl/load.py:112-472 — PK/FK/CHECK surface and the FK-safe create
  * order encoded there as comments). `loadOrder(all)` reproduces that
  * order topologically instead of by convention.
  */
object FplDdl {

  private val str = StringType
  private val i = LongType
  private val ts = TimestampType
  private val b = BooleanType

  private def f(pairs: (String, DataType)*): StructType =
    StructType(pairs.map { case (n, t) => StructField(n, t) })

  val teams: TableSpec = TableSpec("teams",
    f("team_id" -> str, "team_code" -> str, "team_name" -> str,
      "team_name_short" -> str, "team_strength" -> i,
      "strength_overall_home" -> i, "strength_overall_away" -> i),
    primaryKey = Seq("team_id"))

  val positions: TableSpec = TableSpec("positions",
    f("position_id" -> str, "position_name" -> str,
      "position_name_short" -> str, "squad_select" -> i),
    primaryKey = Seq("position_id"))

  val gameweeks: TableSpec = TableSpec("gameweeks",
    f("gameweek_id" -> str, "gameweek_name" -> str, "gameweek_deadline" -> ts,
      "gameweek_finished" -> b, "gameweek_current" -> b, "gameweek_next" -> b,
      "average_entry_score" -> i, "highest_score" -> i, "transfers_made" -> i),
    primaryKey = Seq("gameweek_id"))

  val fixtures: TableSpec = TableSpec("fixtures",
    f("fixture_id" -> str, "fixture_id_long" -> str, "gameweek_id" -> str,
      "fixture_finished" -> b, "fixture_started" -> b, "fixture_minutes" -> i,
      "fixture_kickoff_datetime" -> ts,
      "home_team_id" -> str, "away_team_id" -> str,
      "home_team_score" -> i, "away_team_score" -> i,
      "home_team_difficulty" -> i, "away_team_difficulty" -> i),
    primaryKey = Seq("fixture_id"),
    foreignKeys = Seq(
      ("gameweek_id", "gameweeks", "gameweek_id"),
      ("home_team_id", "teams", "team_id"),
      ("away_team_id", "teams", "team_id")),
    checks = Seq("fixture_minutes <= 90",
      "home_team_difficulty <= 4", "away_team_difficulty <= 4"))

  val playersSummary: TableSpec = TableSpec("players_summary",
    f("player_id" -> str, "player_code" -> str, "position_id" -> str,
      "team_id" -> str, "player_name" -> str, "news" -> str,
      "news_added" -> ts, "now_cost" -> i, "status" -> str,
      "form" -> DoubleType, "ict_index" -> DoubleType),
    primaryKey = Seq("player_id"),
    foreignKeys = Seq(
      ("position_id", "positions", "position_id"),
      ("team_id", "teams", "team_id")))

  val playersPrevSeasons: TableSpec = TableSpec("players_prev_seasons",
    f("player_id" -> str, "player_code" -> str, "season_name" -> str,
      "start_cost" -> i, "end_cost" -> i),
    primaryKey = Seq("player_id", "season_name"),
    foreignKeys = Seq(("player_id", "players_summary", "player_id")))

  val playersPast: TableSpec = TableSpec("players_past",
    f("player_id" -> str, "fixture_id" -> str, "gameweek_id" -> str,
      "fixture_home" -> b, "kickoff" -> ts, "value" -> i, "selected" -> i,
      "transfers_in" -> i, "transfers_out" -> i),
    primaryKey = Seq("player_id", "fixture_id"),
    foreignKeys = Seq(
      ("player_id", "players_summary", "player_id"),
      ("fixture_id", "fixtures", "fixture_id")))

  val playersFuture: TableSpec = TableSpec("players_future",
    f("player_id" -> str, "fixture_id" -> str, "fixture_id_long" -> str,
      "gameweek_id" -> str, "fixture_home" -> b, "difficulty" -> i,
      "kickoff" -> ts),
    primaryKey = Seq("player_id", "fixture_id"),
    foreignKeys = Seq(
      ("player_id", "players_summary", "player_id"),
      ("fixture_id", "fixtures", "fixture_id")),
    checks = Seq("difficulty <= 4"))

  val playersFull: TableSpec = TableSpec("players_full",
    f("player_id" -> str, "gameweek_id" -> str, "fixture_id" -> str,
      "position_id" -> str, "fixture_home" -> b, "total_points" -> i),
    primaryKey = Seq("player_id", "gameweek_id", "fixture_id"),
    foreignKeys = Seq(
      ("player_id", "players_summary", "player_id"),
      ("fixture_id", "fixtures", "fixture_id")))

  val teamResults: TableSpec = TableSpec("team_results",
    f("team_id" -> str, "team_name" -> str, "played" -> i, "won" -> i,
      "drawn" -> i, "lost" -> i, "goals_scored" -> i, "goals_conceded" -> i,
      "goal_difference" -> i, "points" -> i, "table_position" -> i),
    primaryKey = Seq("team_id"),
    foreignKeys = Seq(("team_id", "teams", "team_id")))

  val leagueTable: TableSpec = TableSpec("league_table",
    f("table_position" -> i, "team_id" -> str, "team_name" -> str,
      "played" -> i, "won" -> i, "drawn" -> i, "lost" -> i,
      "goals_scored" -> i, "goals_conceded" -> i, "goal_difference" -> i,
      "points" -> i),
    primaryKey = Seq("team_id"),
    foreignKeys = Seq(("team_id", "teams", "team_id")),
    checks = Seq("table_position <= 20")) // ref's vacuous check, kept (SURVEY §7.4-3)

  val all: Seq[TableSpec] = Seq(
    fixtures, playersFull, playersFuture, playersPast, playersPrevSeasons,
    playersSummary, leagueTable, teamResults, gameweeks, positions, teams)

  /** K5 — append-only status history (ref: etl/load.py:404-435
    * players_statuses: the summary snapshot stamped with gameweek_now +
    * load_datetime). Columns match [[JdbcSink.statusSnapshot]]'s
    * projection. NOT in [[all]]: history tables are never
    * batch-overwritten. Declared WITHOUT the ref's FKs deliberately:
    * the ref's very first reload runs `DROP TABLE players_summary
    * CASCADE` (etl/load.py:45-52), which silently destroys those FK
    * constraints while keeping the history table — so their production
    * steady state IS constraint-free, and declaring them here would
    * make any overwrite of the parents impossible without dropping the
    * history (Derby has no CASCADE). */
  val playersStatuses: TableSpec = TableSpec("players_statuses",
    f("load_datetime" -> ts, "gameweek_now" -> str, "player_id" -> str,
      "status" -> str, "news" -> str),
    primaryKey = Nil)

  /** K6 — one-row-per-load audit record (ref: etl/load.py:466-472). */
  val record: TableSpec = TableSpec("record",
    f("load_datetime" -> ts, "gameweek_now" -> str, "username" -> str),
    primaryKey = Seq("load_datetime"))
}
