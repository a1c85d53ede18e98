package graft.transform

import org.apache.spark.sql.types._

/** Explicit schemas for the three raw FPL JSON inputs (FIXTURES.md §1–3;
  * type authority: the reference's Postgres DDL, etl/load.py:112-472).
  * Explicit + FAILFAST replaces the reference's implicit pandas inference
  * (SURVEY.md §1.3). Field lists follow the FIXTURES.md contracts; fields
  * absent from a raw doc read as null (the ref's NaN-tolerant path).
  */
object FplSchemas {

  /** Per-fixture stat columns shared by history / summary tables — the
    * full DDL list (etl/load.py:303-339): long counters plus the
    * float-valued ICT components. Missing fields in a raw doc read as
    * null (schema-explicit read), matching the ref's NaN-tolerant path. */
  val playerStats: Seq[String] = Seq(
    "total_points", "minutes", "goals_scored", "assists", "clean_sheets",
    "goals_conceded", "own_goals", "penalties_saved", "penalties_missed",
    "yellow_cards", "red_cards", "saves", "bonus", "bps")

  /** Float-valued per-fixture stats (DDL FLOAT(8), etl/load.py:131-134). */
  val playerStatsDouble: Seq[String] =
    Seq("influence", "creativity", "threat")

  private def statFields: Seq[StructField] =
    playerStats.map(StructField(_, LongType)) ++
      playerStatsDouble.map(StructField(_, DoubleType))

  /** fixtures.json — array of fixture objects (FIXTURES.md §1). */
  val fixturesRaw: StructType = StructType(Seq(
    StructField("code", LongType),
    StructField("event", LongType), // null = postponed (F1/V3 path)
    StructField("id", LongType),
    StructField("finished", BooleanType),
    StructField("finished_provisional", BooleanType),
    StructField("started", BooleanType),
    StructField("minutes", LongType),
    StructField("kickoff_time", StringType), // ISO8601 | null
    StructField("team_a", LongType),
    StructField("team_h", LongType),
    StructField("team_a_score", LongType),
    StructField("team_h_score", LongType),
    StructField("team_h_difficulty", LongType),
    StructField("team_a_difficulty", LongType)))

  /** main.json — one object with four used arrays (FIXTURES.md §2). */
  val mainRaw: StructType = StructType(Seq(
    StructField("events", ArrayType(StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("deadline_time", StringType),
      StructField("deadline_time_epoch", LongType),
      StructField("deadline_time_game_offset", LongType),
      StructField("finished", BooleanType),
      StructField("data_checked", BooleanType),
      StructField("is_previous", BooleanType),
      StructField("is_current", BooleanType),
      StructField("is_next", BooleanType),
      StructField("average_entry_score", LongType),
      StructField("highest_score", LongType),
      StructField("highest_scoring_entry", LongType),
      StructField("most_selected", LongType),
      StructField("most_transferred_in", LongType),
      StructField("top_element", LongType),
      StructField("most_captained", LongType),
      StructField("most_vice_captained", LongType),
      StructField("transfers_made", LongType))))),
    StructField("teams", ArrayType(StructType(Seq(
      StructField("code", LongType),
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("short_name", StringType),
      StructField("strength", LongType),
      StructField("strength_overall_home", LongType),
      StructField("strength_overall_away", LongType),
      StructField("strength_attack_home", LongType),
      StructField("strength_attack_away", LongType),
      StructField("strength_defence_home", LongType),
      StructField("strength_defence_away", LongType))))),
    StructField("element_types", ArrayType(StructType(Seq(
      StructField("id", LongType),
      StructField("singular_name", StringType),
      StructField("singular_name_short", StringType),
      StructField("squad_select", LongType),
      StructField("squad_min_play", LongType),
      StructField("squad_max_play", LongType))))),
    StructField("elements", ArrayType(StructType(Seq(
      StructField("code", LongType),
      StructField("id", LongType),
      StructField("element_type", LongType),
      StructField("team", LongType),
      StructField("team_code", LongType),
      StructField("event_points", LongType),
      StructField("first_name", StringType),
      StructField("second_name", StringType),
      StructField("news", StringType),
      StructField("news_added", StringType),
      StructField("now_cost", LongType),
      StructField("selected_by_percent", DoubleType),
      StructField("chance_of_playing_next_round", LongType),
      StructField("chance_of_playing_this_round", LongType),
      StructField("cost_change_event", LongType),
      StructField("cost_change_event_fall", LongType),
      StructField("cost_change_start", LongType),
      StructField("cost_change_start_fall", LongType),
      StructField("ep_next", DoubleType),
      StructField("ep_this", DoubleType),
      StructField("in_dreamteam", BooleanType),
      StructField("dreamteam_count", LongType),
      StructField("photo", StringType),
      StructField("points_per_game", DoubleType),
      StructField("special", BooleanType),
      StructField("status", StringType),
      StructField("transfers_in", LongType),
      StructField("transfers_out", LongType),
      StructField("transfers_in_event", LongType),
      StructField("transfers_out_event", LongType),
      StructField("value_form", DoubleType),
      StructField("value_season", DoubleType),
      StructField("form", DoubleType),
      StructField("ict_index", DoubleType)) ++ statFields)))))

  /** players.json — modeled as array of {player_id, history[], fixtures[],
    * history_past[]} (FIXTURES.md §3; the ref's dict-of-docs → S4). */
  val playersRaw: StructType = StructType(Seq(
    StructField("player_id", LongType),
    StructField("history", ArrayType(StructType(Seq(
      StructField("element", LongType),
      StructField("fixture", LongType),
      StructField("round", LongType),
      StructField("was_home", BooleanType),
      StructField("kickoff_time", StringType),
      StructField("value", LongType),
      StructField("selected", LongType),
      StructField("transfers_balance", LongType),
      StructField("transfers_in", LongType),
      StructField("transfers_out", LongType)) ++ statFields))),
    StructField("fixtures", ArrayType(StructType(Seq(
      StructField("code", LongType),
      StructField("event", LongType), // null → F1 drop
      StructField("team_h", LongType),
      StructField("team_a", LongType),
      StructField("is_home", BooleanType),
      StructField("finished", BooleanType),
      StructField("difficulty", LongType),
      StructField("kickoff_time", StringType))))),
    StructField("history_past", ArrayType(StructType(Seq(
      StructField("element_code", LongType),
      StructField("season_name", StringType),
      StructField("start_cost", LongType),
      StructField("end_cost", LongType)) ++ statFields)))))
}
