package graft.transform

import java.nio.file.{Files, Paths}

import graft.{SparkSpec, Tables}
import graft.sources.Sources

/** Golden end-to-end run of the 11-table transform on a synthetic raw-JSON
  * trio covering the reference's edge cases (FIXTURES.md §3 footnote):
  * postponed fixture (null event), a fixture present in both history and
  * future (duplicate-PK resolution), unplayed null scores, null kickoff.
  */
class FplTransformSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("fpl-raw").toString
    Files.writeString(Paths.get(d, "fixtures.json"),
      """[
        |{"code":101,"event":1,"id":1,"finished":true,"started":true,"minutes":90,
        | "kickoff_time":"2024-08-10T11:30:00Z","team_a":2,"team_h":1,
        | "team_a_score":0,"team_h_score":2,"team_h_difficulty":2,"team_a_difficulty":4},
        |{"code":102,"event":1,"id":2,"finished":true,"started":true,"minutes":90,
        | "kickoff_time":"2024-08-10T14:00:00Z","team_a":3,"team_h":2,
        | "team_a_score":1,"team_h_score":1,"team_h_difficulty":3,"team_a_difficulty":3},
        |{"code":103,"event":2,"id":3,"finished":false,"started":false,"minutes":0,
        | "kickoff_time":"2024-08-17T14:00:00Z","team_a":1,"team_h":3,
        | "team_a_score":null,"team_h_score":null,"team_h_difficulty":2,"team_a_difficulty":2},
        |{"code":104,"event":null,"id":4,"finished":false,"started":false,"minutes":0,
        | "kickoff_time":null,"team_a":2,"team_h":3,
        | "team_a_score":null,"team_h_score":null,"team_h_difficulty":3,"team_a_difficulty":3}
        |]""".stripMargin)
    Files.writeString(Paths.get(d, "main.json"),
      """{"events":[
        |  {"id":1,"name":"Gameweek 1","deadline_time":"2024-08-10T10:00:00Z","finished":true,
        |   "is_current":false,"is_next":false,"average_entry_score":50,"highest_score":90,"transfers_made":100},
        |  {"id":2,"name":"Gameweek 2","deadline_time":"2024-08-17T10:00:00Z","finished":false,
        |   "is_current":true,"is_next":false,"average_entry_score":null,"highest_score":null,"transfers_made":5}],
        | "teams":[
        |  {"code":3,"id":1,"name":"Arsenal","short_name":"ARS","strength":4,"strength_overall_home":1200,"strength_overall_away":1150},
        |  {"code":8,"id":2,"name":"Chelsea","short_name":"CHE","strength":4,"strength_overall_home":1180,"strength_overall_away":1140},
        |  {"code":43,"id":3,"name":"City","short_name":"MCI","strength":5,"strength_overall_home":1300,"strength_overall_away":1290}],
        | "element_types":[
        |  {"id":1,"singular_name":"Goalkeeper","singular_name_short":"GKP","squad_select":2},
        |  {"id":3,"singular_name":"Midfielder","singular_name_short":"MID","squad_select":5}],
        | "elements":[
        |  {"code":501,"id":10,"element_type":3,"team":1,"first_name":"Ada","second_name":"Lovelace",
        |   "news":"","news_added":null,"now_cost":75,"status":"a","form":3.5,"ict_index":8.1,
        |   "total_points":12,"minutes":180,"goals_scored":1,"assists":1,"clean_sheets":1,
        |   "goals_conceded":1,"yellow_cards":0,"red_cards":0,"saves":0,"bonus":2,"bps":40},
        |  {"code":502,"id":11,"element_type":1,"team":2,"first_name":"Alan","second_name":"Turing",
        |   "news":"knock","news_added":"2024-08-12T09:00:00Z","now_cost":45,"status":"d","form":2.0,"ict_index":1.2,
        |   "total_points":3,"minutes":90,"goals_scored":0,"assists":0,"clean_sheets":0,
        |   "goals_conceded":2,"yellow_cards":1,"red_cards":0,"saves":4,"bonus":0,"bps":12}]
        |}""".stripMargin)
    Files.writeString(Paths.get(d, "players.json"),
      """[
        |{"player_id":10,
        | "history":[
        |   {"element":10,"fixture":1,"round":1,"was_home":true,"kickoff_time":"2024-08-10T11:30:00Z",
        |    "value":75,"selected":1000,"transfers_in":10,"transfers_out":2,
        |    "total_points":8,"minutes":90,"goals_scored":1,"assists":0,"clean_sheets":1,
        |    "goals_conceded":0,"yellow_cards":0,"red_cards":0,"saves":0,"bonus":2,"bps":30},
        |   {"element":10,"fixture":3,"round":2,"was_home":false,"kickoff_time":"2024-08-17T14:00:00Z",
        |    "value":76,"selected":1100,"transfers_in":12,"transfers_out":1,
        |    "total_points":4,"minutes":90,"goals_scored":0,"assists":1,"clean_sheets":0,
        |    "goals_conceded":1,"yellow_cards":0,"red_cards":0,"saves":0,"bonus":0,"bps":10}],
        | "fixtures":[
        |   {"code":103,"event":2,"team_h":3,"team_a":1,"is_home":false,"finished":false,
        |    "difficulty":2,"kickoff_time":"2024-08-17T14:00:00Z"},
        |   {"code":104,"event":null,"team_h":3,"team_a":2,"is_home":true,"finished":false,
        |    "difficulty":3,"kickoff_time":null}],
        | "history_past":[
        |   {"element_code":501,"season_name":"2023/24","start_cost":70,"end_cost":76,
        |    "total_points":120,"minutes":2700,"goals_scored":6,"assists":9,"clean_sheets":10,
        |    "goals_conceded":30,"yellow_cards":3,"red_cards":0,"saves":0,"bonus":12,"bps":500}]},
        |{"player_id":11,
        | "history":[
        |   {"element":11,"fixture":2,"round":1,"was_home":true,"kickoff_time":"2024-08-10T14:00:00Z",
        |    "value":45,"selected":500,"transfers_in":3,"transfers_out":4,
        |    "total_points":3,"minutes":90,"goals_scored":0,"assists":0,"clean_sheets":0,
        |    "goals_conceded":2,"yellow_cards":1,"red_cards":0,"saves":4,"bonus":0,"bps":12}],
        | "fixtures":[
        |   {"code":104,"event":null,"team_h":3,"team_a":2,"is_home":false,"finished":false,
        |    "difficulty":3,"kickoff_time":null}],
        | "history_past":[]}
        |]""".stripMargin)
    d
  }

  private lazy val tables: Map[String, org.apache.spark.sql.DataFrame] = {
    var warnings: List[String] = Nil
    val t = FplTransform.run(
      Sources.json(spark, dir + "/fixtures.json", FplSchemas.fixturesRaw),
      Sources.json(spark, dir + "/main.json", FplSchemas.mainRaw),
      Sources.json(spark, dir + "/players.json", FplSchemas.playersRaw),
      raiseErrors = true,
      warn = m => warnings = m :: warnings)
    assert(warnings.exists(_.contains("postponed")), "V3 postponed warning fired")
    assert(warnings.exists(_.contains("dropping 2 future rows")), "F1 drop logged")
    t
  }

  test("11 tables produced; validation passes with raiseErrors") {
    assert(tables.keySet.size === 11)
    assert(tables("fixtures").count() === 4)
    assert(tables("gameweeks").count() === 2)
    assert(tables("teams").count() === 3)
    assert(tables("positions").count() === 2)
    assert(tables("players_summary").count() === 2)
    assert(tables("players_prev_seasons").count() === 1)
  }

  test("F1: postponed future rows dropped; J2 join resolves fixture_id") {
    val fut = tables("players_future")
    assert(fut.count() === 1) // both event:null rows dropped
    val r = fut.collect().head
    assert(r.getAs[String]("fixture_id") === "3")
  }

  test("F2: duplicate (player,gw,fixture) keeps the played history row") {
    val full = tables("players_full")
    val dup = full.filter($"player_id" === "10" && $"fixture_id" === "3").collect()
    assert(dup.length === 1)
    assert(dup.head.getAs[Long]("total_points") === 4L) // history row won
    // position attached via J3
    assert(dup.head.getAs[String]("position_id") === "3")
    assert(full.count() === 3) // 3 history rows (future dup dropped)
  }

  test("league table: group-sum + 0-based rank over played fixtures only") {
    val lt = tables("league_table").orderBy("table_position").collect()
    assert(lt.length === 3)
    // fixture 1: team1 2-0 team2; fixture 2: team2 1-1 team3
    val pos0 = lt(0)
    assert(pos0.getAs[String]("team_name") === "Arsenal")
    assert(pos0.getAs[Long]("points") === 3L)
    assert(pos0.getAs[Long]("table_position") === 0L)
    val chelsea = lt.find(_.getAs[String]("team_name") === "Chelsea").get
    assert(chelsea.getAs[Long]("played") === 2L)
    assert(chelsea.getAs[Long]("points") === 1L)
  }

  test("lenient timestamps: ISO parsed, null kickoff stays null") {
    val fx = tables("fixtures")
    assert(fx.filter($"fixture_kickoff_datetime".isNull).count() === 1)
    assert(fx.filter($"fixture_id" === "1")
      .select(date_format($"fixture_kickoff_datetime", "yyyy-MM-dd HH:mm").as("k"))
      .collect().head.getString(0) === "2024-08-10 11:30")
  }
}
