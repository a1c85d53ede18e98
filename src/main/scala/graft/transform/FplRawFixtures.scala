package graft.transform

/** Shared synthetic raw-JSON trio covering the reference's edge cases
  * (FIXTURES.md §3 footnote): postponed fixture (null event), a fixture
  * present in both history and future (duplicate-PK resolution), unplayed
  * null scores, null kickoff. Used by FplTransformSpec (file landing),
  * ExtractSpec (served from a fake HTTP endpoint), and — the reason it
  * lives in the main source set — [[graft.Bench]]'s EtlRun capstone
  * timing, which serves this trio from an in-JVM endpoint so the full
  * extract→transform→Derby-load chain gets a wall-clock record per round.
  */
object FplRawFixtures {

  val fixturesJson: String =
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
      |]""".stripMargin

  val mainJson: String =
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
      |}""".stripMargin

  /** Per-player element-summary bodies exactly as the API returns them —
    * WITHOUT player_id, which the extract splices in (the ref keys a dict
    * by id instead; the array-with-id landing is this repo's contract). */
  val playerDocs: Map[Long, String] = Map(
    10L ->
      """{"history":[
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
        |    "goals_conceded":30,"yellow_cards":3,"red_cards":0,"saves":0,"bonus":12,"bps":500}]}""".stripMargin,
    11L ->
      """{"history":[
        |   {"element":11,"fixture":2,"round":1,"was_home":true,"kickoff_time":"2024-08-10T14:00:00Z",
        |    "value":45,"selected":500,"transfers_in":3,"transfers_out":4,
        |    "total_points":3,"minutes":90,"goals_scored":0,"assists":0,"clean_sheets":0,
        |    "goals_conceded":2,"yellow_cards":1,"red_cards":0,"saves":4,"bonus":0,"bps":12}],
        | "fixtures":[
        |   {"code":104,"event":null,"team_h":3,"team_a":2,"is_home":false,"finished":false,
        |    "difficulty":3,"kickoff_time":null}],
        | "history_past":[]}""".stripMargin)

  /** Assembled landing form — the same id-splice the extract performs. */
  val playersJson: String = playerDocs.toSeq.sortBy(_._1)
    .map { case (id, d) => s"""{"player_id":$id,${d.trim.tail}""" }
    .mkString("[\n", ",\n", "\n]")

  /** Write the trio as landing files under a fresh temp dir. */
  def writeLanding(): String = {
    val d = java.nio.file.Files.createTempDirectory("fpl-raw").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(d, "fixtures.json"), fixturesJson)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(d, "main.json"), mainJson)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(d, "players.json"), playersJson)
    d
  }
}
