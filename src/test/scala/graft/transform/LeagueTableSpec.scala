package graft.transform

import graft.SparkSpec

class LeagueTableSpec extends SparkSpec {
  import spark.implicits._

  // 3 teams: A beats B 2-0, B draws C 1-1, C vs A unplayed
  private def results = Seq(
    (1L, 2L, 2L, 0L, true),
    (2L, 3L, 1L, 1L, true),
    (3L, 1L, 9L, 9L, false)
  ).toDF("home_id", "away_id", "home_score", "away_score", "played")

  test("fromResults: points, goal difference, 0-based positions") {
    val t = LeagueTable.fromResults(results)
      .orderBy("table_position")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(8), r.getLong(7), r.getLong(9)))
    // (team, played, points, goal_diff, position)
    assert(t.toSeq === Seq(
      (1L, 1L, 3L, 2L, 0L), // team 1: 1 win → 3 pts, +2 GD (unplayed fixture ignored)
      (3L, 1L, 1L, 0L, 1L), // team 3: 1 draw → 1 pt, GD 0 beats team 2 on GD
      (2L, 2L, 1L, -2L, 2L) // team 2: 1 loss + 1 draw → 1 pt, GD −2
    ))
  }

  test("unplayed fixtures contribute no flags, goals, or played count") {
    val t = LeagueTable.fromResults(results)
    val team1 = t.filter($"team_id" === 1L).collect().head
    assert(team1.getAs[Long]("won") === 1L)
    assert(team1.getAs[Long]("goals_scored") === 2L) // 9-9 unplayed not summed
    assert(team1.getAs[Long]("played") === 1L)
  }
}
