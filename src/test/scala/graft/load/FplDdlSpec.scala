package graft.load

import org.scalatest.funsuite.AnyFunSuite

class FplDdlSpec extends AnyFunSuite {

  test("loadOrder: parents precede children across the 11 tables") {
    val order = JdbcSink.loadOrder(FplDdl.all).map(_.name)
    assert(order.length === 11)
    def before(a: String, b: String) =
      assert(order.indexOf(a) < order.indexOf(b), s"$a must precede $b")
    before("teams", "fixtures")
    before("gameweeks", "fixtures")
    before("positions", "players_summary")
    before("players_summary", "players_past")
    before("fixtures", "players_past")
    before("players_summary", "players_full")
    before("teams", "league_table")
  }

  test("DDL carries the reference's CHECK constraints") {
    val ddl = JdbcSink.createTableDdl(FplDdl.fixtures)
    assert(ddl.contains("CHECK (fixture_minutes <= 90)"))
    val lt = JdbcSink.createTableDdl(FplDdl.leagueTable)
    assert(lt.contains("CHECK (table_position <= 20)"))
  }

  test("every transform output table has a spec with a primary key") {
    assert(FplDdl.all.map(_.name).toSet === Set(
      "fixtures", "gameweeks", "teams", "positions", "players_summary",
      "players_prev_seasons", "players_past", "players_future",
      "players_full", "team_results", "league_table"))
    assert(FplDdl.all.forall(_.primaryKey.nonEmpty))
  }
}
