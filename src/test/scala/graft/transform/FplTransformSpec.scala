package graft.transform

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

  private lazy val dir: String = FplRawFixtures.writeLanding()

  private lazy val tables: Map[String, org.apache.spark.sql.DataFrame] = {
    // concurrent sink: warn fires on a listener thread (this.synchronized
    // would deadlock against the lazy-val initializer's monitor)
    val warnings = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def warned(s: String): Boolean = warnings.stream().anyMatch(_.contains(s))
    // job-group scoping proves run() is fully lazy: plan construction
    // (incl. V3 observe warnings) starts no Spark job
    spark.sparkContext.setJobGroup("fpl-run-lazy", "lazy check")
    val t = FplTransform.run(
      Sources.json(spark, dir + "/fixtures.json", FplSchemas.fixturesRaw),
      Sources.json(spark, dir + "/main.json", FplSchemas.mainRaw),
      Sources.json(spark, dir + "/players.json", FplSchemas.playersRaw),
      warn = m => warnings.add(m))
    Thread.sleep(300) // let any (unexpected) async job events land
    assert(spark.sparkContext.statusTracker.getJobIdsForGroup("fpl-run-lazy").isEmpty,
      "run() must not trigger a Spark job before an action")
    spark.sparkContext.clearJobGroup()
    assert(warnings.isEmpty, "no warnings before first materialization")
    // first actions materialize the observed frames → V3 warnings fire
    t("fixtures").count()
    t("players_future").count()
    // QueryExecutionListener delivery is async — poll up to 10s
    val deadline = System.nanoTime() + 10_000_000_000L
    while (System.nanoTime() < deadline &&
      !(warned("postponed") && warned("dropping"))) Thread.sleep(50)
    assert(warned("postponed"), "V3 postponed warning fired")
    assert(warned("dropping 2 future rows"), "F1 drop logged")
    FplTransform.validate(t, raiseErrors = true)
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

  test("detachWarnListeners reclaims listeners of never-materialized runs") {
    // a run whose outputs are discarded without any action would leak its
    // V3 listeners on the shared session; detach must reclaim them
    FplTransform.run(
      Sources.json(spark, dir + "/fixtures.json", FplSchemas.fixturesRaw),
      Sources.json(spark, dir + "/main.json", FplSchemas.mainRaw),
      Sources.json(spark, dir + "/players.json", FplSchemas.playersRaw),
      warn = _ => ())
    assert(FplTransform.detachWarnListeners(spark) >= 1)
    // idempotent: everything already detached
    assert(FplTransform.detachWarnListeners(spark) === 0)
  }
}
