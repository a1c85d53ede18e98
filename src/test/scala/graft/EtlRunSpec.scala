package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.sql.Timestamp
import java.util.Properties

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll

import graft.load.{FplDdl, JdbcSink}
import graft.transform.FplRawFixtures

/** The §3.1 capstone end to end: ONE [[EtlRun.run]] call drives HTTP
  * extract → transform+validate → live Derby DDL → FK-ordered load →
  * status/audit appends, and the spec audits the resulting database
  * against golden expectations from the shared fixture trio. A second
  * run proves the overwrite/append split: data tables stay at golden
  * counts, history tables accumulate.
  */
class EtlRunSpec extends SparkSpec with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var base: String = _
  private val url = "jdbc:derby:memory:etlrun;create=true"
  private val props = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api/bootstrap-static/",
      (ex: HttpExchange) => respond(ex, 200, FplRawFixtures.mainJson))
    server.createContext("/api/fixtures/",
      (ex: HttpExchange) => respond(ex, 200, FplRawFixtures.fixturesJson))
    server.createContext("/api/element-summary/",
      (ex: HttpExchange) => {
        val id = ex.getRequestURI.getPath.split("/").filter(_.nonEmpty).last.toLong
        FplRawFixtures.playerDocs.get(id) match {
          case Some(doc) => respond(ex, 200, doc)
          case None => respond(ex, 404, """{"detail":"Not found."}""")
        }
      })
    // a corrupted bootstrap feed: two elements share id 10 → duplicate
    // players_summary PK, the V1 check the wrapper's --raise-errors
    // must turn into a run-cancelling failure
    server.createContext("/corrupt/bootstrap-static/",
      (ex: HttpExchange) => respond(ex, 200,
        FplRawFixtures.mainJson.replace("\"id\":11", "\"id\":10")))
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop(0)
    super.afterAll()
  }

  private def runOnce(ts: Timestamp): EtlRun.Result = {
    val landing = java.nio.file.Files.createTempDirectory("etlrun-landing").toString
    EtlRun.run(spark, new graft.sources.JdkHttpFetcher(),
      s"$base/api/bootstrap-static/", s"$base/api/fixtures/",
      s"$base/api/element-summary/%d/", landing,
      url, props, JdbcSink.Derby, username = "graft",
      raiseErrors = true, loadDatetime = ts, log = _ => ())
  }

  test("one main call: extract → transform → load lands 11 audited tables + status/audit rows") {
    val r1 = runOnce(Timestamp.valueOf("2024-08-20 10:00:00"))

    // golden counts from the fixture trio (FplRawFixtures semantics:
    // 4 fixtures incl. 1 postponed; 2 players; 3 history rows; 3 future
    // rows minus the null-gameweek drops = players_future keeps only
    // gameweek'd fixtures (1 per player doc with event null dropped) —
    // read the authored fixture: player 10 has 1 dated + 1 postponed,
    // player 11 has 1 postponed → 1 future row)
    val expected = Map(
      "teams" -> 3L, "positions" -> 2L, "gameweeks" -> 2L,
      "fixtures" -> 4L, "players_summary" -> 2L,
      "players_prev_seasons" -> 1L, "players_past" -> 3L,
      "players_future" -> 1L, "players_full" -> 3L,
      "team_results" -> 3L, "league_table" -> 3L)
    assert(r1.counts === expected)
    assert(r1.gameweekNow === "2") // gw1 finished → now = 2

    // every table audited in the DATABASE, not just in the result map
    for ((name, n) <- expected) {
      val back = spark.read.jdbc(url, name, props)
      assert(back.count() === n, s"$name round-trip count")
    }
    // history/audit appends
    val statuses = spark.read.jdbc(url, "players_statuses", props)
    assert(statuses.count() === 2L)
    assert(statuses.select("gameweek_now").distinct().head.getString(0) === "2")
    val record = spark.read.jdbc(url, "record", props)
    assert(record.count() === 1L)
    // select-by-name (analysis is case-insensitive; Derby read-back
    // uppercases the physical field names, so Row.getAs would miss)
    val rec = record.select("username", "gameweek_now").head
    assert(rec.getString(0) === "graft")
    assert(rec.getString(1) === "2")

    // run 2 (a later load): data tables OVERWRITE back to golden counts,
    // history tables APPEND — the ref's batch_overwrite/batch_append split
    runOnce(Timestamp.valueOf("2024-08-21 10:00:00"))
    for ((name, n) <- expected)
      assert(spark.read.jdbc(url, name, props).count() === n,
        s"$name after second load")
    assert(spark.read.jdbc(url, "players_statuses", props).count() === 4L)
    assert(spark.read.jdbc(url, "record", props).count() === 2L)
  }

  test("--raise-errors parity: a failed validation cancels the run before any load") {
    val failUrl = "jdbc:derby:memory:etlrunfail;create=true"
    val landing = java.nio.file.Files.createTempDirectory("etlrun-fail").toString
    val ex = intercept[IllegalStateException] {
      EtlRun.run(spark, new graft.sources.JdkHttpFetcher(),
        s"$base/corrupt/bootstrap-static/", s"$base/api/fixtures/",
        s"$base/api/element-summary/%d/", landing,
        failUrl, props, JdbcSink.Derby, username = "graft",
        raiseErrors = true,
        loadDatetime = Timestamp.valueOf("2024-08-22 10:00:00"), log = _ => ())
    }
    // the duplicated element dups several player tables' PKs; whichever
    // V1 check fires first, it must be a quality failure that aborts
    assert(ex.getMessage.contains("check failed") &&
      ex.getMessage.contains("unique PK"), ex.getMessage)
    // the wrapper's exit-1 chain: the load stage never ran — the target
    // database has no tables at all
    intercept[Exception] {
      spark.read.jdbc(failUrl, "teams", props).count()
    }
  }
}
