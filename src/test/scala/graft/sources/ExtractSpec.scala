package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll

import graft.SparkSpec
import graft.transform.{FplRawFixtures, FplSchemas, FplTransform}

/** S1/S2 end-to-end: a fake in-JVM HTTP endpoint serves the reference
  * API shapes (bootstrap-static, fixtures, per-player element-summary),
  * the extract fans out and lands JSON, and the landed trio runs through
  * the full transform — the one-program extract→transform path of the
  * reference's etl_full_wrapper.bash:10-32.
  */
class ExtractSpec extends SparkSpec with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var base: String = _

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
        // path: /api/element-summary/<id>/
        val id = ex.getRequestURI.getPath.split("/").filter(_.nonEmpty).last.toLong
        FplRawFixtures.playerDocs.get(id) match {
          case Some(doc) => respond(ex, 200, doc)
          case None => respond(ex, 404, """{"detail":"Not found."}""")
        }
      })
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop(0)
    super.afterAll()
  }

  test("extract fans out over HTTP, lands byte-exact JSON, transform runs e2e") {
    val landing = java.nio.file.Files.createTempDirectory("fpl-landing").toString
    val (mainPath, fixturesPath, playersPath) = HttpExtract.extractAll(
      spark, new JdkHttpFetcher(),
      s"$base/api/bootstrap-static/", s"$base/api/fixtures/",
      s"$base/api/element-summary/%d/",
      landing, FplSchemas.mainRaw)

    // K1 — landing is byte-exact for the bulk endpoints
    assert(java.nio.file.Files.readString(java.nio.file.Paths.get(mainPath))
      === FplRawFixtures.mainJson)
    assert(java.nio.file.Files.readString(java.nio.file.Paths.get(fixturesPath))
      === FplRawFixtures.fixturesJson)
    // fan-out assembled the deterministic array-with-id landing form
    assert(java.nio.file.Files.readString(java.nio.file.Paths.get(playersPath))
      === FplRawFixtures.playersJson)

    // landed trio → full transform (the wrapper's extract→transform hop)
    val tables = FplTransform.run(
      Sources.json(spark, fixturesPath, FplSchemas.fixturesRaw),
      Sources.json(spark, mainPath, FplSchemas.mainRaw),
      Sources.json(spark, playersPath, FplSchemas.playersRaw),
      warn = _ => ())
    FplTransform.validate(tables, raiseErrors = true)
    assert(tables.keySet.size === 11)
    assert(tables("players_summary").count() === 2)
    assert(tables("players_full").count() === 3)
  }

  test("non-2xx raises (ref raise_for_status)") {
    val err = intercept[java.io.IOException] {
      new JdkHttpFetcher().get(s"$base/api/element-summary/999/")
    }
    assert(err.getMessage.contains("404"))
  }

  test("executor-written JSONL fan-out feeds the transform identically") {
    val tmp = java.nio.file.Files.createTempDirectory("fpl-jsonl")
    val ids = FplRawFixtures.playerDocs.keys.toSeq.sorted
    val playersDir = HttpExtract.retrievePlayerDetailsJsonl(
      spark, new JdkHttpFetcher(), s"$base/api/element-summary/%d/",
      ids, s"$tmp/players", partitions = 2)
    // multiple part files actually written by executors
    val parts = new java.io.File(playersDir)
      .listFiles().count(_.getName.startsWith("part-"))
    assert(parts === 2)
    // parsed JSONL frame == parsed array-landing frame (same schema, rows)
    val viaJsonl = Sources.jsonl(spark, playersDir, FplSchemas.playersRaw)
    val arrayPath = HttpExtract.saveIntermediate(
      FplRawFixtures.playersJson, "players", tmp.toString)
    val viaArray = Sources.json(spark, arrayPath, FplSchemas.playersRaw)
    assert(viaJsonl.count() === viaArray.count())
    assert(viaJsonl.exceptAll(viaArray).count() === 0)
    assert(viaArray.exceptAll(viaJsonl).count() === 0)
    // and the transform accepts the JSONL landing end-to-end
    val mainPath = HttpExtract.saveIntermediate(
      FplRawFixtures.mainJson, "main", tmp.toString)
    val fixturesPath = HttpExtract.saveIntermediate(
      FplRawFixtures.fixturesJson, "fixtures", tmp.toString)
    val tables = FplTransform.run(
      Sources.json(spark, fixturesPath, FplSchemas.fixturesRaw),
      Sources.json(spark, mainPath, FplSchemas.mainRaw),
      viaJsonl, warn = _ => ())
    FplTransform.validate(tables, raiseErrors = true)
    assert(tables("players_full").count() === 3)
  }

  test("spliceId: empty-object responses stay valid JSON") {
    assert(HttpExtract.spliceId(7, "{}") === """{"player_id":7}""")
    assert(HttpExtract.spliceId(7, "{ }") === """{"player_id":7}""")
    assert(HttpExtract.spliceId(7, """ {"a":1} """) === """{"player_id":7,"a":1}""")
    intercept[IllegalArgumentException](HttpExtract.spliceId(7, "[1,2]"))
  }
}
