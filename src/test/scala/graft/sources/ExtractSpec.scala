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
}
