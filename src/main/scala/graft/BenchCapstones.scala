package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.sql.Timestamp
import java.util.Properties

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession

import graft.load.JdbcSink
import graft.sources.JdkHttpFetcher
import graft.transform.FplRawFixtures

/** Wall-clock timing for the two composed capstones, so regressions in
  * the END-TO-END pipelines — not just the per-query surface — show up
  * in `bench/results` round over round (VERDICT r10 item 3).
  *
  * - `curate`: [[CurateRun.run]] over the bench SF's `documents` table
  *   into a fresh temp dir (fresh dir each call ⇒ the persisted LSH
  *   index is BUILT, not read back — the build is part of the cost
  *   being recorded).
  * - `etl`: [[EtlRun.run]] against an in-JVM HTTP endpoint serving the
  *   shared fixture trio and an in-memory Derby. Input is fixture-sized
  *   (independent of the bench SF), so this times the orchestration:
  *   ~40 JSON fetches, the transform/validate chain, DDL + FK-ordered
  *   JDBC load, status/audit appends.
  */
object BenchCapstones {

  /** Seconds for one CurateRun over `sfDir/documents`. */
  def curateSeconds(spark: SparkSession, sfDir: String): Double = {
    val out = java.nio.file.Files.createTempDirectory("bench-curate").toString
    try {
      val t0 = System.nanoTime()
      CurateRun.run(spark, sfDir, out, log = _ => ())
      (System.nanoTime() - t0) / 1e9
    } finally deleteRecursively(new java.io.File(out))
  }

  /** Seconds for one full EtlRun (extract → transform → JDBC load).
    *
    * The load goes through [[graft.load.ProxyJdbcServer]] — a loopback TCP
    * endpoint wrapping in-memory Derby — NOT the embedded driver directly,
    * so executor-side `df.write.jdbc` partitions cross a real socket to one
    * shared database. That makes the capstone valid under a multi-JVM
    * master (the round-13 bench had to skip it there: embedded Derby is
    * JVM-local, and the sandbox ships no derbynet/derbyclient), and it
    * prices the networked-database shape production K4–K6 actually has.
    * Local and multi-JVM records stay comparable because both pay the same
    * proxy path; the one-time switch is noted in BASELINE.md (round 14). */
  def etlSeconds(spark: SparkSession): Double = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    def respond(ex: HttpExchange, body: String): Unit = {
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }
    server.createContext("/api/bootstrap-static/",
      (ex: HttpExchange) => respond(ex, FplRawFixtures.mainJson))
    server.createContext("/api/fixtures/",
      (ex: HttpExchange) => respond(ex, FplRawFixtures.fixturesJson))
    server.createContext("/api/element-summary/",
      (ex: HttpExchange) => {
        val id =
          ex.getRequestURI.getPath.split("/").filter(_.nonEmpty).last.toLong
        respond(ex, FplRawFixtures.playerDocs.getOrElse(id, "{}"))
      })
    server.start()
    val base = s"http://127.0.0.1:${server.getAddress.getPort}"
    val landing = java.nio.file.Files.createTempDirectory("bench-etl").toString
    // unique DB name per call: in-memory Derby persists for the JVM's
    // lifetime, and a reused name would make run 2 measure a warm schema
    val db = s"benchetl${System.nanoTime()}"
    val backendProps = new Properties()
    backendProps.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val proxy = new graft.load.ProxyJdbcServer(
      s"jdbc:derby:memory:$db;create=true", backendProps)
    graft.load.ProxyJdbcDriver.ensureRegistered()
    try {
      val t0 = System.nanoTime()
      EtlRun.run(spark, new JdkHttpFetcher(),
        s"$base/api/bootstrap-static/", s"$base/api/fixtures/",
        s"$base/api/element-summary/%d/", landing, proxy.url,
        proxy.clientProps,
        JdbcSink.Derby, username = "bench", raiseErrors = true,
        loadDatetime = Timestamp.valueOf("2024-08-20 10:00:00"),
        log = _ => ())
      (System.nanoTime() - t0) / 1e9
    } finally {
      server.stop(0)
      proxy.stop()
      deleteRecursively(new java.io.File(landing))
      try java.sql.DriverManager.getConnection(s"jdbc:derby:memory:$db;drop=true")
      catch { case _: java.sql.SQLException => () } // 08006 = dropped OK
    }
  }

  private[graft] def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).toSeq.flatten
      .foreach(deleteRecursively)
    f.delete(): Unit
  }
}
