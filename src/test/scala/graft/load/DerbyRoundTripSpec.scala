package graft.load

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll

import graft.SparkSpec
import graft.load.JdbcSink.TableSpec

/** K4–K6 executed against a LIVE database: Derby embedded (ships with
  * Spark for the Hive metastore, so it is on the classpath with zero extra
  * dependencies). The emitted DDL actually runs, loads happen in FK order
  * through Spark's JDBC writer, and the PK/FK/CHECK constraints are proven
  * to REJECT bad rows — the reference's Postgres behavior
  * (etl/load.py:34-83) reproduced end to end, not string-asserted.
  */
class DerbyRoundTripSpec extends SparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  // Live override (README "Live-I/O readiness" smoke 3): point
  // GRAFT_JDBC_URL at a real Postgres and the SAME suite runs there —
  // dialect, driver and credentials all follow the URL. Default is the
  // embedded-Derby round trip that needs no environment at all.
  private val url = sys.env.getOrElse("GRAFT_JDBC_URL",
    "jdbc:derby:memory:graftdb;create=true")
  private val dialect: JdbcSink.Dialect =
    if (url.startsWith("jdbc:postgresql")) JdbcSink.Postgres else JdbcSink.Derby
  private val props = {
    val p = new Properties()
    if (dialect == JdbcSink.Postgres) {
      p.setProperty("driver", "org.postgresql.Driver")
      sys.env.get("GRAFT_JDBC_USER").foreach(p.setProperty("user", _))
      sys.env.get("GRAFT_JDBC_PASSWORD").foreach(p.setProperty("password", _))
    } else p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  private val teams = TableSpec("d_teams",
    StructType(Seq(
      StructField("team_id", StringType),
      StructField("team_name", StringType))),
    primaryKey = Seq("team_id"))

  private val fixtures = TableSpec("d_fixtures",
    StructType(Seq(
      StructField("fixture_id", StringType),
      StructField("home_team_id", StringType),
      StructField("minutes", LongType))),
    primaryKey = Seq("fixture_id"),
    foreignKeys = Seq(("home_team_id", "d_teams", "team_id")),
    checks = Seq("minutes <= 90"))

  private def exec(sql: String): Unit = {
    val conn = DriverManager.getConnection(url, props)
    try { val st = conn.createStatement(); st.execute(sql); st.close() }
    finally conn.close()
  }

  private def execFails(sql: String): java.sql.SQLException =
    intercept[java.sql.SQLException] { exec(sql) }

  override def beforeAll(): Unit = {
    super.beforeAll()
    JdbcSink.registerDerbyDialect()
    // FK-safe create order: parents first
    JdbcSink.loadOrder(Seq(fixtures, teams))
      .foreach(s => exec(JdbcSink.createTableDdl(s, dialect)))
  }

  test("emitted DDL executes and FK-ordered Spark JDBC load round-trips") {
    val t = Seq(("1", "Arsenal"), ("2", "Chelsea")).toDF("team_id", "team_name")
    val f = Seq(("10", "1", 90L), ("11", "2", 45L))
      .toDF("fixture_id", "home_team_id", "minutes")
    // children reference parents → load in loadOrder
    for ((spec, df) <- JdbcSink.loadOrder(Seq(fixtures, teams))
        .map(s => s -> (if (s.name == "d_teams") t else f)))
      JdbcSink.write(df, url, spec.name, spec.schema.fieldNames.toSeq, props)

    val back = spark.read.jdbc(url, "d_fixtures", props)
    assert(back.count() === 2)
    assert(back.columns.toSeq.map(_.toLowerCase)
      === Seq("fixture_id", "home_team_id", "minutes"))
  }

  test("constraints reject: FK violation, CHECK violation, duplicate PK") {
    val fk = execFails(
      "INSERT INTO d_fixtures VALUES ('99', 'no-such-team', 10)")
    assert(fk.getSQLState === "23503") // FK violation
    val ck = execFails(
      "INSERT INTO d_fixtures VALUES ('98', '1', 120)")
    assert(ck.getSQLState === "23513") // CHECK violation
    val pk = execFails(
      "INSERT INTO d_teams VALUES ('1', 'Dup')")
    assert(pk.getSQLState === "23505") // PK violation
  }

  test("K5/K6: status snapshot + audit row append through the same sink") {
    val statuses = TableSpec("d_statuses",
      StructType(Seq(
        StructField("player_id", StringType),
        StructField("status", StringType),
        StructField("news", StringType),
        StructField("gameweek_now", StringType),
        StructField("load_datetime", TimestampType))),
      primaryKey = Nil)
    val record = TableSpec("d_record",
      StructType(Seq(
        StructField("load_datetime", TimestampType),
        StructField("gameweek_now", StringType),
        StructField("username", StringType))),
      primaryKey = Nil)
    exec(JdbcSink.createTableDdl(statuses, dialect))
    exec(JdbcSink.createTableDdl(record, dialect))

    val now = java.sql.Timestamp.valueOf("2026-08-12 10:00:00")
    val summary = Seq(("10", "a", ""), ("11", "d", "knock"))
      .toDF("player_id", "status", "news")
    val gws = Seq(("1", true), ("2", false))
      .toDF("gameweek_id", "gameweek_finished")
    val snap = JdbcSink.statusSnapshot(summary, gws, now)
    JdbcSink.write(snap, url, "d_statuses", snap.columns.toSeq, props)
    val audit = JdbcSink.auditRow(spark, "2", "graft", now)
    JdbcSink.write(audit, url, "d_record", audit.columns.toSeq, props)

    // appends accumulate (K5 is history, not overwrite)
    JdbcSink.write(snap, url, "d_statuses", snap.columns.toSeq, props)
    assert(spark.read.jdbc(url, "d_statuses", props).count() === 4)
    val rec = spark.read.jdbc(url, "d_record", props).collect().head
    assert(rec.getAs[String]("GAMEWEEK_NOW") === "2")
  }
}
