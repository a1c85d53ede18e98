package graft.load

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.load.JdbcSink.TableSpec

class JdbcSinkSpec extends AnyFunSuite {

  private val teams = TableSpec("teams",
    StructType(Seq(
      StructField("team_id", StringType, nullable = false),
      StructField("team_name", StringType))),
    primaryKey = Seq("team_id"))

  private val fixtures = TableSpec("fixtures",
    StructType(Seq(
      StructField("fixture_id", StringType, nullable = false),
      StructField("home_team_id", StringType),
      StructField("fixture_minutes", IntegerType))),
    primaryKey = Seq("fixture_id"),
    foreignKeys = Seq(("home_team_id", "teams", "team_id")),
    checks = Seq("fixture_minutes <= 90"))

  test("createTableDdl: PK + FK + CHECK + NOT NULL emitted") {
    val ddl = JdbcSink.createTableDdl(fixtures)
    assert(ddl.contains("CREATE TABLE fixtures"))
    assert(ddl.contains("fixture_id VARCHAR NOT NULL"))
    assert(ddl.contains("PRIMARY KEY (fixture_id)"))
    assert(ddl.contains("FOREIGN KEY (home_team_id) REFERENCES teams (team_id)"))
    assert(ddl.contains("CHECK (fixture_minutes <= 90)"))
  }

  test("loadOrder: parents before children") {
    val order = JdbcSink.loadOrder(Seq(fixtures, teams)).map(_.name)
    assert(order === Seq("teams", "fixtures"))
  }

  test("loadOrder: FK cycle detected") {
    val a = TableSpec("a", StructType(Seq(StructField("x", IntegerType))),
      Nil, Seq(("x", "b", "x")))
    val b = TableSpec("b", StructType(Seq(StructField("x", IntegerType))),
      Nil, Seq(("x", "a", "x")))
    assertThrows[IllegalArgumentException](JdbcSink.loadOrder(Seq(a, b)))
  }

  test("statusSnapshot: summary stamped with gameweek-now and load time") {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    val summary = Seq(("1", "a", ""), ("2", "d", "knock"))
      .toDF("player_id", "status", "news")
    val gws = Seq(("1", true), ("2", true), ("3", false))
      .toDF("gameweek_id", "gameweek_finished")
    val snap = JdbcSink.statusSnapshot(summary, gws,
      java.sql.Timestamp.valueOf("2026-08-12 00:00:00")).collect()
    assert(snap.length === 2)
    assert(snap.forall(_.getAs[String]("gameweek_now") === "3")) // max finished + 1
  }

  test("auditRow: one-row record frame with the reference's columns") {
    val spark = graft.SparkSpec.session
    val row = JdbcSink.auditRow(spark, "12", "graft",
      java.sql.Timestamp.valueOf("2026-08-12 00:00:00")).collect()
    assert(row.length === 1)
    assert(row.head.getString(1) === "12")
  }

  test("sqlType mapping covers the reference's column types") {
    assert(JdbcSink.sqlType(StringType) === "VARCHAR")
    assert(JdbcSink.sqlType(BooleanType) === "BOOL")
    assert(JdbcSink.sqlType(TimestampType) === "TIMESTAMP")
    assert(JdbcSink.sqlType(DecimalType(18, 2)) === "DECIMAL(18,2)")
  }
}
