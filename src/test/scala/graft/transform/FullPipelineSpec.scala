package graft.transform

import java.sql.DriverManager
import java.util.Properties

import graft.SparkSpec
import graft.load.{FplDdl, JdbcSink}
import graft.load.JdbcSink.Derby
import graft.sources.Sources

/** The reference's full wrapper (etl_full_wrapper.bash:10-32 — extract →
  * transform → load) as ONE program against live infrastructure: landed
  * raw JSON → 11-table transform → validation → the REAL FplDdl executed
  * on embedded Derby → FK-ordered load through Spark's JDBC writer →
  * read-back. The HTTP hop of the same chain is covered by ExtractSpec;
  * this spec proves the emitted 11-table constraint DDL and the
  * transform's output schemas actually agree with each other on a live
  * database.
  */
class FullPipelineSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:fplfull;create=true"
  private val props = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  private def exec(sql: String): Unit = {
    val conn = DriverManager.getConnection(url)
    try { val st = conn.createStatement(); st.execute(sql); st.close() }
    finally conn.close()
  }

  test("wrapper parity: landing → transform → validate → live DDL + FK-ordered load") {
    JdbcSink.registerDerbyDialect()
    val dir = FplRawFixtures.writeLanding()
    val tables = FplTransform.run(
      Sources.json(spark, dir + "/fixtures.json", FplSchemas.fixturesRaw),
      Sources.json(spark, dir + "/main.json", FplSchemas.mainRaw),
      Sources.json(spark, dir + "/players.json", FplSchemas.playersRaw),
      warn = _ => ())
    FplTransform.validate(tables, raiseErrors = true)

    val ordered = JdbcSink.loadOrder(FplDdl.all)
    // parents precede children in the create/load order
    val names = ordered.map(_.name)
    assert(names.indexOf("teams") < names.indexOf("fixtures"))
    assert(names.indexOf("fixtures") < names.indexOf("players_past"))

    ordered.foreach { spec =>
      exec(JdbcSink.createTableDdl(spec, Derby))
      JdbcSink.write(tables(spec.name), url, spec.name,
        spec.schema.fieldNames.toSeq, props)
    }

    // read-back: row counts survive the round trip for every table
    FplDdl.all.foreach { spec =>
      val back = spark.read.jdbc(url, spec.name, props)
      assert(back.count() === tables(spec.name).count(),
        s"${spec.name} round-trip count")
    }
    // and the league table's 0-based positions passed the (vacuous) CHECK
    val lt = spark.read.jdbc(url, "league_table", props)
    assert(lt.count() === 3)
  }
}
