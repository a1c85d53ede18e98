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

  test("modelling path: features read back FROM the database, pipeline fits") {
    // ref §3.3: the notebooks read the loaded Postgres tables and build
    // features + a classifier from them; here the same hop runs against
    // the Derby tables the previous test loaded (S6 as the modelling
    // entry point, not just a sink round-trip).
    import org.apache.spark.sql.functions._
    val full = spark.read.jdbc(url, "players_full", props)
    assert(full.count() === 3)
    val data = full.select(
      (col("TOTAL_POINTS") > 3).cast("double").as("label"),
      col("FIXTURE_HOME").cast("double").as("f_home"),
      col("TOTAL_POINTS").cast("double").as("f_points"))
    val assembled = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(Array("f_home", "f_points")).setOutputCol("features")
      .transform(data)
    val model = new org.apache.spark.ml.classification.LogisticRegression()
      .setMaxIter(10).fit(assembled)
    val preds = model.transform(assembled)
    assert(preds.columns.contains("prediction"))
    assert(preds.count() === 3)
  }
}
