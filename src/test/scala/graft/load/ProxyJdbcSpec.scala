package graft.load

import java.sql.{DriverManager, SQLException, Timestamp}
import java.util.Properties

import org.apache.spark.sql.SaveMode
import org.scalatest.BeforeAndAfterAll

import graft.SparkSpec

/** [[ProxyJdbcServer]] / [[ProxyJdbcDriver]] round-trips: plain-JDBC DDL +
  * insert, Spark `df.write.jdbc` / `spark.read.jdbc` through the proxy URL,
  * SQLState propagation across the wire (EtlRun's `execTolerating` and the
  * K4 constraint-rejection contract both key off it), and null re-typing
  * from server-side ParameterMetaData. Cross-PROCESS coverage (executors in
  * other JVMs writing through the socket) is EtlProxyClusterSpec. */
class ProxyJdbcSpec extends SparkSpec with BeforeAndAfterAll {

  private var proxy: ProxyJdbcServer = _
  private val db = s"proxyspec${System.nanoTime()}"

  override def beforeAll(): Unit = {
    super.beforeAll()
    val backend = new Properties()
    backend.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    proxy = new ProxyJdbcServer(s"jdbc:derby:memory:$db;create=true", backend)
    ProxyJdbcDriver.ensureRegistered()
  }

  override def afterAll(): Unit = {
    if (proxy != null) proxy.stop()
    try DriverManager.getConnection(s"jdbc:derby:memory:$db;drop=true")
    catch { case _: SQLException => () }
    super.afterAll()
  }

  private def exec(sql: String): Unit = {
    val c = DriverManager.getConnection(proxy.url, proxy.clientProps)
    try { val st = c.createStatement(); try st.execute(sql) finally st.close() }
    finally c.close()
  }

  test("plain JDBC through the proxy: DDL, typed inserts, query, SQLState over the wire") {
    exec("CREATE TABLE t_plain (id INT NOT NULL, name VARCHAR(64), " +
      "score DOUBLE PRECISION, ok BOOLEAN, ts TIMESTAMP, PRIMARY KEY (id))")
    val c = DriverManager.getConnection(proxy.url, proxy.clientProps)
    try {
      val ps = c.prepareStatement("INSERT INTO t_plain VALUES (?, ?, ?, ?, ?)")
      ps.setInt(1, 1); ps.setString(2, "alpha"); ps.setDouble(3, 1.5)
      ps.setBoolean(4, true)
      ps.setTimestamp(5, Timestamp.valueOf("2024-08-20 10:00:00"))
      ps.addBatch()
      // a null row: the SERVER must retype the nulls from ParameterMetaData
      ps.setInt(1, 2); ps.setNull(2, java.sql.Types.CLOB) // deliberately-wrong hint
      ps.setNull(3, java.sql.Types.DOUBLE); ps.setNull(4, java.sql.Types.BOOLEAN)
      ps.setNull(5, java.sql.Types.TIMESTAMP)
      ps.addBatch()
      assert(ps.executeBatch().toSeq === Seq(1, 1))
      ps.close()

      val st = c.createStatement()
      val rs = st.executeQuery("SELECT id, name, score, ok, ts FROM t_plain ORDER BY id")
      assert(rs.next())
      assert(rs.getInt(1) === 1 && rs.getString("name") === "alpha")
      assert(rs.getDouble(3) === 1.5 && rs.getBoolean(4))
      assert(rs.getTimestamp(5) === Timestamp.valueOf("2024-08-20 10:00:00"))
      assert(rs.next())
      assert(rs.getInt(1) === 2)
      assert(rs.getString(2) === null && rs.wasNull())
      rs.getDouble(3); assert(rs.wasNull())
      assert(!rs.next())
      rs.close(); st.close()
    } finally c.close()

    // duplicate-PK rejection: SQLState must survive serialization — the
    // EtlRun drop/create tolerance and the K4 rejection specs key off it
    val e = intercept[SQLException](
      exec("INSERT INTO t_plain (id) VALUES (1)"))
    assert(e.getSQLState === "23505", e.getMessage)
    // Derby "no such table" state used by execTolerating's drop path
    val e2 = intercept[SQLException](exec("DROP TABLE t_absent"))
    assert(e2.getSQLState === "42Y55", e2.getMessage)
  }

  test("Spark write + read through the proxy URL round-trips rows and nulls") {
    import spark.implicits._
    exec("CREATE TABLE t_spark (player_id BIGINT NOT NULL, name VARCHAR(128), " +
      "pts DOUBLE PRECISION, active BOOLEAN, seen TIMESTAMP, PRIMARY KEY (player_id))")
    val df = Seq(
      (1L, "ada", 9.5, true, Timestamp.valueOf("2024-08-20 10:00:00")),
      (2L, null.asInstanceOf[String], 0.0, false,
        Timestamp.valueOf("2024-08-21 11:30:00")),
      (3L, "grace", 4.25, true, null.asInstanceOf[Timestamp]))
      .toDF("player_id", "name", "pts", "active", "seen")
      .repartition(3) // >1 partition: several concurrent proxy connections
    df.write.mode(SaveMode.Append)
      .jdbc(proxy.url, "t_spark", proxy.clientProps)

    val back = spark.read.jdbc(proxy.url, "t_spark", proxy.clientProps)
    assert(back.count() === 3L)
    val rows = back.sort("PLAYER_ID").collect()
    assert(rows(0).getLong(0) === 1L && rows(0).getString(1) === "ada")
    assert(rows(1).isNullAt(1) && !rows(1).getBoolean(3))
    assert(rows(2).isNullAt(4) && rows(2).getDouble(2) === 4.25)
  }

  test("concurrent client connections share one backend database") {
    exec("CREATE TABLE t_conc (id INT NOT NULL, PRIMARY KEY (id))")
    val threads = (0 until 8).map { k =>
      new Thread(() => {
        val c = DriverManager.getConnection(proxy.url, proxy.clientProps)
        try {
          val ps = c.prepareStatement("INSERT INTO t_conc VALUES (?)")
          (0 until 25).foreach { j => ps.setInt(1, k * 25 + j); ps.addBatch() }
          ps.executeBatch(); ps.close()
        } finally c.close()
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val c = DriverManager.getConnection(proxy.url, proxy.clientProps)
    try {
      val rs = c.createStatement().executeQuery("SELECT COUNT(*) FROM t_conc")
      assert(rs.next() && rs.getLong(1) === 200L)
    } finally c.close()
  }

  test("unimplemented JDBC surface fails loudly, naming the method") {
    val c = DriverManager.getConnection(proxy.url, proxy.clientProps)
    try {
      val e = intercept[java.sql.SQLFeatureNotSupportedException](c.createBlob())
      assert(e.getMessage.contains("Connection.createBlob"))
    } finally c.close()
  }
}
