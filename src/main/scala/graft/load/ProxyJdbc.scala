package graft.load

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException, ObjectInputStream, ObjectOutputStream}
import java.lang.reflect.{InvocationHandler, Method, Proxy => JProxy}
import java.net.{InetAddress, ServerSocket, Socket, SocketException}
import java.sql.{Connection, DatabaseMetaData, Driver, DriverManager, PreparedStatement, ResultSet, ResultSetMetaData, SQLException, SQLFeatureNotSupportedException, Statement, Types}
import java.util.Properties

/** A minimal JDBC-over-TCP proxy: a [[ProxyJdbcServer]] in one JVM wraps a
  * real (typically embedded-Derby) JDBC connection factory behind a loopback
  * socket, and [[ProxyJdbcDriver]] (`jdbc:graftproxy://host:port`) lets ANY
  * other JVM — in particular Spark executors under a multi-process master —
  * run DDL, batched inserts, and reads against it through the standard
  * `java.sql` API.
  *
  * Why this exists: the reference's load stage targets a NETWORKED database
  * (Postgres — etl/load.py:15-36), and graft's K4–K6 sink is exercised
  * against embedded Derby because that is the only database in this
  * environment. Embedded Derby is JVM-local, so under `local-cluster[…]`
  * each executor's `df.write.jdbc` would boot its own empty database and the
  * capstone could never run multi-JVM (the round-13 bench skipped it). The
  * sandbox's Derby jars ship neither `derbynet` (the DRDA server) nor
  * `derbyclient`, so Derby's own network-server mode is unavailable — this
  * proxy restores the missing property: ONE database endpoint, many client
  * JVMs, writes crossing a real socket.
  *
  * Scope: a TEST/BENCH FIXTURE, not a production pool. It binds loopback
  * only, materializes query results fully (fixture-sized tables), uses Java
  * serialization behind a strict `ObjectInputFilter`, and implements exactly
  * the JDBC surface Spark's JDBC source/sink and [[graft.EtlRun]] touch —
  * every unimplemented method throws `SQLFeatureNotSupportedException`
  * naming itself, so a Spark upgrade that needs more surface fails loudly,
  * never silently.
  */
object ProxyJdbc {

  val UrlPrefix = "jdbc:graftproxy://"

  // ---- wire protocol (java-serialized over one socket per Connection) ----
  private[load] sealed trait Req extends Serializable
  private[load] final case class Exec(sql: String) extends Req
  private[load] final case class PrepExec(sql: String, params: Array[AnyRef]) extends Req
  private[load] final case class QueryReq(sql: String, params: Array[AnyRef]) extends Req
  private[load] final case class ExecBatch(sql: String, rows: Seq[Array[AnyRef]]) extends Req
  private[load] final case class SetAutoCommit(v: Boolean) extends Req
  private[load] final case class SetIsolation(level: Int) extends Req
  private[load] case object Commit extends Req
  private[load] case object Rollback extends Req
  private[load] case object MetaReq extends Req
  private[load] case object CloseReq extends Req

  private[load] sealed trait Resp extends Serializable
  private[load] final case class Ok(updateCount: Int = -1, isResultSet: Boolean = false) extends Resp
  private[load] final case class BatchOk(counts: Array[Int]) extends Resp
  private[load] final case class ColMeta(
      name: String, label: String, sqlType: Int, typeName: String,
      precision: Int, scale: Int, nullable: Int, signed: Boolean,
      displaySize: Int, className: String) extends Serializable
  private[load] final case class Table(cols: Seq[ColMeta], rows: Vector[Array[AnyRef]]) extends Resp
  private[load] final case class Meta(
      productName: String, productVersion: String, url: String,
      supportsTx: Boolean, defaultIsolation: Int,
      supportedIsolations: Set[Int]) extends Resp
  private[load] final case class Err(message: String, sqlState: String, vendorCode: Int) extends Resp

  /** Only protocol classes, their field types, and the JDBC value types
    * (String/boxed/Timestamp/Date/BigDecimal/byte[]) may deserialize. */
  private[load] val inputFilter: java.io.ObjectInputFilter =
    java.io.ObjectInputFilter.Config.createFilter(
      "maxdepth=24;maxarray=10000000;graft.load.**;scala.**;java.**;!*")

  // ---- reflective-proxy plumbing shared by client handles ----------------
  private def proxyOf[T](cls: Class[T])(
      pf: PartialFunction[(String, Array[AnyRef]), AnyRef]): T =
    JProxy.newProxyInstance(cls.getClassLoader, Array[Class[_]](cls),
      new InvocationHandler {
        override def invoke(p: AnyRef, m: Method, args: Array[AnyRef]): AnyRef = {
          val a = if (args == null) Array.empty[AnyRef] else args
          val key = (m.getName, a)
          if (pf.isDefinedAt(key)) pf(key)
          else (m.getName, a) match {
            case ("toString", _) => s"GraftProxy(${cls.getSimpleName})"
            case ("hashCode", _) => Integer.valueOf(System.identityHashCode(p))
            case ("equals", Array(o)) => java.lang.Boolean.valueOf(p eq o)
            case ("isWrapperFor", _) => java.lang.Boolean.valueOf(false)
            case ("unwrap", _) => throw new SQLException("graft proxy: not a wrapper")
            case (name, _) => throw new SQLFeatureNotSupportedException(
              s"graft proxy jdbc: ${cls.getSimpleName}.$name")
          }
        }
      }).asInstanceOf[T]

  private def ignore: AnyRef = null
  private def bool(b: Boolean): AnyRef = java.lang.Boolean.valueOf(b)
  private def int(i: Int): AnyRef = Integer.valueOf(i)

  // ---- client-side request channel (one socket == one Connection) --------
  private[load] final class Channel(host: String, port: Int) {
    private val socket = new Socket(host, port)
    socket.setTcpNoDelay(true)
    // ObjectInputStream's constructor blocks on the peer's stream header:
    // both sides construct+flush their ObjectOutputStream FIRST
    private val out = new ObjectOutputStream(
      new BufferedOutputStream(socket.getOutputStream))
    out.flush()
    private val in = new ObjectInputStream(
      new BufferedInputStream(socket.getInputStream))
    in.setObjectInputFilter(inputFilter)

    def call(req: Req): Resp = synchronized {
      out.writeObject(req)
      out.reset() // drop the back-reference table: batches never re-send
      out.flush()
      in.readObject().asInstanceOf[Resp] match {
        case Err(msg, state, code) => throw new SQLException(msg, state, code)
        case r => r
      }
    }

    def shutdown(): Unit = synchronized {
      try call(CloseReq) catch { case _: Exception => () }
      try socket.close() catch { case _: Exception => () }
    }
  }

  // ---- client-side JDBC handles -------------------------------------------
  private[load] def connection(ch: Channel, proxyUrl: String): Connection = {
    @volatile var closed = false
    @volatile var autoCommit = true
    @volatile var isolation = -1 // -1 = server default, fetched lazily
    lazy val meta: Meta = ch.call(MetaReq).asInstanceOf[Meta]
    lazy val conn: Connection = proxyOf(classOf[Connection]) {
      case ("createStatement", _) => statement(ch, conn)
      case ("prepareStatement", args) if args.nonEmpty =>
        prepared(ch, conn, args(0).asInstanceOf[String])
      case ("setAutoCommit", Array(b)) =>
        autoCommit = b.asInstanceOf[java.lang.Boolean]
        ch.call(SetAutoCommit(autoCommit)); ignore
      case ("getAutoCommit", _) => bool(autoCommit)
      case ("commit", _) => ch.call(Commit); ignore
      case ("rollback", Array()) => ch.call(Rollback); ignore
      case ("setTransactionIsolation", Array(l)) =>
        isolation = l.asInstanceOf[Integer].intValue()
        ch.call(SetIsolation(isolation)); ignore
      case ("getTransactionIsolation", _) =>
        int(if (isolation >= 0) isolation else meta.defaultIsolation)
      case ("getMetaData", _) => databaseMeta(meta, conn)
      case ("close", _) =>
        if (!closed) { closed = true; ch.shutdown() }; ignore
      case ("isClosed", _) => bool(closed)
      case ("isValid", _) => bool(!closed)
      case ("getWarnings", _) => ignore
      case ("clearWarnings", _) => ignore
      case ("setReadOnly", _) | ("setCatalog", _) | ("setSchema", _) => ignore
      case ("getCatalog", _) | ("getSchema", _) => ignore
      case ("abort", _) => if (!closed) { closed = true; ch.shutdown() }; ignore
      case ("toString", _) => s"GraftProxyConnection($proxyUrl)"
    }
    conn
  }

  private def statement(ch: Channel, conn: Connection): Statement =
    proxyOf(classOf[Statement]) {
      case ("execute", Array(sql: String)) =>
        bool(ch.call(Exec(sql)).asInstanceOf[Ok].isResultSet)
      case ("executeUpdate", Array(sql: String)) =>
        int(ch.call(Exec(sql)).asInstanceOf[Ok].updateCount)
      case ("executeQuery", Array(sql: String)) =>
        resultSet(ch.call(QueryReq(sql, Array.empty)).asInstanceOf[Table])
      case ("close", _) | ("cancel", _) | ("clearWarnings", _) => ignore
      case ("setQueryTimeout", _) | ("setFetchSize", _) |
           ("setMaxRows", _) | ("setLargeMaxRows", _) => ignore
      case ("getWarnings", _) => ignore
      case ("isClosed", _) => bool(false)
      case ("getConnection", _) => conn
      case ("getUpdateCount", _) => int(-1)
      case ("getMoreResults", _) => bool(false)
    }

  private def prepared(ch: Channel, conn: Connection, sql: String): PreparedStatement = {
    val current = new java.util.TreeMap[Int, AnyRef]()
    var batch = Vector.empty[Array[AnyRef]]
    def snapshot(): Array[AnyRef] = {
      val n = if (current.isEmpty) 0 else current.lastKey()
      val row = new Array[AnyRef](n)
      current.forEach((i, v) => row(i - 1) = v)
      row
    }
    proxyOf(classOf[PreparedStatement]) {
      case (name, Array(i: Integer, v)) if name.startsWith("set") &&
          name != "setQueryTimeout" && name != "setFetchSize" &&
          name != "setMaxRows" =>
        // setNull(i, sqlType) lands here too: the SERVER retypes nulls from
        // the real statement's ParameterMetaData, so the client-side type
        // hint (Spark's dialect nullType) is irrelevant by design
        current.put(i.intValue(), if (name == "setNull") null else v); ignore
      case ("setNull", Array(i: Integer, _, _)) =>
        current.put(i.intValue(), null); ignore
      case ("clearParameters", _) => current.clear(); ignore
      case ("addBatch", Array()) =>
        batch :+= snapshot(); current.clear(); ignore
      case ("executeBatch", _) =>
        val rows = batch; batch = Vector.empty
        if (rows.isEmpty) Array.empty[Int]
        else ch.call(ExecBatch(sql, rows)).asInstanceOf[BatchOk].counts
      case ("clearBatch", _) => batch = Vector.empty; ignore
      case ("execute", Array()) =>
        bool(ch.call(PrepExec(sql, snapshot())).asInstanceOf[Ok].isResultSet)
      case ("executeUpdate", Array()) =>
        int(ch.call(PrepExec(sql, snapshot())).asInstanceOf[Ok].updateCount)
      case ("executeQuery", Array()) =>
        resultSet(ch.call(QueryReq(sql, snapshot())).asInstanceOf[Table])
      case ("close", _) | ("cancel", _) | ("clearWarnings", _) => ignore
      case ("setQueryTimeout", _) | ("setFetchSize", _) | ("setMaxRows", _) => ignore
      case ("getWarnings", _) => ignore
      case ("isClosed", _) => bool(false)
      case ("getConnection", _) => conn
    }
  }

  private def resultSet(t: Table): ResultSet = {
    val byLabel = t.cols.iterator.zipWithIndex
      .map { case (c, i) => c.label.toLowerCase -> (i + 1) }.toMap
    var cursor = -1
    var lastNull = false
    def cell(i: Int): AnyRef = {
      val v = t.rows(cursor)(i - 1)
      lastNull = v == null
      v
    }
    def col(label: String): Int = byLabel.getOrElse(label.toLowerCase,
      throw new SQLException(s"no such column: $label"))
    def num(v: AnyRef): Number = v.asInstanceOf[Number]
    def get(args: Array[AnyRef]): AnyRef = args(0) match {
      case i: Integer => cell(i.intValue())
      case s: String => cell(col(s))
    }
    proxyOf(classOf[ResultSet]) {
      case ("next", _) =>
        cursor += 1; bool(cursor < t.rows.size)
      case ("close", _) => ignore
      case ("wasNull", _) => bool(lastNull)
      case ("getMetaData", _) => resultSetMeta(t.cols)
      case ("findColumn", Array(s: String)) => int(col(s))
      case ("getObject", args) => get(args)
      case ("getString", args) =>
        val v = get(args); if (v == null) null else v.toString
      case ("getBoolean", args) =>
        val v = get(args); bool(v != null && v.asInstanceOf[java.lang.Boolean])
      case ("getInt", args) =>
        val v = get(args); int(if (v == null) 0 else num(v).intValue())
      case ("getLong", args) =>
        val v = get(args)
        java.lang.Long.valueOf(if (v == null) 0L else num(v).longValue())
      case ("getDouble", args) =>
        val v = get(args)
        java.lang.Double.valueOf(if (v == null) 0.0 else num(v).doubleValue())
      case ("getFloat", args) =>
        val v = get(args)
        java.lang.Float.valueOf(if (v == null) 0.0f else num(v).floatValue())
      case ("getShort", args) =>
        val v = get(args)
        java.lang.Short.valueOf(if (v == null) 0.toShort else num(v).shortValue())
      case ("getByte", args) =>
        val v = get(args)
        java.lang.Byte.valueOf(if (v == null) 0.toByte else num(v).byteValue())
      case ("getTimestamp", args) if args.length <= 2 => get(args)
      case ("getDate", args) if args.length <= 2 => get(args)
      case ("getBigDecimal", args) => get(args)
      case ("getBytes", args) => get(args)
      case ("isClosed", _) => bool(false)
      case ("getFetchSize", _) => int(t.rows.size)
      case ("setFetchSize", _) => ignore
      case ("getType", _) => int(ResultSet.TYPE_FORWARD_ONLY)
    }
  }

  private def resultSetMeta(cols: Seq[ColMeta]): ResultSetMetaData = {
    def c(args: Array[AnyRef]): ColMeta = cols(args(0).asInstanceOf[Integer] - 1)
    proxyOf(classOf[ResultSetMetaData]) {
      case ("getColumnCount", _) => int(cols.size)
      case ("getColumnName", a) => c(a).name
      case ("getColumnLabel", a) => c(a).label
      case ("getColumnType", a) => int(c(a).sqlType)
      case ("getColumnTypeName", a) => c(a).typeName
      case ("getPrecision", a) => int(c(a).precision)
      case ("getScale", a) => int(c(a).scale)
      case ("isNullable", a) => int(c(a).nullable)
      case ("isSigned", a) => bool(c(a).signed)
      case ("getColumnDisplaySize", a) => int(c(a).displaySize)
      case ("getColumnClassName", a) => c(a).className
      case ("getCatalogName", _) | ("getSchemaName", _) | ("getTableName", _) => ""
      case ("isCaseSensitive", a) => bool(c(a).sqlType == Types.VARCHAR)
      case ("isAutoIncrement", _) | ("isCurrency", _) => bool(false)
      case ("isSearchable", _) => bool(true)
      case ("isReadOnly", _) => bool(false)
      case ("isWritable", _) => bool(true)
      case ("isDefinitelyWritable", _) => bool(false)
    }
  }

  private def databaseMeta(m: Meta, conn: Connection): DatabaseMetaData =
    proxyOf(classOf[DatabaseMetaData]) {
      case ("supportsTransactions", _) => bool(m.supportsTx)
      case ("getDefaultTransactionIsolation", _) => int(m.defaultIsolation)
      case ("supportsTransactionIsolationLevel", Array(l: Integer)) =>
        bool(m.supportedIsolations.contains(l.intValue()))
      case ("supportsDataManipulationTransactionsOnly", _) => bool(false)
      case ("supportsDataDefinitionAndDataManipulationTransactions", _) =>
        bool(m.supportsTx)
      case ("getDatabaseProductName", _) => m.productName
      case ("getDatabaseProductVersion", _) => m.productVersion
      case ("getDriverName", _) => "graft-proxy-jdbc"
      case ("getDriverVersion", _) => "1.0"
      // int-returning probes Spark 4.1's JDBCDatabaseMetadata collects;
      // they don't declare SQLException, so an unsupported-throw here
      // would surface as UndeclaredThrowableException noise
      case ("getDriverMajorVersion", _) => int(1)
      case ("getDriverMinorVersion", _) => int(0)
      case ("getDatabaseMajorVersion", _) => int(10)
      case ("getDatabaseMinorVersion", _) => int(16)
      case ("getURL", _) => m.url
      case ("getUserName", _) => ""
      case ("getConnection", _) => conn
      case ("getJDBCMajorVersion", _) => int(4)
      case ("getJDBCMinorVersion", _) => int(2)
      case ("getIdentifierQuoteString", _) => "\""
      case ("storesUpperCaseIdentifiers", _) => bool(true)
      case ("storesLowerCaseIdentifiers", _) | ("storesMixedCaseIdentifiers", _) =>
        bool(false)
      case ("supportsMixedCaseIdentifiers", _) => bool(false)
      case ("supportsBatchUpdates", _) => bool(true)
      case ("isReadOnly", _) => bool(false)
    }
}

/** `java.sql.Driver` for `jdbc:graftproxy://host:port`. A public no-arg
  * constructor is all Spark's `DriverRegistry` needs on executors (ship the
  * class via the executor classpath and set `driver` in the connection
  * properties); driver-side `DriverManager` callers go through
  * [[ProxyJdbcDriver.ensureRegistered]] first. */
final class ProxyJdbcDriver extends Driver {
  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith(ProxyJdbc.UrlPrefix)

  override def connect(url: String, info: Properties): Connection = {
    if (!acceptsURL(url)) return null // JDBC contract: not ours → null
    val hostPort = url.stripPrefix(ProxyJdbc.UrlPrefix).takeWhile(_ != '/')
    val (host, port) = hostPort.split(':') match {
      case Array(h, p) => (h, p.toInt)
      case _ => throw new SQLException(s"bad graftproxy url (need host:port): $url")
    }
    ProxyJdbc.connection(new ProxyJdbc.Channel(host, port), url)
  }

  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def jdbcCompliant(): Boolean = false
  override def getPropertyInfo(url: String, info: Properties): Array[java.sql.DriverPropertyInfo] =
    Array.empty
  override def getParentLogger: java.util.logging.Logger =
    throw new SQLFeatureNotSupportedException("graft proxy jdbc: getParentLogger")
}

object ProxyJdbcDriver {
  val ClassName = "graft.load.ProxyJdbcDriver"
  private lazy val registered: Unit =
    DriverManager.registerDriver(new ProxyJdbcDriver)
  /** Idempotent `DriverManager` registration for same-JVM callers. */
  def ensureRegistered(): Unit = registered
}

/** The serving end: accepts loopback connections, opens ONE backend JDBC
  * connection per client socket (embedded Derby is happily multi-connection
  * within its owning JVM), and executes the proxied requests on it. Nulls in
  * batch inserts are re-typed from the real statement's `ParameterMetaData`,
  * so client-side dialect null-type guesses never reach the database. */
final class ProxyJdbcServer(backendUrl: String, backendProps: Properties) {
  import ProxyJdbc._

  private val serverSocket =
    new ServerSocket(0, 64, InetAddress.getLoopbackAddress)
  @volatile private var running = true

  def port: Int = serverSocket.getLocalPort
  def url: String = s"${ProxyJdbc.UrlPrefix}127.0.0.1:$port"

  /** Connection properties a Spark JDBC reader/writer needs for this
    * endpoint (the executor-side `DriverRegistry` keys off `driver`). */
  def clientProps: Properties = {
    val p = new Properties()
    p.setProperty("driver", ProxyJdbcDriver.ClassName)
    p
  }

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val s = serverSocket.accept()
        val t = new Thread(() => serve(s), s"graft-proxy-jdbc-${s.getPort}")
        t.setDaemon(true)
        t.start()
      } catch {
        case _: SocketException => () // closed during stop()
        case scala.util.control.NonFatal(e) =>
          if (running) System.err.println(s"[proxy-jdbc] accept: ${e.getMessage}")
      }
    }
  }, "graft-proxy-jdbc-acceptor")
  acceptor.setDaemon(true)
  acceptor.start()

  def stop(): Unit = {
    running = false
    try serverSocket.close() catch { case _: Exception => () }
  }

  private def serve(socket: Socket): Unit = {
    socket.setTcpNoDelay(true)
    val out = new ObjectOutputStream(new BufferedOutputStream(socket.getOutputStream))
    out.flush()
    val in = new ObjectInputStream(new BufferedInputStream(socket.getInputStream))
    in.setObjectInputFilter(inputFilter)
    val conn = DriverManager.getConnection(backendUrl, backendProps)
    try {
      var open = true
      while (open) {
        val req =
          try in.readObject().asInstanceOf[Req]
          catch { case _: EOFException | _: SocketException => open = false; CloseReq }
        if (req == CloseReq) open = false
        else {
          val resp =
            try handle(conn, req)
            catch {
              case e: SQLException => Err(e.getMessage, e.getSQLState, e.getErrorCode)
              case scala.util.control.NonFatal(e) =>
                Err(s"${e.getClass.getName}: ${e.getMessage}", null, 0)
            }
          out.writeObject(resp)
          out.reset()
          out.flush()
        }
      }
    } finally {
      try conn.close() catch { case _: Exception => () }
      try socket.close() catch { case _: Exception => () }
    }
  }

  private def handle(conn: Connection, req: Req): Resp = req match {
    case Exec(sql) =>
      val st = conn.createStatement()
      try { val isRs = st.execute(sql); Ok(st.getUpdateCount, isRs) }
      finally st.close()
    case PrepExec(sql, params) =>
      val ps = conn.prepareStatement(sql)
      try { setAll(ps, params); val isRs = ps.execute(); Ok(ps.getUpdateCount, isRs) }
      finally ps.close()
    case QueryReq(sql, params) =>
      val ps = conn.prepareStatement(sql)
      try { setAll(ps, params); drain(ps.executeQuery()) }
      finally ps.close()
    case ExecBatch(sql, rows) =>
      val ps = conn.prepareStatement(sql)
      try {
        rows.foreach { r => setAll(ps, r); ps.addBatch() }
        BatchOk(ps.executeBatch())
      } finally ps.close()
    case SetAutoCommit(v) => conn.setAutoCommit(v); Ok()
    case SetIsolation(l) => conn.setTransactionIsolation(l); Ok()
    case Commit => conn.commit(); Ok()
    case Rollback => conn.rollback(); Ok()
    case MetaReq =>
      val m = conn.getMetaData
      val levels = Seq(Connection.TRANSACTION_READ_UNCOMMITTED,
        Connection.TRANSACTION_READ_COMMITTED,
        Connection.TRANSACTION_REPEATABLE_READ,
        Connection.TRANSACTION_SERIALIZABLE)
      Meta(m.getDatabaseProductName, m.getDatabaseProductVersion, url,
        m.supportsTransactions(), m.getDefaultTransactionIsolation,
        levels.filter(m.supportsTransactionIsolationLevel).toSet)
    case CloseReq => Ok() // handled by the loop; never reaches here
  }

  /** Typed dispatch beats setObject: Derby rejects setObject(null) and is
    * picky about untyped temporal/decimal objects. */
  private def setAll(ps: PreparedStatement, params: Array[AnyRef]): Unit = {
    lazy val pmd = ps.getParameterMetaData
    params.iterator.zipWithIndex.foreach { case (v, i0) =>
      val i = i0 + 1
      v match {
        case null =>
          val t = try pmd.getParameterType(i) catch { case _: SQLException => Types.VARCHAR }
          ps.setNull(i, t)
        case s: String => ps.setString(i, s)
        case n: java.lang.Integer => ps.setInt(i, n)
        case n: java.lang.Long => ps.setLong(i, n)
        case n: java.lang.Double => ps.setDouble(i, n)
        case n: java.lang.Float => ps.setFloat(i, n)
        case n: java.lang.Short => ps.setShort(i, n)
        case n: java.lang.Byte => ps.setByte(i, n)
        case b: java.lang.Boolean => ps.setBoolean(i, b)
        case t: java.sql.Timestamp => ps.setTimestamp(i, t)
        case d: java.sql.Date => ps.setDate(i, d)
        case d: java.math.BigDecimal => ps.setBigDecimal(i, d)
        case b: Array[Byte] => ps.setBytes(i, b)
        case other => ps.setObject(i, other)
      }
    }
  }

  /** Materialize a ResultSet (fixture-scale by contract) into serializable
    * cells: LOB handles are JVM-bound, so BLOB→bytes and CLOB→string here. */
  private def drain(rs: ResultSet): Table = {
    try {
      val md = rs.getMetaData
      val n = md.getColumnCount
      val cols = (1 to n).map { i =>
        ColMeta(md.getColumnName(i), md.getColumnLabel(i), md.getColumnType(i),
          md.getColumnTypeName(i), md.getPrecision(i), md.getScale(i),
          md.isNullable(i), md.isSigned(i), md.getColumnDisplaySize(i),
          md.getColumnClassName(i))
      }
      val rows = Vector.newBuilder[Array[AnyRef]]
      while (rs.next()) {
        val row = new Array[AnyRef](n)
        var i = 1
        while (i <= n) {
          row(i - 1) = rs.getObject(i) match {
            case b: java.sql.Blob => b.getBytes(1, b.length().toInt)
            case c: java.sql.Clob => c.getSubString(1, c.length().toInt)
            case x => x
          }
          i += 1
        }
        rows += row
      }
      Table(cols, rows.result())
    } finally rs.close()
  }
}
