package graft.load

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.types._

/** JDBC sink layer (SURVEY.md §2.2 K4–K6): constraint-bearing DDL
  * emission + FK-ordered batch overwrite/append.
  *
  * Spark's JDBC writer cannot create PRIMARY KEY / FOREIGN KEY / CHECK
  * constraints, so like the reference (etl/load.py:112-472) the DDL is
  * emitted explicitly and tables are loaded in dependency order; the
  * writer then appends into the pre-created tables. `columnsOf` mirrors
  * the ref's SELECT … LIMIT 0 column-probe projection (etl/load.py:22-24).
  *
  * No live database exists in this environment: DDL generation and load
  * ordering are unit-tested; `write` is a thin `df.write.jdbc` call.
  */
object JdbcSink {

  case class TableSpec(
      name: String,
      schema: StructType,
      primaryKey: Seq[String],
      foreignKeys: Seq[(String, String, String)] = Nil, // (col, refTable, refCol)
      checks: Seq[String] = Nil)

  /** Target-database dialects for the emitted DDL. Postgres is the
    * reference's target (etl/load.py); Derby is the embedded database the
    * round-trip spec executes against (no bare VARCHAR, BOOLEAN not BOOL,
    * BLOB not BYTEA). */
  sealed trait Dialect
  case object Postgres extends Dialect
  case object Derby extends Dialect

  def sqlType(dt: DataType, dialect: Dialect = Postgres): String = (dt, dialect) match {
    case (StringType, Postgres) => "VARCHAR"
    case (StringType, Derby) => "VARCHAR(512)"
    case (IntegerType, _) => "INT"
    case (LongType, _) => "BIGINT"
    case (DoubleType, _) => "DOUBLE PRECISION"
    case (FloatType, _) => "REAL"
    case (BooleanType, Postgres) => "BOOL"
    case (BooleanType, Derby) => "BOOLEAN"
    case (TimestampType, _) => "TIMESTAMP"
    case (DateType, _) => "DATE"
    case (d: DecimalType, _) => s"DECIMAL(${d.precision},${d.scale})"
    case (BinaryType, Postgres) => "BYTEA"
    case (BinaryType, Derby) => "BLOB"
    case (other, _) => other.sql
  }

  /** CREATE TABLE with PK/FK/CHECK, the constraint surface Spark's writer
    * drops (ref DDL shape: etl/load.py:112-472). */
  def createTableDdl(spec: TableSpec, dialect: Dialect = Postgres): String = {
    val cols = spec.schema.fields.map { f =>
      // Derby insists PK columns are declared NOT NULL (42831); Postgres
      // implies it, so the emitted Postgres DDL is left as the ref's shape
      val forceNotNull = dialect == Derby && spec.primaryKey.contains(f.name)
      val nullable = if (f.nullable && !forceNotNull) "" else " NOT NULL"
      s"  ${f.name} ${sqlType(f.dataType, dialect)}$nullable"
    }
    val pk =
      if (spec.primaryKey.isEmpty) Nil
      else Seq(s"  PRIMARY KEY (${spec.primaryKey.mkString(", ")})")
    val fks = spec.foreignKeys.map { case (c, rt, rc) =>
      s"  FOREIGN KEY ($c) REFERENCES $rt ($rc)"
    }
    val checks = spec.checks.map(c => s"  CHECK ($c)")
    (Seq(s"CREATE TABLE ${spec.name} (") :+
      (cols ++ pk ++ fks ++ checks).mkString(",\n") :+ ")").mkString("\n")
  }

  def dropDdl(spec: TableSpec): String = dropDdl(spec, Postgres)

  /** Dialect-aware drop: Derby has neither IF EXISTS nor CASCADE, so the
    * caller drops children-first (reverse [[loadOrder]]) and treats
    * SQLState 42Y55 (no such table) as the IF EXISTS no-op — see
    * [[graft.EtlRun]]. */
  def dropDdl(spec: TableSpec, dialect: Dialect): String = dialect match {
    case Postgres => s"DROP TABLE IF EXISTS ${spec.name} CASCADE"
    case Derby => s"DROP TABLE ${spec.name}"
  }

  /** FK-safe load order: parents before children (topological sort; ref
    * encodes this as comment-ordered code, etl/load.py:111-462). */
  def loadOrder(specs: Seq[TableSpec]): Seq[TableSpec] = {
    val byName = specs.map(s => s.name -> s).toMap
    val visited = scala.collection.mutable.LinkedHashSet[String]()
    def visit(n: String, stack: Set[String]): Unit = {
      if (visited.contains(n) || !byName.contains(n)) return
      require(!stack.contains(n), s"FK cycle at $n")
      byName(n).foreignKeys.foreach { case (_, rt, _) => visit(rt, stack + n) }
      visited += n
    }
    specs.foreach(s => visit(s.name, Set.empty))
    visited.toSeq.map(byName)
  }

  /** Spark's built-in Derby dialect writes StringType as CLOB —
    * setNull(CLOB) against the VARCHAR columns our DDL declares (PKs
    * cannot be CLOB in Derby) fails on null strings. This dialect pins
    * VARCHAR for strings and defers everything else to the common JDBC
    * mappings (BIGINT/DOUBLE/TIMESTAMP/BOOLEAN are all Derby-valid). */
  private object DerbyVarcharDialect extends org.apache.spark.sql.jdbc.JdbcDialect {
    override def canHandle(url: String): Boolean = url.startsWith("jdbc:derby")
    override def getJDBCType(dt: DataType): Option[org.apache.spark.sql.jdbc.JdbcType] =
      dt match {
        case StringType =>
          Some(org.apache.spark.sql.jdbc.JdbcType("VARCHAR(512)", java.sql.Types.VARCHAR))
        case BooleanType =>
          Some(org.apache.spark.sql.jdbc.JdbcType("BOOLEAN", java.sql.Types.BOOLEAN))
        case _ => None
      }
  }

  private lazy val derbyDialectRegistered: Unit =
    org.apache.spark.sql.jdbc.JdbcDialects.registerDialect(DerbyVarcharDialect)

  /** Install the VARCHAR-mapping Derby dialect (idempotent). Call before
    * writing/reading a `jdbc:derby:` URL through Spark. */
  def registerDerbyDialect(): Unit = derbyDialectRegistered

  /** K4/K5 — column-contract projection + append into a pre-created table.
    * Partitioned writes parallelize across executors via numPartitions. */
  def write(df: DataFrame, url: String, table: String,
      columns: Seq[String], props: java.util.Properties,
      mode: SaveMode = SaveMode.Append): Unit =
    df.selectExpr(columns: _*).write.mode(mode).jdbc(url, table, props)

  /** K5 — append-only status history (ref: players_statuses,
    * etl/run_load.py:205-214): snapshot of the current summary stamped
    * with the load time and the "now" gameweek computed from the loaded
    * data itself (max finished + 1, ref A2). */
  def statusSnapshot(playersSummary: DataFrame, gameweeks: DataFrame,
      loadDatetime: java.sql.Timestamp): DataFrame = {
    import org.apache.spark.sql.functions._
    val gwNow = gameweeks
      .agg((max(when(col("gameweek_finished"), col("gameweek_id").cast("int"))) + 1)
        .cast("string").as("gameweek_now"))
    playersSummary
      .select(col("player_id"), col("status"), col("news"))
      .crossJoin(gwNow) // one-row broadcast
      .withColumn("load_datetime", lit(loadDatetime))
  }

  /** K6 — one-row audit record (ref: etl/load.py:86-108 `record` table:
    * load_datetime, gameweek_now, username). Appended through the same
    * sink path as data tables. */
  def auditRow(spark: org.apache.spark.sql.SparkSession,
      gameweekNow: String, username: String,
      loadDatetime: java.sql.Timestamp): DataFrame = {
    import spark.implicits._
    Seq((loadDatetime, gameweekNow, username))
      .toDF("load_datetime", "gameweek_now", "username")
  }
}
