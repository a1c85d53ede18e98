package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-drift canary. The driver regenerates /root/testdata between
  * rounds and has already changed a physical type once (events.ts:
  * TIMESTAMP(NANOS) → TIMESTAMP_MICROS in round 5, silently zeroing 17
  * queries). This spec pins the LOADED schema of every table — the
  * contract the whole query pack and every DuckDB oracle is written
  * against — and fails naming the drifted column, so a generator change
  * can never again surface as 35 opaque analysis errors.
  */
class TableSchemaSpec extends SparkSpec {

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq(
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq(
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    // events.ts is normalized by Tables to canonical nanos-since-epoch,
    // whatever the parquet carries — LongType here IS the contract.
    "events" -> Seq(
      "event_id" -> LongType, "ts" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType,
      "props" -> StringType),
    "documents" -> Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
      "label" -> IntegerType))

  for (name <- Tables.all) test(s"loaded schema of $name matches the pinned contract") {
    val got = Tables(spark, sf("sf0.001"), name).schema
    val exp = expected(name)
    assert(
      got.fields.map(_.name).toSeq === exp.map(_._1),
      s"testdata drift: table '$name' columns changed — " +
        s"loaded ${got.fields.map(_.name).mkString(",")}")
    got.fields.zip(exp).foreach { case (f, (_, expType)) =>
      assert(
        f.dataType === expType,
        s"testdata drift: $name.${f.name} loaded as ${f.dataType.sql}, " +
          s"contract is ${expType.sql} — fix the Tables loader AND the " +
          "affected oracle twins together (see Tables.normalizeEvents)")
    }
  }

  test("events normalization: NTZ-micros and nanos-long parquet load to identical nanos") {
    import spark.implicits._
    // same three instants written both ways the generator has shipped them
    val micros = Seq(1704067798778549L, 1704068166738090L, 0L)
    val ntzDir = Files.createTempDirectory("graft-canary-ntz").toString
    val longDir = Files.createTempDirectory("graft-canary-long").toString

    micros.toDF("us")
      .select(
        monotonically_increasing_id().as("event_id"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"),
        lit(1L).as("user_id"), lit("click").as("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$ntzDir/events.parquet")
    micros.toDF("us")
      .select(
        monotonically_increasing_id().as("event_id"),
        (col("us") * 1000L).as("ts"),
        lit(1L).as("user_id"), lit("click").as("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$longDir/events.parquet")

    val fromNtz = Tables(spark, ntzDir, "events")
    val fromLong = Tables(spark, longDir, "events")
    assert(fromNtz.schema("ts").dataType === LongType)
    assert(fromLong.schema("ts").dataType === LongType)
    val a = fromNtz.select("ts").as[Long].collect().sorted.toSeq
    val b = fromLong.select("ts").as[Long].collect().sorted.toSeq
    assert(a === b)
    assert(a === micros.map(_ * 1000L).sorted)
  }

  test("events normalization: physical TIMESTAMP(NANOS) parquet loads via the scoped legacy conf") {
    import spark.implicits._
    import org.apache.hadoop.conf.Configuration
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
    import org.apache.parquet.schema.MessageTypeParser

    // Spark cannot WRITE nanos parquet — hand-roll the round-5 generator
    // format with parquet-mr directly (third physical form alongside the
    // NTZ-micros and long canaries above).
    val nanos = Seq(1704067798778549000L, 1704068166738090000L, 0L)
    val dir = Files.createTempDirectory("graft-canary-nanos").toString
    val schema = MessageTypeParser.parseMessageType(
      """message events {
        |  required int64 event_id;
        |  required int64 ts (TIMESTAMP(NANOS,false));
        |  required int64 user_id;
        |  required binary event_type (UTF8);
        |  required double value;
        |  required binary props (UTF8);
        |}""".stripMargin)
    val conf = new Configuration()
    GroupWriteSupport.setSchema(schema, conf)
    val writer = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(s"$dir/events.parquet/part-0.parquet"))
      .withConf(conf).withType(schema).build()
    val factory = new SimpleGroupFactory(schema)
    nanos.zipWithIndex.foreach { case (ns, i) =>
      writer.write(factory.newGroup()
        .append("event_id", i.toLong).append("ts", ns)
        .append("user_id", 1L).append("event_type", "click")
        .append("value", 1.0).append("props", "{}"))
    }
    writer.close()

    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val before = spark.conf.getOption(key)
    val fromNanos = Tables(spark, dir, "events")
    // the legacy conf must NOT leak out of the loader (ADVICE r6: a
    // lingering conf would make later nanos columns in OTHER tables load
    // silently as long instead of erroring)
    assert(spark.conf.getOption(key) === before,
      s"$key leaked out of Tables.normalizeEvents")
    assert(fromNanos.schema("ts").dataType === LongType)
    assert(fromNanos.select("ts").as[Long].collect().sorted.toSeq === nanos.sorted)
  }
}
