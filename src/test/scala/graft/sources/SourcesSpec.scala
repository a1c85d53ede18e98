package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.SparkSpec

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("json: schema-explicit multiline load + S4 explode fan-out") {
    // mirrors the FPL players dict: parent with two child arrays
    val dir = Files.createTempDirectory("graft-json").toString
    val doc =
      """[{"player_id": 1,
        |  "history": [{"fixture": 10, "points": 2}, {"fixture": 11, "points": 7}],
        |  "fixtures": [{"fixture": 12}]},
        | {"player_id": 2, "history": [], "fixtures": [{"fixture": 12}]}]""".stripMargin
    Files.writeString(java.nio.file.Paths.get(dir, "players.json"), doc)

    val schema = StructType(Seq(
      StructField("player_id", LongType),
      StructField("history", ArrayType(StructType(Seq(
        StructField("fixture", LongType), StructField("points", LongType))))),
      StructField("fixtures", ArrayType(StructType(Seq(
        StructField("fixture", LongType)))))))

    val players = Sources.json(spark, dir, schema)
    assert(players.count() === 2)

    val history = Sources.explodeChild(players, "player_id", "history")
    assert(history.columns.toSeq === Seq("player_id", "fixture", "points"))
    // explode_outer keeps player 2 (empty history) with nulls
    assert(history.count() === 3)
    assert(history.filter($"player_id" === 2 && $"fixture".isNull).count() === 1)
  }

  test("csv: header round-trip with explicit schema") {
    val dir = Files.createTempDirectory("graft-csv").toString + "/out"
    val df = Seq((1, "x", 1.5), (2, "y", 2.5)).toDF("id", "name", "score")
    df.coalesce(1).write.option("header", true).csv(dir)
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val back = Sources.csv(spark, dir, schema).orderBy("id")
    assert(back.as[(Int, String, Double)].collect().toSeq ===
      Seq((1, "x", 1.5), (2, "y", 2.5)))
  }

  test("K3: publishWithRunId round-trips through latestByPrefix") {
    val src = Files.createTempDirectory("graft-pub-src")
    val dest = Files.createTempDirectory("graft-pub-dest").toString
    val f = src.resolve("main.json")
    Files.writeString(f, """{"k":"v"}""")
    val p1 = Sources.publishWithRunId(spark, f.toString, dest, "main", "20240101-000000")
    val p2 = Sources.publishWithRunId(spark, f.toString, dest, "main", "20240301-120000")
    assert(p1.endsWith("main_20240101-000000.json"))
    // read side: latest run id wins, content is byte-exact
    val latest = Sources.latestByPrefix(spark, dest, "main_")
    assert(latest.contains(p2))
    val p2Local = p2.stripPrefix("file:")
    assert(Files.readString(java.nio.file.Paths.get(p2Local)) === """{"k":"v"}""")
  }

  test("latestByPrefix: picks greatest timestamp-suffixed name") {
    val dir = Files.createTempDirectory("graft-latest").toString
    Seq("main_20240101-000000.json", "main_20240301-120000.json",
      "main_20240201-000000.json", "other_20240401-000000.json")
      .foreach(n => Files.writeString(java.nio.file.Paths.get(dir, n), "{}"))
    val latest = Sources.latestByPrefix(spark, dir, "main_")
    assert(latest.exists(_.endsWith("main_20240301-120000.json")))
    assert(Sources.latestByPrefix(spark, dir, "missing_").isEmpty)
    assert(Sources.latestByPrefix(spark, dir + "/nope", "x").isEmpty)
  }

  test("K3: publish/latest cycle resolves the filesystem FROM THE PATH SCHEME") {
    // The production deploy story is "point destDir at s3a://bucket/…" —
    // which only works if the seam resolves the Hadoop FileSystem from the
    // path scheme instead of assuming the local FS. s3a itself needs
    // credentials + egress, so this registers a custom `mock:` scheme
    // (backed by a RawLocalFileSystem subclass, the same registration
    // mechanism `fs.s3a.impl` uses) and runs the full publish → list →
    // read-back cycle over mock: URIs. Passing proves: scheme-based FS
    // lookup, cross-filesystem copy (file: source → mock: dest), and that
    // the returned/latest paths keep the destination scheme.
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.mock.impl", classOf[MockBucketFileSystem].getName)
    try {
      val src = Files.createTempDirectory("graft-mock-src")
      val f = src.resolve("main.json")
      Files.writeString(f, """{"k":"mockfs"}""")
      val destLocal = Files.createTempDirectory("graft-mock-bucket").toString
      val dest = s"mock:$destLocal"
      val p1 = Sources.publishWithRunId(spark, f.toString, dest, "main", "20240101-000000")
      val p2 = Sources.publishWithRunId(spark, f.toString, dest, "main", "20240301-120000")
      assert(p1.startsWith("mock:"), s"published path lost its scheme: $p1")
      val latest = Sources.latestByPrefix(spark, dest, "main_")
      assert(latest.contains(p2))
      // the bytes really landed through the mock FS onto its backing store
      assert(Files.readString(java.nio.file.Paths.get(
        destLocal, "main_20240301-120000.json")) === """{"k":"mockfs"}""")
    } finally conf.unset("fs.mock.impl")
  }
}

/** A `mock:` scheme registered like any object-store connector
  * (`fs.mock.impl`, the `fs.s3a.impl` mechanism) but backed by the local
  * filesystem — lets the specs prove scheme-resolved FileSystem dispatch
  * without egress. */
class MockBucketFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "mock"
  override def getUri: java.net.URI = java.net.URI.create("mock:///")
}
