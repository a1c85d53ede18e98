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

  test("K3: latest-resolution under DELAYED-VISIBILITY listing (list-after-write lag)") {
    // Object stores are list-after-write eventually consistent: a PUT can
    // be readable by key while still absent from LIST results. The run-id
    // naming scheme is designed for exactly this: every upload is a NEW
    // immutable key (never an overwrite), so a lagging listing simply
    // resolves the latest FULLY-VISIBLE run — a consistent, complete
    // artifact — and converges to the newest run when the listing catches
    // up. This registers an `ecmock:` scheme whose listStatus HIDES
    // chosen keys (the lag) while open() still serves them, and proves
    // both halves of that contract.
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.ecmock.impl", classOf[EventuallyConsistentMockFileSystem].getName)
    try {
      val src = Files.createTempDirectory("graft-ec-src")
      val f = src.resolve("main.json")
      Files.writeString(f, """{"k":"ec"}""")
      val destLocal = Files.createTempDirectory("graft-ec-bucket").toString
      val dest = s"ecmock:$destLocal"
      val p1 = Sources.publishWithRunId(spark, f.toString, dest, "main", "20240101-000000")
      // the second upload lands (bytes readable) but LIST does not show it yet
      EventuallyConsistentMockFileSystem.hidden.add("main_20240301-120000.json")
      val p2 = Sources.publishWithRunId(spark, f.toString, dest, "main", "20240301-120000")
      assert(Files.readString(java.nio.file.Paths.get(
        destLocal, "main_20240301-120000.json")) === """{"k":"ec"}""",
        "upload must be durable even while unlisted")
      // lagging listing: latest resolves to the newest VISIBLE run — a
      // complete artifact, never an error or a partial state
      assert(Sources.latestByPrefix(spark, dest, "main_") === Some(p1))
      // listing catches up: the newer run now wins
      EventuallyConsistentMockFileSystem.hidden.remove("main_20240301-120000.json")
      assert(Sources.latestByPrefix(spark, dest, "main_") === Some(p2))
    } finally {
      EventuallyConsistentMockFileSystem.hidden.clear()
      conf.unset("fs.ecmock.impl")
    }
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

/** `ecmock:` — the mock bucket with S3-style list-after-write lag:
  * names in [[EventuallyConsistentMockFileSystem.hidden]] exist (open /
  * getFileStatus work) but are absent from listStatus, exactly the
  * window where an object is PUT-complete yet not LIST-visible. */
class EventuallyConsistentMockFileSystem extends MockBucketFileSystem {
  override def getScheme: String = "ecmock"
  override def getUri: java.net.URI = java.net.URI.create("ecmock:///")
  override def listStatus(p: org.apache.hadoop.fs.Path): Array[org.apache.hadoop.fs.FileStatus] =
    super.listStatus(p).filterNot(st =>
      EventuallyConsistentMockFileSystem.hidden.contains(st.getPath.getName))
}

object EventuallyConsistentMockFileSystem {
  val hidden: java.util.concurrent.ConcurrentHashMap.KeySetView[String, java.lang.Boolean] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
}
