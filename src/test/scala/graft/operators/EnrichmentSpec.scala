package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.sources.Sources

/** End-to-end enrichment integration (SURVEY.md §3 / etl/additional_fifa
  * .py): external CSV roster → fuzzy match against internal player names
  * with a position-compatibility prune → lookup table. Ties together
  * Sources.csv, the blocked fuzzy pipeline, and the incremental path.
  */
class EnrichmentSpec extends SparkSpec {
  import spark.implicits._

  private lazy val csvDir = {
    val d = Files.createTempDirectory("graft-fifa").toString
    Files.writeString(java.nio.file.Paths.get(d, "roster.csv"),
      """ext_id,long_name,short_name,positions
        |900,harold maguire,h maguire,DEF
        |901,mohamed salah,m salah,FWD
        |902,kevin de bruyne,k de bruyne,MID
        |903,unrelated person,u person,GK
        |""".stripMargin)
    d
  }

  private def internal = Seq(
    (10L, "harry maguire", "h maguire", "DEF"),
    (11L, "mo salah", "m salah", "FWD"),
    (12L, "kevin de bruyne", "k bruyne", "MID")
  ).toDF("player_id", "long_name_i", "short_name_i", "pos")

  private def roster = Sources.csv(spark, csvDir, StructType(Seq(
    StructField("ext_id", LongType), StructField("long_name", StringType),
    StructField("short_name", StringType), StructField("positions", StringType))))

  test("CSV roster → pruned fuzzy match → lookup table") {
    val matches = FuzzyMatchPipeline.bestMatches(
      internal, roster,
      leftId = "player_id", rightId = "ext_id",
      leftLong = "long_name_i", rightLong = "long_name",
      leftShort = "short_name_i", rightShort = "short_name",
      threshold = 60.0,
      prune = Some(col("pos") === col("positions"))) // F5 compatibility
      .orderBy("player_id").collect()
    val byId = matches.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId === Map(10L -> 900L, 11L -> 901L, 12L -> 902L))
    // the GK row never matched anyone (pruned or below threshold)
    assert(!matches.exists(_.getLong(1) == 903L))
  }

  test("incremental rerun only scores new players") {
    val already = Seq(10L, 11L).toDF("player_id")
    val out = FuzzyMatchPipeline.bestMatches(
      internal, roster,
      "player_id", "ext_id", "long_name_i", "long_name",
      "short_name_i", "short_name",
      threshold = 60.0, already = Some(already),
      prune = Some(col("pos") === col("positions")))
    assert(out.select("player_id").as[Long].collect().toSeq === Seq(12L))
  }

  test("JSON sink round-trip (K1): write + schema-explicit read back") {
    val d = Files.createTempDirectory("graft-json-sink").toString + "/out"
    internal.write.json(d)
    val schema = internal.schema
    val back = spark.read.schema(schema).json(d)
    assert(back.count() === 3)
    assert(back.orderBy("player_id").select("long_name_i").as[String]
      .collect().head === "harry maguire")
  }
}
