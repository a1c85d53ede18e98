package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.{SparkSpec, Tables}
import graft.expressions.GraftExtensions

/** The SpaceSaving heavy-hitters aggregate must work as STREAMING state:
  * in complete mode Spark serializes the sketch buffer into the state
  * store between micro-batches and merges per-batch partials into it —
  * exactly the mergeability the TypedImperativeAggregate claims. Two
  * single-file micro-batches (maxFilesPerTrigger=1) force a cross-batch
  * merge; the exact-regime result must equal the batch run. */
class StreamingHeavyHittersSpec extends SparkSpec {

  test("streaming heavy hitters across micro-batches equals batch (exact regime)") {
    GraftExtensions.register(spark)
    val docs = Tables(spark, sf("sf0.001"), "documents")
    val distinctCount = docs
      .select(explode(split(col("text"), " ")).as("token"))
      .select("token").distinct().count().toInt
    val cap = distinctCount + 10

    def topTokens(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(split(col("text"), " ")).as("token"))
      .agg(expr(s"graft_heavy_hitters(token, $cap)").as("hh"))

    val expected = topTokens(docs)
      .select(explode(col("hh")).as("e"))
      .select(col("e.value"), col("e.cnt"))
      .limit(20).collect().toSeq

    // stage the corpus as TWO stream files → two micro-batches
    val stage = Files.createTempDirectory("graft-hh-stage")
    val dir = Files.createTempDirectory("graft-hh-stream").toString
    Seq(0, 1).foreach { p =>
      val part = docs.filter(col("doc_id") % 2 === p).coalesce(1)
      val out = stage.resolve(s"half$p").toString
      part.write.mode("overwrite").parquet(out)
      val f = Files.list(Paths.get(out)).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      Files.copy(f, Paths.get(dir, s"half$p.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }

    val streamed = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val query = topTokens(streamed)
      .writeStream
      .format("memory")
      .queryName("hh_stream")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination(120000)
    assert(query.lastProgress.batchId >= 1,
      "expected at least two micro-batches (maxFilesPerTrigger=1, 2 files)")

    val got = spark.table("hh_stream")
      .select(explode(col("hh")).as("e"))
      .select(col("e.value"), col("e.cnt"))
      .limit(20).collect().toSeq
    assert(got === expected)
  }
}
