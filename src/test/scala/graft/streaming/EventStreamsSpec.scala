package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.streaming.Trigger

import graft.{SparkSpec, Tables}

/** Streaming ≡ batch: the tumbling-window aggregate over a file stream
  * (Trigger.AvailableNow) must equal the batch run of the same transform. */
class EventStreamsSpec extends SparkSpec {

  test("tumblingCounts: streaming AvailableNow equals batch") {
    val batchEvents = Tables(spark, sf("sf0.001"), "events")
    val expected = EventStreams.tumblingCounts(batchEvents)
      .orderBy("window_start_us", "event_type")
      .collect()
    assert(expected.nonEmpty)

    // stage the parquet in a stream-source directory
    val dir = Files.createTempDirectory("graft-stream").toString
    Files.copy(
      Paths.get(sf("sf0.001"), "events.parquet"),
      Paths.get(dir, "events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)

    val streamed = spark.readStream
      .schema(batchEvents.schema)
      .parquet(dir)
    val query = EventStreams
      .tumblingCounts(streamed, watermark = Some("1 hour"))
      .writeStream
      .format("memory")
      .queryName("tumbling_test")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination(120000)

    val got = spark.table("tumbling_test")
      .orderBy("window_start_us", "event_type")
      .collect()
    assert(got.toSeq === expected.toSeq)
  }

  test("dedupWithinWatermark: duplicate keys collapse to one row per key") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val batchEvents = Tables(spark, sf("sf0.001"), "events")
    // inject duplicates: every event twice (the batch exact-dedup scenario)
    val dir = Files.createTempDirectory("graft-dedup-stream").toString
    batchEvents.unionByName(batchEvents)
      .write.mode("overwrite").parquet(dir)

    val streamed = spark.readStream
      .schema(batchEvents.schema)
      .parquet(dir)
    val query = EventStreams.dedupWithinWatermark(streamed, Seq("event_id"))
      .writeStream
      .format("memory")
      .queryName("dedup_test")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination(120000)

    val got = spark.table("dedup_test")
    assert(got.count() === batchEvents.count())
    assert(got.groupBy($"event_id").count().filter($"count" > 1).isEmpty)
  }
}
