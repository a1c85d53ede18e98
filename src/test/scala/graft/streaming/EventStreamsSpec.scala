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

  test("sessionCounts (session_window) equals the lag/cumsum sessionization") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val gapUs = 1800000000L
    val ev = graft.Tables(spark, sf("sf0.001"), "events")
      .select(col("event_id"), col("user_id"), graft.Tables.tsMicros.as("tkey"))
    // lag/cumsum form with the `>=` break matching session_window's
    // strict-overlap merge rule
    val wo = Window.partitionBy(col("user_id")).orderBy(col("tkey"), col("event_id"))
    val wrun = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = ev
      .withColumn("new_sess",
        when(lag(col("tkey"), 1).over(wo).isNull ||
          col("tkey") - lag(col("tkey"), 1).over(wo) >= gapUs, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_sess")).over(wrun))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("tkey")).as("session_start_us"), count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_start_us"), col("n_events"))
      .orderBy(col("user_id"), col("session_start_us"))
      .as[(Long, Long, Long)].collect()
    val got = EventStreams.sessionCounts(graft.Tables(spark, sf("sf0.001"), "events"))
      .orderBy(col("user_id"), col("session_start_us"))
      .as[(Long, Long, Long)].collect()
    assert(expected.nonEmpty)
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
