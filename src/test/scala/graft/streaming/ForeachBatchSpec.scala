package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.streaming.Trigger

import graft.{SparkSpec, Tables}

/** SURVEY.md §2.14 stretch made real: the same batch DataFrame code reruns
  * incrementally via foreachBatch over a landing-directory file stream —
  * the Spark-native version of the reference's cron-triggered re-runs. */
class ForeachBatchSpec extends SparkSpec {

  test("foreachBatch reruns a batch transform per arriving file") {
    val events = Tables(spark, sf("sf0.001"), "events")
    val landing = Files.createTempDirectory("graft-landing").toString
    val outDir = Files.createTempDirectory("graft-fb-out").toString
    // stage the NORMALIZED events (canonical nanos-long ts), not the raw
    // file, so the declared stream schema always matches the staged data
    events.write.mode("overwrite").parquet(landing)

    val q = spark.readStream
      .schema(events.schema)
      .parquet(landing)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        // identical code path to the oracle-checked batch aggregate
        EventStreams.tumblingCounts(batch)
          .write.mode("overwrite").parquet(s"$outDir/agg")
      }
      .start()
    q.awaitTermination(120000)

    val streamed = spark.read.parquet(s"$outDir/agg")
      .orderBy("window_start_us", "event_type").collect()
    val batch = EventStreams.tumblingCounts(events)
      .orderBy("window_start_us", "event_type").collect()
    assert(streamed.toSeq === batch.toSeq)
  }

  test("IdempotentSink.replaceBatch: a replayed batch does not duplicate output") {
    import org.apache.spark.sql.functions._
    val events = Tables(spark, sf("sf0.001"), "events")
    val landing = Files.createTempDirectory("graft-idem-landing").toString
    val sink = Files.createTempDirectory("graft-idem-sink").toString + "/out"
    events.write.mode("overwrite").parquet(landing)

    var lastBatch: org.apache.spark.sql.DataFrame = null
    var lastId = -1L
    val q = spark.readStream
      .schema(events.schema)
      .parquet(landing)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        IdempotentSink.replaceBatch(
          batch.select(col("event_id"), col("event_type")), id, sink)
        lastBatch = batch.select(col("event_id"), col("event_type"))
        lastId = id
      }
      .start()
    q.awaitTermination(120000)

    val afterRun = spark.read.parquet(sink).count()
    assert(afterRun === events.count())
    // simulate the at-least-once replay: failure between sink write and
    // checkpoint commit re-delivers the SAME batch on restart
    IdempotentSink.replaceBatch(lastBatch, lastId, sink)
    val afterReplay = spark.read.parquet(sink)
    assert(afterReplay.count() === afterRun, "replay duplicated rows")
    assert(afterReplay.select("event_id").distinct().count() === afterRun)
  }
}
