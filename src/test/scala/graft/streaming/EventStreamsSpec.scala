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

    // stage the normalized events (canonical nanos-long ts) in a
    // stream-source directory — staging the raw file would reintroduce
    // whatever physical ts type the generator used
    val dir = Files.createTempDirectory("graft-stream").toString
    batchEvents.write.mode("overwrite").parquet(dir)

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

  test("attributionJoin: stream-stream inner join equals the batch twin") {
    import org.apache.spark.sql.functions._
    val batchEvents = Tables(spark, sf("sf0.001"), "events")
    val expected = EventStreams.attributionJoin(
        batchEvents.filter(col("event_type") === "click"),
        batchEvents.filter(col("event_type") === "purchase"))
      .orderBy("user_id", "click_id", "purchase_id")
      .collect()
    assert(expected.nonEmpty)

    val dir = Files.createTempDirectory("graft-ssj").toString
    batchEvents.write.mode("overwrite").parquet(dir)
    // two independent stream readers over the same source, filtered to
    // the two event roles — the join is genuinely stream-stream
    def streamOf(tpe: String) = spark.readStream
      .schema(batchEvents.schema).parquet(dir)
      .filter(col("event_type") === tpe)
    val query = EventStreams.attributionJoin(streamOf("click"), streamOf("purchase"))
      .writeStream
      .format("memory")
      .queryName("attribution_test")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination(120000)

    val got = spark.table("attribution_test")
      .orderBy("user_id", "click_id", "purchase_id")
      .collect()
    assert(got.toSeq === expected.toSeq)
  }

  test("enrichedTumblingCounts: stream-static dim join equals batch") {
    import org.apache.spark.sql.functions._
    val batchEvents = Tables(spark, sf("sf0.001"), "events")
      .withColumn("dim_key", col("user_id") % 25)
    val dim = Tables(spark, sf("sf0.001"), "nation")
      .select(col("n_nationkey").as("dim_key"), col("n_name").as("dim_label"))
    val expected = EventStreams.enrichedTumblingCounts(batchEvents, dim)
      .orderBy("window_start_us", "dim_label")
      .collect()
    assert(expected.nonEmpty)

    val dir = Files.createTempDirectory("graft-enrich").toString
    val plainEvents = Tables(spark, sf("sf0.001"), "events")
    plainEvents.write.mode("overwrite").parquet(dir)
    val streamed = spark.readStream
      .schema(plainEvents.schema)
      .parquet(dir)
      .withColumn("dim_key", col("user_id") % 25)
    val query = EventStreams
      .enrichedTumblingCounts(streamed, dim, watermark = Some("1 hour"))
      .writeStream
      .format("memory")
      .queryName("enrich_test")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination(120000)

    val got = spark.table("enrich_test")
      .orderBy("window_start_us", "dim_label")
      .collect()
    assert(got.toSeq === expected.toSeq)
  }

  test("attributionJoinOuter: null rows emit exactly for expired unmatched clicks") {
    import org.apache.spark.sql.functions._
    val batchEvents = Tables(spark, sf("sf0.001"), "events")
    val batch = EventStreams.attributionJoinOuter(
        batchEvents.filter(col("event_type") === "click"),
        batchEvents.filter(col("event_type") === "purchase"))
      .collect().toSet

    val dir = Files.createTempDirectory("graft-ssjo").toString
    batchEvents.write.mode("overwrite").parquet(dir)
    def streamOf(tpe: String) = spark.readStream
      .schema(batchEvents.schema).parquet(dir)
      .filter(col("event_type") === tpe)
    val query = EventStreams
      .attributionJoinOuter(streamOf("click"), streamOf("purchase"))
      .writeStream
      .format("memory")
      .queryName("attribution_outer_test")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination(120000)
    val streamed = spark.table("attribution_outer_test").collect().toSet

    // the stream can emit a null row only once the watermark passes
    // click_time + horizon; clicks near the end of input legitimately
    // stay open when AvailableNow stops — so streamed ⊆ batch, all
    // MATCHED rows are present, and every null row in streamed is a
    // null row in batch
    assert(streamed.subsetOf(batch),
      s"streamed rows not in batch: ${streamed.diff(batch).take(3)}")
    val matchedBatch = batch.filter(_.get(2) != null)
    val matchedStreamed = streamed.filter(_.get(2) != null)
    assert(matchedStreamed === matchedBatch)
    assert(streamed.exists(_.get(2) == null),
      "expected at least one expired unmatched click to emit a null row")
  }

  test("watermark: a late event beyond the horizon is dropped, not re-aggregated") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    def us(h: Int, m: Int): Long = (h * 3600L + m * 60L) * 1000000L
    // events table shape: ts is NANOS since epoch
    def rows(es: (Long, Int, Int)*) = es.toSeq.map { case (id, h, m) =>
      (id, 1L, us(h, m) * 1000L, "click", 1.0)
    }.toDF("event_id", "user_id", "ts", "event_type", "value")

    val src = java.nio.file.Files.createTempDirectory("graft-wm-src").toString
    val chk = java.nio.file.Files.createTempDirectory("graft-wm-chk").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-wm-out").toString
    val schema = rows((0L, 9, 10)).schema

    // memory sink cannot recover from a checkpoint; the parquet sink can,
    // which is what makes the two-restart late-data scenario expressible
    def runBatch(): Unit = {
      val q = EventStreams.tumblingCounts(
        spark.readStream.schema(schema).parquet(src),
        watermark = Some("1 hour"))
        .writeStream.format("parquet")
        .option("path", outDir)
        .outputMode("append")
        .option("checkpointLocation", chk)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }

    // batch 1: 09:10 event, then 12:00 → watermark advances to 11:00,
    // finalizing (and emitting) the 09:00 window with count 1
    rows((1L, 9, 10), (2L, 11, 5), (3L, 12, 0))
      .write.mode("append").parquet(src)
    runBatch()
    // batch 2: a LATE 09:20 event (beyond the 11:00 watermark → dropped)
    // plus 13:00, which finalizes the 11:00 window
    rows((4L, 9, 20), (5L, 13, 0))
      .write.mode("append").parquet(src)
    runBatch()
    // batch 3: advance the watermark once more so every assertable window
    // has flushed regardless of when the final empty batch runs
    rows((6L, 15, 0)).write.mode("append").parquet(src)
    runBatch()

    val out = spark.read.parquet(outDir)
      .select((col("window_start_us") / us(1, 0)).cast("int").as("hour"), col("n"))
      .as[(Int, Long)].collect().toMap
    assert(out(9) === 1L, s"late 09:20 event must be dropped, got $out")
    assert(out(11) === 1L, s"11:00 window finalized by batch 2, got $out")
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
