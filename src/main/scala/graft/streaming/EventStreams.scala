package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured Streaming surface (SURVEY.md §2.14 — the reference is pure
  * batch; this is the optional stretch made first-class: the same
  * DataFrame logic runs incrementally over a file stream).
  *
  * Scale notes: watermarked windowed aggregation is Spark's canonical
  * streaming shuffle — state is keyed by (window, event_type) and evicted
  * past the watermark, so state size is bounded regardless of input
  * volume. The batch twins of these transforms are verified against the
  * DuckDB oracle (q_tumbling_window, q_sessionize); streaming equivalence
  * with the batch result is asserted in EventStreamsSpec via
  * Trigger.AvailableNow.
  */
object EventStreams {

  /** events with nanos-as-long ts → proper TimestampType column. */
  def withEventTime(events: DataFrame): DataFrame =
    events.withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))

  /** Tumbling-window counts + value sums per event_type. Works identically
    * on a batch or streaming DataFrame (same plan, incremental state when
    * streaming). */
  def tumblingCounts(events: DataFrame, windowLen: String = "1 hour",
      watermark: Option[String] = None): DataFrame = {
    val timed = withEventTime(events)
    val src = watermark.fold(timed)(w => timed.withWatermark("event_time", w))
    src
      .groupBy(window(col("event_time"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(unix_micros(col("w.start")).as("window_start_us"),
        col("event_type"), col("n"), col("total_value"))
  }

  /** Hopping (sliding) windows — each event lands in len/slide
    * overlapping windows (4 at the 1h/15m default). Same bounded-state
    * eviction as tumbling when watermarked; batch twin q_hopping_window
    * is oracle-checked against an explicit window-enumeration join. */
  def hoppingCounts(events: DataFrame, windowLen: String = "1 hour",
      slide: String = "15 minutes", watermark: Option[String] = None): DataFrame = {
    val timed = withEventTime(events)
    val src = watermark.fold(timed)(w => timed.withWatermark("event_time", w))
    src
      .groupBy(window(col("event_time"), windowLen, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(unix_micros(col("w.start")).as("window_start_us"),
        col("event_type"), col("n"), col("total_value"))
  }

  /** Built-in session windows — the declarative third form of
    * sessionization next to the batch lag/cumsum query (q_sessionize) and
    * the flatMapGroupsWithState custom state op (StatefulSessions); on a
    * stream, state is evicted past the watermark like any windowed agg.
    * Boundary semantics: session_window merges events STRICTLY closer
    * than `gap` (windows [t, t+gap) merge on overlap), where the lag rule
    * `diff > gap breaks` also keeps an exactly-gap-apart pair together —
    * the spec triangulates with the aligned `>=` break. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes"): DataFrame = {
    val timed = withEventTime(events)
    timed
      .groupBy(col("user_id"), session_window(col("event_time"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), unix_micros(col("sw.start")).as("session_start_us"),
        col("n_events"))
  }

  /** Streaming exact-dedup on a key set — the incremental twin of the
    * batch hash-groupBy dedup in the training-data pipeline. State is
    * BOUNDED: dropDuplicatesWithinWatermark keeps a key only until the
    * watermark passes it, so a forever-running ingest job holds hours of
    * keys, not the corpus. (Plain dropDuplicates on a stream would grow
    * state without bound — the scale-wrong formulation.) */
  def dedupWithinWatermark(events: DataFrame, keys: Seq[String],
      watermark: String = "1 hour"): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Stream-stream inner join — click→purchase attribution: every
    * purchase a user makes within `horizon` of one of their clicks.
    *
    * Scale notes: this is Spark's canonical stateful two-stream join.
    * Both sides carry a watermark AND the join condition bounds
    * purchase_time to [click_time, click_time + horizon], which is what
    * lets the state store evict a click once the purchase-side watermark
    * passes click_time + horizon — without the time bound, both sides'
    * state would grow forever. Inner-join rows emit as soon as they
    * match (the watermark gates only state eviction), so append-mode
    * output is incremental. On a batch frame the same plan degrades to a
    * plain equi-join on user_id with a range filter (withWatermark is a
    * batch no-op), which is how the DuckDB oracle checks it
    * (q_event_attribution). */
  def attributionJoin(clicks: DataFrame, purchases: DataFrame,
      horizon: String = "1 hour", watermark: String = "2 hours"): DataFrame =
    attributionJoinOf(clicks, purchases, horizon, watermark, "inner")

  /** Left-outer form: clicks that never converted emit with null
    * purchase columns — on a stream, ONLY once the purchase-side
    * watermark passes click_time + horizon (the state-expiry emit that
    * makes outer stream-stream joins correct); in batch it is a plain
    * left join with the range condition. */
  def attributionJoinOuter(clicks: DataFrame, purchases: DataFrame,
      horizon: String = "1 hour", watermark: String = "2 hours"): DataFrame =
    attributionJoinOf(clicks, purchases, horizon, watermark, "left_outer")

  /** Stream-static enrichment join + windowed aggregate: the event
    * stream (carrying a `dim_key` column) joins a STATIC dimension
    * `(dim_key, dim_label)` and aggregates per (window, dim_label).
    * Spark re-plans the static side every micro-batch, so a broadcast
    * dim is re-broadcast from the latest snapshot — the standard
    * streaming-enrichment shape (no state needed on the dim side; the
    * windowed agg's state stays watermark-bounded as usual). Identical
    * plan on a batch frame, which is how the spec checks equivalence. */
  def enrichedTumblingCounts(eventsWithKey: DataFrame, dim: DataFrame,
      windowLen: String = "1 hour", watermark: Option[String] = None): DataFrame = {
    val timed = withEventTime(eventsWithKey)
    val src = watermark.fold(timed)(w => timed.withWatermark("event_time", w))
    src.join(broadcast(dim), Seq("dim_key"))
      .groupBy(window(col("event_time"), windowLen).as("w"), col("dim_label"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(unix_micros(col("w.start")).as("window_start_us"),
        col("dim_label"), col("n"), col("total_value"))
  }

  private def attributionJoinOf(clicks: DataFrame, purchases: DataFrame,
      horizon: String, watermark: String, joinType: String): DataFrame = {
    val c = withEventTime(clicks).withWatermark("event_time", watermark)
      .select(col("user_id"), col("event_id").as("click_id"),
        col("event_time").as("click_time"))
    val p = withEventTime(purchases).withWatermark("event_time", watermark)
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("event_time").as("purchase_time"), col("value").as("purchase_value"))
    c.join(p,
        col("user_id") === col("p_user") &&
          col("purchase_time") >= col("click_time") &&
          col("purchase_time") <= col("click_time") + expr(s"INTERVAL $horizon"),
        joinType)
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        (unix_micros(col("purchase_time")) - unix_micros(col("click_time")))
          .as("delay_us"),
        col("purchase_value"))
  }
}
