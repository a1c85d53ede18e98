package graft.streaming

import graft.{SparkSpec, Tables}

class StatefulSessionsSpec extends SparkSpec {
  import spark.implicits._

  test("updateKey: closes on gap, accumulates within gap, keeps tail open") {
    import StatefulSessions._
    val events = Iterator(
      Event(1L, 1000L, 1.0),
      Event(1L, 2000L, 2.0), // same session (gap 1000 < 5000)
      Event(1L, 60000L, 5.0)) // gap 58000 > 5000 → closes first
    val state = new TestGroupState[OpenSession]
    val out = updateKey(gapUs = 5000L)(1L, events, state).toSeq
    assert(out === Seq(SessionOut(1L, 1000L, 2L, 3.0, "gap")))
    assert(state.updated.contains(OpenSession(60000L, 60000L, 1L, 5.0)))
  }

  test("batch sessionize over real events matches the windowed batch count") {
    // closed sessions (gap-based) + open tails per user == total sessions
    // from the oracle-checked batch formulation
    val events = Tables(spark, sf("sf0.001"), "events")
    val closed = StatefulSessions.sessionize(events).collect()
    val openTails = events.select($"user_id").distinct().count()
    val batchSessions = graft.SparkEntry.queries("q_sessionize")(
      spark, sf("sf0.001")).count()
    assert(closed.length + openTails === batchSessions)
    assert(closed.forall(_.n_events > 0))
  }
}

/** Minimal GroupState stub for unit-testing the transition function. */
class TestGroupState[S] extends org.apache.spark.sql.streaming.GroupState[S] {
  var updated: Option[S] = None
  private var removed = false
  override def exists: Boolean = updated.isDefined
  override def get: S = updated.get
  override def getOption: Option[S] = updated
  override def update(newState: S): Unit = updated = Some(newState)
  override def remove(): Unit = { updated = None; removed = true }
  override def hasTimedOut: Boolean = false
  override def setTimeoutDuration(durationMs: Long): Unit = ()
  override def setTimeoutDuration(duration: String): Unit = ()
  override def setTimeoutTimestamp(timestampMs: Long): Unit = ()
  override def setTimeoutTimestamp(timestampMs: Long, additionalDuration: String): Unit = ()
  override def setTimeoutTimestamp(timestamp: java.sql.Date): Unit = ()
  override def setTimeoutTimestamp(timestamp: java.sql.Date, additionalDuration: String): Unit = ()
  override def getCurrentWatermarkMs(): Long = 0L
  override def getCurrentProcessingTimeMs(): Long = 0L
}
