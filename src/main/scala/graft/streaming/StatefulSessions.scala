package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state sessionization with `flatMapGroupsWithState` — the
  * arbitrary-state streaming surface (SURVEY-plus brief: KeyValueGrouped
  * Dataset state ops). Closes a session when the gap to the next event
  * exceeds `gapUs`, or on processing-time timeout for the tail session.
  *
  * Scale notes: state per key is O(1) (one open session summary), evicted
  * on timeout — bounded regardless of stream length; the shuffle is the
  * groupByKey hash partition on user_id, identical to the batch
  * sessionization's window shuffle.
  */
object StatefulSessions {

  case class Event(user_id: Long, tkey: Long, value: Double)
  case class OpenSession(start: Long, last: Long, n: Long, total: Double)
  case class SessionOut(user_id: Long, session_start: Long, n_events: Long,
      total_value: Double, closed_by: String)

  val DefaultGapUs: Long = 1800000000L // 30 min

  /** Per-key state transition: fold sorted-within-batch events into the
    * open session; emit closed sessions. */
  def updateKey(gapUs: Long)(
      userId: Long, events: Iterator[Event],
      state: GroupState[OpenSession]): Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      return Iterator(SessionOut(userId, s.start, s.n, s.total, "timeout"))
    }
    val sorted = events.toSeq.sortBy(_.tkey)
    var open = state.getOption
    val closed = Seq.newBuilder[SessionOut]
    sorted.foreach { e =>
      open match {
        case Some(s) if e.tkey - s.last > gapUs =>
          closed += SessionOut(userId, s.start, s.n, s.total, "gap")
          open = Some(OpenSession(e.tkey, e.tkey, 1, e.value))
        case Some(s) =>
          open = Some(OpenSession(s.start, e.tkey, s.n + 1, s.total + e.value))
        case None =>
          open = Some(OpenSession(e.tkey, e.tkey, 1, e.value))
      }
    }
    open.foreach { s =>
      state.update(s)
      state.setTimeoutDuration("30 seconds")
    }
    closed.result().iterator
  }

  /** Wire a (possibly streaming) events frame through the stateful
    * sessionizer. Caller picks the output mode (Append for streams). */
  def sessionize(events: DataFrame, gapUs: Long = DefaultGapUs): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .selectExpr("user_id", "ts DIV 1000 AS tkey", "value")
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout())(
        updateKey(gapUs))
  }
}
