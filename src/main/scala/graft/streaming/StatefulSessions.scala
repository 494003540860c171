package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming (SURVEY §2.2 "stateful ops"):
  * per-key session tracking with `flatMapGroupsWithState` — the shape
  * the reference's cross-block tx->outcome matching needs when a
  * stream-stream join's watermark bound is too rigid
  * (borealis-indexer/src/main.rs:121-124: outcomes land in later
  * blocks, unbounded in principle).
  *
  * State per user: open session (start, last-seen, count). An event
  * more than `gapSeconds` after the last closes the session and emits
  * it; processing-time timeout flushes sessions that stop receiving
  * events entirely.
  */
object StatefulSessions {

  case class Event(user_id: Long, ts_s: Long, event_type: String)
  case class SessionState(start: Long, last: Long, n: Long)
  case class ClosedSession(user_id: Long, start_s: Long, end_s: Long, n_events: Long)

  val GapSeconds = 1800L

  def sessionize(withTimeout: Boolean)(
      user: Long,
      events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[ClosedSession] = {
    if (state.hasTimedOut) {
      val out = state.getOption
        .map(s => ClosedSession(user, s.start, s.last, s.n)).iterator
      state.remove()
      return out
    }
    var closed = List.empty[ClosedSession]
    var cur = state.getOption
    for (e <- events.toSeq.sortBy(_.ts_s)) {
      cur match {
        case Some(s) if e.ts_s - s.last < GapSeconds =>
          cur = Some(SessionState(s.start, e.ts_s, s.n + 1))
        case Some(s) =>
          closed ::= ClosedSession(user, s.start, s.last, s.n)
          cur = Some(SessionState(e.ts_s, e.ts_s, 1))
        case None =>
          cur = Some(SessionState(e.ts_s, e.ts_s, 1))
      }
    }
    cur.foreach(state.update)
    if (withTimeout) state.setTimeoutDuration(s"$GapSeconds seconds")
    closed.reverseIterator
  }

  /** Wire the state machine over a (possibly streaming) typed Dataset.
    * `flushIdleSessions=true` adds a processing-time timeout that closes
    * sessions whose key stops receiving events; note it keeps the query
    * re-triggering on the timeout clock (use in production tails, not in
    * drain-and-stop tests).
    */
  def apply(
      spark: SparkSession,
      events: Dataset[Event],
      flushIdleSessions: Boolean = false): Dataset[ClosedSession] = {
    import spark.implicits._
    val timeout =
      if (flushIdleSessions) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(sessionize(flushIdleSessions))
  }
}
