package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Clickstream sessionization — the stateful-streaming capability the
  * reference's roadmap defers ("real-time" README.md:12,116), built two
  * ways:
  *
  *  - [[sessionWindows]]: the declarative `session_window` gap window —
  *    identical plan on batch and stream, state managed by Spark.
  *  - [[sessionsWithState]]: `flatMapGroupsWithState` with an explicit
  *    per-user state machine and event-time timeout — the escape hatch for
  *    session logic `session_window` can't express (custom merge rules,
  *    per-session caps). State is one small case class per active user, so
  *    the state store stays bounded by active users, not history.
  */
object Sessionize {

  /** Gap-based session aggregation; works unchanged on batch or stream
    * (stream needs a watermark for append output). */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes",
                     lateness: String = "1 hour"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", lateness) else events
    withWm
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("events"))
  }

  final case class Click(user_id: Long, ts: Timestamp)
  final case class SessionState(start: Long, last: Long, count: Int)
  final case class UserSession(user_id: Long, session_start: Timestamp,
                               session_end: Timestamp, events: Int)

  /** Custom-state sessionization: closes a session when `gapMs` passes
    * with no events (event-time timeout on the stream). Late-closing
    * semantics: new events within the gap extend the open session; events
    * after the gap close it and start a new one. */
  def sessionsWithState(clicks: Dataset[Click], gapMs: Long): Dataset[UserSession] = {
    import clicks.sparkSession.implicits._

    def fn(userId: Long, rows: Iterator[Click],
           state: GroupState[SessionState]): Iterator[UserSession] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return Iterator(UserSession(userId, new Timestamp(s.start),
          new Timestamp(s.last), s.count))
      }
      val ts = rows.map(_.ts.getTime).toArray.sorted
      var closed = List.empty[UserSession]
      var cur = state.getOption
      ts.foreach { t =>
        cur match {
          // strict <: matches session_window, which merges only
          // strictly-overlapping [ts, ts+gap) windows — an event exactly
          // gapMs after the last one starts a NEW session
          case Some(s) if t - s.last < gapMs =>
            cur = Some(s.copy(last = math.max(s.last, t), count = s.count + 1))
          case Some(s) =>
            closed ::= UserSession(userId, new Timestamp(s.start),
              new Timestamp(s.last), s.count)
            cur = Some(SessionState(t, t, 1))
          case None =>
            cur = Some(SessionState(t, t, 1))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // close when the event-time watermark passes last + gap
        state.setTimeoutTimestamp(s.last + gapMs)
      }
      closed.reverseIterator
    }

    clicks
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(fn)
  }
}
