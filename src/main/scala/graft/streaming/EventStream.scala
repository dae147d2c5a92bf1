package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Structured Streaming operators over the events schema.
  *
  * The same transformations work on a batch DataFrame (tested against
  * the batch path) and a `readStream` source: declare the plan, let the
  * micro-batch planner own incrementalization. Watermarks bound state;
  * `flatMapGroupsWithState` carries the custom per-user session state
  * the built-in windows can't express.
  */
object EventStream {

  final case class Event(
      event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class UserSessionState(sessionCount: Long, lastTs: Long)

  final case class SessionUpdate(user_id: Long, session_count: Long)

  /** Tumbling-window event-type counts with a watermark: the canonical
    * streaming windowed aggregation (10-minute lateness bound keeps
    * state finite at any scale). */
  def windowedTypeCounts(events: DataFrame,
      windowLen: String = "5 minutes", watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_val"))
      .select(
        col("window.start").as("win_start"),
        col("event_type"), col("n"), col("sum_val"))

  /** Streaming deduplication: drop re-delivered events by event_id. The
    * watermark bounds the dedup state — ids older than the lateness
    * horizon are evicted, so state stays finite on an unbounded stream
    * (the streaming twin of batch d01_dedup_exact). */
  def dedupStream(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Custom state machine: per-user session counting with a 30-minute
    * inactivity gap, via flatMapGroupsWithState — the streaming twin of
    * batch q23_sessionize. State is bounded by the active-user set; an
    * event-time timeout would release idle users' state in a production
    * deployment (processing-time timeouts force idle re-triggering,
    * which breaks drain-to-quiescence semantics in tests). */
  def userSessionCounts(events: Dataset[Event]): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserSessionState, SessionUpdate](
        org.apache.spark.sql.streaming.OutputMode.Update,
        GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[UserSessionState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          if (sorted.isEmpty) Iterator.empty
          else {
            val init = state.getOption.getOrElse(UserSessionState(0L, Long.MinValue))
            val next = sorted.foldLeft(init) { (st, e) =>
              val gapMs = e.ts.getTime - st.lastTs
              val isNew = st.lastTs == Long.MinValue || gapMs > 30L * 60 * 1000
              UserSessionState(st.sessionCount + (if (isNew) 1 else 0), e.ts.getTime)
            }
            state.update(next)
            Iterator.single(SessionUpdate(userId, next.sessionCount))
          }
      }
  }
}
