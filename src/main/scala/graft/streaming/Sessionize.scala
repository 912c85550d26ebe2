package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization, batch and streaming flavors of the same
  * semantics: a new session starts when the inter-event gap exceeds
  * `gapNanos`.
  *
  * Batch: per-user window functions — partitioned by user, so per-key local
  * sort only, no global ordering (scales with keys). Streaming: custom state
  * via `flatMapGroupsWithState`, the Spark primitive for the durable-consumer
  * state the reference only roadmaps (/root/reference/docs/GUIDE.md:461-464).
  */
object Sessionize {

  /** (user_id, n_events, n_sessions) from a batch events frame with
    * `user_id`, raw ns `ts`, and `event_id` tiebreak columns. */
  def batchSessionCounts(events: DataFrame, gapNanos: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .withColumn("new_s",
        when(col("ts") - lag("ts", 1).over(w) > gapNanos, 1).otherwise(0))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        (lit(1) + sum("new_s")).cast("long").as("n_sessions"))
  }

  final case class Ev(user_id: Long, seq: Long, tsNs: Long)
  final case class SessionState(lastTsNs: Long, sessions: Long, events: Long)
  final case class UserSessions(user_id: Long, n_events: Long, n_sessions: Long)

  /** Streaming counterpart over a keyed event stream. Emits the running
    * (n_events, n_sessions) per user on every batch (update mode). */
  def streamSessionCounts(events: Dataset[Ev], gapNanos: Long)
      : Dataset[UserSessions] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSessions](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          val sorted = evs.toSeq.sortBy(e => (e.tsNs, e.seq))
          var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
          sorted.foreach { e =>
            val newSession = st.lastTsNs == Long.MinValue ||
              e.tsNs - st.lastTsNs > gapNanos
            st = SessionState(e.tsNs,
              st.sessions + (if (newSession) 1 else 0), st.events + 1)
          }
          state.update(st)
          if (sorted.nonEmpty) Iterator(UserSessions(uid, st.events, st.sessions))
          else Iterator.empty
      }
  }
}
