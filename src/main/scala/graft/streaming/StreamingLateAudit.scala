package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming late-data measurement — the unbounded-stream twin of the
  * batch `Events.lateDataAudit`: emit each event's lateness (how far
  * its event time lags the user's running event-time maximum in
  * arrival order) AS THE STREAM FLOWS, so the watermark-sizing
  * distribution maintains itself instead of being recomputed over
  * history. This is the measurement loop a production pipeline runs
  * BEFORE committing to a `withWatermark` delay — and it needs only
  * one µs long of state per user.
  *
  * `flatMapGroupsWithState` keyed on user_id; state = the user's max
  * observed event time (fixed size, |active users| total). Within a
  * trigger the user's rows fold in arrival (event_id) order — the
  * batch op's exact proxy — so fed the same rows, the emitted
  * lateness multiset equals the batch derivation row-for-row (the
  * spec's differential). An optional processing-time TTL bounds state
  * for unbounded key spaces. */
object StreamingLateAudit {

  case class Ev(user_id: Long, us: Long, event_id: Long)
  case class MaxTs(us: Long)
  case class Lateness(user_id: Long, event_id: Long, late_us: Long)

  /** events must carry (ts, event_id, user_id). */
  def lateness(events: DataFrame,
               stateTtlMs: Long = 0L): Dataset[Lateness] = {
    val spark = events.sparkSession
    import spark.implicits._
    val evs = events.select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"))
      .as[Ev]
    val timeout =
      if (stateTtlMs > 0L) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    evs.groupByKey(_.user_id)
      .flatMapGroupsWithState[MaxTs, Lateness](OutputMode.Append(), timeout) {
        (uid: Long, batch: Iterator[Ev], state: GroupState[MaxTs]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = batch.toVector.sortBy(_.event_id)
            var headUs = state.getOption.map(_.us)
            val out = Vector.newBuilder[Lateness]
            sorted.foreach { e =>
              val late = headUs match {
                case Some(h) if h > e.us => h - e.us
                case _                   => 0L
              }
              out += Lateness(uid, e.event_id, late)
              if (!headUs.exists(_ >= e.us)) headUs = Some(e.us)
            }
            headUs.foreach { h =>
              state.update(MaxTs(h))
              if (stateTtlMs > 0L) state.setTimeoutDuration(stateTtlMs)
            }
            out.result().iterator
          }
      }
  }
}
