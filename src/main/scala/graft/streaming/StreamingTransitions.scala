package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming Markov transitions — the unbounded-stream twin of the
  * batch `Events.transitionMatrix` pair derivation: emit each user's
  * consecutive (previous type → next type) event pair as the stream
  * flows, so the downstream matrix aggregate maintains itself
  * incrementally instead of re-scanning history.
  *
  * `flatMapGroupsWithState` keyed on user_id; state per key is ONE
  * fixed-size Last record (the user's event-time head) — never an
  * event history — so state is |active users|-sized regardless of
  * stream length. Within a trigger the user's rows sort by the batch
  * op's exact ordering key (event-time µs, event_id); a row older than
  * the stored head is DROPPED (same late policy as StreamingCdc: the
  * head never moves backwards, making emissions idempotent under
  * replays). Fed per-user in event-time order — the case the spec
  * drives — the emitted pair multiset equals the batch derivation
  * row-for-row.
  *
  * An optional processing-time TTL bounds state for unbounded key
  * spaces; an expired user's next event starts a fresh chain (one
  * missing transition at the expiry seam, the standard trade). */
object StreamingTransitions {

  case class Ev(user_id: Long, us: Long, event_id: Long, event_type: String)
  case class Last(us: Long, event_id: Long, event_type: String)
  case class Transition(user_id: Long, src: String, dst: String, us: Long)

  /** events must carry (ts, event_id, user_id, event_type). */
  def transitions(events: DataFrame,
                  stateTtlMs: Long = 0L): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._
    val evs = events.select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .as[Ev]
    val timeout =
      if (stateTtlMs > 0L) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    evs.groupByKey(_.user_id)
      .flatMapGroupsWithState[Last, Transition](OutputMode.Append(), timeout) {
        (uid: Long, batch: Iterator[Ev], state: GroupState[Last]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // per-trigger, per-user buffer: bounded by the trigger's
            // batch, never by stream history
            val sorted = batch.toVector.sortBy(e => (e.us, e.event_id))
            var head = state.getOption
            val out = Vector.newBuilder[Transition]
            sorted.foreach { e =>
              head match {
                case Some(h) if h.us > e.us
                  || (h.us == e.us && h.event_id >= e.event_id) =>
                  () // late arrival: head never moves backwards
                case Some(h) =>
                  out += Transition(uid, h.event_type, e.event_type, e.us)
                  head = Some(Last(e.us, e.event_id, e.event_type))
                case None =>
                  head = Some(Last(e.us, e.event_id, e.event_type))
              }
            }
            head.foreach { h =>
              state.update(h)
              if (stateTtlMs > 0L) state.setTimeoutDuration(stateTtlMs)
            }
            out.result().iterator
          }
      }
  }
}
