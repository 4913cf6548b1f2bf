package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CDC compaction — the unbounded-stream twin of the batch
  * `Lifecycle.cdcApply`: maintain the latest surviving row per key as
  * the changelog flows, emitting an upsert row whenever a key's head
  * advances (the "materialized view maintenance" loop every serving
  * table runs off a log).
  *
  * `flatMapGroupsWithState` keyed on user_id; state per key is ONE
  * fixed-size Latest record — never the history — so state size is
  * |live keys| regardless of stream length. Ordering is the batch
  * op's exact key, (event-time µs, event_id), applied per trigger
  * against the stored head: a stale row arriving late emits NOTHING
  * (the head did not advance), which is what makes the emission stream
  * idempotent to replays and reorderings up to head ties.
  *
  * Tombstones (the batch op's `tombstoneType`) stay IN state like any
  * other head — deleting state on a tombstone would resurrect an
  * older upsert that arrives later — and surface on the emission as a
  * flag for the sink to apply. An optional processing-time TTL bounds
  * state for key spaces that grow without bound (the StreamingNearDup
  * trade: an expired key's next change re-emits as if new). */
object StreamingCdc {

  case class Change(user_id: Long, us: Long, event_id: Long,
                    event_type: String, value_micro: Long)
  case class Latest(us: Long, event_id: Long, event_type: String,
                    value_micro: Long)
  case class Upsert(user_id: Long, last_us: Long, last_event_id: Long,
                    last_type: String, last_value_micro: Long,
                    tombstone: Boolean)

  /** events must carry (ts, event_id, user_id, event_type, value). */
  def latestPerKey(events: DataFrame, tombstoneType: String = "error",
                   stateTtlMs: Long = 0L): Dataset[Upsert] = {
    val spark = events.sparkSession
    import spark.implicits._
    val changes = events.select(
        col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        col("event_type"),
        expr("CAST(floor(value * 1000000) AS BIGINT)").as("value_micro"))
      .as[Change]
    val timeout =
      if (stateTtlMs > 0L) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    changes.groupByKey(_.user_id)
      .flatMapGroupsWithState[Latest, Upsert](OutputMode.Update(), timeout) {
        (uid: Long, batch: Iterator[Change], state: GroupState[Latest]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val head0 = state.getOption
            val head = batch.foldLeft(head0) { (acc, c) =>
              val l = Latest(c.us, c.event_id, c.event_type, c.value_micro)
              acc match {
                case Some(a) if a.us > l.us
                  || (a.us == l.us && a.event_id >= l.event_id) => acc
                case _ => Some(l)
              }
            }
            head match {
              case Some(h) if !head0.contains(h) =>
                state.update(h)
                if (stateTtlMs > 0L) state.setTimeoutDuration(stateTtlMs)
                Iterator.single(Upsert(uid, h.us, h.event_id, h.event_type,
                  h.value_micro, h.event_type == tombstoneType))
              case _ => Iterator.empty
            }
          }
      }
  }
}
