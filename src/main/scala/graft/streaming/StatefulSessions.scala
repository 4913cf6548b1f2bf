package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed state on an unbounded stream:
  * `KeyValueGroupedDataset.flatMapGroupsWithState` sessionization —
  * the §2.4 "custom state" capability beyond what `session_window`
  * covers (here: we emit a session exactly once, when the event-time
  * watermark proves it closed).
  *
  * Scale design: state lives in the state store (RocksDB-backed on a
  * production cluster), partitioned by user_id; the event-time timeout
  * bounds state size — a user's state is dropped the moment the
  * watermark passes their session's gap horizon. No unbounded growth.
  */
object StatefulSessions {

  final case class Event(user_id: Long, ts: Timestamp)
  final case class SessionState(startMs: Long, lastMs: Long, n: Int)
  /** State = ALL of a user's not-yet-final sessions. A session whose
    * gap was exceeded inside a batch is still PENDING, not emitted: a
    * late event within the watermark could legitimately extend it or
    * bridge it to the next session. Only the watermark finalizes. */
  final case class Pending(sessions: List[SessionState])
  final case class Session(user_id: Long, session_start: Timestamp,
                           session_end: Timestamp, n: Int)

  /** Sessions with `gapSec` inactivity, each emitted EXACTLY ONCE —
    * when the event-time watermark passes its gap horizon (lastMs +
    * gap), never earlier (append mode). Input must carry a watermark
    * on `ts`. Late events inside the watermark merge into (or bridge)
    * pending sessions instead of producing overlapping duplicates. */
  def sessions(events: Dataset[Event], gapSec: Long): Dataset[Session] = {
    val gapMs = gapSec * 1000L
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[Pending]
    implicit val longEnc = Encoders.scalaLong

    def close(uid: Long, s: SessionState): Session =
      Session(uid, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.n)

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Pending, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, batch: Iterator[Event], state: GroupState[Pending]) =>
          val wm = state.getCurrentWatermarkMs()
          // interval-merge pending sessions with the batch's events:
          // sort by start, fold — an event (or session) within gap of
          // the previous interval extends it; one that bridges two
          // pending sessions merges them transitively
          val pts = batch.map(e =>
            SessionState(e.ts.getTime, e.ts.getTime, 1)).toList
          val all = (state.getOption.map(_.sessions).getOrElse(Nil) ++ pts)
            .sortBy(s => (s.startMs, s.lastMs))
          val merged = all.foldLeft(List.empty[SessionState]) {
            case (head :: tail, s) if s.startMs - head.lastMs <= gapMs =>
              SessionState(head.startMs, math.max(head.lastMs, s.lastMs),
                head.n + s.n) :: tail
            case (acc, s) => s :: acc
          }.reverse
          // final = the watermark proves no late event can touch it
          val (closed, open) = merged.partition(_.lastMs + gapMs <= wm)
          if (open.isEmpty) state.remove()
          else {
            state.update(Pending(open))
            state.setTimeoutTimestamp(
              math.max(open.map(_.lastMs + gapMs).min, wm + 1L))
          }
          closed.sortBy(_.startMs).map(close(uid, _)).iterator
      }
  }
}
