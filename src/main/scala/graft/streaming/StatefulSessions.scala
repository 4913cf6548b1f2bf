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
  final case class Session(user_id: Long, session_start: Timestamp,
                           session_end: Timestamp, n: Int)

  /** Sessions with `gapSec` inactivity, emitted when closed (append
    * mode). Input must carry a watermark on `ts`. */
  def sessions(events: Dataset[Event], gapSec: Long): Dataset[Session] = {
    val gapMs = gapSec * 1000L
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val longEnc = Encoders.scalaLong

    def close(uid: Long, s: SessionState): Session =
      Session(uid, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.n)

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          val out = ListBuffer.empty[Session]
          if (state.hasTimedOut) {
            // watermark passed start of the gap horizon: session is final
            state.getOption.foreach(s => out += close(uid, s))
            state.remove()
          } else {
            var st = state.getOption
            batch.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime
              st match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  st = Some(s.copy(lastMs = math.max(s.lastMs, t), n = s.n + 1))
                case Some(s) => // gap exceeded inside the batch: emit, restart
                  out += close(uid, s)
                  st = Some(SessionState(t, t, 1))
                case None =>
                  st = Some(SessionState(t, t, 1))
              }
            }
            st.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
          }
          out.iterator
      }
  }
}
