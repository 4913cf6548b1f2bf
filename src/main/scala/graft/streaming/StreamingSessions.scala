package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming sessionization via the ENGINE-NATIVE session operator —
  * the unbounded twin of `Events.sessionWindows`, and the one streaming
  * twin here that needs no hand-rolled state at all: Structured
  * Streaming's `session_window` maintains one merged (start, end]
  * window per (user, open session), merges windows when a new event
  * lands within `gap` of an existing one (including ACROSS triggers),
  * and in append mode emits a session exactly when the event-time
  * watermark passes its end — the first moment no admissible event can
  * extend it. Late events beyond the watermark are dropped by the
  * engine, which is what bounds state: |users × open sessions| live
  * windows, each a constant-size aggregate, never an event buffer.
  *
  * The batch operator (`Events.sessionWindows`) is this exact plan
  * minus the watermark — the spec drives both over the same rows and
  * demands row equality for every closed session, Spark's
  * session-end = last event + gap contract included. */
object StreamingSessions {

  /** events must carry (ts, event_id, user_id). Output: one row per
    * CLOSED session — (user_id, session_start, session_end, n,
    * first_eid). */
  def sessions(events: DataFrame, gap: String = "1 hour",
               watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n"), min("event_id").as("first_eid"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n"), col("first_eid"))
}
