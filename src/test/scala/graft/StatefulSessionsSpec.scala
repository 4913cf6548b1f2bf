package graft

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StatefulSessions
import graft.streaming.StatefulSessions.Event

/** flatMapGroupsWithState sessionization: sessions emitted exactly once
  * when the watermark closes them; state bounded by event-time timeout. */
class StatefulSessionsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.from(Instant.parse(s))

  test("sessions close via watermark timeout and in-batch gaps") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    // 2h allowed lateness: large enough that the in-batch-gap scenario
    // below keeps BOTH its sessions inside the watermark (the 03:00
    // event only advances the watermark to 01:00)
    val sessions = StatefulSessions.sessions(
      input.toDS().withWatermark("ts", "2 hours").as[Event],
      gapSec = 3600L)
    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Append()).start()

    // user 1: two events 30 min apart -> one session
    input.addData(Event(1L, ts("2024-01-01T10:00:00Z")),
      Event(1L, ts("2024-01-01T10:30:00Z")))
    q.processAllAvailable()
    assert(spark.table("sess").count() == 0L, "session still open")

    // user 2 far in the future advances the watermark past user 1's
    // gap horizon (10:30 + 1h) -> user 1's session emits via timeout
    input.addData(Event(2L, ts("2024-01-01T20:00:00Z")))
    q.processAllAvailable()
    input.addData(Event(2L, ts("2024-01-01T23:00:00Z"))) // trigger timeout eval
    q.processAllAvailable()

    val afterTimeout = spark.table("sess")
      .select($"user_id", $"session_start".cast("string"),
        $"session_end".cast("string"), $"n")
      .as[(Long, String, String, Int)].collect().toSet
    assert(afterTimeout.contains(
      (1L, "2024-01-01 10:00:00", "2024-01-01 10:30:00", 2)),
      s"got $afterTimeout")

    // in-batch gap: two events > 1h apart in ONE batch form TWO pending
    // sessions — but neither may emit until the watermark proves them
    // closed (a late event inside the watermark could still bridge them)
    input.addData(Event(3L, ts("2024-01-02T01:00:00Z")),
      Event(3L, ts("2024-01-02T03:00:00Z")))
    q.processAllAvailable()
    assert(spark.table("sess").filter($"user_id" === 3L).count() == 0L,
      "in-batch-closed sessions stay pending until the watermark passes")

    // a late event still within both gap horizons BRIDGES the two
    // pending sessions into one — the bug class this design prevents:
    // eager emission would have produced overlapping sessions
    input.addData(Event(3L, ts("2024-01-02T02:00:00Z")))
    q.processAllAvailable()
    // advance the watermark past 03:00 + 1h gap -> the merged session emits
    input.addData(Event(2L, ts("2024-01-02T12:00:00Z")))
    q.processAllAvailable()
    input.addData(Event(2L, ts("2024-01-02T13:00:00Z"))) // trigger timeout eval
    q.processAllAvailable()
    q.stop()
    val u3 = spark.table("sess").filter($"user_id" === 3L)
      .select($"session_start".cast("string"), $"session_end".cast("string"), $"n")
      .as[(String, String, Int)].collect().toSet
    assert(u3 == Set(("2024-01-02 01:00:00", "2024-01-02 03:00:00", 3)),
      s"one merged session spanning the bridged gap, got $u3")
  }
}
