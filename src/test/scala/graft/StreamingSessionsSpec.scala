package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingSessions

/** Top-level for the same encoder reason as CdcEv. */
case class SessEv(event_id: Long, ts: Timestamp, user_id: Long)

/** Streaming sessionization (StreamingSessions.scala): closed-session
  * emissions equal the batch sessionWindows derivation row-for-row,
  * sessions merge across triggers, and only watermark-closed sessions
  * ever surface. */
class StreamingSessionsSpec extends SparkTestBase {
  import spark.implicits._

  private val hourUs = 3600L * 1000000L

  private def ev(id: Long, us: Long, uid: Long) =
    SessEv(id, new Timestamp(us / 1000), uid)

  test("closed sessions equal the batch session_window derivation, " +
    "merging across triggers") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessEv]
    val out = StreamingSessions.sessions(input.toDF(),
      gap = "1 hour", watermark = "2 hours")
    val q = out.writeStream.format("memory").queryName("ssess")
      .outputMode("append").start()

    // user 1: two events 30 min apart (ONE session despite landing in
    // two triggers), then a 2h silence starts a second session;
    // user 2: a lone event
    val b1 = Seq(ev(1, 1 * hourUs, 1), ev(2, hourUs / 2 + hourUs, 2))
    val b2 = Seq(ev(3, 1 * hourUs + hourUs / 2, 1))
    val b3 = Seq(ev(4, 4 * hourUs, 1))
    // flush: two far-future triggers push the watermark past every
    // real session's end (watermark advances at batch boundaries)
    val f1 = Seq(ev(100, 20 * hourUs, 99))
    val f2 = Seq(ev(101, 21 * hourUs, 99))
    Seq(b1, b2, b3, f1, f2).foreach { b =>
      input.addData(b); q.processAllAvailable()
    }
    q.stop()

    val streamed = spark.table("ssess")
      .select("user_id", "session_start", "session_end", "n", "first_eid")
      .orderBy("user_id", "session_start")
      .as[(Long, Timestamp, Timestamp, Long, Long)].collect().toSeq

    val batch = graft.operators.Events
      .sessionWindows((b1 ++ b2 ++ b3).toDF(), gap = "1 hour")
      .orderBy("user_id", "session_start")
      .as[(Long, Timestamp, Timestamp, Long, Long)].collect().toSeq

    assert(streamed == batch,
      s"closed streaming sessions must equal batch: $streamed vs $batch")
    // the cross-trigger merge really merged: user 1's first session
    // holds both events under one window
    assert(streamed.exists(r => r._1 == 1L && r._4 == 2L))
  }

  test("an unclosed session is never emitted") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessEv]
    val out = StreamingSessions.sessions(input.toDF(),
      gap = "1 hour", watermark = "2 hours")
    val q = out.writeStream.format("memory").queryName("ssess2")
      .outputMode("append").start()
    input.addData(Seq(ev(1, 1 * hourUs, 1)))
    q.processAllAvailable()
    input.addData(Seq(ev(2, 2 * hourUs, 1)))
    q.processAllAvailable()
    q.stop()
    // watermark = 2h − 2h = 0h: no session end (≤ 2h+gap) is passed
    assert(spark.table("ssess2").isEmpty)
  }
}
