package graft

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingDedup

/** Streaming exact dedup: first arrival wins within the watermark;
  * state is dropped once the watermark passes (bounded state — the
  * property that makes the operator survive an unbounded stream). */
class StreamingDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.from(Instant.parse(s))

  case class Rec(event_id: Long, ts: Timestamp)

  test("duplicates within the watermark dropped; state expires after it") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Rec]
    val deduped = StreamingDedup.exactDedupStream(
      input.toDF().withWatermark("ts", "10 minutes"), Seq("event_id"))
    val q = deduped.writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()

    // same key twice in one batch + again in the next batch -> one row
    input.addData(Rec(1L, ts("2024-01-01T10:00:00Z")),
      Rec(1L, ts("2024-01-01T10:00:30Z")),
      Rec(2L, ts("2024-01-01T10:01:00Z")))
    q.processAllAvailable()
    input.addData(Rec(1L, ts("2024-01-01T10:05:00Z"))) // dup, within watermark
    q.processAllAvailable()
    assert(spark.table("sdedup").count() == 2L, "keys 1 and 2, once each")

    // advance the watermark far past key 1's state horizon, then send
    // key 1 again: state expired -> re-emitted (the documented trade
    // that keeps state bounded on an unbounded stream)
    input.addData(Rec(9L, ts("2024-01-01T12:00:00Z")))
    q.processAllAvailable()
    input.addData(Rec(1L, ts("2024-01-01T11:55:00Z")))
    q.processAllAvailable()
    q.stop()
    val byKey = spark.table("sdedup").groupBy("event_id").count()
      .as[(Long, Long)].collect().toMap
    assert(byKey(1L) == 2L, "re-emitted after state expiry")
    assert(byKey(2L) == 1L && byKey(9L) == 1L)
  }
}
