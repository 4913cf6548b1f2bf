package graft

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** §2.4 event-time windows on a live stream: window() + withWatermark
  * over a MemoryStream — late data inside the watermark is merged, data
  * beyond it is dropped; state is bounded (the 100 TB requirement for
  * unbounded streams). */
class WatermarkSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.from(Instant.parse(s))

  test("windowed counts with watermark: in-order, late-accepted, too-late-dropped") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val counts = input.toDF().toDF("ts", "event_type")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))

    val q = counts.writeStream.format("memory").queryName("wm")
      .outputMode(OutputMode.Append()).start()

    // batch 1: two events in hour 10, watermark advances to 10:50
    input.addData((ts("2024-01-01T10:05:00Z"), "click"),
      (ts("2024-01-01T11:00:00Z"), "click"))
    q.processAllAvailable()
    // hour-10 window not yet final (watermark 10:50 < 11:00 close)

    // batch 2: a LATE hour-10 event still inside the watermark, then an
    // event far ahead that pushes the watermark past the window close
    input.addData((ts("2024-01-01T10:20:00Z"), "click"))
    q.processAllAvailable()
    input.addData((ts("2024-01-01T13:00:00Z"), "view"))
    q.processAllAvailable()

    // batch 3: an event for hour 10 arriving AFTER the watermark passed
    // the window close — must be dropped from state
    input.addData((ts("2024-01-01T10:40:00Z"), "click"))
    q.processAllAvailable()
    input.addData((ts("2024-01-01T15:00:00Z"), "view")) // flush more windows
    q.processAllAvailable()
    q.stop()

    val out = spark.table("wm")
      .select(col("ws").cast("string"), col("event_type"), col("n"))
      .as[(String, String, Long)].collect().toSet
    // hour-10 window finalized with BOTH the on-time and the
    // inside-watermark late event (2), NOT the too-late third (would be 3)
    assert(out.contains(("2024-01-01 10:00:00", "click", 2L)),
      s"got $out")
    assert(!out.exists { case (w, t, n) => w == "2024-01-01 10:00:00" && n == 3L })
  }

  test("sliding windows stream: overlap factor 2 under a watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val q = graft.operators.Events.slidingWindows(
        in.toDF().toDF("event_id", "ts", "event_type")
          .withWatermark("ts", "10 minutes"))
      .writeStream.format("memory").queryName("slidestream")
      .outputMode(OutputMode.Append()).start()
    in.addData((1L, ts("2024-01-01T10:05:00Z"), "a"),
      (2L, ts("2024-01-01T10:40:00Z"), "a"))
    q.processAllAvailable()
    // advance the watermark past every member window's end (11:10)
    in.addData((3L, ts("2024-01-01T12:00:00Z"), "a"))
    q.processAllAvailable()
    in.addData((4L, ts("2024-01-01T13:00:00Z"), "a"))
    q.processAllAvailable()
    q.stop()
    val w = spark.table("slidestream")
      .select(col("window_start").cast("string"), col("n"))
      .as[(String, Long)].collect().toMap
    assert(w.view.filterKeys(_ < "2024-01-01 11:00:00").toMap == Map(
      "2024-01-01 09:30:00" -> 1L, "2024-01-01 10:00:00" -> 2L,
      "2024-01-01 10:30:00" -> 1L),
      s"each event lands in exactly 2 closed windows, got $w")
  }
}
