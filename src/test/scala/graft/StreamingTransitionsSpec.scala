package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.streaming.StreamingTransitions

/** Top-level for the same encoder reason as CdcEv. */
case class TrEv(event_id: Long, ts: Timestamp, user_id: Long,
                event_type: String)

/** Streaming Markov transitions (StreamingTransitions.scala): pair
  * emission across triggers with one fixed-size head per user, late
  * rows dropped — and the differential: the emitted pair multiset must
  * equal the batch lead-window derivation when events arrive per-user
  * in event-time order. */
class StreamingTransitionsSpec extends SparkTestBase {
  import spark.implicits._

  private def ev(id: Long, us: Long, uid: Long, tpe: String) =
    TrEv(id, new Timestamp(us / 1000), uid, tpe)

  test("cross-trigger transitions equal the batch lead-window pairs") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TrEv]
    val out = StreamingTransitions.transitions(input.toDF())
    val q = out.writeStream.format("memory").queryName("strans")
      .outputMode("append").start()

    val b1 = Seq(ev(1, 100000000L, 1, "view"), ev(2, 200000000L, 1, "click"),
      ev(3, 100000000L, 2, "signup"))
    val b2 = Seq(ev(4, 300000000L, 1, "purchase"), // crosses trigger: click->purchase
      ev(5, 250000000L, 2, "view"))
    val b3 = Seq(ev(6, 400000000L, 2, "click"))
    input.addData(b1); q.processAllAvailable()
    input.addData(b2); q.processAllAvailable()
    input.addData(b3); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("strans")
      .select("user_id", "src", "dst", "us")
      .orderBy("user_id", "us").collect().toSeq

    val all = (b1 ++ b2 ++ b3).toDF()
    val batch = all
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .withColumn("src", lag(col("event_type"), 1).over(
        Window.partitionBy("user_id")
          .orderBy(col("us"), col("event_id"))))
      .filter(col("src").isNotNull)
      .select(col("user_id"), col("src"), col("event_type").as("dst"),
        col("us"))
      .orderBy("user_id", "us").collect().toSeq
    assert(streamed == batch,
      "streaming pair emissions must equal the batch lead-window pairs")
  }

  test("a late row emits nothing and does not move the head") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TrEv]
    val out = StreamingTransitions.transitions(input.toDF())
    val q = out.writeStream.format("memory").queryName("strans2")
      .outputMode("append").start()
    input.addData(Seq(ev(1, 200000000L, 1, "view")))
    q.processAllAvailable()
    // arrives after, but event-time BEFORE the head: dropped
    input.addData(Seq(ev(2, 100000000L, 1, "signup")))
    q.processAllAvailable()
    // next in-order event chains from "view", not "signup"
    input.addData(Seq(ev(3, 300000000L, 1, "click")))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("strans2")
      .select("src", "dst").as[(String, String)].collect().toSeq
    assert(rows == Seq(("view", "click")))
  }

  test("state is one head per user: a second user does not interleave") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TrEv]
    val out = StreamingTransitions.transitions(input.toDF())
    val q = out.writeStream.format("memory").queryName("strans3")
      .outputMode("append").start()
    input.addData(Seq(ev(1, 100000000L, 1, "view"),
      ev(2, 150000000L, 2, "signup"),
      ev(3, 200000000L, 1, "click")))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("strans3")
      .select("user_id", "src", "dst").as[(Long, String, String)]
      .collect().toSeq.sorted
    assert(rows == Seq((1L, "view", "click")))
  }
}
