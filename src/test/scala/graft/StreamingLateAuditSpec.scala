package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.streaming.StreamingLateAudit

/** Top-level for the same encoder reason as CdcEv. */
case class LaEv(event_id: Long, ts: Timestamp, user_id: Long)

/** Streaming late-data measurement (StreamingLateAudit.scala): one µs
  * head per user, per-event lateness emitted across triggers — and the
  * differential: the emitted lateness multiset must equal the batch
  * lateDataAudit derivation (running max over arrival order). */
class StreamingLateAuditSpec extends SparkTestBase {
  import spark.implicits._

  private def ev(id: Long, us: Long, uid: Long) =
    LaEv(id, new Timestamp(us / 1000), uid)

  test("cross-trigger lateness equals the batch running-max derivation") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[LaEv]
    val out = StreamingLateAudit.lateness(input.toDF())
    val q = out.writeStream.format("memory").queryName("slate")
      .outputMode("append").start()

    val b1 = Seq(ev(1, 100000000L, 1), ev(2, 300000000L, 1),
      ev(3, 50000000L, 2))
    val b2 = Seq(ev(4, 200000000L, 1), // late by 100s vs head 300s
      ev(5, 400000000L, 2))
    val b3 = Seq(ev(6, 250000000L, 1)) // still late: head stays 300s
    input.addData(b1); q.processAllAvailable()
    input.addData(b2); q.processAllAvailable()
    input.addData(b3); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("slate")
      .select("user_id", "event_id", "late_us")
      .orderBy("event_id").collect().toSeq

    val all = (b1 ++ b2 ++ b3).toDF()
    val w = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val batch = all
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("pm", max(col("us")).over(w))
      .select(col("user_id"), col("event_id"),
        when(col("pm").isNotNull && col("pm") > col("us"),
          col("pm") - col("us")).otherwise(lit(0L)).as("late_us"))
      .orderBy("event_id").collect().toSeq
    assert(streamed == batch,
      "streaming lateness emissions must equal the batch running-max pass")
  }

  test("state is one head per user; an in-order stream emits all zeros") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[LaEv]
    val out = StreamingLateAudit.lateness(input.toDF())
    val q = out.writeStream.format("memory").queryName("slate2")
      .outputMode("append").start()
    input.addData(Seq(ev(1, 100000000L, 1), ev(2, 150000000L, 2)))
    q.processAllAvailable()
    input.addData(Seq(ev(3, 200000000L, 1), ev(4, 250000000L, 2)))
    q.processAllAvailable()
    q.stop()
    val lates = spark.table("slate2").select("late_us").as[Long]
      .collect().toSeq
    assert(lates.size == 4 && lates.forall(_ == 0L))
  }
}
