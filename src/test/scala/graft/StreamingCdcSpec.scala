package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingCdc

/** Top-level so the encoder needs no outer-instance scope (Spark can't
  * instantiate spec-inner case classes inside flatMapGroupsWithState's
  * object deserializer). */
case class CdcEv(event_id: Long, ts: Timestamp, user_id: Long,
                 event_type: String, value: java.lang.Double)

/** Streaming CDC compaction (StreamingCdc.scala): head-per-key
  * maintenance across triggers, late-row suppression, tombstone
  * retention — and the differential: replaying the emission log and
  * keeping each key's last upsert must equal batch cdcApply exactly. */
class StreamingCdcSpec extends SparkTestBase {
  import spark.implicits._

  private def ev(id: Long, us: Long, uid: Long, tpe: String, v: Double) =
    CdcEv(id, new Timestamp(us / 1000), uid, tpe, v)
  // NOTE Timestamp(ms) keeps µs%1000==0 inputs exact; all fixtures use ms grain

  test("streaming head-per-key replays to the batch cdcApply result") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CdcEv]
    val out = StreamingCdc.latestPerKey(input.toDF())
    val q = out.writeStream.format("memory").queryName("scdc")
      .outputMode("update").start()

    val b1 = Seq(ev(1, 100000000L, 1, "signup", 1.0),
      ev(2, 300000000L, 2, "view", 2.0))
    val b2 = Seq(ev(3, 200000000L, 1, "view", 3.0), // newer for user 1
      ev(4, 400000000L, 2, "error", 0.0), //          tombstone for user 2
      ev(5, 150000000L, 3, "click", 4.0))
    val b3 = Seq(ev(6, 500000000L, 2, "view", 5.0), // resurrects user 2
      ev(7, 120000000L, 1, "view", 9.0)) //           LATE for user 1: no emit
    input.addData(b1); q.processAllAvailable()
    input.addData(b2); q.processAllAvailable()
    input.addData(b3); q.processAllAvailable()
    q.stop()

    val emissions = spark.table("scdc")
    // late row (event 7) must not have produced an emission
    assert(emissions.filter(col("last_event_id") === 7L).count() == 0)

    // replay: last emission per key, drop tombstone heads
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id")
      .orderBy(col("last_us").desc, col("last_event_id").desc)
    val replayed = emissions
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .filter(!col("tombstone"))
      .select("user_id", "last_us", "last_event_id", "last_type",
        "last_value_micro")

    val batch = graft.operators.Lifecycle.cdcApply(
      (b1 ++ b2 ++ b3).toDF())
    assert(replayed.orderBy("user_id").collect().toSeq ==
      batch.collect().toSeq,
      "streaming emission log replay must equal the batch compaction")
  }

  test("a tombstone head survives in state and blocks older upserts") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CdcEv]
    val out = StreamingCdc.latestPerKey(input.toDF())
    val q = out.writeStream.format("memory").queryName("scdc2")
      .outputMode("update").start()
    input.addData(Seq(ev(1, 200000000L, 1, "error", 0.0)))
    q.processAllAvailable()
    // older upsert arrives after the tombstone: head must NOT move
    input.addData(Seq(ev(2, 100000000L, 1, "view", 1.0)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("scdc2")
      .select("last_event_id", "tombstone").as[(Long, Boolean)]
      .collect().toSeq
    assert(rows == Seq((1L, true)), "one emission: the tombstone head")
  }
}
