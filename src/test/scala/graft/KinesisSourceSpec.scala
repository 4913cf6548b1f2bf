package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.InMemoryKinesis

/** DSv2 connector: registration by short name (S1), one partition per
  * shard (S5), offset positioning (S6), engine-managed micro-batch
  * offsets (S7), per-fetch cap (S8). */
class KinesisSourceSpec extends SparkTestBase {
  import spark.implicits._

  private def fill(name: String, shards: Int, n: Int): Unit = {
    InMemoryKinesis.delete(name)
    InMemoryKinesis.create(name, shards)
    (0 until n).foreach { i =>
      InMemoryKinesis.tryPut(name, i % shards, s"k$i", s"rec-$i", block = false)
    }
  }

  test("S1/S5: format resolves by short name; one task per shard") {
    fill("dsv2", shards = 4, n = 100)
    val df = spark.read.format("graft-kinesis").option("stream", "dsv2").load()
    assert(df.count() == 100L)
    assert(df.rdd.getNumPartitions == 4, "one InputPartition per shard")
    assert(df.select(count_distinct(col("shard"))).as[Long].head() == 4L)
  }

  test("S6: startingSeq resumes mid-stream (AT_SEQUENCE_NUMBER analog)") {
    fill("dsv2-seq", shards = 2, n = 50)
    val df = spark.read.format("graft-kinesis")
      .option("stream", "dsv2-seq").option("startingSeq", 40).load()
    assert(df.count() == 10L)
    assert(df.agg(min("seq")).as[Long].head() == 40L)
  }

  test("S7: micro-batch stream delivers existing + late-arriving records") {
    fill("dsv2-stream", shards = 2, n = 30)
    val q = spark.readStream.format("graft-kinesis")
      .option("stream", "dsv2-stream").load()
      .writeStream.format("memory").queryName("dsv2out")
      .trigger(Trigger.ProcessingTime(50L)).start()
    q.processAllAvailable()
    assert(spark.table("dsv2out").count() == 30L)
    // records arriving AFTER the stream started are picked up (S7 poll)
    (30 until 40).foreach { i =>
      InMemoryKinesis.tryPut("dsv2-stream", i % 2, s"k$i", s"rec-$i", block = false)
    }
    q.processAllAvailable()
    q.stop()
    assert(spark.table("dsv2out").count() == 40L)
    assert(spark.table("dsv2out").select(count_distinct(col("seq")))
      .as[Long].head() == 40L, "no duplicates across micro-batches")
  }

  test("S6 streaming: startingOffsets=latest skips history") {
    fill("dsv2-latest", shards = 2, n = 20)
    val q = spark.readStream.format("graft-kinesis")
      .option("stream", "dsv2-latest").option("startingOffsets", "latest")
      .load()
      .writeStream.format("memory").queryName("dsv2latest")
      .trigger(Trigger.ProcessingTime(50L)).start()
    q.processAllAvailable()
    assert(spark.table("dsv2latest").count() == 0L, "history skipped")
    (20 until 25).foreach { i =>
      InMemoryKinesis.tryPut("dsv2-latest", i % 2, s"k$i", s"rec-$i", block = false)
    }
    q.processAllAvailable()
    q.stop()
    assert(spark.table("dsv2latest").count() == 5L)
  }
}
