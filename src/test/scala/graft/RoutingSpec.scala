package graft

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.Routing

/** S4/S3/S8/S6: shard routing entropy, scale-safe batching equivalence,
  * fetch limit, offset resume. */
class RoutingSpec extends SparkTestBase {
  import spark.implicits._

  test("shardFor populates ALL shards at numShards=64 (full-width hash)") {
    val keys = spark.range(10000)
      .select(md5(col("id").cast("string").cast("binary")).as("k"))
    val dist = keys.select(Routing.shardFor(col("k"), 64).as("s"))
      .groupBy("s").count().as[(Int, Long)].collect().toMap
    assert(dist.keySet == (0 until 64).toSet, "every shard populated")
    // uniformity: no shard more than 2x the mean
    assert(dist.values.max < 2 * 10000 / 64)
  }

  test("shardFor is in [0, n) and deterministic") {
    val r1 = Seq("a", "b", "c").toDF("k")
      .select(Routing.shardFor(col("k"), 4)).as[Int].collect().toSeq
    val r2 = Seq("a", "b", "c").toDF("k")
      .select(Routing.shardFor(col("k"), 4)).as[Int].collect().toSeq
    assert(r1 == r2)
    assert(r1.forall(s => s >= 0 && s < 4))
  }

  private def ts(s: String): Timestamp = Timestamp.from(Instant.parse(s))

  test("withBatchIds equals the naive global per-shard row_number") {
    // rows spanning several day-buckets with intra-day ties broken by id
    val rows = for {
      d <- 1 to 5; h <- Seq(0, 6, 12); i <- 0 to 3
    } yield (ts(f"2024-01-0$d%dT$h%02d:00:00Z"), (d * 100 + h * 10 + i).toLong,
      (i % 2))
    val df = rows.toDF("time", "event_id", "shard")
    val fast = Routing.withBatchIds(df, col("shard"), col("time"),
      col("event_id"), 7)
    val naiveW = Window.partitionBy(col("shard"))
      .orderBy(col("time"), col("event_id"))
    val naive = df.withColumn("seq_in_shard",
      row_number().over(naiveW).cast("long"))
      .withColumn("batch_id", expr("(seq_in_shard - 1) div 7").cast("long"))
    val a = fast.select("event_id", "seq_in_shard", "batch_id")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val b = naive.select("event_id", "seq_in_shard", "batch_id")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  test("fetchLimit returns the n smallest offsets (S8)") {
    val df = spark.range(1000).toDF("event_id")
    val got = Routing.fetchLimit(df, col("event_id"), 10)
      .as[Long].collect().toSeq
    assert(got == (0L until 10L))
  }

  test("resumeFrom filters below the offset (S6/S7)") {
    val df = spark.range(100).toDF("event_id")
    val got = Routing.resumeFrom(df, col("event_id"), 90)
    assert(got.count() == 10)
    assert(got.agg(min("event_id")).as[Long].head() == 90L)
  }

  test("rendezvousShards: growing k moves keys ONLY onto the new " +
    "shard; every old shard monotonically shrinks") {
    val docs = spark.range(2000).toDF("doc_id")
    val r = Routing.rendezvousShards(docs, k = 8)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(r.map(_._1) == (0L to 8L), "all k+1 shards populated")
    assert(r.map(_._2).sum == 2000L && r.map(_._3).sum == 2000L)
    r.filter(_._1 < 8L).foreach { case (s, nK, nK1, movedIn) =>
      assert(movedIn == 0L, s"old shard $s must receive no arrivals")
      assert(nK1 <= nK, s"old shard $s can only shrink")
    }
    val newRow = r.find(_._1 == 8L).get
    assert(newRow._2 == 0L, "new shard holds nothing at k")
    assert(newRow._3 == newRow._4 && newRow._4 > 0L,
      "every new-shard resident is an arrival")
    // HRW expectation: ~1/(k+1) of the corpus moves (modulo would
    // remap ~8/9); generous band for a 2000-key draw
    assert(newRow._4 > 2000L / 18 && newRow._4 < 2000L / 3)
  }
}
