package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Dedup
import graft.streaming.StreamingNearDup

/** Streaming LSH near-dup: the stateful band-bucket operator must find
  * exactly the candidate pairs the batch minhash tier finds — including
  * pairs whose members arrive in DIFFERENT triggers (the whole point of
  * the state), and nothing during a trigger with no near-dups. */
class StreamingNearDupSpec extends SparkTestBase {
  import spark.implicits._

  private val batch1 = Seq(
    TwinDoc(1L, "alpha beta gamma delta epsilon zeta eta theta"),
    TwinDoc(3L, "the quick brown fox jumps over the lazy dog today"),
    TwinDoc(5L, "completely different content about something else entirely"))
  private val batch2 = Seq(
    TwinDoc(2L, "alpha beta gamma delta epsilon zeta eta theta"),
    TwinDoc(4L, "the quick brown fox jumps over the lazy dog tonight"),
    TwinDoc(6L, "yet another unrelated document with its own words"))

  /** Batch-tier reference: est-gated candidate pairs with their lane
    * agreement, from the same composed operators the batch gate runs. */
  private def reference(): Map[(Long, Long), (Long, Long)] = {
    val all = (batch1 ++ batch2).toDF()
    val sigs = Caches.track(Dedup.signatures(all))
    val ref = Dedup.jaccardEstForPairs(sigs, Dedup.pairsFromSigs(sigs))
      .filter($"est_milli" >= 500)
      .as[(Long, Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    Caches.releaseAll()
    ref
  }

  private def runStream(ttlMs: Long): (Set[(Long, Long)],
      Map[(Long, Long), (Long, Long)], Long) = {
    implicit val sqlCtx = spark.sqlContext
    val name = s"neardup_$ttlMs"
    val input = MemoryStream[TwinDoc]
    // a streaming input must arm a bound (VERDICT r17 #3); the cap of
    // 64 is far above any fixture bucket, so behavior is unchanged
    val q = StreamingNearDup.nearDupStream(input.toDF(), stateTtlMs = ttlMs,
        maxBucketEntries = 64)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    input.addData(batch1: _*)
    q.processAllAvailable()
    val afterFirst = spark.table(name).count()
    input.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()
    val rows = spark.table(name)
      .as[(Long, Long, Long, Long)].collect()
    (rows.map(t => (t._1, t._2)).toSet,
      rows.map(t => (t._1, t._2) -> (t._3, t._4)).toMap, afterFirst)
  }

  test("cross-trigger candidates: streamed set ≡ batch est-gated pairs") {
    val ref = reference()
    val (pairs, vals, afterFirst) = runStream(ttlMs = 0L)
    // batch1's three docs are mutually unrelated — first trigger silent
    assert(afterFirst == 0L, "unrelated batch must emit no candidates")
    // every reference pair spans the two triggers, so every hit proves
    // the bucket state carried across batches
    assert(pairs == ref.keySet,
      s"streamed $pairs != batch reference ${ref.keySet}")
    assert(pairs.contains((1L, 2L)), "identical pair must be found")
    // matches / est_milli agree with the batch estimator per pair
    pairs.foreach { p =>
      assert(vals(p) == ref(p), s"$p: ${vals(p)} != ${ref(p)}")
    }
    // pairs sharing several bands emit once per band (documented):
    // table rows >= distinct pairs, equality after distinct
    assert(spark.table("neardup_0").count() >= pairs.size)
  }

  test("armed TTL path (batch execution) changes nothing") {
    // the stateTtlMs > 0 wiring — ProcessingTimeTimeout conf +
    // per-group setTimeoutDuration — exercised in batch execution,
    // where Spark defines timeouts as never firing. (A STREAMING run
    // with armed timeouts busy-spins empty timeout batches under the
    // default immediate trigger — the operator scaladoc directs
    // production streams to a paced trigger, which a unit spec can't
    // wait on deterministically.)
    val ref = reference()
    val got = StreamingNearDup
      .nearDupStream((batch1 ++ batch2).toDF(), stateTtlMs = 3600L * 1000L)
      .collect().map(c => (c.doc_a, c.doc_b)).toSet
    assert(got == ref.keySet,
      "an armed-but-unexpired TTL must not alter the candidate set")
  }

  test("maxBucketEntries caps the per-bucket lookback: evicted docs " +
      "no longer pair with later arrivals") {
    val same = Seq(
      TwinDoc(1L, "alpha beta gamma delta epsilon zeta"),
      TwinDoc(2L, "alpha beta gamma delta epsilon zeta"),
      TwinDoc(3L, "alpha beta gamma delta epsilon zeta"))
    def pairsWith(cap: Int): Set[(Long, Long)] =
      StreamingNearDup.nearDupStream(same.toDF(),
          maxBucketEntries = cap)
        .collect().map(c => (c.doc_a, c.doc_b)).toSet
    assert(pairsWith(0) == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(pairsWith(1) == Set((1L, 2L), (2L, 3L)),
      "cap 1 must evict doc 1 before doc 3 arrives")
    Caches.releaseAll()
  }

  test("streaming input without a state bound is refused; a non-divisor " +
      "band count is refused (VERDICT r17 #3, ADVICE r17 #1/#4)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TwinDoc]
    val err = intercept[IllegalArgumentException] {
      StreamingNearDup.nearDupStream(input.toDF())
    }
    assert(err.getMessage.contains("bound its state"))
    // bands = 3 would leave 16 mod 3 = 1 signature lane out of every
    // band key — refused rather than silently losing recall
    val geo = intercept[IllegalArgumentException] {
      StreamingNearDup.nearDupStream(batch1.toDF(), bands = 3)
    }
    assert(geo.getMessage.contains("divide"))
  }

  test("batch mode: same operator, same candidates as the batch tier") {
    val ref = reference()
    val got = StreamingNearDup.nearDupStream((batch1 ++ batch2).toDF())
      .collect()
      .map(c => (c.doc_a, c.doc_b) -> (c.matches, c.est_milli)).toMap
    assert(got.keySet == ref.keySet)
    got.foreach { case (p, v) => assert(ref(p) == v, s"$p: $v != ${ref(p)}") }
  }
}
