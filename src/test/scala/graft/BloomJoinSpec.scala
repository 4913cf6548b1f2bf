package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomJoin

/** Bloom-prefiltered semi-join: exactness is differential against the
  * plain relational semi-join (the bloom must be invisible in the
  * result — only in the plan). */
class BloomJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("bloomPrunedSemiJoin == plain semi join (differential, dup keys)") {
    val big = (1L to 1000L).map(i => (i, i % 97)).toDF("id", "k")
    val keys = Seq(3L, 3L, 7L, 50L).toDF("k") // dup keys tolerated
    val got = BloomJoin.bloomPrunedSemiJoin(big, keys, "k", 100L)
      .select("id").as[Long].collect().toSet
    val want = big.join(keys.distinct(), Seq("k"), "left_semi")
      .select("id").as[Long].collect().toSet
    assert(got == want)
    assert(got.nonEmpty && got.size < 1000, "filter must be selective here")
  }

  test("empty key set yields empty result (null bloom filters all rows)") {
    val big = (1L to 10L).toDF("k")
    val keys = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      big.schema)
    assert(BloomJoin.bloomPrunedSemiJoin(big, keys, "k", 10L).count() == 0)
  }

  test("plan: might_contain prefilter runs under the LeftSemi join") {
    val big = (1L to 100L).toDF("k")
    val keys = Seq(1L, 2L).toDF("k")
    val p = BloomJoin.bloomPrunedSemiJoin(big, keys, "k", 10L)
      .queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), s"bloom prefilter missing:\n$p")
    assert(p.contains("LeftSemi"), s"exactness join missing:\n$p")
  }

  test("bloomFpr: a 1-bit filter is saturated — every probe false-" +
    "positive; member keys never count as probes") {
    val members = (1L to 10L).toDF("key")
    val probes = (5L to 20L).toDF("key") // 5..10 overlap → excluded
    val r = BloomJoin.bloomFpr(members, probes, mBits = 1, kLanes = 3)
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    assert(r == ((1L, 3L, 10L, 1L, 10L, 10L, 1000000L)))
    Caches.releaseAll()
  }

  test("bloomFpr: a wide filter on few keys measures a near-zero rate " +
    "and a load of ≤ n·k bits") {
    val members = (1L to 10L).toDF("key")
    val probes = (100L to 1099L).toDF("key")
    val (m, k, nKeys, bitsSet, nProbes, fp, ppm) =
      BloomJoin.bloomFpr(members, probes, mBits = 1 << 20, kLanes = 3)
        .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    assert((m, k, nKeys, nProbes) == ((1048576L, 3L, 10L, 1000L)))
    assert(bitsSet <= 30L && bitsSet > 0L)
    assert(fp == 0L && ppm == 0L,
      "30 bits in 2^20 cannot triple-collide a probe (deterministic md5)")
    Caches.releaseAll()
  }
}
