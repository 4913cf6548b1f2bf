package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Lifecycle contract of the persist-tracking registry (ADVICE r5):
  * operators register every internal persist; releaseAll() empties the
  * executor cache so a long-lived session does not accumulate one
  * entry per library call. */
class CachesSpec extends SparkTestBase {

  private def docs = {
    import spark.implicits._
    Seq((1L, "the quick brown fox jumps"),
        (2L, "the quick brown fox leaps"),
        (3L, "completely different text here"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
  }

  test("operator-internal persists are tracked and releasable") {
    Caches.releaseAll(blocking = true) // clean slate
    val before = spark.sparkContext.getPersistentRDDs.size
    // minhashPairs + simhashPairs each persist one intermediate
    Dedup.minhashPairs(docs).count()
    Dedup.simhashPairs(docs).count()
    assert(Caches.liveCount >= 2)
    assert(spark.sparkContext.getPersistentRDDs.size > before)
    val released = Caches.releaseAll(blocking = true)
    assert(released >= 2)
    assert(spark.sparkContext.getPersistentRDDs.size <= before)
    assert(Caches.liveCount == 0)
  }

  test("releaseAll is idempotent and safe before any action") {
    Caches.releaseAll(blocking = true)
    assert(Caches.releaseAll() == 0)
    // Since r19 minhashPairs is a staged artifact: a repeat call is a
    // pure read-back that tracks nothing new, so release has nothing
    // to drain — the invariants are that it never throws at ANY count
    // and the released/read-back plan still computes.
    val pairs = Dedup.minhashPairs(docs)
    assert(Caches.releaseAll(blocking = true) >= 0)
    assert(pairs.count() >= 0)
    Caches.releaseAll(blocking = true)
  }
}
