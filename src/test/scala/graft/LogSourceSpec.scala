package graft

import org.apache.spark.sql.functions._

import graft.sources.LogSource

/** S2 source invariants: nanosecond read fidelity and the deterministic
  * RouterMessage derivation contract the oracle depends on. */
class LogSourceSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val events = LogSource.readEvents(spark, "/root/testdata/sf0.001")
  private lazy val rm = LogSource.asRouterMessages(events)

  test("readEvents needs no session conf and yields µs timestamps") {
    // µs truncation: every ts must round-trip through unix_micros exactly
    val bad = events.filter(
      expr("timestamp_micros(unix_micros(ts))") =!= col("ts")).count()
    assert(bad == 0L)
    assert(events.count() == 1000L)
  }

  test("derivation is 1:1, deterministic, and schema-complete") {
    assert(rm.count() == events.count())
    assert(rm.columns.toSeq == Seq("data", "time", "source", "containerId",
      "containerName", "image", "hostname", "labels", "event_id"))
    val a = rm.orderBy("event_id").collect()
    val b = LogSource.asRouterMessages(events).orderBy("event_id").collect()
    assert(a.sameElements(b))
  }

  test("derived fields honor their reference shapes") {
    // containerName carries Docker's leading slash (go :234 strips it)
    assert(rm.filter(not(col("containerName").startsWith("/"))).count() == 0L)
    // containerId is 32-hex (md5), source is stdout/stderr
    assert(rm.filter(length(col("containerId")) =!= 32).count() == 0L)
    assert(rm.filter(not(col("source").isin("stdout", "stderr"))).count() == 0L)
    // every-7th user has an empty labels map (omitempty path exercised)
    assert(rm.filter(size(col("labels")) === 0).count() > 0L)
    // one in three images is tagless (empty-tag omitempty path)
    assert(rm.filter(not(col("image").contains(":"))).count() > 0L)
  }
}
