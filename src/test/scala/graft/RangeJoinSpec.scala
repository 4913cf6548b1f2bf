package graft

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Bucketed range join: equals the naive containment join, boundary
  * semantics [start, end), bounded interval replication. */
class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.from(Instant.parse(s))

  test("bucketed join equals the naive BETWEEN join; boundaries are [start, end)") {
    val events = Seq(
      (1L, ts("2024-01-01T00:00:00Z")),  // == start of interval A -> in
      (2L, ts("2024-01-01T11:59:59Z")),  // inside A
      (3L, ts("2024-01-01T12:00:00Z")),  // == end of A -> out; == start of B -> in
      (4L, ts("2024-01-02T00:00:00Z")))  // outside both
      .toDF("event_id", "ts")
    val intervals = Seq(
      ("A", ts("2024-01-01T00:00:00Z"), ts("2024-01-01T12:00:00Z")),
      ("B", ts("2024-01-01T12:00:00Z"), ts("2024-01-01T18:00:00Z")))
      .toDF("interval_id", "start_ts", "end_ts")
    val bucketed = RangeJoin.bucketedRangeJoin(events, intervals, 3600L)
      .select("event_id", "interval_id").as[(Long, String)].collect().toSet
    val naive = events.join(intervals,
        col("ts") >= col("start_ts") && col("ts") < col("end_ts"))
      .select("event_id", "interval_id").as[(Long, String)].collect().toSet
    assert(bucketed == naive)
    assert(bucketed == Set((1L, "A"), (2L, "A"), (3L, "B")))
  }

  test("interval replication is bounded by ceil(length/bucket) buckets") {
    val intervals = Seq(("A", ts("2024-01-01T00:00:00Z"),
      ts("2024-01-02T12:00:00Z"))).toDF("interval_id", "start_ts", "end_ts")
    // 36 h interval, 12 h buckets -> exactly 3 replicas
    val replicas = intervals.withColumn("__bucket",
        explode(sequence(
          floor(unix_micros(col("start_ts")) / (12L * 3600 * 1000000L)),
          floor((unix_micros(col("end_ts")) - 1) / (12L * 3600 * 1000000L)))))
      .count()
    assert(replicas == 3L)
  }

  test("intervalOverlapJoin == naive overlap join, exactly-once, negatives floored") {
    // crafted bounds: touching-at-endpoint (inclusive: overlaps),
    // disjoint-by-1µs, nested, multi-bucket spans, and NEGATIVE bounds
    // (the floor-division class the truncating div would mis-bucket)
    val a = Seq(
      (1L, 0L, 999L),            // touches b10's lo at 999
      (2L, 1000L, 4999L),        // spans several 1000-µs buckets
      (3L, -2500L, -1500L),      // fully negative
      (4L, 7000L, 7000L))        // degenerate point interval
      .toDF("a_id", "a_lo", "a_hi")
    val b = Seq(
      (10L, 999L, 2000L),        // touches a1, overlaps a2
      (11L, 2001L, 2001L),       // inside a2
      (12L, -2000L, -1000L),     // overlaps a3 across bucket -2/-1
      (13L, 5000L, 6999L))       // disjoint from everything by 1µs
      .toDF("b_id", "b_lo", "b_hi")
    val got = RangeJoin.intervalOverlapJoin(a, b, 1000L)
      .select("a_id", "b_id").as[(Long, Long)].collect()
    val naive = a.join(b,
        col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // exactly-once: no distinct() anywhere, yet no pair repeats even
    // when intervals share several buckets
    assert(got.length == got.toSet.size, "first-overlap-bucket must dedup")
    assert(got.toSet == naive)
    assert(got.toSet == Set((1L, 10L), (2L, 10L), (2L, 11L), (3L, 12L)))
  }

  test("intervalOverlapJoin property: random interval sets ≡ naive join (one Spark job)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // bounds spanning negative/positive across many bucket widths;
    // evaluated as ONE Spark job per side (the PropertySpec discipline)
    def sample[A](g: Gen[A], n: Int): Seq[A] =
      (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))
    val ivGen = for {
      lo <- Gen.choose(-50000L, 50000L)
      len <- Gen.choose(0L, 15000L)
    } yield (lo, lo + len)
    val as = sample(ivGen, 120).zipWithIndex
      .map { case ((lo, hi), i) => (i.toLong, lo, hi) }
      .toDF("a_id", "a_lo", "a_hi")
    val bs = sample(ivGen, 120).zipWithIndex
      .map { case ((lo, hi), i) => (1000L + i, lo, hi) }
      .toDF("b_id", "b_lo", "b_hi")
    Seq(1000L, 3777L, 60000L).foreach { bucket =>
      val got = RangeJoin.intervalOverlapJoin(as, bs, bucket)
        .select("a_id", "b_id").as[(Long, Long)].collect()
      val naive = as.join(bs,
          col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      assert(got.length == got.toSet.size,
        s"bucket=$bucket emitted a pair twice")
      assert(got.toSet == naive, s"bucket=$bucket diverged from naive")
    }
  }
}
