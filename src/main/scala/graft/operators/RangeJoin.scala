package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Range (interval-containment) join — match each event to the
  * intervals containing its timestamp. A naive `ts BETWEEN start AND
  * end` join has no equi-key, so Spark must fall back to a broadcast
  * nested-loop join: fine for a small interval table, quadratic death
  * at scale. The scale path is BUCKETING: quantize time into buckets
  * no larger than the minimum interval length, replicate each interval
  * into every bucket it overlaps (a bounded constant per interval),
  * equi-join on the bucket, then apply the exact containment filter.
  * The big side flows through one hash shuffle on its bucket — the
  * same cost profile as any equi-join — and the exact predicate only
  * runs on bucket-collocated candidates.
  */
object RangeJoin {

  /** events(ts) ⋈ intervals(start_ts, end_ts), containment
    * `start_ts <= ts < end_ts`, bucketed at `bucketSec`. */
  def bucketedRangeJoin(events: DataFrame, intervals: DataFrame,
                        bucketSec: Long): DataFrame = {
    require(bucketSec > 0, s"bucketSec must be positive, got $bucketSec")
    require(!events.columns.contains("__bucket")
      && !intervals.columns.contains("__bucket"),
      "inputs must not contain a __bucket column")
    val bUs = bucketSec * 1000000L
    val ev = events.withColumn("__bucket",
      floor(unix_micros(col("ts")) / bUs))
    val iv = intervals.withColumn("__bucket",
      explode(sequence(floor(unix_micros(col("start_ts")) / bUs),
        floor((unix_micros(col("end_ts")) - 1) / bUs))))
    ev.join(iv, Seq("__bucket"))
      .filter(col("ts") >= col("start_ts") && col("ts") < col("end_ts"))
      .drop("__bucket")
  }

  /** Interval-OVERLAP join — both sides are intervals (µs bounds
    * `[lo, hi]`, inclusive), matched when they overlap:
    * `a_lo <= b_hi && b_lo <= a_hi`. Same bucketing scale path as the
    * containment join — each interval replicates into the buckets it
    * covers, candidates meet on a bucket equi-join — plus the
    * FIRST-OVERLAP-BUCKET trick: a pair sharing several buckets would
    * otherwise need a `distinct()` (a full extra shuffle of the
    * result); instead each candidate is emitted only from the bucket
    * containing `greatest(a_lo, b_lo)` — the first bucket the two
    * intervals share — so the output is exactly-once BY CONSTRUCTION
    * and the plan has one shuffle, on the bucket key.
    *
    * Inputs: a(a_id, a_lo, a_hi), b(b_id, b_lo, b_hi); keep `bucketUs`
    * no larger than the minimum interval length so the replication
    * factor stays a small constant (the bucketedRangeJoin sizing
    * rule). */
  def intervalOverlapJoin(a: DataFrame, b: DataFrame,
                          bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive, got $bucketUs")
    // FLOOR division (the cohortRetention lesson): truncating `div`
    // would mis-bucket negative bounds; (x - pmod(x, d)) div d is the
    // exact integer floor on the full domain
    def fdiv(x: String) = s"(($x - pmod($x, $bucketUs)) div $bucketUs)"
    val ab = a.withColumn("__bucket",
      explode(sequence(expr(fdiv("a_lo")), expr(fdiv("a_hi")))))
    val bb = b.withColumn("__bucket",
      explode(sequence(expr(fdiv("b_lo")), expr(fdiv("b_hi")))))
    ab.join(bb, Seq("__bucket"))
      .filter(col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      .filter(col("__bucket") === expr(fdiv("greatest(a_lo, b_lo)")))
      .drop("__bucket")
  }

  /** Deterministic plan-time campaign windows over the events month:
    * campaign k = [Jan 1 2024 + 3k days, +36 h). */
  def campaigns(s: SparkSession, n: Int = 10): DataFrame = {
    val day0Us = 1704067200000000L // 2024-01-01T00:00:00Z in µs
    s.range(n).select(col("id").as("campaign_id"),
      timestamp_micros(lit(day0Us) + col("id") * lit(259200000000L))
        .as("start_ts"),
      timestamp_micros(lit(day0Us) + col("id") * lit(259200000000L)
        + lit(129600000000L)).as("end_ts"))
  }

  /** Per-campaign event stats via the bucketed range join (12 h
    * buckets ≤ the 36 h interval length → ≤ 4 replicas/interval). */
  def campaignStats(events: DataFrame): DataFrame =
    bucketedRangeJoin(events,
        campaigns(events.sparkSession), bucketSec = 12L * 3600L)
      .groupBy("campaign_id")
      .agg(count(lit(1)).as("n"),
        min("event_id").as("min_eid"), max("event_id").as("max_eid"))
}
