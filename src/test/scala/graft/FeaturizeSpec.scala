package graft

import org.apache.spark.sql.functions._

import graft.operators.Featurize

/** Gates for RFM segmentation, the varint storage estimator, and
  * blocked record linkage. */
class FeaturizeSpec extends SparkTestBase {
  import spark.implicits._

  private val day = 86400000000L // µs

  private def events(rows: (Long, Long, Long, Double)*) =
    rows.toDF("event_id", "ts_us", "user_id", "value")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")

  // ---- rfmSegments -------------------------------------------------

  test("rfmSegments: recency flips (small r = score 5), ties share scores") {
    // 5 users, one event each on days 0..4, identical value →
    // f and m are constant (all users share f_score = m_score = 1);
    // r spreads 0..4 → r_scores 1..5, flipped so day-4 user scores 5.
    val ev = events((0 until 5).map(u =>
      (u.toLong, u * day, u.toLong, 1.0)): _*)
    val r = Featurize.rfmSegments(ev).as[(Long, Long)].collect().toMap
    assert(r == Map(111L -> 1L, 211L -> 1L, 311L -> 1L, 411L -> 1L,
      511L -> 1L))
  }

  // ---- varintEstimate ----------------------------------------------

  test("varintEstimate: first event pays the absolute, gaps pay varints") {
    // user 1: events at t = 2^35 µs and +127 µs: absolute needs
    // ceil(36/7) = 6 bytes, gap 127 → bin length 7 → 1 byte.
    val t0 = 1L << 35
    val ev = events((1L, t0, 1L, 0.0), (2L, t0 + 127L, 1L, 0.0))
    val r = Featurize.varintEstimate(ev)
      .as[(Long, Long, Long, Long)].collect().head
    assert(r == ((2L, 16L, 7L, 437500L)))
  }

  // ---- recordLinkage -----------------------------------------------

  test("recordLinkage: perturbed copies match within their block at dist<=2") {
    val cust = Seq(
      (3L, "Customer#003", 1, 500.0), // %3==0 → name degraded by 1 char
      (4L, "Customer#004", 1, 500.0), // unchanged → dist 0 match
      (5L, "Customer#005", 2, 500.0)  // different nation → own block
    ).toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    val r = Featurize.recordLinkage(cust, Featurize.degradeCustomers(cust))
      .as[(Long, Long, Int)].collect().toSeq
    // within block (nat 1, band 5) ALL four cross pairs land ≤ 2 —
    // near-identical synthetic names differ by one digit (dist 1) or a
    // digit + the dropped char (dist 2); the operator reports every
    // candidate with its distance and leaves disambiguation (min-dist
    // per id) to the caller. 5↔deg5 matches alone in its own block.
    assert(r == Seq((3L, 1000003L, 1), (3L, 1000004L, 1),
      (4L, 1000003L, 2), (4L, 1000004L, 0), (5L, 1000005L, 0)))
  }

  test("degradeCustomers: every third name is one char shorter, keys offset") {
    val cust = Seq(
      (3L, "ABCDEFGH", 1, 0.0), (4L, "ABCDEFGH", 1, 0.0))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    val d = Featurize.degradeCustomers(cust)
      .select("d_id", "c_name").as[(Long, String)].collect().toMap
    assert(d(1000003L).length == 7 && d(1000003L) == "ABCEFGH") // 3%7=3 → drop pos 4 ('D')
    assert(d(1000004L) == "ABCDEFGH")
  }
}
