package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Gates for the TPC-H-shape relational operators added in round 11's
  * second half (Q3/Q7/Q8/Q14/Q17/Q18/Q22 analogues): exact-cents
  * semantics on tiny frames plus the plan shapes that make each one
  * scale — TakeOrdered (never a global sort), broadcast dims, LeftSemi
  * / LeftAnti key-only joins, DECIMAL(38,0) ppm lanes. */
class TpchShapesSpec extends SparkTestBase {
  import spark.implicits._

  private val day = 86400000L // ms per day for Timestamp ctor

  // ---- shippingPriority (Q3) ---------------------------------------

  test("shippingPriority: cutoff filters both sides, segment prunes, top-k") {
    val cutoffDay = 100L
    val cutoffUs = cutoffDay * 86400000000L
    val li = Seq(
      (1L, 10.0, 0.0, new Timestamp(101L * day)), // ships after cutoff: in
      (1L, 5.0, 0.0, new Timestamp(99L * day)),   // ships before: out
      (2L, 100.0, 0.0, new Timestamp(102L * day)),// order 2: wrong segment
      (3L, 7.0, 0.5, new Timestamp(103L * day))   // 350 cents
    ).toDF("l_orderkey", "l_extendedprice", "l_discount", "l_shipdate")
    val ord = Seq(
      (1L, 5L, new Timestamp(90L * day)),
      (2L, 6L, new Timestamp(91L * day)),
      (3L, 5L, new Timestamp(92L * day)),
      (4L, 5L, new Timestamp(101L * day)) // ordered after cutoff: out
    ).toDF("o_orderkey", "o_custkey", "o_orderdate")
    val cust = Seq((5L, "BUILDING"), (6L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
    val r = Relational.shippingPriority(li, ord, cust, "BUILDING", cutoffUs, 10)
      .as[(Long, Long, Long)].collect().toSeq
    assert(r == Seq((1L, 90L, 1000L), (3L, 92L, 350L)))
  }

  // (TakeOrdered plan-shape asserts for shippingPriority / largeOrders
  // live in PlansSpec at sf0.001 — on literal frames smaller than k,
  // Catalyst legitimately eliminates the Limit, so the shape can only
  // be asserted against fixture-sized input.)

  // ---- promoRevenue (Q14) ------------------------------------------

  test("promoRevenue: conditional cents + exact ppm share") {
    val li = Seq((1L, 10.0, 0.0), (2L, 30.0, 0.0))
      .toDF("l_partkey", "l_extendedprice", "l_discount")
    val part = Seq((1L, "PROMO"), (2L, "STANDARD")).toDF("p_partkey", "p_type")
    val r = Relational.promoRevenue(li, part)
      .as[(Long, Long, Long)].collect().head
    assert(r == ((1000L, 4000L, 250000L))) // 25% = 250000 ppm exactly
  }

  test("promoRevenue: part joins as a broadcast") {
    val li = Seq((1L, 10.0, 0.0)).toDF("l_partkey", "l_extendedprice", "l_discount")
    val part = Seq((1L, "PROMO")).toDF("p_partkey", "p_type")
    val plan = Relational.promoRevenue(li, part)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "part must broadcast")
  }

  // ---- volumeShipping (Q7) -----------------------------------------

  test("volumeShipping: pairs are directional, same-nation flows drop") {
    val li = Seq(
      (1L, 10L, 10.0, 0.0, new Timestamp(400L * day)), // year bucket 1
      (2L, 11L, 20.0, 0.0, new Timestamp(30L * day))   // same nation: out
    ).toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
      "l_shipdate")
    val ord = Seq((1L, 5L), (2L, 6L)).toDF("o_orderkey", "o_custkey")
    val cust = Seq((5L, 1), (6L, 2)).toDF("c_custkey", "c_nationkey")
    val supp = Seq((10L, 2), (11L, 2)).toDF("s_suppkey", "s_nationkey")
    val nat = Seq((1, "FRANCE"), (2, "KENYA")).toDF("n_nationkey", "n_name")
    val r = Relational.volumeShipping(li, ord, cust, supp, nat)
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(r == Seq(("KENYA", "FRANCE", 1L, 1L, 1000L)))
  }

  // ---- marketShare (Q8) --------------------------------------------

  test("marketShare: region scopes the market, target share is exact ppm") {
    val li = Seq(
      (1L, 10L, 30.0, 0.0, new Timestamp(10L * day)), // target supplier
      (2L, 11L, 10.0, 0.0, new Timestamp(11L * day)), // rival supplier
      (3L, 10L, 99.0, 0.0, new Timestamp(12L * day))  // customer outside region
    ).toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
      "l_shipdate")
    val ord = Seq((1L, 5L), (2L, 5L), (3L, 6L)).toDF("o_orderkey", "o_custkey")
    val cust = Seq((5L, 1), (6L, 2)).toDF("c_custkey", "c_nationkey")
    val supp = Seq((10L, 3), (11L, 4)).toDF("s_suppkey", "s_nationkey")
    val nat = Seq((1, "IN_REGION", 0), (2, "ELSEWHERE", 1),
      (3, "TARGET", 1), (4, "RIVAL", 1))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val reg = Seq((0, "ASIA"), (1, "EUROPE")).toDF("r_regionkey", "r_name")
    val r = Relational.marketShare(li, ord, cust, supp, nat, reg,
        "ASIA", "TARGET")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq((0L, 3000L, 4000L, 750000L))) // 75% exactly
  }

  // ---- smallQtyRevenue (Q17) ---------------------------------------

  test("smallQtyRevenue: strict below-20%-of-part-average, exact cross-mul") {
    // part 1: quantities 1 and 49 → avg 25, threshold 5: only qty 1 is in.
    // part 2: quantities 10,10 → threshold 2: nothing qualifies.
    val li = Seq(
      (1L, 1.0, 100.0), (1L, 49.0, 999.0),
      (2L, 10.0, 50.0), (2L, 10.0, 50.0)
    ).toDF("l_partkey", "l_quantity", "l_extendedprice")
    val part = Seq((1L, "Brand#1"), (2L, "Brand#2")).toDF("p_partkey", "p_brand")
    val r = Relational.smallQtyRevenue(li, part)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(r == Seq(("Brand#1", 1L, 10000L, 1428L)))
  }

  // ---- largeOrders (Q18) -------------------------------------------

  test("largeOrders: HAVING threshold is strict; top-k by order value") {
    val li = Seq(
      (1L, 100.0), (1L, 51.0), // order 1: 151 qty → in
      (2L, 150.0),             // order 2: exactly 150 → strict >: out
      (3L, 200.0)              // order 3: in
    ).toDF("l_orderkey", "l_quantity")
    val ord = Seq(
      (1L, 5L, 100.0, new Timestamp(10L * day)),
      (2L, 5L, 900.0, new Timestamp(11L * day)),
      (3L, 6L, 500.0, new Timestamp(12L * day))
    ).toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    val cust = Seq((5L, "Customer#5"), (6L, "Customer#6"))
      .toDF("c_custkey", "c_name")
    val r = Relational.largeOrders(li, ord, cust, 15000L, 20)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      ("Customer#6", 6L, 3L, 12L, 50000L, 20000L),
      ("Customer#5", 5L, 1L, 10L, 10000L, 15100L)))
  }

  // ---- idleCustomers (Q22) -----------------------------------------

  test("idleCustomers: above positive average AND no recent order") {
    val cutoffUs = 100L * 86400000000L
    val cust = Seq(
      (1L, "A", 90.0),  // above avg (avg pos = (90+50+10)/3 = 50), idle → in
      (2L, "A", 50.0),  // exactly avg: strict >: out
      (3L, "B", 10.0),  // below avg: out
      (4L, "B", 80.0),  // above avg but has a recent order: out
      (5L, "B", -5.0)   // negative: not in avg, not above: out
    ).toDF("c_custkey", "c_mktsegment", "c_acctbal")
    val ord = Seq(
      (1L, 4L, new Timestamp(150L * day)), // recent → disqualifies cust 4
      (2L, 1L, new Timestamp(50L * day))   // old → cust 1 stays idle
    ).toDF("o_orderkey", "o_custkey", "o_orderdate")
    val r = Relational.idleCustomers(cust, ord, cutoffUs)
      .as[(String, Long, Long)].collect().toSeq
    assert(r == Seq(("A", 1L, 9000L)))
  }

  // ---- orderBacklog ------------------------------------------------

  test("orderBacklog: opens and closes net out day by day") {
    val ord = Seq(
      (1L, new Timestamp(10L * day)),
      (2L, new Timestamp(10L * day)),
      (3L, new Timestamp(12L * day))
    ).toDF("o_orderkey", "o_orderdate")
    val li = Seq(
      (1L, new Timestamp(11L * day)), // order 1 ships day 11
      (2L, new Timestamp(11L * day)), // order 2: two lines,
      (2L, new Timestamp(14L * day))  //   closes at the LAST line (14)
      // order 3 never ships → stays open
    ).toDF("l_orderkey", "l_shipdate")
    val r = graft.operators.Relational.orderBacklog(ord, li)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      (10L, 2L, 0L, 2L),  // both open
      (11L, 0L, 1L, 1L),  // order 1 closes
      (12L, 1L, 0L, 2L),  // order 3 opens
      (14L, 0L, 1L, 1L))) // order 2 finally closes; order 3 still open
  }

  // ---- neymanAlloc -------------------------------------------------

  test("neymanAlloc: zero-variance strata get zero budget, allocation ∝ N·σ") {
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    val ev = Seq(
      // type a: values 1.00 and 3.00 (σ>0, N=2: weight ⌊sqrt(2·1e5−4e4·…)⌋)
      (1L, 1L, "a", 1.0), (2L, 1L, "a", 3.0),
      // type b: constant value → σ = 0 → weight 0 → alloc 0
      (3L, 1L, "b", 2.0), (4L, 1L, "b", 2.0))
      .toDF("event_id", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("event_id")))
    val r = graft.operators.Sampling.neymanAlloc(ev, budget = 100)
      .as[(String, Long, Long, Long)].collect().toSeq
    // a: v = (100, 300): num = 2·100000 − 400² /... = 2·(1e4+9e4) − 160000
    //   = 200000 − 160000 = 40000 → weight ⌊√40000⌋ = 200
    assert(r == Seq(("a", 2L, 200L, 100L), ("b", 2L, 0L, 0L)))
  }

  test("idleCustomers: no-recent-order test plans as LeftAnti") {
    val cust = Seq((1L, "A", 90.0)).toDF("c_custkey", "c_mktsegment", "c_acctbal")
    val ord = Seq((1L, 1L, new Timestamp(150L * day)))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val plan = Relational.idleCustomers(cust, ord, 100L * 86400000000L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), plan)
  }
}
