package graft

import java.sql.Timestamp

import graft.operators.{Classify, Relational, Supply}

/** Gates for the round-11 third-wave relational operators — the
  * remaining classic TPC-H shapes (Q2/Q9/Q11/Q12/Q13/Q15/Q16/Q19/Q20/
  * Q21 analogues over the derived supply catalog) plus the embedding
  * dimension-correlation audit. Literal frames, hand-computed exact
  * integers. */
class TpchWave3Spec extends SparkTestBase {
  import spark.implicits._

  private val day = 86400000L // ms per day for Timestamp ctor

  // Shared dims: nations 1 (EUROPE) and 2 (ASIA); region keys 3/2.
  private def nation = Seq((1, "FRANCE", 3), (2, "CHINA", 2))
    .toDF("n_nationkey", "n_name", "n_regionkey")
  private def region = Seq((3, "EUROPE"), (2, "ASIA"))
    .toDF("r_regionkey", "r_name")

  // ---- catalog -----------------------------------------------------

  test("catalog: min unit cost, total qty, line count per pair") {
    val li = Seq(
      (1L, 10L, 4.0, 20.0), // unit 5_000_000 microcents
      (1L, 10L, 1.0, 3.0),  // unit 3_000_000 -> min
      (1L, 11L, 2.0, 4.0)   // other supplier
    ).toDF("l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")
    val r = Supply.catalog(li).orderBy("l_partkey", "l_suppkey")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq((1L, 10L, 3000000L, 5L, 2L), (1L, 11L, 2000000L, 2L, 1L)))
  }

  // ---- minCostSupplier (Q2) ----------------------------------------

  test("minCostSupplier: region filter, per-part min, ties kept") {
    val li = Seq(
      (1L, 10L, 1.0, 5.0),  // supp 10 (EUROPE): cost 5_000_000
      (1L, 11L, 1.0, 5.0),  // supp 11 (EUROPE): tie at min -> kept too
      (1L, 12L, 1.0, 1.0),  // supp 12 (ASIA): cheapest but out of region
      (2L, 10L, 1.0, 2.0)   // part 2: wrong type, excluded
    ).toDF("l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")
    val supp = Seq((10L, "S10", 1, 100.0), (11L, "S11", 1, 50.0),
      (12L, "S12", 2, 999.0)).toDF("s_suppkey", "s_name", "s_nationkey",
      "s_acctbal")
    val part = Seq((1L, "ECONOMY"), (2L, "PROMO")).toDF("p_partkey", "p_type")
    val r = Supply.minCostSupplier(li, supp, nation, region, part,
        "EUROPE", "ECONOMY", 20)
      .as[(Long, String, String, Long, Long)].collect().toSeq
    // bal desc: S10 (10000 cents) before S11 (5000)
    assert(r == Seq((10000L, "S10", "FRANCE", 1L, 5000000L),
      (5000L, "S11", "FRANCE", 1L, 5000000L)))
  }

  // ---- importantParts (Q11) ----------------------------------------

  test("importantParts: ppm share vs regional total, threshold strict") {
    // values: part 1 = 9_000_000 (qty 9 x cost 1_000_000), part 2 = 1_000_000
    val li = Seq(
      (1L, 12L, 9.0, 9.0), // unit 1_000_000, qty 9
      (2L, 12L, 1.0, 1.0), // unit 1_000_000, qty 1
      (3L, 10L, 1.0, 50.0) // EUROPE supplier: outside ASIA, ignored
    ).toDF("l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")
    val supp = Seq((10L, "S10", 1, 1.0), (12L, "S12", 2, 1.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    val r = Supply.importantParts(li, supp, nation, region, "ASIA", 500000L)
      .as[(Long, Long, Long)].collect().toSeq
    // part 1 share = 900000 ppm > 500000; part 2 = 100000 ppm: dropped
    assert(r == Seq((1L, 9000000L, 900000L)))
  }

  // ---- partSupplierCounts (Q16) ------------------------------------

  test("partSupplierCounts: complaint suppliers and brand/size filters") {
    val li = Seq(
      (1L, 10L, 1.0, 1.0), (1L, 11L, 1.0, 1.0),
      (1L, 13L, 1.0, 1.0), // suppkey 13: pmod 13 = 0 -> complaint, out
      (2L, 10L, 1.0, 1.0), // excluded brand
      (3L, 10L, 1.0, 1.0)  // size not in list
    ).toDF("l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")
    val supp = Seq((10L, 1), (11L, 1), (13L, 1))
      .toDF("s_suppkey", "s_nationkey")
    val part = Seq(
      (1L, "Brand#1", "ECONOMY", 9),
      (2L, "Brand#13", "ECONOMY", 9),
      (3L, "Brand#1", "ECONOMY", 10)
    ).toDF("p_partkey", "p_brand", "p_type", "p_size")
    val r = Supply.partSupplierCounts(li, supp, part, "Brand#13",
        Seq(3, 9, 14, 19, 23, 36, 45, 49))
      .as[(String, String, Int, Long)].collect().toSeq
    assert(r == Seq(("Brand#1", "ECONOMY", 9, 2L)))
  }

  // ---- excessShippers (Q20) ----------------------------------------

  test("excessShippers: fair-share dominance, region + name filters") {
    val li = Seq(
      (1L, 10L, 10.0, 1.0), // 10 of 12, 3 supp: 10*3 > 2*12 -> dominant
      (1L, 11L, 1.0, 1.0),  // 1*3 < 24: not dominant
      (1L, 12L, 1.0, 1.0),  // dominant never (1*3 < 24)
      (2L, 12L, 9.0, 1.0)   // part 2 not name-matched: ignored
    ).toDF("l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")
    val supp = Seq((10L, "S10", 1), (11L, "S11", 1), (12L, "S12", 2))
      .toDF("s_suppkey", "s_name", "s_nationkey")
    val part = Seq((1L, "blue widget"), (2L, "red bolt"))
      .toDF("p_partkey", "p_name")
    val r = Supply.excessShippers(li, supp, nation, region, part,
        "widget", "EUROPE")
      .as[(Long, String, String)].collect().toSeq
    assert(r == Seq((10L, "S10", "FRANCE")))
  }

  // ---- nationProfit (Q9) -------------------------------------------

  test("nationProfit: revenue minus retail cost, token filter") {
    val li = Seq(
      (1L, 10L, 2.0, 100.0, 0.0, new Timestamp(400L * day)), // bucket 1
      (2L, 10L, 1.0, 50.0, 0.0, new Timestamp(400L * day))   // not matched
    ).toDF("l_partkey", "l_suppkey", "l_quantity", "l_extendedprice",
      "l_discount", "l_shipdate")
    val part = Seq((1L, "blue widget", 10.0), (2L, "red bolt", 5.0))
      .toDF("p_partkey", "p_name", "p_retailprice")
    val supp = Seq((10L, 1)).toDF("s_suppkey", "s_nationkey")
    val r = Relational.nationProfit(li, part, supp, nation, "widget")
      .as[(String, Long, Long, Long)].collect().toSeq
    // profit = 10000 - 1000*2 = 8000 cents
    assert(r == Seq(("FRANCE", 1L, 1L, 8000L)))
  }

  // ---- latePriority (Q12) ------------------------------------------

  test("latePriority: strict 60-day lateness, priority split") {
    val ord = Seq(
      (1L, "1-URGENT", new Timestamp(0L)),
      (2L, "5-LOW", new Timestamp(0L)),
      (3L, "2-HIGH", new Timestamp(0L))
    ).toDF("o_orderkey", "o_orderpriority", "o_orderdate")
    val li = Seq(
      (1L, new Timestamp(61L * day)), // late, high
      (2L, new Timestamp(61L * day)), // late, low
      (3L, new Timestamp(60L * day))  // exactly 60 days: NOT late
    ).toDF("l_orderkey", "l_shipdate")
    val r = Relational.latePriority(li, ord, 60)
      .as[(Long, Long, Long)].collect().toSeq
    assert(r == Seq((0L, 1L, 1L)))
  }

  // ---- custOrderDist (Q13) -----------------------------------------

  test("custOrderDist: zero-order customers counted, priority excluded") {
    val cust = Seq(1L, 2L, 3L).toDF("c_custkey")
    val ord = Seq(
      (10L, 1L, "1-URGENT"), (11L, 1L, "5-LOW"),
      (12L, 3L, "4-NOT SPECIFIED") // excluded -> cust 3 counts as zero
    ).toDF("o_orderkey", "o_custkey", "o_orderpriority")
    val r = Relational.custOrderDist(cust, ord)
      .as[(Long, Long)].collect().toSeq
    // 2 customers with 0 orders, 1 customer with 2
    assert(r == Seq((0L, 2L), (2L, 1L)))
  }

  // ---- topSupplier (Q15) -------------------------------------------

  test("topSupplier: window filter, exact max keeps all ties") {
    val t0 = 946684800000000L // 2000-01-01 in micros
    val inWin = new Timestamp(t0 / 1000L + 10L * day)
    val outWin = new Timestamp(t0 / 1000L + 100L * day)
    val li = Seq(
      (10L, 100.0, 0.0, inWin),
      (11L, 100.0, 0.0, inWin),  // tie at 10000 cents
      (12L, 999.0, 0.0, outWin)  // outside the quarter
    ).toDF("l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
    val supp = Seq((10L, "S10"), (11L, "S11"), (12L, "S12"))
      .toDF("s_suppkey", "s_name")
    val r = Relational.topSupplier(li, supp, t0, 90)
      .as[(Long, String, Long)].collect().toSeq
    assert(r == Seq((10L, "S10", 10000L), (11L, "S11", 10000L)))
  }

  // ---- disjunctiveRevenue (Q19) ------------------------------------

  test("disjunctiveRevenue: OR of three brand/size/qty conjunctions") {
    val li = Seq(
      (1L, 5.0, 10.0, 0.0),  // Brand#12 size 10 qty 5: branch 1
      (2L, 20.0, 10.0, 0.0), // Brand#23 size 20 qty 20: branch 2
      (3L, 5.0, 10.0, 0.0)   // Brand#25 size 30 qty 5: no branch
    ).toDF("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val part = Seq((1L, "Brand#12", 10), (2L, "Brand#23", 20),
      (3L, "Brand#25", 30)).toDF("p_partkey", "p_brand", "p_size")
    val r = Relational.disjunctiveRevenue(li, part)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(r == ((2L, 1L, 1L, 0L, 2000L)))
  }

  // ---- lateSuppliers (Q21) -----------------------------------------

  test("lateSuppliers: exactly-one-late in multi-supplier finished orders") {
    val t0 = new Timestamp(0L)
    val late = new Timestamp(91L * day)
    val onTime = new Timestamp(10L * day)
    val ord = Seq(
      (1L, "F", t0), // S10 late, S11 on time -> charge S10
      (2L, "F", t0), // both late -> nobody charged
      (3L, "F", t0), // single supplier: ns < 2 -> out
      (4L, "O", t0)  // not finished -> out
    ).toDF("o_orderkey", "o_orderstatus", "o_orderdate")
    val li = Seq(
      (1L, 10L, late), (1L, 11L, onTime),
      (2L, 10L, late), (2L, 11L, late),
      (3L, 10L, late),
      (4L, 10L, late), (4L, 11L, onTime)
    ).toDF("l_orderkey", "l_suppkey", "l_shipdate")
    val supp = Seq((10L, "S10", 1), (11L, "S11", 1))
      .toDF("s_suppkey", "s_name", "s_nationkey")
    val r = Relational.lateSuppliers(li, ord, supp, nation, 90, 20)
      .as[(String, String, Long)].collect().toSeq
    assert(r == Seq(("S10", "FRANCE", 1L)))
  }

  // ---- dimCorr -----------------------------------------------------

  test("dimCorr: perfect positive and negative correlations hit 1e6 ppm") {
    // dims: d1 = 2*d0 (r = +1), d2 = reversed d0 (r = -1 vs both)
    val emb = Seq(
      (0L, Array(1.0f, 2.0f, 3.0f)),
      (1L, Array(2.0f, 4.0f, 2.0f)),
      (2L, Array(3.0f, 6.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val r = Classify.dimCorr(emb, 1024, 20)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq((0L, 1L, 1000000L, 1L), (0L, 2L, 1000000L, -1L),
      (1L, 2L, 1000000L, -1L)))
  }

  test("dimCorr: uncorrelated pair lands strictly below a correlated one") {
    val emb = Seq(
      (0L, Array(1.0f, 1.0f, 5.0f)),
      (1L, Array(2.0f, 2.0f, 1.0f)),
      (2L, Array(3.0f, 3.0f, 5.0f)),
      (3L, Array(4.0f, 4.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val r = Classify.dimCorr(emb, 1024, 20)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(r.head._1 == 0L && r.head._2 == 1L && r.head._3 == 1000000L)
    val weak = r.find(p => p._1 == 0L && p._2 == 2L).get
    assert(weak._3 < 1000000L)
  }
}
