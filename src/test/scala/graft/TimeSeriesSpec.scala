package graft

import org.apache.spark.sql.functions._

import graft.operators.Stats

/** Gates for the time-series/data-quality trio: lag-1 autocorrelation
  * rationals, the Benford first-digit audit, and the 7-day trend/cycle
  * decomposition. */
class TimeSeriesSpec extends SparkTestBase {
  import spark.implicits._

  private val day = 86400000000L // µs

  private def events(rows: (Long, Long, Long, String, Double)*) =
    rows.toDF("event_id", "ts_us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")

  // ---- autocorr ----------------------------------------------------

  test("autocorr: perfectly alternating series has negative num") {
    // daily counts 1,2,1,2,1,2 → adjacent pairs anti-correlated.
    var eid = 0L
    val rows = (0 until 6).flatMap { d =>
      val c = if (d % 2 == 0) 1 else 2
      (0 until c).map { i => eid += 1; (eid, d * day + i * 1000L, 1L, "a", 0.0) }
    }
    val r = Stats.autocorr(events(rows: _*))
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(r.size == 1)
    val (_, m, num, dena, denb, c2) = r.head
    assert(m == 5L && num < 0 && c2 < 0, s"got $r")
    // exact: a=(1,2,1,2,1) b=(2,1,2,1,2): num = 5·10−7·8 = −6,
    // dena = 5·11−49 = 6, denb = 5·14−64 = 6 → r = −1 exactly
    assert((num, dena, denb) == ((-6L, 6L, 6L)))
    assert(c2 == -1000000L) // sign · 1e6·num²/(dena·denb) = −1e6·36/36
  }

  test("autocorr: constant series is filtered (zero variance)") {
    val rows = (0 until 6).map(d => (d.toLong, d * day, 1L, "a", 0.0))
    assert(Stats.autocorr(events(rows: _*)).count() == 0)
  }

  // ---- benfordCheck ------------------------------------------------

  test("benfordCheck: digits come from cents, sub-cent values drop") {
    val vals = Seq(1.23, 12.3, 0.19, 0.001, 9.5)
    // cents: 123→1, 1230→1, 19→1, 0→dropped, 950→9
    val rows = vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, i * 1000L, 1L, "a", v) }
    val r = Stats.benfordCheck(events(rows: _*))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(r.map(t => (t._1, t._2)) == Seq((1L, 3L), (9L, 1L)))
    val d1 = r.head
    assert(d1._3 == 750000L)               // 3 of 4
    assert(d1._4 == 301029L)               // ⌊1e6·log10(2)⌋
    assert(d1._5 == 750000L - 301029L)
  }

  // ---- trendCycle --------------------------------------------------

  test("trendCycle: only full 7-day windows emit; trend is sum div 7") {
    // 9 days: counts 1..9 → interior days 3..5 (0-indexed) have full
    // windows; trend at day d = (7d+7) div 7 = d+1 → residual 0.
    var eid = 0L
    val rows = (0 until 9).flatMap { d =>
      (0 to d).map { i => eid += 1; (eid, d * day + i * 1000L, 1L, "a", 0.0) }
    }
    val r = Stats.trendCycle(events(rows: _*))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(r.map(_._1) == Seq(3L, 4L, 5L))
    assert(r.forall(t => t._3 == t._1 + 1 && t._4 == 0L), s"got $r")
  }

  // ---- theilsenSlope -----------------------------------------------

  test("theilsenSlope: median pairwise slope resists the outlier day") {
    // type a daily counts [1, 2, 3, 10]: slopes (milli) are
    // [1000, 1000, 3000, 1000, 4000, 7000] -> median 1000 — the
    // day-3 spike does not move it (OLS would).
    var eid = 0L
    val rows = Seq((0L, 1), (1L, 2), (2L, 3), (3L, 10)).flatMap {
      case (d, c) => (0 until c).map { i =>
        eid += 1; (eid, d * day + i * 1000L, 1L, "a", 0.0)
      }
    }
    val r = Stats.theilsenSlope(events(rows: _*))
      .as[(String, Long, Long)].collect().toSeq
    assert(r == Seq(("a", 6L, 1000L)))
  }

  test("theilsenSlope: negative slopes truncate identically cross-engine") {
    // days {0, 3} counts {2, 1}: slope = -1000/3 -> -333 (both Spark
    // div and DuckDB // truncate toward zero on BIGINT lanes)
    var eid = 0L
    val rows = Seq((0L, 2), (3L, 1)).flatMap {
      case (d, c) => (0 until c).map { i =>
        eid += 1; (eid, d * day + i * 1000L, 1L, "a", 0.0)
      }
    }
    val r = Stats.theilsenSlope(events(rows: _*))
      .as[(String, Long, Long)].collect().toSeq
    assert(r == Seq(("a", 1L, -333L)))
  }

  // ---- typeCorr ------------------------------------------------------

  test("typeCorr: proportional series hit +1e6, mirrored series -1e6") {
    // over days 0..2: a = [1,2,3], b = [2,4,6] (r=+1), c = [3,2,1]
    // (r=-1 vs both)
    var eid = 0L
    val rows = Seq.newBuilder[(Long, Long, Long, String, Double)]
    for ((t, counts) <- Seq(("a", Seq(1, 2, 3)), ("b", Seq(2, 4, 6)),
        ("c", Seq(3, 2, 1))); (cnt, d) <- counts.zipWithIndex;
        i <- 0 until cnt) {
      eid += 1; rows += ((eid, d * day + i * 1000L, 1L, t, 0.0))
    }
    val r = Stats.typeCorr(events(rows.result(): _*))
      .select("ta", "tb", "corr2_signed_ppm")
      .as[(String, String, Long)].collect().toSeq
    assert(r == Seq(("a", "b", 1000000L), ("a", "c", -1000000L),
      ("b", "c", -1000000L)))
  }

  test("typeCorr: pairs below minDays of shared observation drop") {
    var eid = 0L
    val rows = Seq.newBuilder[(Long, Long, Long, String, Double)]
    // a on days 0..2 (counts 1,2,3); d only on days 0..1 (counts 1,2):
    // 2 shared days < minDays=3, so the pair drops despite positive
    // variance on both sides
    for ((t, dcs) <- Seq(("a", Seq((0L, 1), (1L, 2), (2L, 3))),
        ("d", Seq((0L, 1), (1L, 2)))); (d, cnt) <- dcs; i <- 0 until cnt) {
      eid += 1; rows += ((eid, d * day + i * 1000L, 1L, t, 0.0))
    }
    val r = Stats.typeCorr(events(rows.result(): _*)).count()
    assert(r == 0L)
  }

  // ---- changepointLocate -------------------------------------------

  test("changepointLocate: step series splits at the step, exact means") {
    // type a daily counts [1, 1, 9, 9]: the split after day 1
    // maximizes (Sl·n − S·i)²/(i·(n−i)) — score 256e6/1... per-split:
    // i=1: 256e6/3, i=2: 1024e6/4 = 256e6, i=3: 256e6/3. Max at i=2.
    var eid = 0L
    val rows = Seq((0L, 1), (1L, 1), (2L, 9), (3L, 9)).flatMap {
      case (d, c) => (0 until c).map { i =>
        eid += 1; (eid, d * day + i * 1000L, 1L, "a", 0.0)
      }
    }
    val r = Stats.changepointLocate(events(rows: _*))
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq(("a", 1L, 256000000L, 1000L, 9000L)))
  }

  test("changepointLocate: flat series scores zero and splits earliest") {
    var eid = 0L
    val rows = (0L to 3L).flatMap { d =>
      (0 until 2).map { i =>
        eid += 1; (eid, d * day + i * 1000L, 1L, "a", 0.0)
      }
    }
    val r = Stats.changepointLocate(events(rows: _*))
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq(("a", 0L, 0L, 2000L, 2000L)))
  }

  // ---- forecastBacktest --------------------------------------------

  private def dailySeries(counts: Seq[(Int, Int)], tpe: String = "a") = {
    var eid = 0L
    events(counts.flatMap { case (d, c) =>
      (0 until c).map { i =>
        eid += 1; (eid, d * day + i * 1000L, 1L, tpe, 0.0)
      }
    }: _*)
  }

  test("forecastBacktest: a clean weekly spike gives MASE 0 — the " +
    "seasonal forecast is exact where the naive one keeps missing") {
    // counts 5,1,1,1,1,1,1 repeated twice: days 7..13 evaluate;
    // seasonal error 0 everywhere, naive error 4 at both spike edges
    val counts = (0 until 14).map(d => (d, if (d % 7 == 0) 5 else 1))
    val r = Stats.forecastBacktest(dailySeries(counts))
      .as[(String, Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(r == Seq(("a", 7L, 8L, 0L, 0L, true)))
    Caches.releaseAll()
  }

  test("forecastBacktest: a linear trend punishes the 7-day lag 7×; " +
    "a gap day breaks the lag instead of sliding it") {
    // counts d+1 on days 0..13 with day 10 MISSING: only days with
    // both day−1 and day−7 present evaluate → {7,8,9,12,13}; per day
    // naive error 1, seasonal error 7 → MASE = 7e6, seasonal loses
    val counts = (0 until 14).filter(_ != 10).map(d => (d, d + 1))
    val r = Stats.forecastBacktest(dailySeries(counts))
      .as[(String, Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(r == Seq(("a", 5L, 5L, 35L, 7000000L, false)))
    Caches.releaseAll()
  }
}
