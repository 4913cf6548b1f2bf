package graft

import org.apache.spark.sql.functions._

import graft.operators.{Lifecycle, Stats}

/** Gates for the lifecycle family (Lifecycle.scala) and the integer
  * inferential stats (Stats.scala) on hand-computable fixtures. */
class LifecycleSpec extends SparkTestBase {
  import spark.implicits._

  private val DayUs = 86400000000L

  private def events(rows: (Long, Long, Long, String, Double)*) =
    rows.toDF("event_id", "ts_us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")

  // ---- activeUsers -------------------------------------------------

  test("activeUsers: MAU counts a user for exactly W trailing days") {
    // user 1 active on day 0 only; user 2 active on days 0 and 10.
    // With mauDays=30 both users cover every observed day; with the
    // 7-day WAU, user 1 falls out of the day-10 window.
    val ev = events(
      (1L, 0L * DayUs + 5L, 1L, "view", 1.0),
      (2L, 0L * DayUs + 6L, 2L, "view", 1.0),
      (3L, 10L * DayUs + 7L, 2L, "view", 1.0))
    val r = Lifecycle.activeUsers(ev)
      .select("day", "dau", "wau", "mau").as[(Long, Long, Long, Long)]
      .collect().toSeq.sortBy(_._1)
    assert(r == Seq((0L, 2L, 2L, 2L), (10L, 1L, 1L, 2L)))
  }

  test("activeUsers: interval merge handles overlapping coverage (no double count)") {
    // one user active 3 consecutive days: their WAU coverage windows
    // overlap; the merged interval must count them ONCE per day.
    val ev = (0 until 3).map { d =>
      (d + 1L, d * DayUs + 1L, 7L, "view", 1.0)
    }
    val r = Lifecycle.activeUsers(events(ev: _*))
      .select("day", "wau").as[(Long, Long)].collect().toMap
    assert(r == Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("activeUsers: stickiness is 1e6 when DAU == MAU") {
    val ev = events((1L, 5L, 1L, "view", 1.0))
    val r = Lifecycle.activeUsers(ev)
      .select("stickiness_ppm").as[Long].head()
    assert(r == 1000000L)
  }

  // ---- cdcApply ----------------------------------------------------

  test("cdcApply: latest upsert wins, same-µs ties break on event_id") {
    val ev = events(
      (1L, 100L, 1L, "signup", 1.0),
      (2L, 200L, 1L, "view", 2.5), // latest for user 1
      (3L, 300L, 2L, "view", 1.0),
      (4L, 300L, 2L, "click", 9.0)) // same µs, higher event_id wins
    val r = Lifecycle.cdcApply(ev)
      .select("user_id", "last_event_id", "last_type", "last_value_micro")
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(r == Seq((1L, 2L, "view", 2500000L), (2L, 4L, "click", 9000000L)))
  }

  test("cdcApply: a trailing tombstone deletes the key entirely") {
    val ev = events(
      (1L, 100L, 1L, "view", 1.0),
      (2L, 200L, 1L, "error", 0.0), // tombstone is the LATEST row
      (3L, 100L, 2L, "error", 0.0),
      (4L, 200L, 2L, "view", 3.0)) // tombstone superseded by an upsert
    val r = Lifecycle.cdcApply(ev).select("user_id").as[Long].collect().toSeq
    assert(r == Seq(2L), "user 1 deleted; user 2 resurrected by the later upsert")
  }

  // ---- scd2Intervals -----------------------------------------------

  test("scd2Intervals: runs compress, intervals chain, current row open") {
    val ev = events(
      (1L, 100L, 1L, "a", 0.0), (2L, 200L, 1L, "a", 0.0), // run of a
      (3L, 300L, 1L, "b", 0.0), // change at 300
      (4L, 400L, 1L, "a", 0.0)) // back to a at 400
    val r = Lifecycle.scd2Intervals(ev)
      .select("version", "event_type", "from_us", "to_us")
      .as[(Long, String, Long, Option[Long])].collect().toSeq
    assert(r == Seq(
      (1L, "a", 100L, Some(300L)),
      (2L, "b", 300L, Some(400L)),
      (3L, "a", 400L, None)))
  }

  // ---- userChurn ---------------------------------------------------

  test("userChurn: horizon is data-defined max day; strict > threshold") {
    val ev = events(
      (1L, 0L, 1L, "view", 0.0), //               last day 0
      (2L, 7L * DayUs + 1L, 2L, "view", 0.0), //  last day 7 (inactive 3)
      (3L, 10L * DayUs + 1L, 3L, "view", 0.0)) // last day 10 = horizon
    val r = Lifecycle.userChurn(ev, horizonDays = 7)
      .select("user_id", "days_inactive", "churned")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(r == Seq((1L, 10L, true), (2L, 3L, false), (3L, 0L, false)))
  }

  // ---- engagementGini ----------------------------------------------

  test("engagementGini: 0 for equal counts, exact rational otherwise") {
    val equal = events(
      (1L, 1L, 1L, "a", 0.0), (2L, 2L, 2L, "a", 0.0))
    val g0 = Stats.engagementGini(equal)
      .select("gini_num", "gini_ppm").as[(Long, Long)].head()
    assert(g0 == (0L, 0L))

    // counts (1, 3): sorted Σi·x = 1 + 6 = 7; num = 14 − 3·4 = 2,
    // den = 2·4 = 8 → gini = 0.25
    val skewed = events(
      (1L, 1L, 1L, "a", 0.0),
      (2L, 2L, 2L, "a", 0.0), (3L, 3L, 2L, "a", 0.0),
      (4L, 4L, 2L, "a", 0.0))
    val g = Stats.engagementGini(skewed)
      .select("gini_num", "gini_den", "gini_ppm")
      .as[(Long, Long, Long)].head()
    assert(g == (2L, 8L, 250000L))
  }

  // ---- Stats -------------------------------------------------------

  test("trendSlope: exact rational slope on a hand-computed series") {
    // type t: counts by hour = (h0: 1, h0+1: 2, h0+2: 3) → slope 1.
    val rows = Seq.tabulate(6) { i =>
      val h = Seq(0, 1, 1, 2, 2, 2)(i)
      (i + 1L, h * 3600000000L + 10L, 1L, "t", 0.0)
    }
    val r = Stats.trendSlope(events(rows: _*))
      .select("slope_num", "slope_den").as[(Long, Long)].head()
    // n=3, x=(0,1,2), y=(1,2,3): num = 3·8 − 3·6 = 6, den = 3·5 − 9 = 6
    assert(r == (6L, 6L))
  }

  test("abTest: a decisive lift is significant, a balanced one is not") {
    // arm 0 = even user ids, arm 1 = odd. 10 users/arm; arm 1 converts
    // 9/10, arm 0 converts 1/10 → z² ≈ 12.8 → significant.
    val strong = (0 until 20).flatMap { u =>
      val id = u.toLong
      val converts = (u % 2 == 1 && u / 2 < 9) || (u % 2 == 0 && u / 2 == 0)
      Seq((id * 10 + 1, 1000L + id, id, "view", 0.0)) ++
        (if (converts) Seq((id * 10 + 2, 2000L + id, id, "purchase", 1.0)) else Nil)
    }
    val s = Stats.abTest(events(strong: _*))
      .select("significant").as[Boolean].head()
    assert(s, "9/10 vs 1/10 on 10+10 users must be significant at α=0.05")

    val balanced = (0 until 20).flatMap { u =>
      val id = u.toLong
      Seq((id * 10 + 1, 1000L + id, id, "view", 0.0),
        (id * 10 + 2, 2000L + id, id, "purchase", 1.0))
    }
    val b = Stats.abTest(events(balanced: _*))
      .select("significant").as[Boolean].head()
    assert(!b, "identical conversion in both arms: z² = 0")
  }

  test("weeklyProfile: epoch day 0 is Thursday (dow=3) and shares are ppm-exact") {
    val ev = events(
      (1L, 5L, 1L, "t", 0.0), //                        1970-01-01 (Thu), hod 0
      (2L, 4L * 86400000000L + 3600000000L, 1L, "t", 0.0)) // Mon, hod 1
    val r = graft.operators.Stats.weeklyProfile(ev)
      .select("dow", "hod", "cnt", "share_ppm")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq((0L, 1L, 1L, 500000L), (3L, 0L, 1L, 500000L)))
  }

  test("independenceTest: perfect association gives chi2 = N; zero cells counted") {
    val DayUs2 = 86400000000L
    // type a only on Thursday (epoch day 0), type b only on Monday
    // (day 4): 2×2 table with zero off-diagonal -> phi^2 = 1, chi2 = N = 4.
    val ev = events(
      (1L, 1L, 1L, "a", 0.0), (2L, 2L, 1L, "a", 0.0),
      (3L, 4L * DayUs2 + 1L, 1L, "b", 0.0),
      (4L, 4L * DayUs2 + 2L, 1L, "b", 0.0))
    val r = Stats.independenceTest(ev)
      .select("n_events", "n_cells", "dof", "chi2_ppm")
      .as[(Long, Long, Long, Long)].head()
    assert(r == (4L, 4L, 1L, 4000000L),
      "chi2_ppm = 4e6 requires the two ZERO cells' r·c/N terms")
  }

  test("survivalCurve: suffix counts over observed lifetimes") {
    val ev = events(
      (1L, 0L, 1L, "a", 0.0), //                 user 1: lifetime 0
      (2L, 0L, 2L, "a", 0.0),
      (3L, 2L * DayUs + 1L, 2L, "a", 0.0), //    user 2: lifetime 2
      (4L, 0L, 3L, "a", 0.0),
      (5L, 5L * DayUs + 1L, 3L, "a", 0.0)) //    user 3: lifetime 5
    val r = Stats.survivalCurve(ev)
      .select("lifetime_days", "surviving", "survival_ppm")
      .as[(Long, Long, Long)].collect().toSeq
    assert(r == Seq((0L, 3L, 1000000L), (2L, 2L, 666666L),
      (5L, 1L, 333333L)))
  }

  test("sourceDivergence: identical sources diverge zero, disjoint ones don't") {
    val d = Seq(
      (1L, "x y z", "A"), (2L, "x y z", "B"), // identical term dists
      (3L, "q q q", "C")) //                     disjoint from both
      .toDF("doc_id", "text", "source")
    val r = Stats.sourceDivergence(d)
      .select("src_a", "src_b", "chi2_ppm").as[(String, String, Long)]
      .collect().map { case (a, b, v) => (a, b) -> v }.toMap
    assert(r(("A", "B")) == 0L, "same distribution: every cell term is 0")
    assert(r(("A", "C")) > 0L && r(("B", "C")) > 0L)
    Caches.releaseAll()
  }

  test("seasonality: shares sum to ~1e6 per type and the peak flag is unique-max") {
    val ev = events(
      (1L, 1L * 3600000000L + 1L, 1L, "t", 0.0),
      (2L, 1L * 3600000000L + 2L, 1L, "t", 0.0),
      (3L, 2L * 3600000000L + 1L, 1L, "t", 0.0))
    val r = Stats.seasonality(ev)
      .select("hod", "cnt", "share_ppm", "is_peak")
      .as[(Long, Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
    assert(r == Seq((1L, 2L, 666666L, true), (2L, 1L, 333333L, false)))
  }
}
