package graft

import org.apache.spark.sql.functions._

import graft.operators.Behavior

/** Gates for the behavioral-analytics operators: peak detection,
  * bot-regularity CV², Gini–Simpson diversity, the dow×hour heatmap,
  * and islands-and-gaps repetition runs. */
class BehaviorSpec extends SparkTestBase {
  import spark.implicits._

  private val day = 86400000000L // µs

  private def events(rows: (Long, Long, Long, String)*) =
    rows.toDF("event_id", "ts_us", "user_id", "event_type")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")

  // ---- peakDays ----------------------------------------------------

  test("peakDays: strict interior maxima only; edges never qualify") {
    // daily counts for type a: day0=2, day1=3, day2=1, day3=5 (edge).
    def n(d: Long, c: Int, base: Long) =
      (0 until c).map(i => (base + i, d * day + i * 1000L, 1L, "a"))
    val ev = events((n(0, 2, 10) ++ n(1, 3, 20) ++ n(2, 1, 30) ++
      n(3, 5, 40)): _*)
    val r = Behavior.peakDays(ev).as[(String, Long, Long)].collect().toSeq
    assert(r == Seq(("a", 1L, 3L))) // only day1: 3 > 2 and 3 > 1
  }

  test("peakDays: plateaus are not peaks (strict on both sides)") {
    def n(d: Long, c: Int, base: Long) =
      (0 until c).map(i => (base + i, d * day + i * 1000L, 1L, "a"))
    val ev = events((n(0, 1, 10) ++ n(1, 3, 20) ++ n(2, 3, 30) ++
      n(3, 1, 40)): _*)
    assert(Behavior.peakDays(ev).count() == 0)
  }

  // ---- botRegularity -----------------------------------------------

  test("botRegularity: constant gaps give CV² = 0; bursty gaps don't") {
    // user 1: 12 events exactly 60 s apart → 11 gaps, cv2 = 0.
    // user 2: gaps alternate 1 s / 119 s → high cv2.
    // user 3: only 3 events → below minGaps, excluded.
    val u1 = (0 until 12).map(i => (100L + i, i * 60000000L, 1L, "a"))
    val u2 = (0 until 12).map { i =>
      val ts = (i / 2) * 120000000L + (i % 2) * 1000000L
      (200L + i, ts, 2L, "a")
    }
    val u3 = (0 until 3).map(i => (300L + i, i * 60000000L, 3L, "a"))
    val r = Behavior.botRegularity(events((u1 ++ u2 ++ u3): _*), minGaps = 10)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(r.map(_._1) == Seq(1L, 2L), "most regular first")
    assert(r.head == ((1L, 11L, 660L, 0L)), "constant gaps: cv2_ppm = 0")
    assert(r(1)._4 > 900000L, "alternating 1/119 s gaps: cv2 ≈ 0.97")
  }

  // ---- userDiversity -----------------------------------------------

  test("userDiversity: uniform mix ≫ monoculture, exact ppm centiles") {
    // user 1: 2+2 over two types → 1 - 2·(1/2)² = 0.5 → centile 50.
    // user 2: 4 of one type → 0 → centile 0.
    val ev = events(
      (1L, 1000L, 1L, "a"), (2L, 2000L, 1L, "a"),
      (3L, 3000L, 1L, "b"), (4L, 4000L, 1L, "b"),
      (5L, 5000L, 2L, "a"), (6L, 6000L, 2L, "a"),
      (7L, 7000L, 2L, "a"), (8L, 8000L, 2L, "a"))
    val r = Behavior.userDiversity(ev).as[(Long, Long)].collect().toMap
    assert(r == Map(0L -> 1L, 50L -> 1L))
  }

  // ---- hourDowHeatmap ----------------------------------------------

  test("hourDowHeatmap: epoch day 0 is Thursday, hours bucket mod 24") {
    val ev = events(
      (1L, 0L, 1L, "a"),                 // 1970-01-01 00:xx — Thu (dow 4)
      (2L, 3600000000L, 1L, "a"),        // hour 1, same Thu
      (3L, 3600000001L, 2L, "a"),        // hour 1, second user
      (4L, 3L * day + 3600000000L, 1L, "a")) // Sunday (dow 0), hour 1
    val r = Behavior.hourDowHeatmap(ev)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      (0L, 1L, 1L, 1L),  // Sunday hour 1
      (4L, 0L, 1L, 1L),  // Thursday hour 0
      (4L, 1L, 2L, 2L))) // Thursday hour 1: 2 events, 2 users
  }

  // ---- typeRuns ----------------------------------------------------

  test("typeRuns: a-a-b-a splits into runs [2][1][1]; b is one run") {
    val ev = events(
      (1L, 1000L, 1L, "a"), (2L, 2000L, 1L, "a"),
      (3L, 3000L, 1L, "b"), (4L, 4000L, 1L, "a"))
    val r = Behavior.typeRuns(ev)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(r == Seq(("a", 2L, 2L, 2L), ("b", 1L, 1L, 0L)))
  }

  test("typeRuns: runs never span users") {
    val ev = events(
      (1L, 1000L, 1L, "a"), (2L, 2000L, 2L, "a"), (3L, 3000L, 1L, "a"))
    val r = Behavior.typeRuns(ev)
      .as[(String, Long, Long, Long)].collect().toSeq
    // user 1 has a run of 2 (its two events are consecutive FOR THAT
    // user), user 2 a run of 1.
    assert(r == Seq(("a", 2L, 2L, 2L)))
  }

  // ---- seqNgrams ---------------------------------------------------

  test("seqNgrams: overlapping order-3 windows per user, never across") {
    val ev = events(
      (1L, 1000L, 1L, "a"), (2L, 2000L, 1L, "b"),
      (3L, 3000L, 1L, "c"), (4L, 4000L, 1L, "d"),
      (5L, 1000L, 2L, "a"), (6L, 2000L, 2L, "b"), (7L, 3000L, 2L, "c"))
    val r = Behavior.seqNgrams(ev, k = 3, topN = 10)
      .as[(String, Long)].collect().toSeq
    // a>b>c appears for both users; b>c>d only for user 1; user 2's
    // tail never chains into user 1's events
    assert(r == Seq(("a>b>c", 2L), ("b>c>d", 1L)))
  }

  test("seqNgrams: k=2 equals the raw transition pair counts") {
    val ev = events(
      (1L, 1000L, 1L, "a"), (2L, 2000L, 1L, "b"), (3L, 3000L, 1L, "a"))
    val r = Behavior.seqNgrams(ev, k = 2, topN = 10)
      .as[(String, Long)].collect().toSeq
    assert(r == Seq(("a>b", 1L), ("b>a", 1L)))
  }

  // ---- fanoFactor --------------------------------------------------

  test("fanoFactor: constant daily counts give F = 0; bursty > 1e6") {
    // type a: 2 events/day for 3 days (variance 0); type b: days with
    // 1, 1, 7 events -> mean 3, var ((1-3)^2+(1-3)^2+(7-3)^2)/3 = 8,
    // F = 8/3 -> 2666666 ppm (floor)
    val rows = Seq.newBuilder[(Long, Long, Long, String)]
    var id = 0L
    for (d <- 0L to 2L; i <- 0 until 2) {
      id += 1; rows += ((id, d * day + i * 1000L, 1L, "a"))
    }
    for ((d, c) <- Seq((0L, 1), (1L, 1), (2L, 7)); i <- 0 until c) {
      id += 1; rows += ((id, d * day + i * 1000L, 2L, "b"))
    }
    val r = Behavior.fanoFactor(events(rows.result(): _*))
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(r == Seq(("a", 3L, 6L, 0L), ("b", 3L, 9L, 2666666L)))
  }
}
