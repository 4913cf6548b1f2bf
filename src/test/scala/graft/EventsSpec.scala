package graft

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.functions._

import graft.operators.Events

/** Unit coverage for the events-table operators (the oracle gate covers
  * them end-to-end; these pin the semantics on crafted edges). */
class EventsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.from(Instant.parse(s))

  test("exactDedup keeps the FIRST row by (ts, id) per key") {
    val df = Seq(
      (1L, 10L, "click", ts("2024-01-01T10:00:00Z")),
      (2L, 10L, "click", ts("2024-01-01T09:00:00Z")), // earlier -> kept
      (3L, 10L, "view", ts("2024-01-01T08:00:00Z")),
      (4L, 11L, "click", ts("2024-01-01T10:00:00Z")))
      .toDF("event_id", "user_id", "event_type", "ts")
    val kept = Events.exactDedup(df,
        Seq(col("user_id"), col("event_type")), Seq(col("ts"), col("event_id")))
      .select("event_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L, 4L))
  }

  test("exactDedup breaks exact-timestamp ties by id") {
    val t = ts("2024-01-01T10:00:00Z")
    val df = Seq((7L, 1L, "x", t), (5L, 1L, "x", t))
      .toDF("event_id", "user_id", "event_type", "ts")
    val kept = Events.exactDedup(df,
        Seq(col("user_id"), col("event_type")), Seq(col("ts"), col("event_id")))
      .select("event_id").as[Long].collect().toSeq
    assert(kept == Seq(5L))
  }

  test("sessionize splits strictly-greater-than-gap, keeps == gap") {
    val rows = Seq(
      (1L, 1L, ts("2024-01-01T10:00:00Z")),
      (2L, 1L, ts("2024-01-01T11:00:00Z")), // exactly 1h -> same session
      (3L, 1L, ts("2024-01-01T12:00:01Z")), // 1h + 1s -> new session
      (4L, 2L, ts("2024-01-01T10:00:00Z")))
      .toDF("event_id", "user_id", "ts")
    val s = Events.sessionize(rows, 3600L)
      .select("event_id", "session_id").as[(Long, Long)].collect().toMap
    assert(s(1L) == 1L && s(2L) == 1L)
    assert(s(3L) == 2L)
    assert(s(4L) == 1L)
  }

  test("withCorruptedProps + dropMalformed: only multiples of 97 drop") {
    val df = spark.range(200).select(col("id").as("event_id"),
      lit("""{"k": 5}""").as("props"))
    val out = Events.dropMalformed(Events.parseProps(
      Events.withCorruptedProps(df)))
    // 0, 97, 194 corrupted -> 197 survivors, all with k = 5
    assert(out.count() == 197L)
    assert(out.filter(col("k") =!= 5).count() == 0L)
  }

  test("parsePropsGuarded agrees with parseProps on every corruption class") {
    // object-shaped valid, garbage prefix (the withCorruptedProps class),
    // shape-passing-but-invalid, non-object scalar, empty, null
    val df = Seq(
      (1L, """{"k": 5}"""), (2L, """X"k": 5}"""), (3L, """{"k": """),
      (4L, "5"), (5L, ""), (6L, null.asInstanceOf[String]),
      (7L, "\n\t {\"k\": 7} \r\n")) // whitespace-padded valid JSON
      .toDF("event_id", "props")
    val a = Events.dropMalformed(Events.parseProps(df))
      .select("event_id", "k").as[(Long, Int)].collect().toSet
    val b = Events.dropMalformed(Events.parsePropsGuarded(df))
      .select("event_id", "k").as[(Long, Int)].collect().toSet
    assert(a == b && a == Set((1L, 5), (7L, 7)))
  }

  test("parseLogLine extracts type and id; non-matching lines yield nulls") {
    val df = Seq((1L, "click #42"), (2L, "garbage line!"))
      .toDF("event_id", "data")
    val rows = Events.parseLogLine(df, col("data"))
      .select("event_id", "msg_type", "msg_id")
      .collect().map(r => r.getLong(0) -> ((r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
    assert(rows(1L) == (("click", Some(42L))))
    assert(rows(2L) == (("", None)))
  }

  test("hourlyWindows buckets on the event-time hour") {
    val rows = Seq(
      (1L, "a", ts("2024-01-01T10:05:00Z")),
      (2L, "a", ts("2024-01-01T10:55:00Z")),
      (3L, "a", ts("2024-01-01T11:00:00Z")))
      .toDF("event_id", "event_type", "ts")
    val w = Events.hourlyWindows(rows)
      .select(col("window_start").cast("string"), col("n"))
      .as[(String, Long)].collect().toMap
    assert(w == Map("2024-01-01 10:00:00" -> 2L, "2024-01-01 11:00:00" -> 1L))
  }

  test("slidingWindows: every event lands in exactly 2 overlapping windows") {
    val rows = Seq(
      (1L, "a", ts("2024-01-01T10:05:00Z")),   // windows 09:30 and 10:00
      (2L, "a", ts("2024-01-01T10:40:00Z")))   // windows 10:00 and 10:30
      .toDF("event_id", "event_type", "ts")
    val w = Events.slidingWindows(rows)
      .select(col("window_start").cast("string"), col("n"))
      .as[(String, Long)].collect().toMap
    assert(w == Map(
      "2024-01-01 09:30:00" -> 1L, "2024-01-01 10:00:00" -> 2L,
      "2024-01-01 10:30:00" -> 1L))
    assert(w.values.sum == 2L * rows.count(), "overlap factor is exactly 2")
  }

  test("rollupCounts: subtotal levels are coherent with the leaves") {
    val rows = Seq(
      (1L, "a", 3L), (2L, "a", 3L), (3L, "a", 7L), (4L, "b", 3L))
      .map { case (id, t, u) => (id, t, u, ts("2024-01-01T10:00:00Z")) }
      .toDF("event_id", "event_type", "user_id", "ts")
    val r = Events.rollupCounts(rows)
      .select(col("event_type"), col("user_decile"), col("n"))
      .as[(Option[String], Option[Long], Long)].collect()
    val grand = r.collect { case (None, None, n) => n }
    val perType = r.collect { case (Some(t), None, n) => t -> n }.toMap
    val leaves = r.collect { case (Some(t), Some(_), n) => (t, n) }
    assert(grand.toSeq == Seq(4L))
    assert(perType == Map("a" -> 3L, "b" -> 1L))
    assert(leaves.filter(_._1 == "a").map(_._2).sum == 3L)
    assert(r.length == 1 + 2 + 3, "grand + 2 types + 3 leaf groups")
  }

  test("valueHistogram: exact ×2 binning, including negatives and edges") {
    val rows = Seq(
      (1L, 0.0), (2L, 0.49), (3L, 0.5), (4L, 1.0), (5L, -0.3))
      .toDF("event_id", "value")
    val r = Events.valueHistogram(rows)
      .select("bin", "bin_lo", "n")
      .as[(Long, Double, Long)].collect()
      .map { case (b, lo, n) => b -> ((lo, n)) }.toMap
    // floor(v*2): 0.0→0, 0.49→0, 0.5→1, 1.0→2, -0.3→-1 (floor, not trunc)
    assert(r == Map(
      0L -> ((0.0, 2L)), 1L -> ((0.5, 1L)),
      2L -> ((1.0, 1L)), -1L -> ((-0.5, 1L))))
  }

  test("topPaths: journey prefixes pivot without lists; short paths kept") {
    val ev = Seq(
      (1L, 1L, "a", ts("2024-01-01T10:00:00Z")),
      (2L, 1L, "b", ts("2024-01-01T10:01:00Z")),
      (3L, 1L, "c", ts("2024-01-01T10:02:00Z")),
      (4L, 1L, "d", ts("2024-01-01T10:03:00Z")), // 4th event ignored
      (5L, 2L, "a", ts("2024-01-01T11:00:00Z")),
      (6L, 2L, "b", ts("2024-01-01T11:01:00Z")),
      (7L, 2L, "c", ts("2024-01-01T11:02:00Z")),
      (8L, 3L, "a", ts("2024-01-01T12:00:00Z")))  // 1-event journey
      .toDF("event_id", "user_id", "event_type", "ts")
    val r = Events.topPaths(ev)
      .as[(String, Long, Long)].collect().toSeq
    assert(r == Seq(("a>b>c", 2L, 666666L), ("a", 1L, 333333L)),
      s"got $r")
    // the plan must keep Spark's map-side top-k pruning and no lists
    val p = Events.topPaths(ev).queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), s"rank filter must prune:\n$p")
    assert(!p.contains("collect_list"), "no unbounded per-group buffers")
  }

  test("funnelLag: p50/p90 conversion gaps; converters match funnelLevels") {
    def u(uid: Long, base: String, gapSec: Long, ids: Long) = Seq(
      (ids, uid, "view", ts(base)),
      (ids + 1, uid, "click", ts("2024-01-01T10:00:30Z")),
      (ids + 2, uid, "purchase",
        new java.sql.Timestamp(ts(base).getTime + gapSec * 1000)))
    // converters with view->purchase gaps 60s, 120s, 300s; u4 stalls
    val ev = (u(1L, "2024-01-01T10:00:00Z", 60L, 10L) ++
      u(2L, "2024-01-01T10:00:00Z", 120L, 20L) ++
      u(3L, "2024-01-01T10:00:00Z", 300L, 30L) ++
      Seq((40L, 4L, "view", ts("2024-01-01T10:00:00Z"))))
      .toDF("event_id", "user_id", "event_type", "ts")
    val r = Events.funnelLag(ev)
      .as[(Long, Long, Long)].head()
    assert(r == ((3L, 120000000L, 300000000L)), s"got $r")
    val nLvl3 = Events.funnelLevels(ev)
      .filter(col("funnel_level") === 3L).count()
    assert(nLvl3 == r._1, "lag and levels must agree on who converted")
  }

  test("transitionMatrix: per-user consecutive pairs, ppm row-normalized") {
    // u1: a->b->a ; u2: a->b ; u3: c (no transition)
    val ev = Seq(
      (1L, 1L, "a", ts("2024-01-01T10:00:00Z")),
      (2L, 1L, "b", ts("2024-01-01T10:01:00Z")),
      (3L, 1L, "a", ts("2024-01-01T10:02:00Z")),
      (4L, 2L, "a", ts("2024-01-01T09:00:00Z")),
      (5L, 2L, "b", ts("2024-01-01T09:05:00Z")),
      (6L, 3L, "c", ts("2024-01-01T08:00:00Z")))
      .toDF("event_id", "user_id", "event_type", "ts")
    val r = Events.transitionMatrix(ev)
      .as[(String, String, Long, Long)].collect()
      .map(x => (x._1, x._2) -> ((x._3, x._4))).toMap
    // from 'a': 2x a->b (rows total 2 -> 1e6); from 'b': 1x b->a
    assert(r == Map(
      ("a", "b") -> ((2L, 1000000L)),
      ("b", "a") -> ((1L, 1000000L))))
  }

  test("transitionMatrix: equal-µs events order by event_id, not arrival") {
    val t0 = ts("2024-01-01T10:00:00Z")
    val ev = Seq( // inserted out of order; same timestamp
      (30L, 1L, "c", t0), (10L, 1L, "a", t0), (20L, 1L, "b", t0))
      .toDF("event_id", "user_id", "event_type", "ts")
    val r = Events.transitionMatrix(ev)
      .select("from_type", "to_type").as[(String, String)]
      .collect().toSet
    assert(r == Set(("a", "b"), ("b", "c")),
      "sequence must be a->b->c by event_id tie-break")
  }

  test("cusumChangepoints: sustained small drift accumulates to an alarm") {
    // type "a": 6 hours at 2, then 6 hours at 4 — a 2x shift whose
    // SINGLE-window rate never reaches rateAnomaly's spike bar, but
    // whose deviations accumulate. total=36, nh=12, k=ceil(36/12)=3.
    // P walks -1..-6 then +1 each hour; S = P - min(0, minP):
    // hours 0-5: S=0; hours 6-11: S=1..6. hMult=1 -> alarm once S>3.
    def rows(h: Int, n: Int) = (0 until n).map(i =>
      ((h * 100 + i).toLong, "a",
        ts(f"2024-01-01T$h%02d:10:00Z")))
    val ev = ((0 until 6).flatMap(rows(_, 2)) ++
      (6 until 12).flatMap(rows(_, 4)))
      .toDF("event_id", "event_type", "ts")
    val r = Events.cusumChangepoints(ev, hMult = 1)
      .select(col("window_start").cast("string"), col("n"), col("k"),
        col("cusum"), col("alarm"))
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(x => x._1.substring(11, 13).toInt -> ((x._2, x._4, x._5)))
      .toMap
    (0 until 6).foreach(h =>
      assert(r(h) == ((2L, 0L, false)), s"pre-shift hour $h"))
    (6 until 12).foreach { h =>
      val s = (h - 5).toLong
      assert(r(h) == ((4L, s, s > 3L)), s"post-shift hour $h")
    }
    // rateAnomaly's 2x spike test never fires on the same series
    assert(Events.rateAnomaly(ev).filter(col("anomaly")).count() == 0L)
  }

  test("cusumChangepoints: alarm state is per-type isolated") {
    val ev = ((0 until 4).map(h => (h.toLong, "quiet",
        ts(f"2024-01-01T$h%02d:00:00Z"))) ++
      (0 until 4).flatMap(h => (0 until (if (h >= 2) 9 else 1)).map(i =>
        (100L + h * 10 + i, "bursty", ts(f"2024-01-01T$h%02d:00:00Z")))))
      .toDF("event_id", "event_type", "ts")
    val alarms = Events.cusumChangepoints(ev, hMult = 1)
      .filter(col("alarm")).select("event_type").as[String]
      .collect().toSet
    assert(alarms == Set("bursty"), s"quiet type must stay quiet: $alarms")
  }

  test("rateAnomaly: integer mean test flags only the spiky window") {
    // type "a": hourly counts 1, 1, 6 -> total 8 over 3 windows
    val rows = (Seq(
      (1L, "a", ts("2024-01-01T10:05:00Z")),
      (2L, "a", ts("2024-01-01T11:05:00Z"))) ++
      (10L to 15L).map(i => (i, "a", ts("2024-01-01T12:05:00Z"))))
      .toDF("event_id", "event_type", "ts")
    val r = Events.rateAnomaly(rows)
      .select(col("window_start").cast("string"), col("n"),
        col("rate_milli"), col("anomaly"))
      .as[(String, Long, Long, Boolean)].collect()
      .map(x => x._1 -> ((x._2, x._3, x._4))).toMap
    // spike: 1000*6*3 div 8 = 2250; 6*3*100 = 1800 > 8*200 = 1600
    assert(r("2024-01-01 12:00:00") == ((6L, 2250L, true)))
    // normal: 1000*1*3 div 8 = 375; 300 < 1600
    assert(r("2024-01-01 10:00:00") == ((1L, 375L, false)))
    assert(r("2024-01-01 11:00:00") == ((1L, 375L, false)))
  }

  test("funnelLevels: strict ordering — same-instant next step doesn't count") {
    val t0 = ts("2024-01-01T10:00:00Z")
    val rows = Seq(
      // u1: click AT the view instant -> not strictly after -> level 1
      (1L, 1L, "view", t0), (2L, 1L, "click", t0),
      // u2: proper view < click < purchase chain -> level 3
      (3L, 2L, "view", t0),
      (4L, 2L, "click", ts("2024-01-01T11:00:00Z")),
      (5L, 2L, "purchase", ts("2024-01-01T12:00:00Z")),
      // u3: click with NO view -> level 0 (ordered funnel, not any-step)
      (6L, 3L, "click", t0),
      // u4: view only -> level 1
      (7L, 4L, "view", t0))
      .toDF("event_id", "user_id", "event_type", "ts")
    val lv = Events.funnelLevels(rows)
      .as[(Long, Long)].collect().toMap
    assert(lv == Map(1L -> 1L, 2L -> 3L, 3L -> 0L, 4L -> 1L))
  }

  test("funnelLevels: window edge — exactly windowUs counts, beyond doesn't") {
    val rows = Seq(
      // u1: click at t1 + 6h exactly (<= boundary) -> level 2
      (1L, 1L, "view", ts("2024-01-01T10:00:00Z")),
      (2L, 1L, "click", ts("2024-01-01T16:00:00Z")),
      // u2: click at t1 + 6h + 1µs -> out of window -> level 1
      (3L, 2L, "view", ts("2024-01-01T10:00:00Z")),
      (4L, 2L, "click", ts("2024-01-01T16:00:00.000001Z")))
      .toDF("event_id", "user_id", "event_type", "ts")
    val lv = Events.funnelLevels(rows).as[(Long, Long)].collect().toMap
    assert(lv == Map(1L -> 2L, 2L -> 1L))
  }

  test("funnelLevels: each step anchors on the EARLIEST qualifying event") {
    // u1's first click lands out of the purchase's window, but the funnel
    // must anchor step 2 at the EARLIEST in-window click (11:00), from
    // which the 15:00 purchase IS reachable.
    val rows = Seq(
      (1L, 1L, "view", ts("2024-01-01T10:00:00Z")),
      (2L, 1L, "click", ts("2024-01-01T11:00:00Z")),
      (3L, 1L, "click", ts("2024-01-01T14:00:00Z")),
      (4L, 1L, "purchase", ts("2024-01-01T15:00:00Z")))
      .toDF("event_id", "user_id", "event_type", "ts")
    val lv = Events.funnelLevels(rows).as[(Long, Long)].collect().toMap
    assert(lv == Map(1L -> 3L))
  }

  test("funnelLevels generalizes to arbitrary step sequences") {
    val rows = Seq(
      (1L, 1L, "a", ts("2024-01-01T10:00:00Z")),
      (2L, 1L, "b", ts("2024-01-01T11:00:00Z")),
      (3L, 1L, "c", ts("2024-01-01T12:00:00Z")),
      (4L, 1L, "d", ts("2024-01-01T13:00:00Z")),
      (5L, 2L, "a", ts("2024-01-01T10:00:00Z")),
      (6L, 2L, "c", ts("2024-01-01T11:00:00Z")), // skipped b: stuck at 1
      (7L, 3L, "b", ts("2024-01-01T10:00:00Z"))) // never did a: level 0
      .toDF("event_id", "user_id", "event_type", "ts")
    val lv = Events.funnelLevels(rows, steps = Seq("a", "b", "c", "d"))
      .as[(Long, Long)].collect().toMap
    assert(lv == Map(1L -> 4L, 2L -> 1L, 3L -> 0L))
    // a single-step funnel degenerates to "did the user ever do it"
    val one = Events.funnelLevels(rows, steps = Seq("b"))
      .as[(Long, Long)].collect().toMap
    assert(one == Map(1L -> 1L, 2L -> 0L, 3L -> 1L))
  }

  test("cohortRetention: day-boundary split and same-day dedup") {
    val rows = Seq(
      // u1: first activity 1µs before midnight -> cohort day 19723;
      // second event 1µs later falls on the NEXT epoch day
      (1L, 1L, ts("2024-01-01T23:59:59.999999Z")),
      (2L, 1L, ts("2024-01-02T00:00:00Z")),
      // u2: two events the SAME day (distinct (user, day) dedups them),
      // one more 2 days later
      (3L, 2L, ts("2024-01-02T05:00:00Z")),
      (4L, 2L, ts("2024-01-02T18:00:00Z")),
      (5L, 2L, ts("2024-01-04T01:00:00Z")))
      .toDF("event_id", "user_id", "ts")
    val r = Events.cohortRetention(rows)
      .as[(Long, Long, Long)].collect()
      .map { case (c, o, n) => (c, o) -> n }.toMap
    val d0 = 19723L // 2024-01-01 in epoch days
    assert(r == Map(
      (d0, 0L) -> 1L, (d0, 1L) -> 1L,      // u1 on both sides of midnight
      (d0 + 1, 0L) -> 1L, (d0 + 1, 2L) -> 1L)) // u2: same-day pair collapsed
  }

  test("cohortRetention: pre-epoch timestamps floor into the correct day") {
    // 1µs before the epoch is day −1 under floor division; a truncating
    // `div` would bucket it into day 0, merging both events into one
    // (cohort 0, offset 0) cell and breaking parity with DuckDB's
    // flooring `//`
    val rows = Seq(
      (1L, 1L, ts("1969-12-31T23:59:59.999999Z")),
      (2L, 1L, ts("1970-01-01T00:00:00Z")))
      .toDF("event_id", "user_id", "ts")
    val r = Events.cohortRetention(rows)
      .as[(Long, Long, Long)].collect()
      .map { case (c, o, n) => (c, o) -> n }.toMap
    assert(r == Map((-1L, 0L) -> 1L, (-1L, 1L) -> 1L))
  }

  test("timeDecayAgg: dyadic day decay, same-day floor, deep-past zero") {
    val rows = Seq(
      // u1: event AT the reference instant (age 0 -> 1e6) plus one
      // 1 day earlier (500000) and one 23h59m earlier -> SAME-day
      // floor: age 0 -> 1e6
      (1L, 1L, ts("2024-01-10T00:00:00Z")), // the corpus max = reference
      (2L, 1L, ts("2024-01-09T00:00:00Z")),
      (3L, 1L, ts("2024-01-09T00:00:01Z")),
      // u2: 3 days old (125000) + 21 days old (0: 1e6 >> 21 underflows)
      (4L, 2L, ts("2024-01-07T00:00:00Z")),
      (5L, 2L, ts("2023-12-20T00:00:00Z")))
      .toDF("event_id", "user_id", "ts")
    val r = Events.timeDecayAgg(rows)
      .select("user_id", "n_events", "recency_ppm")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3)))
      .toMap
    assert(r == Map(1L -> ((3L, 2500000L)), 2L -> ((2L, 125000L))))
  }

  test("timeDecayAgg: shift cap makes 64+-day ages decay to 0, not wrap") {
    // Java's long shift wraps the amount mod 64: without the cap an
    // exactly-64-day-old event would get weight 1e6 >> 0 = 1e6
    val rows = Seq(
      (1L, 1L, ts("2024-03-05T00:00:00Z")),  // reference
      (2L, 1L, ts("2024-01-01T00:00:00Z")))  // exactly 64 days earlier
      .toDF("event_id", "user_id", "ts")
    val r = Events.timeDecayAgg(rows)
      .select("recency_ppm").as[Long].head()
    assert(r == 1000000L, s"64-day-old event must contribute 0: $r")
  }

  test("trailingCounts: row-anchored frame, window edges, peers, per-user") {
    def mk(id: Long, uid: Long, us: Long) =
      (id, uid, new Timestamp(us / 1000)) // µs exactness: use whole-ms here
    // user 1: bursts at 0ms, 10ms, then isolated at 10s (window 50ms);
    // user 2: one event inside user 1's burst span — frames never mix
    val rows = Seq(
      mk(1L, 1L, 0L), mk(2L, 1L, 10000L), mk(3L, 1L, 10000000L),
      mk(4L, 2L, 5000L),
      mk(5L, 1L, 10000L)) // exact tie with id 2: RANGE includes peers
      .toDF("event_id", "user_id", "ts")
    val got = Events.trailingCounts(rows, windowUs = 50000L)
      .select("event_id", "n_trailing").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 3L, 5L -> 3L, 3L -> 1L, 4L -> 1L),
      s"hand-computed trailing frame: $got")
    // edge exactness: an event EXACTLY windowUs later is OUT of frame
    // (frame spans [us-windowUs+1, us]); anything later than t0 is IN
    val edge = Seq(mk(1L, 1L, 0L), mk(2L, 1L, 50000L))
      .toDF("event_id", "user_id", "ts")
    val e = Events.trailingCounts(edge, windowUs = 50000L)
      .select("event_id", "n_trailing").as[(Long, Long)].collect().toMap
    assert(e == Map(1L -> 1L, 2L -> 1L), s"t0 + window must be excluded: $e")
    val in = Seq(mk(1L, 1L, 1000L), mk(2L, 1L, 50000L))
      .toDF("event_id", "user_id", "ts")
    val i = Events.trailingCounts(in, windowUs = 50000L)
      .select("event_id", "n_trailing").as[(Long, Long)].collect().toMap
    assert(i == Map(1L -> 1L, 2L -> 2L), s"t0 + window - 1ms must be included: $i")
  }

  test("lateDataAudit: running-max lateness, exact p95, per-user isolation") {
    def mk(id: Long, uid: Long, us: Long) =
      (id, uid, new Timestamp(us / 1000))
    // user 1 arrival order (by id): ts 100ms, 300ms, 200ms (late by
    // 100ms), 250ms (late by 50ms); user 2: 50ms then 400ms (in order
    // — user 1's 300ms max must not leak into user 2)
    val rows = Seq(
      mk(1L, 1L, 100000L), mk(2L, 1L, 300000L), mk(3L, 1L, 200000L),
      mk(4L, 1L, 250000L), mk(5L, 2L, 50000L), mk(6L, 2L, 400000L)
    ).toDF("event_id", "user_id", "ts")
    val r = Events.lateDataAudit(rows, pct = 95)
      .as[(Long, Long, Long, Long, Long)].collect().head
    // 6 events, 2 late; max lateness 100000µs; p95 over {50000, 100000}
    // = 100000 (cum 1/2 = 50% < 95 at 50000)
    assert(r == ((6L, 2L, 333333L, 100000L, 100000L)))
  }

  test("sessionSummary: counts, users, and exact p50/p90 shapes") {
    def mk(id: Long, uid: Long, us: Long) =
      (id, uid, new Timestamp(us / 1000))
    // user 1: session A = events at 0s and 10s; session B (2h later) =
    // 3 events over 20s. user 2: one single-event session.
    val rows = Seq(
      mk(1L, 1L, 0L), mk(2L, 1L, 10000000L),
      mk(3L, 1L, 7200000000L), mk(4L, 1L, 7210000000L),
      mk(5L, 1L, 7220000000L),
      mk(6L, 2L, 0L)
    ).toDF("event_id", "user_id", "ts")
    val r = Events.sessionSummary(rows, gapSec = 3600L)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    // sessions: sizes {2,3,1} durations {10s,20s,0}; p50 size = 2,
    // p90 size = 3, p50 dur = 10s, p90 dur = 20s
    assert(r == ((3L, 2L, 2L, 3L, 10000000L, 20000000L)))
  }

  test("lateDataAudit: fully ordered stream reports zero lateness") {
    def mk(id: Long, uid: Long, us: Long) =
      (id, uid, new Timestamp(us / 1000))
    val rows = Seq(mk(1L, 1L, 1000L), mk(2L, 1L, 2000L), mk(3L, 1L, 3000L))
      .toDF("event_id", "user_id", "ts")
    val r = Events.lateDataAudit(rows)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(r == ((3L, 0L, 0L, 0L, 0L)))
  }
}
