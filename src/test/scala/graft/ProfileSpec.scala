package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Profile

class ProfileSpec extends SparkTestBase {
  import spark.implicits._

  private def fixture = Seq(
    (1L, Some("a"), Some(1.5), Some(Timestamp.valueOf("2024-01-01 00:00:00"))),
    (2L, Some("b"), Some(1.5), Some(Timestamp.valueOf("2024-01-02 00:00:00"))),
    (3L, None, Some(-2.25), None),
    (4L, Some("b"), None, Some(Timestamp.valueOf("2024-01-02 00:00:00"))))
    .toDF("id", "s", "d", "t")

  test("profiles every column in one pass: rows, nulls, distinct, range") {
    val p = Profile.dataProfile(fixture).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))).toMap
    assert(p.keySet == Set("id", "s", "d", "t"))
    assert(p("id") == ((4L, 0L, 4L, "1", "4")))
    assert(p("s") == ((4L, 1L, 2L, "a", "b")))
    // doubles stringify through DECIMAL(28,9) — fixed-point, engine-neutral
    assert(p("d") == ((4L, 1L, 2L, "-2.250000000", "1.500000000")))
    // timestamps profile as epoch-µs integers
    assert(p("t")._2 == 1L && p("t")._3 == 2L)
    assert(p("t")._4 == Timestamp.valueOf("2024-01-01 00:00:00")
      .getTime.toString + "000")
  }

  test("exact mode pays one Expand; approx mode is a single-pass plan") {
    val exact = Profile.dataProfile(fixture)
      .queryExecution.executedPlan.toString
    val approx = Profile.dataProfile(fixture, approx = true)
      .queryExecution.executedPlan.toString
    assert(exact.contains("Expand"))
    assert(!approx.contains("Expand"))
    val pa = Profile.dataProfile(fixture, approx = true).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    // HLL at these cardinalities is exact
    assert(pa == Map("id" -> 4L, "s" -> 2L, "d" -> 2L, "t" -> 2L))
  }

  // ---- ksDrift --------------------------------------------------------

  private def evFix(rows: (String, Double)*) =
    rows.zipWithIndex.map { case ((t, v), i) => (i.toLong, t, v) }
      .toDF("event_id", "event_type", "value")

  private def ks(df: org.apache.spark.sql.DataFrame) =
    Profile.ksDrift(df, "a", "b")
      .as[(Long, Long, Long, Long)].head()

  test("ksDrift: hand-computed statistic with a tie across samples") {
    // A = {1,2,3}, B = {2,3,4}: CDF gap is 1/3 at v=1,2,3 -> 333333 ppm
    val r = ks(evFix(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 2.0), ("b", 3.0), ("b", 4.0)))
    assert(r == ((3L, 3L, 4L, 333333L)))
  }

  test("ksDrift: identical samples -> 0; disjoint supports -> 1e6 ppm") {
    val same = ks(evFix(("a", 1.0), ("a", 2.5), ("b", 1.0), ("b", 2.5)))
    assert(same == ((2L, 2L, 2L, 0L)))
    val disjoint = ks(evFix(("a", 1.0), ("a", 2.0),
      ("b", 10.0), ("b", 11.0), ("b", 12.0)))
    assert(disjoint._4 == 1000000L)
  }

  test("ksDrift: ties collapse to one CDF step (value counted fully)") {
    // A = {5,5,9}, B = {5,9,9}: at v=5 |2/3-1/3|=1/3; at 9 both 1 -> 1/3
    val r = ks(evFix(("a", 5.0), ("a", 5.0), ("a", 9.0),
      ("b", 5.0), ("b", 9.0), ("b", 9.0)))
    assert(r == ((3L, 3L, 2L, 333333L)))
  }

  test("madOutliers: median/MAD flag the spike a z-score would absorb") {
    // 9 values near 10 plus one 1e9 reading. median=10 (5th of the
    // sorted 10), deviations {0x4, 1x5, 1e9-10} -> lower median (rank
    // 5) lands on 1, so MAD=1; only the spike exceeds 3*MAD. A
    // mean/stddev rule would put sigma ~3e8 and flag nothing.
    val vals = Seq(10.0, 10.0, 10.0, 10.0, 11.0, 9.0, 11.0, 9.0, 9.0, 1e9)
    val ev = vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, "purchase", v)
    }.toDF("event_id", "event_type", "value")
    val r = Profile.madOutliers(ev, "purchase", k = 3)
      .as[(Long, Double, Double, Long, Long)].head()
    assert(r == ((10L, 10.0, 1.0, 1L, 100000L)), s"got $r")
    // all-identical values: MAD = 0, nothing can exceed 0*k
    val flat = Profile.madOutliers(
      Seq((1L, "purchase", 5.0), (2L, "purchase", 5.0))
        .toDF("event_id", "event_type", "value"), "purchase")
      .as[(Long, Double, Double, Long, Long)].head()
    assert(flat == ((2L, 5.0, 0.0, 0L, 0L)))
  }

  test("ksDrift: two-phase prefix sum equals a single global-window brute force") {
    val ev = graft.sources.LogSource
      .readEvents(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("event_type"), col("value"))
    val got = Profile.ksDrift(ev, "click", "error")
      .as[(Long, Long, Long, Long)].head()
    // brute force: collect the per-value counts, cumsum in Scala
    val counts = ev
      .filter(col("event_type").isin("click", "error") &&
        col("value").isNotNull)
      .groupBy("value").agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("ca"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("cb"))
      .as[(Double, Long, Long)].collect().sortBy(_._1)
    val na = counts.map(_._2).sum; val nb = counts.map(_._3).sum
    var (cumA, cumB, dnum) = (0L, 0L, 0L)
    counts.foreach { case (_, ca, cb) =>
      cumA += ca; cumB += cb
      dnum = math.max(dnum, math.abs(cumA * nb - cumB * na))
    }
    assert(got == ((na, nb, counts.length.toLong,
      1000000L * dnum / (na * nb))))
  }

  test("lengthW1: a pure 10-char shift measures exactly 10 chars") {
    // a = {10, 20}, b = {20, 30}: both CDF gaps contribute 1/2·10 →
    // W1 = 10 chars = 10000 milli
    val d = Seq((1L, "a", 10L), (2L, "a", 20L),
      (3L, "b", 20L), (4L, "b", 30L))
      .toDF("doc_id", "source", "n_chars")
    val r = graft.operators.Profile.lengthW1(d)
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(r == Seq(("a", "b", 2L, 2L, 10000L)))
    Caches.releaseAll()
  }

  test("lengthW1: identical distributions sit at zero; every pair " +
    "appears once (a < b)") {
    val d = Seq((1L, "a", 10L), (2L, "a", 30L),
      (3L, "b", 10L), (4L, "b", 30L),
      (5L, "c", 10L), (6L, "c", 30L))
      .toDF("doc_id", "source", "n_chars")
    val r = graft.operators.Profile.lengthW1(d)
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(r == Seq(("a", "b", 2L, 2L, 0L), ("a", "c", 2L, 2L, 0L),
      ("b", "c", 2L, 2L, 0L)))
    Caches.releaseAll()
  }
}
