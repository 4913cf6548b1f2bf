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
}
