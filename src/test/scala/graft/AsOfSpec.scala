package graft

import java.sql.Timestamp
import java.time.Instant

import graft.operators.AsOf

/** Sort-based as-of join: inclusive at equal timestamps, NULL before
  * any match, carry-forward across interleaved rows, per-key
  * isolation. */
class AsOfSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.from(Instant.parse(s))

  test("lastPurchase: carry-forward, pre-match NULL, self-inclusive, per-user") {
    val events = Seq(
      // user 1: view, purchase, view, purchase, view
      (1L, ts("2024-01-01T10:00:00Z"), 1L, "view"),
      (2L, ts("2024-01-01T10:10:00Z"), 1L, "purchase"),
      (3L, ts("2024-01-01T10:15:00Z"), 1L, "view"),
      (4L, ts("2024-01-01T11:00:00Z"), 1L, "purchase"),
      (5L, ts("2024-01-01T11:30:00Z"), 1L, "view"),
      // user 2: never purchases
      (6L, ts("2024-01-01T10:05:00Z"), 2L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val r = AsOf.lastPurchase(events)
      .select("event_id", "last_purchase_id", "gap_sec")
      .as[(Long, Option[Long], Option[Long])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r(1L) == ((None, None)), "no purchase yet -> NULL")
    assert(r(2L) == ((Some(2L), Some(0L))), "purchase matches itself (inclusive)")
    assert(r(3L) == ((Some(2L), Some(300L))), "5 min after purchase 2")
    assert(r(4L) == ((Some(4L), Some(0L))), "newer purchase replaces older")
    assert(r(5L) == ((Some(4L), Some(1800L))), "30 min after purchase 4")
    assert(r(6L) == ((None, None)), "user 2 never sees user 1's purchases")
  }
}
