package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity-lifecycle operators over the event stream: rolling active
  * users (DAU/WAU/MAU), changelog compaction (CDC apply), and
  * slowly-changing-dimension history (SCD2). These are the "state of
  * the world as of now / over time" views every ingestion pipeline
  * derives from its append-only log (the reference forwards such a log
  * verbatim — logspoutkinesis.go:182 — so these are §2.4 extensions,
  * not parity).
  *
  * Integer discipline throughout: epoch-µs BIGINTs, floor day/hour
  * division (pre-epoch-safe `(us - pmod(us, d)) div d`), doubles
  * quantized via floor(value·1e6) so no float printer crosses an
  * oracle. */
object Lifecycle {

  /** Floor division of epoch-µs to a day index — positive-safe AND
    * negative-safe (`pmod` first, so plain `div`'s toward-zero
    * truncation only ever sees an exact multiple). */
  private val dayOf: Column =
    expr("(unix_micros(ts) - pmod(unix_micros(ts), 86400000000))" +
      " div 86400000000")

  /** Rolling distinct-user counts — DAU/WAU/MAU + stickiness — WITHOUT
    * a distinct-over-sliding-window (which would re-scan 30 days of
    * user rows per day) and WITHOUT a global window sort.
    *
    * The scale trick: a user is active-in-trailing-W on day d iff some
    * active day lands in [d-W+1, d], i.e. iff d falls in the user's
    * COVERAGE SET ∪[day, day+W-1]. Per user, consecutive active days
    * whose coverage overlaps (gap ≤ W-1) merge into intervals (one
    * user-keyed window over the user's DISTINCT days — bounded by W ≤
    * span); each interval becomes a +1/-1 delta pair, and one
    * day-keyed aggregate + the shared [[Prefix.inclusiveCumsum]] sweep
    * (serial stage sees day-count-sized block totals only) yields the
    * rolling count for EVERY day in one pass. Work is O(user-days),
    * never O(days × window).
    *
    * Output: one row per day with events — epoch day index, dau, wau,
    * mau, stickiness_ppm = 1e6·dau/mau (integer div; dau ≤ mau so this
    * is a proper ratio in [0, 1e6]). */
  def activeUsers(events: DataFrame, wauDays: Int = 7, mauDays: Int = 30): DataFrame = {
    val userDays = events
      .select(col("user_id"), dayOf.as("day"))
      .distinct() // one shuffle; everything below is user-day-sized

    // Rolling distinct count over a trailing `w`-day window, for every
    // day index in the covered range (days without events filtered by
    // the final join): interval merge -> delta sweep.
    def rolling(w: Int, name: String): DataFrame = {
      val byUser = Window.partitionBy("user_id").orderBy("day")
      val marked = userDays.withColumn("__new",
        when(lag(col("day"), 1).over(byUser).isNull
          || col("day") - lag(col("day"), 1).over(byUser) > w - 1, 1L)
          .otherwise(0L))
      val intervals = marked
        .withColumn("__int", sum(col("__new")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("__int"))
        .agg(min(col("day")).as("lo"), (max(col("day")) + (w - 1)).as("hi"))
      // The sweep's running sum only changes at interval boundaries; a
      // zero-delta row per OBSERVED day makes the cumsum materialize
      // exactly where the report needs it (days stay day-count-sized).
      val deltas = intervals.select(col("lo").as("day"), lit(1L).as("d"))
        .unionAll(intervals.select((col("hi") + 1).as("day"), lit(-1L).as("d")))
        .unionAll(userDays.select(col("day")).distinct()
          .select(col("day"), lit(0L).as("d")))
        .groupBy("day").agg(sum(col("d")).as("d"))
      Prefix.inclusiveCumsum(deltas, expr("day div 64"),
          col("day"), Seq("d" -> col("d")))
        .select(col("day"), col("cum_d").as(name))
    }

    val dau = userDays.groupBy("day").agg(count(lit(1)).as("dau"))
    dau
      .join(rolling(wauDays, "wau"), Seq("day"))
      .join(rolling(mauDays, "mau"), Seq("day"))
      .select(col("day"), col("dau"), col("wau"), col("mau"),
        expr("(1000000 * dau) div mau").as("stickiness_ppm"))
      .orderBy("day")
  }

  /** Changelog compaction — apply an append-only CDC stream to get the
    * latest surviving row per key (the MERGE/upsert the training-data
    * snapshot loader runs before anything else reads the table).
    *
    * The events fixture stands in for the changelog: key = user_id,
    * tombstone op = 'error' (delete), everything else upserts its
    * (event_type, value). Latest = max (epoch-µs, event_id) — the
    * event_id tiebreak makes same-µs updates deterministic.
    *
    * Scale shape: ONE key-keyed aggregate with a lexicographic
    * max(struct(...)) — partial aggregation combines map-side, so the
    * shuffle carries one candidate row per key per task, never the
    * full history (the window-function twin would sort every key's
    * whole history; the oracle uses it because DuckDB plans it fine at
    * gate scale). Tombstones must survive INTO the aggregate and be
    * filtered after — filtering before would resurrect the previous
    * version. */
  def cdcApply(events: DataFrame, tombstoneType: String = "error"): DataFrame =
    events
      .select(col("user_id"),
        struct(unix_micros(col("ts")).as("last_us"),
          col("event_id").as("last_event_id"),
          col("event_type").as("last_type"),
          expr("CAST(floor(value * 1000000) AS BIGINT)").as("last_value_micro"))
          .as("__v"))
      .groupBy("user_id").agg(max(col("__v")).as("__v"))
      .select(col("user_id"), col("__v.last_us"), col("__v.last_event_id"),
        col("__v.last_type"), col("__v.last_value_micro"))
      .filter(col("last_type") =!= tombstoneType)
      .orderBy("user_id")

  /** Churn flags: each user's last-activity day against the corpus
    * horizon (max observed day — a 1-row broadcast, so "today" is
    * data-defined and reproducible, never wall-clock). days_inactive >
    * `horizonDays` ⇒ churned. One user-keyed max aggregate; output is
    * users-sized. The retention follow-up to [[activeUsers]]: that op
    * counts the living, this one names the dead. */
  def userChurn(events: DataFrame, horizonDays: Int = 7): DataFrame = {
    val lastSeen = events
      .select(col("user_id"), dayOf.as("day"))
      .groupBy("user_id").agg(max(col("day")).as("last_day"))
    val horizon = lastSeen.agg(max(col("last_day")).as("h"))
    lastSeen.crossJoin(broadcast(horizon))
      .select(col("user_id"), col("last_day"),
        (col("h") - col("last_day")).as("days_inactive"),
        (col("h") - col("last_day") > horizonDays).as("churned"))
      .orderBy("user_id")
  }

  /** SCD type-2 history — compress each user's event_type stream into
    * versioned validity intervals [from_us, to_us) (to_us NULL = the
    * current version). The standard warehouse answer to "what was this
    * entity's attribute AT time t" — the point-in-time join feeding
    * leakage-safe feature backfills.
    *
    * Two user-keyed windows, both over bounded state: the first (lag)
    * runs on the raw stream to find change points; the second
    * (row_number + lead) runs on the CHANGE ROWS ONLY — versions-sized,
    * which Zipf-bounds the second sort's input far below the corpus.
    * No global sort, no collect of version lists. */
  def scd2Intervals(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("us"), col("event_id"))
    val changes = events
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .withColumn("__prev", lag(col("event_type"), 1).over(byUser))
      .filter(col("__prev").isNull || col("__prev") =!= col("event_type"))
    val byVersion = Window.partitionBy("user_id")
      .orderBy(col("us"), col("event_id"))
    changes
      .select(col("user_id"),
        row_number().over(byVersion).cast("long").as("version"),
        col("event_type"),
        col("us").as("from_us"),
        lead(col("us"), 1).over(byVersion).as("to_us"))
      .orderBy("user_id", "version")
  }
}
