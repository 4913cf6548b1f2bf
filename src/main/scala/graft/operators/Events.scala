package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** LLM-data-pipeline operators over the `events` stream table
  * (SURVEY §2.4): exact dedup, approximate distinct, props parsing with
  * malformed-record drop (P12 analog, reference logspoutkinesis.go:200-206),
  * sessionization, and event-time windows.
  *
  * Scale notes are per-operator; the common theme is: one shuffle on the
  * natural key, partial aggregation map-side, no driver-side collects.
  */
object Events {

  /** Exact deduplication: keep the FIRST record (by time, then id) per
    * logical key. At scale: a single hash shuffle on the key; the window
    * sorts only within each key group (tiny), not per partition. For
    * hot-key skew, pre-aggregate with AQE skew-join handling or salt the
    * key — the `events` fixture keys are uniform. */
  def exactDedup(events: DataFrame, keys: Seq[Column],
                 order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    events.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Approximate distinct count (HLL++) per group — the 100 TB answer to
    * COUNT(DISTINCT): partial sketches merge map-side, one small shuffle
    * of sketch bytes instead of a full distinct shuffle. The estimate is
    * only exact while the sketch stays sparse, so the oracle-checked
    * contract is the exact count plus an assertion that the HLL estimate
    * landed within 1% (rsd=0.005 ⇒ ~2σ) — holds at ANY scale factor,
    * verified at sf0.01 (err 0%) and sf0.1 (err 0.07%). */
  def approxDistinctUsers(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"))
      .agg(count_distinct(col("user_id")).as("n_users"),
        approx_count_distinct(col("user_id"), 0.005).as("n_approx"))
      .select(col("event_type"), col("n_users"),
        (abs(col("n_approx") - col("n_users")) * 100 <= col("n_users"))
          .as("hll_ok"))

  val propsSchema: StructType = StructType(Seq(StructField("k", IntegerType)))

  /** Structured log-line parsing via regexp_extract (the grok-style
    * path for non-JSON payloads): "<word> #<id>" → typed columns.
    * Pure per-row, codegen'd, no shuffle. Non-matching lines yield ""
    * from regexp_extract — explicitly nulled before the numeric cast
    * because ANSI mode (Spark 4 default) THROWS on CAST('' AS BIGINT)
    * rather than returning null. */
  def parseLogLine(df: DataFrame, line: Column): DataFrame = {
    val id = regexp_extract(line, "^(\\w+) #(\\d+)$", 2)
    df.withColumn("msg_type", regexp_extract(line, "^(\\w+) #(\\d+)$", 1))
      .withColumn("msg_id",
        when(id === "", lit(null)).otherwise(id).cast("long"))
  }

  /** Parse the JSON `props` payload into typed columns (from_json is
    * codegen'd; schema declared, never inferred). */
  def parseProps(events: DataFrame): DataFrame =
    events.withColumn("parsed", from_json(col("props"), propsSchema))
      .withColumn("k", col("parsed.k")).drop("parsed")

  /** Deterministically corrupt ~1% of props payloads (every 97th event)
    * so the malformed-drop path is exercised — the fixture's props are
    * all well-formed. */
  def withCorruptedProps(events: DataFrame): DataFrame =
    events.withColumn("props",
      when(col("event_id") % 97 === 0,
        concat(lit("X"), expr("substring(props, 2)")))
        .otherwise(col("props")))

  /** parseProps with an exception-free guard for the malformed-drop
    * path: payloads that are not even object-shaped (truncated writes,
    * garbage prefixes — the dominant corruption class in a log stream)
    * are nulled by a cheap codegen'd prefix/suffix check BEFORE
    * from_json, so a corrupt-record storm costs one branch per row
    * instead of one Jackson parse exception per row (each of which
    * pays a full stack-trace fill whenever the JVM's fast-throw
    * elision hasn't compiled the throw site — the difference between
    * 0.5 s and ~10 s on this very query under code-cache pressure).
    * Shape-passing records that still fail to parse are nulled by
    * from_json's PERMISSIVE contract exactly as before; the DuckDB
    * twin's json_valid guard agrees on every class. */
  def parsePropsGuarded(events: DataFrame): DataFrame = {
    // anchored rlike, not ltrim/startsWith: Spark's single-arg trims
    // strip only the space character, and a payload padded with
    // \t/\n/\r is still valid JSON to from_json AND to the twin's
    // json_valid — the guard must accept every whitespace class both
    // parsers accept
    val shaped = col("props").isNotNull &&
      col("props").rlike("^\\s*\\{") && col("props").rlike("\\}\\s*$")
    events.withColumn("parsed",
        when(shaped, from_json(col("props"), propsSchema)))
      .withColumn("k", col("parsed.k")).drop("parsed")
  }

  /** P12 analog (go :200-206): records whose payload fails to parse are
    * dropped and the stream continues. from_json yields NULL fields on
    * malformed input; the filter is pushed into the scan stage. */
  def dropMalformed(parsed: DataFrame): DataFrame =
    parsed.filter(col("k").isNotNull)

  /** Sessionization: a new session starts when a user's inter-event gap
    * exceeds `gapSec`. Two windows over ONE shuffle on user_id (Catalyst
    * reuses the exchange); integer µs arithmetic so any engine agrees.
    * At scale: sessions are computed per-user independently — shuffle is
    * by user_id, skewed power-users handled by AQE. */
  def sessionize(events: DataFrame, gapSec: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val prevTs = lag(unix_micros(col("ts")), 1).over(byUser)
    val isNew = when(prevTs.isNull
      || unix_micros(col("ts")) - prevTs > gapSec * 1000000L, 1L).otherwise(0L)
    events.withColumn("session_id",
      sum(isNew).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Native session windows (`session_window(ts, gap)`) — the operator
    * Structured Streaming uses for keyed session state; in batch it
    * compiles to a single shuffle on user_id + in-partition merge. The
    * lag-gap `sessionize` above is the hand-rolled twin; this is the
    * engine-native one. Session end = last event + gap (Spark's
    * half-open-window contract), mirrored in the oracle. */
  def sessionWindows(events: DataFrame, gap: String = "1 hour"): DataFrame =
    events.groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n"), min("event_id").as("first_eid"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n"), col("first_eid"))

  /** Event-time tumbling windows (the batch twin of the streaming
    * `window()` + watermark aggregation): per (hour, event_type) counts
    * and id bounds. Integer aggregates only — cross-engine determinism
    * without float-summation-order hazards. */
  def hourlyWindows(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        min("event_id").as("min_eid"), max("event_id").as("max_eid"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("min_eid"), col("max_eid"))

  /** Per-(hour, type) approximate distinct users — the WINDOWED form
    * of [[approxDistinctUsers]]: the HLL sketch rides the same
    * one-shuffle windowed aggregation as [[hourlyWindows]] (partial
    * sketches merge map-side), which is the 100 TB answer to
    * per-window COUNT(DISTINCT) — per-window cardinality never costs a
    * second distinct shuffle. Gated like approx_distinct: the exact
    * count crosses the hash compare, the estimate only as a ≤1% bound
    * flag (exact in the sketch's sparse regime, which per-window
    * cardinalities sit in at any fixture SF). */
  def windowedDistinctUsers(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count_distinct(col("user_id")).as("n_users"),
        approx_count_distinct(col("user_id"), 0.005).as("__a"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_users"),
        (abs(col("__a") - col("n_users")) * 100 <= col("n_users"))
          .as("hll_ok"))

  /** Hierarchical rollup: per-(event_type, user decile) counts plus
    * the per-type and grand totals in ONE pass — Spark expands rollup
    * grouping sets before the single shuffle with map-side partial
    * aggregation, so the subtotal levels cost one constant expansion
    * factor, not one job per level. Integer aggregates only. */
  def rollupCounts(events: DataFrame): DataFrame =
    events.withColumn("user_decile", (col("user_id") % 10).cast("long"))
      .rollup(col("event_type"), col("user_decile"))
      .agg(count(lit(1)).as("n"), min("event_id").as("min_eid"))

  /** CUBE sibling of rollupCounts: all 4 grouping sets (leaf, per-type,
    * per-decile, grand) in the same single-shuffle expansion. */
  def cubeCounts(events: DataFrame): DataFrame =
    events.withColumn("user_decile", (col("user_id") % 10).cast("long"))
      .cube(col("event_type"), col("user_decile"))
      .agg(count(lit(1)).as("n"), min("event_id").as("min_eid"))

  /** GROUPING SETS sibling of rollup/cube: an EXPLICIT, non-hierarchical
    * set list — (type × dow), (type), (dow) but NO grand total — which
    * neither ROLLUP nor CUBE can express. Same single-shuffle grouping
    * expansion; the distinct-user count rides the same pass. */
  def groupingSetsCounts(events: DataFrame): DataFrame =
    events.select(col("event_type"),
        expr("pmod(unix_micros(ts) div 86400000000 + 4, 7)").as("dow"),
        col("user_id"))
      .groupingSets(
        Seq(Seq(col("event_type"), col("dow")), Seq(col("event_type")),
          Seq(col("dow"))),
        col("event_type"), col("dow"))
      .agg(count(lit(1)).as("n"), count_distinct(col("user_id")).as("n_users"))

  /** Pivot: event_type × user-decile count matrix. Spark's pivot with
    * an EXPLICIT value list is one shuffle (values known at plan time
    * → no discovery pass); an unlisted pivot would first run a
    * distinct scan to find the columns — never do that at scale.
    * Empty cells are 0 (coalesce) to match SQL conditional counts. */
  def pivotCounts(events: DataFrame): DataFrame = {
    val d = events.withColumn("user_decile", (col("user_id") % 10).cast("long"))
    val p = d.groupBy("event_type")
      .pivot("user_decile", (0 to 9).map(i => java.lang.Long.valueOf(i.toLong)))
      .agg(count(lit(1)))
    p.select(col("event_type") +: (0 to 9).map(i =>
      coalesce(col(i.toString), lit(0L)).as(s"d$i")): _*)
  }

  /** Approximate percentile with the same oracle contract as the HLL
    * sketch (approxDistinctUsers): the checked values are the EXACT
    * integer-quantized p50/p90 of `value` (identical sort-based
    * interpolation in both engines — type-7 quantile, the same
    * correctly-rounded doubles), plus a boolean asserting Spark's
    * mergeable percentile_approx sketch landed within 1% of exact.
    * At scale only the sketch path runs (partial sketches merge
    * map-side); the exact twin exists to make the sketch checkable. */
  def approxPercentiles(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"))
      .agg(
        floor(expr("percentile(value, 0.5)") * 1000000L).cast("long")
          .as("p50_micro"),
        floor(expr("percentile(value, 0.9)") * 1000000L).cast("long")
          .as("p90_micro"),
        expr("approx_percentile(value, 0.5, 10000)").as("__a50"),
        expr("percentile(value, 0.5)").as("__e50"))
      .select(col("event_type"), col("p50_micro"), col("p90_micro"),
        (abs(col("__a50") - col("__e50")) * 100 <= abs(col("__e50")))
          .as("sketch_ok"))

  /** Sliding event-time windows (1 h duration, 30 min slide) — the
    * overlapping-window member of the window family (tumbling =
    * hourlyWindows, session = sessionWindows). Spark expands each
    * event into its duration/slide = 2 member windows before the
    * group-by; same single shuffle with map-side partial aggregation,
    * input amplified by the constant overlap factor only. */
  def slidingWindows(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        min("event_id").as("min_eid"), max("event_id").as("max_eid"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("min_eid"), col("max_eid"))

  /** Per-event TRAILING window count — for every event, how many events
    * its user produced in the preceding `windowUs` microseconds
    * (inclusive of the event itself): the rate-limit / burst-detection
    * primitive, and the window CLASS the grid aggregations can't
    * express (event_windows/sliding_windows bucket time into a fixed
    * grid; this frame is anchored at each row). A RANGE frame over the
    * µs ordinal keeps the semantics purely integer and engine-exact.
    *
    * 100 TB shape: ONE user-keyed shuffle + per-partition sort; the
    * running frame is maintained by two pointers over the sorted run —
    * state is O(events inside the window span), never the user's whole
    * history. No self-join (the naive twin is events ⋈ events on user
    * + time-range — quadratic in the hot user). */
  def trailingCounts(events: DataFrame, windowUs: Long = 3600000000L): DataFrame = {
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    val w = Window.partitionBy("user_id").orderBy(col("us"))
      .rangeBetween(-(windowUs - 1), Window.currentRow)
    events
      .select(col("event_id"), col("user_id"),
        expr("unix_micros(ts)").as("us"))
      .withColumn("n_trailing", count(lit(1)).over(w))
  }

  /** Ingestion-outage detector: the top-k largest silent gaps between
    * consecutive NON-EMPTY minutes of the event stream — the "did the
    * shipper die at 3am" audit (the reference's whole job is to never
    * create such gaps; this op is how you'd catch one).
    *
    * Scale shape: the corpus collapses to the distinct-minute table
    * first (one map-side-combined aggregate; its size is bounded by
    * the TIME SPAN, never the corpus — 43 200 rows per month), the
    * lead window runs over that bounded table, and the top-k is
    * TakeOrdered. Total order: (gap desc, start asc). */
  def outageGaps(events: DataFrame, k: Int = 20): DataFrame = {
    val minutes = events
      .select(expr("unix_micros(ts) div 60000000").as("m"))
      .distinct()
    val w = Window.orderBy(col("m"))
    minutes
      .withColumn("next_m", lead(col("m"), 1).over(w))
      .filter(col("next_m") - col("m") > 1)
      .select((col("m") + 1).as("gap_start_min"),
        (col("next_m") - col("m") - 1).as("gap_minutes"),
        col("next_m").as("resumed_min"))
      .orderBy(col("gap_minutes").desc, col("gap_start_min"))
      .limit(k)
  }

  /** Per-event recency features — the two behavioral columns every
    * event-level model starts with: gap_us (µs since this user's
    * previous event; NULL on the first — a synthetic 0 would be an
    * invented observation) and ordinal (the user's 1-based event
    * index). ONE user-keyed window (lag and row_number share the same
    * sort), per-partition state O(1); the feature-engineering twin of
    * sessionize's gap test. */
  def recencyFeatures(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("us"), col("event_id"))
    events
      .select(col("event_id"), col("user_id"),
        expr("unix_micros(ts)").as("us"))
      .select(col("event_id"), col("user_id"),
        (col("us") - lag(col("us"), 1).over(w)).as("gap_us"),
        row_number().over(w).cast("long").as("ordinal"))
      .orderBy("event_id")
  }

  /** Fixed-width histogram over the metric column — the profiling
    * primitive behind distribution dashboards and outlier triage. One
    * groupBy on the bin id with map-side partial aggregation; output
    * size is the bin count, independent of input size, so at 100 TB
    * this is a full scan into a few-KB result.
    *
    * Bin width is 0.5 so the bin id is floor(value × 2): ×2 only bumps
    * the double's exponent (always exact) and floor is
    * correctly-rounded in every engine — the bin assignment is
    * bit-identical cross-engine with NO epsilon anywhere. bin_lo
    * (= bin × 0.5) is exact for the same reason. */
  def valueHistogram(events: DataFrame): DataFrame =
    events.groupBy(floor(col("value") * 2).as("bin"))
      .agg(count(lit(1)).as("n"),
        min("event_id").as("min_eid"), max("event_id").as("max_eid"))
      .select(col("bin"), (col("bin") * lit(0.5)).as("bin_lo"),
        col("n"), col("min_eid"), col("max_eid"))

  /** Ordered-funnel analysis: how far each user progresses through the
    * `steps` sequence (default view → click → purchase), where every
    * step must happen STRICTLY after the previous one and within
    * `windowUs` of it — the conversion query every event pipeline runs,
    * for ANY number of steps.
    *
    * Each step is one filtered groupBy(user) for the earliest
    * qualifying event, then a hash join back on user_id; the candidate
    * set shrinks every step (only users who completed step k are
    * joined for step k+1), so the expensive scans are the per-step
    * event filters — partition-pruned by event_type at a real
    * deployment's layout — and every shuffle is keyed on user_id. No
    * per-user event list is ever collected: state per user per step is
    * ONE timestamp, never the history (the collect_list funnel is the
    * unbounded-buffer anti-pattern this shape exists to avoid).
    * Timestamps are compared in integer epoch-µs. */
  /** Per-step earliest-qualifying times (the shared funnel chain):
    * element k is (user_id, t) for users reaching step k, t the
    * earliest time step k qualified given step k−1's anchor.
    * [[funnelLevels]] (levels) and [[funnelLag]] (conversion-time
    * distribution) both compose this. */
  private def funnelStepTimes(events: DataFrame, steps: Seq[String],
                              windowUs: Long): Seq[DataFrame] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val ev = events.select(col("user_id"), col("event_type"),
      expr("unix_micros(ts)").as("us"))
    val first = ev.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min("us").as("t"))
    // scanLeft: step k+1's earliest qualifying event anchors on step
    // k's earliest time — the same per-step join/agg the 3-step form
    // hand-unrolled, identical plan for the default steps
    steps.tail.scanLeft(first) { (prev, step) =>
      ev.filter(col("event_type") === step).as("e")
        .join(prev.as("p"), col("e.user_id") === col("p.user_id")
          && col("e.us") > col("p.t")
          && col("e.us") <= col("p.t") + windowUs)
        .groupBy(col("e.user_id")).agg(min("us").as("t"))
    }
  }

  def funnelLevels(events: DataFrame,
                   steps: Seq[String] = Seq("view", "click", "purchase"),
                   windowUs: Long = 6L * 3600 * 1000000): DataFrame = {
    val ev = events.select(col("user_id"), col("event_type"),
      expr("unix_micros(ts)").as("us"))
    val stepTimes = funnelStepTimes(events, steps, windowUs)
    val joined = stepTimes.zipWithIndex.foldLeft(
        ev.select("user_id").distinct()) { case (acc, (s, i)) =>
      acc.join(s.select(col("user_id"), lit(1L).as(s"__l${i + 1}")),
        Seq("user_id"), "left")
    }
    val n = steps.size
    val level = (1 until n).foldLeft(
        when(col(s"__l$n").isNotNull, n.toLong)) { (w, d) =>
      w.when(col(s"__l${n - d}").isNotNull, (n - d).toLong)
    }.otherwise(0L)
    joined.select(col("user_id"), level.as("funnel_level"))
  }

  /** Conversion-TIME distribution through the whole funnel — "how long
    * does view→purchase take for the users who make it": per
    * converting user the µs gap between the first-step anchor and the
    * last step's earliest qualifying time, summarized as the exact
    * empirical p50/p90 via [[Prefix.rankSelect]] (minute blocks).
    * Converters and their two times come from the SAME
    * [[funnelStepTimes]] chain the level report uses, so the two
    * queries can never disagree about who converted. One row out. */
  def funnelLag(events: DataFrame,
                steps: Seq[String] = Seq("view", "click", "purchase"),
                windowUs: Long = 6L * 3600 * 1000000): DataFrame = {
    val times = funnelStepTimes(events, steps, windowUs)
    val gaps = times.last.select(col("user_id"), col("t").as("__tl"))
      .join(times.head.select(col("user_id"), col("t").as("__tf")),
        "user_id")
      .select((col("__tl") - col("__tf")).as("gap_us"))
    val counts = gaps.groupBy("gap_us").agg(count(lit(1)).as("n"))
    val blk = (v: Column) => floor(v / lit(60000000d)).cast("long")
    val p50 = Prefix.rankSelect(counts, col("gap_us"), col("n"), blk, 50)
    val p90 = Prefix.rankSelect(counts, col("gap_us"), col("n"), blk, 90)
    p50.select(col("q_total").as("n_converted"),
        col("q_value").as("p50_gap_us"))
      .crossJoin(broadcast(p90.select(col("q_value").as("p90_gap_us"))))
  }

  /** Cohort retention: users bucketed by their FIRST-activity day, then
    * counted per (cohort, day-offset) — the activation/retention matrix.
    * Day arithmetic stays in integer epoch-days (FLOOR of µs / 86400e6:
    * `µs - pmod(µs, d)` is the largest multiple of d ≤ µs, so the final
    * `div` is exact), so no timezone or calendar function can diverge
    * cross-engine — including for pre-1970 timestamps, where a bare
    * `div` (truncate toward zero) would bucket day −0.5 into day 0
    * while DuckDB's flooring `//` puts it in day −1. Three keyed
    * shuffles: first-day per user, the distinct (user, day) activity
    * set, and the final (cohort, offset) count — each carries two longs
    * per row. */
  def cohortRetention(events: DataFrame): DataFrame = {
    val ev = events.select(col("user_id"),
      expr("(unix_micros(ts) - pmod(unix_micros(ts), 86400000000))" +
        " div 86400000000").as("day"))
    val cohort = ev.groupBy("user_id").agg(min("day").as("cohort_day"))
    ev.distinct().join(cohort, "user_id")
      .groupBy(col("cohort_day"),
        (col("day") - col("cohort_day")).as("offset_days"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Recency-weighted per-user engagement — the time-decay feature a
    * ranking/curation pipeline derives from an activity stream: each
    * event contributes weight 1e6 >> age_days, i.e. EXPONENTIAL decay
    * with a one-day half-life quantized to the dyadic grid, so the
    * whole aggregate is exact integer arithmetic on any engine (a
    * float exp(-λ·age) would hit the transcendental last-ulp hazard;
    * the right shift IS floor(1e6 / 2^age)). The shift amount is
    * capped at 40: Java long shifts wrap at 64 (a 70-day-old event
    * would DECAY WRONG, not to zero) and the weight is already 0 past
    * age 20, so the cap changes nothing within i64 while making the
    * expression total.
    *
    * Scale shape: the reference time is the corpus max timestamp — ONE
    * 1-row aggregate broadcast back (the rateAnomaly pattern), never a
    * driver collect; then a single map-side weight projection feeds
    * one user-keyed aggregation (map-side partial sums). Two passes
    * over the raw events, nothing persisted, shuffles carry only
    * (user_id, two longs). */
  def timeDecayAgg(events: DataFrame): DataFrame = {
    val ev = events.select(col("user_id"), expr("unix_micros(ts)").as("us"))
    val ref = ev.agg(max("us").as("ref_us"))
    ev.crossJoin(broadcast(ref))
      .select(col("user_id"),
        expr("shiftright(1000000L, cast(least((ref_us - us)" +
          " div 86400000000, 40L) as int))").as("w"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum(col("w")).as("recency_ppm"))
  }

  /** Per-window rate anomalies: flag (event_type, hour) windows whose
    * event count exceeds `factorPct`% of that type's per-window mean —
    * the spike detector a log pipeline runs over its ingest stream.
    *
    * Two aggregations: the windowed counts (one shuffle, map-side
    * partials — the only pass over the raw events), then per-type
    * totals over the ALREADY-windowed table (input = windows × types,
    * millions of rows at most, never raw events). The per-type stats
    * table has one row per event type, so it broadcast-joins back onto
    * the windowed counts — no second shuffle of the window table.
    * rate_milli = 1000 × n / mean stays in BIGINT arithmetic (the mean
    * is never materialized as a double): n × n_windows × 1000 at
    * worst ~1e9 × 1e5 × 1e3 needs the full i64 but fits. */
  /** Top user-journey prefixes: each user's first `pathLen` event
    * types joined as "a>b>c", counted and share-ranked — the
    * onboarding-flow question [[transitionMatrix]]'s one-step view
    * can't answer (a>b then b>c popular separately ≠ a>b>c popular
    * jointly). No collect_list: the prefix pivots out of the
    * rank-filtered rows with conditional aggregates, so the per-group
    * state is `pathLen` scalars; row_number ≤ k keeps Spark's
    * map-side WindowGroupLimit pruning. Ordering key (epoch-µs,
    * event_id) as in [[transitionMatrix]]. Short journeys keep their
    * short path (concat_ws skips absent steps identically in both
    * engines). */
  def topPaths(events: DataFrame, pathLen: Int = 3,
               topN: Int = 20): DataFrame = {
    require(pathLen >= 1 && topN >= 1)
    val w = Window.partitionBy("user_id")
      .orderBy(unix_micros(col("ts")), col("event_id"))
    val stepCols = (1 to pathLen).map(i =>
      max(when(col("rn") === i, col("event_type"))).as(s"__s$i"))
    val paths = events
      .select(col("user_id"), col("event_type"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= pathLen)
      .groupBy("user_id").agg(stepCols.head, stepCols.tail: _*)
      .select(concat_ws(">",
        (1 to pathLen).map(i => col(s"__s$i")): _*).as("path"))
    val total = paths.agg(count(lit(1)).as("__total"))
    paths.groupBy("path").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .select(col("path"), col("n"),
        expr("(1000000 * n) div __total").as("share_ppm"))
      .orderBy(col("n").desc, col("path"))
      .limit(topN)
  }

  /** First-order Markov transition matrix over per-user event
    * sequences — the "what do users do next" path analysis behind
    * funnel design: for every ordered pair (from, to) of CONSECUTIVE
    * events of one user, the transition count and row-normalized
    * probability in exact ppm. Ordering is (epoch-µs, event_id): the
    * explicit µs key matters because the parquet carries NANOSECOND
    * timestamps — an engine ordering raw ns against an engine reading
    * µs-truncated values would disagree exactly on sub-µs neighbors,
    * so both engines order on the truncated integer and tie-break on
    * the unique event_id. One user-keyed window shuffle (lead), then
    * a |vocab|²-sized aggregate; row totals broadcast back. */
  def transitionMatrix(events: DataFrame): DataFrame = {
    val pairs = stagedTransitionPairs(events)
      .select(col("src").as("from_type"), col("dst").as("to_type"),
        col("c").as("n"))
    val totals = pairs.groupBy("from_type")
      .agg(sum("n").as("__row_total"))
    pairs.join(broadcast(totals), "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        expr("(1000000 * n) div __row_total").as("p_ppm"))
  }

  /** Directed consecutive-transition pair counts (src, dst, c), STAGED
    * once per corpus via [[graft.Stage]]: [[transitionMatrix]],
    * [[graft.operators.Graph.pagerankEvents]], and
    * [[graft.operators.Graph.triangleCount]] each collapsed the same
    * user-keyed lead window to this vocab²-bounded table — one corpus
    * window pass now serves all three. */
  private[operators] def stagedTransitionPairs(events: DataFrame)
      : DataFrame =
    graft.Stage.parquet(events.sparkSession,
      graft.Stage.key(events, "event_transition_pairs")) {
      val w = Window.partitionBy("user_id")
        .orderBy(unix_micros(col("ts")), col("event_id"))
      events
        .select(col("event_type").as("src"),
          lead(col("event_type"), 1).over(w).as("dst"))
        .filter(col("dst").isNotNull)
        .groupBy("src", "dst").agg(count(lit(1)).as("c"))
    }

  /** CUSUM change-point detection (Page 1954) over per-type hourly
    * counts — the sequential drift detector that catches a SUSTAINED
    * small shift [[rateAnomaly]]'s single-window threshold misses (ten
    * consecutive hours at 1.3× never trip a 2× spike test, but their
    * deviations ACCUMULATE). Textbook recurrence S_t = max(0, S_{t-1}
    * + (x_t − k)) is sequential; the distributed form uses the
    * prefix-max identity S_t = P_t − min(0, min_{j≤t} P_j) with
    * P = running Σ(x−k), turning the recurrence into two window
    * functions over the SAME per-type frame — one partitioned shuffle,
    * no iteration, exact BIGINT arithmetic. The allowance k is the
    * per-type ceil-mean hourly count (broadcast back from a vocab-sized
    * aggregate); alarm when S_t > hMult·k. Hours with zero events are
    * skipped, not zero-filled: absence pulls no S downward, which is
    * conservative for upward-shift detection and keeps the plan
    * grid-free. Per-type window rows = observed hours — time-range-
    * sized, never event-count-sized. */
  def cusumChangepoints(events: DataFrame, hMult: Int = 5): DataFrame = {
    val hourly = events.groupBy(
        date_trunc("hour", col("ts")).as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
    val tot = hourly.groupBy("event_type")
      .agg(sum("n").as("__total"), count(lit(1)).as("__nh"))
      .select(col("event_type"),
        expr("(__total + __nh - 1) div __nh").as("__k"))
    val w = Window.partitionBy("event_type").orderBy("window_start")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hourly.join(broadcast(tot), "event_type")
      .withColumn("__p", sum(col("n") - col("__k")).over(w))
      .withColumn("cusum",
        col("__p") - least(min(col("__p")).over(w), lit(0L)))
      .select(col("window_start"), col("event_type"), col("n"),
        col("__k").as("k"), col("cusum"),
        (col("cusum") > col("__k") * hMult).as("alarm"))
  }

  def rateAnomaly(events: DataFrame, factorPct: Int = 200): DataFrame = {
    val wc = events.groupBy(
        date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val tot = wc.groupBy("event_type")
      .agg(sum("n").as("total"), count(lit(1)).as("n_windows"))
    wc.join(broadcast(tot), "event_type")
      .select(col("window_start"), col("event_type"), col("n"),
        expr("(1000 * n * n_windows) div total").as("rate_milli"),
        (col("n") * col("n_windows") * 100 > col("total") * factorPct)
          .as("anomaly"))
  }

  /** View→click attribution: every (view, click) pair of the same user
    * where the click lands strictly after the view and within
    * `windowSec` — the ad-tech join that credits a click to the
    * impressions that preceded it. Written so the SAME code runs as a
    * batch join and as a Spark stream-stream join: an equi-join on
    * user_id plus an event-time range condition, which is exactly the
    * shape Structured Streaming requires to buffer both sides and (when
    * watermarks are set on the inputs) evict state older than
    * view_ts + window.
    *
    * 100 TB shape: one hash shuffle per side on user_id; the time
    * predicate filters inside each joined group, so cost is bounded by
    * per-user view×click density in the window, not by the cross
    * product. Boundary semantics are integer-µs exact (timestamps ARE
    * µs longs internally): strictly after, inclusive window end. */
  def attributionJoin(views: DataFrame, clicks: DataFrame,
                      windowSec: Long = 3600L): DataFrame = {
    val v = views.select(col("event_id").as("view_id"),
      col("user_id"), col("ts").as("view_ts"))
    val c = clicks.select(col("event_id").as("click_id"),
      col("user_id").as("__cu"), col("ts").as("click_ts"))
    v.join(c, col("user_id") === col("__cu")
        && col("click_ts") > col("view_ts")
        && col("click_ts") <= col("view_ts")
          + expr(s"INTERVAL $windowSec SECOND"))
      .select(col("user_id"), col("view_id"), col("click_id"),
        (unix_micros(col("click_ts")) - unix_micros(col("view_ts")))
          .as("lag_us"))
  }

  /** Session-shape summary — the one-row dashboard over [[sessionize]]:
    * session count, sessioned users, and exact empirical p50/p90 of
    * events-per-session and session duration. The quantiles run
    * through the shared [[Prefix.rankSelect]] over DISTINCT-VALUE
    * count tables (session shapes have tiny vocabularies — a handful
    * of lengths and durations cover most sessions), so after the one
    * sessionize shuffle everything is value-vocabulary-sized; four
    * single-row quantile frames broadcast onto one base aggregate. */
  def sessionSummary(events: DataFrame, gapSec: Long = 3600L): DataFrame = {
    val per = graft.Caches.track(
      sessionize(events, gapSec)
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_ev"),
          min(unix_micros(col("ts"))).as("t0"),
          max(unix_micros(col("ts"))).as("t1"))
        .select(col("user_id"), col("n_ev"),
          (col("t1") - col("t0")).as("dur_us")))
    val evCounts = per.groupBy(col("n_ev")).agg(count(lit(1)).as("n"))
    val durCounts = per.groupBy(col("dur_us")).agg(count(lit(1)).as("n"))
    // one Prefix sweep per distribution answers BOTH percentiles
    def q(counts: DataFrame, v: String, out: String) =
      broadcast(Prefix.rankSelectMulti(counts, col(v), col("n"),
        x => length(bin(x)).cast("long"), Seq(50, 90))
        .select(col("q50").as(s"p50_$out"), col("q90").as(s"p90_$out")))
    per
      .agg(count(lit(1)).as("n_sessions"),
        countDistinct(col("user_id")).as("n_users"))
      .crossJoin(q(evCounts, "n_ev", "events"))
      .crossJoin(q(durCounts, "dur_us", "dur_us"))
      .select(col("n_sessions"), col("n_users"), col("p50_events"),
        col("p90_events"), col("p50_dur_us"), col("p90_dur_us"))
      .orderBy(col("n_sessions"))
  }

  /** Late-data audit — the measurement that SIZES a watermark before
    * anyone picks one: treating event_id assignment order as the
    * arrival proxy, an event's lateness is how far its event time lags
    * the latest event time already arrived for that user (running max
    * over the preceding arrival order — never a pairwise inversion
    * join, which is quadratic in the hot user). One row out: event and
    * late-event counts, lateness ppm, the max, and the exact empirical
    * p`pct` lateness via the shared [[Prefix.rankSelect]] over the
    * distinct-lateness count table. `withWatermark(p95)` then has a
    * measured basis: state cost vs the fraction of rows outside the
    * delay.
    *
    * 100 TB shape: one user-keyed window sort, a distinct-value-sized
    * quantile sweep, and two single-row aggregates — lateness vocab is
    * tiny relative to the corpus. */
  def lateDataAudit(events: DataFrame, pct: Int = 95): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val lat = events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("prev_max", max(col("us")).over(w))
      .select(when(col("prev_max").isNotNull && col("prev_max") > col("us"),
        col("prev_max") - col("us")).otherwise(lit(0L)).as("late_us"))
    val counts = lat.filter(col("late_us") > 0)
      .groupBy(col("late_us")).agg(count(lit(1)).as("n"))
    val q = Prefix.rankSelect(counts, col("late_us"), col("n"),
      v => length(bin(v)).cast("long"), pct)
    lat
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("late_us") > 0, 1L).otherwise(0L)).as("n_late"),
        max(col("late_us")).as("max_late_us"))
      .crossJoin(broadcast(q))
      .select(col("n_events"), col("n_late"),
        expr("(1000000 * n_late) div n_events").as("late_ppm"),
        col("max_late_us"),
        coalesce(col("q_value"), lit(0L)).as("p_late_us"))
      .orderBy(col("n_events"))
  }
}
