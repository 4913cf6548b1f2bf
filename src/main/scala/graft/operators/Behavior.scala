package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Behavioral analytics over the `events` stream (SURVEY §2.4
  * extension surface): peak detection, bot-regularity auditing,
  * engagement diversity, activity heatmaps, and repetition runs — the
  * usage-telemetry layer a training-data pipeline runs to decide which
  * users/slices of a log corpus are organic signal vs automation noise.
  *
  * Every statistic is an exact integer (counts, µs/s arithmetic, ppm by
  * integer cross-multiplication or a DECIMAL(38,0) lane), so results are
  * bit-identical across engines and combine orders. The common scale
  * shape: aggregate the fact down to a per-key or per-bucket table FIRST
  * (one map-side-combined shuffle), then run windows/joins on the small
  * derived table — never a window over raw event rows ordered globally.
  */
object Behavior {

  /** Daily local maxima per event type: days whose count strictly
    * exceeds both neighbors' (first/last day can't qualify — no
    * one-sided peaks). The window runs over the DAILY table
    * (|types|×|days| rows), partitioned by type — never over raw
    * events. */
  def peakDays(events: DataFrame): DataFrame = {
    val daily = events
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    daily
      .withColumn("__prev", lag(col("n_events"), 1).over(w))
      .withColumn("__next", lead(col("n_events"), 1).over(w))
      .filter(col("n_events") > col("__prev")
        && col("n_events") > col("__next"))
      .select(col("event_type"), col("day"), col("n_events"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Bot-regularity audit: the top-k users whose inter-event gaps are
    * most clock-like. Regularity = squared coefficient of variation of
    * the gap series in ppm — CV²·1e6 = 1e6·(n·Σg² − (Σg)²)/(Σg)² —
    * computed entirely in integer/DECIMAL(38,0) lanes (gaps in whole
    * seconds; the cross-multiplied form never divides by n). A human's
    * gaps are bursty (CV² ≫ 1); a cron job's are near-constant
    * (CV² ≈ 0). Scale shape: one window per user ordered by time
    * (per-key sort), one per-user aggregate, TakeOrdered for the
    * top-k — no global sort. */
  def botRegularity(events: DataFrame, minGaps: Long = 10,
                    k: Int = 20): DataFrame =
    events
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("us"))
      .withColumn("__prev", lag(col("us"), 1).over(Window
        .partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))))
      .filter(col("__prev").isNotNull)
      .select(col("user_id"),
        expr("(us - __prev) div 1000000").as("gap_s"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"), sum(col("gap_s")).as("sum_gap_s"),
        sum(expr("gap_s * gap_s")).as("sum_gap2"))
      .filter(col("n_gaps") >= minGaps && col("sum_gap_s") > 0)
      .select(col("user_id"), col("n_gaps"), col("sum_gap_s"),
        expr("""CAST(CAST(1000000 AS DECIMAL(38,0))
                * (n_gaps * CAST(sum_gap2 AS DECIMAL(38,0))
                   - CAST(sum_gap_s AS DECIMAL(38,0)) * sum_gap_s)
                div (CAST(sum_gap_s AS DECIMAL(38,0)) * sum_gap_s)
                AS BIGINT)""").as("cv2_ppm"))
      .orderBy(col("cv2_ppm"), col("user_id"))
      .limit(k)

  /** Engagement-diversity histogram: per user, the Gini–Simpson index
    * of their event-type mix — 1 − Σ(cᵢ/n)², exactly
    * (n² − Σcᵢ²)·1e6 div n² ppm — bucketed into centiles. Two
    * aggregates, both map-side combined: events → (user, type) counts →
    * per-user index → ≤100-row histogram. */
  def userDiversity(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("user_id"))
      .agg(sum(col("c")).as("n"), sum(expr("c * c")).as("sum_c2"))
      .select(expr("""CAST((CAST(1000000 AS DECIMAL(38,0))
                * (CAST(n AS DECIMAL(38,0)) * n - sum_c2)
                div (CAST(n AS DECIMAL(38,0)) * n)) div 10000
                AS BIGINT)""").as("diversity_centile"))
      .groupBy(col("diversity_centile"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("diversity_centile"))

  /** Activity heatmap: event and distinct-user counts per (day-of-week,
    * hour-of-day) cell. Calendar-free: dow = (epoch_day + 4) mod 7
    * (1970-01-01 was a Thursday, dow 0 = Sunday), hour = epoch-hour mod
    * 24 — identical arithmetic on any engine, no timezone library in
    * the plan. Output is ≤ 168 rows at any scale; the distinct-user
    * count shuffles (cell, user) pairs once. */
  def hourDowHeatmap(events: DataFrame): DataFrame =
    events
      .select(
        expr("pmod(unix_micros(ts) div 86400000000 + 4, 7)").as("dow"),
        expr("pmod(unix_micros(ts) div 3600000000, 24)").as("hour"),
        col("user_id"))
      .groupBy(col("dow"), col("hour"))
      .agg(count(lit(1)).as("n_events"),
        count_distinct(col("user_id")).as("n_users"))
      .orderBy(col("dow"), col("hour"))

  /** Repetition runs: maximal stretches of consecutive same-type events
    * within each user's timeline (the islands-and-gaps shape: global
    * row_number minus per-(user,type) row_number is constant within a
    * run). Per type: number of runs, longest run, and events in runs of
    * length ≥ 2 — the "stuck client retrying" telemetry. Both windows
    * partition by user (per-key sorts); the run table is ≤ |events|
    * but aggregates immediately to |types| rows. */
  def typeRuns(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val byUserType = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("__island",
        row_number().over(byUser) - row_number().over(byUserType))
      .groupBy(col("user_id"), col("event_type"), col("__island"))
      .agg(count(lit(1)).as("run_len"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_runs"), max(col("run_len")).as("max_run"),
        sum(when(col("run_len") >= 2, col("run_len")).otherwise(lit(0L)))
          .as("repeated_events"))
      .orderBy(col("event_type"))
  }

  /** Order-k event-type sequences: every k-consecutive-event window in
    * each user's timeline, counted corpus-wide, top-N. The joint-
    * sequence generalization of the first-3-only `top_paths` and the
    * one-step `transition_matrix` — "what do users actually DO, in
    * order" at arbitrary depth. Sequence formation is k−1 lead windows
    * over ONE per-user sort (Spark reuses the single (user) partition
    * sort for all leads — one shuffle total); counting is a
    * map-side-combined aggregate bounded by |types|^k; the final top-N
    * is TakeOrdered. */
  def seqNgrams(events: DataFrame, k: Int = 3, topN: Int = 20): DataFrame = {
    require(k >= 2 && k <= 5, s"seqNgrams: need 2 <= k <= 5, got $k")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val leads = (1 until k).map(i =>
      lead(col("event_type"), i).over(w).as(s"t$i"))
    val seqCol = concat_ws(">",
      col("event_type") +: (1 until k).map(i => col(s"t$i")): _*)
    events
      .select((col("user_id") +: col("event_type") +: col("ts") +:
        col("event_id") +: leads): _*)
      .filter((1 until k).map(i => col(s"t$i").isNotNull)
        .reduce(_ && _))
      .select(seqCol.as("seq"))
      .groupBy(col("seq"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("seq"))
      .limit(topN)
  }

  /** Fano factor (variance-to-mean, a.k.a. index of dispersion) of the
    * per-type daily count series — the overdispersion audit: F ≈ 1 is
    * Poisson-like organic traffic, F ≫ 1 is bursty/campaign-driven,
    * F ≪ 1 is suspiciously metronomic (the count-domain complement of
    * botRegularity's gap-domain CV²). Exact ppm by one DECIMAL(38,0)
    * cross-multiplication: F·1e6 = 1e6·(n·Σc² − (Σc)²) div (n·Σc) —
    * population variance over mean, no float anywhere. Input is the
    * |types|×|days| daily table (one map-side-combined shuffle);
    * output is |types| rows. */
  def fanoFactor(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("c")).as("sc"),
        sum(expr("c * c")).as("sc2"))
      .select(col("event_type"), col("n_days"), col("sc").as("n_events"),
        expr("""CAST(CAST(1000000 AS DECIMAL(38,0))
                * (n_days * sc2 - sc * sc)
                div (CAST(n_days AS DECIMAL(38,0)) * sc) AS BIGINT)""")
          .as("fano_ppm"))
      .orderBy(col("event_type"))
}
