package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table profiling — the first thing a pipeline runs against a new
  * 100 TB drop: per-column row/null/distinct counts and value ranges,
  * in ONE aggregation over one scan (no per-column re-scan loop, no
  * driver-side iteration — the long-format output is produced by
  * exploding the single 1-row aggregate).
  *
  * Two cardinality modes:
  *  - exact (`approx = false`): `count(DISTINCT c)` per column. Catalyst
  *    rewrites the multi-distinct aggregate through one Expand (data
  *    replicated once per distinct column) — exact, but the scan is
  *    multiplied by |columns|+1. This is the mode the oracle gate runs.
  *  - approx (`approx = true`): HLL `approx_count_distinct` — a true
  *    single-pass plan (no Expand, partial aggregation on every column
  *    at once). At 100 TB this is the only sane default; the spec pins
  *    the no-Expand plan shape.
  *
  * Values are surfaced as strings with deterministic cross-engine
  * formatting: integers/strings cast directly, timestamps as epoch-µs
  * integers, floating point through DECIMAL(28,9) so neither engine's
  * shortest-round-trip float printer gets a vote. */
object Profile {

  private def strOf(c: Column, dt: DataType): Column = dt match {
    case DoubleType | FloatType => c.cast(DecimalType(28, 9)).cast("string")
    case TimestampType => unix_micros(c).cast("string")
    case _ => c.cast("string")
  }

  def dataProfile(df: DataFrame, approx: Boolean = false): DataFrame = {
    val fields = df.schema.fields.toSeq
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      Seq(
        count(c).as(s"__n_${f.name}"),
        (if (approx) approx_count_distinct(c) else countDistinct(c))
          .cast("long").as(s"__d_${f.name}"),
        strOf(min(c), f.dataType).as(s"__mn_${f.name}"),
        strOf(max(c), f.dataType).as(s"__mx_${f.name}"))
    }
    val allAggs = count(lit(1)).as("__rows") +: aggs
    val one = df.agg(allAggs.head, allAggs.tail: _*)
    val entries = fields.map { f =>
      struct(lit(f.name).as("column"),
        col("__rows").as("n_rows"),
        (col("__rows") - col(s"__n_${f.name}")).as("n_null"),
        col(s"__d_${f.name}").as("n_distinct"),
        col(s"__mn_${f.name}").as("min_str"),
        col(s"__mx_${f.name}").as("max_str"))
    }
    one.select(explode(array(entries: _*)).as("p")).select("p.*")
  }

  /** Robust outlier detection by median absolute deviation — the
    * outlier law that survives the outliers themselves (a mean/stddev
    * z-score lets one 1e9 reading inflate σ until nothing flags; the
    * median and MAD have 50% breakdown). median = empirical lower
    * median via [[Prefix.rankSelect]]; MAD = the same rank-select over
    * |v − median|; flag |v − median| > k·MAD. Every comparison is a
    * SINGLE IEEE operation on values both engines read from the same
    * parquet (subtract, abs, one multiply — no reassociated sums), so
    * the float path is oracle-exact without fixed-point gymnastics.
    * Scale: two rank-selects over distinct-value count tables (the
    * two-phase serial stage sees value-range-sized block totals) + one
    * final aggregate; the deviation pass re-reads the persisted
    * values projection, one double per row. */
  def madOutliers(events: DataFrame, eventType: String, k: Int = 3)
      : DataFrame = {
    val vals = graft.Caches.track(events
      .filter(col("event_type") === eventType && col("value").isNotNull)
      .select(col("value")))
    val blk = (v: Column) => floor(v).cast("long")
    // the 1-ROW quantile frames are tracked-persisted: med feeds the
    // deviation pass AND the final aggregate, and each consumer would
    // otherwise re-execute the whole rank-select subtree (counts +
    // two-phase windows + broadcasts) — caching the single row turns
    // that into a lookup (measured 2.2s -> sub-second at sf0.01)
    val med = graft.Caches.track(Prefix.rankSelect(
      vals.groupBy("value").agg(count(lit(1)).as("n")),
      col("value"), col("n"), blk, 50)
      .select(col("q_value").as("median")))
    val devs = vals.crossJoin(broadcast(med))
      .select(abs(col("value") - col("median")).as("d"))
    val mad = graft.Caches.track(Prefix.rankSelect(
      devs.groupBy("d").agg(count(lit(1)).as("n")),
      col("d"), col("n"), blk, 50)
      .select(col("q_value").as("mad")))
    vals.crossJoin(broadcast(med)).crossJoin(broadcast(mad))
      .agg(count(lit(1)).as("n"),
        max(col("median")).as("median"), max(col("mad")).as("mad"),
        sum(when(abs(col("value") - col("median")) > col("mad") * k, 1L)
          .otherwise(0L)).as("n_outliers"))
      .select(col("n"), col("median"), col("mad"), col("n_outliers"),
        expr("(1000000 * n_outliers) div n").as("outlier_ppm"))
  }

  /** Two-sample Kolmogorov–Smirnov drift test between the `value`
    * distributions of two event types — the standard "did this week's
    * data shift?" check a training pipeline runs between corpus drops.
    * D = max over observed values of |F_a(v) − F_b(v)|; with integer
    * cross-multiplication D·n_a·n_b = max |cum_a(v)·n_b − cum_b(v)·n_a|
    * the statistic is EXACT BIGINT arithmetic end-to-end (no float CDF
    * crosses the oracle), reported as d_ppm = 1e6·d_num div (n_a·n_b).
    * Ties are handled the textbook way: the CDF steps after ALL rows of
    * an equal value, which the per-distinct-value aggregation gives for
    * free.
    *
    * Scale shape: one scan → groupBy(value) with map-side combine (the
    * per-side counts), then the two-phase distributed prefix sum over
    * the distinct-value table (the packSequences pattern — a global
    * `Window.orderBy` would drag every distinct value through ONE
    * task): per-block cumsums partition on floor(value); block totals
    * (value-range-sized, not corpus-sized) take the trivial serial
    * window; the block prefix broadcast-joins back. Output is ONE row.
    * Assumes a value range dense enough that integer floors bound
    * per-block row counts — true for bounded metrics (latencies,
    * prices); re-block by floor(value·s) for narrow ranges. */
  def ksDrift(events: DataFrame, typeA: String, typeB: String)
      : DataFrame = {
    // tracked persist: cumsum, block prefix, AND the 1-row totals all
    // read this table — without the cache the corpus scan runs three
    // times. The cached projection is one double + two longs per
    // DISTINCT value (the packSequences discipline).
    val counts = graft.Caches.track(events
      .filter(col("event_type").isin(typeA, typeB) &&
        col("value").isNotNull)
      .groupBy("value")
      .agg(
        sum(when(col("event_type") === typeA, 1L).otherwise(0L)).as("ca"),
        sum(when(col("event_type") === typeB, 1L).otherwise(0L)).as("cb")))
    val totals = counts.agg(sum("ca").as("n_a"), sum("cb").as("n_b"))
    Prefix.inclusiveCumsum(counts, floor(col("value")).cast("long"),
        col("value"), Seq("a" -> col("ca"), "b" -> col("cb")))
      .select(col("value"), col("cum_a"), col("cum_b"))
      .crossJoin(broadcast(totals))
      // cross-multiplied CDF steps overflow a 64-bit lane once
      // n_a·n_b > 2^63 (~3e9 rows per side) — DECIMAL(38,0) lanes for
      // the products (HUGEINT in the twin), BIGINT ppm out
      .agg(
        max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        count(lit(1)).as("n_values"),
        max(abs(expr("CAST(cum_a AS DECIMAL(38,0)) * n_b") -
          expr("CAST(cum_b AS DECIMAL(38,0)) * n_a"))).as("__dnum"))
      .select(col("n_a"), col("n_b"), col("n_values"),
        expr("""CAST((1000000 * __dnum)
                     div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)""")
          .as("d_ppm"))
  }

  /** Exact per-GROUP empirical quantiles (lower-quantile convention —
    * the smallest observed value whose inclusive rank reaches pct% —
    * the same definition as [[Prefix.rankSelect]], so nothing
    * interpolated crosses an oracle).
    *
    * The naive per-group form is a window over every row partitioned
    * by group — per-partition state is GROUP-sized, a straggler when
    * one event type carries half the corpus. Here the cumsum runs on
    * the per-(group, value) COUNT table through the shared global
    * [[Prefix.inclusiveCumsum]] (order = struct(group, value), block =
    * struct(group, floor(value)) — a lawful coarsening of the order),
    * and the cross-group carry is stripped afterwards: each group's
    * local rank = global cum − (global cum at the group's end − group
    * total), a groups-sized broadcast. Serial state never exceeds
    * block totals; no partition is ever group-sized. */
  /** Per-(event_type, value) counts — the shared base of the
    * distributional Profile family, staged once per corpus via
    * [[graft.Stage]] (r12): groupedPercentiles (and winsorize through
    * it) and quantileNormalize each re-ran the same corpus groupBy to
    * reach this distinct-value-sized table. Streaming inputs bypass
    * staging. */
  private def stagedTypeValueCounts(events: DataFrame): DataFrame = {
    def plan = events
      .filter(col("value").isNotNull)
      .groupBy(col("event_type"), col("value"))
      .agg(count(lit(1)).as("n"))
    if (events.isStreaming) plan
    else graft.Stage.parquet(events.sparkSession,
      graft.Stage.key(events, "type_value_counts"))(plan)
  }

  def groupedPercentiles(events: DataFrame, pcts: Seq[Int] = Seq(50, 90))
      : DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p > 0 && p < 100))
    val counts = graft.Caches.track(stagedTypeValueCounts(events))
    val cum = Prefix.inclusiveCumsum(counts,
      struct(col("event_type"), floor(col("value")).cast("long")),
      struct(col("event_type"), col("value")),
      Seq("n" -> col("n")))
    val offsets = cum.groupBy("event_type")
      .agg(max(col("cum_n")).as("__end"), sum(col("n")).as("total"))
      .select(col("event_type"), (col("__end") - col("total")).as("off"),
        col("total"))
    val local = cum.join(broadcast(offsets), Seq("event_type"))
      .withColumn("__c", col("cum_n") - col("off"))
    val aggs = pcts.map(p =>
      min(when(col("__c") * 100 >= col("total") * p, col("value")))
        .as(s"p$p"))
    local.groupBy("event_type")
      .agg(aggs.head, aggs.tail: _*)
      .orderBy("event_type")
  }

  /** Per-type empirical-CDF (quantile) normalization: each event's
    * value becomes its within-type inclusive rank in ppm — the
    * distribution-free feature scaling that makes heterogenous metrics
    * comparable before any model sees them (and the standard defense
    * against heavy tails that z-scoring can't survive).
    *
    * Same machinery as [[groupedPercentiles]]: the rank table is built
    * ONCE on the per-(type, value) counts via the global Prefix sweep
    * + carry strip, then events join it on (type, value) — the rank
    * work is distinct-value-sized, only the final join touches corpus
    * rows. cdf_ppm = ⌊1e6·rank/total⌋, all integer. */
  def quantileNormalize(events: DataFrame): DataFrame = {
    val counts = graft.Caches.track(stagedTypeValueCounts(events))
    val cum = Prefix.inclusiveCumsum(counts,
      struct(col("event_type"), floor(col("value")).cast("long")),
      struct(col("event_type"), col("value")),
      Seq("n" -> col("n")))
    val offsets = cum.groupBy("event_type")
      .agg(max(col("cum_n")).as("__end"), sum(col("n")).as("total"))
      .select(col("event_type"), (col("__end") - col("total")).as("off"),
        col("total"))
    val ranks = cum.join(broadcast(offsets), Seq("event_type"))
      .select(col("event_type"), col("value"),
        expr("(1000000 * (cum_n - off)) div total").as("cdf_ppm"))
    events.filter(col("value").isNotNull)
      .select(col("event_id"), col("event_type"), col("value"))
      .join(ranks, Seq("event_type", "value"))
      .select(col("event_id"), col("event_type"), col("value"),
        col("cdf_ppm"))
      .orderBy("event_id")
  }

  /** Winsorization at per-type empirical [pLo, pHi]: values clamp to
    * the quantile cuts instead of being dropped — the robust-stats
    * alternative to outlier deletion that keeps row counts (and
    * therefore joins) intact. Cuts come from [[groupedPercentiles]]
    * (types-sized, broadcast back); the clamp itself is a pure
    * projection. Both cut values and clamped values are fixture
    * doubles compared/copied bit-for-bit — no arithmetic touches
    * them, so the float path crosses the oracle exactly. */
  def winsorize(events: DataFrame, pLo: Int = 10, pHi: Int = 90): DataFrame = {
    val cuts = groupedPercentiles(events, Seq(pLo, pHi))
      .select(col("event_type"), col(s"p$pLo").as("lo"),
        col(s"p$pHi").as("hi"))
    events.filter(col("value").isNotNull)
      .join(broadcast(cuts), Seq("event_type"))
      .select(col("event_id"), col("event_type"), col("value"),
        least(greatest(col("value"), col("lo")), col("hi")).as("clipped"),
        (col("value") < col("lo") || col("value") > col("hi"))
          .as("was_clipped"))
      .orderBy("event_id")
  }

  /** Pairwise Wasserstein-1 (earth-mover) distance between the
    * per-source doc-length distributions — the INTEGRAL drift measure
    * beside [[ksDrift]]'s sup-gap: on an ordered domain
    * W1 = Σᵥ |CDF_a(v) − CDF_b(v)|·Δv, so the answer reads in
    * CHARACTERS ("source b's docs are ~340 chars longer-shifted"),
    * which a sup statistic can't say. Exact by cross-multiplying the
    * two CDFs: |cum_a·N_b − cum_b·N_a|·Δv summed in DECIMAL(38,0)
    * lanes, divided once by N_a·N_b at the end (milli-char units,
    * non-negative operands).
    *
    * Shape: corpus collapses ONCE to the tracked (source, length)
    * count table; the support (distinct lengths + gap-to-next) and the
    * |sources|×|lengths| CDF grid stay value-range-bounded; per-source
    * cumsums are bounded windows over the grid; the pair join is keyed
    * on v (|sources|² combos per value). The last support value drops
    * out structurally (both CDFs are 1 there — zero term). */
  def lengthW1(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vc = graft.Caches.track(
      docs.groupBy(col("source"), col("n_chars").as("v"))
        .agg(count(lit(1)).as("c")))
    val support = vc.select("v").distinct()
      .withColumn("gap",
        lead(col("v"), 1).over(Window.orderBy("v")) - col("v"))
      .filter(col("gap").isNotNull)
    val totals = vc.groupBy("source").agg(sum(col("c")).as("n_s"))
    val grid = vc.select("source").distinct()
      .crossJoin(broadcast(support))
      .join(vc, Seq("source", "v"), "left")
      .withColumn("cum", sum(coalesce(col("c"), lit(0L))).over(
        Window.partitionBy("source").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("source"), col("v"), col("gap"), col("cum"))
    def side(tag: String) = grid
      .join(totals, Seq("source"))
      .select(col("source").as(s"source_$tag"), col("v"), col("gap"),
        col("cum").as(s"cum_$tag"), col("n_s").as(s"n_$tag"))
    side("a").join(side("b").drop("gap"), Seq("v"))
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b", "n_a", "n_b")
      .agg(sum(abs(col("cum_a").cast("decimal(38,0)") * col("n_b")
          - col("cum_b").cast("decimal(38,0)") * col("n_a"))
        * col("gap")).as("__s"))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        expr("""CAST((1000 * __s)
                  div (CAST(n_a AS DECIMAL(38,0)) * n_b)
                AS BIGINT)""").as("w1_milli_chars"))
      .orderBy("source_a", "source_b")
  }
}
