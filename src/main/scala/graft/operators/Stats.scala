package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inferential statistics over the event stream in exact integer
  * lanes: OLS trend slope, a two-proportion z-test, and hour-of-day
  * seasonality. Complements the detection family (rate_anomaly /
  * cusum_changepoint / ks_drift) with the "is this trend/lift real"
  * questions a data-curation dashboard asks.
  *
  * Discipline (shared with Profile.ksDrift / Assoc): every statistic
  * that would normally be a float is either emitted as an exact
  * integer numerator/denominator pair or cross-multiplied into a
  * DECIMAL(38,0)-lane inequality, so the verdict hashes identically
  * in any engine and survives >2^31-row inputs. */
object Stats {

  /** Per-type OLS slope of hourly event counts against the hour index
    * — the "is traffic growing" regression, exact. x = hour - global
    * min hour (one broadcast scalar keeps x small and shared across
    * types), y = events in that hour; only observed (type, hour)
    * points enter the fit, identically in both engines.
    *
    * slope = slope_num/slope_den with slope_num = n·Σxy − Σx·Σy and
    * slope_den = n·Σx² − (Σx)² — emitted as the exact BIGINT pair
    * (slope_num may be negative; integer division of negatives is
    * where Spark `div` and DuckDB `//` part ways, so the gate hashes
    * the rational, not a quotient). rising = slope_num > 0 (den > 0
    * whenever ≥ 2 distinct hours).
    *
    * Scale shape: one (type, hour)-keyed count aggregate (map-side
    * combined), then a vocab-sized per-type aggregate; Σ lanes stay
    * in BIGINT up to ~4e5 hours × 2^31 events/hour. */
  def trendSlope(events: DataFrame): DataFrame = {
    val hourly = events
      .select(col("event_type"),
        expr("(unix_micros(ts) - pmod(unix_micros(ts), 3600000000))" +
          " div 3600000000").as("hour"))
      .groupBy("event_type", "hour").agg(count(lit(1)).as("y"))
    val minHour = hourly.agg(min(col("hour")).as("h0"))
    hourly.crossJoin(broadcast(minHour))
      .select(col("event_type"), (col("hour") - col("h0")).as("x"), col("y"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("event_type"), col("n"), col("sx"), col("sy"),
        col("sxy"), col("sxx"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("slope_den"))
      .withColumn("rising", col("slope_num") > 0)
      .orderBy("event_type")
  }

  /** Two-proportion z-test on user-level conversion between the two
    * halves of a deterministic user_id split — the A/B readout, with
    * the significance verdict computed entirely in integer lanes.
    *
    * With c/n converted/total users per arm, pooled C/N, and
    * D = c0·n1 − c1·n0:  z² = D²·N / (n0·n1·C·(N−C)).  The gate emits
    * z2_ppm = ⌊1e6·z²⌋ (all factors positive — floor and truncation
    * agree) and significant = z² ≥ 3.841459 (χ²₁ at α=0.05), decided
    * by cross-multiplication, never a float. DECIMAL(38,0) lanes
    * (HUGEINT twin): D² alone overflows int64 past ~3e9 users/arm.
    *
    * Scale shape: one user-keyed aggregate (conversion flag via max),
    * then a single conditional-sum row — nothing user-sized leaves
    * the first shuffle. */
  def abTest(events: DataFrame, convType: String = "purchase"): DataFrame =
    events
      .select(col("user_id"), pmod(col("user_id"), lit(2L)).as("arm"),
        when(col("event_type") === convType, 1L).otherwise(0L).as("c"))
      .groupBy("user_id", "arm").agg(max(col("c")).as("conv"))
      .agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("arm") === 0, col("conv")).otherwise(0L)).as("c0"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("arm") === 1, col("conv")).otherwise(0L)).as("c1"))
      .withColumn("__d",
        expr("CAST(c0 AS DECIMAL(38,0)) * n1 - CAST(c1 AS DECIMAL(38,0)) * n0"))
      .withColumn("__num",
        expr("CAST(1000000 AS DECIMAL(38,0)) * __d * __d * (n0 + n1)"))
      .withColumn("__den",
        expr("""CAST(n0 AS DECIMAL(38,0)) * n1 * (c0 + c1)
                * (n0 + n1 - c0 - c1)"""))
      .select(col("n0"), col("c0"), col("n1"), col("c1"),
        expr("CAST(__num div NULLIF(__den, 0) AS BIGINT)").as("z2_ppm"),
        // den = 0 ⇔ zero or total conversion ⇔ no variance to test
        // against — the undefined-z case reads as "not significant".
        expr("""__den > 0
                AND __num >= CAST(3841459 AS DECIMAL(38,0)) * __den""")
          .as("significant"))

  /** Leave-one-out target encoding of event_type against the value
    * target — the classic high-cardinality categorical encoder, with
    * the self-exclusion that prevents the target leaking into its own
    * row's feature. Integer lanes: target quantizes to value_micro
    * per row, the encoding ships as the exact rational (loo_num =
    * Σ−self, loo_den = n−1) — a divided double would hand the verdict
    * to a float printer, and n=1 categories (den 0) stay visibly
    * undefined instead of silently NaN.
    *
    * Scale shape: one vocab-sized (category) aggregate broadcast back;
    * the encode is a pure projection. */
  def targetEncode(events: DataFrame): DataFrame = {
    val rows = events.filter(col("value").isNotNull)
      .select(col("event_id"), col("event_type"),
        expr("CAST(floor(value * 1000000) AS BIGINT)").as("value_micro"))
    val perType = rows.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("value_micro")).as("s"))
    rows.join(broadcast(perType), Seq("event_type"))
      .select(col("event_id"), col("event_type"), col("value_micro"),
        (col("s") - col("value_micro")).as("loo_num"),
        (col("n") - 1).as("loo_den"))
      .orderBy("event_id")
  }

  /** Chi-square independence test between event_type and ISO
    * day-of-week — "is traffic shape a function of event type" (a
    * significant result means per-type weekly seasonality models are
    * worth their cost; an insignificant one means one shared model
    * does). The statistic is DEFINED as the sum of per-cell
    * ppm-floored terms — chi2_ppm = Σ_cells ⌊1e6·(o·N − r·c)² /
    * (N·r·c)⌋ — so both engines sum identical integers (exact
    * rational summation has no common BIGINT denominator; a defined
    * quantization beats a float fold). DECIMAL(38,0)/HUGEINT lanes;
    * dof = (R−1)(C−1) emitted for the caller's significance lookup.
    *
    * Scale shape: one (type, dow) cell aggregate (vocab×7), marginals
    * fold from the cell table, everything after the first shuffle is
    * cells-sized. */
  def independenceTest(events: DataFrame): DataFrame = {
    val cells = graft.Caches.track(events
      .select(col("event_type"),
        pmod(expr("(unix_micros(ts) - pmod(unix_micros(ts), 86400000000))" +
          " div 86400000000") + 3, lit(7L)).as("dow"))
      .groupBy("event_type", "dow").agg(count(lit(1)).as("o")))
    val rowM = cells.groupBy("event_type").agg(sum(col("o")).as("r"))
    val colM = cells.groupBy("dow").agg(sum(col("o")).as("c"))
    val n = cells.agg(sum(col("o")).as("n"),
      count_distinct(col("event_type")).as("nr"),
      count_distinct(col("dow")).as("nc"))
    // the FULL R×C grid — an absent cell is an OBSERVATION of zero and
    // contributes r·c/N to the statistic; dropping it would understate
    // chi² exactly where the association is strongest
    rowM.crossJoin(broadcast(colM))
      .join(cells, Seq("event_type", "dow"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .crossJoin(broadcast(n))
      .select(
        expr("""CAST(((CAST(o AS DECIMAL(38,0)) * n - CAST(r AS DECIMAL(38,0)) * c)
                      * (CAST(o AS DECIMAL(38,0)) * n - CAST(r AS DECIMAL(38,0)) * c)
                      * 1000000)
                     div (CAST(n AS DECIMAL(38,0)) * r * c) AS BIGINT)""")
          .as("term"),
        col("n"), col("nr"), col("nc"))
      .groupBy("n", "nr", "nc")
      .agg(sum(col("term")).as("chi2_ppm"), count(lit(1)).as("n_cells"))
      .select(col("n").as("n_events"), col("n_cells"),
        ((col("nr") - 1) * (col("nc") - 1)).as("dof"), col("chi2_ppm"))
      .orderBy("n_events")
  }

  /** Pairwise chi-square divergence between SOURCES over their term
    * distributions — "which crawl slices are drawn from different
    * populations": for each source pair, the two-sample chi-square
    * over the shared term vocabulary, same defined per-cell ppm-floor
    * quantization as [[independenceTest]] (cells here are (term,
    * source-of-pair) counts; a term absent from one side contributes
    * with o = 0, which the full outer cell join materializes).
    *
    * Scale shape: ONE (source, term) aggregate; the pair loop is over
    * the SOURCE VOCABULARY squared (sources are few — never
    * corpus-driven), each pair's cell table is term-vocab-sized. */
  def sourceDivergence(docs: DataFrame): DataFrame = {
    // (source, term) counts are vocab-sized (|sources|·|terms|) at any
    // corpus scale — coalesce the cached table to ONE partition so the
    // ~8 downstream pair-cell stages schedule 1 task each instead of a
    // full shuffle-partition fan of empty tasks (measured 1.9 → 0.4 s
    // at sf0.1; the corpus-sized tokenize keeps its full parallelism).
    val st = graft.Caches.track(docs
      .select(col("source"),
        explode(TextAnalysis.tokens(col("text"))).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("cnt"))
      .coalesce(1))
    val pairs = st.select(col("source").as("src_a")).distinct()
      .crossJoin(broadcast(st.select(col("source").as("src_b")).distinct()))
      .filter(col("src_a") < col("src_b"))
    val a = st.select(col("source").as("src_a"), col("term"),
      col("cnt").as("ca"))
    val b = st.select(col("source").as("src_b"), col("term"),
      col("cnt").as("cb"))
    // cells per pair = union of both sides' terms: A's terms with B's
    // count (0 if absent), plus B-only terms (LeftAnti against A)
    val cells = broadcast(pairs)
      .join(a, Seq("src_a"))
      .join(b.withColumnRenamed("cb", "cb0"), Seq("src_b", "term"), "left")
      .select(col("src_a"), col("src_b"), col("term"), col("ca"),
        coalesce(col("cb0"), lit(0L)).as("cb"))
      .unionByName(broadcast(pairs)
        .join(b, Seq("src_b"))
        .join(a.withColumnRenamed("ca", "ca0"), Seq("src_a", "term"),
          "leftanti")
        .select(col("src_a"), col("src_b"), col("term"), lit(0L).as("ca"),
          col("cb")))
    val totals = cells.groupBy("src_a", "src_b")
      .agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    cells.join(broadcast(totals), Seq("src_a", "src_b"))
      .select(col("src_a"), col("src_b"),
        expr("""CAST(((CAST(ca AS DECIMAL(38,0)) * nb - CAST(cb AS DECIMAL(38,0)) * na)
                      * (CAST(ca AS DECIMAL(38,0)) * nb - CAST(cb AS DECIMAL(38,0)) * na)
                      * 1000000)
                     div (CAST(na AS DECIMAL(38,0)) * nb * (ca + cb))
                  AS BIGINT)""").as("term_chi"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("n_terms"), sum(col("term_chi")).as("chi2_ppm"))
      .orderBy("src_a", "src_b")
  }

  /** Retention/survival curve: the share of users whose observed
    * lifetime (last day − first day) reaches k days, for every k with
    * survivors — the aggregate "how long do users stay" law that
    * cohort_retention's per-cohort matrix rolls up to. Suffix counts
    * come from the complement of the shared Prefix cumsum over the
    * LIFETIME-VALUE table (≤ span-days rows), never a per-user sort:
    * survivors(k) = total − (users with lifetime < k). */
  def survivalCurve(events: DataFrame): DataFrame = {
    val lifetimes = events
      .select(col("user_id"),
        expr("(unix_micros(ts) - pmod(unix_micros(ts), 86400000000))" +
          " div 86400000000").as("day"))
      .groupBy("user_id")
      .agg((max(col("day")) - min(col("day"))).as("lt"))
      .groupBy("lt").agg(count(lit(1)).as("nu"))
    val total = lifetimes.agg(sum(col("nu")).as("total"))
    Prefix.inclusiveCumsum(lifetimes, expr("lt div 8"), col("lt"),
        Seq("nu" -> col("nu")))
      .crossJoin(broadcast(total))
      .select(col("lt").as("lifetime_days"),
        (col("total") - col("cum_nu") + col("nu")).as("surviving"),
        col("total"),
        expr("(1000000 * (total - cum_nu + nu)) div total")
          .as("survival_ppm"))
      .orderBy("lifetime_days")
  }

  /** Exact Gini coefficient of per-user event counts — the one-number
    * engagement-concentration law (0 = everyone equal, →1 = one whale
    * is the corpus). The skew economics input next to skew_profile:
    * Gini says WHETHER load is concentrated, skew_profile names the
    * keys.
    *
    * Exact WITHOUT a global sort over users: Gini's Σ rank·x only
    * needs, per DISTINCT count value v, the number of users below it —
    * a run of n_v tied users starting at rank R contributes
    * v·(R·n_v + n_v(n_v+1)/2) regardless of tie order. So the sweep
    * runs over the COUNT-VALUE table (Zipf: O(√corpus) distinct
    * values) via the shared Prefix cumsum, blocked by count
    * bit-length (the vocab_coverage discipline). One BIGINT row out:
    * gini_num/gini_den exact, ppm floor for the headline. */
  def engagementGini(events: DataFrame): DataFrame = {
    val cv = events.groupBy("user_id").agg(count(lit(1)).as("x"))
      .groupBy("x").agg(count(lit(1)).as("nv"))
    Prefix.inclusiveCumsum(cv, length(bin(col("x"))).cast("long"),
        col("x"), Seq("nv" -> col("nv")))
      .select(
        (col("x") * ((col("cum_nv") - col("nv")) * col("nv")
          + expr("(nv * (nv + 1)) div 2"))).as("six"),
        (col("x") * col("nv")).as("s"), col("nv"))
      .agg(sum(col("nv")).as("n"), sum(col("s")).as("s"),
        sum(col("six")).as("six"))
      .select(col("n").as("n_users"), col("s").as("total_events"),
        (lit(2L) * col("six") - (col("n") + 1) * col("s")).as("gini_num"),
        (col("n") * col("s")).as("gini_den"),
        expr("(1000000 * (2 * six - (n + 1) * s)) div (n * s)")
          .as("gini_ppm"))
      .orderBy("n_users")
  }

  /** Full weekly traffic fingerprint per event type: (day-of-week ×
    * hour-of-day) counts with ppm share of the type's traffic — the
    * 168-cell heatmap behind capacity planning and "is this bot or
    * human" traffic triage (humans have weekends; cron does not).
    * dow is pure epoch arithmetic: epoch day 0 (1970-01-01) was a
    * Thursday, so ISO dow (0=Mon) = (epochDay + 3) mod 7 — no
    * calendar/locale function on either engine.
    *
    * One (type, dow, hod) aggregate + a vocab-sized totals broadcast;
    * output ≤ vocab×168 at any corpus size. */
  def weeklyProfile(events: DataFrame): DataFrame = {
    val cells = events
      .select(col("event_type"),
        pmod(expr("(unix_micros(ts) - pmod(unix_micros(ts), 86400000000))" +
          " div 86400000000") + 3, lit(7L)).as("dow"),
        pmod(expr("unix_micros(ts) div 3600000000"), lit(24L)).as("hod"))
      .groupBy("event_type", "dow", "hod").agg(count(lit(1)).as("cnt"))
    val totals = cells.groupBy("event_type").agg(sum(col("cnt")).as("total"))
    cells.join(broadcast(totals), Seq("event_type"))
      .select(col("event_type"), col("dow"), col("hod"), col("cnt"),
        expr("(1000000 * cnt) div total").as("share_ppm"))
      .orderBy("event_type", "dow", "hod")
  }

  /** Hour-of-day seasonality profile per event type: count, ppm share
    * of the type's traffic, and a peak-hour flag. The load-shaping
    * input for crawl/ingest scheduling; hod = (µs div 3600e6) mod 24
    * is pure integer arithmetic (UTC, no calendar functions — nothing
    * timezone-dependent crosses the oracle).
    *
    * One (type, hod)-keyed aggregate, then per-type totals/max
    * broadcast back — output is vocab×24-sized at any corpus size. */
  def seasonality(events: DataFrame): DataFrame = {
    val byHod = events
      .select(col("event_type"),
        pmod(expr("unix_micros(ts) div 3600000000"), lit(24L)).as("hod"))
      .groupBy("event_type", "hod").agg(count(lit(1)).as("cnt"))
    val perType = byHod.groupBy("event_type")
      .agg(sum(col("cnt")).as("total"), max(col("cnt")).as("mx"))
    byHod.join(broadcast(perType), Seq("event_type"))
      .select(col("event_type"), col("hod"), col("cnt"),
        expr("(1000000 * cnt) div total").as("share_ppm"),
        (col("cnt") === col("mx")).as("is_peak"))
      .orderBy("event_type", "hod")
  }

  /** Seasonal-naive forecast backtest with MASE (Hyndman & Koehler
    * 2006) per event type — the volume-guard loop run IN the engine:
    * forecast each day's count by the count 7 CALENDAR days earlier
    * (seasonal naive) and score it against the 1-day-earlier naive
    * baseline: MASE = Σ|n − n₋₇| / Σ|n − n₋₁| in ppm, < 1e6 ⇔ weekly
    * seasonality genuinely predicts (the acceptance test any anomaly
    * threshold on daily volume should pass first). Lags are equi-JOINS
    * on day−1/day−7, not row-offset windows — a gap day must break the
    * lag, not silently slide it; only days with BOTH references
    * evaluate (documented contract, identical both engines).
    *
    * Shape: the corpus collapses to the |types|×|days| daily table
    * once (tracked — it is referenced three times); the two lag joins
    * and the final aggregate all run at that bounded size. All-integer:
    * absolute errors sum exactly, the MASE division truncates
    * non-negative operands with a max(·,1) floor on the denominator
    * (a constant series has zero naive error). */
  def forecastBacktest(events: DataFrame): DataFrame = {
    val daily = graft.Caches.track(events
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("n")))
    def lagged(off: Int, as: String) = daily.select(col("event_type"),
      (col("day") + off).as("day"), col("n").as(as))
    daily
      .join(lagged(1, "f1"), Seq("event_type", "day"))
      .join(lagged(7, "f7"), Seq("event_type", "day"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(abs(col("n") - col("f1"))).as("sae_naive"),
        sum(abs(col("n") - col("f7"))).as("sae_seasonal"))
      .select(col("event_type"), col("n_days"), col("sae_naive"),
        col("sae_seasonal"),
        expr("""(1000000 * sae_seasonal)
                div greatest(sae_naive, 1)""").as("mase_ppm"))
      .withColumn("seasonal_wins", col("mase_ppm") < 1000000L)
      .orderBy("event_type")
  }

  /** Lag-1 autocorrelation of the per-type daily series — the "is
    * today's volume predicted by yesterday's" persistence test. Pairs
    * are consecutive rows of the daily table in day order (per-type
    * lead window on the |types|×|days| aggregate, never over raw
    * events). The correlation is emitted as its exact integer pieces
    * (num = mΣab − ΣaΣb and the two variance denominators), plus a
    * sign-preserving squared form — sign(num)·1e6·num² div (denₐ·den_b)
    * in a DECIMAL(38,0)/HUGEINT lane — because r itself needs a square
    * root. Constant or too-short series are filtered, identically on
    * both engines. */
  def autocorr(events: DataFrame, minPairs: Long = 3): DataFrame = {
    val daily = events
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("x"))
    val pairs = daily
      .withColumn("b", lead(col("x"), 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type")).orderBy(col("day"))))
      .filter(col("b").isNotNull)
      .select(col("event_type"), col("x").as("a"), col("b"))
    pairs.groupBy(col("event_type"))
      .agg(count(lit(1)).as("m"), sum(col("a")).as("sa"),
        sum(col("b")).as("sb"), sum(expr("a * b")).as("sab"),
        sum(expr("a * a")).as("sa2"), sum(expr("b * b")).as("sb2"))
      .filter(col("m") >= minPairs)
      .select(col("event_type"), col("m"),
        expr("m * sab - sa * sb").as("num"),
        expr("m * sa2 - sa * sa").as("dena"),
        expr("m * sb2 - sb * sb").as("denb"))
      .filter(col("dena") > 0 && col("denb") > 0)
      .select(col("event_type"), col("m"), col("num"), col("dena"),
        col("denb"),
        (when(col("num") >= 0, lit(1L)).otherwise(lit(-1L)) *
          expr("""(CAST(1000000 AS DECIMAL(38,0)) * num * num)
                  div (CAST(dena AS DECIMAL(38,0)) * denb)"""))
          .as("corr2_signed_ppm"))
      .orderBy(col("event_type"))
  }

  /** Cross-series correlation between event types — the co-movement
    * matrix over per-type daily counts ([[autocorr]]'s exact lane
    * turned pairwise): for every type pair, the signed squared Pearson
    * correlation of their counts on the days BOTH were observed. The
    * "do these streams move together" triage that separates
    * shared-cause traffic (deploys, outages, campaigns move everything)
    * from independent behavior.
    *
    * Same exactness discipline as autocorr: integer moments, num =
    * n·Σxy − ΣxΣy, sign·(num²·1e6 div (varx·vary)) in a DECIMAL(38,0)
    * lane — no sqrt, no float quotient. Scale shape: one daily
    * aggregate, a day-keyed self-join bounded by |types|² per day,
    * |types|²-sized output. */
  def typeCorr(events: DataFrame, minDays: Long = 3): DataFrame = {
    val daily = events
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("c"))
    daily.alias("a")
      .join(daily.alias("b"), col("a.day") === col("b.day")
        && col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("ta"), col("b.event_type").as("tb"),
        col("a.c").as("x"), col("b.c").as("y"))
      .groupBy(col("ta"), col("tb"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(expr("x * y")).as("sxy"),
        sum(expr("x * x")).as("sxx"), sum(expr("y * y")).as("syy"))
      .filter(col("n") >= minDays)
      .select(col("ta"), col("tb"), col("n").as("n_days"),
        expr("n * sxy - sx * sy").as("num"),
        expr("n * sxx - sx * sx").as("varx"),
        expr("n * syy - sy * sy").as("vary"))
      .filter(col("varx") > 0 && col("vary") > 0)
      .select(col("ta"), col("tb"), col("n_days"), col("num"),
        col("varx"), col("vary"),
        (when(col("num") >= 0, lit(1L)).otherwise(lit(-1L)) *
          expr("""(CAST(1000000 AS DECIMAL(38,0)) * num * num)
                  div (CAST(varx AS DECIMAL(38,0)) * vary)"""))
          .as("corr2_signed_ppm"))
      .orderBy(col("ta"), col("tb"))
  }

  /** Benford's-law first-digit audit of the `value` column (in cents,
    * so the digit comes from an INTEGER's decimal string — a float
    * printer never runs). Emits per digit the observed share and its
    * deviation from the Benford expectation log10(1+1/d), the latter
    * embedded as plan-time ppm literals — the engines never take a
    * log. One map-side-combined aggregate; 9 rows at any scale. */
  def benfordCheck(events: DataFrame): DataFrame = {
    // ⌊1e6·log10(1+1/d)⌋ for d = 1..9, computed here at plan time
    val benfordPpm = (1 to 9).map(d => math.floor(1e6 * math.log10(1 + 1.0 / d)).toLong)
    val digits = events
      .select(expr("CAST(floor(value * 100) AS BIGINT)").as("c"))
      .filter(col("c") >= 1)
      .select(expr("CAST(substring(CAST(c AS STRING), 1, 1) AS BIGINT)")
        .as("digit"))
    val total = digits.agg(count(lit(1)).as("total"))
    val exp = benfordPpm.zipWithIndex
      .map { case (p, i) => struct(lit(i + 1L).as("digit"),
        lit(p).as("benford_ppm")) }
    val expDf = digits.sparkSession.range(1)
      .select(explode(array(exp: _*)).as("s"))
      .select(col("s.digit"), col("s.benford_ppm"))
    digits.groupBy(col("digit")).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .join(broadcast(expDf), "digit")
      .select(col("digit"), col("n"),
        expr("1000000 * n div total").as("obs_ppm"),
        col("benford_ppm"),
        (expr("1000000 * n div total") - col("benford_ppm")).as("dev_ppm"))
      .orderBy(col("digit"))
  }

  /** Trend/cycle decomposition of the daily total: a centered 7-day
    * moving trend (Σ div 7 — exact) and the residual, emitted only for
    * interior days with a full window (the count-guard makes edge
    * truncation explicit rather than a shrunken average). The window
    * runs partition-less over the DAILY table — bounded by calendar
    * days, not corpus size, so the single-task sort is constant work
    * at any scale; raw events never see a window. */
  def trendCycle(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
      .rowsBetween(-3, 3)
    events
      .select(expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy("day").agg(count(lit(1)).as("n_events"))
      .withColumn("s7", sum(col("n_events")).over(w))
      .withColumn("w7", count(lit(1)).over(w))
      .filter(col("w7") === 7)
      .select(col("day"), col("n_events"),
        expr("s7 div 7").as("trend7"),
        expr("n_events - s7 div 7").as("residual"))
      .orderBy(col("day"))
  }

  /** Theil–Sen robust trend per event type — the median of all
    * pairwise daily-count slopes, the estimator that survives the 29%
    * outlier contamination OLS (`trend_slope`) cannot: one corrupted
    * day moves every OLS residual but only reorders a minority of the
    * pairwise slopes. Each slope lands in an exact integer milli lane
    * via TRUNCATING division — slope numerators go negative, and on
    * plain BIGINT lanes Spark `div` and DuckDB `//` both truncate
    * toward zero (probed: −1000//3 = −333 in DuckDB 1.0), so the
    * median is a plain integer on both engines.
    *
    * Scale shape: the pair table is days²-bounded PER TYPE (calendar,
    * not corpus — ~10³ pairs for a month of days), so the per-type
    * rank window is bounded constant work; raw events only ever see
    * the one daily aggregate. */
  def theilsenSlope(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = graft.Caches.track(events
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("c")))
    val pairs = daily.alias("a")
      .join(daily.alias("b"), col("a.event_type") === col("b.event_type")
        && col("a.day") < col("b.day"))
      .select(col("a.event_type").as("event_type"),
        expr("((b.c - a.c) * 1000) div (b.day - a.day)").as("slope_milli"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("slope_milli"))
    pairs
      .withColumn("rn", row_number().over(w))
      .withColumn("np", count(lit(1)).over(
        Window.partitionBy(col("event_type"))))
      .filter(col("rn") * 100 >= col("np") * 50)
      .groupBy(col("event_type"))
      .agg(max(col("np")).as("n_pairs"),
        min(col("slope_milli")).as("theilsen_milli"))
      .orderBy(col("event_type"))
  }

  /** Change-point LOCALIZATION per event type — the "when did it
    * change" answer after cusum_changepoint says "something changed":
    * the single split of the daily count series that maximizes the
    * between-segment variance reduction (one step of binary
    * segmentation, Scott & Knott). For a split after day-index i of n
    * (left sum Sl of total S) the reduction is proportional to
    * (Sl·n − S·i)² / (i·(n−i)); the score is that ratio in an exact
    * micro-units DECIMAL(38,0) lane (numerator ≤ (S·n)² ≈ 10²² at
    * fixture scale — far inside DECIMAL(38,0); the divisor is the
    * i·(n−i) integer, so the quantized score is engine-exact), and
    * the argmax tie-breaks on the earlier day. Output: per type, the
    * last left-segment day, both exact segment means (milli), and the
    * score.
    *
    * Scale shape: everything after the one daily aggregate runs on the
    * |types|×|days| table — per-type prefix sums and the argmax are
    * windows over day-bounded partitions, raw events never see a
    * window. */
  def changepointLocate(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byType = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val whole = Window.partitionBy(col("event_type"))
    val daily = events
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("c"))
    val scored = daily
      .withColumn("i", row_number().over(byType))
      .withColumn("sl", sum(col("c")).over(
        byType.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n", count(lit(1)).over(whole))
      .withColumn("s", sum(col("c")).over(whole))
      .filter(col("i") < col("n")) // a split needs a non-empty right side
      .select(col("event_type"), col("day"), col("i"), col("n"),
        col("sl"), col("s"),
        expr("""CAST(CAST(sl * n - s * i AS DECIMAL(38,0))
                * (sl * n - s * i) * 1000000
                div (CAST(i AS DECIMAL(38,0)) * (n - i)) AS BIGINT)""")
          .as("score_micro"))
    scored
      .withColumn("rn", row_number().over(Window
        .partitionBy(col("event_type"))
        .orderBy(col("score_micro").desc, col("day"))))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("day").as("split_day"),
        col("score_micro"),
        expr("(sl * 1000) div i").as("left_mean_milli"),
        expr("((s - sl) * 1000) div (n - i)").as("right_mean_milli"))
      .orderBy(col("event_type"))
  }

  /** Mann-Whitney U (Wilcoxon rank-sum) between two event types' value
    * distributions — the nonparametric two-sample location test beside
    * the parametric [[abTest]] and the distributional [[Profile]] KS
    * drift: no normality assumption, robust to the heavy right tails
    * revenue-like values actually have.
    *
    * Exact integer throughout: values floor to cents; U is computed
    * from the per-distinct-value count table via
    * U_A = Σ_v nA(v)·(#B below v) + ½·nA(v)·nB(v), carried DOUBLED
    * (u2 = 2U) so ties never mint a fraction. The cumulative #B rides
    * the shared [[Prefix]] sweep over the value-domain-sized count
    * table — never a corpus-sized single-task window. Effect size is
    * the common-language AUC ppm = U_A/(nA·nB); significance is the
    * normal approximation decided by exact cross-multiplication
    * (z² ≥ 3.841459 ⟺ 3·D²·10⁶ ≥ 3 841 459·nA·nB·(n+1) with
    * D = u2_a − nA·nB = 2U_A − nA·nB) in DECIMAL(38,0)/HUGEINT lanes —
    * no sqrt, no float, no tie-correction term (fixture cents ties are
    * rare; the conservative untied variance is the documented choice).
    * One output row at any corpus scale. */
  def mannWhitney(events: DataFrame, typeA: String = "click",
                  typeB: String = "purchase"): DataFrame = {
    val counts = events
      .filter(col("event_type").isin(typeA, typeB))
      .select(col("event_type"),
        expr("CAST(floor(value * 100) AS BIGINT)").as("cents"))
      .groupBy(col("cents"))
      .agg(sum(when(col("event_type") === typeA, 1L).otherwise(0L))
          .as("na_v"),
        sum(when(col("event_type") === typeB, 1L).otherwise(0L))
          .as("nb_v"))
    Prefix.inclusiveCumsum(counts,
        floor(col("cents") / lit(1000d)).cast("long"), col("cents"),
        Seq("nb" -> col("nb_v")))
      .select(col("na_v"), col("nb_v"), col("cum_nb"))
      .agg(sum(col("na_v")).as("n_a"), sum(col("nb_v")).as("n_b"),
        sum(col("na_v") * (lit(2L) * (col("cum_nb") - col("nb_v"))
          + col("nb_v"))).as("u2_a"))
      .select(col("n_a"), col("n_b"), col("u2_a"),
        expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * u2_a" +
          " div (2 * CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)")
          .as("auc_ppm"),
        expr("""CAST(3 AS DECIMAL(38,0)) * (u2_a - n_a * n_b)
                * (u2_a - n_a * n_b) * 1000000
                >= CAST(3841459 AS DECIMAL(38,0)) * n_a * n_b
                   * (n_a + n_b + 1)""").as("significant"))
      .orderBy(col("n_a"))
  }

  /** Exact tie-corrected Spearman rank correlation between the two
    * per-doc quality laws — the additive quality score and the
    * unigram-LM surprisal: do the cheap heuristic and the statistical
    * model even agree on ORDER? ([[graft.operators.Curation
    * .filterKappa]] asks the same question of the binary verdicts;
    * this asks it of the full rankings, which catches a filter pair
    * that agrees on the extremes but shuffles the middle.)
    *
    * Exactness without a global sort: Spearman-with-ties is Pearson on
    * average ranks, and DOUBLED average ranks are integers — for a
    * value v with count c and inclusive cumulative count m,
    * 2·avgrank(v) = 2m − c + 1 — computed from the value-COUNT table
    * via the two-phase [[Prefix.inclusiveCumsum]] (no corpus-sized
    * window, no sort; the rank join is value-domain-sized and
    * broadcast). The Pearson combination runs in the
    * DECIMAL(38,0)/HUGEINT lanes with the house sign-explicit ρ² ppm.
    * One row. */
  def spearmanQuality(docs: DataFrame): DataFrame = {
    val x = TextAnalysis.qualityScoreStaged(docs)
      .select(col("doc_id"), col("score").as("xs"))
    val y = TextAnalysis.unigramSurprisal(docs)
      .select(col("doc_id"), col("surprisal_milli").as("ys"))
    val paired = graft.Caches.track(
      x.join(y, "doc_id").select(col("xs"), col("ys")))
    def rank2(vcol: String): DataFrame = {
      val counts = paired.groupBy(col(vcol).as("v"))
        .agg(count(lit(1)).as("cnt"))
      Prefix.inclusiveCumsum(counts, expr("v div 1000"), col("v"),
          Seq("cnt" -> col("cnt")))
        .select(col("v"),
          (lit(2L) * col("cum_cnt") - col("cnt") + lit(1L)).as("r2"))
    }
    paired
      .join(rank2("xs").select(col("v").as("xs"), col("r2").as("r2x")),
        "xs")
      .join(rank2("ys").select(col("v").as("ys"), col("r2").as("r2y")),
        "ys")
      .agg(count(lit(1)).as("n"),
        sum(col("r2x").cast("decimal(38,0)")).as("sx"),
        sum(col("r2y").cast("decimal(38,0)")).as("sy"),
        sum(col("r2x").cast("decimal(38,0)") * col("r2y")).as("sxy"),
        sum(col("r2x").cast("decimal(38,0)") * col("r2x")).as("sxx"),
        sum(col("r2y").cast("decimal(38,0)") * col("r2y")).as("syy"))
      .select(col("n").as("n_docs"),
        expr("CAST(n AS DECIMAL(38,0)) * sxy - sx * sy").as("num"),
        expr("CAST(n AS DECIMAL(38,0)) * sxx - sx * sx").as("varx"),
        expr("CAST(n AS DECIMAL(38,0)) * syy - sy * sy").as("vary"))
      .select(col("n_docs"),
        when(col("varx") > 0 && col("vary") > 0,
          when(col("num") >= 0, lit(1L)).otherwise(lit(-1L)) *
            expr("""(CAST(1000000 AS DECIMAL(38,0)) * num * num)
                    div (varx * vary)""").cast("long"))
          .as("spearman2_signed_ppm"))
      .orderBy("n_docs")
  }
}
