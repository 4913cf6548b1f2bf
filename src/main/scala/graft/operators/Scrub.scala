package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-scrubbing operators for a training-data pipeline
  * (SURVEY §2.4): PII redaction and benchmark decontamination.
  *
  * Both engines (Spark's Java regex, DuckDB's RE2) agree on the
  * pattern subset used here — character classes, bounded quantifiers,
  * \\b word boundaries — so the twins hash-match byte-for-byte.
  */
object Scrub {

  /** Conservative, portable PII patterns: emails and NANP-style
    * xxx-xxx-xxxx phone numbers. Real deployments layer more classes
    * (IBANs, national ids, street addresses) — each is one more
    * (pattern, tag) pair in `redactions`, same per-row plan. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val redactions: Seq[(String, String)] =
    Seq(emailRe -> "<EMAIL>", phoneRe -> "<PHONE>")

  /** Deterministically inject synthetic PII into the fixture corpus
    * (every 53rd doc an email, every 71st a phone) — the documents
    * fixture is synthetic words, so the redaction path needs planted
    * positives to prove it fires (the withCorruptedProps pattern). */
  def withInjectedPii(docs: DataFrame): DataFrame =
    docs.withColumn("text", concat(col("text"),
      when(col("doc_id") % 53 === 0,
        concat(lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com"))).otherwise(""),
      when(col("doc_id") % 71 === 0, lit(" call 555-123-4567"))
        .otherwise("")))

  /** Redact every PII match and count what was removed. Pure per-row
    * regexp_replace chain — codegen'd, no shuffle, no UDF; at 100 TB
    * this is a map-only pass whose cost is the regex engine itself.
    * `n_pii` counts each pattern on the text AS THE REPLACE CHAIN SEES
    * IT (pattern i counted after patterns 0..i-1 redacted), so the
    * audit equals the number of replacements performed — a
    * phone-shaped substring inside an already-redacted email is
    * neither double-counted nor double-tagged. */
  def piiRedact(docs: DataFrame, text: Column): DataFrame = {
    val (counted, redacted) = redactions.foldLeft((lit(0), text)) {
      case ((n, c), (re, tag)) =>
        (n + regexp_count(c, lit(re)), regexp_replace(c, re, tag))
    }
    docs.withColumn("n_pii", counted.cast("long"))
      .withColumn("redacted", redacted)
  }

  /** Benchmark decontamination: flag training docs sharing ≥ minShared
    * word shingles with any doc in the benchmark set — the n-gram
    * overlap check run before an eval set is trusted. Returns
    * (doc_id, n_shared) for contaminated docs.
    *
    * 100 TB shape: the benchmark side is SMALL by construction (eval
    * sets are thousands of docs, the corpus is billions), so its
    * distinct shingle set is broadcast and the check is a map-side
    * hash-join over the exploded corpus shingles — no shuffle of the
    * corpus until the tiny per-doc count aggregation. Shingles are
    * per-doc distinct (word_shingles), so count(*) counts distinct
    * overlaps. */
  /** The (doc_id, sh) benchmark-overlap match table + the 1-row
    * shingled-doc count, staged once per (corpus, benchmark) — the
    * stored contamination index all three decontamination queries
    * re-derived per call (r19 optimization). Subdirs: matched/, n/. */
  private def decontamMatchesDir(docs: DataFrame,
                                 benchmark: DataFrame): String =
    graft.Stage.dir(graft.Stage.key(docs, "decontam_matches",
      benchmark.queryExecution.analyzed.canonicalized.semanticHash())) {
      dir =>
        val shingled = Dedup.withShingles(docs)
        shingled.agg(
            sum(when(size(col("__sh")) > 0, 1L).otherwise(0L)).as("__n"))
          .coalesce(1).write.mode("overwrite").parquet(s"$dir/n")
        val corpusSh = shingled
          .select(col("doc_id"), explode(col("__sh")).as("sh"))
        val benchSh = Dedup.withShingles(benchmark)
          .select(explode(col("__sh")).as("sh")).distinct()
        corpusSh.join(broadcast(benchSh), Seq("sh"))
          .write.mode("overwrite").parquet(s"$dir/matched")
    }

  def decontaminate(docs: DataFrame, benchmark: DataFrame,
                    minShared: Int = 2): DataFrame = {
    val d = decontamMatchesDir(docs, benchmark)
    docs.sparkSession.read.parquet(s"$d/matched")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** minShared threshold sweep for decontamination — the dial-choice
    * table run BEFORE committing to a contamination threshold (the
    * n-gram-overlap bar is a named knob in every published
    * decontamination recipe, and the right value depends on the
    * corpus's natural phrase-overlap base rate): per threshold, how
    * many corpus docs would flag and the total shared-shingle mass,
    * from ONE benchmark-overlap join (tracked at minShared = 1 — the
    * sweep re-aggregates the per-doc counts, it never re-joins the
    * corpus). Zero-preserving rows. */
  def decontamSweep(docs: DataFrame, benchmark: DataFrame,
                    threshes: Seq[Long] = Seq(1L, 2L, 4L, 8L, 16L))
      : DataFrame = {
    // a repeated dial would duplicate its output row AND its
    // aggregation key (ADVICE r16 #3) — the sweep is over the SET
    val ths = threshes.distinct
    val hits = graft.Caches.track(
      decontaminate(docs, benchmark, minShared = 1))
    val th = docs.sparkSession.range(1)
      .select(explode(array(ths.map(lit): _*)).as("thresh"))
    val agg = hits
      .select(explode(array(ths.map(lit): _*)).as("thresh"),
        col("n_shared"))
      .filter(col("n_shared") >= col("thresh"))
      .groupBy("thresh")
      .agg(count(lit(1)).as("n_docs"), sum("n_shared").as("__ts"))
    th.join(agg, Seq("thresh"), "left")
      .select(col("thresh"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("__ts"), lit(0L)).as("total_shared"))
  }

  /** IDF-weighted decontamination — [[decontaminate]]'s raw shared-
    * shingle count treats "the quick brown" and a rare 3-gram of an
    * eval answer as equal evidence; here each shared shingle scores
    * its corpus rarity in WHOLE BITS, floor(log2(N/df)) computed as
    * `length(bin(N div df)) − 1` (the unigram_surprisal discipline —
    * exact integer, no transcendental crosses the oracle), so one
    * verbatim rare passage outweighs any amount of common-phrase
    * overlap. Scale shape unchanged from decontaminate: benchmark
    * shingles broadcast, corpus-side map joins + per-doc aggregate;
    * the df table adds ONE aggregate over the exploded corpus
    * shingles (vocab-sized, broadcast-joined to the matches). */
  def decontaminateWeighted(docs: DataFrame, benchmark: DataFrame,
                            minBits: Long = 8L): DataFrame = {
    val d = decontamMatchesDir(docs, benchmark)
    // n = docs contributing ≥1 shingle; df is only ever READ for
    // benchmark shingles, and `matched` already holds EVERY corpus
    // occurrence of those shingles — both read the staged
    // contamination index (r19: previously a corpus explode per call)
    val n = docs.sparkSession.read.parquet(s"$d/n")
    val matched = graft.Caches.track(
      docs.sparkSession.read.parquet(s"$d/matched"))
    val df = matched.groupBy("sh")
      .agg(count_distinct(col("doc_id")).as("__df"))
    matched
      .join(broadcast(df), Seq("sh"))
      .crossJoin(broadcast(n))
      .select(col("doc_id"),
        (length(bin(expr("__n div __df"))) - 1).cast("long").as("__b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared"), sum("__b").as("shared_bits"))
      .filter(col("shared_bits") >= minBits)
  }

  /** Deterministically append DENORMALIZED unicode + control characters
    * to every 13th doc (combining-accent "café"/"naïve", a tab, a BEL)
    * — the documents fixture is pure ASCII, where NFC is the identity,
    * so the normalization path needs planted positives to prove it
    * fires (the withInjectedPii pattern). */
  def withDenormalizedText(docs: DataFrame): DataFrame =
    docs.withColumn("text", concat(col("text"),
      when(col("doc_id") % 13 === 0,
        // "cafe"+U+0301 combining acute, "nai"+U+0308 combining
        // diaeresis (NFC composes), double space + \t (collapse),
        // BEL (control strip)
        lit(" cafe\u0301  nai\u0308ve\tx \u0007bell"))
        .otherwise("")))

  /** Canonical text normalization — the pass every dedup/hash/tokenize
    * stage assumes has already happened: strip control characters,
    * Unicode NFC (combining sequences → precomposed, via the native
    * codegen'd [[org.apache.spark.sql.graft.NfcNormalizeExpr]] — Spark
    * ships no normalization builtin), lowercase, collapse whitespace
    * runs, trim. Order matters and is pinned: control-strip first,
    * NFC before lower (case-mapping composed chars is the
    * well-defined direction), collapse last. The strip class removes
    * NON-whitespace controls only — \\t \\n \\f \\r stay and collapse
    * to one space (tab-separated words must not merge) — plus \\x0B,
    * which Java's \\s matches but RE2's does not, so eliminating it
    * up front removes the one cross-engine \\s divergence. Audit
    * columns count code points in/out and whether the row changed.
    * Pure per-row projection — one codegen'd map stage, no shuffle at
    * any scale. */
  def normalizeText(docs: DataFrame, text: Column): DataFrame = {
    val norm = trim(regexp_replace(
      lower(org.apache.spark.sql.graft.NfcNormalizeExpr(
        regexp_replace(text, "[\\x00-\\x08\\x0B\\x0E-\\x1F\\x7F]", ""))),
      "\\s+", " "))
    docs.select(col("doc_id"), norm.as("text_norm"),
      length(text).cast("long").as("n_chars_in"),
      length(norm).cast("long").as("n_chars_out"),
      (norm =!= text).as("changed"))
  }

  /** k-anonymity audit over the generalization ladder (Sweeney 2002 —
    * the release-gate question "can any record be singled out by its
    * quasi-identifiers, and how much coarsening fixes it"): equivalence
    * classes under (lang, source), then (lang), then nothing — one
    * CUBE pass, levels picked by grouping_id, so the whole lattice
    * walk is a single aggregate over the corpus (never one scan per
    * level). Per level: class count, smallest class, classes below k
    * and the records they expose. NULL-valued quasi-identifiers would
    * alias cube's roll-up rows (the standard cube caveat — the
    * fixture's QIs are non-null; a production caller pre-coalesces).
    * Output is 3 rows at any corpus scale. */
  def kAnonymity(docs: DataFrame, k: Long = 5L): DataFrame =
    docs.cube(col("lang"), col("source"))
      .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
      .filter(col("gid").isin(0, 1, 3))
      .select(when(col("gid") === 0, 0L).when(col("gid") === 1, 1L)
        .otherwise(2L).as("level"), col("n"))
      .groupBy("level").agg(
        count(lit(1)).as("n_classes"),
        min(col("n")).as("min_class"),
        sum(when(col("n") < k, 1L).otherwise(0L)).as("risky_classes"),
        sum(when(col("n") < k, col("n")).otherwise(0L)).as("risky_docs"))
      .orderBy("level")

  /** Distinct l-diversity audit (Machanavajjhala et al. 2007) — the
    * companion release gate [[kAnonymity]] cannot answer: a class can
    * be large (k-anonymous) yet still leak its sensitive attribute when
    * every member SHARES it (the homogeneity attack). Equivalence
    * classes under the lang quasi-identifier, sensitive attribute =
    * source; per class the distinct-sensitive-value count l, the modal
    * sensitive value's share (the attacker's best-guess confidence),
    * and the pass/fail flag l ≥ `l`.
    *
    * Shape: one (lang, source) aggregate — |langs|·|sources| bounded —
    * then a |langs|-bounded re-aggregate; ppm share by truncating
    * integer division. Output is |langs| rows at any corpus scale. */
  def lDiversity(docs: DataFrame, l: Long = 3L): DataFrame =
    docs.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("lang"))
      .agg(sum(col("n")).as("n_docs"),
        count(lit(1)).as("l_distinct"),
        max(col("n")).as("modal_n"))
      .select(col("lang"), col("n_docs"), col("l_distinct"),
        expr("(1000000 * modal_n) div n_docs").as("modal_ppm"),
        (col("l_distinct") >= l).as("diverse"))
      .orderBy("lang")

  /** Mojibake audit — docs carrying UTF-8-decoded-as-Latin-1/cp1252
    * artifacts (the 'Ã©'/'â€™' class: a multi-byte sequence rendered
    * as two Latin-1 chars), the single most common encoding corruption
    * in crawled corpora and one a quality score built on length/
    * stopword ratios sails straight past. Detection is PLAIN SUBSTRING
    * search over a fixed artifact list (contains(), no regex — both
    * engines compare codepoints identically), per-source doc counts
    * and ppm. Map-only pass + one |sources|-bounded aggregate. The
    * clean synthetic fixture gates at zero everywhere — the SPEC
    * plants corrupted docs to prove detection. */
  val mojibakeMarkers: Seq[String] = Seq(
    "\u00c3\u00a9", // 'é' (U+00E9) re-read as Latin-1 → Ã©
    "\u00c3\u00a8", // 'è' → Ã¨
    "\u00c3\u00a4", // 'ä' → Ã¤
    "\u00c3\u00b6", // 'ö' → Ã¶
    "\u00c3\u00bc", // 'ü' → Ã¼
    "\u00e2\u20ac\u2122", // '\u2019' re-read as cp1252 → â€™
    "\u00e2\u20ac\u0153", // '\u201c' → â€œ
    "\u00c2\u00a0") // NBSP → Â + NBSP

  def mojibakeAudit(docs: DataFrame): DataFrame = {
    val hit = mojibakeMarkers
      .map(m => col("text").contains(m))
      .reduce(_ || _)
    docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(hit, 1L).otherwise(0L)).as("n_mojibake"))
      .select(col("source"), col("n_docs"), col("n_mojibake"),
        expr("(1000000 * n_mojibake) div n_docs").as("mojibake_ppm"))
      .orderBy("source")
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian 2007) — the third
    * release gate of the privacy trio: [[lDiversity]] counts distinct
    * sensitive values, but a class whose sensitive DISTRIBUTION skews
    * far from the corpus still leaks (the skewness attack — "90% of
    * this class is source X" is a disclosure even when l other sources
    * appear). Per lang class, the Earth-Mover's Distance between the
    * class's source distribution and the global one; for a categorical
    * attribute under the uniform ground metric EMD collapses to the
    * total-variation distance ½·Σ_v |p_c(v) − p(v)| — and THAT is
    * exact in integers by cross-multiplying the two ratios:
    * ½·Σ_v |n_cv·N − n_v·n_c| / (n_c·N). Absent (class, value) cells
    * are distribution mass (they contribute n_v·n_c), so the sum runs
    * over the full lang×source grid, never just observed cells.
    *
    * Shape: ONE corpus aggregate to the |langs|·|sources|-bounded cell
    * table (tracked-persisted — globals, class sizes, and the total
    * all fold off it, so the corpus is scanned once, not four times);
    * grid = classes × broadcast globals, left-joined to cells. Products
    * run in DECIMAL(38,0) lanes (n_cv·N reaches ~1e26 at 100 TB —
    * past BIGINT); the final ppm division truncates on non-negative
    * operands, where Spark `div` = DuckDB `//`. */
  def tCloseness(docs: DataFrame, tPpm: Long = 200000L): DataFrame = {
    val cell = graft.Caches.track(
      docs.groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_cv")))
    val global = cell.groupBy("source").agg(sum(col("n_cv")).as("n_v"))
    val classes = cell.groupBy("lang").agg(sum(col("n_cv")).as("n_c"))
    val total = cell.agg(sum(col("n_cv")).as("n_total"))
    classes.crossJoin(broadcast(global))
      .crossJoin(broadcast(total))
      .join(cell, Seq("lang", "source"), "left")
      .select(col("lang"), col("n_c"), col("n_total"),
        abs(coalesce(col("n_cv"), lit(0L)).cast("decimal(38,0)")
            * col("n_total")
          - col("n_v").cast("decimal(38,0)") * col("n_c")).as("dev"))
      .groupBy("lang", "n_c", "n_total")
      .agg(sum(col("dev")).as("sum_dev"))
      .select(col("lang"), col("n_c").as("n_docs"),
        expr("""CAST((CAST(1000000 AS DECIMAL(38,0)) * sum_dev)
                     div (2 * CAST(n_c AS DECIMAL(38,0)) * n_total)
                  AS BIGINT)""").as("emd_ppm"))
      .withColumn("close", col("emd_ppm") <= tPpm)
      .orderBy("lang")
  }
}
