package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end corpus-curation pass an LLM training-data pipeline
  * runs before tokenization (SURVEY §2.4 capstone): near-duplicate
  * removal ∩ quality gate ∩ language filter, composed from the
  * individually-oracle-checked operators. One row per surviving doc.
  *
  * 100 TB shape: three independent doc-keyed predicates joined on
  * doc_id — each input branch is the already-audited operator plan
  * (LSH banded anti-join / per-row quality projection / per-row
  * language argmax), and the final joins are hash equi-joins on the
  * same key, so AQE co-partitions them with at most one shuffle per
  * branch. Nothing here is a new physical shape — that is the point:
  * curation is composition, and a declarative plan lets Catalyst
  * fuse the per-row branches into the same scan. */
object Curation {

  def curate(docs: DataFrame, keepLang: String = "en",
             keepThreshold: Long = 3000L): DataFrame = {
    val survivors = Dedup.dedupKeepList(docs).select("doc_id")
    val quality = TextAnalysis.qualityScoreStaged(docs, keepThreshold)
      .filter(col("keep")).select(col("doc_id"), col("score"))
    val lang = TextAnalysis.langId(docs)
      .filter(col("pred_lang") === keepLang)
      .select(col("doc_id"), col("pred_lang"))
    survivors.join(quality, Seq("doc_id"))
      .join(lang, Seq("doc_id"))
      .select(col("doc_id"), col("pred_lang"), col("score"))
  }

  /** The required-stopword set of the Gopher rule filter (Rae et al.
    * 2021, "Scaling Language Models", appendix A1.1): a document must
    * contain at least two of these to survive. */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher rule-based quality filter (Rae et al. 2021, appendix
    * A1.1) — the published heuristic rule set used to clean MassiveWeb,
    * re-expressed in exact integer arithmetic so the verdict is
    * bit-identical across engines (every published ratio threshold
    * r = p/10 becomes a cross-multiplied BIGINT inequality — no double
    * ever decides a keep):
    *
    *  - word count in [minWords, maxWords]            (paper: 50..100k)
    *  - mean word length in [3, 10] chars             (3n ≤ Σlen ≤ 10n)
    *  - symbol-to-word ratio ≤ 0.1 ('#' + '...')      (10·sym ≤ n)
    *  - ≤ 90% of lines start with a bullet (-, *, •)  (10·b ≤ 9·lines)
    *  - ≤ 30% of lines end with an ellipsis ('...')   (10·e ≤ 3·lines)
    *  - ≥ 80% of words contain an alphabetic char     (5·alpha ≥ 4·n)
    *  - ≥ 2 distinct words from [[gopherStopwords]]
    *
    * One row per doc with each rule's verdict plus the conjunction —
    * per-rule flags (not just the AND) because a production pipeline
    * audits WHICH rule fired before dropping a domain.
    *
    * 100 TB shape: a pure per-row projection over one scan — no
    * shuffle, no state, trivially parallel, and every function here is
    * a codegen'd builtin (the tokenizer is the shared native
    * [[TextAnalysis.tokens]] expression), so the whole filter runs
    * inside one WholeStageCodegen span at scan speed. */
  def gopherRules(docs: DataFrame, minWords: Long = 50L,
                  maxWords: Long = 100000L): DataFrame = {
    val toks = col("__toks")
    val nWords = size(toks).cast("long")
    val sumLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
    // '#' count + non-overlapping '...' count (leftmost, same in both
    // engines' replace); these are Gopher's two "symbol" classes
    val nHash = length(col("text")) -
      length(expr("replace(text, '#', '')"))
    val nEllipsis =
      expr("(length(text) - length(replace(text, '...', ''))) div 3")
    val lines = split(col("text"), "\n")
    val nLines = size(lines).cast("long")
    val nBullet = size(filter(lines, l =>
      l.startsWith("-") || l.startsWith("*") || l.startsWith("•")))
      .cast("long")
    val nEllLines = size(filter(lines, l => l.endsWith("..."))).cast("long")
    val nAlpha = size(filter(toks, t => t.rlike("[a-z]"))).cast("long")
    val nReq = size(array_intersect(toks,
      typedLit(gopherStopwords))).cast("long")
    docs.withColumn("__toks", TextAnalysis.tokens(col("text")))
      .select(col("doc_id"), nWords.as("n_words"), sumLen.as("sum_word_len"),
        (nHash + nEllipsis).cast("long").as("n_symbols"),
        nLines.as("n_lines"), nBullet.as("n_bullet_lines"),
        nEllLines.as("n_ellipsis_lines"), nAlpha.as("n_alpha_words"),
        nReq.as("n_req_stopwords"))
      .select(col("*"),
        (col("n_words") >= minWords && col("n_words") <= maxWords)
          .as("r_wordcount"),
        (lit(3L) * col("n_words") <= col("sum_word_len")
          && col("sum_word_len") <= lit(10L) * col("n_words"))
          .as("r_meanlen"),
        (lit(10L) * col("n_symbols") <= col("n_words")).as("r_symbol"),
        (lit(10L) * col("n_bullet_lines") <= lit(9L) * col("n_lines"))
          .as("r_bullet"),
        (lit(10L) * col("n_ellipsis_lines") <= lit(3L) * col("n_lines"))
          .as("r_ellipsis"),
        (lit(5L) * col("n_alpha_words") >= lit(4L) * col("n_words"))
          .as("r_alpha"),
        (col("n_req_stopwords") >= 2L).as("r_stopwords"))
      .withColumn("keep",
        col("r_wordcount") && col("r_meanlen") && col("r_symbol")
          && col("r_bullet") && col("r_ellipsis") && col("r_alpha")
          && col("r_stopwords"))
  }

  /** Cross-source near-duplicate MATRIX — [[sourceDupRates]]' pairwise
    * complement: for every unordered source pair with ≥ 1 candidate
    * DOC pair crossing it, the doc-pair count plus both sides' doc
    * volumes. The mirror-farm triage MAP: a hot off-diagonal cell is
    * two sources scraping each other (dedup one against the other
    * before training); the diagonal is within-source boilerplate.
    * Composes [[Dedup.sourceCellWeights]] — since the r16 exact-dup
    * collapse, n_pairs is the doc-pair MASS reconstructed from rep
    * multiplicities (near rep pairs expanded over source histograms +
    * within-group exact pairs), so the cell numbers keep doc-pair
    * meaning while the band join runs rep-sized. |sources|²-bounded
    * output — nothing doc-sized survives the cell aggregate. */
  def sourceOverlap(docs: DataFrame): DataFrame = {
    val n = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    Dedup.sourceCellWeights(docs)
      .groupBy("source_a", "source_b")
      .agg(sum(col("w")).as("n_pairs"))
      .join(n.select(col("source").as("source_a"),
        col("n_docs").as("n_docs_a")), "source_a")
      .join(n.select(col("source").as("source_b"),
        col("n_docs").as("n_docs_b")), "source_b")
      .select(col("source_a"), col("source_b"), col("n_docs_a"),
        col("n_docs_b"), col("n_pairs"))
      .orderBy("source_a", "source_b")
  }

  /** Per-source duplicate rates — the FIRST column a crawl dashboard
    * adds after volume: which sources are mirror farms. Composes the
    * LSH keep-list ([[Dedup.dedupKeepList]]); one doc-keyed left join
    * + a sources-sized aggregate. */
  def sourceDupRates(docs: DataFrame): DataFrame = {
    val kept = Dedup.dedupKeepList(docs)
      .select(col("doc_id"), lit(1L).as("__k"))
    docs.select(col("doc_id"), col("source"))
      .join(kept, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__k").isNull, 1L).otherwise(0L)).as("n_dupes"))
      .select(col("source"), col("n_docs"), col("n_dupes"),
        expr("(1000000 * n_dupes) div n_docs").as("dup_ppm"))
      .orderBy("source")
  }

  /** Are duplicates lower quality than survivors? The mean quality gap
    * between the LSH keep-list and the dropped set — the empirical
    * check behind the "dedup improves quality" assumption (Lee et al.
    * 2022 report exactly this audit). Exact lanes: integer score sums
    * per side, the gap as sign·(1000·|s_k·n_d − s_d·n_k| div n_k·n_d)
    * in DECIMAL(38,0)/HUGEINT (the modularity convention — a mean gap
    * can be negative), NULL when either side is empty. 1 row. */
  def dupQualityGap(docs: DataFrame): DataFrame = {
    val kept = Dedup.dedupKeepList(docs)
      .select(col("doc_id"), lit(1L).as("__k"))
    TextAnalysis.qualityScoreStaged(docs)
      .select(col("doc_id"), col("score"))
      .join(kept, Seq("doc_id"), "left")
      .agg(
        sum(when(col("__k").isNotNull, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("__k").isNotNull, col("score")).otherwise(0L))
          .as("sum_kept"),
        sum(when(col("__k").isNull, 1L).otherwise(0L)).as("n_dupes"),
        sum(when(col("__k").isNull, col("score")).otherwise(0L))
          .as("sum_dupes"))
      .select(col("n_kept"), col("sum_kept"), col("n_dupes"),
        col("sum_dupes"),
        when(col("n_kept") === 0 || col("n_dupes") === 0,
          lit(null).cast("long"))
          .otherwise(
            signum(expr("""sum_kept * CAST(n_dupes AS DECIMAL(38,0))
                           - sum_dupes * CAST(n_kept AS DECIMAL(38,0))"""))
              .cast("long") *
              expr("""CAST(CAST(1000 AS DECIMAL(38,0))
                      * abs(sum_kept * CAST(n_dupes AS DECIMAL(38,0))
                            - sum_dupes * CAST(n_kept AS DECIMAL(38,0)))
                      div (CAST(n_kept AS DECIMAL(38,0)) * n_dupes)
                      AS BIGINT)"""))
          .as("gap_milli"))
      .orderBy(col("n_kept"))
  }

  /** Agreement audit between the two quality laws — Cohen's kappa of
    * [[TextAnalysis.qualityScore]]'s additive keep verdict vs
    * [[gopherRules]]' rule-conjunction verdict, chance-corrected: raw
    * agreement flatters any pair of filters that both keep (or both
    * drop) nearly everything, which is exactly the regime corpus
    * filters live in. κ > ~0.6 means the cheap score can stand in for
    * the rule set on a pre-pass; κ near 0 means they test different
    * things and must compose.
    *
    * Exact arithmetic: with a = both-keep + both-drop and
    * p = Σ marginal products, κ = (a·n − p)/(n² − p) — emitted as the
    * exact rational plus the sign-explicit truncated ppm (the
    * community_modularity convention, since κ can be negative).
    * DECIMAL(38,0) lanes carry n² beyond BIGINT at warehouse scale.
    * One doc-keyed join of two per-row projections (the quality side
    * reads the staged score frame), then a 1-row aggregate. */
  def filterKappa(docs: DataFrame): DataFrame =
    TextAnalysis.qualityScoreStaged(docs)
      .select(col("doc_id"), col("keep").as("__qk"))
      .join(gopherRules(docs).select(col("doc_id"), col("keep").as("__gk")),
        "doc_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__qk") && col("__gk"), 1L).otherwise(0L))
          .as("n_both_keep"),
        sum(when(col("__qk") && !col("__gk"), 1L).otherwise(0L))
          .as("n_q_only"),
        sum(when(!col("__qk") && col("__gk"), 1L).otherwise(0L))
          .as("n_g_only"),
        sum(when(!col("__qk") && !col("__gk"), 1L).otherwise(0L))
          .as("n_both_drop"))
      .select(col("*"),
        expr("1000000 * (n_both_keep + n_both_drop) div n_docs")
          .as("agree_ppm"),
        expr("""CAST((n_both_keep + n_both_drop) AS DECIMAL(38,0)) * n_docs
                - (CAST(n_both_keep + n_q_only AS DECIMAL(38,0))
                     * (n_both_keep + n_g_only)
                   + CAST(n_g_only + n_both_drop AS DECIMAL(38,0))
                     * (n_q_only + n_both_drop))""").as("__knum"),
        expr("""CAST(n_docs AS DECIMAL(38,0)) * n_docs
                - (CAST(n_both_keep + n_q_only AS DECIMAL(38,0))
                     * (n_both_keep + n_g_only)
                   + CAST(n_g_only + n_both_drop AS DECIMAL(38,0))
                     * (n_q_only + n_both_drop))""").as("__kden"))
      .select(col("n_docs"), col("n_both_keep"), col("n_q_only"),
        col("n_g_only"), col("n_both_drop"), col("agree_ppm"),
        when(col("__kden") === 0, lit(null).cast("long"))
          .otherwise(signum(col("__knum")).cast("long") *
            expr("""CAST(CAST(1000000 AS DECIMAL(38,0)) * abs(__knum)
                    div __kden AS BIGINT)"""))
          .as("kappa_ppm"))
      .orderBy(col("n_docs"))

  /** Per-source curation dashboard — the table that decides which
    * crawl sources to up/down-weight before any expensive dedup runs:
    * doc volume, integer mean quality score, and the keep rates of
    * BOTH quality laws ([[TextAnalysis.qualityScore]]'s additive score
    * and [[gopherRules]]' rule conjunction) side by side per source.
    * Two map-only scoring passes joined on doc_id, then a
    * |sources|-sized aggregate — the joins are doc-keyed hash joins,
    * nothing corpus-sized is held. */
  def sourceQuality(docs: DataFrame): DataFrame = {
    val q = TextAnalysis.qualityScoreStaged(docs)
      .select(col("doc_id"), col("score"), col("keep").as("__qk"))
    val g = gopherRules(docs)
      .select(col("doc_id"), col("keep").as("__gk"))
    docs.select(col("doc_id"), col("source"))
      .join(q, "doc_id").join(g, "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        // FLOOR division, spelled out via the pmod form on BOTH sides:
        // score sums can be negative, and while Spark `div` and DuckDB
        // `//` both TRUNCATE toward zero on BIGINT (probed), the
        // explicit floor makes the negative-mean semantics a stated
        // contract instead of a coincidence of matching truncation
        expr("(sum(score) - pmod(sum(score), count(1))) div count(1)")
          .as("mean_score"),
        sum(when(col("__qk"), 1L).otherwise(0L)).as("n_quality_keep"),
        sum(when(col("__gk"), 1L).otherwise(0L)).as("n_gopher_keep"))
      .select(col("source"), col("n_docs"), col("mean_score"),
        expr("(1000000 * n_quality_keep) div n_docs")
          .as("quality_keep_ppm"),
        expr("(1000000 * n_gopher_keep) div n_docs")
          .as("gopher_keep_ppm"))
  }

  /** KMV (bottom-k / k-minimum-values, Bar-Yossef et al. 2002 — the
    * theta-sketch family's simplest member) vocabulary-cardinality
    * sketches per source, with pairwise union/intersection estimates:
    * "how big is each crawl slice's vocabulary, and how much do two
    * slices share" WITHOUT ever materializing a cross-source distinct
    * union — the sketch is k rows per source, mergeable by
    * construction, which is exactly why warehouses ship theta sketches
    * for slice-overlap questions at scale.
    *
    * Determinism: the "uniform randomness" is the portable md5 lane
    * (hash32 of 'kmv:'||term — reproducible in any engine, no RNG);
    * every estimate is an integer truncating division of BIGINTs:
    * n̂ = (k−1)·2³² div h_k (exact count when a sketch holds the whole
    * set, i.e. cnt < k), Ĵ_ppm = 1e6·|both| div cnt over the union's
    * bottom-k, n̂_∩ = |both|·n̂_∪ div cnt.
    *
    * Scale shape: one (source, term) distinct pass → per-source
    * bottom-k via a WindowGroupLimit-pruned rank window (map-side
    * top-k, k rows per source survive); everything pairwise runs on
    * k·|sources| rows. */
  def kmvOverlap(docs: DataFrame, k: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // fold off the staged posting base (doc, term, tf) instead of a
    // fresh tokenize pass — the (source, term) distinct only needs
    // presence, which the posting rows already are
    val hh = TextAnalysis.stagedDocTermTf(docs)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .select(col("source"), graft.functions.PortableHash
        .hash32(concat(lit("kmv:"), col("term"))).as("h"))
      .distinct()
    // the sketch table is k·|sources| rows at ANY corpus scale —
    // coalesce the cached frame to ONE partition so the ~10 downstream
    // pairwise stages schedule 1 task each instead of a full
    // shuffle-partition fan (the sourceDivergence measurement)
    val sk = graft.Caches.track(hh
      .withColumn("rn", row_number().over(
        Window.partitionBy("source").orderBy("h")))
      .filter(col("rn") <= k)
      .select("source", "h")
      .coalesce(1))
    val est = sk.groupBy("source")
      .agg(count(lit(1)).as("cnt"), max(col("h")).as("hk"))
      .select(col("source"),
        when(col("cnt") < k, col("cnt"))
          .otherwise(expr(
            s"(($k - 1) * 4294967296) div greatest(hk, 1)")).as("est"))
    // |sources|-sized frames: broadcast the right side explicitly so
    // the pair enumeration plans as BroadcastNestedLoopJoin, never a
    // CartesianProduct (the PlansSpec contract)
    val pairs = sk.select(col("source").as("src_a")).distinct()
      .crossJoin(broadcast(sk.select(col("source").as("src_b")).distinct()))
      .filter(col("src_a") < col("src_b"))
    val ua = sk.select(col("source").as("src_a"), col("h"))
    val ub = sk.select(col("source").as("src_b"), col("h"))
    val merged = pairs.join(ua, "src_a")
      .select(col("src_a"), col("src_b"), col("h"))
      .union(pairs.join(ub, "src_b")
        .select(col("src_a"), col("src_b"), col("h")))
      .distinct()
    val topu = merged
      .withColumn("rn", row_number().over(
        Window.partitionBy("src_a", "src_b").orderBy("h")))
      .filter(col("rn") <= k)
    topu
      .join(ua.withColumn("ina", lit(1L)), Seq("src_a", "h"), "left")
      .join(ub.withColumn("inb", lit(1L)), Seq("src_b", "h"), "left")
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("cnt"), max(col("h")).as("hk"),
        sum(when(col("ina") === 1L && col("inb") === 1L, 1L)
          .otherwise(0L)).as("c_both"))
      .withColumn("est_union",
        when(col("cnt") < k, col("cnt"))
          .otherwise(expr(
            s"(($k - 1) * 4294967296) div greatest(hk, 1)")))
      .join(broadcast(est.select(col("source").as("src_a"),
        col("est").as("est_a"))), "src_a")
      .join(broadcast(est.select(col("source").as("src_b"),
        col("est").as("est_b"))), "src_b")
      .select(col("src_a"), col("src_b"), col("est_a"), col("est_b"),
        col("est_union"),
        expr("(c_both * est_union) div cnt").as("est_inter"),
        expr("(1000000 * c_both) div cnt").as("jaccard_ppm"))
      .orderBy("src_a", "src_b")
  }
}
