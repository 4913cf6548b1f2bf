package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis.tokens

/** Corpus-shape statistics over `documents` (SURVEY §2.4 extension
  * surface): the distributional profiles a training-data curator reads
  * before deciding tokenizer vocabulary, sequence length, and dedup
  * thresholds — word-length spectrum, hapax (singleton-term) rates,
  * power-of-2 document-length buckets, the Heaps'-law vocabulary-growth
  * curve, and a lexical-diversity (type-token-ratio) histogram.
  *
  * All statistics are exact integers (counts, ppm by integer division,
  * log2 via binary-string length — never a float log); every aggregate
  * is map-side combined with output bounded by |vocab|, |sources|, or a
  * fixed bucket count, not corpus size.
  *
  * Since r15 the whole family reads the staged `doc_term_tf` posting
  * base ([[TextAnalysis.stagedDocTermTf]] — built once per corpus,
  * shared with the lexical family) instead of each query paying its
  * own tokenize + explode corpus pass (VERDICT r14 #4): per-source
  * statistics attach `source` through one doc-keyed hash join of the
  * two-column doc→source projection, per-doc token counts are sum(tf)
  * over the artifact, and every downstream aggregate is unchanged —
  * identical outputs, 3+ redundant corpus passes deleted. */
object TextShape {

  /** The (doc_id, source, term, tf) posting view: the staged artifact
    * with source attached — ONE doc-keyed hash join of a two-column
    * corpus projection, shared by the per-source family. */
  private def postingsWithSource(docs: DataFrame): DataFrame =
    TextAnalysis.stagedDocTermTf(docs)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")

  /** Per-doc token totals off the artifact: docs with ZERO tokens have
    * no posting rows, so re-attach them with n = 0 (heapsLaw counts
    * every doc in its checkpoints; the n > 0 consumers filter). */
  private def perDocTokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"))
      .join(TextAnalysis.stagedDocTermTf(docs)
        .groupBy("doc_id").agg(sum(col("tf")).as("n")), Seq("doc_id"),
        "left")
      .select(col("doc_id"), coalesce(col("n"), lit(0L)).as("n"))

  /** Token-length spectrum: for each word length, total occurrences and
    * distinct terms. Term marginal of the staged posting base; the
    * length rollup runs on the vocab-sized table. */
  def wordLenHist(docs: DataFrame): DataFrame =
    TextAnalysis.stagedDocTermTf(docs)
      .groupBy(col("term"))
      .agg(sum(col("tf")).as("cnt"))
      .groupBy(length(col("term")).cast("long").as("word_len"))
      .agg(sum(col("cnt")).as("n_tokens"),
        count(lit(1)).as("n_distinct_terms"))
      .orderBy(col("word_len"))

  /** Hapax-legomena audit per source: vocabulary size, singleton terms,
    * and the hapax share of the vocabulary in ppm. A high hapax rate
    * signals noisy/OCR text; a low one, template spam. Shape: staged
    * postings + the doc→source join shuffle once on (source, term);
    * the per-source rollup runs on the vocab-sized table. */
  def hapaxStats(docs: DataFrame): DataFrame =
    postingsWithSource(docs)
      .groupBy(col("source"), col("term"))
      .agg(sum(col("tf")).as("cnt"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("vocab"),
        sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("n_hapax"),
        sum(col("cnt")).as("n_tokens"))
      .select(col("source"), col("vocab"), col("n_hapax"), col("n_tokens"),
        expr("1000000 * n_hapax div vocab").as("hapax_ppm"))
      .orderBy(col("source"))

  /** Good-Turing / Chao1 coverage estimates per source — the "how much
    * vocabulary have we NOT crawled yet" companion to [[hapaxStats]]'
    * noise dial: the Good-Turing unseen-probability mass n1/N (the
    * chance the next token is a new type) and the bias-corrected Chao1
    * richness V + n1(n1−1)/(2(n2+1)) (Chao 1984 — a lower bound on the
    * true type count; always defined, no n2=0 special case). Same
    * (source, term) count shuffle as hapaxStats, frequency-of-
    * frequencies folded in the same vocab-sized rollup; n1² runs in
    * DECIMAL(38,0) (a 1e9-hapax source squares past the 64-bit lane);
    * all operands non-negative, Spark `div` = DuckDB `//`. */
  def goodTuring(docs: DataFrame): DataFrame =
    postingsWithSource(docs)
      .groupBy(col("source"), col("term"))
      .agg(sum(col("tf")).as("cnt"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("vocab"),
        sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("cnt") === 2, 1L).otherwise(0L)).as("n2"),
        sum(col("cnt")).as("n_tokens"))
      .select(col("source"), col("vocab"), col("n1"), col("n2"),
        col("n_tokens"),
        expr("(1000000 * n1) div n_tokens").as("unseen_ppm"),
        expr("""CAST(vocab + (CAST(n1 AS DECIMAL(38,0)) * (n1 - 1))
                  div (2 * (n2 + 1)) AS BIGINT)""").as("chao1"))
      .orderBy(col("source"))

  /** Power-of-2 document-length buckets (the batching curriculum view:
    * which padded sequence lengths the corpus needs and how full each
    * bucket runs). bucket = ⌊log2(n_tokens)⌋, computed as
    * length(bin(n)) − 1 — exact integer bit-length on any engine,
    * never a float log that could round across the boundary. */
  def lengthBuckets(docs: DataFrame): DataFrame =
    perDocTokens(docs)
      .filter(col("n") > 0)
      .groupBy((length(bin(col("n"))) - 1).cast("long").as("len_bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("sum_tokens"),
        min(col("n")).as("min_tokens"), max(col("n")).as("max_tokens"))
      .orderBy(col("len_bucket"))

  /** Heaps'-law vocabulary-growth curve: distinct terms and total
    * tokens after the first 1, 2, 4, … 2ᵏ documents (by doc_id), plus
    * the full corpus. The curve's flattening rate is the empirical
    * Heaps exponent — the "how much new vocabulary does more data buy"
    * dial. Scale shape: vocabulary growth needs only each term's FIRST
    * document (min(doc_id) per term — one vocab-sized aggregate), and
    * each checkpoint is a conditional count over that table against a
    * ≤33-row broadcast checkpoint list — the corpus is never rescanned
    * per checkpoint. */
  def heapsLaw(docs: DataFrame): DataFrame = {
    val perDoc = perDocTokens(docs)
      .select(col("doc_id"), col("n").as("n_toks"))
    val firstSeen = TextAnalysis.stagedDocTermTf(docs)
      .groupBy(col("term")).agg(min(col("doc_id")).as("first_doc"))
    val nDocs = perDoc.agg(count(lit(1)).as("n_docs"))
    // powers of two below n_docs, plus n_docs itself (the full corpus)
    val cps = nDocs.select(explode(
        filter(
          array((0 until 33).map(i => lit(1L << i)): _*),
          p => p < col("n_docs"))).as("cp"))
      .unionByName(nDocs.select(col("n_docs").as("cp")))
    val vocabAt = firstSeen.crossJoin(broadcast(cps))
      .groupBy(col("cp"))
      .agg(sum(when(col("first_doc") < col("cp"), 1L).otherwise(0L))
        .as("vocab"))
    val toksAt = perDoc.crossJoin(broadcast(cps))
      .groupBy(col("cp"))
      .agg(sum(when(col("doc_id") < col("cp"), col("n_toks"))
        .otherwise(0L)).as("total_tokens"))
    vocabAt.join(toksAt, "cp")
      .select(col("cp").as("n_docs_cp"), col("vocab"), col("total_tokens"))
      .orderBy(col("n_docs_cp"))
  }

  /** Lexical-diversity histogram: per-document type-token ratio
    * (distinct/total, exact ppm) bucketed into centiles. Repetitive
    * boilerplate sinks to low centiles; natural prose sits high — the
    * doc-granular companion to [[hapaxStats]]. */
  def docTtr(docs: DataFrame): DataFrame =
    TextAnalysis.stagedDocTermTf(docs)
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n"), count(lit(1)).as("d"))
      .select(expr("(1000000 * d div n) div 10000").as("ttr_centile"))
      .groupBy(col("ttr_centile"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("ttr_centile"))

  /** Flesch reading-ease per document (Flesch 1948; the readability
    * prior readability-stratified corpus mixes and edu-quality filters
    * bucket on): 206.835 − 1.015·(words/sentences) − 84.6·(syllables/
    * words), in exact milli lanes — term1 = (1015·W) div S and
    * term2 = (84600·Y) div W with truncating integer division
    * (documented order: each ratio divides BEFORE the subtraction, the
    * twin mirrors both). Sentences = [.!?]+ runs (clamped to ≥ 1 so a
    * fragment is one sentence), syllables = [aeiouy]+ vowel groups of
    * the lowercased text — the standard orthographic approximation;
    * both are single regexp_count columns, so the whole op is one
    * codegen'd map-only projection over the corpus (no shuffle, no
    * explode; the tokenizer's array is built once per row). */
  def readability(docs: DataFrame): DataFrame = {
    val w = size(tokens(col("text"))).cast("long")
    val s = greatest(regexp_count(col("text"), lit("[.!?]+")), lit(1))
      .cast("long")
    val y = regexp_count(lower(col("text")), lit("[aeiouy]+")).cast("long")
    docs
      .select(col("doc_id"), w.as("n_words"), s.as("n_sentences"),
        y.as("n_syllables"))
      .filter(col("n_words") > 0)
      .select(col("doc_id"), col("n_words"), col("n_sentences"),
        col("n_syllables"),
        (lit(206835L) - expr("(1015 * n_words) div n_sentences")
          - expr("(84600 * n_syllables) div n_words")).as("flesch_milli"))
      .orderBy("doc_id")
  }
}
