package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-source boilerplate detection and stripping — the template-text
  * curation lane. Web-crawl sources repeat navigation bars, cookie
  * banners, and license footers across a large FRACTION of their own
  * documents; those n-grams are site furniture, not content, and
  * leaving them in a training corpus teaches the model the template
  * (the C4/RefinedWeb line-dedup recipe, recast at n-gram granularity
  * because this corpus's documents are single-line token streams with
  * no line structure to key on).
  *
  * The boilerplate criterion is DOCUMENT FREQUENCY within the source:
  * a bigram counts as boilerplate when it appears in at least
  * max(minDf, ceil(n_docs / divisor)) distinct documents of its source
  * (absolute floor so tiny sources don't flag noise; relative rule so
  * the dial survives source growth — at 100 TB a source has millions
  * of docs and any absolute count would saturate).
  *
  * Scale contract: the detector is ONE aggregate over the staged
  * per-(doc, bigram) tf artifact (the bigram-LM base — no extra
  * tokenize pass) keyed by (source, bigram) with map-side combine;
  * never a pair join. The boilerplate set itself is SMALL by
  * construction: Σ df over a source's bigrams equals its bigram
  * occurrence count, so at most divisor·avg_doc_bigrams bigrams per
  * source can clear the relative bar — broadcast material at any
  * corpus size, which is exactly how [[boilerplateStrip]] ships it
  * back to the token stream.
  */
object Boilerplate {

  /** (source, b, df, occ): per-source bigram document frequency and
    * occurrence count, off the staged bigram tf base. The doc→source
    * attach is a doc_id equi-join (postings-sized, no text ships). */
  private def sourceBigramDf(docs: DataFrame): DataFrame =
    TextAnalysis.stagedBigramTf(docs)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy("source", "b")
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("occ"))

  private def sourceDocCounts(docs: DataFrame): DataFrame =
    docs.groupBy("source").agg(count(lit(1)).as("n_docs"))

  /** df ≥ max(minDf, ceil(n_docs/divisor)), all-integer on both
    * engines: ceil(n/d) = (n + d − 1) div d. */
  private def isBoiler(minDf: Long, divisor: Long) =
    col("df") >= greatest(lit(minDf),
      expr(s"(n_docs + ${divisor - 1}) div $divisor"))

  /** The per-source boilerplate PROFILE — the dashboard a curation
    * run reads before committing to a strip: how much of each
    * source's bigram vocabulary is template mass, and how hot its
    * hottest template runs. One row per source that has at least one
    * bigram (a source of single-token docs has nothing to measure). */
  def boilerplateNgrams(docs: DataFrame, minDf: Long = 5L,
                        divisor: Long = 10L): DataFrame =
    sourceBigramDf(docs)
      .join(broadcast(sourceDocCounts(docs)), Seq("source"))
      .groupBy("source", "n_docs")
      .agg(count(lit(1)).as("n_ngrams"),
        sum(when(isBoiler(minDf, divisor), 1L).otherwise(0L))
          .as("n_boiler"),
        coalesce(sum(when(isBoiler(minDf, divisor), col("occ"))),
          lit(0L)).as("boiler_occ"),
        max(col("df")).as("max_df"))
      .select(col("source"), col("n_docs"), col("n_ngrams"),
        col("n_boiler"), col("boiler_occ"), col("max_df"))

  /** The strip pass: every token position covered by an occurrence of
    * one of its source's boilerplate bigrams is removed; per doc the
    * removal accounting (n_tokens, removed_tokens, kept_tokens).
    * Overlapping occurrences share tokens — coverage is counted as
    * DISTINCT positions, so "a b a b a" under boilerplate "a b"/"b a"
    * removes 5 tokens, not 8.
    *
    * Shape: the boilerplate set is broadcast (bounded — see the
    * object scaladoc), the token stream is touched once
    * (posexplode ∝ corpus tokens), coverage explodes a constant 2
    * offsets per hit and distincts on (doc_id, pos) — every shuffle
    * is corpus-token-bounded or smaller, nothing is quadratic. */
  def boilerplateStrip(docs: DataFrame, minDf: Long = 5L,
                       divisor: Long = 10L): DataFrame =
    stripAgainst(docs, boilerplateSet(docs, minDf, divisor))

  /** The strip tail shared by [[boilerplateStrip]] and
    * [[boilerplateStripInc]]: one token pass over `docs`, broadcast
    * semi-join against the (source, b) set, distinct-position
    * coverage, per-doc accounting. */
  private def stripAgainst(docs: DataFrame, boiler: DataFrame)
      : DataFrame = {
    val toked = docs.select(col("doc_id"), col("source"),
      TextAnalysis.tokens(col("text")).as("__t"))
    val occ = toked.filter(size(col("__t")) >= 2)
      .select(col("doc_id"), col("source"),
        posexplode(expr(
          """zip_with(slice(__t, 1, size(__t) - 1),
                      slice(__t, 2, size(__t) - 1),
                      (x, y) -> concat(x, ' ', y))"""))
          .as(Seq("pos", "b")))
    val covered = occ
      .join(broadcast(boiler), Seq("source", "b"), "leftsemi")
      .select(col("doc_id"),
        explode(array(col("pos"), col("pos") + 1)).as("cp"))
      .distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("__n_removed"))
    toked
      .select(col("doc_id"), size(col("__t")).cast("long").as("n_tokens"))
      .join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("__n_removed"), lit(0L)).as("removed_tokens"))
      .withColumn("kept_tokens", col("n_tokens") - col("removed_tokens"))
  }

  /** The (source, b) boilerplate keep-out set — broadcast material
    * (see object scaladoc for the size bound). */
  private[graft] def boilerplateSet(docs: DataFrame, minDf: Long = 5L,
                                    divisor: Long = 10L): DataFrame =
    sourceBigramDf(docs)
      .join(broadcast(sourceDocCounts(docs)), Seq("source"))
      .filter(isBoiler(minDf, divisor))
      .select(col("source"), col("b"))

  /** INCREMENTAL strip — the production deployment shape (the
    * [[graft.operators.Dedup.incrementalDedup]] corpus-is-prior
    * policy for this family): the boilerplate SET is a corpus
    * artifact the nightly pass computes and stores; a daily batch is
    * stripped AGAINST that staged set, never against df counts
    * re-derived from itself (a small batch's df is noise, and
    * re-profiling per batch would re-tokenize the corpus daily).
    * Asymmetric by construction: the batch pays one token pass + a
    * broadcast semi-join; the corpus contributes only its (small)
    * boilerplate set. New template mass that first appears inside a
    * batch is invisible until the next corpus profile — the
    * documented staleness of every corpus-is-prior lane. */
  def boilerplateStripInc(corpus: DataFrame, batch: DataFrame,
                          minDf: Long = 5L,
                          divisor: Long = 10L): DataFrame =
    stripAgainst(batch, boilerplateSet(corpus, minDf, divisor))

  // ---- LINE granularity (VERDICT r16 #3) -------------------------------
  // C4/RefinedWeb's actual dedup unit is the LINE. This corpus's docs
  // are single-line token streams, so the line view is SYNTHESIZED
  // deterministically in both engines: line k of a doc = tokens
  // [k·width+1 .. k·width+width] joined by a single space (the last
  // line may be shorter). The template criterion and the broadcast
  // size bound are the bigram lane's verbatim: Σ df over a source's
  // lines = its line instance count, so at most divisor·avg_doc_lines
  // lines per source clear the relative bar. Lines never overlap, so
  // the strip accounting is a plain per-instance token sum — no
  // distinct-position pass needed.

  /** One row per (doc, line instance): the line string, its 0-based
    * line number, its exact token count (short last line honored). */
  private def lineInstances(docs: DataFrame, width: Int): DataFrame =
    docs.select(col("doc_id"), col("source"),
        TextAnalysis.tokens(col("text")).as("__t"))
      .filter(size(col("__t")) >= 1)
      .select(col("doc_id"), col("source"),
        size(col("__t")).cast("long").as("n_tokens"),
        posexplode(expr(s"""transform(
            sequence(0, (size(__t) + ${width - 1}) div $width - 1),
            k -> array_join(slice(__t, k * $width + 1, $width), ' '))"""))
          .as(Seq("line_no", "line")))
      .withColumn("line_len",
        least(lit(width.toLong),
          col("n_tokens") - col("line_no").cast("long") * width))

  /** (source, line, df, occ): per-source line document frequency. A
    * line can repeat inside one doc, so df counts DISTINCT docs. */
  private def sourceLineDf(docs: DataFrame, width: Int): DataFrame =
    lineInstances(docs, width)
      .groupBy("source", "line")
      .agg(countDistinct(col("doc_id")).as("df"),
        count(lit(1)).as("occ"))

  /** Per-source LINE template profile — [[boilerplateNgrams]] at line
    * granularity over the synthesized `width`-token lines.
    *
    * PRODUCTION DIAL (VERDICT r17 #6, the image-geometry guidance
    * discipline): deploy the DEFAULTS, minDf 5 / divisor 10 — at real
    * per-source doc counts a df-2 line is a quoted passage or a
    * coincidence, not a template, and C4-style line dedup wants the
    * repeated-quote false-positive priced OUT (minDf ≥ 5) while still
    * flagging anything on ≥ 10% of a source's docs (divisor 10). The
    * fixture gate runs minDf 2 / divisor 25 ONLY because a ~25-doc
    * source sample cannot exhibit df-5 headers — a calibration of the
    * test corpus, never of a deployment. */
  def boilerplateLines(docs: DataFrame, width: Int = 8, minDf: Long = 5L,
                       divisor: Long = 10L): DataFrame =
    sourceLineDf(docs, width)
      .join(broadcast(sourceDocCounts(docs)), Seq("source"))
      .groupBy("source", "n_docs")
      .agg(count(lit(1)).as("n_lines"),
        sum(when(isBoiler(minDf, divisor), 1L).otherwise(0L))
          .as("n_boiler"),
        coalesce(sum(when(isBoiler(minDf, divisor), col("occ"))),
          lit(0L)).as("boiler_occ"),
        max(col("df")).as("max_df"))
      .select(col("source"), col("n_docs"), col("n_lines"),
        col("n_boiler"), col("boiler_occ"), col("max_df"))

  /** The line-unit strip pass: every instance of one of its source's
    * boilerplate lines is removed whole (lines are disjoint —
    * coverage is an exact per-instance token sum); per doc the same
    * (n_tokens, removed_tokens, kept_tokens) accounting as
    * [[boilerplateStrip]]. */
  def boilerplateLineStrip(docs: DataFrame, width: Int = 8,
                           minDf: Long = 5L,
                           divisor: Long = 10L): DataFrame = {
    val bset = sourceLineDf(docs, width)
      .join(broadcast(sourceDocCounts(docs)), Seq("source"))
      .filter(isBoiler(minDf, divisor))
      .select(col("source"), col("line"))
    val removed = lineInstances(docs, width)
      .join(broadcast(bset), Seq("source", "line"), "leftsemi")
      .groupBy("doc_id").agg(sum(col("line_len")).as("__n_removed"))
    docs.select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
      .join(removed, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("__n_removed"), lit(0L)).as("removed_tokens"))
      .withColumn("kept_tokens", col("n_tokens") - col("removed_tokens"))
  }
}
