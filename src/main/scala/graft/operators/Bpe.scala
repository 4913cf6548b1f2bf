package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding trainer (Sennrich et al. 2016) — the
  * vocabulary-induction step a training-data pipeline runs before
  * tokenizing a corpus. Classic BPE: start from characters, repeatedly
  * merge the most frequent adjacent symbol pair.
  *
  * Scale shape — the reason this is 100 TB-safe: the corpus is touched
  * in exactly ONE pass (word-type counts — explode + groupBy(term),
  * map-side combined, the termFreq shape). Every merge round after that
  * runs on the VOCAB-sized word-type table (≤ millions of rows at web
  * scale, cached), and each round is one explode + count aggregate plus
  * a 1-ROW broadcast argmax — the `mad_outliers` pattern. Nothing
  * corpus-sized ever re-shuffles.
  *
  * Determinism — the reason this is oracle-twinnable (OracleExt.bpeTrain
  * unrolls the same rounds as CTEs): segmentations are held in a
  * sentinel-wrapped form `<L>sym<R><L>sym<R>…`, so applying
  * a merge is a PLAIN substring replace — `replace` is left-to-right
  * non-overlapping in both Spark and DuckDB, and the wrappers make the
  * pair pattern unambiguous. (A space-separated form would fail twice:
  * the pattern could straddle symbol boundaries — symbols "cx","yd"
  * contain "x y" — and consecutive occurrences share the delimiter
  * space, so "a b a b" merges only once.) Pair counts are integer sums
  * of word counts; the argmax tie-breaks (count DESC, pattern ASC) via
  * max-then-min aggregates — a total order in both engines. */
object Bpe {

  private val L = "\u0001" // symbol open sentinel
  private val R = "\u0002" // symbol close sentinel

  /** word → wrapped initial segmentation: every character becomes a
    * wrapped single-char symbol. Portable regex subset (Java + RE2):
    * `(.)` capture + backreference replacement. */
  private def wrapChars(word: Column): Column =
    regexp_replace(word, "(.)", s"$L$$1$R")

  /** wrapped form → symbol array: split on the CLOSE sentinel (every
    * cell but the trailing empty one starts with the open sentinel),
    * drop the empty tail cell, strip each cell's leading sentinel. */
  private def symbols(s: Column): Column =
    transform(filter(split(s, R), x => x =!= ""),
      x => substring(x, 2, Int.MaxValue))

  /** Train `merges` BPE merge rounds over the corpus's word types.
    * Returns one row per round: (step, lhs, rhs, merged, pair_count)
    * where pair_count is the corpus frequency (sum of word counts) of
    * the pair at the time of its merge. (`lhs`/`rhs`, not left/right —
    * those are SQL keywords and the oracle twin shares column names.) */
  def train(docs: DataFrame, merges: Int = 8): DataFrame = {
    // ONE corpus pass: word-type counts (Zipf head absorbed map-side).
    // Each round ends in an EAGER localCheckpoint — without lineage
    // truncation the round-i plan embeds the round-(i-1) tree twice
    // (once via the argmax, once via the merge application), so the
    // final plan holds ~2^merges copies of the base subtree and
    // Catalyst analysis alone runs for minutes. Checkpointing keeps the
    // work distributed (vocab-sized partitions stay on executors; a
    // production run would use checkpoint() to reliable storage for
    // fault tolerance) and makes each round's plan O(1) deep.
    var words = docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .select(wrapChars(col("term")).as("s"), col("cnt"))
      .localCheckpoint()

    val steps = (0 until merges).map { step =>
      // adjacent pairs, re-wrapped as the replace PATTERN ("⟨x⟩⟨y⟩"),
      // weighted by word count — a vocab-sized explode + aggregate
      val syms = symbols(col("s"))
      val pairs = words
        .select(col("cnt"), explode(
          when(size(syms) < 2, array().cast("array<string>"))
            .otherwise(zip_with(
              slice(syms, lit(1), size(syms) - 1),
              slice(syms, lit(2), size(syms) - 1),
              (x, y) => concat(lit(L), x, lit(R), lit(L), y, lit(R)))))
          .as("pat"))
        .groupBy("pat").agg(sum(col("cnt")).as("pc"))
      // 1-row argmax with total-order tie-break (pc DESC, pat ASC):
      // max count first, then min pattern among the tied — two tiny
      // aggregates instead of a global sort
      val maxc = pairs.agg(max(col("pc")).as("__mpc"))
      val best = pairs.crossJoin(broadcast(maxc))
        .filter(col("pc") === col("__mpc"))
        .agg(min(col("pat")).as("pat"), max(col("pc")).as("pc"))
        .select(col("pat"), col("pc"),
          // fused replacement symbol: "⟨xy⟩"
          concat(lit(L), translate(col("pat"), L + R, ""), lit(R))
            .as("rep"))
        .localCheckpoint()
      words = words.crossJoin(broadcast(best))
        .select(expr("replace(s, pat, rep)").as("s"), col("cnt"))
        .localCheckpoint()
      best.select(lit(step).cast("long").as("step"),
        element_at(symbols(col("pat")), 1).as("lhs"),
        element_at(symbols(col("pat")), 2).as("rhs"),
        translate(col("pat"), L + R, "").as("merged"),
        col("pc").as("pair_count"))
    }
    steps.reduce(_.union(_)).orderBy("step")
  }

  /** The trained merge table, staged once per (corpus, merges) via
    * [[graft.Stage]] — `bpe_train` and [[encode]] are co-gated over the
    * same corpus, and the 8-barrier training loop is exactly the "train
    * once / serve many" artifact class the IVFADC model established: a
    * real pipeline persists the tokenizer and every encode pass reads
    * it back. */
  def stagedMerges(docs: DataFrame, merges: Int = 8): DataFrame =
    graft.Stage.parquet(docs.sparkSession,
      graft.Stage.key(docs, "bpe_merges", merges)) {
      train(docs, merges)
    }

  /** Apply the learned merge list to tokenize the corpus — the encoder
    * half of the BPE loop (the trainer without it can't feed
    * `pack_sequences`/`token_count` with real subword units). Per doc:
    * whitespace-token count, initial symbol (character) count, and the
    * BPE token count after applying all merges IN TRAINING ORDER.
    *
    * Mechanics: each token is sentinel-wrapped ([[wrapChars]]) and the
    * doc's tokens are joined with a `\u0003` separator — a byte that
    * appears in no merge pattern (patterns are `⟨x⟩⟨y⟩` adjacencies), so
    * merges can NEVER cross a token boundary, mirroring training where
    * pairs are counted within words only. Each merge round is then one
    * plain `replace` over the doc string (left-to-right non-overlapping
    * in both engines — the trainer's determinism contract), applied via
    * a 1-row broadcast of that round's (pattern, replacement) — the
    * merge table is merges-sized, so `merges` chained broadcasts keep
    * the whole encode a single map-only pass over the corpus: no
    * shuffle, no state, scan-speed at 100 TB. Token counts fall out as
    * sentinel counts: every live symbol carries exactly one `\u0001` sentinel. */
  def encode(docs: DataFrame, merges: Int = 8): DataFrame = {
    val ms = stagedMerges(docs, merges)
    def countL(s: Column): Column =
      (length(s) - length(regexp_replace(s, L, ""))).cast("long")
    var enc = docs.select(col("doc_id"),
      size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"),
      array_join(transform(TextAnalysis.tokens(col("text")),
        t => regexp_replace(t, "(.)", s"$L$$1$R")), "\u0003").as("s"))
      .withColumn("n_chars", countL(col("s")))
    (0 until merges).foreach { i =>
      val m = ms.filter(col("step") === i).select(
        concat(lit(L), col("lhs"), lit(R), lit(L), col("rhs"), lit(R))
          .as("pat"),
        concat(lit(L), col("merged"), lit(R)).as("rep"))
      enc = enc.crossJoin(broadcast(m))
        .select(col("doc_id"), col("n_tokens"), col("n_chars"),
          expr("replace(s, pat, rep)").as("s"))
    }
    enc.select(col("doc_id"), col("n_tokens"), col("n_chars"),
      countL(col("s")).as("n_bpe_tokens"),
      (col("n_chars") - countL(col("s"))).as("n_merges_applied"))
  }

  /** Per-language tokenizer fertility — BPE tokens per whitespace
    * word, the standard "is this tokenizer fair to language X" audit
    * (a vocabulary trained on the head language inflates the tail's
    * sequence lengths, which multiplies its training and inference
    * cost): fertility_ppm = 1e6·Σ bpe_tokens div Σ words per lang,
    * NULL on a wordless language. Pure composition of [[encode]]
    * (which reads the staged merge table) + one doc-keyed join to the
    * lang map + a |langs|-bounded aggregate. */
  def fertility(docs: DataFrame, merges: Int = 8): DataFrame =
    encode(docs, merges)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_words"),
        sum(col("n_bpe_tokens")).as("n_bpe"))
      .select(col("lang"), col("n_docs"), col("n_words"), col("n_bpe"),
        when(col("n_words") > 0,
          expr("(1000000 * n_bpe) div n_words")).as("fertility_ppm"))
      .orderBy("lang")
}
