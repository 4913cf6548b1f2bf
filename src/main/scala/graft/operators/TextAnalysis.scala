package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table (SURVEY §2.4): term frequency, token counting,
  * language ID (stopword heuristic), quality scoring, and document
  * fingerprinting.
  *
  * Everything is built-in higher-order/column functions — codegen'd, no
  * UDFs — and integer arithmetic wherever a result crosses the oracle
  * boundary, so any engine agrees bit-for-bit.
  */
object TextAnalysis {

  /** Whitespace tokens of lower(text), empties dropped (single-space
    * split + empty-drop matches DuckDB string_split + list_filter
    * exactly; regex \s+ split differs on leading whitespace across
    * engines). Computed by the native codegen'd `word_tokens`
    * expression (one JVM loop; the composed filter-lambda form is the
    * differential reference in WordShinglesSpec). */
  def tokens(text: Column): Column =
    org.apache.spark.sql.graft.WordTokensExpr(text)

  /** Per-(doc, term) term frequencies — THE base table of the lexical
    * family, staged once per corpus via [[graft.Stage]] (r12):
    * termFreq/termStats/keywordExtract/termCooc/invertedIndex/tfidfSim
    * each re-ran the tokenize+explode corpus pass to reach (a
    * projection of) this exact table. The artifact is the classic
    * warehouse "term posting base": smaller than the raw token stream
    * (tf collapses repeats, map-side combined), doc_id-and-term keyed,
    * and every consumer's first aggregate now starts from a columnar
    * scan of it. Streaming inputs bypass staging (per micro-batch). */
  def stagedDocTermTf(docs: DataFrame): DataFrame = {
    def plan = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    if (docs.isStreaming) plan
    else graft.Stage.parquet(docs.sparkSession,
      graft.Stage.key(docs, "doc_term_tf"))(plan)
  }

  /** Term frequency — the classic wordcount, as the term-marginal of
    * the staged (doc, term, tf) table: one vocab-keyed aggregate over
    * the artifact instead of a corpus tokenize+explode. */
  def termFreq(docs: DataFrame): DataFrame =
    stagedDocTermTf(docs)
      .groupBy("term").agg(sum(col("tf")).as("cnt"))

  /** Inverted index for the df-band of DISCRIMINATIVE terms: term →
    * sorted posting list of doc_ids, restricted to df ∈ [minDf, maxDf]
    * (retrieval only ever posts the middle of the Zipf curve —
    * hapaxes don't generalize, stopwords post everything).
    *
    * The df cap is also the SCALE contract: df is computed FIRST (a
    * count aggregate, map-side combined), and only surviving terms
    * join back to collect postings — so a stopword's corpus-sized
    * posting list is never materialized anywhere, and every state the
    * aggregate holds is ≤ maxDf entries. The list is emitted as a
    * comma-joined sorted string (the one deterministic cross-engine
    * rendering of a list column). */
  def invertedIndex(docs: DataFrame, minDf: Int = 2, maxDf: Int = 400): DataFrame = {
    val postings = stagedDocTermTf(docs).select(col("doc_id"), col("term"))
    val dfs = postings.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf && col("df") <= maxDf)
    postings.join(dfs, Seq("term"))
      .groupBy("term", "df")
      .agg(expr("string_agg(CAST(doc_id AS STRING), ',')" +
        " WITHIN GROUP (ORDER BY doc_id)").as("postings"))
      .select(col("term"), col("df"), col("postings"))
      .orderBy("term")
  }

  /** A BPE-ish pre-tokenizer: letter runs | digit runs | single
    * punctuation. Portable regex subset (works in Java regex and RE2). */
  val bpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  /** Per-document token accounting: whitespace tokens, BPE-ish tokens,
    * characters. Pure per-row projection — pipelined in one codegen
    * stage, no shuffle at any scale. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(tokens(col("text"))).as("n_ws_tokens"),
      size(regexp_extract_all(col("text"), lit(bpeishPattern), lit(0)))
        .as("n_bpe_tokens"),
      length(col("text")).as("n_chars"))

  /** Stopword lists for the language-ID heuristic (tiny, broadcast as
    * literals into the expression — no join). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "y", "que", "un", "los"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "nicht"),
    "fr" -> Seq("le", "et", "les", "des", "une", "dans", "pour"))

  /** n-gram-free language ID: count stopword hits per language over the
    * token stream; argmax with a fixed priority tie-break; 'und' when no
    * list hits. Per-row only — no shuffle. */
  def langId(docs: DataFrame): DataFrame = {
    // stage the token array once; the per-language filters then scan an
    // already-computed value instead of re-tokenizing 4x per row
    val staged = docs.withColumn("__toks", tokens(col("text")))
    val hits = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      size(filter(col("__toks"), t => t.isInCollection(words))).as(s"hits_$lang")
    }
    val df = staged.select(col("doc_id") +: hits: _*)
    val (en, es, de, fr) =
      (col("hits_en"), col("hits_es"), col("hits_de"), col("hits_fr"))
    df.withColumn("pred_lang",
      when(greatest(en, es, de, fr) === 0, "und")
        .when(en >= es && en >= de && en >= fr, "en")
        .when(es >= de && es >= fr, "es")
        .when(de >= fr, "de")
        .otherwise("fr"))
  }

  /** Per-document character-class composition in exact ppm — the
    * cheapest corpus-health signal there is (a binary blob mislabeled
    * as text shows up as non-ASCII/"other" ppm before any tokenizer
    * runs; a table dump shows as digit-heavy). Counts are
    * length-minus-stripped with RE2-portable classes; pure codegen'd
    * projection, no shuffle. `other` = 1e6 − the named classes, so
    * rows always sum exactly. */
  def charProfile(docs: DataFrame): DataFrame = {
    def cnt(cls: String) = (length(col("text")) -
      length(regexp_replace(col("text"), cls, ""))).cast("long")
    docs.select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        cnt("[A-Za-z]").as("__a"), cnt("[0-9]").as("__d"),
        cnt("[ ]").as("__s"), cnt("[^\\x00-\\x7F]").as("__x"))
      .withColumn("__n", greatest(col("n_chars"), lit(1L)))
      .select(col("doc_id"), col("n_chars"),
        expr("(1000000 * __a) div __n").as("alpha_ppm"),
        expr("(1000000 * __d) div __n").as("digit_ppm"),
        expr("(1000000 * __s) div __n").as("space_ppm"),
        expr("(1000000 * __x) div __n").as("nonascii_ppm"),
        expr("""1000000 - (1000000 * __a) div __n
                - (1000000 * __d) div __n - (1000000 * __s) div __n
                - (1000000 * __x) div __n""").as("other_ppm"))
  }

  /** Declared-vs-detected language confusion matrix — the audit run
    * before trusting EITHER label: per (declared, detected) pair the
    * doc count and its ppm share of the declared language's rows. A
    * high-mismatch declared language means its metadata lies (or the
    * detector's stopword lists miss it: 'und' rows are the detector
    * abstaining). Composes [[langId]]; vocab²-sized aggregate with a
    * broadcast row-total join. */
  def langConfusion(docs: DataFrame): DataFrame = {
    val pairs = langId(docs)
      .join(docs.select(col("doc_id"), col("lang").as("declared")),
        "doc_id")
      .groupBy(col("declared"), col("pred_lang").as("detected"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy("declared").agg(sum("n").as("__rt"))
    pairs.join(broadcast(totals), "declared")
      .select(col("declared"), col("detected"), col("n"),
        expr("(1000000 * n) div __rt").as("share_ppm"),
        (col("declared") =!= col("detected")).as("mismatch"))
  }

  /** Integer quality score: rewards length (capped) and stopword
    * density, penalizes punctuation noise. Integer-only so the oracle is
    * bit-exact; `keep` is the pipeline's filter verdict. */
  def qualityScore(docs: DataFrame, keepThreshold: Long = 3000): DataFrame = {
    val toks = col("__toks")
    val nTokens = size(toks).cast("long")
    val stopHits = size(filter(toks, t => t.isInCollection(stopwords("en"))))
      .cast("long")
    val punct = (length(col("text")) -
      length(regexp_replace(col("text"), "[^A-Za-z0-9 ]", ""))).cast("long")
    docs.withColumn("__toks", tokens(col("text"))).select(col("doc_id"),
        least(nTokens, lit(200L)).multiply(100).as("len_component"),
        (stopHits * 10).as("stop_component"),
        (punct * 50).as("punct_penalty"))
      .withColumn("score",
        col("len_component") + col("stop_component") - col("punct_penalty"))
      .withColumn("keep", col("score") >= keepThreshold)
  }

  /** [[qualityScore]] staged once per (corpus, threshold) via
    * [[graft.Stage]]: six gated queries consume the scored frame
    * (quality_score, pareto_docs, quality_deciles, importance_sample,
    * curation_pipeline, source_quality), and each was re-running the
    * token pass over the full text column. The scored frame is
    * doc-count-sized but text-free — a few narrow integer columns — so
    * the read-back is a fraction of the scoring scan, which is exactly
    * how a production pipeline stages per-doc quality: score once on
    * ingest, let every downstream selection read the score table. */
  def qualityScoreStaged(docs: DataFrame,
                         keepThreshold: Long = 3000): DataFrame =
    // a streaming input can't be materialized (and the score is a pure
    // per-row projection there anyway — the streaming twin applies it
    // per micro-batch): stage only batch frames
    if (docs.isStreaming) qualityScore(docs, keepThreshold)
    else graft.Stage.parquet(docs.sparkSession,
      graft.Stage.key(docs, "quality_score", keepThreshold)) {
      qualityScore(docs, keepThreshold)
    }

  /** Dense hashed-count vectors per document — [[featureHash]] buckets
    * widened to a fixed `nBuckets`-dim array (absent bucket = 0), the
    * bridge from text to every vector operator in the engine: counts
    * are exact integers in double lanes, so k-means/ANN arithmetic on
    * them is deterministic cross-engine. The widening is `nBuckets`
    * conditional-sum lanes in ONE aggregate — no collect_list buffer,
    * per-group state is exactly nBuckets longs. */
  def docVectors(docs: DataFrame, nBuckets: Int = 64): DataFrame = {
    val fh = featureHash(docs, nBuckets)
    val lanes = (0 until nBuckets).map(i =>
      sum(when(col("bucket") === i, col("cnt")).otherwise(0L))
        .cast("double").as(s"__b$i"))
    fh.groupBy(col("doc_id")).agg(lanes.head, lanes.tail: _*)
      .select(col("doc_id").as("vec_id"),
        array((0 until nBuckets).map(i => col(s"__b$i")): _*).as("embedding"))
  }

  /** Doc-level term co-occurrence with positive PMI in whole bits —
    * the PPMI matrix of the pre-embedding era, still the fastest
    * "which concepts travel together" signal and the input to
    * count-based topic/association mining. PPMI(a,b) =
    * max(0, ⌊log2(c_ab·N / (df_a·df_b))⌋) over DOCUMENT co-occurrence
    * (distinct terms per doc — multiplicity is tf's business, not
    * co-occurrence's), computed via bin-length on the BIGINT lift
    * ratio (the decontam_weighted discipline).
    *
    * Scale shape: the within-doc self-join's fan-out is (distinct
    * terms per doc)² — bounded by the df cap which drops stopwords
    * BEFORE the join (they co-occur with everything and their PMI is
    * ~0 by construction); a min-pair-count floor keeps the output in
    * the statistically-meaningful band. One (term, term) aggregate
    * after the map-side join. */
  def termCooc(docs: DataFrame, maxDf: Int = 100000,
               minPairCount: Long = 5L): DataFrame = {
    // Staged (r19 optimization): the doc-term self-join is the
    // corpus-heavy pass under both term_cooc and textrank_terms —
    // the vocab²-bounded edge table is the storable artifact; the
    // orderBy re-applies on the read-back so callers see the same
    // row order as the live plan.
    def plan = {
      val dt = stagedDocTermTf(docs).select(col("doc_id"), col("term"))
      val nd = docs.agg(count(lit(1)).as("nd"))
      val dfs = dt.groupBy("term").agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxDf)
      val kept = dt.join(dfs, Seq("term"))
      val pairs = kept.select(col("doc_id"), col("term").as("ta"),
          col("df").as("dfa"))
        .join(kept.select(col("doc_id"), col("term").as("tb"),
          col("df").as("dfb")), Seq("doc_id"))
        .filter(col("ta") < col("tb"))
        .groupBy("ta", "tb", "dfa", "dfb").agg(count(lit(1)).as("c_ab"))
        .filter(col("c_ab") >= minPairCount)
      pairs.crossJoin(broadcast(nd))
        .select(col("ta"), col("tb"), col("c_ab"),
          greatest(lit(0L),
            (length(bin(expr(
              """CAST((CAST(c_ab AS DECIMAL(38,0)) * nd)
                      div (CAST(dfa AS DECIMAL(38,0)) * dfb) AS BIGINT)""")))
              - 1).cast("long")).as("ppmi_bits"))
    }
    val staged =
      if (docs.isStreaming) plan
      else graft.Stage.parquet(docs.sparkSession,
        graft.Stage.key(docs, "term_cooc", maxDf, minPairCount))(plan)
    staged.orderBy("ta", "tb")
  }

  /** Distinctive terms per source — top-k by integer LIFT (the
    * source's term share vs the corpus share, in ppm): the per-source
    * vocabulary fingerprint that catches a mislabeled crawl slice or
    * a source gone off-topic, where raw top terms would just show
    * stopwords everywhere.
    *
    * lift_ppm = (1e6 · c_st · T) div (c_s · c_t) in DECIMAL(38,0)
    * lanes (HUGEINT twin — c_st·T alone passes 2^63 on a 1e13-token
    * corpus), with c_st = term-in-source count, c_s = source tokens,
    * c_t = corpus term count, T = corpus tokens. A minCount floor
    * keeps one-off terms from posting infinite lift. Shapes:
    * one (source, term) aggregate, vocab-sized marginals broadcast
    * back, rank window pruned map-side by WindowGroupLimit. */
  def sourceTerms(docs: DataFrame, k: Int = 5, minCount: Long = 10L)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val st = graft.Caches.track(docs
      .select(col("source"), explode(tokens(col("text"))).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("c_st")))
    val bySource = st.groupBy("source").agg(sum(col("c_st")).as("c_s"))
    val byTerm = st.groupBy("term").agg(sum(col("c_st")).as("c_t"))
    val total = st.agg(sum(col("c_st")).as("t_total"))
    st.filter(col("c_st") >= minCount)
      .join(broadcast(bySource), Seq("source"))
      .join(broadcast(byTerm), Seq("term"))
      .crossJoin(broadcast(total))
      .select(col("source"), col("term"), col("c_st"),
        expr("""CAST((CAST(1000000 AS DECIMAL(38,0)) * c_st * t_total)
                     div (CAST(c_s AS DECIMAL(38,0)) * c_t) AS BIGINT)""")
          .as("lift_ppm"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("source")
          .orderBy(col("lift_ppm").desc, col("term"))))
      .filter(col("rank") <= k)
      .select(col("source"), col("rank").cast("int").as("rank"),
        col("term"), col("c_st"), col("lift_ppm"))
      .orderBy("source", "rank")
  }

  /** Feature hashing (the hashing trick, Weinberger et al. 2009): each
    * term maps to bucket = portable_hash32(term) mod nBuckets, and a
    * document becomes its sparse bucket-count vector — the fixed-width
    * vectorizer that needs NO vocabulary pass, no dictionary broadcast,
    * and no OOV handling, which is why it's the default featurizer at
    * corpus scale. Collisions are the accepted trade (documented, not
    * hidden — nBuckets is the dial).
    *
    * One explode + one (doc, bucket) aggregate with map-side combine;
    * the hash is the codegen'd md5-lane PortableHash32Expr, so DuckDB
    * reproduces every bucket id exactly. */
  def featureHash(docs: DataFrame, nBuckets: Int = 64): DataFrame =
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .select(col("doc_id"),
        pmod(graft.functions.PortableHash.hash32(col("term")),
          lit(nBuckets.toLong)).as("bucket"))
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("cnt"))
      .orderBy("doc_id", "bucket")

  /** Context-window chunking: split each document into fixed-size
    * token windows with overlap (window w, stride s < w) — the
    * pre-training/RAG segmentation step that turns documents into
    * model-sized pieces without losing cross-boundary context. Chunk i
    * covers tokens [i·s, min(i·s + w, n)); the last chunk starts at
    * the last i with i·s < n, so every token lands in ≥ 1 chunk and
    * consecutive chunks share w − s tokens.
    *
    * Map-only: tokens once per doc (native tokenizer), a `sequence`
    * explode of ceil factor (n−1)/s chunk ids — fan-out is n/s rows
    * per doc, the output's inherent size, with no shuffle at all. */
  def docChunks(docs: DataFrame, window: Int = 64, stride: Int = 48)
      : DataFrame = {
    require(stride > 0 && window >= stride,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    docs
      .select(col("doc_id"), tokens(col("text")).as("__toks"))
      .withColumn("__n", size(col("__toks")).cast("long"))
      .filter(col("__n") > 0)
      .select(col("doc_id"), col("__toks"), col("__n"),
        explode(expr(s"sequence(0L, (__n - 1) div $stride)")).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        (col("chunk_id") * stride).as("start_tok"),
        least(col("chunk_id") * stride + window, col("__n")).as("end_tok"),
        array_join(slice(col("__toks"),
          (col("chunk_id") * stride + 1).cast("int"),
          least(lit(window),
            col("__n") - col("chunk_id") * stride).cast("int")), " ")
          .as("chunk_text"))
      .orderBy("doc_id", "chunk_id")
  }

  /** Doc-to-doc sparse tf-idf similarity top-k — the lexical twin of
    * the dense-embedding ANN family: documents as sparse integer
    * vectors (weight = tf × whole-bit idf), similarity through the
    * SHARED-TERM join (the only pairs that can have nonzero dot are
    * pairs sharing a term — the inverted-index identity), never an
    * all-pairs pass.
    *
    * Integer discipline: idf is the 2²⁰-scaled whole-bit rarity
    * w(term) = ⌊log2(2²⁰·N/df)⌋ (bin-length floor-log2, the
    * unigram_surprisal lanes), weights/dots/norms are exact BIGINTs,
    * and the ranking key is the quantized squared cosine sim2_ppm =
    * ⌊1e6·dot²/(‖q‖²‖c‖²)⌋ in DECIMAL(38,0) lanes — dot ≥ 0 always
    * (weights are positive), so sim² orders like sim. Ranking on the
    * QUANTIZED value with a cand_id tie-break is the operator's
    * defined semantics (both engines rank identical integers).
    *
    * Scale shape: df cap drops stopword postings BEFORE the join (a
    * stopword joins everything × everything); the term join's fan-out
    * per query doc is Σ df(term) over the doc's capped terms; norms
    * broadcast is queries-sized on one side, doc-keyed join on the
    * other. */
  def tfidfSim(docs: DataFrame, nQueries: Int = 10, k: Int = 5,
               maxDf: Int = 100000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = stagedDocTermTf(docs)
    val nd = docs.agg(count(lit(1)).as("nd"))
    val w = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .crossJoin(broadcast(nd))
      .select(col("term"),
        (length(bin(expr("(1048576 * nd) div df"))) - 1).cast("long").as("w"))
    val wtf = graft.Caches.track(tf.join(w, Seq("term"))
      .select(col("doc_id"), col("term"), (col("tf") * col("w")).as("x")))
    val norms = graft.Caches.track(
      wtf.groupBy("doc_id").agg(sum(col("x") * col("x")).as("n2")))
    val q = wtf.filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("query_id"), col("term"), col("x").as("qx"))
    val dots = q.join(wtf, Seq("term"))
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("qx") * col("x")).as("dot"))
    dots
      .join(norms.select(col("doc_id"), col("n2").as("cn2")), Seq("doc_id"))
      .join(broadcast(norms.filter(col("doc_id") < nQueries)
        .select(col("doc_id").as("query_id"), col("n2").as("qn2"))),
        Seq("query_id"))
      .withColumn("sim2_ppm",
        expr("""CAST((CAST(1000000 AS DECIMAL(38,0)) * dot * dot)
                     div (CAST(qn2 AS DECIMAL(38,0)) * cn2) AS BIGINT)"""))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("sim2_ppm").desc, col("doc_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col("doc_id").as("cand_id"), col("sim2_ppm"))
      .orderBy("query_id", "rank")
  }

  /** Top-k terms per language label: grouped counts + a rank window.
    * Two shuffles (term counts, then rank partition) — the rank
    * partition count is |langs|, small, but each group is k-bounded so
    * the window sorts only survivors of the partial-agg stage. */
  def topTermsPerLang(docs: DataFrame, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docs.select(col("lang"), explode(tokens(col("text"))).as("term"))
      .groupBy("lang", "term").agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("lang").orderBy(col("cnt").desc, col("term"))))
      .filter(col("rank") <= k)
      .select(col("lang"), col("rank").cast("int").as("rank"),
        col("term"), col("cnt"))
  }

  /** Collection statistics per term: total term frequency + document
    * frequency (the inputs to any TF-IDF weighting — the log transform
    * is left to consumers; transcendentals don't cross the oracle
    * boundary). One explode + one aggregation per quantity, both with
    * map-side partial agg. */
  def termStats(docs: DataFrame): DataFrame =
    // tf = Σ per-doc tf, df = rows per term — both marginals of the
    // staged table (the old count_distinct(doc_id) needed a second
    // corpus-wide expand; the (doc, term) key makes df a plain count)
    stagedDocTermTf(docs).groupBy("term").agg(
      sum(col("tf")).as("tf"),
      count(lit(1)).as("df"))

  /** Per-document keyword extraction: top-N terms ranked by the
    * integer tf/df ratio score (tf · 1e6 div df — a log-free TF-IDF
    * surrogate: rare-in-corpus, frequent-in-doc terms win; integer so
    * any engine agrees bit-for-bit). One explode feeds both the
    * per-(doc, term) tf table and — via a reuse-persist, since tf is
    * strictly smaller than the token stream — the corpus df table; the
    * join is on term (df is NOT broadcast: vocabulary is unbounded at
    * corpus scale), the final top-N is a bounded per-doc window. */
  def keywordExtract(docs: DataFrame, topN: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = stagedDocTermTf(docs)
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(df, Seq("term"))
      .withColumn("score_micro", expr("(tf * 1000000) div df"))
      .withColumn("rank", row_number().over(Window.partitionBy("doc_id")
        .orderBy(col("score_micro").desc, col("term"))))
      .filter(col("rank") <= topN)
      .select(col("doc_id"), col("rank").cast("int").as("rank"),
        col("term"), col("tf"), col("df"), col("score_micro"))
  }

  /** TextRank keyword ranking (Mihalcea & Tarau 2004) — corpus-level
    * term salience from graph centrality instead of [[keywordExtract]]'s
    * per-doc tf/df ratio: terms vote for the terms they co-occur with,
    * weighted by co-occurrence count, and votes recirculate until hubs
    * of the co-occurrence topology surface. The graph is [[termCooc]]'s
    * df-capped pair table made symmetric (TextRank is undirected), the
    * iteration is [[Graph.pagerankCore]]'s exact damped ppm power
    * method — one shared update, one shared oracle round SQL.
    *
    * Scale shape: corpus appears once (the doc-term self-join inside
    * termCooc, df-capped); the symmetric edge table and every
    * iteration are vocab²-bounded; top-k is a TakeOrderedAndProject.
    * Isolated terms (no qualifying pair) hold no rank by construction —
    * TextRank over a co-occurrence graph only ranks connected terms. */
  def textrankTerms(docs: DataFrame, iters: Int = 4, topK: Int = 25,
                    maxDf: Int = 100000,
                    minPairCount: Long = 5L): DataFrame = {
    val und = termCooc(docs, maxDf, minPairCount)
      .select(col("ta"), col("tb"), col("c_ab"))
    // tracked: the edge normalization inside pagerankCore references
    // this frame twice, and each occurrence would otherwise re-run the
    // corpus-sized doc-term self-join
    val sym = graft.Caches.track(
      und.select(col("ta").as("src"), col("tb").as("dst"),
          col("c_ab").as("c"))
        .unionByName(und.select(col("tb").as("src"), col("ta").as("dst"),
          col("c_ab").as("c"))))
    Graph.pagerankCore(sym,
      sym.select(col("src").as("node")).distinct(), iters)
      .select(col("node").as("term"), col("r_ppm").as("rank_ppm"))
      .orderBy(col("rank_ppm").desc, col("term")).limit(topK)
  }

  /** Count-Min sketch audit (Cormode & Muthukrishnan 2005) — the
    * point-query sketch completing the family next to HLL
    * (approx_distinct), KMV (kmv_overlap), and SimHash: d independent
    * hash lanes × w counters, point estimate = min over lanes, with
    * the one-sided guarantee est ≥ exact (a cell only ever ADDS other
    * terms' mass). Reported for the top-k exact terms so the output
    * row set is deterministic and the overcount is measured where it
    * matters (heavy hitters are what CMS is consulted for).
    *
    * Batch equivalence: a streaming CMS increments cell (i, h_i(t))
    * per occurrence; summing per-term totals into cells is the same
    * grid, so the sketch builds from the vocab-sized exact table —
    * corpus touched once through the staged tf artifact, everything
    * after is vocab-bounded (×d). Lanes are the md5 `lane:term`
    * family (PortableHash — independent because md5 mixes the prefix
    * fully); over_ppm divides non-negative operands only, where Spark
    * `div` = DuckDB `//`. */
  def cmsTopk(docs: DataFrame, lanes: Int = 4, width: Int = 1024,
              topK: Int = 20): DataFrame = {
    val exact = graft.Caches.track(
      stagedDocTermTf(docs).groupBy("term")
        .agg(sum(col("tf")).as("exact")))
    val expanded = graft.Caches.track(
      exact.select(col("term"), col("exact"),
          explode(array((0 until lanes).map(i => lit(i)): _*)).as("lane"))
        .withColumn("bucket", pmod(PortableHash.hash32(
          concat(col("lane").cast("string"), lit(":"), col("term"))),
          lit(width.toLong))))
    val cells = expanded.groupBy("lane", "bucket")
      .agg(sum(col("exact")).as("cell"))
    val top = exact.orderBy(col("exact").desc, col("term")).limit(topK)
    expanded.join(top.select(col("term")), Seq("term"))
      .join(cells, Seq("lane", "bucket"))
      .groupBy("term", "exact").agg(min(col("cell")).as("est"))
      .select(col("term"), col("exact"), col("est"),
        expr("(1000000 * (est - exact)) div exact").as("over_ppm"))
      .orderBy(col("exact").desc, col("term"))
  }

  /** Document fingerprints: a 31-polynomial rolling hash over the raw
    * characters (mod 1e9+7 — stays in 35 bits, no overflow in any
    * engine) plus a 32-bit md5 lane. Content-addressed dedup keys; pure
    * per-row, no shuffle. The rolling hash is the native codegen'd
    * `rolling_hash31` expression — one allocation-free JVM loop instead
    * of a per-character UTF8String array + interpreted fold
    * (RollingHashSpec locks it to the composed form's values). */
  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      org.apache.spark.sql.graft.RollingHash31Expr(col("text")).as("fp_roll"),
      PortableHash.hash32(col("text")).as("fp_md5"))

  /** One-pass corpus summary per language — the dashboard numbers a
    * pipeline run reports (doc/token volume, size profile). Single
    * shuffle on lang with map-side partials; integer average (div) so
    * any engine agrees. */
  def corpusStats(docs: DataFrame): DataFrame =
    docs.select(col("lang"),
        size(tokens(col("text"))).cast("long").as("__t"),
        length(col("text")).cast("long").as("__c"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("__t").as("total_tokens"),
        max("__t").as("max_tokens"),
        expr("sum(__c) div count(1)").as("avg_chars"))

  /** Intra-document repetition (the Gopher-rules quality signal): the
    * fraction of a doc's word n-grams that are repeats of an earlier
    * n-gram in the SAME doc — boilerplate, scraped menus, and
    * degenerate generations score high. dup_milli = 1000·(total −
    * distinct)/total; total = tokens − n + 1, distinct = the native
    * word_shingles set size (its <n-token fallback is one whole-text
    * shingle → total clamps to 1 and dup is 0). Pure per-row
    * projection over two native expressions — no shuffle, no explode:
    * the per-doc n-gram multiset never materializes. */
  def repeatedNgrams(docs: DataFrame, n: Int = 3,
                     flagMilli: Long = 200L): DataFrame = {
    val nToks = size(tokens(col("text"))).cast("long")
    val total = greatest(nToks - (n - 1), lit(1L))
    val distinctN = size(Dedup.shingles(col("text"), n)).cast("long")
    docs.select(col("doc_id"), total.as("total_ngrams"),
        distinctN.as("distinct_ngrams"))
      .withColumn("dup_milli",
        expr("(1000 * (total_ngrams - distinct_ngrams)) div total_ngrams"))
      .withColumn("flagged", col("dup_milli") >= flagMilli)
  }

  /** Longest-repeated-run probe ladder — [[repeatedNgrams]] asks "how
    * much duplication at n = 3"; this asks "how LONG is the longest
    * within-doc verbatim repeat", the degenerate-generation /
    * boilerplate-loop signal (Holtzman-style repetition collapses and
    * templated pages repeat long spans; natural prose repeats words,
    * not paragraphs). Exact longest-repeat needs a suffix structure;
    * the scalable standard is a DOUBLING probe — L ∈ {1,2,4,8,16,32} —
    * reporting the largest probed L at which some L-gram occurs twice
    * (a power-of-two lower bound of the true maximum, the documented
    * contract).
    *
    * Entirely map-only per doc: a repeat at width L exists iff the
    * distinct L-shingle count (the codegen'd WordShinglesExpr set)
    * is < the L-gram count — six per-row array expressions, ZERO
    * shuffle before the |ladder|-bounded histogram aggregate. Docs
    * with fewer than two L-grams cannot repeat at L (guard excludes
    * the whole-text shingle fallback identically in both engines). */
  def repeatDepth(docs: DataFrame): DataFrame = {
    val nToks = size(tokens(col("text"))).cast("long")
    val ladder = Seq(1, 2, 4, 8, 16, 32)
    val maxRep = greatest(ladder.map { l =>
      when(nToks - (l - 1) >= 2 &&
        size(Dedup.shingles(col("text"), l)).cast("long") <
          nToks - (l - 1),
        lit(l.toLong)).otherwise(lit(0L))
    }: _*)
    docs.select(col("doc_id"), maxRep.as("max_rep"))
      .groupBy("max_rep").agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(docs.agg(count(lit(1)).as("n"))))
      .select(col("max_rep"), col("n_docs"),
        expr("(1000000 * n_docs) div n").as("share_ppm"))
      .orderBy("max_rep")
  }

  /** EXACT longest repeated token span per doc — the suffix structure
    * [[repeatDepth]]'s contract points at, delivered: a native
    * codegen'd suffix-automaton expression
    * ([[org.apache.spark.sql.graft.LongestRepeatExpr]]) makes the
    * whole operator one map over the corpus (no explode, no shuffle,
    * no per-L probe passes). The probe ladder remains the histogram
    * view; this is the per-doc exact number a removal decision reads.
    * TextAnalysisSpec pins the cross-op invariant: repeatDepth's
    * max_rep is exactly the largest ladder rung ≤ lrs. */
  def longestRepeat(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_tokens"),
      org.apache.spark.sql.graft.LongestRepeatExpr(col("text")).as("lrs"))

  /** Heavy hitters with a Count-Min sketch cross-check — the
    * bounded-memory frequency sketch beside the library's HLL
    * (approx_distinct) and t-digest (approx_percentiles): the CMS is
    * depth×width counters REGARDLESS of vocabulary size, the
    * streaming/low-memory path to frequent-term detection when the
    * exact groupBy's map-side hash table would blow the budget.
    *
    * Shape: ONE pass over the corpus — explode → the exact per-term tf
    * aggregate (map-side partial combine) — and everything downstream
    * reads the VOCAB-sized tf table: the sketch is built by the
    * weighted [[org.apache.spark.sql.graft.CmsBuildAgg]] (`cnt` unit
    * adds collapse into one counter add — bit-identical to sketching
    * the raw stream, since CMS counters are pure sums), the total is
    * `sum(cnt)`, and the top-N is orderBy+limit (TakeOrdered). At
    * 100 TB nothing corpus-sized is scanned twice or persisted — the
    * one tracked cache holds (term, cnt) rows, bounded by vocabulary,
    * not corpus (the r9-verdict memory blemish). The top-N exact terms
    * then probe the broadcast 1-row sketch via
    * [[org.apache.spark.sql.graft.CmsEstimateExpr]] (the scalar read
    * half Spark doesn't ship). Oracled HLL-style: the ESTIMATE stays
    * engine-internal; what crosses the gate are the exact counts and
    * the CMS guarantees (estimate ≥ truth always; ≤ truth + ε·total at
    * the configured confidence), which DuckDB states as literal
    * booleans. */
  def heavyHitters(docs: DataFrame, topN: Int = 10, eps: Double = 0.005,
                   confidence: Double = 0.99, seed: Int = 42): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = graft.Caches.track(
      docs.select(explode(tokens(col("text"))).as("term"))
        .groupBy("term").agg(count(lit(1)).as("cnt")))
    val sketch = tf.agg(
      org.apache.spark.sql.graft.CmsBuildAgg(col("term"), col("cnt"),
        eps, confidence, seed).as("__sk"),
      sum(col("cnt")).as("__total"))
    val top = tf.orderBy(col("cnt").desc, col("term")).limit(topN)
    top.crossJoin(broadcast(sketch))
      .withColumn("__est",
        org.apache.spark.sql.graft.CmsEstimateExpr(col("__sk"), col("term")))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cnt").desc, col("term"))))
      .select(col("rank").cast("int").as("rank"), col("term"), col("cnt"),
        (col("__est") >= col("cnt")).as("est_ge_true"),
        (col("__est") <= col("cnt")
          + ceil(lit(eps) * col("__total")).cast("long")).as("est_within_eps"))
  }

  /** BM25-style retrieval ranking of the corpus against a fixed,
    * plan-time query term set — the search primitive a curation
    * pipeline runs for targeted decontamination sweeps and quality
    * probes (keywordExtract is per-doc top terms; this is the inverse:
    * docs ranked for a query).
    *
    * Scoring is Robertson tf-saturation (k1=1.2, b=0.75) with a
    * RATIONAL idf: idf_r = (N − df + 0.5)/(df + 0.5), i.e. the
    * standard BM25 idf WITHOUT the log. ln is the one transcendental
    * whose last-ulp differs across engines (the library's float
    * discipline allows only correctly-rounded +,*,/,sqrt), and since
    * per-term weights just rescale monotonically, the ranking stays
    * BM25-shaped while every double op is bit-reproducible. All
    * divisions/multiplications are written in one fixed order, summed
    * over terms in query order, and quantized floor(·1e6) at output.
    *
    * Scale shape: query terms are plan-time constants, so per-doc term
    * frequencies are array-filter counts over the one tokens pass — a
    * pure map, NO explode and NO join on term. Corpus stats (N, Σdl,
    * per-term df) are ONE single-row aggregate broadcast back; the
    * global top-N is orderBy+limit, which Spark executes as
    * TakeOrdered (per-partition partial top-k, no single-task window);
    * the rank column is a window over the ≤topN survivors only. */
  def bm25Rank(docs: DataFrame,
               queryTerms: Seq[String] = Seq("spark", "join", "filter"),
               topN: Int = 20): DataFrame = {
    // constants appear as DECIMAL LITERALS on both sides (never
    // computed: "k1 + 1" at plan time vs a parsed "2.2e0" literal is a
    // round-to-even coin flip away from a one-ulp divergence)
    val k1Plus1 = lit(2.2d); val k1 = lit(1.2d)
    val oneMinusB = lit(0.25d); val b = lit(0.75d)
    // projection barrier: tf lambdas must read the materialized token
    // array, not re-derive it per element (the interpreted-HOF lesson)
    val tokedCols =
      Seq(col("doc_id"), size(col("__toks")).cast("long").as("dl")) ++
        queryTerms.zipWithIndex.map { case (t, i) =>
          size(filter(col("__toks"), x => x === lit(t))).cast("long").as(s"tf$i")
        }
    val toked = docs.select(col("doc_id"), tokens(col("text")).as("__toks"))
      .select(tokedCols: _*)
    // tiny per-doc projection (doc_id + 1+|terms| longs) feeds both the
    // stats aggregate and the scored output — persist, don't recompute
    // the tokenizing scan twice
    val base = graft.Caches.track(toked)
    val statCols =
      Seq(count(lit(1)).as("n"), sum(col("dl")).as("sdl")) ++
        queryTerms.indices.map(i =>
          sum((col(s"tf$i") > 0).cast("long")).as(s"df$i"))
    val stats = base.agg(statCols.head, statCols.tail: _*)
    val avgdl = col("sdl").cast("double") / col("n").cast("double")
    def idf(i: Int): Column =
      ((col("n") - col(s"df$i")).cast("double") + lit(0.5d)) /
        (col(s"df$i").cast("double") + lit(0.5d))
    def tfSat(i: Int): Column = {
      val tf = col(s"tf$i").cast("double")
      (tf * k1Plus1) /
        (tf + k1 * (oneMinusB + (b * col("dl").cast("double")) / avgdl))
    }
    val score = queryTerms.indices
      .map(i => idf(i) * tfSat(i))
      .reduce(_ + _) // left fold in query-term order — fixed sum order
    val scoredCols = Seq(col("doc_id")) ++
      queryTerms.indices.map(i => col(s"tf$i")) :+
      floor(score * 1000000L).cast("long").as("score_micro")
    val scored = base.crossJoin(broadcast(stats))
      .select(scoredCols: _*)
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(topN)
    import org.apache.spark.sql.expressions.Window
    scored.withColumn("rank", row_number().over(
        Window.orderBy(col("score_micro").desc, col("doc_id"))))
      .select(Seq(col("rank").cast("int").as("rank"), col("doc_id")) ++
        queryTerms.indices.map(i => col(s"tf$i")) :+ col("score_micro"): _*)
  }

  /** Unigram-LM surprisal scoring — the CCNet/Gopher-style "perplexity
    * band" quality filter: train the unigram model on the corpus
    * itself, score each doc by its mean per-token surprisal, and keep
    * docs inside a band (too LOW = repetitive boilerplate, too HIGH =
    * gibberish/OOV soup).
    *
    * The surprisal of a token with corpus count c out of total T is
    * quantized to WHOLE BITS: bits = floor(log2(T div c)), computed as
    * `length(bin(T div c)) - 1` — exact integer math on any engine
    * (`bin` is unpadded in both Spark and DuckDB), where a float
    * `ln`/`log2` would be the one transcendental whose last ulp
    * differs across engines (the bm25Rank discipline). The doc score
    * is the tf-weighted mean in millibits: (Σ tf·bits · 1000) div Σ tf.
    *
    * Scale shape: TWO corpus passes, NOTHING corpus-sized persisted
    * (the heavy_hitters lesson): pass 1 explodes to the per-doc tf
    * aggregate (map-side combine on (doc_id, term)); pass 2 aggregates
    * straight to the VOCAB-sized model (the only tracked cache). T is
    * a 1-row aggregate broadcast back onto the model. The scoring join
    * tf ⋈ bits is declared plain: Spark auto-broadcasts the
    * vocab-sized build side when it fits, and AQE's skew handling
    * covers the Zipf head when it doesn't — exactly the decision the
    * optimizer owns. */
  def unigramSurprisal(docs: DataFrame, keepLoMilli: Long = 2000,
                       keepHiMilli: Long = 9000): DataFrame = {
    // Staged (r19 optimization): the per-doc surprisal score is the
    // stored LM-scoring artifact three gated consumers re-derived per
    // call (the surprisal dump, the source×band mix, the Spearman
    // rank audit); the keep band is a projection on the staged score.
    def plan = {
      // both the per-doc tf and the vocabulary (Σ tf per term ≡ corpus
      // count) read the ONE staged posting base — no tokenize pass here
      val tf = stagedDocTermTf(docs)
      val vocab = graft.Caches.track(
        tf.groupBy("term").agg(sum(col("tf")).as("c")))
      val total = vocab.agg(sum(col("c")).as("t"))
      val bits = vocab.crossJoin(broadcast(total))
        .select(col("term"),
          (length(bin(expr("t div c"))) - 1).cast("long").as("b"))
      tf.join(bits, "term")
        .groupBy("doc_id")
        .agg(sum(col("tf")).as("n_tokens"),
          sum(col("tf") * col("b")).as("sum_bits"))
        .select(col("doc_id"), col("n_tokens"),
          expr("(sum_bits * 1000) div n_tokens").as("surprisal_milli"))
    }
    val staged =
      if (docs.isStreaming) plan
      else graft.Stage.parquet(docs.sparkSession,
        graft.Stage.key(docs, "unigram_surprisal"))(plan)
    staged
      .withColumn("keep",
        col("surprisal_milli").between(keepLoMilli, keepHiMilli))
      .orderBy("doc_id")
  }

  /** Source × surprisal-band mixture matrix — the CCNet "head/middle/
    * tail" report generalized: every doc's unigram surprisal
    * ([[unigramSurprisal]], already whole-bit exact) bucketed into
    * fixed milli-bit bands, crossed with its source, with doc and
    * token counts and the band's share of the source in ppm. This is
    * the table a mixture designer reads to see WHICH slices a
    * perplexity filter would cut, per source, before committing.
    *
    * Composition-only cost: the surprisal frame folds off the staged
    * posting base; one doc-keyed join to the source map; the matrix
    * aggregate is |sources|·|bands|-bounded with per-source totals
    * broadcast back. */
  def surprisalMix(docs: DataFrame, bandMilli: Long = 2000L)
      : DataFrame = {
    val s = unigramSurprisal(docs)
      .select(col("doc_id"), col("n_tokens"), col("surprisal_milli"))
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
    val cells = s.groupBy(col("source"),
        expr(s"surprisal_milli div $bandMilli").as("band"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
    val totals = cells.groupBy("source").agg(sum(col("n_docs")).as("t"))
    cells.join(broadcast(totals), "source")
      .select(col("source"), col("band"), col("n_docs"), col("n_tokens"),
        expr("(1000000 * n_docs) div t").as("share_ppm"))
      .orderBy("source", "band")
  }

  /** Bigram instances of a staged token array (`__toks`), WITH
    * multiplicity — [[graft.operators.Dedup.shingles]] is set-semantic,
    * which is right for LSH but wrong for language-model counts. Docs
    * under 2 tokens yield no bigrams. */
  private def bigramsOfStaged: Column =
    when(size(col("__toks")) < 2, array().cast("array<string>"))
      .otherwise(expr(
        """zip_with(slice(__toks, 1, size(__toks) - 1),
                    slice(__toks, 2, size(__toks) - 1),
                    (x, y) -> concat(x, ' ', y))"""))

  /** Bigram-LM conditional surprisal — [[unigramSurprisal]] upgraded
    * from context-free token rarity to SEQUENCE fluency: each bigram
    * (w1, w2) costs floor(log2(c1' div c2)) whole bits, where c2 is
    * the corpus count of the bigram and c1' the corpus count of w1 as
    * a bigram PREFIX (so probabilities per context sum to 1 and c1' ≥
    * c2 keeps the ratio ≥ 1). A doc of common words in an UNSEEN order
    * scores high here while unigramSurprisal stays blind — the
    * word-salad detector. Same integer discipline: `length(bin(x))-1`
    * is exact floor(log2), no transcendental crosses the oracle.
    *
    * Scale shape mirrors [[unigramSurprisal]]: two corpus passes (per-
    * doc bigram tf; bigram vocab), the bigram construction is a pure
    * map (zip_with over the staged token array — no position join, no
    * explode-then-self-join); ONLY the vocab-sized model is cached,
    * and the prefix totals derive from the vocab itself (a vocab-sized
    * aggregate, not a third corpus pass). Both model joins are
    * declared plain for Catalyst/AQE to broadcast or skew-split. */
  /** (doc_id, bigram) instance stream with multiplicity — shared by
    * [[bigramSurprisal]] and [[pmiPhrases]] so both LMs count the
    * same bigrams. Pure map over the staged token array. */
  private def bigramInstances(d: DataFrame): DataFrame =
    d.select(col("doc_id"), tokens(col("text")).as("__toks"))
      .select(col("doc_id"), explode(bigramsOfStaged).as("b"))

  /** Per-(doc, bigram) tf table, STAGED once per corpus (r12) — the
    * shared model input of [[bigramSurprisal]] and [[pmiPhrases]]:
    * both LMs count the same bigram events, and Σ tf per bigram IS the
    * corpus count, so every marginal either needs derives from this
    * frame by aggregation. The same production argument as the
    * unigram tf artifact: an n-gram count table is a stored index, not
    * a per-query recompute. Streaming inputs bypass staging. */
  private[graft] def stagedBigramTf(docs: DataFrame): DataFrame = {
    def build = bigramInstances(docs)
      .groupBy("doc_id", "b").agg(count(lit(1)).as("tf"))
    if (docs.isStreaming) build
    else graft.Stage.parquet(docs.sparkSession,
      graft.Stage.key(docs, "bigram_tf"))(build)
  }

  def bigramSurprisal(docs: DataFrame): DataFrame = {
    // the vocabulary derives from the staged tf artifact (Σ tf ≡
    // corpus count) — ONE tokenize+explode pass ever runs per corpus
    val tf = stagedBigramTf(docs)
    val vocab = tf.groupBy("b").agg(sum(col("tf")).as("c2"))
    val pre = vocab
      .groupBy(substring_index(col("b"), " ", 1).as("w1"))
      .agg(sum(col("c2")).as("c1"))
    val bits = vocab
      .join(pre, substring_index(col("b"), " ", 1) === col("w1"))
      .select(col("b"),
        (length(bin(expr("c1 div c2"))) - 1).cast("long").as("bi"))
    tf.join(bits, "b")
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_bigrams"),
        sum(col("tf") * col("bi")).as("sum_bits"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("(sum_bits * 1000) div n_bigrams").as("surprisal_milli"))
      .orderBy("doc_id")
  }

  /** Char-trigram language identification (Cavnar & Trenkle 1994's
    * n-gram-profile "out-of-place" classifier — the textcat method,
    * and what fastText-style LID approximates): per language a ranked
    * top-N profile of padded char trigrams, per doc a top-M profile,
    * and the doc's score against each language is Σ |doc_rank −
    * lang_rank| with the max penalty N for trigrams absent from the
    * profile; argmin wins (tie → lang asc). Where [[langId]] needs a
    * curated stopword list per language, this TRAINS its evidence from
    * the corpus and works at the character level (robust to unseen
    * words and agglutinative languages). Resubstitution confusion
    * matrix out, like Classify.nbConfusion.
    *
    * All-integer rank arithmetic. Scale shape: the trigram stream is
    * ~3× corpus chars (two explodes, the char_profile cost class);
    * both profile builds are rank windows pruned map-side by
    * WindowGroupLimit; language profiles are \|langs\|·N rows
    * BROADCAST; the scoring fan-out is docM·\|langs\| rows per doc;
    * confusion output \|langs\|²-bounded. */
  def langIdChargram(docs: DataFrame, profN: Int = 64, docM: Int = 20)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Staged (r19 optimization): both rank profiles are the trained
    // textcat artifacts (language profiles = the model; doc profiles =
    // the scoring index) — one Stage.dir build shares the single
    // trigram explode; the per-call cost is the docM·|langs| scoring
    // join over the read-backs.
    val spark = docs.sparkSession
    val profDir = graft.Stage.dir(
      graft.Stage.key(docs, "langid_profiles", profN, docM)) { dir =>
      val grams = graft.Caches.track(docs
        .select(col("doc_id"), col("lang"),
          explode(tokens(col("text"))).as("t"))
        .select(col("doc_id"), col("lang"), explode(expr(
          """transform(sequence(1, length(t)),
               i -> substring(concat('_', t, '_'), i, 3))""")).as("g")))
      grams.groupBy("lang", "g").agg(count(lit(1)).as("c"))
        .withColumn("lrank", row_number().over(
          Window.partitionBy("lang").orderBy(col("c").desc, col("g"))))
        .filter(col("lrank") <= profN)
        .select(col("lang").as("plang"), col("g"), col("lrank"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/langprof")
      grams.groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        .withColumn("drank", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("c").desc, col("g"))))
        .filter(col("drank") <= docM)
        .select(col("doc_id"), col("g"), col("drank"))
        .write.mode("overwrite").parquet(s"$dir/docprof")
    }
    val langProf = spark.read.parquet(s"$profDir/langprof")
    val docProf = spark.read.parquet(s"$profDir/docprof")
    val langs = langProf.select(col("plang")).distinct()
    val pred = docProf.crossJoin(broadcast(langs))
      .join(broadcast(langProf), Seq("plang", "g"), "left")
      .groupBy("doc_id", "plang")
      .agg(sum(coalesce(abs(col("drank") - col("lrank")),
        lit(profN.toLong))).as("oop"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("oop"), col("plang"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("plang").as("predicted"))
    docs.select(col("doc_id"), col("lang")).join(pred, "doc_id")
      .groupBy("lang", "predicted").agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "predicted")
  }

  /** Chi-square term–source association (the Yang & Pedersen 1997
    * feature-selection statistic, which their study found matches or
    * beats information gain): for each term, the chi² of the
    * |sources|×2 document-presence contingency — the terms a quality/
    * domain classifier should be built ON, and the complement of
    * [[sourceTerms]]' per-source lift view (this ranks terms globally
    * by how much ANY source imbalance they carry).
    *
    * Same per-cell ppm-floor quantization as Stats.independenceTest:
    * cell = ((o·N − r·c)²·1e6) div (N·r·c) in DECIMAL(38,0) lanes,
    * present and absent cells both counted (the absent cell's
    * numerator is the same square — (o₀N − n_s·n₀) = −(o₁N − n_s·n₁)),
    * the all-docs column guarded (n₀ = 0 ⇒ absent cells contribute
    * zero, exactly the degenerate-margin convention). Integer cell
    * sums are order-free. Lane audit: (o·N)² < 10³⁸ holds to ~10⁹
    * docs — the independenceTest bound.
    *
    * Scale shape: the presence table is the staged posting base joined
    * to the doc→source map on doc_id (posting-base-sized shuffle, the
    * one corpus-scale stage); the grid is vocab×|sources| with both
    * margins broadcast; top-k via TakeOrdered. */
  def termChi2(docs: DataFrame, k: Int = 20, minDf: Long = 5L)
      : DataFrame = {
    val presence = graft.Caches.track(
      stagedDocTermTf(docs)
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
        .groupBy("term", "source").agg(count(lit(1)).as("o1")))
    val srcDocs = docs.groupBy("source").agg(count(lit(1)).as("ns"))
    val termDocs = presence.groupBy("term").agg(sum(col("o1")).as("n1"))
    val total = docs.agg(count(lit(1)).as("n"))
    termDocs.filter(col("n1") >= minDf)
      .crossJoin(broadcast(srcDocs))
      .join(presence, Seq("term", "source"), "left")
      .withColumn("o1", coalesce(col("o1"), lit(0L)))
      .crossJoin(broadcast(total))
      .select(col("term"), col("n1"),
        expr("""CAST(((CAST(o1 AS DECIMAL(38,0)) * n
                       - CAST(ns AS DECIMAL(38,0)) * n1)
                      * (CAST(o1 AS DECIMAL(38,0)) * n
                         - CAST(ns AS DECIMAL(38,0)) * n1)
                      * 1000000)
                     div (CAST(n AS DECIMAL(38,0)) * ns * n1) AS BIGINT)
                + CASE WHEN n > n1 THEN
                    CAST(((CAST(o1 AS DECIMAL(38,0)) * n
                           - CAST(ns AS DECIMAL(38,0)) * n1)
                          * (CAST(o1 AS DECIMAL(38,0)) * n
                             - CAST(ns AS DECIMAL(38,0)) * n1)
                          * 1000000)
                         div (CAST(n AS DECIMAL(38,0)) * ns * (n - n1))
                      AS BIGINT)
                  ELSE CAST(0 AS BIGINT) END""").as("cell"))
      .groupBy("term", "n1").agg(sum(col("cell")).as("chi2_ppm"))
      .select(col("term"), col("n1").as("df"), col("chi2_ppm"))
      .orderBy(col("chi2_ppm").desc, col("term"))
      .limit(k)
  }

  /** Interpolated Kneser-Ney smoothed bigram probabilities (Kneser &
    * Ney 1995; Chen & Goodman 1998's interpolated form) — the LM
    * smoothing every perplexity-filter pipeline (CCNet's KenLM stage)
    * actually ships, where the MLE surprisal lanes above assign unseen
    * mass zero: P_KN(w|u) = (c(uw)−D)/c(u) + λ(u)·P_cont(w), with
    * absolute discount D = 0.75, λ(u) = D·N1+(u·)/c(u) the mass freed
    * by discounting, and the continuation probability
    * P_cont(w) = N1+(·w)/B counting distinct left CONTEXTS (the
    * "Francisco" correction: frequent-but-predictable words get low
    * continuation mass).
    *
    * All-integer ppm lanes, no logs and no floats: D = 3/4 exactly, so
    * the discounted term is (1e6·(4c₂−3)) div (4c₁) in DECIMAL(38,0)
    * (positive whenever c₂ ≥ 1 — the max(·,0) clamp is vacuous on
    * observed bigrams); λ_ppm and pcont_ppm each get their own
    * DECIMAL-laned truncating division BEFORE the ppm-scaled product
    * (documented truncation order — the twin mirrors it operation for
    * operation). Scale shape: everything folds off the ONE staged
    * bigram-tf artifact — two vocab-sized marginal aggregates
    * (contexts by first word, continuation fan-in by second), a 1-row
    * distinct-bigram total broadcast, TakeOrdered top-k. The corpus
    * never re-tokenizes. */
  def knBigram(docs: DataFrame, minCount: Long = 5L,
               topK: Int = 50): DataFrame = {
    val vocab = graft.Caches.track(
      stagedBigramTf(docs).groupBy("b").agg(sum(col("tf")).as("c2")))
    val pre = vocab
      .groupBy(substring_index(col("b"), " ", 1).as("w1"))
      .agg(sum(col("c2")).as("c1"), count(lit(1)).as("n1u"))
    val suf = vocab
      .groupBy(substring_index(col("b"), " ", -1).as("w2"))
      .agg(count(lit(1)).as("n1w"))
    val tot = vocab.agg(count(lit(1)).as("bb"))
    vocab
      .join(pre, substring_index(col("b"), " ", 1) === col("w1"))
      .join(suf, substring_index(col("b"), " ", -1) === col("w2"))
      .crossJoin(broadcast(tot))
      .filter(col("c2") >= minCount)
      .select(col("b").as("bigram"), col("c2").as("cnt"),
        expr("""CAST((CAST(1000000 AS DECIMAL(38,0)) * (4 * c2 - 3))
                     div (CAST(4 AS DECIMAL(38,0)) * c1) AS BIGINT)
                + (CAST((CAST(750000 AS DECIMAL(38,0)) * n1u)
                        div c1 AS BIGINT)
                   * CAST((CAST(1000000 AS DECIMAL(38,0)) * n1w)
                          div bb AS BIGINT))
                  div 1000000""").as("p_kn_ppm"))
      .orderBy(col("p_kn_ppm").desc, col("bigram"))
      .limit(topK)
  }

  /** PMI phrase miner — the top-N adjacent word pairs that co-occur
    * far more than their parts predict: over the bigram event space,
    * PMI(x,y) = log2(c_xy·W / (c_x·c_y)) with W the total bigram
    * count, c_x the count of x as a bigram FIRST element and c_y of y
    * as SECOND (so P1 and P2 are proper marginals of P(x,y) and the
    * ratio is the exact likelihood lift). Where the surprisal LMs
    * score DOCS for fluency, this mines the CORPUS for collocations —
    * the phrase lexicon a tokenizer/stopword pipeline is built from
    * (Church & Hanks 1990).
    *
    * Integer discipline: the lift ratio is computed in DECIMAL(38,0)
    * (c_xy·W can overflow a 64-bit lane at corpus scale; the QUOTIENT
    * is ≤ W and cast back to BIGINT), pmi_bits = length(bin(ratio))-1
    * is exact floor(log2), min-count pruning happens BEFORE the
    * marginal joins. Scale shape: one corpus pass to the vocab-sized
    * bigram table (the only tracked cache); W is a 1-row broadcast;
    * both marginals are vocab-sized aggregates of the vocab itself;
    * final top-N via TakeOrdered (never a global sort). */
  def pmiPhrases(docs: DataFrame, minCount: Long = 5L,
                 topN: Int = 50): DataFrame = {
    // vocab folds off the SAME staged bigram-tf artifact the surprisal
    // LM reads (Σ tf over docs ≡ corpus instance count)
    val vocab = graft.Caches.track(
      stagedBigramTf(docs).groupBy("b").agg(sum(col("tf")).as("n")))
    val total = vocab.agg(sum(col("n")).as("w"))
    val pre = vocab.groupBy(substring_index(col("b"), " ", 1).as("w1"))
      .agg(sum(col("n")).as("c1"))
    val suf = vocab.groupBy(substring_index(col("b"), " ", -1).as("w2"))
      .agg(sum(col("n")).as("c2"))
    vocab.filter(col("n") >= minCount)
      .join(pre, substring_index(col("b"), " ", 1) === col("w1"))
      .join(suf, substring_index(col("b"), " ", -1) === col("w2"))
      .crossJoin(broadcast(total))
      .select(col("b").as("phrase"), col("n"),
        expr("""CAST((CAST(n AS DECIMAL(38,0)) * w)
                     div (CAST(c1 AS DECIMAL(38,0)) * c2) AS BIGINT)""")
          .as("ratio"))
      .filter(col("ratio") >= 1L)
      .select(col("phrase"), col("n"),
        (length(bin(col("ratio"))) - 1).cast("long").as("pmi_bits"))
      .orderBy(col("pmi_bits").desc, col("n").desc, col("phrase"))
      .limit(topN)
  }

  /** Vocabulary-coverage curve — the tokenizer-sizing question "how
    * many vocabulary entries cover X% of corpus tokens", answered
    * EXACTLY without ever sorting the vocabulary globally: terms are
    * grouped BY THEIR COUNT VALUE (distinct-count table ≪ vocab —
    * Zipf gives O(√tokens) distinct frequencies), the cumulative
    * token/type totals run count-descending through the shared
    * [[Prefix.inclusiveCumsum]] (block = bit-length of the count, a
    * monotone coarsening), and the boundary frequency group is split
    * by integer ceil-division — terms with equal count are
    * interchangeable for coverage, so the answer is deterministic
    * without naming which boundary terms are "in". One row per
    * requested percentage: the minimal vocab size, the tokens it
    * covers, and the total. */
  def vocabCoverage(docs: DataFrame,
                    pcts: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p > 0 && p <= 100))
    val byCount = termFreq(docs).groupBy("cnt")
      .agg(count(lit(1)).as("nb"))
      .select(col("cnt"), col("nb"), (col("cnt") * col("nb")).as("tok"))
    // count-DESCENDING cumulatives: order key = −cnt, block = −bitlen
    val cum = graft.Caches.track(Prefix.inclusiveCumsum(
      byCount, -length(bin(col("cnt"))).cast("long"), -col("cnt"),
      Seq("tok" -> col("tok"), "nb" -> col("nb"))))
    val total = broadcast(cum.agg(max(col("cum_tok")).as("__t")))
    val rows = pcts.map { p =>
      cum.crossJoin(broadcast(total))
        .withColumn("__need", expr(s"($p * __t + 99) div 100"))
        .filter(col("cum_tok") >= col("__need"))
        // first qualifying row in count-desc order = max cnt among
        // qualifiers (cum_tok is monotone along descending cnt)
        .sort(col("cnt").desc).limit(1)
        .select(lit(p).as("pct"),
          (col("cum_nb") - col("nb") +
            expr("(__need - (cum_tok - tok) + cnt - 1) div cnt"))
            .as("vocab_size"),
          (col("cum_tok") - col("tok") +
            expr("((__need - (cum_tok - tok) + cnt - 1) div cnt) * cnt"))
            .as("tokens_covered"),
          col("__t").as("total_tokens"))
    }
    rows.reduce(_.union(_))
  }

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken, "Winnowing:
    * Local Algorithms for Document Fingerprinting", SIGMOD 2003 — the
    * MOSS algorithm): hash every k-gram of the token stream, slide a
    * window of `winSize` consecutive k-gram hashes over each document,
    * and select the MINIMUM hash in every window (ties → the RIGHTMOST
    * occurrence, the paper's "robust winnowing" rule, so a repeated
    * hash is re-selected only when it must be). Selections of
    * overlapping windows dedupe, giving the paper's two guarantees:
    * expected density 2/(winSize+1), and at least one fingerprint in
    * every winSize-gram window — so any shared passage of length ≥
    * k + winSize - 1 tokens shares at least one fingerprint, which is
    * what makes the selection a LOCAL function of the text (an edit
    * perturbs only fingerprints within winSize+k tokens of it, unlike
    * position-keyed schemes where everything downstream shifts).
    *
    * The min-with-rightmost-tie-break rides in ONE ordered BIGINT:
    * v = gh·2³¹ + (2³¹−1−pos). min(v) picks the smallest hash and,
    * among equal hashes, the largest pos; gh < 2³² keeps the encoding
    * at Long.MaxValue exactly, overflow-free in any engine. Windows
    * shorter than winSize (document tail) select nothing — the paper
    * considers full windows only — enforced by count(*) over the same
    * frame.
    *
    * Scale shape: one explode ∝ corpus tokens, then ONE doc-keyed
    * window sort feeds all three window functions (k-gram assembly via
    * lead, frame min, frame count — same partitioning + ordering, so
    * Catalyst plans a single Exchange+Sort); the dedup of repeated
    * selections is a distinct that rides the SAME doc partitioning (no
    * extra shuffle); `shared` (fingerprint in ≥2 docs) is a
    * first-doc-occurrence marker + full-frame sum over ONE fp_hash
    * window — a groupBy+join would either recompute the whole corpus
    * pass on the build side or persist the fingerprint table
    * (corpus-proportional, the heavy_hitters memory lesson); the
    * window form is one density-sized shuffle, no persist, no
    * self-join. */
  /** Adjacent-duplicate token removal ("stutter trim") — the cheapest
    * intra-document repetition scrub: OCR/scraper artifacts and template
    * echoes commonly duplicate a word in place ("the the"), and LM
    * training corpora drop them before tokenization. One narrow
    * projection per doc — a single indexed filter lambda over the token
    * array, no shuffle at all until the caller aggregates; survives any
    * scale trivially. Emits the cleaned text plus before/after counts so
    * downstream token budgeting sees the delta. */
  def stutterTrim(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("__toks"))
      .select(col("doc_id"),
        size(col("__toks")).cast("long").as("n_tokens"),
        // Spark lambda index is 0-based and [] is 0-based apply; the
        // DuckDB twin's are both 1-based — same element either way
        expr("filter(__toks, (x, i) -> i = 0 OR x != __toks[i-1])")
          .as("__kept"))
      .select(col("doc_id"), col("n_tokens"),
        size(col("__kept")).cast("long").as("n_kept"),
        (col("n_tokens") - size(col("__kept"))).cast("long")
          .as("n_removed"),
        concat_ws(" ", col("__kept")).as("cleaned"))

  /** Trigram instances of a staged token array, with multiplicity —
    * [[bigramsOfStaged]] one order up. Docs under 3 tokens yield none. */
  private def trigramsOfStaged: Column =
    when(size(col("__toks")) < 3, array().cast("array<string>"))
      .otherwise(expr(
        """zip_with(
             zip_with(slice(__toks, 1, size(__toks) - 2),
                      slice(__toks, 2, size(__toks) - 2),
                      (x, y) -> concat(x, ' ', y)),
             slice(__toks, 3, size(__toks) - 2),
             (p, z) -> concat(p, ' ', z))"""))

  /** Trigram-LM conditional surprisal — [[bigramSurprisal]] with one
    * more word of context: each trigram (w1, w2, w3) costs
    * floor(log2(c12' div c3)) whole bits, where c3 is the corpus count
    * of the trigram and c12' the count of (w1, w2) as a trigram PREFIX.
    * Sharper word-salad detection at the cost of a sparser table — the
    * standard LM bias/variance ladder, and the last rung worth an exact
    * integer oracle (4-grams are nearly all singletons at fixture
    * scale). Scale shape identical to [[bigramSurprisal]]: two corpus
    * passes, vocab-sized join frames, no global sort. */
  def trigramSurprisal(docs: DataFrame): DataFrame = {
    def tg(d: DataFrame): DataFrame =
      d.select(col("doc_id"), tokens(col("text")).as("__toks"))
        .select(col("doc_id"), explode(trigramsOfStaged).as("t"))
    // same artifact shape as bigramSurprisal: the per-(doc, trigram)
    // tf table is staged once per corpus; the vocabulary folds off it
    val tf =
      if (docs.isStreaming)
        tg(docs).groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
      else graft.Stage.parquet(docs.sparkSession,
        graft.Stage.key(docs, "trigram_tf")) {
        tg(docs).groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
      }
    val vocab = tf.groupBy("t").agg(sum(col("tf")).as("c3"))
    val pre = vocab
      .groupBy(substring_index(col("t"), " ", 2).as("w12"))
      .agg(sum(col("c3")).as("c12"))
    val bits = vocab
      .join(pre, substring_index(col("t"), " ", 2) === col("w12"))
      .select(col("t"),
        (length(bin(expr("c12 div c3"))) - 1).cast("long").as("bi"))
    tf.join(bits, "t")
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_trigrams"),
        sum(col("tf") * col("bi")).as("sum_bits"))
      .select(col("doc_id"), col("n_trigrams"),
        expr("(sum_bits * 1000) div n_trigrams").as("surprisal_milli"))
      .orderBy("doc_id")
  }

  /** Zipf rank-frequency fit over the top-K terms: least-squares slope
    * of floor(log2 cnt) against floor(log2 rank) — the corpus-health
    * check that a crawl slice actually looks like natural language
    * (healthy text sits near slope −1; templated/generated text goes
    * flat or cliff-shaped). All-integer until the final division:
    * whole-bit logs via length(bin(x))−1, the closed-form numerator
    * n·Σxy − Σx·Σy and denominator n·Σxx − Σx² are exact BIGINT sums
    * over ≤ K rows, and the only floating step is one IEEE divide +
    * floor — bit-identical in any engine. (Integer `div` would agree
    * too — both engines truncate BIGINT division toward zero — but
    * truncation rounds a negative slope UP; flooring the IEEE quotient
    * keeps the conventional floor(a/b) definition for the negative
    * lane.) Scale: termFreq's single corpus pass, TakeOrdered for
    * the top-K (never a global sort), then a 1-row aggregate over K. */
  def zipfFit(docs: DataFrame, topK: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val top = termFreq(docs)
      .orderBy(col("cnt").desc, col("term")).limit(topK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cnt").desc, col("term"))))
      .select((length(bin(col("rank"))) - 1).cast("long").as("x"),
        (length(bin(col("cnt"))) - 1).cast("long").as("y"))
    top.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("n").cast("long").as("n_terms"),
        (col("n") * col("sxy") - col("sx") * col("sy")).cast("long")
          .as("num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).cast("long")
          .as("den"))
      .select(col("n_terms"), col("num"), col("den"),
        floor(col("num") * lit(1000000.0) / col("den")).cast("long")
          .as("slope_ppm"))
  }

  def winnowFingerprints(docs: DataFrame, k: Int = 3,
                         winSize: Int = 4): DataFrame = {
    require(k >= 1 && winSize >= 1, s"k=$k winSize=$winSize")
    // Staged (r19 optimization): the fingerprint index is the stored
    // MOSS artifact — the gated fingerprint dump and the pair join
    // both read it back (posexplode + two windows per call before).
    def plan = winnowFingerprintsLive(docs, k, winSize)
    if (docs.isStreaming) plan
    else graft.Stage.parquet(docs.sparkSession,
      graft.Stage.key(docs, "winnow_fp", k, winSize))(plan)
  }

  private[graft] def winnowFingerprintsLive(docs: DataFrame, k: Int,
                                     winSize: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wd = Window.partitionBy("doc_id").orderBy("pos")
    val tok = docs.select(col("doc_id"),
      posexplode(tokens(col("text"))).as(Seq("pos", "w")))
    // k-gram at gram-position pos: words pos..pos+k-1, null past the end
    val gramCols = (0 until k).map(i =>
      if (i == 0) col("w") else lead(col("w"), i).over(wd))
    val gram = gramCols.reduce((a, b) => concat(a, lit(" "), b))
    val grams = tok
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        PortableHash.hash32(concat(lit("wf:"), gram)).as("gh"))
      .filter(col("gh").isNotNull) // tail positions with < k words
    val wf = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.currentRow, winSize - 1)
    val sel = grams
      .withColumn("v",
        col("gh") * lit(2147483648L) + (lit(2147483647L) - col("pos")))
      .withColumn("minv", min(col("v")).over(wf))
      .withColumn("cnt", count(lit(1)).over(wf))
      .filter(col("cnt") === winSize)
      .select(col("doc_id"),
        expr("minv div 2147483648").as("fp_hash"),
        expr("2147483647 - (minv % 2147483648)").as("fp_pos"))
      .distinct()
    val wh = Window.partitionBy("fp_hash").orderBy("doc_id", "fp_pos")
    sel
      .withColumn("__first", when(
        lag(col("doc_id"), 1).over(wh).isNull ||
          lag(col("doc_id"), 1).over(wh) =!= col("doc_id"), 1L)
        .otherwise(0L))
      .withColumn("__nd",
        sum(col("__first")).over(Window.partitionBy("fp_hash")))
      .select(col("doc_id"), col("fp_pos"), col("fp_hash"),
        (col("__nd") >= 2).as("shared"))
  }

  /** Winnowing-based near-dup candidate pairs — the MOSS-style
    * complement to the minhash band join: winnow fingerprints are
    * POSITIONAL (a guaranteed hit for any shared window of ≥ winSize
    * k-grams), so a long verbatim passage produces shared fingerprints
    * even when whole-document Jaccard is tiny — the same blind spot
    * containmentSim covers, caught at the fingerprint layer. Same
    * scale discipline as every candidate generator here: hot
    * fingerprints (shared by > maxDf docs — boilerplate) are dropped
    * BEFORE the self-join, so pair fan-out is df-bounded, and pairs
    * must share ≥ minShared surviving fingerprints to surface. */
  def winnowPairs(docs: DataFrame, k: Int = 3, winSize: Int = 4,
                  maxDf: Int = 64, minShared: Long = 2L): DataFrame = {
    val fps = winnowFingerprints(docs, k, winSize)
      .select(col("doc_id"), col("fp_hash")).distinct()
    val cold = fps.groupBy("fp_hash").agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf).select("fp_hash")
    val kept = graft.Caches.track(fps.join(cold, Seq("fp_hash"), "leftsemi"))
    kept.as("a")
      .join(kept.as("b"), col("a.fp_hash") === col("b.fp_hash")
        && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .orderBy("doc_a", "doc_b")
  }
}
