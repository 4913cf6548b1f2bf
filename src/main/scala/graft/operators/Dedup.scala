package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Near-duplicate detection for a training-data pipeline (SURVEY §2.4):
  * word-shingle MinHash + banded LSH, SimHash with byte-band candidate
  * generation, and exact n-gram Jaccard verification.
  *
  * The 100 TB shape: all-pairs comparison is never materialized — LSH
  * bands (minhash) or signature bytes (simhash) generate candidates via
  * an equi-join on the band key (a hash-partitioned shuffle, linear in
  * data size), and only candidates get exact verification. All hashing is
  * md5-based (PortableHash) so DuckDB reproduces every value.
  */
object Dedup {

  /** Distinct word n-gram shingles of a document; single-token docs fall
    * back to one whole-text shingle. Computed by the native codegen'd
    * `word_shingles` expression — one tight JVM loop per row instead of
    * tokens × width interpreted-lambda tree walks (WordShinglesSpec
    * proves it indistinguishable from the composed-builtins recipe the
    * DuckDB twin mirrors). */
  def shingles(text: Column, n: Int = 3): Column =
    org.apache.spark.sql.graft.WordShinglesExpr(text, n)

  /** MinHash signature: numHashes independent md5 lanes, each the min
    * over the shingle set. Pure per-row array math — no shuffle. */
  def minhashSig(sh: Column, numHashes: Int = 16): Column =
    transform(sequence(lit(0), lit(numHashes - 1)), s =>
      array_min(transform(sh,
        x => PortableHash.hash32(concat(s.cast("string"), lit(":"), x)))))

  /** Shingle sets materialized as a COLUMN (a projection barrier so
    * the 16-seed × 4-band minhash lambdas downstream read an
    * already-computed array instead of re-deriving the shingle set per
    * lane — interpreted higher-order lambdas re-evaluate their
    * argument subtree per element). */
  def withShingles(docs: DataFrame, n: Int = 3): DataFrame =
    docs.withColumn("__sh", shingles(col("text"), n))

  /** (doc_id, __sig) signature table — the shared input of the band
    * table and the lane-agreement estimator. The 16 md5 lanes are the
    * dominant cost of the whole minhash family, so every composition
    * point takes THIS frame rather than re-deriving signatures from
    * text — and since r12 the frame is a [[graft.Stage]] artifact,
    * computed once per (corpus, numHashes) across ALL minhash queries
    * (a production pipeline stores its signature index; every dedup
    * query should be measured against the read-back). The per-query
    * Caches.track wrappers at the call sites stay: they pin the
    * read-back in memory for the multi-consumer band joins. Streaming
    * inputs bypass staging and sign per micro-batch. */
  def signatures(docs: DataFrame, numHashes: Int = 16): DataFrame = {
    def plan = withShingles(docs)
      .withColumn("__sig", minhashSig(col("__sh"), numHashes))
      .select(col("doc_id"), col("__sig"))
    if (docs.isStreaming) plan
    else graft.Stage.parquet(docs.sparkSession,
      graft.Stage.key(docs, "minhash_sigs", numHashes))(plan)
  }

  /** (doc_id, __sig, band_id, band_key) — the band-key recipe in ONE
    * place: batch pair generation drops `__sig` before its join so the
    * shuffle stays lean; the streaming bucket operator
    * ([[graft.streaming.StreamingNearDup]]) carries it into state for
    * in-bucket lane agreement. */
  private[graft] def bandedSigs(sigs: DataFrame, numHashes: Int,
                                bands: Int): DataFrame = {
    val rows = numHashes / bands
    sigs.select(col("doc_id"), col("__sig"),
        explode(transform(sequence(lit(0), lit(bands - 1)), b => struct(
          b.cast("int").as("band_id"),
          concat_ws("_", transform(slice(col("__sig"), b * rows + 1, lit(rows)),
            v => v.cast("string"))).as("band_key")))).as("band"))
      .select(col("doc_id"), col("__sig"),
        col("band.band_id"), col("band.band_key"))
  }

  private def bandsFromSigs(sigs: DataFrame, numHashes: Int,
                            bands: Int): DataFrame =
    bandedSigs(sigs, numHashes, bands)
      .select(col("doc_id"), col("band_id"), col("band_key"))

  /** Banded LSH keys: split the signature into `bands` bands of `rows`
    * values; docs agreeing on ANY band become candidates. One output row
    * per (doc, band). Each stage (tokens → shingles → signature) is a
    * materialized column — evaluated once per row. */
  def minhashBands(docs: DataFrame, numHashes: Int = 16, bands: Int = 4)
      : DataFrame =
    bandsFromSigs(signatures(docs, numHashes), numHashes, bands)

  /** THE band-join pair generator — the one LSH candidate path every
    * minhash consumer composes (minhashPairs, minhashJaccardEst, the
    * keep-list/cluster family): band keys derived per join side from
    * the SAME signature frame (persist it — band derivation off the
    * cache is a cheap projection; the md5 lanes behind it are not),
    * equi-joined on (band_id, band_key). Hash-partitioned, never
    * all-pairs. */
  def pairsFromSigs(sigs: DataFrame, numHashes: Int = 16,
                    bands: Int = 4): DataFrame = {
    val b0 = bandsFromSigs(sigs, numHashes, bands)
    b0.as("a").join(b0.as("b"),
        col("a.band_id") === col("b.band_id")
          && col("a.band_key") === col("b.band_key")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Staged doc→rep mapping for the EXACT-DUP COLLAPSE (VERDICT r15
    * #2): every doc labeled with the minimum doc_id of its
    * identical-TEXT group and the group size. Identical text ⇒
    * identical minhash signature AND identical simhash, so collapsing
    * to reps BEFORE either band join removes the k²/2 all-band pair
    * blowup a cluster of k exact dups otherwise guarantees (the
    * allPairsJaccard lesson — measured there at 134 s → 11.6 s, and
    * quadratic at ANY scale on a dup-heavy corpus). TEXT identity
    * (not per-method signature identity) so minhash and simhash share
    * ONE rep space — what keeps [[dedupMethodAgreement]]'s pair sets
    * comparable. One window shuffle on the text hash; staged because
    * every pair-path consumer reads it. */
  private[graft] def textRepMap(docs: DataFrame): DataFrame = {
    def plan = {
      val w = Window.partitionBy(md5(col("text")))
      docs.select(col("doc_id"),
        min(col("doc_id")).over(w).as("rep"),
        count(lit(1)).over(w).as("m"))
    }
    if (docs.isStreaming) plan
    else graft.Stage.parquet(docs.sparkSession,
      graft.Stage.key(docs, "text_reps"))(plan)
  }

  /** The (rep doc_id, multiplicity) table — one row per distinct text. */
  private[graft] def textReps(docs: DataFrame): DataFrame =
    textRepMap(docs).filter(col("doc_id") === col("rep"))
      .select(col("doc_id"), col("m"))

  /** rep→member star edges (k−1 per exact-dup group). Together with
    * the rep PAIRS these reconstruct full doc-level connectivity: a
    * member's bands equal its rep's, so docs x and y share a band iff
    * their reps do — components over (rep pairs ∪ stars) equal
    * components over the uncollapsed band join, at k−1 instead of
    * k²/2 edges per group. */
  private[graft] def repStarEdges(docs: DataFrame): DataFrame =
    textRepMap(docs).filter(col("doc_id") =!= col("rep"))
      .select(col("rep").as("doc_a"), col("doc_id").as("doc_b"))

  /** The persisted rep-only signature frame (doc_id, __sig, m): the
    * staged full signature artifact filtered to exact-dup reps. */
  private def repSigs(docs: DataFrame, numHashes: Int = 16): DataFrame =
    graft.Caches.track(
      signatures(docs, numHashes).join(textReps(docs), "doc_id"))

  /** Band-join candidate pairs over a rep-sig frame, multiplicities
    * carried through the join: (doc_a, doc_b, ma, mb), doc_a < doc_b,
    * distinct. The band rows carry one extra long per row; no joins
    * back against the corpus. */
  private def pairsFromRepSigs(sigs: DataFrame, numHashes: Int = 16,
                               bands: Int = 4): DataFrame = {
    val rows = numHashes / bands
    val b0 = sigs.select(col("doc_id"), col("m"),
        explode(transform(sequence(lit(0), lit(bands - 1)), b => struct(
          b.cast("int").as("band_id"),
          concat_ws("_", transform(slice(col("__sig"), b * rows + 1, lit(rows)),
            v => v.cast("string"))).as("band_key")))).as("band"))
      .select(col("doc_id"), col("m"),
        col("band.band_id"), col("band.band_key"))
    b0.as("a").join(b0.as("b"),
        col("a.band_id") === col("b.band_id")
          && col("a.band_key") === col("b.band_key")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.m").as("ma"), col("b.m").as("mb"))
      .distinct()
  }

  /** Candidate pairs from raw docs, EXACT-DUP COLLAPSED: strictly-near
    * rep pairs (doc_a, doc_b, n_doc_pairs = ma·mb). Identical-text
    * pairs are the exact-dedup family's report ([[textExactDedup]]);
    * this op returns the strictly-similar structure, each rep pair
    * stamped with the doc-pair count it stands for.
    *
    * Staged (r19 optimization): the band self-join + distinct is the
    * dominant cost of every consumer past the signature index, and a
    * production dedup pipeline materializes its candidate list next
    * to the signature index it came from — so the pair table is a
    * [[graft.Stage]] artifact like [[signatures]], computed once per
    * corpus across the whole minhash family (pairs, method agreement,
    * mirror audit, the component builds, edit-distance confirm). */
  def minhashPairs(docs: DataFrame): DataFrame = {
    def plan = pairsFromRepSigs(repSigs(docs))
      .select(col("doc_a"), col("doc_b"),
        (col("ma") * col("mb")).as("n_doc_pairs"))
    if (docs.isStreaming) plan
    else graft.Stage.parquet(docs.sparkSession,
      graft.Stage.key(docs, "minhash_pairs", 16, 4))(plan)
  }

  /** Doc-level candidate EDGE set: rep pairs + exact-dup star edges —
    * connectivity-identical to the uncollapsed band join (see
    * [[repStarEdges]]), so the clustering family keeps its doc-level
    * contract while the pair join runs collapsed. */
  def candidateEdges(docs: DataFrame): DataFrame =
    minhashPairs(docs).select("doc_a", "doc_b")
      .unionByName(repStarEdges(docs))

  /** Edit-distance confirmation of the LSH candidate pairs — the
    * character-level second opinion after set-based (Jaccard) tiers:
    * token-set similarity is blind to word ORDER, so a reshuffled
    * near-dup and a truly-close pair estimate alike; Levenshtein on a
    * bounded prefix separates them. Cost discipline at 100 TB:
    * Levenshtein is O(len²) per pair, so it NEVER runs corpus-wide —
    * only on the band-join candidate list, and only on `prefixLen`
    * characters (O(prefixLen²) constant per pair, and the join ships
    * prefixes, not documents). Both engines' levenshtein is the plain
    * unit-cost insert/delete/substitute distance. */
  def editDistConfirm(docs: DataFrame, prefixLen: Int = 80,
                      maxDist: Int = 40): DataFrame = {
    val prefixes = docs.select(col("doc_id"),
      substring(col("text"), 1, prefixLen).as("p"))
    minhashPairs(docs)
      .join(prefixes.select(col("doc_id").as("doc_a"), col("p").as("pa")),
        Seq("doc_a"))
      .join(prefixes.select(col("doc_id").as("doc_b"), col("p").as("pb")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("pa"), col("pb")).cast("long").as("edit_dist"))
      .withColumn("confirmed", col("edit_dist") <= maxDist)
      .orderBy("doc_a", "doc_b")
  }

  /** Prefix-duplicate clusters: documents whose first `k` tokens agree
    * exactly — the cheap boilerplate/mirror detector that catches
    * template pages and scrape echoes long before any shingle
    * machinery runs (one md5 per doc, one groupBy). Emits one row per
    * member of a non-trivial cluster with the keep-lowest canonical,
    * the same keep-list contract as the LSH path.
    *
    * Scale shape: map-only key derivation (native tokenizer, slice,
    * md5), one key groupBy whose output is CLUSTER-sized, and a join
    * back that touches only clustered keys. The prefix key is text,
    * not a 64-bit hash, so collisions are exact-prefix by
    * construction. */
  def prefixDup(docs: DataFrame, k: Int = 16): DataFrame = {
    val keyed = docs.select(col("doc_id"),
      md5(array_join(slice(TextAnalysis.tokens(col("text")), 1, k), " "))
        .as("pk"))
    val groups = keyed.groupBy("pk")
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("canonical_id"))
      .filter(col("n_docs") > 1)
    keyed.join(groups, Seq("pk"))
      .select(col("doc_id"), col("canonical_id"), col("n_docs"))
      .orderBy("doc_id")
  }

  /** MinHash Jaccard ESTIMATE for the LSH candidate pairs: the fraction
    * of agreeing signature lanes is the classic unbiased estimator of
    * true Jaccard (each lane's min-hash agrees with probability J).
    * This is the cheap middle tier between candidate generation
    * (minhashPairs) and exact verification (ngramJaccard): per pair it
    * costs ONE 16-element array comparison — no shingle explode, no
    * df-cap machinery — so at 100 TB the exact pass runs only on pairs
    * the estimate keeps. The signature table is computed once,
    * persisted, and feeds the shared [[pairsFromSigs]] band join and
    * both estimator sides — a caller composing pairs + estimate pays
    * the md5 lanes exactly once. */
  def minhashJaccardEst(docs: DataFrame, numHashes: Int = 16,
                        bands: Int = 4): DataFrame = {
    val sigs = repSigs(docs, numHashes)
    jaccardEstForPairs(sigs,
      pairsFromRepSigs(sigs, numHashes, bands).select("doc_a", "doc_b"),
      numHashes)
      .select("doc_a", "doc_b", "matches", "est_milli")
  }

  /** Tiered near-dup verification — the PRODUCTION composition of the
    * three minhash tiers: banded LSH candidates ([[pairsFromSigs]]) →
    * cheap lane-agreement estimate gate ([[jaccardEstForPairs]],
    * est_milli ≥ estMilli) → EXACT shingle Jaccard computed ONLY for
    * the survivors. This is the end-to-end dedup judgement call a
    * curation pipeline actually makes; the single-tier operators exist
    * so each stage is independently oracle-checked.
    *
    * 100 TB shape: the exact tier — the expensive one — touches only
    * the estimate-gated pair list. Survivors join back to the docs
    * table per side and shingle sets are re-derived for just those
    * rows (a deliberate second text scan instead of a corpus-sized
    * shingle-array cache — the heavyHitters lesson; the join against
    * the small survivor frame is broadcast-able and AQE takes it),
    * while the dominant md5 signature table is computed once,
    * persisted, and feeds both earlier tiers. All thresholds are
    * integer milli so both engines' math is identical; the union size
    * is floored at 1 so an empty∩empty pair divides safely — and
    * identically — in both engines. */
  def tieredNearDup(docs: DataFrame, estMilli: Long = 500L,
                    dupMilli: Long = 800L, numHashes: Int = 16,
                    bands: Int = 4): DataFrame = {
    val sigs = repSigs(docs, numHashes)
    val cand = pairsFromRepSigs(sigs, numHashes, bands)
      .select(col("doc_a"), col("doc_b"),
        (col("ma") * col("mb")).as("n_doc_pairs"))
    val survivors = jaccardEstForPairs(sigs, cand, numHashes)
      .filter(col("est_milli") >= estMilli)
      .select(col("doc_a"), col("doc_b"), col("est_milli"),
        col("n_doc_pairs"))
    val sh = docs.select(col("doc_id"), shingles(col("text")).as("__sh"))
    val sa = sh.select(col("doc_id").as("doc_a"), col("__sh").as("__sha"))
    val sb = sh.select(col("doc_id").as("doc_b"), col("__sh").as("__shb"))
    survivors.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("__inter",
        size(array_intersect(col("__sha"), col("__shb"))).cast("long"))
      .withColumn("__union",
        greatest(size(col("__sha")).cast("long")
          + size(col("__shb")).cast("long") - col("__inter"), lit(1L)))
      .select(col("doc_a"), col("doc_b"), col("est_milli"),
        expr("(1000 * __inter) div __union").as("jac_milli"),
        col("n_doc_pairs"))
      .withColumn("is_dup", col("jac_milli") >= dupMilli)
  }

  /** Incremental dedup — the CONTINUOUS-INGESTION judgement call: a
    * newly-arrived batch is deduplicated against an already-curated
    * corpus AND against itself, and each batch doc comes back with its
    * duplicate count and a keep verdict. Greedy drop-higher semantics
    * within the batch (the [[dedupKeepList]] contract); the corpus is
    * always canonical, so any corpus partner disqualifies a batch doc.
    * Requires disjoint doc_id spaces between the two inputs.
    *
    * 100 TB shape: the band join is ASYMMETRIC by construction — the
    * probe side is batch bands only, so candidate generation is
    * new×old plus new×lower-new, NEVER old×old. A hot bucket with B
    * corpus members costs B·(batch members in it), not B², which is
    * what makes re-deduping a daily batch against a year of corpus
    * affordable: cost scales with the batch, while the corpus
    * contributes EXACTLY one linear signature scan (precomputed and
    * stored in production — [[signatures]] is public exactly so the
    * corpus side can be read from a sig table instead of re-hashed).
    * Both sides carry their signature INTO the band join (the
    * [[graft.streaming.StreamingNearDup]] in-bucket recipe), so lane
    * agreement is a projection on the join output — no estimator
    * joins, no second corpus pass. Only the batch-side signature
    * table (small) is persisted. */
  def incrementalDedup(corpus: DataFrame, batch: DataFrame,
                       estMilli: Long = 500L, numHashes: Int = 16,
                       bands: Int = 4): DataFrame = {
    val sigsNew = graft.Caches.track(signatures(batch, numHashes))
    val bNew = bandedSigs(sigsNew, numHashes, bands)
    val bAll = bandedSigs(signatures(corpus, numHashes), numHashes, bands)
      .withColumn("__new", lit(false))
      .unionByName(bNew.withColumn("__new", lit(true)))
    val dups = bNew.as("a").join(bAll.as("b"),
        col("a.band_id") === col("b.band_id")
          && col("a.band_key") === col("b.band_key")
          && (!col("b.__new") || col("b.doc_id") < col("a.doc_id")))
      .withColumn("matches",
        size(filter(zip_with(col("a.__sig"), col("b.__sig"),
          (x, y) => x === y), m => m)).cast("long"))
      .filter(expr(s"(1000 * matches) div $numHashes") >= estMilli)
      .select(col("a.doc_id").as("doc_new"),
        col("b.doc_id").as("doc_prior"))
      .distinct()
      .groupBy("doc_new").agg(count(lit(1)).as("n_dup"))
    batch.select(col("doc_id"))
      .join(dups.withColumnRenamed("doc_new", "doc_id"), Seq("doc_id"),
        "left")
      .select(col("doc_id"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"))
      .withColumn("kept", col("n_dup") === 0L)
  }

  /** Lane-agreement estimate for an existing candidate-pair frame
    * against the signature table both its sides came from. */
  def jaccardEstForPairs(sigs: DataFrame, pairs: DataFrame,
                         numHashes: Int = 16): DataFrame = {
    val sa = sigs.select(col("doc_id").as("doc_a"), col("__sig").as("__sa"))
    val sb = sigs.select(col("doc_id").as("doc_b"), col("__sig").as("__sb"))
    // pairs.* pass through (a collapsed caller keeps its multiplicity
    // column riding the estimate join); explicit column order because
    // USING-joins would otherwise rotate the key columns to the front
    val rest = pairs.columns.toSeq.filterNot(Set("doc_a", "doc_b")).map(col)
    pairs.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("matches",
        size(filter(zip_with(col("__sa"), col("__sb"), (x, y) => x === y),
          m => m)).cast("long"))
      .withColumn("est_milli", expr(s"(1000 * matches) div $numHashes"))
      .select(Seq(col("doc_a"), col("doc_b")) ++ rest ++
        Seq(col("matches"), col("est_milli")): _*)
  }

  /** Exact n-gram Jaccard for pairs sharing at least one shingle:
    * explode the distinct shingle sets, self-join on the shingle (only
    * co-occurring pairs materialize), count intersections, then join the
    * per-doc set sizes (broadcast — it's one small row per doc) for
    * |A∪B| = |A|+|B|-|A∩B|. Integer milli-Jaccard for engine parity.
    *
    * Two guards make this survive corpus scale:
    * - DF-CAP: a shingle shared by D docs emits D²/2 join rows, so one
    *   Zipf-head phrase is a quadratic blowup. Shingles with document
    *   frequency > maxDf are dropped BEFORE the self-join (one window
    *   count over the shingle key); Jaccard is then computed over the
    *   capped shingle universe — set sizes count the same filtered
    *   universe, so the metric stays internally consistent. Near-dup
    *   pairs keep their (many, low-df) shared shingles.
    * - REUSE: the per-doc shingle-array projection (the expensive
    *   tokenize→shingle pass) is computed ONCE and persisted at doc
    *   granularity — the smallest possible cache — then exploded
    *   cheaply for each of its four consumers (df counts, join left,
    *   join right, set sizes). The df-filter itself is a BROADCAST
    *   anti-join against the hot-shingle list, which is tiny by
    *   construction (only Zipf-head shingles exceed the cap), so no
    *   extra shuffle of the exploded set. */
  /** The shared df-capped exact-intersection path: candidate pairs =
    * docs sharing ≥1 RARE shingle (document frequency ≤ maxDf — the cap
    * is what makes the shingle self-join survive a Zipf corpus: a
    * boilerplate shingle shared by B docs would contribute B² join
    * rows), with exact |A∩B| and per-doc set sizes measured over the
    * SAME capped shingle space. [[ngramJaccard]] (symmetric) and
    * [[containmentSim]] (asymmetric) both compose this — one candidate
    * generator, two similarity laws (the pairsFromSigs lesson). */
  /** The (doc_a, doc_b, inter, na, nb) rare-shingle intersection table
    * — the shared base of `ngram_jaccard` and `containment_sim`, which
    * differ only in their post-filter. STAGED once per (corpus, maxDf)
    * since r12: this is the candidate-pair table a production exact-
    * similarity pass stores, and re-running the explode + self-join
    * per consumer was the family's whole cost. Streaming inputs
    * bypass staging. */
  private[operators] def cappedIntersections(docs: DataFrame, maxDf: Int)
      : DataFrame =
    if (docs.isStreaming) buildCappedIntersections(docs, maxDf)
    else graft.Stage.parquet(docs.sparkSession,
      graft.Stage.key(docs, "capped_intersections", maxDf)) {
      buildCappedIntersections(docs, maxDf)
    }

  private def buildCappedIntersections(docs: DataFrame, maxDf: Int)
      : DataFrame = {
    val staged = graft.Caches.track(withShingles(docs)
      .select(col("doc_id"), col("__sh")))
    val ex0 = staged.select(col("doc_id"), explode(col("__sh")).as("sh"))
    val hot = ex0.groupBy("sh").agg(count(lit(1)).as("__df"))
      .filter(col("__df") > maxDf).select("sh")
    // the capped exploded table feeds THREE consumers (both self-join
    // sides + the set sizes) — persist it too, or each re-runs the
    // explode + broadcast anti-join from the shingle cache
    val ex = graft.Caches.track(
      ex0.join(broadcast(hot), Seq("sh"), "left_anti"))
    val sizes = ex.groupBy("doc_id").agg(count(lit(1)).as("nsh"))
    ex.as("a").join(ex.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
      .join(broadcast(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("nsh", "na")), "doc_a")
      .join(broadcast(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("nsh", "nb")), "doc_b")
  }

  def ngramJaccard(docs: DataFrame, minMilli: Int = 50, maxDf: Int = 5)
      : DataFrame =
    cappedIntersections(docs, maxDf)
      .withColumn("jac_milli",
        expr("(1000 * inter) div (na + nb - inter)"))
      .filter(col("jac_milli") >= minMilli)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("na"),
        col("nb"), col("jac_milli"))

  /** Asymmetric containment similarity C(A,B) = |A∩B|/|A| — the
    * quote/subset detector Jaccard structurally misses: a short doc
    * fully quoted inside a 100× larger one has J ≈ |A|/|B| ≈ 0.01 but
    * C(A→B) = 1.0. Jaccard-banded LSH candidates would miss exactly
    * those pairs, so candidates come from the shared-RARE-shingle join
    * ([[cappedIntersections]]) instead — a quoted passage of ≥ n words
    * contributes its own rare shingles, surfacing the pair regardless
    * of the size ratio. `inner_doc` names the CONTAINED side (the one
    * to drop under a subset-dedup policy), tie → lower doc_id.
    * Containments are exact integer milli over the capped shingle
    * space; keep pairs where the larger direction ≥ minMilli. */
  def containmentSim(docs: DataFrame, minMilli: Int = 500,
                     maxDf: Int = 5): DataFrame =
    cappedIntersections(docs, maxDf)
      .withColumn("cont_a_milli", expr("(1000 * inter) div na"))
      .withColumn("cont_b_milli", expr("(1000 * inter) div nb"))
      .filter(greatest(col("cont_a_milli"), col("cont_b_milli"))
        >= minMilli)
      .withColumn("inner_doc",
        when(col("cont_a_milli") >= col("cont_b_milli"), col("doc_a"))
          .otherwise(col("doc_b")))
      .select(col("doc_a"), col("doc_b"), col("inter"), col("na"),
        col("nb"), col("cont_a_milli"), col("cont_b_milli"),
        col("inner_doc"))

  /** Span-level duplication stats — the "Deduplicating Training Data
    * Makes Language Models Better" (Lee et al., 2022) signal at shingle
    * granularity: for each doc, how much of it is text that ALSO occurs
    * verbatim in some other doc. Doc-level dedup (minhash/simhash/exact)
    * misses boilerplate spans pasted across otherwise-distinct pages;
    * this operator measures exactly that, per doc, so a curation
    * pipeline can drop or trim high-`dup_milli` docs.
    *
    * Recipe: every distinct word shingle of every doc is hashed to a
    * 64-bit key — TWO independent 32-bit md5 lanes, grouped/joined
    * together (one explode, linear in corpus tokens — the same cost
    * class as ngramJaccard's candidate pass, but with NO self-join: the
    * quadratic pair table never exists here). A shingle is "duplicated"
    * when ≥2 docs contain it; the duplicated-key list is filtered
    * BEFORE joining back (in real corpora most shingles are unique, so
    * the join's build side is the small minority). All shuffles carry
    * (long, long, long) triples — the span text itself never shuffles.
    *
    * The dual lane is the scale guarantee: a single 32-bit key aliases
    * distinct spans at ~N²/2³³ expected false dup marks (≥1 false mark
    * once the corpus passes ~10⁵ distinct spans); the combined 64-bit
    * key pushes that to N²/2⁶⁵ — under one expected false mark up to
    * ~6×10⁹ distinct spans, and vanishing at fixture scale (DedupSpec
    * pins the bound). Same plan shape, double the key bytes.
    * Output is NULL-free: docs with no duplicated span get n_dup = 0. */
  def dupSpans(docs: DataFrame): DataFrame = {
    val ex = graft.Caches.track(withShingles(docs)
      .select(col("doc_id"), explode(col("__sh")).as("s"))
      .select(col("doc_id"), PortableHash.hash32(col("s")).as("h1"),
        PortableHash.hash32b(col("s")).as("h2")))
    // shingles are distinct per doc, so count(*) per key == doc freq
    val dup = ex.groupBy("h1", "h2").agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= 2).select("h1", "h2")
    val perDoc = ex.groupBy("doc_id").agg(count(lit(1)).as("n_spans"))
    val dupPerDoc = ex.join(dup, Seq("h1", "h2"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_dup0"))
    perDoc.join(dupPerDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_spans"),
        coalesce(col("n_dup0"), lit(0L)).as("n_dup"),
        expr("(1000 * coalesce(n_dup0, 0L)) div n_spans").as("dup_milli"))
  }

  /** Per-doc shingle NOVELTY in corpus order — the marginal-content
    * question [[dupSpans]]'s symmetric duplication score cannot answer:
    * of this doc's distinct shingles, what fraction appears here FIRST
    * (no lower doc_id contains it)? A curation pipeline reads this as
    * "how much new text does each successive source/batch contribute" —
    * the diminishing-returns curve of continued crawling (doc_id is
    * ingestion order in the fixture; any monotone ingestion key works).
    *
    * Shape: the [[dupSpans]] plan with min(doc_id) in place of the df
    * count — one explode to (doc_id, 64-bit dual-md5 key), one
    * map-side-combinable groupBy picking each shingle's first doc, one
    * hash join back, one doc-keyed aggregate. No self-join; shuffles
    * carry (long, long, long); aliasing bound as [[dupSpans]]. The
    * lowest doc is 100% novel by construction. */
  def shingleNovelty(docs: DataFrame): DataFrame = {
    val ex = graft.Caches.track(withShingles(docs)
      .select(col("doc_id"), explode(col("__sh")).as("s"))
      .select(col("doc_id"), PortableHash.hash32(col("s")).as("h1"),
        PortableHash.hash32b(col("s")).as("h2")))
    val first = ex.groupBy("h1", "h2")
      .agg(min(col("doc_id")).as("first_doc"))
    ex.join(first, Seq("h1", "h2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .select(col("doc_id"), col("n_shingles"), col("n_novel"),
        expr("(1000000 * n_novel) div n_shingles").as("novel_ppm"))
      .orderBy("doc_id")
  }

  /** Exact-substring deduplication — the Lee et al. 2022 ("Deduplicating
    * Training Data Makes Language Models Better") transform that REWRITES
    * the corpus instead of scoring it: [[dupSpans]] measures how much of
    * each doc is verbatim-duplicated text; this operator REMOVES it,
    * keeping exactly one occurrence corpus-wide. Every n-token shingle
    * occurrence that is not the corpus-first occurrence of a duplicated
    * shingle (≥2 occurrences anywhere — cross-doc or a within-doc
    * repeat) marks its n-token span for removal; per doc the marked
    * spans union into intervals and the doc re-emits with the surviving
    * tokens only. A verbatim passage planted in k docs survives exactly
    * once, at its lexicographically-first (doc_id, pos) site, and the
    * shingles straddling a planted passage's boundary contain unique
    * context so removal stops at the passage edge (DedupSpec pins both).
    * Keep-first policy matches [[clusterKeepList]]'s keep-lowest
    * canonical, applied at span rather than doc granularity.
    *
    * 100 TB shape — no self-join anywhere (the quadratic pair table of
    * the Jaccard family never exists, the [[dupSpans]] cost class):
    *  - the occurrence table is ∝ corpus tokens and carries (doc_id,
    *    pos, two 32-bit md5 lanes) — span TEXT never shuffles;
    *  - ONE map-side-combinable groupBy on the 64-bit key (count +
    *    min(struct)) picks each duplicated shingle's keeper; the
    *    duplicated-key list is the small minority of a real corpus
    *    (most shingles are unique) and joins back hash-partitioned;
    *  - removal flags ride a per-doc window over DENSE posexplode
    *    positions — a span covers [pos, pos+n-1], so "token covered by
    *    a marked span" ≡ "a marked start within the n-1 PRECEDING rows"
    *    and the interval union costs one bounded rows-frame, never a
    *    range join against an interval table;
    *  - the doc rebuild is one doc-keyed aggregate whose collect_list
    *    is doc-bounded.
    * Docs shorter than n tokens contribute one whole-text shingle at
    * pos 0 (the [[shingles]] fallback, positioned), so short exact-dup
    * docs dedup too. 32+32-bit key aliasing bound as [[dupSpans]]. */
  /** `minSpan`: the Lee-et-al minimum-match-length contract — only
    * maximal REMOVED RUNS of ≥ minSpan tokens are actually removed
    * (shorter marked runs un-mark; a 3-token echo of a common phrase
    * survives, a lifted paragraph does not). Only minSpan ≤ 1 is a
    * true no-op: a doc SHORTER than n tokens contributes one
    * whole-text fallback shingle whose marked run is the whole doc —
    * possibly < n tokens — so for minSpan in (doc_len, n] the run
    * gate must still fire (ADVICE r14 #2; the old `minSpan ≤ n`
    * shortcut violated the contract exactly there). Cost: two more
    * per-doc window passes over the SAME doc-keyed partitioning
    * (islands-and-gaps run ids + run length), no new shuffle. */
  def substringDedup(docs: DataFrame, n: Int = 3,
                     minSpan: Int = 0): DataFrame = {
    val toked = tokedOf(docs)
    val occ = graft.Caches.track(positionedOcc(toked, n))
    val firsts = occ.groupBy("h1", "h2")
      .agg(count(lit(1)).as("__n"),
        min(struct(col("doc_id"), col("pos"))).as("__f"))
      .filter(col("__n") >= 2)
      .select(col("h1"), col("h2"),
        col("__f.doc_id").as("__fd"), col("__f.pos").as("__fp"))
    val marked = occ.join(firsts, Seq("h1", "h2"))
      .filter(col("doc_id") =!= col("__fd") || col("pos") =!= col("__fp"))
      .select(col("doc_id"), col("pos"), lit(1L).as("__m"))
    rebuildRemoved(toked, marked, n, minSpan)
  }

  /** (doc_id, nonempty token array) — the shared front of the
    * substring-dedup family. */
  private def tokedOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("__t"))
      .filter(size(col("__t")) > 0)

  /** The positioned shingle-occurrence table (doc_id, pos, h1, h2) —
    * ∝ corpus tokens, span TEXT never leaves the row. Docs shorter
    * than n contribute one whole-text shingle at pos 0. */
  private def positionedOcc(toked: DataFrame, n: Int): DataFrame =
    toked.select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), greatest(size(col("__t")) - n, lit(0))),
          i => concat_ws(" ", slice(col("__t"), i + 1, lit(n)))))
          .as(Seq("p", "s")))
      .select(col("doc_id"), col("p").cast("long").as("pos"),
        PortableHash.hash32(col("s")).as("h1"),
        PortableHash.hash32b(col("s")).as("h2"))

  /** The removal tail shared by [[substringDedup]] and
    * [[substringDedupInc]]: marked span starts → per-token removal
    * flags via the bounded (n−1)-PRECEDING rows frame → minSpan
    * run-length gate → doc rebuild. */
  private def rebuildRemoved(toked: DataFrame, marked: DataFrame,
                             n: Int, minSpan: Int): DataFrame = {
    val tok = toked
      .select(col("doc_id"), posexplode(col("__t")).as(Seq("p", "w")))
      .select(col("doc_id"), col("p").cast("long").as("pos"), col("w"))
    val w = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(-(n - 1), Window.currentRow)
    val flagged = tok.join(marked, Seq("doc_id", "pos"), "left")
      .withColumn("__rm0",
        max(coalesce(col("__m"), lit(0L))).over(w) === 1L)
    val withRm =
      if (minSpan <= 1) flagged.withColumn("__rm", col("__rm0"))
      else {
        // islands-and-gaps over the SAME doc partitioning: run id =
        // cumsum of flag changes, run length = full-partition count
        // over (doc, run); removal holds only for runs ≥ minSpan
        val wd = Window.partitionBy("doc_id").orderBy("pos")
        flagged
          .withColumn("__chg",
            when(lag(col("__rm0"), 1).over(wd).isNull
              || lag(col("__rm0"), 1).over(wd) =!= col("__rm0"), 1L)
              .otherwise(0L))
          .withColumn("__run", sum(col("__chg")).over(
            wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("__rm", col("__rm0") &&
            count(lit(1)).over(Window.partitionBy("doc_id", "__run"))
              >= minSpan)
      }
    // kept_text rebuild via ordered listagg: a per-DOC string buffer,
    // bounded by the output value itself (rebuilding a document cannot
    // use less than document-sized state) — not the unbounded
    // collect_list class PlansSpec bans, where the buffer dwarfs the
    // output. NULL-skipping listagg mirrors the twin's string_agg.
    withRm
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("__rm").cast("long")).as("removed_tokens"),
        coalesce(expr("listagg(CASE WHEN NOT __rm THEN w END, ' ')" +
          " WITHIN GROUP (ORDER BY pos)"), lit("")).as("kept_text"))
      .select(col("doc_id"), col("n_tokens"), col("removed_tokens"),
        (col("n_tokens") - col("removed_tokens")).as("kept_tokens"),
        col("kept_text"), md5(col("kept_text")).as("kept_md5"))
  }

  /** The staged substring-dedup keeper index of a corpus: the DISTINCT
    * 64-bit shingle keys (h1, h2) of every positioned occurrence — the
    * artifact a continuous-ingestion pipeline stores and probes
    * (∝ corpus distinct shingles, two longs per row; the corpus TEXT
    * never ships). Rebuilt only when the corpus version changes; after
    * absorbing a batch the updated index is this table unioned with
    * the batch's keys ([[substringKeysUpdated]]). */
  def substringKeys(corpus: DataFrame, n: Int = 3): DataFrame =
    graft.Stage.parquet(corpus.sparkSession,
      graft.Stage.key(corpus, "substring_keys", n)) {
      positionedOcc(tokedOf(corpus), n).select("h1", "h2").distinct()
    }

  /** The keeper index after absorbing `batch`: corpus keys ∪ the
    * batch's distinct shingle keys — what the NEXT batch probes.
    * DedupSpec pins the maintenance contract (ADVICE r15 #3): this
    * union equals [[substringKeys]] rebuilt over corpus ∪ batch, so a
    * production loop can absorb per batch instead of rebuilding. */
  def substringKeysUpdated(corpus: DataFrame, batch: DataFrame,
                           n: Int = 3): DataFrame =
    substringKeys(corpus, n)
      .unionByName(positionedOcc(tokedOf(batch), n)
        .select("h1", "h2").distinct())
      .distinct()

  /** INCREMENTAL exact-substring dedup (VERDICT r14 #3) — the
    * continuous-ingestion form of [[substringDedup]]: the corpus is
    * canonical and already deduped; only the NEW batch is rewritten.
    * A batch occurrence is removed when its shingle appears anywhere
    * in the corpus (every corpus occurrence precedes the batch — the
    * [[incrementalDedup]] corpus-is-prior policy at span granularity)
    * or when it repeats a batch shingle and is not the batch's
    * lexicographically-first site (batch-internal dups dedup within
    * the batch, keep-first).
    *
    * 100 TB shape — asymmetric by construction, NEVER old×old: the
    * corpus contributes exactly its staged [[substringKeys]] index
    * (built once, probed by a hash semi-join from the batch side, so
    * each daily batch costs ∝ batch tokens + one index probe);
    * batch-internal firsts aggregate the batch's own occurrence table
    * only; the removal/rebuild tail is [[substringDedup]]'s, windowed
    * per batch doc. Output schema matches [[substringDedup]], batch
    * docs only. */
  def substringDedupInc(corpus: DataFrame, batch: DataFrame, n: Int = 3,
                        minSpan: Int = 0): DataFrame = {
    val keys = substringKeys(corpus, n)
    val tokedB = tokedOf(batch)
    val occB = graft.Caches.track(positionedOcc(tokedB, n))
    val inCorpus = occB
      .join(keys, Seq("h1", "h2"), "leftsemi")
      .select(col("doc_id"), col("pos"))
    val firstsB = occB.groupBy("h1", "h2")
      .agg(count(lit(1)).as("__n"),
        min(struct(col("doc_id"), col("pos"))).as("__f"))
      .filter(col("__n") >= 2)
      .select(col("h1"), col("h2"),
        col("__f.doc_id").as("__fd"), col("__f.pos").as("__fp"))
    val dupInBatch = occB.join(firstsB, Seq("h1", "h2"))
      .filter(col("doc_id") =!= col("__fd") || col("pos") =!= col("__fp"))
      .select(col("doc_id"), col("pos"))
    val marked = inCorpus.unionByName(dupInBatch).distinct()
      .withColumn("__m", lit(1L))
    rebuildRemoved(tokedB, marked, n, minSpan)
  }

  /** Content-defined chunking (the rsync/LBFS boundary trick, word
    * granularity): a word is a BOUNDARY when its salted hash lands in a
    * 1/avgWords slice of the hash space, and every boundary starts a
    * new chunk — so chunk edges are decided by CONTENT, not position,
    * and an edit perturbs only its own chunk: the next boundary
    * re-synchronizes, and every chunk after it hashes identically
    * (the re-alignment property fixed windows like [[dupSpans]] lack —
    * there an insertion shifts every downstream span). Expected chunk
    * length is avgWords, geometric.
    *
    * Each chunk gets an order-sensitive hash: Σ hash32("p:w") over its
    * words, p = position within chunk — associative/commutative per
    * the aggregation but position-encoding, so any engine and any
    * partial-aggregation order agrees. `dup` marks chunks whose hash
    * occurs in ≥2 docs — verbatim shared passages at variable
    * granularity.
    *
    * Scale shape: one explode ∝ corpus tokens; ONE window shuffle
    * keyed on doc_id computes BOTH the running boundary count (chunk
    * id) and the running boundary position (chunk start) in a single
    * pass; the chunk aggregate is map-side-combinable groupBy
    * (doc_id, chunk_id); dup detection aggregates the CHUNK table
    * (corpus/avgWords rows) by hash and broadcasts nothing
    * corpus-sized. No self-join, no per-doc lists. */
  /** Content-defined chunking of ANY per-doc ordered value stream
    * (doc_id, pos, v) — the [[cdcChunks]] word recipe made
    * value-generic so the decoded AUDIO sample lane reuses it
    * (VERDICT r15 #5): a value is a boundary when its salted hash
    * lands in the 1/avgLen slice of the hash space; chunk hash =
    * Σ hash32(p:v) over in-chunk positions p. Because boundaries are
    * decided by CONTENT, an unaligned re-trim (an offset that is no
    * multiple of any fixed window) re-synchronizes at the first
    * boundary value and every later chunk hashes identically — the
    * case every fixed-window lane provably misses. One doc-keyed
    * window shuffle; output (doc_id, chunk_id, n_vals, chunk_hash). */
  private[graft] def cdcChunkStream(vals: DataFrame, avgLen: Int,
                                    salt: String): DataFrame = {
    val bnd = (PortableHash.hash32(concat(lit(salt), col("v")))
      % avgLen === 0).cast("long")
    val w = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    vals
      .withColumn("chunk_id", sum(bnd).over(w))
      .withColumn("start_pos",
        coalesce(max(when(bnd === 1L, col("pos"))).over(w), lit(0L)))
      .withColumn("ph", PortableHash.hash32(
        concat((col("pos") - col("start_pos")).cast("string"),
          lit(":"), col("v"))))
      .groupBy("doc_id", "chunk_id")
      .agg(count(lit(1)).as("n_vals"), sum("ph").as("chunk_hash"))
  }

  def cdcChunks(docs: DataFrame, avgWords: Int = 16): DataFrame = {
    // Staged (r19 optimization): the posexplode + per-doc window pass
    // is the corpus-heavy half of the CDC lane and the chunk table is
    // exactly the fingerprint index a production pipeline stores —
    // cdc_chunks and cdc_neardup both read the artifact back.
    def plan = {
      val tok = docs.select(col("doc_id"),
        posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos", "v")))
      val chunks = cdcChunkStream(tok, avgWords, "cdc:")
        .withColumnRenamed("n_vals", "n_words")
      val shared = chunks.groupBy("chunk_hash")
        .agg(count_distinct(col("doc_id")).as("__nd"))
        .filter(col("__nd") >= 2).select("chunk_hash")
      chunks.join(shared.withColumn("dup", lit(true)),
          Seq("chunk_hash"), "left")
        .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
          col("n_words"), col("chunk_hash"),
          coalesce(col("dup"), lit(false)).as("dup"))
    }
    if (docs.isStreaming) plan
    else graft.Stage.parquet(docs.sparkSession,
      graft.Stage.key(docs, "cdc_chunks", avgWords))(plan)
  }

  /** Source-level mirror audit — which SOURCES near-duplicate each
    * other: LSH candidate pairs lifted to (source_a, source_b) cells
    * with pair counts and the distinct docs of each side involved. A
    * heavy off-diagonal cell is a mirror/scrape relationship (drop one
    * side wholesale instead of paying per-doc dedup); a heavy diagonal
    * is within-source boilerplate. The pair table is the SMALL side
    * (near-dup pairs, not the corpus): two doc-keyed hash joins
    * attach sources, then a |sources|²-bounded aggregate. */
  /** DOC-pair mass per unordered source cell (least/greatest), split
    * into the strictly-near component (each collapsed rep pair
    * expanded over its two groups' per-source member histograms —
    * ma·mb doc pairs attributed exactly, |sources|-bounded fan-out per
    * pair) and the EXACT component (within-identical-text-group doc
    * pairs: cX·cY across source cells, C(c,2) within one). This is how
    * the source-attribution consumers survive the rep collapse: the
    * cross-source exact-mirror mass — the thing a mirror audit exists
    * to find — lives in the rep GROUPS after collapse, not in the pair
    * list, so it is counted from the histograms, never by re-expanding
    * pairs. Output rows: (source_a, source_b, w, near). */
  private[operators] def sourceCellWeights(docs: DataFrame): DataFrame = {
    // Staged (r19 optimization): the |sources|²-bounded cell-weight
    // table is shared by mirror_audit and source_overlap — both
    // re-ran the rep-histogram window + three joins per call.
    def plan = sourceCellWeightsLive(docs)
    if (docs.isStreaming) plan
    else graft.Stage.parquet(docs.sparkSession,
      graft.Stage.key(docs, "source_cells"))(plan)
  }

  private def sourceCellWeightsLive(docs: DataFrame): DataFrame = {
    val hist = graft.Caches.track(
      textRepMap(docs)
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
        .groupBy(col("rep"), col("source")).agg(count(lit(1)).as("c")))
    val near = minhashPairs(docs).select("doc_a", "doc_b")
      .join(hist.select(col("rep").as("doc_a"), col("source").as("__sa"),
        col("c").as("__ca")), "doc_a")
      .join(hist.select(col("rep").as("doc_b"), col("source").as("__sb"),
        col("c").as("__cb")), "doc_b")
      .select(least(col("__sa"), col("__sb")).as("source_a"),
        greatest(col("__sa"), col("__sb")).as("source_b"),
        (col("__ca") * col("__cb")).as("w"), lit(true).as("near"))
    val exCross = hist.as("x").join(hist.as("y"),
        col("x.rep") === col("y.rep") && col("x.source") < col("y.source"))
      .select(col("x.source").as("source_a"), col("y.source").as("source_b"),
        (col("x.c") * col("y.c")).as("w"), lit(false).as("near"))
    val exSame = hist.filter(col("c") > 1)
      .select(col("source").as("source_a"), col("source").as("source_b"),
        expr("(c * (c - 1)) div 2").as("w"), lit(false).as("near"))
    near.unionByName(exCross).unionByName(exSame)
  }

  /** Source-level mirror/scrape audit over the collapsed pair graph —
    * doc-pair mass per unordered source cell, near/exact split: a hot
    * cross-source `n_exact_doc_pairs` cell is a verbatim mirror farm;
    * a hot `n_near_doc_pairs` cell is templated scraping. Rewritten
    * with the rep collapse (VERDICT r15 #2): counts are DOC pairs
    * reconstructed from multiplicities, so the number a curation run
    * reads is unchanged in meaning while the join work is rep-sized. */
  def mirrorAudit(docs: DataFrame): DataFrame =
    sourceCellWeights(docs)
      .groupBy("source_a", "source_b")
      .agg(sum(when(col("near"), col("w")).otherwise(0L))
          .as("n_near_doc_pairs"),
        sum(when(!col("near"), col("w")).otherwise(0L))
          .as("n_exact_doc_pairs"),
        sum(col("w")).as("n_doc_pairs"))
      .withColumn("cross_source", col("source_a") =!= col("source_b"))

  /** What cluster-correct dedup would SAVE — the one-row business case
    * computed before running the drop: docs and characters removed by
    * the keep-lowest-canonical policy over the transitive near-dup
    * clusters, as counts and ppm. Composes [[dedupClusters]]; the
    * dropped set (cluster non-canonicals) is near-dup-sized, the char
    * sums ride the doc-keyed hash join. */
  def dedupSavings(docs: DataFrame, maxIters: Int = 50): DataFrame = {
    val dropped = dedupClusters(docs, maxIters)
      .filter(col("doc_id") =!= col("cluster_id")).select("doc_id")
    val d = docs
      .join(dropped.withColumn("__drop", lit(1L)), Seq("doc_id"), "left")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(coalesce(col("__drop"), lit(0L))).as("n_dropped"),
        sum(when(col("__drop").isNotNull, col("n_chars"))
          .otherwise(0L)).as("chars_dropped"))
    d.select(col("n_docs"), col("n_dropped"),
      col("total_chars"), col("chars_dropped"),
      expr("(1000000 * n_dropped) div n_docs").as("docs_ppm"),
      expr("(1000000 * chars_dropped) div total_chars").as("chars_ppm"))
  }

  /** MinHash estimator quality evaluation — the measurement that
    * justifies (or indicts) running dedup off the 16-lane estimate:
    * over ALL banded candidate pairs, score the estimate against the
    * exact shingle Jaccard at the dup threshold and report the
    * confusion counts + precision/recall in exact ppm. Pure
    * composition of [[tieredNearDup]] with the est gate OPEN
    * (estMilli = 0), so the est/exact join machinery exists once; the
    * eval itself is a 1-row aggregate over the candidate-pair table.
    * (Recall here is relative to banded candidates — pairs no band
    * surfaced are invisible to both estimator and truth, which is the
    * estimator-vs-truth question, not the banding-recall question
    * `ann_recall` answers for the vector path.) */
  def minhashEval(docs: DataFrame, threshMilli: Long = 500L): DataFrame = {
    val t = threshMilli
    tieredNearDup(docs, estMilli = 0L, dupMilli = t)
      .select(
        (col("est_milli") >= t).cast("long").as("__pe"),
        (col("jac_milli") >= t).cast("long").as("__pt"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("__pe") * col("__pt")).as("tp"),
        sum(col("__pe") * (lit(1L) - col("__pt"))).as("fp"),
        sum((lit(1L) - col("__pe")) * col("__pt")).as("fn"),
        sum((lit(1L) - col("__pe")) * (lit(1L) - col("__pt"))).as("tn"))
      .select(col("n_pairs"), col("tp"), col("fp"), col("fn"), col("tn"),
        expr("(1000000 * tp) div greatest(tp + fp, 1)")
          .as("precision_ppm"),
        expr("(1000000 * tp) div greatest(tp + fn, 1)")
          .as("recall_ppm"))
  }

  /** Precision/recall sweep of the minhash lane-agreement estimator
    * against exact Jaccard, across a threshold grid — the curve (not
    * the single [[minhashEval]] point) that picks the production
    * est-gate threshold: where does estimator precision collapse, and
    * what recall does each notch buy.
    *
    * The expensive part — candidates + exact Jaccard — is computed
    * ONCE ([[tieredNearDup]] with open gates) and cached; the sweep
    * is a thresholds×pairs explode over that cached frame (thresholds
    * are a literal handful). All confusion-matrix lanes are exact
    * BIGINTs, P/R in ppm with the minhashEval div-by-zero guard. */
  def dedupThresholdSweep(docs: DataFrame,
                          threshMillis: Seq[Long] = Seq(300L, 400L, 500L,
                            600L, 700L, 800L)): DataFrame = {
    require(threshMillis.nonEmpty)
    val base = graft.Caches.track(
      tieredNearDup(docs, estMilli = 0L, dupMilli = 0L)
        .select(col("est_milli"), col("jac_milli")))
    base
      .select(col("est_milli"), col("jac_milli"),
        explode(array(threshMillis.map(lit): _*)).as("thresh_milli"))
      .select(col("thresh_milli"),
        (col("est_milli") >= col("thresh_milli")).cast("long").as("__pe"),
        (col("jac_milli") >= col("thresh_milli")).cast("long").as("__pt"))
      .groupBy("thresh_milli")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("__pe") * col("__pt")).as("tp"),
        sum(col("__pe") * (lit(1L) - col("__pt"))).as("fp"),
        sum((lit(1L) - col("__pe")) * col("__pt")).as("fn"))
      .select(col("thresh_milli"), col("n_pairs"), col("tp"), col("fp"),
        col("fn"),
        expr("(1000000 * tp) div greatest(tp + fp, 1)").as("precision_ppm"),
        expr("(1000000 * tp) div greatest(tp + fn, 1)").as("recall_ppm"))
      .orderBy("thresh_milli")
  }

  /** The dedup keep-list: drop every doc that appears as the HIGHER id
    * of an LSH candidate pair (keep-lowest-canonical policy) via a
    * LEFT ANTI join — the standard "subtract the duplicates" shape; at
    * scale the anti-join is a hash join on doc_id against the (small)
    * duplicate set. */
  def dedupKeepList(docs: DataFrame): DataFrame = {
    // candidateEdges, not bare rep pairs: a non-rep exact dup must
    // still drop (its star edge names it as doc_b — rep = group min,
    // so orientation matches the keep-lowest policy), and the drop set
    // provably equals the uncollapsed band join's (doc y drops iff
    // some x < y shares a band iff rep(x) < y for its rep's group)
    val dupes = candidateEdges(docs).select(col("doc_b").as("doc_id"))
      .distinct()
    docs.join(dupes, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"))
  }

  /** Connected components over an undirected pair graph (doc_a, doc_b):
    * every node gets the MINIMUM doc_id reachable from it as its
    * cluster_id. This is the transitive-closure step real MinHash dedup
    * needs between candidate pairs and a keep-list — A~B and B~C must
    * collapse to ONE cluster even when A and C share no band, which the
    * pairwise keep-lowest policy (dedupKeepList) approximates but never
    * guarantees (it can drop B for A while C survives because its only
    * pair named B, now gone).
    *
    * Algorithm: iterative min-label propagation (pull min over
    * neighbors, keep own label if smaller), the textbook distributed CC
    * — each round is ONE hash-partitioned equi-join + groupBy shuffle
    * on doc ids (never all-pairs, no per-group state beyond a single
    * min), and the round count is the component DIAMETER, which for
    * near-dup graphs is small (duplicate clusters are dense — most are
    * cliques from a shared band, diameter 1-2). The per-round
    * convergence probe (`isEmpty` on the changed set) is an
    * aggregate-sized driver action, same class as packSequences'
    * max(doc_id). Labels are persisted per round, and the probe
    * materializes the cache, so round N+1 reads round N's table instead
    * of its lineage. For adversarial long-chain graphs at corpus scale,
    * the known upgrade is the alternating large-star/small-star
    * algorithm (Kiveris et al., "Connected Components in MapReduce and
    * Beyond") — O(log n) rounds with the same join-per-round shape;
    * maxIters bounds the loop either way. */
  /** Plan-tree barrier between iterative rounds: re-wrap the round's
    * result as a fresh LogicalRDD. Chaining DataFrame ops across rounds
    * nests the logical plan TREE exponentially — each round references
    * the prior frame k≥2 times, so after ~10 rounds analysis and plan
    * stringification OOM even though execution would read a cache. The
    * RDD DAG underneath is a GRAPH (shared by reference, linear
    * growth), so the wrap costs nothing; tracked-persist makes each
    * round execute once and keeps storage releasable. */
  private def roundBarrier(df: DataFrame): DataFrame =
    graft.Caches.track(df.sparkSession.createDataFrame(df.rdd, df.schema))

  /** Unconverged labels are SILENTLY WRONG output for a dedup keep-list
    * (under-merged components keep extra duplicates), so exhausting the
    * round budget is an error, never a result. The defaults (50
    * min-label rounds ≥ graph diameter 50; 30 star rounds ≫ log₂ of any
    * physical node count) only trip on adversarial graphs or a
    * too-small caller override — raising maxIters is always safe, the
    * loops stop at the convergence probe. */
  private def requireConverged(converged: Boolean, algo: String,
                               maxIters: Int): Unit =
    if (!converged) throw new IllegalStateException(
      s"$algo did not converge within maxIters=$maxIters rounds; " +
        "labels would be under-merged (extra duplicates kept). " +
        "Raise maxIters.")

  def connectedComponents(pairs0: DataFrame, maxIters: Int = 50): DataFrame = {
    val pairs = graft.Caches.track(pairs0.select("doc_a", "doc_b"))
    val edges = graft.Caches.track(
      pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst"))))
    // round-0 labels fused into ONE aggregation: min(self, neighbors)
    // straight off the edge list — identical to running a propagation
    // round over identity labels, but without the distinct() shuffle or
    // the identity-join (cliques converge here; the loop then only
    // confirms). Every node appears as src because edges are symmetric.
    var labels = graft.Caches.track(
      edges.groupBy(col("src").as("doc_id")).agg(min(col("dst")).as("nmin"))
        .select(col("doc_id"),
          least(col("doc_id"), col("nmin")).as("cluster_id")))
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      val nbrMin = edges.join(
          labels.select(col("doc_id").as("dst"), col("cluster_id").as("nl")),
          "dst")
        .groupBy("src").agg(min(col("nl")).as("nmin"))
        .select(col("src").as("doc_id"), col("nmin"))
      // the changed flag rides in the SAME projection (nmin < old label)
      // — no separate next⋈prev comparison join per round
      val next = roundBarrier(labels.join(nbrMin, Seq("doc_id"))
        .select(col("doc_id"),
          least(col("cluster_id"), col("nmin")).as("cluster_id"),
          (col("nmin") < col("cluster_id")).as("__changed")))
      converged = next.filter(col("__changed")).isEmpty
      labels = next.select("doc_id", "cluster_id")
      iter += 1
    }
    requireConverged(converged, "connectedComponents (min-label)", maxIters)
    labels
  }

  /** Duplicate-cluster assignment for every doc that appears in any LSH
    * candidate pair: (doc_id, cluster_id = min doc_id of its component).
    * The cluster table is what a curation pipeline joins to pick ONE
    * canonical doc per near-dup group (keep doc_id == cluster_id) or to
    * audit cluster sizes. Singleton docs (no pair) are by definition
    * their own cluster and are not materialized — at corpus scale the
    * paired set is the small output, the identity rows would be the
    * whole corpus. */
  def dedupClusters(docs: DataFrame, maxIters: Int = 50): DataFrame = {
    // Staged (r19 optimization): the converged label table is the
    // dedup-side sibling of the staged graph artifacts
    // (graph_components, graph_lpa_labels) — five gated consumers
    // (clusters, stats, keep-list, savings, the curation dashboards)
    // each re-ran the full min-label loop per call; a production
    // pipeline stores the cluster assignment it deduplicates by.
    def plan = connectedComponents(candidateEdges(docs), maxIters)
    if (docs.isStreaming) plan
    else graft.Stage.parquet(docs.sparkSession,
      graft.Stage.key(docs, "dedup_components", maxIters))(plan)
  }

  /** Duplication dashboard: the cluster-SIZE distribution of the
    * near-dup graph — how many pairs, triples, …, N-doc pileups the
    * corpus carries, the number a curation run reports before anyone
    * pays for dedup ("0.4% of docs sit in clusters ≥ 10" decides the
    * policy). Composes [[dedupClusters]]; singleton docs (no candidate
    * pair — deliberately not materialized there) surface here as the
    * cluster_size=1 row computed by DIFFERENCE of two 1-row aggregates
    * (corpus count − clustered count), so nothing corpus-sized is
    * materialized for them either. Everything above the CC output is
    * aggregate-on-aggregate: per-cluster sizes (cluster-count rows) →
    * size histogram (distinct-size rows); broadcast cross of the two
    * 1-row counts. */
  def clusterStats(docs: DataFrame, maxIters: Int = 50): DataFrame = {
    val cc = dedupClusters(docs, maxIters)
    val hist = cc.groupBy("cluster_id").agg(count(lit(1)).as("sz"))
      .groupBy("sz").agg(count(lit(1)).as("n_clusters"),
        sum("sz").as("n_docs"))
      .select(col("sz").as("cluster_size"), col("n_clusters"),
        col("n_docs"))
    val singles = docs.agg(count(lit(1)).as("__all"))
      .crossJoin(broadcast(cc.agg(count(lit(1)).as("__cl"))))
      .select(lit(1L).as("cluster_size"),
        (col("__all") - col("__cl")).as("n_clusters"),
        (col("__all") - col("__cl")).as("n_docs"))
    singles.union(hist)
  }

  /** Connected components by ALTERNATING LARGE-STAR / SMALL-STAR — the
    * O(log n)-round algorithm (public MapReduce-CC literature: Kiveris
    * et al., "Connected Components in MapReduce and Beyond") that
    * [[connectedComponents]]' scaladoc names as the upgrade for
    * adversarial long-chain graphs, implemented rather than merely
    * cited. Round count is O(log n) regardless of component DIAMETER,
    * where min-label propagation pays one round per hop; each round is
    * the same primitive (groupBy min + equi-join on node ids), so the
    * per-round cost profile is identical and the choice is purely
    * graph-shape-driven: band-clique near-dup graphs → min-label
    * (fewer rounds in practice); path-like graphs (e.g. chained
    * shingle overlaps across a crawl) → star.
    *
    * large-star: every node's strictly-larger neighbors reattach to
    * min(self ∪ neighbors); small-star: the ≤-neighbors do. Both
    * preserve connectivity; the fixpoint is a star per component with
    * every node pointing at the component minimum. Convergence probe:
    * new-edges \ old-edges empty at equal counts (edge labels only
    * decrease, sets are distinct) — aggregate-sized driver action, as
    * elsewhere. Output is identical to [[connectedComponents]]
    * (differential-tested, and `dedup_clusters_star` runs against the
    * SAME DuckDB oracle in the driver gate). */
  def connectedComponentsStar(pairs0: DataFrame, maxIters: Int = 30)
      : DataFrame = {
    // Staged (r19 optimization) under its OWN key — the star rounds
    // still run (once, at artifact build), so the gated query keeps
    // exercising the alternating algorithm while repeat callers read
    // the converged star labels back like every other staged
    // component table.
    if (!pairs0.isStreaming)
      graft.Stage.parquet(pairs0.sparkSession,
        graft.Stage.key(pairs0, "dedup_components_star", maxIters))(
        connectedComponentsStarLive(pairs0, maxIters))
    else connectedComponentsStarLive(pairs0, maxIters)
  }

  private def connectedComponentsStarLive(pairs0: DataFrame,
                                          maxIters: Int): DataFrame = {
    val pairs = pairs0.select("doc_a", "doc_b")
    // directed large→small; self-loops impossible (doc_a < doc_b)
    var edges = graft.Caches.track(
      pairs.select(col("doc_b").as("a"), col("doc_a").as("b")).distinct())
    var edgeCount = edges.count()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      // Each star step is ONE window (min over the node's partition)
      // instead of the groupBy+self-join pair — half the shuffles per
      // round; the intermediate large-star result deliberately skips
      // its distinct() (duplicate edges ride one round and fold into
      // the final distinct, cheaper than an extra exchange).
      val w = Window.partitionBy("a")
      // large-star over the symmetric view: for each u, neighbors v > u
      // attach to m(u) = min(u ∪ Γ(u)); result is again large→small
      val sym = edges.union(edges.select(col("b").as("a"), col("a").as("b")))
      val ls = sym
        .withColumn("m", least(min(col("b")).over(w), col("a")))
        .filter(col("b") > col("a"))
        .select(col("b").as("a"), col("m").as("b"))
      // small-star on the large→small edges: ≤-neighbors attach to the
      // min, and u keeps an edge to it ((a,m) once per edge here — the
      // final distinct folds the copies)
      val lsm = ls.withColumn("m", min(col("b")).over(w))
      val ss = lsm.filter(col("b") =!= col("m"))
        .select(col("b").as("a"), col("m").as("b"))
        .union(lsm.select(col("a"), col("m").as("b")))
        .filter(col("a") =!= col("b")).distinct()
      val next = roundBarrier(ss)
      // convergence probe: |next| from this round's one count action;
      // |edges| carried from the previous round. Equal counts + empty
      // left-anti ⟺ set equality (both sides are distinct sets) — the
      // anti-join replaces the strictly costlier exceptAll.
      val nextCount = next.count()
      converged = nextCount == edgeCount &&
        next.join(edges, Seq("a", "b"), "left_anti").isEmpty
      edges = next
      edgeCount = nextCount
      iter += 1
    }
    requireConverged(converged, "connectedComponentsStar", maxIters)
    // fixpoint is a star per component: non-roots point at the root,
    // roots (component minima) label themselves
    edges.select(col("a").as("doc_id"), col("b").as("cluster_id"))
      .union(edges.select(col("b").as("doc_id"), col("b").as("cluster_id")))
      .distinct()
  }

  /** Exact-duplicate removal by full-text hash: keep the lowest doc_id
    * per identical text (md5 — cross-engine-stable hex). One window
    * shuffle on the content hash; Spark 4's WindowGroupLimit prunes the
    * rank-1 filter map-side, so no text group ever sorts more than its
    * survivors. The md5 COLLISION risk is the standard exact-dedup
    * trade at corpus scale; byte-compare within hash groups is the
    * paranoid upgrade. */
  def textExactDedup(docs: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    docs.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(col("doc_id"), col("lang"), col("source"))
  }

  /** Cluster-correct keep-list: keep exactly one canonical doc — the
    * component minimum — per near-dup cluster, plus every unpaired doc.
    * Strictly stronger than [[dedupKeepList]]'s pairwise policy: a doc
    * that is lowest in all of ITS OWN pairs can still be a transitive
    * duplicate of a lower doc two hops away (edges (2,3) and (1,3):
    * pairwise keeps 2, clusters drop it — 2~1 via 3). Same anti-join
    * shape at scale; the duplicate set is the clusters table minus its
    * canonicals, still small relative to the corpus. */
  def clusterKeepList(docs: DataFrame, maxIters: Int = 50): DataFrame = {
    val dupes = dedupClusters(docs, maxIters)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select("doc_id")
    docs.join(dupes, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"))
  }

  val simhashBits = 64

  /** 64-bit SimHash: explode tokens (frequency-weighted), hash each once
    * into two independent md5 lanes (bits 0-31 / 32-63), then one
    * groupBy(doc) with 64 codegen'd ±1 bit sums — partial aggregation
    * map-side, single shuffle on doc_id. 64 bits (vs 32) exist for the
    * BANDS: 16-bit bands give 65 536 bucket values each, so a band
    * bucket holds |data|/2^16 docs instead of |data|/2^8 — the
    * within-bucket quadratic term shrinks 256×. The sign bit (i=63) is
    * used like any other bit; the signature is an opaque int64. */
  def simhash(docs: DataFrame): DataFrame = {
    // Staged (r19 optimization): the token explode + 64 bit-sum
    // aggregation is the corpus-heavy half of the simhash family —
    // signature index discipline as [[signatures]] (one artifact per
    // input plan; the rep-collapsed pair path and the raw-corpus
    // query stage separately because their input plans differ).
    def plan = {
      val tok = docs.select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("t"))
      val h = tok.withColumn("h1", PortableHash.hash32(col("t")))
        .withColumn("h2", PortableHash.hash32b(col("t")))
      val bitSums = (0 until simhashBits).map { i =>
        val lane = if (i < 32) col("h1") else col("h2")
        sum(when(shiftright(lane, i % 32).bitwiseAND(1) === 1, 1L)
          .otherwise(-1L)).as(s"b$i")
      }
      val agg = h.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      val sh = (0 until simhashBits).map(i =>
          when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
        .reduce(_ + _)
      agg.select(col("doc_id"), sh.as("simhash"))
    }
    if (docs.isStreaming) plan
    else graft.Stage.parquet(docs.sparkSession,
      graft.Stage.key(docs, "simhash_sigs", simhashBits))(plan)
  }

  /** SimHash candidate pairs: band the 64-bit signature into 4 16-bit
    * bands; pairs agreeing on any band are candidates (equi-join, the
    * scale path), then verified with exact Hamming distance ≤
    * maxHamming. The shift is arithmetic in both engines; the & 65535
    * mask makes the band value sign-independent. */
  /** Agreement audit between the two near-dup detectors — the
    * method-selection question ("do MinHash banding and SimHash
    * banding even flag the same pairs on THIS corpus?") answered as a
    * 1-row overlap summary: pair counts per method, the intersection,
    * the union, and their Jaccard in ppm. Low agreement on a corpus
    * means the thresholds are mistuned or the duplication mode
    * (set-overlap vs near-identical text) doesn't match the detector —
    * the audit to read before trusting either keeplist. Composition of
    * the two existing staged/persisted pair paths + ONE full-outer
    * equi-join on the pair key + a 1-row aggregate; both pair sets are
    * candidate-scale (band-join bounded), never corpus². */
  def dedupMethodAgreement(docs: DataFrame, maxHamming: Int = 6)
      : DataFrame = {
    // both pair sets are rep pairs in the SAME text-md5 rep space
    // (textReps), so the overlap join compares like with like
    val mh = minhashPairs(docs).select(col("doc_a"), col("doc_b"))
      .withColumn("mh", lit(1L))
    val sh = simhashPairs(docs, maxHamming)
      .select(col("doc_a"), col("doc_b")).withColumn("sh", lit(1L))
    mh.join(sh, Seq("doc_a", "doc_b"), "full")
      .agg(sum(coalesce(col("mh"), lit(0L))).as("n_minhash"),
        sum(coalesce(col("sh"), lit(0L))).as("n_simhash"),
        sum(when(col("mh").isNotNull && col("sh").isNotNull, 1L)
          .otherwise(0L)).as("n_both"),
        count(lit(1)).as("n_union"))
      .select(col("n_minhash"), col("n_simhash"), col("n_both"),
        col("n_union"),
        when(col("n_union") > 0,
          expr("(1000000 * n_both) div n_union")).as("jaccard_ppm"))
      .orderBy("n_union")
  }

  def simhashPairs(docs: DataFrame, maxHamming: Int = 6,
                   maxBucket: Int = 64): DataFrame = {
    // EXACT-DUP COLLAPSE first (VERDICT r15 #2): the 64-bit-sum
    // aggregation runs only on identical-text reps, and a k-cluster of
    // exact dups costs one rep instead of k²/2 hamming-0 all-band
    // pairs. One signature row per rep, persisted: the aggregation
    // runs once, not once per join side. Output is the strictly-near
    // structure over reps (hamming-0 pairs remain possible between
    // DISTINCT texts whose simhashes collide — notably REORDERED
    // boilerplate: simhash is frequency-weighted and order-blind, so k
    // same-multiset rewrites share one simhash and would pay k²/2
    // all-band pairs), n_doc_pairs = ma·mb. The [[dropHotBuckets]]
    // occupancy cap bounds exactly that pile-up (the r15 watch note):
    // a band bucket above maxBucket reps drops from both sides, same
    // documented recall tradeoff as [[hash64Neardup]].
    val reps = textReps(docs)
    val sh = graft.Caches.track(
      simhash(docs.join(reps.select("doc_id"), Seq("doc_id"), "leftsemi"))
        .join(reps, "doc_id"))
    val banded = dropHotBuckets(
      sh.select(col("doc_id"), col("simhash"), col("m"),
          explode(array((0 until 4).map(j => struct(
            lit(j).as("band_id"),
            shiftright(col("simhash"), j * 16).bitwiseAND(65535)
              .as("band_val"))): _*))
            .as("b"))
        .select(col("doc_id"), col("simhash"), col("m"),
          col("b.band_id"), col("b.band_val")),
      maxBucket)
    banded.as("a").join(banded.as("b"),
        col("a.band_id") === col("b.band_id")
          && col("a.band_val") === col("b.band_val")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
          .as("hamming"),
        (col("a.m") * col("b.m")).as("n_doc_pairs"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** EXACT threshold set-similarity self-join via prefix filtering
    * (Chaudhuri-Ganti-Kaushik 2006; Bayardo et al.'s All-Pairs 2007;
    * the distributed shape of Vernica-Carey-Li, SIGMOD 2010) — the
    * exactness-COMPLETE complement of the probabilistic paths: LSH
    * banding can miss a true pair and [[ngramJaccard]]'s df-capped
    * candidates miss pairs sharing only common shingles; this join
    * returns EVERY pair with token-set Jaccard ≥ τ, guaranteed. The
    * lemma: order the vocabulary globally by (df asc, term) — rarest
    * first; J(A,B) ≥ τ forces |A∩B| ≥ ⌈τ·|x|⌉ for each side, so the
    * smallest common token sits within the first
    * p_x = |x| − ⌈τ·|x|⌉ + 1 tokens of BOTH docs — a prefix-prefix
    * equi-join on the token loses nothing.
    *
    * Scale shape: the prefix holds the RAREST tokens (shortest posting
    * lists), so the candidate join's fan-out is df-bounded exactly
    * where it matters; the |B| ∈ [τ|A|, |A|/τ] length filter prunes
    * before verification; verification joins the full (doc, term)
    * table only for candidate pairs. Thresholding uses floored milli
    * Jaccard — floor(1000J) ≥ τ ⟺ 1000J ≥ τ for integer τ, so the
    * completeness guarantee survives the integer lane. */
  def allPairsJaccard(docs: DataFrame, tauMilli: Long = 900L)
      : DataFrame = {
    // τ ∈ (0, 1]: τ > 1000 would make the prefix slice length
    // non-positive (missing pairs despite the completeness guarantee)
    // and τ = 0 degenerates the prefix to the whole shingle set — a
    // fully quadratic candidate join (ADVICE r14 #3)
    require(tauMilli >= 1 && tauMilli <= 1000,
      s"allPairsJaccard needs tauMilli in [1, 1000], got $tauMilli")
    // Collapse identical token SETS to one representative first (min
    // doc_id per set-md5) and carry the multiplicity: a cluster of k
    // exact dups would otherwise emit k²/2 J=1000 pairs AND drag k
    // copies through the verification join — measured 52 s → sub-second
    // verification at sf0.1 on this dup-heavy fixture, and the k²
    // blowup is gone at ANY scale. Identical-set pairs are the
    // exact-dedup family's report; THIS op returns the strictly-
    // similar-but-not-identical structure, each rep pair stamped with
    // the doc-pair count it stands for (ma·mb).
    // similarity domain = 3-word SHINGLE sets (the minhash family's
    // own domain, and what makes prefix filtering sharp: shingles are
    // near-unique, so the rarest-first prefix join probes short
    // posting lists — word tokens on a small vocabulary have high df
    // everywhere and the candidate join degenerates)
    val toksed = withShingles(docs).select(col("doc_id"),
      array_sort(array_distinct(col("__sh"))).as("ts"))
    val sigd = toksed.select(col("doc_id"),
      md5(array_join(col("ts"), " ").cast("binary")).as("sig"),
      col("ts"))
    val reps = sigd.groupBy("sig")
      .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("m"))
    // rep table with tokens in the global LEXICOGRAPHIC total order —
    // the lemma needs only A fixed total order, and `ts` is already
    // sorted, so prefixes are free row-local slices: no df join, no
    // per-doc rank window, no per-shingle hash pass (the classic
    // df-ascending heuristic buys shorter posting lists, but on a
    // near-unique shingle domain every order's posting lists are
    // dup-cluster-sized anyway — the corpus-scale ranking machinery
    // would cost more than it prunes)
    val repd = graft.Caches.track(
      sigd.join(reps, sigd("doc_id") === reps("rep"))
        .select(col("rep").as("doc_id"), col("m"), col("ts"),
          size(col("ts")).cast("long").as("n")))
    val dt = repd.select(col("doc_id"), explode(col("ts")).as("term"))
    val prefix = repd.select(col("doc_id"), col("n"), col("m"),
        explode(slice(col("ts"), lit(1),
          col("n") - expr(s"(($tauMilli * n) + 999) div 1000") + 1))
          .as("term"))
      .select(col("doc_id"), col("term"), col("n"), col("m"))
    val cand = prefix.select(col("doc_id").as("rep_a"), col("term"),
        col("n").as("na"), col("m").as("ma"))
      .join(prefix.select(col("doc_id").as("rep_b"), col("term"),
        col("n").as("nb"), col("m").as("mb")), Seq("term"))
      .filter(col("rep_a") < col("rep_b") &&
        lit(1000L) * least(col("na"), col("nb")) >=
          lit(tauMilli) * greatest(col("na"), col("nb")))
      .select(col("rep_a"), col("rep_b"), col("na"), col("nb"),
        col("ma"), col("mb"))
      .distinct()
    cand
      .join(dt.select(col("doc_id").as("rep_a"), col("term")),
        Seq("rep_a"))
      .join(dt.select(col("doc_id").as("rep_b"), col("term")),
        Seq("rep_b", "term"))
      .groupBy("rep_a", "rep_b", "na", "nb", "ma", "mb")
      .agg(count(lit(1)).as("inter"))
      .withColumn("jac_milli",
        expr("(1000 * inter) div (na + nb - inter)"))
      .filter(col("jac_milli") >= tauMilli)
      .select(col("rep_a"), col("rep_b"), col("inter"), col("na"),
        col("nb"), col("jac_milli"),
        (col("ma") * col("mb")).as("n_doc_pairs"))
      .orderBy("rep_a", "rep_b")
  }

  /** Banded near-dup pairs over ANY 64-bit perceptual-hash table —
    * the [[simhashPairs]] candidate discipline generalized to a
    * precomputed (doc_id, hash) frame, so image dHash ([[
    * graft.multimodal.Multimodal.imageDhash]]), audio fingerprints, or
    * any other 64-bit signature reuses one band-join recipe: 4×16-bit
    * bands generate candidates via equi-join, survivors verify by
    * exact Hamming distance.
    *
    * Identical hash VALUES collapse to a min-doc representative FIRST
    * with multiplicity stamped (the [[allPairsJaccard]] lesson: a
    * cluster of k exact-hash dups would otherwise emit k²/2
    * Hamming-0 pairs and drag k copies through the band join — the
    * one quadratic blowup a dup-heavy corpus guarantees). Identical-
    * hash groups are the exact-dup report (a groupBy over the hash
    * table); THIS op returns the strictly-near structure: rep pairs
    * with 1 ≤ hamming ≤ maxHamming, each stamped with the doc-pair
    * count it stands for (ma·mb). */
  /** The nBands × (64/nBands)-bit band columns of a 64-bit hash
    * column: one row per (input row, band). The arithmetic shift +
    * mask is sign-independent; shared by every 64-bit banding
    * consumer. More/narrower bands trade join fan-out for recall —
    * [[hash64BandRecallCurve]] measures the dial per geometry. */
  private def withBandsN(df: DataFrame, hashCol: String,
                         nBands: Int): DataFrame = {
    // a non-divisor leaves the high 64 mod nBands bits unbanded, and
    // nBands = 1 makes (1L << 64) wrap the mask to 0 — every hash in
    // one bucket, which the occupancy cap then drops: silent ZERO
    // recall, not an error (ADVICE r17 #1). Shared by every 64-bit
    // banding entry point; the oracle twins mirror the check.
    require(nBands >= 2 && 64 % nBands == 0,
      s"nBands must be a divisor of 64 in [2, 64], got $nBands")
    val width = 64 / nBands
    val mask = (1L << width) - 1
    df.withColumn("__b",
        explode(array((0 until nBands).map(j => struct(
          lit(j).as("band_id"),
          shiftright(col(hashCol), j * width).bitwiseAND(mask)
            .as("band_val"))): _*)))
      .withColumn("band_id", col("__b.band_id"))
      .withColumn("band_val", col("__b.band_val"))
      .drop("__b")
  }

  /** Band-bucket occupancy cap (VERDICT r15 #1 — the ngramJaccard
    * hot-key move for 64-bit banding): buckets holding more than
    * `maxBucket` distinct reps are dropped from BOTH join sides before
    * the self-join, so one structurally-hot band value (the near-flat
    * dHash halo around 0 — solid backgrounds, blank pages; md5-mixed
    * simhash lanes don't have this, gradient hashes do) costs at most
    * maxBucket² instead of |bucket|². RECALL TRADEOFF, documented: a
    * true pair is found iff at least ONE of its 4 bands lands in a
    * cold bucket — `image_band_recall` / `image_band_recall_curve`
    * measure the production dial. MEASURED (sf0.01, planted probes,
    * cap at 64): recall 1 000 000 ppm at Hamming 2 (geometric — ≤ 3
    * flips touch at most 3 of 4 bands), 885 714 at 4, 657 142 at 6,
    * 442 857 at 8, 200 000 at 10, 71 428 at the production threshold
    * 12; real-corpus brute-force truth at sf0.01 is 2 pairs with 1
    * found (500 000 ppm). A pipeline that must CATCH 12-bit drift
    * needs more/narrower bands, not a looser verify — measured A/B
    * (`image_band_recall_curve8`, same probes, same cap): 8×8-bit
    * banding holds 1 000 000 ppm through Hamming 8 and lifts the
    * threshold-12 recall to 885 714 ppm at sf0.01, paying 256× hotter
    * uniform buckets. CORRECTED at sf0.1 by the full decision matrix
    * (`image_band_recall_matrix`, r19 — the two-SF discipline): exact
    * 8×8 at d=12 drops to 496 159 ppm as the buckets heat, while
    * 8×8 + 1-bit multi-probe holds 909 370 — the image lanes
    * therefore ship probeBits = 1 (and 16×4 narrowing reads 124k,
    * occupancy-hot: the cap policy binds earlier at corpus scale —
    * the recall/fan-out dial made a number, twice).
    * The cap default is ~64× the uniform per-bucket expectation at
    * fixture scale; at corpus scale the dial sizes as c·E[occupancy]
    * (and the real lever is wider/more bands). */
  private def dropHotBuckets(banded: DataFrame, maxBucket: Int): DataFrame = {
    val hot = banded.groupBy("band_id", "band_val")
      .agg(count(lit(1)).as("__n")).filter(col("__n") > maxBucket)
      .select("band_id", "band_val")
    banded.join(broadcast(hot), Seq("band_id", "band_val"), "left_anti")
  }

  /** `probeBits` (VERDICT r17 #1 — the `ann_lsh_multiprobe` move
    * applied to band values): at 1, ONE side of the band self-join
    * also offers every single-bit flip of each band value, so a pair
    * whose CLOSEST band differs by exactly one bit still collides —
    * recall that exact banding must buy with more/narrower bands
    * (which the occupancy cap punishes: 4-bit band values have 16
    * buckets total, occupancy-dead at any corpus scale) is bought
    * with a (1 + 64/nBands)× probe-side fan instead, verified exact
    * afterwards as always. MEASURED ([[hash64BandRecallMatrix]] over
    * the sign codes, sf0.1): 8×8 exact holds 549k ppm at planted
    * d=16 where 8×8+mp1 holds 1 000 000 (927k at d=20) and 16×4 reads
    * 0 everywhere (every 4-bit bucket is hot). */
  def hash64Neardup(hashes: DataFrame, hashCol: String,
                    maxHamming: Int = 6, maxBucket: Int = 64,
                    nBands: Int = 4, probeBits: Int = 0): DataFrame = {
    require(probeBits == 0 || probeBits == 1,
      s"probeBits is 0 (exact banding) or 1 (1-bit multi-probe), " +
        s"got $probeBits")
    // Staged (r19 optimization): the verified pair list is the
    // candidate-list artifact of every 64-bit hash lane (image dHash,
    // video frame/scene, embedding sign codes) — same discipline as
    // minhash_pairs; key covers every admission dial.
    def plan = hash64NeardupLive(hashes, hashCol, maxHamming, maxBucket,
      nBands, probeBits)
    if (hashes.isStreaming) plan
    else graft.Stage.parquet(hashes.sparkSession,
      graft.Stage.key(hashes, "hash64_pairs", hashCol, maxHamming,
        maxBucket, nBands, probeBits))(plan)
  }

  private def hash64NeardupLive(hashes: DataFrame, hashCol: String,
                                maxHamming: Int, maxBucket: Int,
                                nBands: Int, probeBits: Int): DataFrame = {
    val reps = graft.Caches.track(
      hashes.groupBy(col(hashCol).as("h"))
        .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("m")))
    val banded0 = dropHotBuckets(
      withBandsN(reps, "h", nBands)
        .select(col("rep"), col("h"), col("m"),
          col("band_id"), col("band_val")),
      maxBucket)
    val banded =
      if (probeBits == 0) banded0 else graft.Caches.track(banded0)
    val probe =
      if (probeBits == 0) banded
      else {
        // the flip fan rides the PROBE side only, after the cap; the
        // XOR is symmetric, so expanding one side of the self-join
        // catches every 1-bit-off band pair exactly once per flip
        val width = 64 / nBands
        val flips = lit(0L) +: (0 until width).map(b => lit(1L << b))
        banded.withColumn("__f", explode(array(flips: _*)))
          .select(col("rep"), col("h"), col("m"), col("band_id"),
            col("band_val").bitwiseXOR(col("__f")).as("band_val"))
      }
    probe.as("a").join(banded.as("b"),
        col("a.band_id") === col("b.band_id")
          && col("a.band_val") === col("b.band_val")
          && col("a.rep") < col("b.rep"))
      .select(col("a.rep").as("rep_a"), col("b.rep").as("rep_b"),
        bit_count(col("a.h").bitwiseXOR(col("b.h"))).as("hamming"),
        (col("a.m") * col("b.m")).as("n_doc_pairs"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** INCREMENTAL banded Hamming dedup — the [[incrementalDedup]]
    * corpus-is-prior policy for 64-bit perceptual hashes (image dHash,
    * simhash): the corpus is canonical; a BATCH doc is a duplicate
    * when any corpus doc, or any lower-id batch doc, lies within
    * maxHamming of its hash. Unlike [[hash64Neardup]]'s strictly-near
    * contract, identical hashes COUNT (a dedup decision must flag
    * exact perceptual dups too). Output per batch doc: (doc_id, n_dup
    * distinct prior partners, kept). Requires disjoint doc_id spaces.
    *
    * 100 TB shape: asymmetric by construction — the probe side is
    * batch bands only, so candidates are new×old plus new×lower-new,
    * NEVER old×old; the corpus contributes one linear pass over its
    * (precomputed, staged) hash table. The daily-batch cost scales
    * with the batch.
    *
    * TWO LANES (VERDICT r15 #1): an EXACT-hash lane (equi-join on the
    * full 64-bit hash — linear, output-sized, never capped) guarantees
    * every exact perceptual dup is flagged regardless of gating; the
    * BAND lane finds the strictly-near partners and carries the
    * [[dropHotBuckets]] occupancy cap (computed over corpus ∪ batch
    * bands so both sides agree). `bandCol`, if given, names a boolean
    * column on BOTH inputs restricting band participation — the image
    * path passes the `image_quality` contrast gate, so flat images
    * (the structurally-hot near-zero dHash mass) route to exact-hash
    * dedup, where they belong, and still receive a verdict.
    *
    * `nBands` is the SAME recall/fan-out dial [[hash64Neardup]] has
    * (VERDICT r16 #1): continuous ingestion is where near-dup
    * admission matters most, so the incremental lane must be able to
    * ride the measured-better geometry — 8×8-bit banding holds
    * 885 714 ppm recall at Hamming 12 where 4×16 holds 71 428
    * ([[hash64BandRecallCurve]] at both geometries). The occupancy
    * cap applies per-geometry: 8-bit bands are 256× hotter under
    * uniform hashing, so the cap binds earlier — size it as
    * c·E[occupancy] for the chosen width (the default 64 is ~64× the
    * uniform expectation at fixture scale for BOTH widths; at corpus
    * scale recompute E = n/2^(64/nBands) per band). `probeBits` is
    * the [[hash64Neardup]] 1-bit band multi-probe dial — continuous
    * ingestion at a deep admission threshold (Hamming > 12) should
    * arm it rather than narrow the bands further (see the measured
    * matrix in the batch op's scaladoc). */
  def hash64NeardupInc(corpusHashes: DataFrame, batchHashes: DataFrame,
                       hashCol: String, maxHamming: Int = 6,
                       maxBucket: Int = 64,
                       bandCol: Option[String] = None,
                       nBands: Int = 4, probeBits: Int = 0): DataFrame = {
    require(probeBits == 0 || probeBits == 1,
      s"probeBits is 0 (exact banding) or 1 (1-bit multi-probe), " +
        s"got $probeBits")
    def sel(df: DataFrame, isNew: Boolean): DataFrame =
      df.select(col("doc_id"), col(hashCol).as("h"),
        bandCol.map(col).getOrElse(lit(true)).as("__band"),
        lit(isNew).as("__new"))
    val bSel = graft.Caches.track(sel(batchHashes, isNew = true))
    val all = sel(corpusHashes, isNew = false).unionByName(bSel)
    val priorOf = (a: String, b: String) =>
      !col(s"$b.__new") || col(s"$b.doc_id") < col(s"$a.doc_id")
    // exact lane: every batch doc vs every prior row on hash EQUALITY
    val exact = bSel.as("a").join(all.as("b"),
        col("a.h") === col("b.h") && priorOf("a", "b"))
      .select(col("a.doc_id").as("doc_id"), col("b.doc_id").as("__prior"))
    // band lane: band-eligible rows only, hot buckets dropped
    val bandAll = graft.Caches.track(dropHotBuckets(
      withBandsN(all.filter(col("__band")).drop("__band"), "h", nBands),
      maxBucket))
    // probeBits = 1: the same post-cap probe-side flip fan the batch
    // op documents — already asymmetric here (the batch side IS the
    // probe side), so the fan multiplies only the batch bands
    val bandNew = {
      val bn = bandAll.filter(col("__new"))
      if (probeBits == 0) bn
      else {
        val width = 64 / nBands
        val flips = lit(0L) +: (0 until width).map(b => lit(1L << b))
        bn.withColumn("__f", explode(array(flips: _*)))
          .select(col("doc_id"), col("h"), col("__new"), col("band_id"),
            col("band_val").bitwiseXOR(col("__f")).as("band_val"))
      }
    }
    val near = bandNew.as("a")
      .join(bandAll.as("b"),
        col("a.band_id") === col("b.band_id")
          && col("a.band_val") === col("b.band_val")
          && priorOf("a", "b"))
      .filter(bit_count(col("a.h").bitwiseXOR(col("b.h"))) <= maxHamming)
      .select(col("a.doc_id").as("doc_id"), col("b.doc_id").as("__prior"))
    val dups = exact.unionByName(near).distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("n_dup"))
    batchHashes.select(col("doc_id"))
      .join(dups, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"))
      .withColumn("kept", col("n_dup") === 0L)
  }

  /** Banding-recall evaluator for the 64-bit perceptual path
    * (VERDICT r15 #4 — the [[minhashEval]]/ann_recall discipline
    * pointed at [[hash64Neardup]]): over a deterministic doc SAMPLE,
    * brute-force TRUTH = all distinct-hash pairs with
    * 1 ≤ Hamming ≤ maxHamming, CANDIDATES = the production band join
    * (4×16-bit bands WITH the occupancy cap) on the same sample; the
    * one-row report is tp/fn + recall ppm. 4 bands do NOT guarantee a
    * collision at Hamming ≤ 12 (12 flips can straddle all four), so
    * the production dial's recall is a number to MEASURE, not assume.
    *
    * Scale shape: the truth join is the evaluator's deliberate
    * brute-force tier and therefore runs on a hash-sampled slice
    * (1/sampleMod of docs — broadcast nested loop over ~n/sampleMod
    * distinct hashes, the documented sample-run class shared with the
    * vector evaluators); the candidate side is the ordinary capped
    * band join. Output: 1 row (n_truth, tp, fn, recall_ppm). */
  def hash64BandRecall(hashes: DataFrame, hashCol: String,
                       maxHamming: Int = 12, maxBucket: Int = 64,
                       sampleMod: Int = 64,
                       nBands: Int = 4): DataFrame = {
    val sample = graft.Caches.track(
      hashes.filter(PortableHash.hash32(
          concat(lit("ibr:"), col("doc_id").cast("string")))
          % sampleMod === 0)
        .select(col(hashCol).as("h")).distinct())
    val truth = sample.as("a").join(broadcast(sample.as("b")),
        col("a.h") < col("b.h"))
      .select(col("a.h").as("ha"), col("b.h").as("hb"),
        bit_count(col("a.h").bitwiseXOR(col("b.h"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
    val banded = dropHotBuckets(
      withBandsN(sample, "h", nBands).select(col("h"), col("band_id"),
        col("band_val")),
      maxBucket)
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band_id") === col("b.band_id")
          && col("a.band_val") === col("b.band_val")
          && col("a.h") < col("b.h"))
      .select(col("a.h").as("ha"), col("b.h").as("hb"))
      .distinct()
    truth.join(cand.withColumn("__c", lit(1L)), Seq("ha", "hb"), "left")
      .agg(count(lit(1)).as("n_truth"),
        coalesce(sum(when(col("__c").isNotNull, 1L).otherwise(0L)),
          lit(0L)).as("tp"),
        coalesce(sum(when(col("__c").isNull, 1L).otherwise(0L)),
          lit(0L)).as("fn"))
      .select(col("n_truth"), col("tp"), col("fn"),
        expr("(1000000 * tp) div greatest(n_truth, 1)").as("recall_ppm"))
      .orderBy("n_truth")
  }

  /** Banding-recall CURVE by PLANTED PROBES — the [[hash64BandRecall]]
    * question asked with controlled truth density: real corpus truth
    * at Hamming ≤ 12 is vanishingly rare on high-entropy fixtures
    * (measured: 2 pairs in the WHOLE sf0.01 corpus, 0 in any sample),
    * so this evaluator manufactures the near-dups. For each sampled
    * corpus hash and each distance d, flip d DETERMINISTIC distinct
    * bit positions (rank the 64 positions by a salted hash, take d)
    * and probe the PRODUCTION capped band index with the perturbed
    * copy: hit ⟺ the probe still shares a surviving band with its
    * source. Output one row per d: (d, n_planted, n_hit, recall_ppm)
    * — the curve that says how far a near-dup can drift before the
    * 4×16-band dial loses it, at any corpus scale.
    *
    * Scale shape: probes ∝ sample × |dists|; the position ranking is a
    * 64-way explode over the sample with one (doc, d) window; the hit
    * test is the ordinary capped band equi-join keyed back to the
    * source doc. */
  def hash64BandRecallCurve(hashes: DataFrame, hashCol: String,
                            dists: Seq[Int] = Seq(2, 4, 6, 8, 10, 12),
                            maxBucket: Int = 64,
                            sampleMod: Int = 8,
                            nBands: Int = 4): DataFrame = {
    // probe construction staged (r19 optimization): the sample ×
    // |dists| × 64-position rank explode is the instrument's planted
    // truth side — stored once; the production band index probe join
    // stays live per call
    val probes = graft.Caches.track(
      graft.Stage.parquet(hashes.sparkSession,
        graft.Stage.key(hashes, "ibr_probes", hashCol,
          dists.mkString("_"), sampleMod)) {
        val sample = hashes.filter(PortableHash.hash32(
            concat(lit("ibr:"), col("doc_id").cast("string")))
            % sampleMod === 0)
          .select(col("doc_id"), col(hashCol).as("h"))
        sample
          .withColumn("d", explode(array(dists.map(lit(_)): _*)))
          .withColumn("p", explode(sequence(lit(0), lit(63))))
          .withColumn("__rk", row_number().over(
            Window.partitionBy("doc_id", "d").orderBy(
              PortableHash.hash32(concat_ws(":", lit("ibrf"),
                col("doc_id"), col("d"), col("p"))), col("p"))))
          .filter(col("__rk") <= col("d"))
          .groupBy("doc_id", "d", "h")
          .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), p)")).as("__mask"))
          .select(col("doc_id"), col("d"),
            col("h").bitwiseXOR(col("__mask")).as("h"))
      })
    val corpusBands = dropHotBuckets(
      withBandsN(hashes.select(col("doc_id"), col(hashCol).as("h")), "h",
          nBands)
        .select(col("doc_id"), col("band_id"), col("band_val")),
      maxBucket)
    val hits = withBandsN(probes, "h", nBands).as("a")
      .join(corpusBands.as("b"),
        col("a.band_id") === col("b.band_id")
          && col("a.band_val") === col("b.band_val")
          && col("a.doc_id") === col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id"), col("a.d").as("d"))
      .distinct()
      .groupBy("d").agg(count(lit(1)).as("n_hit"))
    probes.groupBy("d").agg(count(lit(1)).as("n_planted"))
      .join(hits, Seq("d"), "left")
      .select(col("d").cast("long").as("d"), col("n_planted"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .withColumn("recall_ppm",
        expr("(1000000 * n_hit) div greatest(n_planted, 1)"))
      .orderBy("d")
  }

  /** The banding GEOMETRY × MULTI-PROBE decision matrix (VERDICT r17
    * #1 — the [[hash64BandRecallCurve]] instrument asked across every
    * geometry at once, plus the `ann_lsh_multiprobe` move applied to
    * band values): ONE set of planted probes (per sampled doc and
    * distance d, flip d deterministic distinct bit positions) is
    * pushed through the PRODUCTION capped band index at each `nBands`
    * geometry, and each (geometry, d) cell reports TWO recalls —
    * `recall_ppm` for the exact band equi-join the batch self-join
    * runs, and `recall_mp_ppm` for 1-bit band multi-probe (the probe
    * side also offers every single-bit flip of each band value, so a
    * pair whose closest band differs by exactly one bit still
    * collides). The table that DECIDES a lane's shipped geometry: for
    * the sign-code lanes it shows 16×4-bit banding is occupancy-DEAD
    * at corpus scale (4-bit band values have 16 distinct buckets, so
    * E[occupancy] = n/16 crosses any sane cap) while 8×8 + multi-probe
    * recovers what plain 8×8 leaves behind. Run on the dHash lane
    * (r19, `image_band_recall_matrix`, sf0.1): same verdict with a
    * skew twist — 16×4 reads 124k ppm at d=12 (hot but not dead:
    * dHash values skew, some 4-bit buckets stay cold), exact 8×8
    * 496k, 8×8+mp1 909k — so the image lanes ship 8×8 probeBits=1.
    * BOTH lanes' sf0.01 columns flatter every geometry (16×4 reads
    * 1 000 000 there); only the two-SF reading is a decision.
    *
    * Scale shape: probes ∝ sample × |dists|; the multi-probe expansion
    * multiplies the PROBE side only by (1 + 64/nBands); every hit test
    * is the capped band equi-join keyed back to the source doc — the
    * corpus side is banded once per geometry, never self-joined. */
  def hash64BandRecallMatrix(hashes: DataFrame, hashCol: String,
                             dists: Seq[Int] = Seq(8, 12, 16, 20),
                             maxBucket: Int = 64,
                             sampleMod: Int = 8,
                             geometries: Seq[Int] = Seq(4, 8, 16))
      : DataFrame = {
    val ds = dists.distinct
    // probe construction staged (r19 optimization — see
    // hash64BandRecallCurve; per-geometry banding + probe join stay
    // live, the corpus side is banded once per geometry per call)
    val probes = graft.Caches.track(
      graft.Stage.parquet(hashes.sparkSession,
        graft.Stage.key(hashes, "bmr_probes", hashCol,
          ds.mkString("_"), sampleMod)) {
        val sample = hashes.filter(PortableHash.hash32(
            concat(lit("bmr:"), col("doc_id").cast("string")))
            % sampleMod === 0)
          .select(col("doc_id"), col(hashCol).as("h"))
        sample
          .withColumn("d", explode(array(ds.map(lit(_)): _*)))
          .withColumn("p", explode(sequence(lit(0), lit(63))))
          .withColumn("__rk", row_number().over(
            Window.partitionBy("doc_id", "d").orderBy(
              PortableHash.hash32(concat_ws(":", lit("bmrf"),
                col("doc_id"), col("d"), col("p"))), col("p"))))
          .filter(col("__rk") <= col("d"))
          .groupBy("doc_id", "d", "h")
          .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), p)")).as("__mask"))
          .select(col("doc_id"), col("d"),
            col("h").bitwiseXOR(col("__mask")).as("h"))
      })
    val planted = graft.Caches.track(
      probes.groupBy("d").agg(count(lit(1)).as("n_planted")))
    geometries.distinct.map { g =>
      val width = 64 / g // withBandsN validates the divisor
      val corpusBands = dropHotBuckets(
        withBandsN(hashes.select(col("doc_id"), col(hashCol).as("h")),
            "h", g)
          .select(col("doc_id"), col("band_id"), col("band_val")),
        maxBucket)
      // probe bands, then the multi-probe fan: flip 0 (the exact
      // probe) plus each of the width in-band single-bit flips
      val flips = lit(0L) +: (0 until width).map(b => lit(1L << b))
      val pexp = withBandsN(probes, "h", g)
        .withColumn("__flip", explode(array(flips: _*)))
        .select(col("doc_id"), col("d"), col("band_id"),
          col("band_val").bitwiseXOR(col("__flip")).as("band_val"),
          when(col("__flip") === 0L, 1L).otherwise(0L).as("__ex"))
      val hits = pexp.as("a").join(corpusBands.as("b"),
          col("a.band_id") === col("b.band_id")
            && col("a.band_val") === col("b.band_val")
            && col("a.doc_id") === col("b.doc_id"))
        .groupBy(col("a.doc_id"), col("a.d").as("d"))
        .agg(max(col("a.__ex")).as("__ex"))
        .groupBy("d")
        .agg(sum(col("__ex")).as("n_hit"),
          count(lit(1)).as("n_hit_mp"))
      planted.join(hits, Seq("d"), "left")
        .select(lit(g).cast("long").as("n_bands"),
          col("d").cast("long").as("d"), col("n_planted"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          coalesce(col("n_hit_mp"), lit(0L)).as("n_hit_mp"))
        .withColumn("recall_ppm",
          expr("(1000000 * n_hit) div greatest(n_planted, 1)"))
        .withColumn("recall_mp_ppm",
          expr("(1000000 * n_hit_mp) div greatest(n_planted, 1)"))
    }.reduce(_.unionByName(_))
      .orderBy("n_bands", "d")
  }

  /** q-gram fingerprints of a (doc_id, blk, q) value SEQUENCE — the
    * signal-side analog of text shingling, shared by the audio path
    * ([[graft.multimodal.Multimodal.audioFingerprints]]) and any other
    * per-doc ordered feature stream: windows of `w` consecutive values
    * assemble via lead() on ONE doc-keyed window partitioning, each
    * window hashes through the codegen'd `rolling_hash31` fold over
    * its ':'-joined rendering, distinct per doc. Output ∝ input blocks;
    * one shuffle (the window), no self-join. */
  def qgramFingerprints(blocks: DataFrame, w: Int = 4): DataFrame = {
    require(w >= 2, s"qgramFingerprints needs w >= 2, got $w")
    val wd = Window.partitionBy("doc_id").orderBy("blk")
    val leads = (1 until w).map(i => lead(col("q"), i).over(wd).as(s"q$i"))
    val parts = col("q") +: (1 until w).map(i => col(s"q$i"))
    blocks.select(col("doc_id") +: col("q") +: leads: _*)
      .filter(col(s"q${w - 1}").isNotNull)
      .select(col("doc_id"),
        org.apache.spark.sql.graft.RollingHash31Expr(
          concat_ws(":", parts.map(_.cast("string")): _*)).as("fp"))
      .distinct()
  }

  /** Shared-fingerprint near-dup pairs over ANY (doc_id, fp) table —
    * the posting-list candidate discipline for fingerprint domains
    * (audio q-grams, winnowed text, CDC chunk hashes): docs sharing
    * ≥ minShared fingerprints are near-dups. Identical fingerprint
    * SETS collapse to a multiplicity-stamped min-doc rep first (the
    * [[hash64Neardup]]/[[allPairsJaccard]] exact-dup discipline — a
    * k-cluster of exact dups costs one rep, never k²/2 pairs), and
    * fingerprints hotter than maxDf drop before the self-join (the
    * [[ngramJaccard]] df-cap: a boilerplate fingerprint shared by B
    * docs would contribute B² join rows; near-dup pairs keep their
    * many rare shared fingerprints). Output: rep pairs with the
    * shared count and the doc-pair multiplicity. */
  def fingerprintNeardup(fps: DataFrame, minShared: Long = 4,
                         maxDf: Int = 64): DataFrame = {
    // Staged (r19 optimization): the shared-fingerprint pair list is
    // the candidate-list artifact of the audio/video/CDC lanes — same
    // discipline as minhash_pairs.
    def plan = fingerprintNeardupLive(fps, minShared, maxDf)
    if (fps.isStreaming) plan
    else graft.Stage.parquet(fps.sparkSession,
      graft.Stage.key(fps, "fp_pairs", minShared, maxDf))(plan)
  }

  private def fingerprintNeardupLive(fps: DataFrame, minShared: Long,
                                     maxDf: Int): DataFrame = {
    val sets = fps.groupBy("doc_id")
      .agg(md5(expr("listagg(CAST(fp AS STRING), ' ')" +
        " WITHIN GROUP (ORDER BY fp)").cast("binary")).as("sig"))
    val reps = sets.groupBy("sig")
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("m"))
      .select(col("doc_id"), col("m"))
    val rfp = graft.Caches.track(
      fps.join(reps, "doc_id"))
    val hot = rfp.groupBy("fp").agg(count(lit(1)).as("__df"))
      .filter(col("__df") > maxDf).select("fp")
    val cold = rfp.join(broadcast(hot), Seq("fp"), "left_anti")
    cold.as("a").join(cold.as("b"),
        col("a.fp") === col("b.fp")
          && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("rep_a"), col("b.doc_id").as("rep_b"),
        col("a.m").as("__ma"), col("b.m").as("__mb"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select(col("rep_a"), col("rep_b"), col("n_shared"),
        (col("__ma") * col("__mb")).as("n_doc_pairs"))
  }

  /** Exact-dup STAR EDGES over ANY (doc_id, <key>) table: within each
    * identical-key group, (min-doc rep, member) edges — the doc-level
    * expansion the keep-lowest policy needs after a rep collapse (the
    * [[repStarEdges]] shape, key-generic; feeds the media lane
    * matrix's identical-dhash component). */
  private[graft] def keyStarEdges(df: DataFrame,
                                  keyCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol)
    df.withColumn("__rep", min(col("doc_id")).over(w))
      .filter(col("doc_id") =!= col("__rep"))
      .select(col("__rep").as("doc_a"), col("doc_id").as("doc_b"))
  }

  /** The same discipline at identical fingerprint-SET granularity —
    * the [[fingerprintNeardup]] collapse's sig, expanded back to
    * doc-level star edges. */
  private[graft] def fpSetStarEdges(fps: DataFrame): DataFrame =
    keyStarEdges(
      fps.groupBy("doc_id").agg(md5(expr(
        "listagg(CAST(fp AS STRING), ' ') WITHIN GROUP (ORDER BY fp)")
        .cast("binary")).as("sig")), "sig")

  /** The multi-lane dedup DECISION MATRIX — per source, what each
    * lexical lane would DELETE under the shared keep-lowest-canonical
    * policy, and the union: exact (non-rep members of identical-text
    * groups), minhash (the [[candidateEdges]] doc_b set — the
    * [[dedupKeepList]] drop set), simhash (strictly-near rep pairs'
    * doc_b plus the same exact-dup star edges, so both near lanes
    * share doc-level semantics). [[dedupMethodAgreement]] reports how
    * much the PAIR SETS overlap; this reports what the lanes DO — the
    * table a pipeline reads to decide which lanes earn their cost and
    * how much of each source survives. All three drop sets are
    * doc-keyed distinct frames (candidate-scale); the matrix is three
    * hash left-joins + one sources-sized aggregate.
    *
    * Lane-robustness numbers the matrix reads beside its deletion
    * counts (the [[fingerprintPlantRecall]] instruments, sf0.01,
    * r17): AUDIO re-trims — the CDC lane recovers 942 000–946 000 ppm
    * at EVERY offset {1,3,8,9} while the fixed-q-gram lane recovers
    * 0–2 000 ppm unaligned and 972 000 ppm only at the block-aligned
    * offset 8 (`audio_trim_recall`); VIDEO first-d-frame drops — the
    * frame-hash lane recovers 813 559/788 690 ppm at d=1/2, the
    * scene-signature lane 479 418/446 428 ppm (single-scene clips
    * lose their only signature; multi-scene content re-syncs)
    * (`video_trim_recall`); IMAGE Hamming drift — 8×8 banding holds
    * 885 714 ppm at the production threshold 12 vs 71 428 for 4×16
    * (`image_band_recall_curve8`). */
  def dedupLaneMatrix(docs: DataFrame, maxHamming: Int = 6,
                      maxBucket: Int = 64): DataFrame = {
    val ex = graft.Caches.track(
      repStarEdges(docs).select(col("doc_b").as("doc_id")).distinct()
        .withColumn("__ex", lit(true)))
    val mh = candidateEdges(docs)
      .select(col("doc_b").as("doc_id")).distinct()
      .withColumn("__mh", lit(true))
    val sh = simhashPairs(docs, maxHamming, maxBucket)
      .select(col("doc_b").as("doc_id"))
      .unionByName(ex.select("doc_id"))
      .distinct().withColumn("__sh", lit(true))
    docs.select(col("doc_id"), col("source"))
      .join(ex, Seq("doc_id"), "left")
      .join(mh, Seq("doc_id"), "left")
      .join(sh, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__ex"), 1L).otherwise(0L)).as("drop_exact"),
        sum(when(col("__mh"), 1L).otherwise(0L)).as("drop_minhash"),
        sum(when(col("__sh"), 1L).otherwise(0L)).as("drop_simhash"),
        sum(when(col("__ex") || col("__mh") || col("__sh"), 1L)
          .otherwise(0L)).as("drop_any"))
      .withColumn("kept", col("n_docs") - col("drop_any"))
  }

  /** minShared threshold sweep over the shared-fingerprint pair list
    * — the [[dedupThresholdSweep]] discipline pointed at fingerprint
    * domains (audio q-grams, frame hashes, CDC chunks): how many rep
    * pairs (and the doc pairs they stand for) survive each dial, from
    * ONE pair-list materialization at minShared = 1 (tracked,
    * candidate-scale — the sweep re-aggregates, it never re-joins).
    * Zero-preserving so a dial past the cliff still prints its row —
    * the table that turns "minShared 4 gives 13 pairs, 2 gives 7 770"
    * from a notes measurement into a gated output. */
  def fingerprintSweep(fps: DataFrame,
                       threshes: Seq[Long] = Seq(1L, 2L, 4L, 8L),
                       maxDf: Int = 64): DataFrame = {
    // a repeated dial would duplicate its output row AND its
    // aggregation key (ADVICE r16 #3) — the sweep is over the SET
    val ths = threshes.distinct
    val pairs = graft.Caches.track(
      fingerprintNeardup(fps, minShared = 1, maxDf = maxDf))
    val th = fps.sparkSession.range(1)
      .select(explode(array(ths.map(lit): _*)).as("thresh"))
    val agg = pairs
      .select(explode(array(ths.map(lit): _*)).as("thresh"),
        col("n_shared"), col("n_doc_pairs"))
      .filter(col("n_shared") >= col("thresh"))
      .groupBy("thresh")
      .agg(count(lit(1)).as("n_rep_pairs"),
        sum("n_doc_pairs").as("__ndp"))
    th.join(agg, Seq("thresh"), "left")
      .select(col("thresh"),
        coalesce(col("n_rep_pairs"), lit(0L)).as("n_rep_pairs"),
        coalesce(col("__ndp"), lit(0L)).as("n_doc_pairs"))
  }

  /** Planted-variant recall evaluator for FINGERPRINT lanes (VERDICT
    * r16 #4 — the image_band_recall discipline pointed at posting
    * joins): `variants` holds, per (doc_id, d), the fingerprint set
    * of a deterministically perturbed copy of doc_id (an audio
    * re-trim at offset d, a d-frame video drop); the planted pair
    * (doc, variant) is RECOVERED when the two share ≥ minShared
    * fingerprints after the production df-cap — computed on the
    * ORIGINAL posting table, i.e. the staged artifact a production
    * probe joins against. CAP CONVENTION (ADVICE r17 #2): the df-cap
    * here is over the RAW posting table, matching
    * [[fingerprintNeardupInc]]'s incremental-probe convention — the
    * lane a trimmed re-arrival actually hits; [[fingerprintNeardup]]'s
    * batch lane caps df on REP-COLLAPSED postings, so when exact-dup
    * clusters inflate a fingerprint's raw df past maxDf while its
    * collapsed df stays under, this instrument understates the batch
    * lane (and exactly measures the incremental one). Output per d: planted count, recovered
    * count, recall ppm, stamped with the lane name so the A/B unions
    * into one decision table. Docs whose perturbed stream yields no
    * fingerprint at all drop out of the planted set (the instrument
    * measures the JOIN's recall, not the fingerprinter's coverage).
    * Candidate-scale: one df aggregate, one (doc_id, fp) equi-join —
    * the variant probes its OWN original only, never the corpus. */
  def fingerprintPlantRecall(fps: DataFrame, variants: DataFrame,
                             minShared: Long, maxDf: Int,
                             lane: String): DataFrame = {
    val hot = fps.groupBy("fp").agg(count(lit(1)).as("__df"))
      .filter(col("__df") > maxDf).select("fp")
    val cold = fps.join(broadcast(hot), Seq("fp"), "left_anti")
    val nsh = variants.join(cold, Seq("doc_id", "fp"))
      .groupBy("doc_id", "d").agg(count(lit(1)).as("__n"))
    variants.select("doc_id", "d").distinct()
      .join(nsh, Seq("doc_id", "d"), "left")
      .groupBy("d")
      .agg(count(lit(1)).as("n_planted"),
        sum(when(coalesce(col("__n"), lit(0L)) >= minShared, 1L)
          .otherwise(0L)).as("n_hit"))
      .select(lit(lane).as("lane"), col("d").cast("long").as("d"),
        col("n_planted"), col("n_hit"),
        expr("(1000000 * n_hit) div greatest(n_planted, 1)")
          .as("recall_ppm"))
  }

  /** INCREMENTAL shared-fingerprint dedup — the [[incrementalDedup]]
    * corpus-is-prior policy for fingerprint domains (audio q-grams,
    * CDC chunks, winnowed text), completing the incremental triad
    * beside [[substringDedupInc]] (spans) and [[hash64NeardupInc]]
    * (perceptual hashes): a BATCH doc is a duplicate when it shares
    * ≥ minShared fingerprints with any corpus doc or any lower-id
    * batch doc. No set collapse (a dedup verdict wants every batch doc
    * judged); the df-cap drops boilerplate fingerprints computed over
    * corpus ∪ batch so both sides agree on the fp domain. Output per
    * batch doc: (doc_id, n_dup distinct prior partners, kept).
    * Requires disjoint doc_id spaces.
    *
    * 100 TB shape: the probe side is batch postings only — candidates
    * are new×old plus new×lower-new, never old×old; the corpus
    * contributes one linear pass over its (staged) fingerprint table. */
  def fingerprintNeardupInc(corpusFps: DataFrame, batchFps: DataFrame,
                            minShared: Long = 4,
                            maxDf: Int = 64): DataFrame = {
    val bNew = graft.Caches.track(
      batchFps.select(col("doc_id"), col("fp"))
        .withColumn("__new", lit(true)))
    val all = corpusFps.select(col("doc_id"), col("fp"))
      .withColumn("__new", lit(false))
      .unionByName(bNew)
    val hot = all.groupBy("fp").agg(count(lit(1)).as("__df"))
      .filter(col("__df") > maxDf).select("fp")
    val cold = all.join(broadcast(hot), Seq("fp"), "left_anti")
    val coldNew = bNew.join(broadcast(hot), Seq("fp"), "left_anti")
    val dups = coldNew.as("a").join(cold.as("b"),
        col("a.fp") === col("b.fp")
          && (!col("b.__new") || col("b.doc_id") < col("a.doc_id")))
      .groupBy(col("a.doc_id").as("doc_id"),
        col("b.doc_id").as("__prior"))
      .agg(count(lit(1)).as("__n_shared"))
      .filter(col("__n_shared") >= minShared)
      .groupBy("doc_id").agg(count(lit(1)).as("n_dup"))
    batchFps.select(col("doc_id")).distinct()
      .join(dups, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"))
      .withColumn("kept", col("n_dup") === 0L)
  }

  /** Near-dup pair transitivity audit — the question to answer BEFORE
    * trusting any connected-components cluster keeplist: near-duplicate
    * similarity is NOT transitive (a~b and b~c permit a≁c — chained
    * drift), so component clustering over-merges exactly when this
    * closure rate is low. Counts the open wedges of the candidate-pair
    * graph ((a,b),(b,c) present) and how many close ((a,c) also a
    * pair); closure_ppm near 1e6 ⇒ components ≈ cliques and the
    * keeplist is safe, low ⇒ star-dedup (dedup_clusters_star) or
    * per-pair verification before deletion.
    *
    * Shape: runs entirely on the band-join candidate table (tracked —
    * candidate-scale, bounded by the banding parameters, never corpus²);
    * the hinge self-join + the closing-edge semi-join are the
    * triangle_count shape on that small table; 1 row out. */
  def dupTransitivity(docs: DataFrame): DataFrame = {
    // localCheckpoint, not just persist: the pair table appears SIX
    // times downstream (sym×2 → wedges×2 sides, the closing join, the
    // count), and each occurrence re-embeds the full signature+band
    // lineage — 984 physical-plan lines; truncating it keeps the plan
    // at the candidate-scale subtree (PlansSpec size budget)
    val pairs = minhashPairs(docs).select("doc_a", "doc_b")
      .localCheckpoint()
    val sym = pairs.select(col("doc_a").as("z"), col("doc_b").as("n"))
      .unionByName(pairs.select(col("doc_b").as("z"),
        col("doc_a").as("n")))
    val wedges = graft.Caches.track(
      sym.select(col("z"), col("n").as("a"))
        .join(sym.select(col("z"), col("n").as("c")), Seq("z"))
        .filter(col("a") < col("c")))
    val closed = wedges.join(pairs,
      wedges("a") === pairs("doc_a") && wedges("c") === pairs("doc_b"),
      "leftsemi")
    pairs.agg(count(lit(1)).as("n_pairs"))
      .crossJoin(broadcast(wedges.agg(count(lit(1)).as("n_wedges"))))
      .crossJoin(broadcast(closed.agg(count(lit(1)).as("n_closed"))))
      .select(col("n_pairs"), col("n_wedges"), col("n_closed"),
        expr("(1000000 * n_closed) div greatest(n_wedges, 1)")
          .as("closure_ppm"))
      .orderBy("n_pairs")
  }
}
