package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** §2.4 text analysis: tokenization, term frequency, language ID,
  * quality scoring, fingerprints. */
class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(texts: (Long, String)*) = texts.toDF("doc_id", "text")

  test("tokens: lowercases and drops empty tokens from double spaces") {
    val r = docs((0L, "Hello  World a"))
      .select(TextAnalysis.tokens(col("text"))).as[Seq[String]].head()
    assert(r == Seq("hello", "world", "a"))
  }

  test("charProfile: exact class ppm; rows sum to 1e6; unicode counts once") {
    val d = Seq(
      (1L, "ab 12!é"),     // 7 cp: 2 alpha, 2 digit, 1 space, 1 other, 1 nonascii
      (2L, ""))            // empty: all zero, other absorbs the full 1e6
      .toDF("doc_id", "text")
    val r = TextAnalysis.charProfile(d)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(x => x._1 -> x).toMap
    val (_, n, a, dg, sp, na, ot) = r(1L)
    assert(n == 7L)
    assert(a == 1000000L * 2 / 7 && dg == a && sp == 1000000L / 7)
    assert(na == 1000000L / 7)
    assert(a + dg + sp + na + ot == 1000000L, "classes must sum exactly")
    assert(r(2L) == ((2L, 0L, 0L, 0L, 0L, 0L, 1000000L)))
  }

  test("langConfusion: confusion cells, row shares, und abstention") {
    val d = Seq(
      (1L, "the quick fox is in the den", "en"),  // en detected, en declared
      (2L, "el la de y que un", "en"),            // es detected, en declared
      (3L, "xyzzy plugh qwert", "de"))            // und: no stopword hits
      .toDF("doc_id", "text", "lang")
    val r = TextAnalysis.langConfusion(d)
      .as[(String, String, Long, Long, Boolean)].collect()
      .map(x => (x._1, x._2) -> ((x._3, x._4, x._5))).toMap
    assert(r == Map(
      ("en", "en") -> ((1L, 500000L, false)),
      ("en", "es") -> ((1L, 500000L, true)),
      ("de", "und") -> ((1L, 1000000L, true))))
  }

  test("vocabCoverage: minimal vocab vs a brute-force frequency walk") {
    // Zipf-ish: "a"x8, "b"x4, "c"x4, d..g x1 -> T=20
    val d = docs(
      (0L, "a a a a a a a a"), (1L, "b b b b c c c c"),
      (2L, "d e f g"))
    val got = TextAnalysis.vocabCoverage(d, Seq(40, 50, 90, 100))
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // brute force: counts desc [8,4,4,1,1,1,1]; need=ceil(p*20/100)
    def brute(p: Int): (Long, Long) = {
      val cs = Seq(8L, 4L, 4L, 1L, 1L, 1L, 1L)
      val need = (p * 20L + 99L) / 100L
      var (cum, k) = (0L, 0L)
      val it = cs.iterator
      while (cum < need) { cum += it.next(); k += 1 }
      (k, cum)
    }
    got.foreach { case (p, vs, tc, tot) =>
      assert(tot == 20L)
      assert((vs, tc) == brute(p), s"pct=$p got ($vs,$tc)")
    }
    // spot values: 40% -> need 8 -> 1 term; 50% -> need 10 -> 2 terms;
    // 90% -> need 18 -> 5 terms; 100% -> all 7
    assert(got.map(r => r._1 -> r._2).toMap ==
      Map(40 -> 1L, 50 -> 2L, 90 -> 5L, 100 -> 7L))
  }

  test("termFreq counts terms across documents") {
    val r = TextAnalysis.termFreq(docs((0L, "a b a"), (1L, "b c")))
      .as[(String, Long)].collect().toMap
    assert(r == Map("a" -> 2L, "b" -> 2L, "c" -> 1L))
  }

  test("tokenCounts: whitespace vs BPE-ish tokens vs chars") {
    // "ab 12 c!d" -> ws tokens: [ab, 12, c!d]=3;
    // bpe-ish: [ab],[12],[c],[!],[d]=5; chars=9
    val r = TextAnalysis.tokenCounts(docs((0L, "ab 12 c!d")))
      .select("n_ws_tokens", "n_bpe_tokens", "n_chars")
      .as[(Int, Int, Int)].head()
    assert(r == ((3, 5, 9)))
  }

  test("langId: stopword argmax with deterministic fallback") {
    val r = TextAnalysis.langId(docs(
        (0L, "the cat and the dog is in it"),
        (1L, "el perro y la casa de que un"),
        (2L, "zzz qqq www")))
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    assert(r == Map(0L -> "en", 1L -> "es", 2L -> "und"))
  }

  test("qualityScore: integer component arithmetic") {
    // text "the cat!!" -> toks [the, cat!!]=2 -> len_component 200
    // en stop hits: "the"=1 -> stop_component 10
    // punct: 2 ('!','!') -> penalty 100; score 110; keep false @3000
    val r = TextAnalysis.qualityScore(docs((0L, "the cat!!")))
      .select("len_component", "stop_component", "punct_penalty", "score", "keep")
      .as[(Long, Long, Long, Long, Boolean)].head()
    assert(r == ((200L, 10L, 100L, 110L, false)))
  }

  test("fingerprints: known rolling-hash value, md5 lane nonzero") {
    // (((0*31+'h')*31+'e')...) % 1e9+7 over "hello world" = 204910434
    // (independently computed in DuckDB with the same fold)
    val r = TextAnalysis.fingerprints(docs((0L, "hello world")))
      .select("fp_roll", "fp_md5").as[(Long, Long)].head()
    assert(r._1 == 204910434L)
    assert(r._2 > 0L && r._2 < (1L << 32))
  }

  test("keywordExtract ranks doc-frequent corpus-rare terms first") {
    val d = Seq(
      (1L, "rust rust rust the the"),
      (2L, "the spark"),
      (3L, "the catalyst")).toDF("doc_id", "text")
    val r = TextAnalysis.keywordExtract(d, topN = 1)
      .select("doc_id", "term", "score_micro")
      .as[(Long, String, Long)].collect().map(t => t._1 -> t._2).toMap
    // 'the' appears in all 3 docs (df 3); content words have df 1
    assert(r == Map(1L -> "rust", 2L -> "spark", 3L -> "catalyst"))
  }

  test("corpusStats aggregates per language with integer averages") {
    val d = Seq(
      (1L, "one two three", "en"), (2L, "four five", "en"),
      (3L, "uno", "es"))
      .toDF("doc_id", "text", "lang")
    val r = TextAnalysis.corpusStats(d)
      .select("lang", "n_docs", "total_tokens", "max_tokens", "avg_chars")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    assert(r("en") == ((2L, 5L, 3L, (13L + 9L) / 2)))
    assert(r("es") == ((1L, 1L, 1L, 3L)))
  }

  test("repeatedNgrams: dup fraction of a cyclic doc; short docs score 0") {
    val d = Seq(
      // 9 tokens -> 7 trigrams, only 3 distinct (a b c / b c a / c a b)
      (1L, "a b c a b c a b c"),
      (2L, "all distinct words in this doc"), // 4 trigrams, 4 distinct
      (3L, "hi"))                             // <3 tokens: total=1, dup=0
      .toDF("doc_id", "text")
    val r = TextAnalysis.repeatedNgrams(d)
      .select("doc_id", "total_ngrams", "distinct_ngrams", "dup_milli")
      .as[(Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(r(1L) == ((7L, 3L, 571L))) // 1000*4/7
    assert(r(2L) == ((4L, 4L, 0L)))
    assert(r(3L) == ((1L, 1L, 0L)))
  }

  test("heavyHitters: CMS estimate >= exact for EVERY term; top-N exact counts") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // probe every term of the vocabulary, not just the query's top-N
    val vocabSize = TextAnalysis.termFreq(d).count().toInt
    val r = TextAnalysis.heavyHitters(d, topN = vocabSize)
      .select("rank", "term", "cnt", "est_ge_true", "est_within_eps")
      .as[(Int, String, Long, Boolean, Boolean)].collect()
    assert(r.length == vocabSize)
    assert(r.forall(_._4), "CMS one-sided error: estimate must never undercount")
    assert(r.forall(_._5), "estimate exceeded the eps*total bound")
    // exact counts agree with the independent termFreq aggregate
    val tf = TextAnalysis.termFreq(d).as[(String, Long)].collect().toMap
    assert(r.forall { case (_, t, c, _, _) => tf(t) == c })
    // ranks are count-descending with term tiebreak
    val sorted = r.sortBy(_._1).map(x => (-x._3, x._2)).toSeq
    assert(sorted == sorted.sorted, "rank order must be cnt desc, term asc")
    Caches.releaseAll()
  }

  test("CmsBuildAgg: weighted build is byte-identical to unit adds") {
    import org.apache.spark.sql.graft.CmsBuildAgg
    // (term, cnt) folded with one weighted add per term must serialize
    // to EXACTLY the sketch the built-in produces over the stream with
    // each term repeated cnt times — counters and totalCount are pure
    // sums, so the wire bytes can't differ
    val tf = Seq(("alpha", 5L), ("beta", 3L), ("gamma", 1L),
      ("delta", 400L), ("epsilon", 17L)).toDF("term", "cnt")
    val weighted = tf
      .agg(CmsBuildAgg(col("term"), col("cnt"), 0.005, 0.99, 42).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    val unit = tf
      .select(explode(expr("transform(sequence(1, cnt), x -> term)")).as("term"))
      .agg(expr("count_min_sketch(term, CAST(0.005 AS DOUBLE), " +
        "CAST(0.99 AS DOUBLE), 42)").as("sk"))
      .head().getAs[Array[Byte]]("sk")
    assert(java.util.Arrays.equals(weighted, unit),
      "weighted CMS build diverged from the built-in unit-add sketch")
    // partition-layout invariance: merges are commutative integer adds
    val weighted7 = tf.repartition(7)
      .agg(CmsBuildAgg(col("term"), col("cnt"), 0.005, 0.99, 42).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    assert(java.util.Arrays.equals(weighted, weighted7),
      "sketch must be layout-invariant")
  }

  test("unigramSurprisal: hand-computed whole-bit scores; band verdict") {
    // corpus: "a a a a" + "a b" -> vocab a=5, b=1, T=6
    // bits(a) = floor(log2(6 div 5 = 1)) = 0
    // bits(b) = floor(log2(6 div 1 = 6)) = 2   (bin(6)='110')
    // doc 0: (4·0·1000) div 4 = 0 milli; doc 1: (0+1·2·1000) div 2 = 1000
    val r = TextAnalysis
      .unigramSurprisal(docs((0L, "a a a a"), (1L, "a b")),
        keepLoMilli = 500, keepHiMilli = 1500)
      .select("doc_id", "n_tokens", "surprisal_milli", "keep")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(r == Seq((0L, 4L, 0L, false), (1L, 2L, 1000L, true)))
  }

  test("unigramSurprisal: rarer tokens always score higher (Zipf corpus)") {
    // doc k repeats token t_k 2^k times -> c(t_k) doubles each step, so
    // surprisal strictly decreases with k (rarer token = more bits)
    val corpus = (0 until 5).map(k => (k.toLong, (s"t$k " * (1 << k)).trim))
    val r = TextAnalysis.unigramSurprisal(docs(corpus: _*))
      .select("doc_id", "surprisal_milli")
      .as[(Long, Long)].collect().sortBy(_._1).map(_._2).toSeq
    assert(r == r.sorted.reverse && r.distinct.size == r.size,
      s"surprisal must strictly decrease with token frequency: $r")
  }

  test("bigramSurprisal: detects word salad that unigram scoring cannot") {
    // A and B have IDENTICAL unigram multisets (3×a, 3×b) — only the
    // ORDER differs. Hand-computed model over the 2-doc corpus:
    //   bigram vocab: 'a b'=3, 'b a'=3, 'b b'=2, 'a a'=2
    //   prefix totals: a→5, b→5
    //   bits: 'a b'/'b a' = log2(5 div 3 = 1) = 0; 'b b'/'a a' = 1
    //   A: 5 bigrams all 0 bits → 0 milli
    //   B: bb,bb,ba,aa,aa → 4 bits / 5 → 800 milli
    val d = docs((0L, "a b a b a b"), (1L, "b b b a a a"))
    val uni = TextAnalysis.unigramSurprisal(d)
      .select("doc_id", "surprisal_milli")
      .as[(Long, Long)].collect().toMap
    assert(uni(0L) == uni(1L), "unigram scoring is blind to order")
    val bi = TextAnalysis.bigramSurprisal(d)
      .select("doc_id", "n_bigrams", "surprisal_milli")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3)))
      .toMap
    assert(bi == Map(0L -> ((5L, 0L)), 1L -> ((5L, 800L))),
      s"hand-computed conditional bits: $bi")
  }

  test("pmiPhrases: hand-computed integer lift, ordering, min-count pruning") {
    // corpus bigrams: d0 'a b a b' → ab, ba, ab; d1 'c d' → cd
    //   vocab: ab=2, ba=1, cd=1; W=4
    //   first-word marginals: a→2, b→1, c→1; second: b→2, a→1, d→1
    //   lift(ab) = 2·4/(2·2) = 2 → 1 bit; lift(ba) = lift(cd) = 4 → 2 bits
    val d = docs((0L, "a b a b"), (1L, "c d"))
    val all = TextAnalysis.pmiPhrases(d, minCount = 1L, topN = 10)
      .as[(String, Long, Long)].collect().toList
    assert(all == List(("b a", 1L, 2L), ("c d", 1L, 2L), ("a b", 2L, 1L)),
      s"bits desc, count desc, phrase asc: $all")
    val pruned = TextAnalysis.pmiPhrases(d, minCount = 2L, topN = 10)
      .as[(String, Long, Long)].collect().toList
    assert(pruned == List(("a b", 2L, 1L)), s"min-count prunes the tail: $pruned")
  }

  test("bigramSurprisal: sub-2-token docs yield no bigrams, no rows") {
    val r = TextAnalysis.bigramSurprisal(
        docs((0L, "solo"), (1L, ""), (2L, "two words")))
      .select("doc_id").as[Long].collect().toSeq
    assert(r == Seq(2L))
  }

  test("bm25Rank: rare-term matches beat common-term matches; saturation caps tf") {
    val d = Seq(
      (1L, "spark spark spark spark spark spark spark spark"), // tf-spam
      (2L, "spark join other words here"),   // both terms, short doc
      (3L, "join and more text"),            // common term only
      (4L, "join stuff padding words"),      // common term only
      (5L, "nothing relevant at all")).toDF("doc_id", "text")
    val r = TextAnalysis.bm25Rank(d, Seq("spark", "join"), topN = 5)
      .select("rank", "doc_id", "score_micro")
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    val scores = r.map(t => t._2 -> t._3).toMap
    // the two spark-matching docs (rare term, df 2) occupy the top —
    // rare-term matches outweigh common-term-only matches (df 3)
    assert(r.take(2).map(_._2).toSet == Set(1L, 2L))
    assert(scores(2L) > scores(3L) && scores(2L) > scores(4L))
    // tf saturation: 8x the term frequency buys well under 2x the
    // score of a single occurrence (a tf-linear scorer would give ~5x)
    assert(scores(1L) < 2 * scores(2L), "saturation caps tf spam")
    assert(r.map(_._3).toSeq == r.map(_._3).sortBy(-_).toSeq,
      "ranks are score-descending")
    // every doc present (topN covers corpus), zero-match doc scores 0
    assert(r.length == 5 && scores(5L) == 0L)
    Caches.releaseAll()
  }

  test("stutterTrim: removes only ADJACENT duplicates, keeps counts") {
    val r = TextAnalysis.stutterTrim(
      docs((1L, "the the cat cat cat sat the"), (2L, "a b a b")))
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect()
    // doc 1: 7 tokens, "the cat sat the" kept (non-adjacent "the" stays)
    assert(r(0) == ((1L, 7L, 4L, 3L, "the cat sat the")))
    // doc 2: alternating pattern has no adjacent dup - identity
    assert(r(1) == ((2L, 4L, 4L, 0L, "a b a b")))
  }

  test("trigramSurprisal: repeated trigram costs 0 bits, unseen context splits") {
    // "a b c a b c": trigrams abc, bca, cab, abc - each prefix count
    // equals each trigram count except (a b)->c appears 2/2 = 1 -> 0 bits
    val r = TextAnalysis.trigramSurprisal(docs((1L, "a b c a b c")))
      .as[(Long, Long, Long)].head()
    assert(r._2 == 4L)            // 4 trigram instances
    assert(r._3 == 0L)            // every trigram fully predicted by its prefix
    Caches.releaseAll()
  }

  test("trigramSurprisal: docs under 3 tokens contribute no rows") {
    val r = TextAnalysis.trigramSurprisal(
      docs((1L, "a b"), (2L, "x y z")))
      .as[(Long, Long, Long)].collect()
    assert(r.map(_._1).toSeq == Seq(2L))
    Caches.releaseAll()
  }

  test("langIdChargram: separable bilingual corpus classifies cleanly") {
    val d = Seq(
      (1L, "the cat and the dog run there", "en"),
      (2L, "the quick thing went the other way", "en"),
      (3L, "le chat et le chien vont ensemble", "fr"),
      (4L, "le monde est une chose entiere", "fr"))
      .toDF("doc_id", "text", "lang")
    val r = TextAnalysis.langIdChargram(d)
      .as[(String, String, Long)].collect().toSeq
    assert(r == Seq(("en", "en", 2L), ("fr", "fr", 2L)))
    Caches.releaseAll()
  }

  test("langIdChargram: exact score ties break to the smaller lang") {
    // identical docs in two one-doc languages: both profiles equal →
    // every score ties → both predict 'aa'
    val d = Seq((1L, "zzz yyy", "aa"), (2L, "zzz yyy", "bb"))
      .toDF("doc_id", "text", "lang")
    val r = TextAnalysis.langIdChargram(d)
      .as[(String, String, Long)].collect().toSeq
    assert(r == Seq(("aa", "aa", 1L), ("bb", "aa", 1L)))
    Caches.releaseAll()
  }

  test("surprisalMix: rare-token docs land in higher bands, exact shares") {
    // vocab x:4 y:1, T=5 → bits(x)=0, bits(y)=2; doc1 surprisal 0
    // (band 0), doc2 surprisal 2000 milli (band 1); each source has
    // one doc → share 1e6
    val d = Seq((1L, "x x x x", "A"), (2L, "y", "B"))
      .toDF("doc_id", "text", "source")
    val r = TextAnalysis.surprisalMix(d)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq(("A", 0L, 1L, 4L, 1000000L),
      ("B", 1L, 1L, 1L, 1000000L)))
    Caches.releaseAll()
  }

  test("repeatDepth: the doubling ladder finds the longest probed run") {
    // doc1 "a b a b a": repeats at L=1,2 but its two 4-grams are
    // distinct → max 2; doc2 all-distinct → 0; doc3 repeats the
    // 4-token phrase three times → 8-grams repeat (max 8), 16 cannot
    // (too short)
    val d = docs(
      (1L, "a b a b a"),
      (2L, "x y z"),
      (3L, "p q r s p q r s p q r s"))
    val r = TextAnalysis.repeatDepth(d)
      .as[(Long, Long, Long)].collect().toSeq
    assert(r == Seq((0L, 1L, 333333L), (2L, 1L, 333333L),
      (8L, 1L, 333333L)))
  }

  test("knBigram: interpolated KN matches hand-computed ppm lanes") {
    // corpus bigrams: "a b"×2, "b a"×2, "a c", "d b"; B = 4 distinct.
    // "b a": disc = (1e6·5) div 8 = 625000, λ_b = 750000·1 div 2,
    //        pcont_a = 1e6·1 div 4 → 625000 + (375000·250000) div 1e6
    //        = 718750. "a b": 416666 + (500000·500000) div 1e6
    //        = 666666. "d b": 250000 + (750000·500000) div 1e6
    //        = 625000. "a c": 83333 + (500000·250000) div 1e6 = 208333.
    val d = Seq((1L, "a b a b a c"), (2L, "d b")).toDF("doc_id", "text")
    val r = TextAnalysis.knBigram(d, minCount = 1L, topK = 10)
      .as[(String, Long, Long)].collect().toSeq
    assert(r == Seq(("b a", 2L, 718750L), ("a b", 2L, 666666L),
      ("d b", 1L, 625000L), ("a c", 1L, 208333L)))
    Caches.releaseAll()
  }

  test("termChi2: perfect association scores 4e6 ppm; independence 0") {
    // x only in s1 (both docs) → chi² = N = 4 → 4e6 ppm exactly;
    // z once per source → 0; y (3 of 4 docs, skewed 1:2) and w (1 doc)
    // both 4/3 → 1333332 with the per-cell ppm floor.
    val d = Seq((1L, "x y", "s1"), (2L, "x z", "s1"),
      (3L, "y z", "s2"), (4L, "y w", "s2"))
      .toDF("doc_id", "text", "source")
    val r = TextAnalysis.termChi2(d, k = 10, minDf = 1L)
      .as[(String, Long, Long)].collect().toSeq
    assert(r == Seq(("x", 2L, 4000000L), ("w", 1L, 1333332L),
      ("y", 3L, 1333332L), ("z", 2L, 0L)))
    Caches.releaseAll()
  }

  test("zipfFit: perfect power-law ranks produce the expected integer sums") {
    // counts 8,4,2,1 -> y = 3,2,1,0 at ranks 1..4 -> x = 0,1,1,2
    // n=4 sx=4 sy=6 sxy=(0*3+1*2+1*1+2*0)=3 sxx=6
    // num = 4*3-4*6 = -12, den = 4*6-16 = 8, slope = -1.5 -> -1500000 ppm
    val text = Seq.fill(8)("w1") ++ Seq.fill(4)("w2") ++
      Seq.fill(2)("w3") ++ Seq("w4")
    val r = TextAnalysis.zipfFit(docs((1L, text.mkString(" "))), topK = 256)
      .as[(Long, Long, Long, Long)].head()
    assert(r == ((4L, -12L, 8L, -1500000L)))
  }

  test("textrankTerms: star co-occurrence — the hub outranks every " +
    "leaf, exact ppm hand-run") {
    // 4 docs each pairing `hub` with one leaf → star graph, n=5,
    // r0 = 200000. Round 1: hub ← 4·(200000·1e6) → 710000; leaf ←
    // 200000·250000 → 72500. Round 2: hub 276500, leaf 180875
    // (the exact truncating-div choreography of pagerankCore).
    val d = docs((1L, "hub alpha"), (2L, "hub beta"),
      (3L, "hub gamma"), (4L, "hub delta"))
    val r = TextAnalysis.textrankTerms(d, iters = 2, topK = 10,
      minPairCount = 1L).as[(String, Long)].collect().toSeq
    assert(r == Seq(("hub", 276500L), ("alpha", 180875L),
      ("beta", 180875L), ("delta", 180875L), ("gamma", 180875L)))
    Caches.releaseAll()
  }

  test("cmsTopk: width=1 collapses every lane to the corpus total; " +
    "the estimate never undercounts") {
    // exact: a=2, b=2, c=1 (total 5). At width 1 every term's every
    // lane holds the full 5 → est=5 for all; over_ppm is the exact
    // truncating ratio. Ordering: (exact desc, term).
    val d = docs((1L, "a a b"), (2L, "b c"))
    val r = TextAnalysis.cmsTopk(d, lanes = 4, width = 1, topK = 10)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(r == Seq(("a", 2L, 5L, 1500000L), ("b", 2L, 5L, 1500000L),
      ("c", 1L, 5L, 4000000L)))
    Caches.releaseAll()
  }

  test("cmsTopk: a wide sketch resolves a tiny vocabulary exactly; " +
    "one-sided everywhere") {
    val d = docs((1L, "a a b"), (2L, "b c"))
    val r = TextAnalysis.cmsTopk(d, lanes = 4, width = 1 << 20,
      topK = 10).as[(String, Long, Long, Long)].collect().toSeq
    assert(r.forall(t => t._3 >= t._2), "CMS never undercounts")
    // 3 terms across 4 independent 2^20 lanes: no term pair collides
    // in every lane (deterministic md5 — pinned by this run)
    assert(r.forall(t => t._3 == t._2 && t._4 == 0L))
    Caches.releaseAll()
  }

  test("textrankTerms: minPairCount gates the graph; topK truncates " +
    "deterministically") {
    val d = docs((1L, "hub alpha"), (2L, "hub alpha"),
      (3L, "hub beta"))
    // at minPairCount=2 only (alpha, hub) survives → a 2-node graph
    val r = TextAnalysis.textrankTerms(d, iters = 3, topK = 1,
      minPairCount = 2L).as[(String, Long)].collect().toSeq
    assert(r.map(_._1) == Seq("alpha"), "tie broken by term asc")
    assert(r.forall(t => t._2 > 0L && t._2 <= 1000000L))
    Caches.releaseAll()
  }

  test("longestRepeat: known spans, overlap convention, empty/clean docs") {
    val d = docs(
      (0L, "a b a b a"),    // "a b a" at 0 and 2 (overlap) → 3
      (1L, "x y x y x y"),  // "x y x y" at 0 and 2 → 4
      (2L, "a b c"),        // no token repeats → 0
      (3L, "a a a"),        // "a a" at 0 and 1 → 2
      (4L, "solo"),         // single token → 0
      (5L, ""))             // empty → 0
    val r = TextAnalysis.longestRepeat(d).orderBy("doc_id")
      .select("doc_id", "lrs").as[(Long, Int)].collect().toSeq
    assert(r == Seq((0L, 3), (1L, 4), (2L, 0), (3L, 2), (4L, 0), (5L, 0)),
      s"got $r")
  }

  /** Scalar brute force: max L with a duplicated L-gram (overlaps
    * allowed) — the oracle's O(n²) definition. */
  private def bruteLrs(toks: Seq[String]): Int =
    (1 until toks.length).filter { l =>
      val grams = toks.sliding(l).map(_.mkString(" ")).toSeq
      grams.distinct.size < grams.size
    }.maxOption.getOrElse(0)

  test("longestRepeat ≡ brute force; repeatDepth is its ladder floor") {
    val vocab = Seq("a", "b", "c", "d", "e")
    val fixtures = (0 until 30).map { i =>
      val len = 5 + (i * 7) % 36
      val text = (0 until len)
        .map(j => vocab((i * 13 + j * j + j / 3) % vocab.size))
        .mkString(" ")
      (i.toLong, text)
    }
    val d = docs(fixtures: _*)
    val got = TextAnalysis.longestRepeat(d)
      .select("doc_id", "lrs").as[(Long, Int)].collect().toMap
    val want = fixtures.map { case (id, t) =>
      id -> bruteLrs(t.split(" ").toSeq)
    }.toMap
    assert(got == want, s"diff: ${got.toSet diff want.toSet}")
    // cross-op invariant: the doubling probe equals the largest
    // ladder rung ≤ the exact lrs (a repeated lrs-gram contains a
    // repeated L-gram for every L ≤ lrs)
    val ladder = Seq(32, 16, 8, 4, 2, 1)
    val wantHist = want.values
      .map(lrs => ladder.find(_ <= lrs).getOrElse(0).toLong)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val gotHist = TextAnalysis.repeatDepth(d)
      .select("max_rep", "n_docs").as[(Long, Long)].collect().toMap
    assert(gotHist == wantHist, s"got $gotHist want $wantHist")
    Caches.releaseAll()
  }
}
