package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** §2.4 near-dup detection: shingles, minhash LSH candidates, exact
  * jaccard arithmetic, simhash properties. */
class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(texts: (Long, String)*) =
    texts.toDF("doc_id", "text")

  test("shingles: word 3-grams, distinct, ordered source") {
    val r = docs((0L, "a b c d")).select(Dedup.shingles(col("text")))
      .as[Seq[String]].head()
    assert(r.toSet == Set("a b c", "b c d"))
  }

  test("shingles: short text falls back to whole-text shingle") {
    val r = docs((0L, "a b")).select(Dedup.shingles(col("text")))
      .as[Seq[String]].head()
    assert(r == Seq("a b"))
  }

  test("shingles: repeated n-grams deduplicated (set semantics)") {
    val r = docs((0L, "x y x y x y")).select(Dedup.shingles(col("text")))
      .as[Seq[String]].head()
    assert(r.toSet == Set("x y x", "y x y"))
    assert(r.length == 2)
  }

  test("cdcChunks: chunks partition each doc; edits re-align at the next boundary") {
    // deterministic word stream; ~1/16 of distinct words are boundaries
    val words = (0 until 200).map(i => s"w$i")
    val a = words.mkString(" ")
    // insert ONE word near the front of doc B
    val b = (words.take(10) ++ Seq("inserted") ++ words.drop(10))
      .mkString(" ")
    val r = Dedup.cdcChunks(docs((0L, a), (1L, b)))
      .select("doc_id", "chunk_id", "n_words", "chunk_hash", "dup")
      .as[(Long, Long, Long, Long, Boolean)].collect()
    val byDoc = r.groupBy(_._1)
    // chunks partition the doc exactly
    assert(byDoc(0L).map(_._3).sum == 200L, "doc 0 words covered")
    assert(byDoc(1L).map(_._3).sum == 201L, "doc 1 words covered")
    assert(byDoc.values.forall(c =>
      c.map(_._2).sorted.toSeq == (c.map(_._2).min to c.map(_._2).max)),
      "chunk ids contiguous per doc")
    // THE CDC property: the insertion perturbs only the chunk it lands
    // in — every chunk from the next boundary on hashes identically, so
    // the two docs share all but a constant number of chunk hashes
    // (a fixed-window scheme like dupSpans shifts EVERY downstream span)
    val ha = byDoc(0L).map(_._4).toSet
    val hb = byDoc(1L).map(_._4).toSet
    assert(ha.size > 8, s"expect ~12 chunks, got ${ha.size}")
    assert((ha diff hb).size <= 2 && (hb diff ha).size <= 2,
      s"edit must stay local: only the containing chunk may differ " +
        s"(a-only=${(ha diff hb).size}, b-only=${(hb diff ha).size})")
    // shared chunks are marked dup on both sides; unshared ones never
    r.foreach { case (_, _, _, h, dup) =>
      assert(dup == (ha.contains(h) && hb.contains(h)),
        s"dup mark wrong for chunk hash $h")
    }
  }

  test("cdc_neardup composition: an insertion variant still pairs (re-sync)") {
    // the fixed-window lanes (dupSpans, audio/video frames) lose every
    // span downstream of an insertion; CDC chunk boundaries re-sync,
    // so the chunk-sharing near-dup keeps the pair
    val words = (0 until 200).map(i => s"w$i")
    val a = words.mkString(" ")
    val b = (words.take(10) ++ Seq("inserted") ++ words.drop(10))
      .mkString(" ")
    val c = (0 until 200).map(i => s"z$i").mkString(" ") // distinct
    val fps = Dedup.cdcChunks(docs((0L, a), (1L, b), (2L, c)))
      .filter(col("n_words") >= 4)
      .select(col("doc_id"), col("chunk_hash").as("fp")).distinct()
    val pairs = Dedup.fingerprintNeardup(fps, minShared = 2, maxDf = 64)
      .select("rep_a", "rep_b", "n_shared")
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((0L, 1L)))
    assert(pairs.head._3 >= 5, s"expected many re-synced shared chunks: $pairs")
    Caches.releaseAll()
  }

  test("minhashPairs: exact dups collapse to one rep; strictly-near " +
      "reps pair with the doc-pair multiplicity") {
    // VERDICT r15 #2: docs 1/2 are identical TEXT → one rep (m = 2),
    // never a pair (that's textExactDedup's report). Doc 3 has the
    // SAME shingle SET but DIFFERENT text — a deterministic strictly-
    // near rep pair (identical signatures agree on every band),
    // stamped with 2·1 doc pairs. Doc 4 never pairs.
    val t = "a b c a b c a b c"
    val d = docs((1L, t), (2L, t), (3L, t + " a b c"),
      (4L, "completely different words about spark catalyst tungsten"))
    val pairs = Dedup.minhashPairs(d)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs == Set((1L, 3L, 2L)))
    // the k-clique cost claim, directly: 3 exact copies of a text cost
    // ONE rep — zero pairs — where the uncollapsed join paid k²/2
    val dup3 = docs((1L, t), (2L, t), (3L, t),
      (4L, "completely different words about spark catalyst tungsten"))
    assert(Dedup.minhashPairs(dup3).count() == 0L,
      "a pure exact-dup clique must collapse to zero pairs")
    Caches.releaseAll()
  }

  test("allPairsJaccard: hand pair at exactly 500 milli found at " +
    "tau 500, excluded at 600") {
    // shingle sets {abc,bcd,cde} vs {abc,bcd,cdf}: inter 2, union 4
    val d = docs((1L, "a b c d e"), (2L, "a b c d f"),
      (3L, "x y z w v"))
    val r = Dedup.allPairsJaccard(d, tauMilli = 500L)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq((1L, 2L, 2L, 3L, 3L, 500L, 1L)))
    assert(Dedup.allPairsJaccard(d, tauMilli = 600L).isEmpty)
    Caches.releaseAll()
  }

  test("allPairsJaccard: COMPLETE against brute force over rep pairs; " +
    "exact-dup clusters collapse and stamp their multiplicity") {
    val texts = Seq(
      1L -> "a b c d e f g h",
      2L -> "a b c d e f g i",
      3L -> "a b c x y z w v",
      4L -> "p q r s t u",
      5L -> "p q r s t u",      // exact dup of 4 → collapses into it
      6L -> "p q r s t v")      // near-dup of the {4,5} cluster
    val tau = 500L
    val sets = texts.toMap.map { case (k, v) =>
      k -> v.split(" ").sliding(3).map(_.mkString(" ")).toSet }
    val reps = sets.groupBy(_._2).map { case (s, m) =>
      (m.keys.min, s, m.size.toLong) }.toSeq
    val expected = (for {
      (a, sa, ma) <- reps; (b, sb, mb) <- reps if a < b
      inter = (sa & sb).size; uni = (sa | sb).size
      if 1000L * inter / uni >= tau
    } yield (a, b, inter.toLong, ma * mb)).toSet
    val got = Dedup.allPairsJaccard(docs(texts: _*), tauMilli = tau)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(t => (t._1, t._2, t._3, t._7)).toSet
    assert(got == expected, s"got $got expected $expected")
    // the identical-set pair (4,5) must NOT appear — that's the
    // exact-dedup family's report; the (4,6) rep pair carries m=2
    assert(!got.exists(p => p._1 == 4L && p._2 == 5L))
    assert(got.contains((4L, 6L, 3L, 2L)))
    Caches.releaseAll()
  }

  test("dupTransitivity: a 3-clique of strictly-near reps closes every " +
    "wedge; an isolated pair adds no wedge") {
    // three shingle-set-equal DISTINCT texts → a deterministic 3-clique
    // of rep pairs (exact-dup cliques collapse away since r16 and no
    // longer trivially inflate closure); (4,5) an isolated near pair
    val t1 = "a b c a b c a b c"
    val t2 = "x y z x y z x y z"
    val d = docs((1L, t1), (2L, t1 + " a b c"), (3L, t1 + " a b c a b c"),
      (4L, t2), (5L, t2 + " x y z"))
    // pairs: (1,2),(1,3),(2,3) clique + isolated (4,5) → 3 wedges,
    // all closed
    val r = Dedup.dupTransitivity(d)
      .as[(Long, Long, Long, Long)].head()
    assert(r == ((4L, 3L, 3L, 1000000L)))
    Caches.releaseAll()
  }

  test("dupTransitivity: no pairs means no wedges and a zero-floored " +
    "closure") {
    val d = docs((1L, "alpha beta gamma delta epsilon zeta eta"),
      (2L, "one two three four five six seven eight nine"))
    val r = Dedup.dupTransitivity(d)
      .as[(Long, Long, Long, Long)].head()
    assert(r == ((0L, 0L, 0L, 0L)))
    Caches.releaseAll()
  }

  test("ngramJaccard: exact arithmetic on a crafted pair") {
    // shingles1 = {a b c, b c d, c d e}; shingles2 = {a b c, b c d, c d f}
    // inter=2, union=4 -> 500 milli
    val d = docs((1L, "a b c d e"), (2L, "a b c d f"))
    val r = Dedup.ngramJaccard(d, minMilli = 1)
      .select("doc_a", "doc_b", "inter", "na", "nb", "jac_milli")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq((1L, 2L, 2L, 3L, 3L, 500L)))
  }

  test("containmentSim: full quote scores 1000 where Jaccard stays low") {
    // doc 2 = doc 1's text embedded in 4x more material: C(1->2)=1000
    // exactly, while J = na/(nb) stays well under the dup threshold —
    // the asymmetric pair Jaccard-gated dedup structurally misses
    val small = "alpha beta gamma delta epsilon zeta eta theta"
    val filler = (1 to 40).map(i => s"w$i").mkString(" ")
    val d = docs((1L, small), (2L, filler + " " + small))
    val r = Dedup.containmentSim(d, minMilli = 500, maxDf = 5)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(r.size == 1)
    val (da, db, inter, na, nb, ca, cb, inner) = r.head
    assert((da, db) == ((1L, 2L)))
    assert(inter == na && ca == 1000L, "small side fully contained")
    assert(cb == 1000L * inter / nb && cb < 200L)
    assert(inner == 1L, "the contained (droppable) side is the small doc")
    // the symmetric law on the same candidate path scores it far lower
    val j = Dedup.ngramJaccard(d, minMilli = 1, maxDf = 5)
      .select("jac_milli").as[Long].head()
    assert(j < 200L, s"jaccard $j should stay low on a 1:5 size ratio")
  }

  test("containmentSim: identical docs tie -> inner_doc is the lower id") {
    val d = docs((7L, "a b c d e"), (9L, "a b c d e"))
    val r = Dedup.containmentSim(d, minMilli = 500, maxDf = 5)
      .select("cont_a_milli", "cont_b_milli", "inner_doc")
      .as[(Long, Long, Long)].collect().toSeq
    assert(r == Seq((1000L, 1000L, 7L)))
  }

  test("containmentSim: df-capped shingles drop out of BOTH inter and sizes") {
    // "x y z" appears in 7 docs (> maxDf=5) -> removed everywhere; docs
    // 1,2 still share the rare tail, measured over capped sets only
    val boiler = (3L to 7L).map(i => (i, "x y z"))
    val d = docs(Seq((1L, "x y z p q r"), (2L, "x y z p q r")) ++ boiler: _*)
    val r = Dedup.containmentSim(d, minMilli = 500, maxDf = 5)
      .select("doc_a", "doc_b", "inter", "na", "nb")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // shingles of doc1/doc2: {x y z, y z p, z p q, p q r}; "x y z" has
    // df 7 -> capped; the other 3 are df 2 -> inter=3, na=nb=3
    assert(r == Seq((1L, 2L, 3L, 3L, 3L)))
  }

  test("mirrorAudit: cross-source exact mirror mass + near mass from " +
      "rep-group source histograms") {
    val txt = "a b c a b c a b c"
    val txt2 = "pack my box with five dozen liquor jugs right now then"
    val d = Seq(
      (1L, txt, "en", "srcA"), (2L, txt, "en", "srcB"),   // A mirrors B
      (3L, txt2, "en", "srcC"), (4L, txt2, "en", "srcC"), // C boilerplate
      // shingle-set-equal VARIANT of txt at srcB: a strictly-near rep
      // pair (rep 1) whose group spans {srcA, srcB} — the histogram
      // expansion must attribute one doc pair to each source combo
      (6L, txt + " a b c", "en", "srcB"),
      (5L, "completely different words about catalyst", "en", "srcA"))
      .toDF("doc_id", "text", "lang", "source")
    val r = Dedup.mirrorAudit(d)
      .as[(String, String, Long, Long, Long, Boolean)].collect()
      .map(x => (x._1, x._2) -> ((x._3, x._4, x._5, x._6))).toMap
    assert(r == Map(
      // near: (1@srcA, 6@srcB) expanded; exact: the {1, 2} mirror
      ("srcA", "srcB") -> ((1L, 1L, 2L, true)),
      // near: (2@srcB, 6@srcB) — the within-srcB member of group 1
      ("srcB", "srcB") -> ((1L, 0L, 1L, false)),
      // exact within-source boilerplate: C(2,2) = 1 doc pair
      ("srcC", "srcC") -> ((0L, 1L, 1L, false))), s"got $r")
    Caches.releaseAll()
  }

  test("dedupSavings: counts and chars of the cluster non-canonicals") {
    val txt = "the quick brown fox jumps over the lazy dog again today"
    val d = Seq(
      (1L, txt, "en", "s", 10L), (2L, txt, "en", "s", 30L),
      (3L, "other words entirely here about tungsten", "en", "s", 60L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Dedup.dedupSavings(d)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    // cluster {1,2}: canonical 1, dropped 2 (30 chars of 100 total)
    assert(r == ((3L, 1L, 100L, 30L, 333333L, 300000L)), s"got $r")
  }

  test("minhashEval: confusion row equals recomputation from the pair table") {
    // two shingle-set-equal variant pairs (distinct texts, so they
    // SURVIVE the r16 exact-dup collapse as strictly-near rep pairs)
    val d = docs(
      (1L, "a b c a b c a b c"),
      (2L, "a b c a b c a b c a b c"),
      (3L, "the quick brown fox jumps over the lazy dog yesterday no"),
      (4L, "p q r p q r p q r"),
      (5L, "p q r p q r p q r p q r"))
    val t = 500L
    val got = Dedup.minhashEval(d, t)
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    val pairs = Dedup.tieredNearDup(d, estMilli = 0L, dupMilli = t)
      .select("est_milli", "jac_milli").as[(Long, Long)].collect()
    val tp = pairs.count(p => p._1 >= t && p._2 >= t).toLong
    val fp = pairs.count(p => p._1 >= t && p._2 < t).toLong
    val fn = pairs.count(p => p._1 < t && p._2 >= t).toLong
    val tn = pairs.count(p => p._1 < t && p._2 < t).toLong
    assert(got == ((pairs.length.toLong, tp, fp, fn, tn,
      1000000L * tp / math.max(tp + fp, 1L),
      1000000L * tp / math.max(tp + fn, 1L))))
    assert(got._1 == got._2 + got._3 + got._4 + got._5,
      "confusion cells must partition the candidate pairs")
    assert(tp >= 2L, "both set-equal near pairs must land in tp")
  }

  test("clusterStats: size histogram plus the singleton difference row") {
    // two identical pairs -> one size-2 cluster per pair; 1 loner
    val d = docs(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "pack my box with five dozen liquor jugs right now"),
      (4L, "pack my box with five dozen liquor jugs right now"),
      (5L, "completely unrelated text about catalyst and tungsten"))
    val r = Dedup.clusterStats(d)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(r == Seq((1L, 1L, 1L), (2L, 2L, 4L)))
    // fully-clustered corpus: singleton row present with zero counts
    val all = Dedup.clusterStats(d.filter(col("doc_id") <= 2L))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(all == Seq((1L, 0L, 0L), (2L, 1L, 2L)))
  }

  test("connectedComponents: transitive chains collapse; components stay separate") {
    // chain 1-2, 2-3, 3-4 (1 and 4 share NO pair) + island 10-11:
    // the pairwise keep-lowest policy cannot see 1~4; CC must
    val pairs = Seq((2L, 3L), (1L, 2L), (10L, 11L), (3L, 4L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("minhashJaccardEst: set-equal reps estimate 1000; estimate tracks exact Jaccard") {
    val d = docs(
      (1L, "a b c a b c a b c"),
      (2L, "a b c a b c a b c a b c"), // same shingle SET, distinct text
      (3L, "alpha beta gamma delta epsilon different"),
      (4L, "totally unrelated words in here"))
    val est = Dedup.minhashJaccardEst(d)
      .select("doc_a", "doc_b", "matches", "est_milli")
      .as[(Long, Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    // identical shingle sets agree on every lane
    assert(est((1L, 2L)) == ((16L, 1000L)))
    // est_milli is the integer lane fraction for every pair
    est.values.foreach { case (m, e) => assert(e == 1000L * m / 16) }
    Caches.releaseAll()
  }

  test("tieredNearDup: est-gated exact verification, consistent across all tiers") {
    val texts = Map(
      1L -> "a b c a b c a b c",
      2L -> "a b c a b c a b c a b c", // same shingle SET, distinct text
      3L -> "a b c a b c a b c x y z", // high overlap, superset shingles
      4L -> "totally unrelated words in here")
    val d = docs(texts.toSeq.sortBy(_._1): _*)
    val out = Dedup.tieredNearDup(d)
      .select("doc_a", "doc_b", "est_milli", "jac_milli", "is_dup",
        "n_doc_pairs")
      .as[(Long, Long, Long, Long, Boolean, Long)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4, t._5, t._6)).toMap
    Caches.releaseAll()
    // the set-equal rep pair passes every tier with exact 1000s and
    // stands for 1·1 doc pairs (both reps are singleton groups)
    assert(out((1L, 2L)) == ((1000L, 1000L, true, 1L)))
    // test-side exact Jaccard from the raw shingle sets — every emitted
    // row's exact tier must match it, and is_dup must be jac >= 800
    def shingleSet(t: String): Set[String] = {
      val toks = t.split(" ").toSeq
      if (toks.size >= 3) toks.sliding(3).map(_.mkString(" ")).toSet
      else Set(toks.mkString(" "))
    }
    out.foreach { case ((a, b), (est, jac, dup, _)) =>
      val (sa, sb) = (shingleSet(texts(a)), shingleSet(texts(b)))
      val expect = 1000L * sa.intersect(sb).size /
        math.max(sa.union(sb).size, 1)
      assert(jac == expect, s"($a,$b) exact tier: $jac != $expect")
      assert(dup == (jac >= 800L), s"($a,$b) is_dup flag")
      assert(est >= 500L, s"($a,$b) leaked through the estimate gate")
    }
    // the output is EXACTLY the est-gated slice of the estimate tier
    val gated = Dedup.minhashJaccardEst(d)
      .filter(col("est_milli") >= 500)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(out.keySet == gated,
      "tiered output must be the est-gated candidate set, nothing else")
    Caches.releaseAll()
  }

  test("incrementalDedup: corpus canonical, greedy within batch, unique kept") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val corpus = docs((0L, base), (1L, "completely different words here"))
    val batch = docs(
      (10L, base),                       // dup of corpus 0 → dropped
      (11L, "utterly unrelated fresh content nobody wrote before"),
      (12L, "utterly unrelated fresh content nobody wrote before"))
    val r = Dedup.incrementalDedup(corpus, batch)
      .select("doc_id", "n_dup", "kept").as[(Long, Long, Boolean)]
      .collect().sortBy(_._1)
    assert(r.map(_._1).toSeq == Seq(10L, 11L, 12L), "one row per batch doc")
    assert(!r(0)._3 && r(0)._2 >= 1L, "corpus dup must be dropped")
    assert(r(1)._3 && r(1)._2 == 0L, "lower twin kept (greedy drop-higher)")
    assert(!r(2)._3, "higher twin dropped against lower batch sibling")
  }

  test("incrementalDedup == per-doc recount over the full-corpus estimate table") {
    val d = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val split = 350L
    // ground truth: over ALL distinct LSH pairs (a<b), batch doc n's
    // duplicate partners are exactly the est-gated pairs with doc_b = n
    // (corpus ids and lower batch ids both sit below n)
    val full = Dedup.minhashJaccardEst(d)
      .filter(col("est_milli") >= 500L)
      .groupBy(col("doc_b").as("doc_id"))
      .agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    val expected = d.select("doc_id").as[Long].collect()
      .filter(_ >= split).map(n => (n, full.getOrElse(n, 0L))).toSet
    val got = Dedup.incrementalDedup(
        d.filter(col("doc_id") < split), d.filter(col("doc_id") >= split))
      .select("doc_id", "n_dup").as[(Long, Long)].collect().toSet
    assert(got == expected)
    assert(got.exists(_._2 > 0L), "fixture must exercise the dup path")
    assert(got.exists(_._2 == 0L), "fixture must exercise the kept path")
  }

  test("one band-join path: pairs + estimate compose off a single persisted sig table") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // external composition — the caller-facing contract: persist the
    // signature table once (filtered to the exact-dup reps, the r16
    // collapse), derive candidates AND estimates from it
    val sigs = Caches.track(
      Dedup.signatures(d).join(Dedup.textReps(d), "doc_id"))
    val pairs = Dedup.pairsFromSigs(sigs)
    val composed = Dedup.jaccardEstForPairs(sigs, pairs)
    // every consumer side reads the ONE cached sig frame (two band-join
    // sides + two estimator sides), so the md5 lanes run exactly once
    val p = composed.queryExecution.executedPlan.toString
    assert("InMemoryTableScan".r.findAllIn(p).size >= 4,
      "band join + estimator must all scan the persisted sig table")
    val got = composed.select("doc_a", "doc_b", "matches", "est_milli")
      .as[(Long, Long, Long, Long)].collect().toSet
    Caches.releaseAll()
    // and it is THE SAME result minhashJaccardEst produces internally
    val direct = Dedup.minhashJaccardEst(d)
      .select("doc_a", "doc_b", "matches", "est_milli")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == direct, "composed path diverged from minhashJaccardEst")
    // and minhashPairs' candidates are exactly the shared generator's
    val viaPairs = Dedup.minhashPairs(d)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(viaPairs == got.map(t => (t._1, t._2)),
      "minhashPairs diverged from pairsFromSigs")
    Caches.releaseAll()
  }

  test("connectedComponents: maxIters exhaustion throws, never returns under-merged labels") {
    // path of diameter 9 cannot converge in 2 min-label rounds; the old
    // behavior silently returned partial labels (keep-list then keeps
    // extra duplicates) — exhaustion must be an error instead
    val path = (1L until 10L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(path, maxIters = 2).collect()
    }
    assert(e.getMessage.contains("did not converge"))
    val e2 = intercept[IllegalStateException] {
      Dedup.connectedComponentsStar(path, maxIters = 1).collect()
    }
    assert(e2.getMessage.contains("did not converge"))
    // and the same graph converges fine under the defaults
    assert(Dedup.connectedComponents(path).as[(Long, Long)].collect()
      .toMap.values.toSet == Set(1L))
    Caches.releaseAll()
  }

  test("dedupClusters == union-find over candidateEdges (fixture differential)") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pairs = Dedup.candidateEdges(d)
      .as[(Long, Long)].collect().toSeq
    // test-side union-find reference
    val parent = collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val expect = nodes.map(n => n -> find(n)).toMap
    val got = Dedup.dedupClusters(d).as[(Long, Long)].collect().toMap
    assert(got == expect, "label propagation must agree with union-find")
    Caches.releaseAll()
  }

  test("connectedComponentsStar == min-label propagation (adversarial differential)") {
    import org.apache.spark.sql.DataFrame
    def cc(pairs: DataFrame) = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    def star(pairs: DataFrame) = Dedup.connectedComponentsStar(pairs)
      .as[(Long, Long)].collect().toMap
    // adversarial for min-label: one long path (diameter = n-1), where
    // star's O(log n) rounds shine; plus a clique and an island pair
    val path = (1L until 28L).map(i => (i, i + 1))
    val clique = for (a <- 100L to 104L; b <- (a + 1) to 104L) yield (a, b)
    val graph = (path ++ clique ++ Seq((500L, 501L)))
      .toDF("doc_a", "doc_b")
    assert(star(graph) == cc(graph), "star and min-label must agree")
    // seeded random graphs (deterministic): several shapes
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { _ =>
      val es = (1 to 60).map { _ =>
        val x = rnd.nextInt(50).toLong; val y = rnd.nextInt(50).toLong
        (math.min(x, y), math.max(x, y))
      }.filter(p => p._1 != p._2).distinct
      val g = es.toDF("doc_a", "doc_b")
      assert(star(g) == cc(g), s"divergence on random graph: $es")
    }
    Caches.releaseAll()
  }

  test("textExactDedup keeps the lowest doc_id per identical text") {
    val d = docs((5L, "same text here"), (2L, "same text here"),
      (9L, "unique words entirely"), (7L, "same text here"))
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
    val kept = Dedup.textExactDedup(d).select("doc_id")
      .as[Long].collect().toSet
    assert(kept == Set(2L, 9L))
  }

  test("clusterKeepList keeps exactly the component minima plus unpaired docs") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val clusters = Dedup.dedupClusters(d).as[(Long, Long)].collect().toMap
    val paired = clusters.keySet
    val canonical = clusters.values.toSet
    val kept = Dedup.clusterKeepList(d).select("doc_id")
      .as[Long].collect().toSet
    val all = d.select("doc_id").as[Long].collect().toSet
    assert(kept == (all -- paired) ++ canonical,
      "kept = unpaired docs + one canonical (component min) per cluster")
    // cluster policy is at least as strict as the pairwise one: every
    // doc the pairwise keep-list drops is also cluster-dropped
    val pairwiseKept = Dedup.dedupKeepList(d).select("doc_id")
      .as[Long].collect().toSet
    assert(kept.subsetOf(pairwiseKept),
      "cluster keep-list must never resurrect a pairwise-dropped doc")
    Caches.releaseAll()
  }

  test("simhash: identical docs get identical signatures; reordered " +
      "tokens pair at hamming 0, exact dups collapse") {
    val d = docs(
      (1L, "spark catalyst optimizer rewrites logical plans"),
      (2L, "spark catalyst optimizer rewrites logical plans"))
    val sh = Dedup.simhash(d).as[(Long, Long)].collect().toMap
    assert(sh(1L) == sh(2L))
    // identical TEXTS collapse to one rep — no pair (r16)
    assert(Dedup.simhashPairs(d).count() == 0L)
    // a token-REORDERED variant is a DISTINCT text with the same
    // frequency-weighted simhash: a strictly-near hamming-0 rep pair,
    // stamped with the exact-dup multiplicity of side 1 (m = 2)
    val d2 = docs(
      (1L, "spark catalyst optimizer rewrites logical plans"),
      (2L, "spark catalyst optimizer rewrites logical plans"),
      (3L, "plans logical rewrites optimizer catalyst spark"))
    val pairs = Dedup.simhashPairs(d2)
      .select("doc_a", "doc_b", "hamming", "n_doc_pairs")
      .as[(Long, Long, Int, Long)].collect().toSeq
    assert(pairs == Seq((1L, 3L, 0, 2L)))
    Caches.releaseAll()
  }

  test("simhash signature uses all 64 bits (two independent lanes)") {
    val d = docs((1L, "some tokens here for hashing"))
    val sh = Dedup.simhash(d).select("simhash").as[Long].head()
    assert((sh >>> 32) != 0L, "high lane (bits 32-63) populated")
    assert((sh & 0xFFFFFFFFL) != 0L, "low lane (bits 0-31) populated")
  }

  test("simhash near-dup pair survives 16-bit banding; hamming is exact") {
    // a reordered variant of the doc-1 text (same token multiset →
    // identical simhash → all bands agree) against an unrelated doc
    val t = "the quick brown fox jumps over the lazy dog again and again"
    val d = docs(
      (1L, t),
      (2L, t.split(" ").reverse.mkString(" ")),
      (3L, "completely different words about spark catalyst tungsten"))
    val pairs = Dedup.simhashPairs(d, maxHamming = 6)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
    Caches.releaseAll()
  }

  test("simhashPairs: a reordered-boilerplate pile-up is capped; a cold " +
      "near pair survives") {
    // simhash is frequency-weighted and order-blind, so k same-multiset
    // rewrites (rotations) share ONE simhash across k distinct texts —
    // the text-rep collapse cannot merge them and all four band buckets
    // hold k reps. The occupancy cap (r15 watch note) bounds the k²/2
    // blowup; the unrelated reversed-sentence pair lives in cold
    // buckets and survives.
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val pile = (0 until 12).map(i =>
      (i.toLong, (words.drop(i) ++ words.take(i)).mkString(" ")))
    val t = "the quick brown fox jumps over the lazy dog again and again"
    val d = docs(pile ++ Seq((20L, t),
      (21L, t.split(" ").reverse.mkString(" "))): _*)
    val capped = Dedup.simhashPairs(d, maxHamming = 6, maxBucket = 4)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(capped == Set((20L, 21L)),
      s"the pile's buckets must drop, the cold pair must survive: $capped")
    val open = Dedup.simhashPairs(d, maxHamming = 6, maxBucket = 64)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(open.size == 66 + 1,
      s"open cap must emit the C(12,2) pile pairs too: ${open.size}")
    Caches.releaseAll()
  }

  test("dupSpans: per-doc duplicated-shingle stats, NULL-free zeros") {
    // doc1 {a b c, b c d, c d e}, doc2 {a b c, b c x, c x y} share ONE
    // span; doc3 shares none
    val d = docs((1L, "a b c d e"), (2L, "a b c x y"), (3L, "p q r s"))
    val r = Dedup.dupSpans(d)
      .select("doc_id", "n_spans", "n_dup", "dup_milli")
      .as[(Long, Long, Long, Long)].collect()
      .map(x => x._1 -> ((x._2, x._3, x._4))).toMap
    assert(r == Map(
      1L -> ((3L, 1L, 333L)),
      2L -> ((3L, 1L, 333L)),
      3L -> ((2L, 0L, 0L))))
  }

  test("shingleNovelty: first occurrence wins in corpus order") {
    // doc 0 introduces {a b c, b c d}: fully novel. doc 1 re-uses
    // "a b c" but adds "b c x": half novel. doc 2 repeats doc 0
    // verbatim: zero novel. doc 3 is a short-doc whole-text shingle,
    // unseen: fully novel.
    val d = docs((0L, "a b c d"), (1L, "a b c x"), (2L, "a b c d"),
      (3L, "zz"))
    val r = Dedup.shingleNovelty(d)
      .as[(Long, Long, Long, Long)].collect()
      .map(x => x._1 -> ((x._2, x._3, x._4))).toMap
    assert(r == Map(
      0L -> ((2L, 2L, 1000000L)),
      1L -> ((2L, 1L, 500000L)),
      2L -> ((2L, 0L, 0L)),
      3L -> ((1L, 1L, 1000000L))))
    Caches.releaseAll()
  }

  test("dupSpans counts spans, not pair multiplicity") {
    // a span shared by THREE docs still counts once per doc
    val d = docs((1L, "a b c x1 y1"), (2L, "a b c x2 y2"),
      (3L, "a b c x3 y3"))
    val r = Dedup.dupSpans(d)
      .select("doc_id", "n_dup").as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("dupSpans keys on BOTH md5 lanes (64-bit collision bound)") {
    // Differential vs hash-free truth: on a corpus where every doc pair
    // shares some shingles, the dual-lane keyed result must equal the
    // span-TEXT computation exactly — i.e. zero lane-32 aliasing leaks
    // into the output. (Single-lane expected false marks are ~N²/2³³;
    // the dual 64-bit key drives that to N²/2⁶⁵ — <1 expected false
    // mark below ~6e9 distinct spans. Fixture scale verifies the
    // mechanism; the bound is arithmetic.)
    val d = docs((0L until 40L).map(i =>
      (i, s"common prefix words here then t$i u$i v$i w$i")): _*)
    val byHash = Dedup.dupSpans(d)
      .select("doc_id", "n_spans", "n_dup")
      .as[(Long, Long, Long)].collect().toSet
    val byText = {
      import org.apache.spark.sql.functions._
      val ex = Dedup.withShingles(d)
        .select(col("doc_id"), explode(col("__sh")).as("s"))
      val dup = ex.groupBy("s").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2).select("s")
      val per = ex.groupBy("doc_id").agg(count(lit(1)).as("n_spans"))
      val dp = ex.join(dup, "s").groupBy("doc_id")
        .agg(count(lit(1)).as("n_dup0"))
      per.join(dp, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_spans"),
          coalesce(col("n_dup0"), lit(0L)).as("n_dup"))
        .as[(Long, Long, Long)].collect().toSet
    }
    assert(byHash == byText, "dual-lane keys must reproduce text-keyed truth")
  }

  test("substringDedup: planted cross-doc passage survives exactly once") {
    val passage = "zq1 zq2 zq3 zq4 zq5 zq6"
    val d = docs(
      (1L, s"a1 a2 a3 $passage a4 a5"),
      (2L, s"b1 b2 $passage b3 b4 b5"),
      (3L, "c1 c2 c3 c4 c5 c6 c7"))
    val out = Dedup.substringDedup(d).orderBy("doc_id")
      .select("doc_id", "n_tokens", "removed_tokens", "kept_text")
      .as[(Long, Long, Long, String)].collect()
    // doc 1 is the corpus-first site: passage kept verbatim
    assert(out(0) == ((1L, 11L, 0L, s"a1 a2 a3 $passage a4 a5")))
    // doc 2: exactly the 6 passage tokens removed — boundary shingles
    // carry unique context, so removal stops at the passage edge
    assert(out(1) == ((2L, 11L, 6L, "b1 b2 b3 b4 b5")))
    // doc 3 shares nothing: untouched
    assert(out(2) == ((3L, 7L, 0L, "c1 c2 c3 c4 c5 c6 c7")))
  }

  test("substringDedup: within-doc verbatim repeat keeps first occurrence") {
    val d = docs((1L, "x1 x2 r1 r2 r3 x3 x4 r1 r2 r3 x5"))
    val out = Dedup.substringDedup(d)
      .select("doc_id", "removed_tokens", "kept_text")
      .as[(Long, Long, String)].head()
    assert(out == ((1L, 3L, "x1 x2 r1 r2 r3 x3 x4 x5")))
  }

  test("substringDedup minSpan: short echoes survive, long lifts remove") {
    // "c1 c2 c3" echoes across docs (3-token run, < minSpan=6);
    // the 6-token passage is a real lift and still removes
    val passage = "zq1 zq2 zq3 zq4 zq5 zq6"
    val d = docs(
      (1L, s"a1 a2 c1 c2 c3 $passage a3 a4"),
      (2L, s"b1 b2 c1 c2 c3 b3 $passage b4"))
    val strict = Dedup.substringDedup(d).orderBy("doc_id")
      .select("doc_id", "removed_tokens", "kept_text")
      .as[(Long, Long, String)].collect()
    val lee = Dedup.substringDedup(d, minSpan = 6).orderBy("doc_id")
      .select("doc_id", "removed_tokens", "kept_text")
      .as[(Long, Long, String)].collect()
    // strict removes both the echo and the passage from doc 2
    assert(strict(1) == ((2L, 9L, "b1 b2 b3 b4")))
    // minSpan=6 keeps the 3-token echo, removes only the passage
    assert(lee(0) == ((1L, 0L, s"a1 a2 c1 c2 c3 $passage a3 a4")))
    assert(lee(1) == ((2L, 6L, "b1 b2 c1 c2 c3 b3 b4")))
  }

  test("substringDedup minSpan: short-doc fallback runs honor the contract") {
    // ADVICE r14 #2: a doc SHORTER than n produces a whole-text
    // fallback shingle whose marked run is the whole doc — here 2
    // tokens. For minSpan = 3 (in (doc_len, n]) the old `minSpan <= n`
    // shortcut skipped the run-length gate and removed the 2-token run
    // anyway, violating "only maximal removed runs of >= minSpan
    // tokens are removed". The run gate must fire: doc 2 survives.
    val d = docs((1L, "tiny pair"), (2L, "tiny pair"),
      (3L, "other words entirely"))
    val out = Dedup.substringDedup(d, n = 3, minSpan = 3).orderBy("doc_id")
      .select("doc_id", "removed_tokens", "kept_text")
      .as[(Long, Long, String)].collect()
    assert(out(0) == ((1L, 0L, "tiny pair")))
    assert(out(1) == ((2L, 0L, "tiny pair"))) // 2-token run < minSpan=3
    assert(out(2) == ((3L, 0L, "other words entirely")))
    // and a genuine >= minSpan dup still removes at the same setting
    val d2 = docs((1L, "p1 p2 p3"), (2L, "p1 p2 p3"))
    val out2 = Dedup.substringDedup(d2, n = 3, minSpan = 3)
      .orderBy("doc_id").select("doc_id", "removed_tokens", "kept_text")
      .as[(Long, Long, String)].collect()
    assert(out2(0) == ((1L, 0L, "p1 p2 p3")))
    assert(out2(1) == ((2L, 3L, "")))
  }

  test("substringDedupInc: corpus passages leave the batch, corpus untouched") {
    val passage = "zq1 zq2 zq3 zq4 zq5 zq6"
    val corpus = docs((10L, s"c1 c2 $passage c3 c4"))
    val batch = docs(
      (21L, s"a1 a2 $passage a3 a4"), // contains the corpus passage
      (23L, "n1 n2 n3 n4 n5"), // novel: untouched
      (25L, "r1 r2 b1 b2 b3 r3 r4 b1 b2 b3 r5")) // batch-internal repeat
    val out = Dedup.substringDedupInc(corpus, batch).orderBy("doc_id")
      .select("doc_id", "removed_tokens", "kept_text")
      .as[(Long, Long, String)].collect()
    // ONLY batch docs in the output — the corpus is canonical
    assert(out.map(_._1).toSeq == Seq(21L, 23L, 25L))
    // the corpus passage is removed from the batch doc (the corpus
    // keeper survives by not being rewritten at all); boundary shingles
    // carry unique context so removal stops at the passage edge
    assert(out(0) == ((21L, 6L, "a1 a2 a3 a4")))
    assert(out(1) == ((23L, 0L, "n1 n2 n3 n4 n5")))
    // batch-internal repeat: keep the batch-first occurrence
    assert(out(2) == ((25L, 3L, "r1 r2 b1 b2 b3 r3 r4 r5")))
    Caches.releaseAll()
  }

  test("substringDedupInc: a batch short-doc exact-dup of a corpus doc drops") {
    val corpus = docs((2L, "tiny pair"))
    val batch = docs((3L, "tiny pair"), (5L, "fresh words"))
    val out = Dedup.substringDedupInc(corpus, batch).orderBy("doc_id")
      .select("doc_id", "removed_tokens", "kept_text")
      .as[(Long, Long, String)].collect()
    // the whole-text fallback shingle hits the corpus index → removed
    assert(out(0) == ((3L, 2L, "")))
    assert(out(1) == ((5L, 0L, "fresh words")))
    Caches.releaseAll()
  }

  test("substringKeysUpdated: keys after absorbing a batch == rebuilt index") {
    // the continuous-ingestion index-maintenance contract (ADVICE r15
    // #3): unioning the staged corpus keys with the batch's keys must
    // equal rebuilding the keeper index over corpus ∪ batch from
    // scratch — absorb is a cheap union, never a stale approximation
    val corpus = docs((10L, "c1 c2 zq1 zq2 zq3 zq4 c3"),
      (12L, "m1 m2 m3 m4 m5"))
    val batch = docs((21L, "a1 a2 zq1 zq2 zq3 zq4 a3"), // overlaps corpus
      (23L, "n1 n2 n3 n4 n5")) // all-novel keys
    val updated = Dedup.substringKeysUpdated(corpus, batch)
      .as[(Long, Long)].collect().toSet
    val rebuilt = Dedup.substringKeys(corpus.unionByName(batch))
      .as[(Long, Long)].collect().toSet
    assert(updated == rebuilt, "absorbed index must equal a full rebuild")
    // and the overlap actually exercises the union-dedup: the corpus
    // and batch key sets intersect (the shared zq passage)
    val corpusKeys = Dedup.substringKeys(corpus)
      .as[(Long, Long)].collect().toSet
    assert(corpusKeys.intersect(updated).nonEmpty &&
      corpusKeys != updated)
    Caches.releaseAll()
  }

  test("substringDedup: short-doc whole-text fallback + fully-removed doc") {
    val d = docs((1L, "tiny pair"), (2L, "tiny pair"), (3L, "other text"))
    val out = Dedup.substringDedup(d).orderBy("doc_id")
      .select("doc_id", "removed_tokens", "kept_tokens", "kept_text",
        "kept_md5")
      .as[(Long, Long, Long, String, String)].collect()
    assert(out(0) == ((1L, 0L, 2L, "tiny pair",
      out(0)._5))) // doc 1 keeps the first occurrence
    // doc 2 is removed entirely; md5 of the empty string on both engines
    assert(out(1) == ((2L, 2L, 0L, "",
      "d41d8cd98f00b204e9800998ecf8427e")))
    assert(out(2)._2 == 0L)
  }

  test("dedupMethodAgreement: a both-methods near pair in the shared rep space") {
    // docs 1/2: DISTINCT texts where doc 2 repeats doc 1's cycle once
    // more — same shingle SET (minhash bands collide) AND uniformly
    // scaled token frequencies (identical simhash, hamming 0). Both
    // methods flag the SAME rep pair because both collapse on the one
    // text-md5 rep space; docs 3/4 unrelated — union = intersection =
    // the one pair, Jaccard exactly 1e6.
    val d = docs(
      (1L, "a b c a b c a b c"),
      (2L, "a b c a b c a b c a b c"),
      (3L, "completely different words about rivers and stone"),
      (4L, "yet another unrelated sentence mentioning harvest"))
    val r = graft.operators.Dedup.dedupMethodAgreement(d)
      .as[(Long, Long, Long, Long, Option[Long])].collect().toSeq
    assert(r == Seq((1L, 1L, 1L, 1L, Some(1000000L))))
    Caches.releaseAll()
  }

  test("dedupLaneMatrix: per-source deletions per lane; rep survives") {
    val d = Seq(
      (0L, "srcA", "the same exact duplicated text in every copy"),
      (1L, "srcA", "the same exact duplicated text in every copy"),
      (2L, "srcA", "the same exact duplicated text in every copy"),
      (3L, "srcA", "completely different words about rivers and stone"),
      (4L, "srcB", "yet another unrelated sentence mentioning harvest"))
      .toDF("doc_id", "source", "text")
    val r = Dedup.dedupLaneMatrix(d).orderBy("source")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // srcA: docs 1 and 2 are non-rep exact members — every lane drops
    // them via the shared star edges, rep 0 and unique 3 survive;
    // srcB untouched
    assert(r == Seq(("srcA", 4L, 2L, 2L, 2L, 2L, 2L),
      ("srcB", 1L, 0L, 0L, 0L, 0L, 1L)), s"got $r")
    Caches.releaseAll()
  }
}
