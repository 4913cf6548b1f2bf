package graft

import org.apache.spark.sql.functions._

import graft.operators.Scrub

class ScrubSpec extends SparkTestBase {
  import spark.implicits._

  test("piiRedact removes every planted email/phone and counts them") {
    val df = Seq(
      (1L, "plain text with no pii at all"),
      (2L, "mail a@b.co and c.d+e@f-g.org please"),
      (3L, "call 555-123-4567 or 555-765-4321"),
      (4L, "mixed x@y.io and 111-222-3333 here"))
      .toDF("doc_id", "text")
    val out = Scrub.piiRedact(df, col("text"))
      .select("doc_id", "n_pii", "redacted")
      .as[(Long, Long, String)].collect()
      .map { case (id, n, t) => id -> ((n, t)) }.toMap
    assert(out(1L) == ((0L, "plain text with no pii at all")))
    assert(out(2L)._1 == 2L && out(2L)._2 == "mail <EMAIL> and <EMAIL> please")
    assert(out(3L)._1 == 2L && out(3L)._2 == "call <PHONE> or <PHONE>")
    assert(out(4L)._1 == 2L && out(4L)._2 == "mixed <EMAIL> and <PHONE> here")
  }

  test("n_pii equals the number of tags actually emitted on overlaps") {
    // the phone-shaped substring lives INSIDE the email match: one
    // replacement happens, so the audit must say 1, not 2
    val df = Seq((1L, "contact 555-123-4567@example.com now"))
      .toDF("doc_id", "text")
    val (n, t) = Scrub.piiRedact(df, col("text"))
      .select("n_pii", "redacted").as[(Long, String)].head()
    assert(t == "contact <EMAIL> now")
    assert(n == 1L, s"audit count must match the single replacement: $n")
  }

  test("phone word-boundary: digits embedded in longer runs don't match") {
    val df = Seq((1L, "id 9555-123-45678 is not a phone")).toDF("doc_id", "text")
    val (n, t) = Scrub.piiRedact(df, col("text"))
      .select("n_pii", "redacted").as[(Long, String)].head()
    assert(n == 0L && t.contains("9555-123-45678"))
  }

  test("decontaminate flags only docs sharing >= minShared shingles") {
    // benchmark doc: "alpha beta gamma delta" -> shingles
    // {alpha beta gamma, beta gamma delta}
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"), // shares 2 -> flagged
      (2L, "zz alpha beta gamma"),            // shares 1 -> clean
      (3L, "totally unrelated words here"))   // shares 0 -> clean
      .toDF("doc_id", "text")
    val out = Scrub.decontaminate(docs, bench, minShared = 2)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 2L))
  }

  test("decontaminate broadcasts the benchmark side") {
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val docs = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val df = Scrub.decontaminate(docs, bench)
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "corpus-side shuffle of exploded shingles must not pay a join shuffle")
  }

  test("decontaminateWeighted: one rare passage outweighs common-phrase overlap") {
    // benchmark carries a rare 4-word passage AND a common phrase.
    // doc 1 shares only the common phrase (df=9 of 10 docs -> ~0 bits
    // per shingle); doc 2 shares the rare passage (df=1 -> log2(10)=3
    // bits per shingle). With minBits=5, only doc 2 flags.
    val common = "the quick brown fox"
    val rare = "zyzzyva quine fermion haiku"
    val filler = (1 to 8).map(i => (i.toLong, s"$common filler$i words here"))
    val docs = (filler ++ Seq(
      (9L, s"$common and some other padding text"),
      (10L, s"prefix words $rare suffix words")))
      .toDF("doc_id", "text")
    val bench = Seq((100L, s"$common $rare")).toDF("doc_id", "text")
    val flagged = Scrub.decontaminateWeighted(docs, bench, minBits = 5L)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(flagged.contains(10L), "rare-passage doc must flag")
    assert(!flagged.contains(9L) && !flagged.exists(_._1 <= 8L),
      s"common-phrase docs must stay under the bits floor: $flagged")
    // raw-count decontaminate at the same shingle overlap CAN'T tell
    // them apart: doc 9 and doc 10 both share 2 shingles with bench
    val raw = Scrub.decontaminate(docs, bench, minShared = 2)
      .as[(Long, Long)].collect().map(_._1).toSet
    assert(raw.contains(9L) == raw.contains(10L) || raw.contains(10L))
  }

  test("NfcNormalizeExpr: combining sequences compose exactly as java.text.Normalizer") {
    val samples = Seq(
      "café",            // e + combining acute -> é
      "naïve",           // i + combining diaeresis -> ï
      "각",    // Hangul jamo -> precomposed syllable 각
      "already plain ascii",
      "ﬁligature stays")  // ﬁ is NFC-invariant (compat only in NFKC)
    val got = samples.toDF("s")
      .select(org.apache.spark.sql.graft.NfcNormalizeExpr(col("s")))
      .as[String].collect().toSeq
    val want = samples.map(
      java.text.Normalizer.normalize(_, java.text.Normalizer.Form.NFC))
    assert(got == want)
    assert(got(0) == "café" && got(2).length == 1)
    // null propagates
    val n = Seq[Option[String]](None).toDF("s")
      .select(org.apache.spark.sql.graft.NfcNormalizeExpr(col("s")))
      .collect()
    assert(n.head.isNullAt(0))
  }

  test("normalizeText: strip -> NFC -> lower -> collapse -> trim, with audit") {
    val df = Seq(
      (1L, "  Café\tX Y  z "),
      (2L, "already clean")).toDF("doc_id", "text")
    val out = Scrub.normalizeText(df, col("text"))
      .as[(Long, String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // BEL strips (Y stays glued to the following space), tab collapses,
    // combining acute composes, case lowers, edges trim
    assert(out(1L) == (("café x y z", 16L, 10L, true)))
    assert(out(2L) == (("already clean", 13L, 13L, false)))
    // the whole pass is one codegen'd projection — no shuffle
    val p = Scrub.normalizeText(df, col("text"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"map-only pass expected:\n$p")
  }

  test("kAnonymity: the generalization ladder restores k step by step") {
    // (en,a)×5 (en,b)×1 (fr,a)×2 with k=5: the full-QI level exposes
    // two classes (sizes 1 and 2, 3 docs); generalizing source away
    // still exposes fr (2 docs); the root class of 8 is safe
    val rows = (1L to 5L).map(i => (i, "t", "en", "a")) ++
      Seq((6L, "t", "en", "b"), (7L, "t", "fr", "a"), (8L, "t", "fr", "a"))
    val d = rows.toList.toDF("doc_id", "text", "lang", "source")
    val r = graft.operators.Scrub.kAnonymity(d, k = 5L)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq((0L, 3L, 1L, 2L, 3L), (1L, 2L, 2L, 1L, 2L),
      (2L, 1L, 8L, 0L, 0L)))
  }

  test("lDiversity: homogeneous class fails even when k-anonymous") {
    // en: sources a×4, b×1, c×1 → l=3 diverse, modal 4/6
    // fr: source a×5 → l=1, modal 5/5 — large class, still leaks
    val rows = (1L to 4L).map(i => (i, "t", "en", "a")) ++
      Seq((5L, "t", "en", "b"), (6L, "t", "en", "c")) ++
      (7L to 11L).map(i => (i, "t", "fr", "a"))
    val d = rows.toList.toDF("doc_id", "text", "lang", "source")
    val r = graft.operators.Scrub.lDiversity(d, l = 3L)
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
    assert(r == Seq(("en", 6L, 3L, 666666L, true),
      ("fr", 5L, 1L, 1000000L, false)))
  }

  test("mojibakeAudit: planted double-decode artifacts are detected; " +
    "clean text and PROPERLY-encoded accents are not") {
    // doc 2 carries the classic 'Ã©' (é re-read as Latin-1); doc 4 the
    // cp1252 smart-quote 'â€™'; doc 3 has a CORRECT é — not mojibake
    val d = Seq(
      (1L, "clean ascii text", "a"),
      (2L, "cafÃ© corrupted", "a"),
      (3L, "café proper accent", "a"),
      (4L, "itâ€™s broken", "b"),
      (5L, "fine here", "b"))
      .toDF("doc_id", "text", "source")
    val r = graft.operators.Scrub.mojibakeAudit(d)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(r == Seq(("a", 3L, 1L, 333333L), ("b", 2L, 1L, 500000L)))
  }

  test("tCloseness: skewed class fails; absent cells count as mass") {
    // global: a×9 b×1 c×1 over N=11. en (a4,b1,c1, n=6):
    // Σ|n_cv·N − n_v·n_c| = |44−54| + |11−6| + |11−6| = 20 →
    // emd = 1e6·20 div (2·6·11) = 151515 ppm. fr (a5, n=5) never saw
    // b or c — those cells still contribute |0 − n_v·n_c| = 5 each:
    // Σ = 10+5+5 = 20 → 1e6·20 div (2·5·11) = 181818 ppm. At
    // t = 160000 the mild en skew passes, fr's concentration fails.
    val rows = (1L to 4L).map(i => (i, "t", "en", "a")) ++
      Seq((5L, "t", "en", "b"), (6L, "t", "en", "c")) ++
      (7L to 11L).map(i => (i, "t", "fr", "a"))
    val d = rows.toList.toDF("doc_id", "text", "lang", "source")
    val r = graft.operators.Scrub.tCloseness(d, tPpm = 160000L)
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(r == Seq(("en", 6L, 151515L, true),
      ("fr", 5L, 181818L, false)))
    Caches.releaseAll()
  }

  test("tCloseness: a class mirroring the corpus distribution is at " +
    "EMD zero") {
    // both classes are a:b = 2:1 — exactly the global mix
    val rows = Seq((1L, "en", "a"), (2L, "en", "a"), (3L, "en", "b"),
      (4L, "fr", "a"), (5L, "fr", "a"), (6L, "fr", "b"))
      .map { case (id, lg, src) => (id, "t", lg, src) }
    val d = rows.toDF("doc_id", "text", "lang", "source")
    val r = graft.operators.Scrub.tCloseness(d)
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(r == Seq(("en", 3L, 0L, true), ("fr", 3L, 0L, true)))
    Caches.releaseAll()
  }

  test("decontamSweep: per-threshold flag counts, zero rows preserved") {
    // bench shingles {a b c, b c d, c d e}; doc 1 shares all 3,
    // doc 2 shares 1, doc 3 none
    val corpus = Seq(
      (1L, "a b c d e"), (2L, "a b c x y"), (3L, "p q r s t"))
      .toDF("doc_id", "text")
    val bench = Seq((100L, "a b c d e")).toDF("doc_id", "text")
    val r = Scrub.decontamSweep(corpus, bench,
        threshes = Seq(1L, 2L, 4L))
      .orderBy("thresh")
      .as[(Long, Long, Long)].collect().toSeq
    assert(r == Seq((1L, 2L, 4L), (2L, 1L, 3L), (4L, 0L, 0L)), s"got $r")
    Caches.releaseAll()
  }
}
