package graft

import graft.operators.Bpe

/** Gates for the distributed BPE trainer (Bpe.scala): merge order on a
  * known corpus, greedy in-word repetition handling (the sentinel-wrap
  * correctness argument), and the (count DESC, pattern ASC) tie-break. */
class BpeSpec extends SparkTestBase {

  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("most frequent pair merges first; later rounds see the update") {
    // ab:3, cd:1 → round 0 merges (a,b) @ 3; round 1 merges (c,d) @ 1
    val out = Bpe.train(docs("ab ab ab cd"), merges = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(out(0) == (0L, "a", "b", "ab", 3L))
    assert(out(1) == (1L, "c", "d", "cd", 1L))
  }

  test("consecutive in-word occurrences all merge in one round") {
    // "abab" ×2: round 0 merges (a,b) @ 4 — BOTH occurrences inside each
    // word must fuse (the wrapped form has no shared delimiter between
    // adjacent matches), so round 1 sees ⟨ab⟩⟨ab⟩ and merges to "abab".
    val out = Bpe.train(docs("abab abab"), merges = 2)
      .collect().map(r => (r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4)))
    assert(out(0) == ("a", "b", "ab", 4L))
    assert(out(1) == ("ab", "ab", "abab", 2L))
  }

  test("count ties break to the lexicographically smaller pattern") {
    val out = Bpe.train(docs("xy ab"), merges = 1).collect()
    assert(out(0).getString(3) == "ab")
  }

  test("fertility: per-lang BPE-per-word ratios; more merges lower it") {
    // one merge (a,a)→aa: en "aa aa" encodes to one token per word
    // (fertility 1e6); fr "b" is untouched (1e6); the unmergeable
    // lang keeps its char count visible in n_bpe vs n_words
    val d = Seq((1L, "aa aa", "en"), (2L, "b", "fr"))
      .toDF("doc_id", "text", "lang")
    val r1 = Bpe.fertility(d, merges = 1)
      .as[(String, Long, Long, Long, Option[Long])].collect().toSeq
    assert(r1 == Seq(("en", 1L, 2L, 2L, Some(1000000L)),
      ("fr", 1L, 1L, 1L, Some(1000000L))))
    Caches.releaseAll()
    // deeper merge ladder strictly lowers a repetitive lang's
    // fertility: merges=1 leaves "aaaa" as aa+aa (2e6), merges=2
    // fuses it whole (1e6)
    val rep = Seq((1L, "aaaa aaaa aaaa", "en"))
      .toDF("doc_id", "text", "lang")
    val f1 = Bpe.fertility(rep, merges = 1)
      .as[(String, Long, Long, Long, Option[Long])].head()._5.get
    Caches.releaseAll()
    val f2 = Bpe.fertility(rep, merges = 2)
      .as[(String, Long, Long, Long, Option[Long])].head()._5.get
    assert(f1 == 2000000L && f2 == 1000000L,
      s"merging must lower fertility: $f1 -> $f2")
    Caches.releaseAll()
  }

  test("multi-char symbols participate in later pair counts") {
    // er:er composition — "beer" ×3 has e-e, e-r; "ee" would tie with…
    // keep it simple: "xee xee xee" → (e,e) wins round 0 @3; round 1
    // pairs are x-⟨ee⟩ @3 → merged "xee".
    val out = Bpe.train(docs("xee xee xee"), merges = 2)
      .collect().map(r => (r.getString(1), r.getString(2), r.getString(3)))
    assert(out(0) == ("e", "e", "ee"))
    assert(out(1) == ("x", "ee", "xee"))
  }
}
