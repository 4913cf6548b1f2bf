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
