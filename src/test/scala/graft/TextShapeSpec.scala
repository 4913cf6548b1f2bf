package graft

import graft.operators.TextShape

/** Gates for the corpus-shape operators: word-length spectrum, hapax
  * rates, power-of-2 length buckets, Heaps'-law checkpoints, and the
  * TTR histogram. */
class TextShapeSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "source")

  test("wordLenHist: counts occurrences and distinct terms per length") {
    val d = docs((0L, "a bb bb ccc", "s"), (1L, "a dd", "s"))
    val r = TextShape.wordLenHist(d).as[(Long, Long, Long)].collect().toSeq
    // len 1: 'a'×2 (1 distinct); len 2: bb×2 + dd×1 (2 distinct); len 3: ccc
    assert(r == Seq((1L, 2L, 1L), (2L, 3L, 2L), (3L, 1L, 1L)))
  }

  test("hapaxStats: singletons counted within each source independently") {
    val d = docs(
      (0L, "x x y", "s1"), // s1: vocab {x:2, y:1} → 1 hapax of 2
      (1L, "x", "s2"))     // s2: vocab {x:1} → 1 hapax of 1
    val r = TextShape.hapaxStats(d)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq(("s1", 2L, 1L, 3L, 500000L), ("s2", 1L, 1L, 1L, 1000000L)))
  }

  test("goodTuring: unseen mass and bias-corrected Chao1 hand-run") {
    // s1 = "a a b c d": vocab 4, n1=3 (b,c,d), n2=1 (a), N=5 →
    // unseen = (1e6·3) div 5 = 600000; chao1 = 4 + (3·2) div (2·2) = 5.
    // s2 = "x x y y": n1=0 → unseen 0, chao1 = vocab (nothing missing
    // that the estimator can see).
    val d = docs((0L, "a a b c d", "s1"), (1L, "x x y y", "s2"))
    val r = TextShape.goodTuring(d)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq(("s1", 4L, 3L, 1L, 5L, 600000L, 5L),
      ("s2", 2L, 0L, 2L, 4L, 0L, 2L)))
  }

  test("lengthBuckets: exact bit-length boundaries (4 tokens ≠ 3 tokens)") {
    val d = docs(
      (0L, "a b c", "s"),      // 3 tokens → bucket 1
      (1L, "a b c d", "s"),    // 4 tokens → bucket 2
      (2L, "a b c d e f g", "s"), // 7 → bucket 2
      (3L, "a", "s"))          // 1 → bucket 0
    val r = TextShape.lengthBuckets(d)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq((0L, 1L, 1L, 1L, 1L), (1L, 1L, 3L, 3L, 3L),
      (2L, 2L, 11L, 4L, 7L)))
  }

  test("heapsLaw: vocabulary accumulates by first occurrence, cp covers all") {
    // doc 0: {a,b}; doc 1: {b,c}; doc 2: {a}; doc 3: {d}
    val d = docs((0L, "a b", "s"), (1L, "b c", "s"), (2L, "a", "s"),
      (3L, "d", "s"))
    val r = TextShape.heapsLaw(d).as[(Long, Long, Long)].collect().toSeq
    // checkpoints: 1, 2, 4(=n_docs, not duplicated as a power)
    assert(r == Seq((1L, 2L, 2L), (2L, 3L, 4L), (4L, 4L, 6L)))
  }

  test("heapsLaw: n_docs a power of two appears exactly once") {
    val d = docs((0L, "a", "s"), (1L, "b", "s"))
    val r = TextShape.heapsLaw(d).as[(Long, Long, Long)].collect().toSeq
    assert(r == Seq((1L, 1L, 1L), (2L, 2L, 2L)))
  }

  test("docTtr: all-distinct doc lands at centile 100, half-repeats at 50") {
    val d = docs((0L, "a b c d", "s"), (1L, "a a b b", "s"))
    val r = TextShape.docTtr(d).as[(Long, Long)].collect().toMap
    assert(r == Map(100L -> 1L, 50L -> 1L))
  }

  test("readability: hand-computed Flesch milli lanes") {
    // doc 0: "the cat sat. it ran!" → 5 words, 2 sentences,
    // syllables: e/a/a/i/a → 5 vowel groups
    // flesch = 206835 − (1015·5) div 2 − (84600·5) div 5
    //        = 206835 − 2537 − 84600 = 119698
    val d = docs((0L, "the cat sat. it ran!", "s"))
    val r = TextShape.readability(d)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq((0L, 5L, 2L, 5L, 119698L)))
  }

  test("readability: no terminator clamps to one sentence; y is a vowel") {
    // "rhythm by" → 2 words, 1 sentence (clamped), vowel groups: y, y → 2
    // flesch = 206835 − 2030 − (84600·2) div 2 = 206835 − 2030 − 84600
    val d = docs((0L, "rhythm by", "s"))
    val r = TextShape.readability(d)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq((0L, 2L, 1L, 2L, 120205L)))
  }

  test("readability: '!?.' runs collapse to one sentence boundary") {
    val d = docs((0L, "go now!?. stop", "s"))
    val r = TextShape.readability(d)
      .select("n_sentences").as[Long].collect().toSeq
    assert(r == Seq(1L))
  }
}
