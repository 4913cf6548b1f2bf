package graft

import graft.operators.Classify

/** Gates for the embedding classifiers and the dimension audit: vote
  * counting, tie-breaks, integer centroid arithmetic, and the
  * quantization boundary. */
class ClassifySpec extends SparkTestBase {
  import spark.implicits._

  private def emb(rows: (Long, Int, Array[Float])*) =
    rows.toDF("vec_id", "label", "embedding")

  test("knnClassify: majority vote among the k nearest, exact votes") {
    // test vec 0 = +x. Train: two label-1 vectors near +x, one label-2
    // vector near +x, one label-9 vector at -x (never in top-3).
    val d = emb(
      (0L, 7, Array(1f, 0f)),
      (10L, 1, Array(0.9f, 0.1f)),
      (11L, 1, Array(0.9f, -0.1f)),
      (12L, 2, Array(0.8f, 0.1f)),
      (13L, 9, Array(-1f, 0f)))
    val r = Classify.knnClassify(d, nTest = 1, k = 3)
      .as[(Long, Int, Int, Long, Boolean)].collect().toSeq
    assert(r == Seq((0L, 7, 1, 2L, false))) // label 1 wins 2 votes to 1
  }

  test("knnClassify: vote ties break to the smaller label") {
    val d = emb(
      (0L, 1, Array(1f, 0f)),
      (10L, 3, Array(0.9f, 0.1f)),
      (11L, 2, Array(0.9f, -0.1f)))
    val r = Classify.knnClassify(d, nTest = 1, k = 2)
      .as[(Long, Int, Int, Long, Boolean)].collect().toSeq
    assert(r == Seq((0L, 1, 2, 1L, false))) // 1-1 tie → label 2 < 3
  }

  test("centroidClassify: quantize-then-sum centroid, correct argmax") {
    // Two labels along orthogonal axes; test vector on +x must pick
    // label 0 whose centroid is +x-heavy.
    val d = emb(
      (0L, 1, Array(1f, 0f)), // test; true label deliberately 'wrong'
      (10L, 0, Array(1f, 0.25f)),
      (11L, 0, Array(1f, -0.25f)),
      (12L, 5, Array(0f, 1f)),
      (13L, 5, Array(0.25f, 1f)))
    val r = Classify.centroidClassify(d, nTest = 1, qScale = 4)
      .as[(Long, Int, Int, Long, Boolean)].collect().toSeq
    // label 0 centroid sum (q=⌊x·4⌋): [(4+4), (1+(-1))] = [8, 0]; n=2
    // label 5 centroid sum: [(0+1), (4+4)] = [1, 8]; n=2
    // test q = [4, 0] → dot0 = 32, dot5 = 4 → label 0 wins.
    assert(r.map(t => (t._1, t._2, t._3, t._5)) == Seq((0L, 1, 0, false)))
    assert(r.head._4 == 1000000L * 32 / 2)
  }

  test("centroidClassify: negative components quantize with floor, not trunc") {
    // x = -0.1, qScale 4 → ⌊-0.4⌋ = -1 (floor), not 0 (truncation).
    val d = emb(
      (0L, 0, Array(-0.1f)),
      (10L, 0, Array(-0.1f)),
      (11L, 1, Array(0.9f)))
    val r = Classify.centroidClassify(d, nTest = 1, qScale = 4)
      .as[(Long, Int, Int, Long, Boolean)].collect().toSeq
    // test q = [-1]; label0 csum = [-1] → dot 1; label1 csum = [3] → -3.
    assert(r.map(_._3) == Seq(0))
    assert(r.head._4 == 1000000L)
  }

  test("dimStats: per-dimension integer moments and extrema") {
    val d = emb(
      (0L, 0, Array(0.5f, -0.5f)),
      (1L, 0, Array(1.0f, 0.25f)))
    val r = Classify.dimStats(d, qScale = 4)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // dim 0: q = 2, 4 → sum 6, sum2 20; dim 1: q = -2, 1 → sum -1, sum2 5
    assert(r == Seq((0L, 2L, 6L, 20L, 2L, 4L), (1L, 2L, -1L, 5L, -2L, 1L)))
  }

  test("nbConfusion: separable bilingual corpus classifies cleanly") {
    // V=4; en: c_l=6, costs cat/dog 1 bit, chat/chien 3; fr: c_l=5,
    // costs cat 2, chat 1, chien 2, dog 3; priors 1 bit each. Doc
    // scores hand-run: every doc prefers its own language.
    val d = Seq(
      (1L, "cat cat dog", "en"), (2L, "chat chat chien", "fr"),
      (3L, "cat dog dog", "en"), (4L, "cat chat", "fr"))
      .toDF("doc_id", "text", "lang")
    val r = Classify.nbConfusion(d)
      .as[(String, String, Long)].collect().toSeq
    assert(r == Seq(("en", "en", 2L), ("fr", "fr", 2L)))
    Caches.releaseAll()
  }

  test("nbConfusion: exact score ties break to the smaller lang") {
    // identical one-token docs in two one-doc languages: every cost
    // and prior equal → both docs predict the lexicographically
    // smaller class 'aa'
    val d = Seq((1L, "x", "aa"), (2L, "x", "bb"))
      .toDF("doc_id", "text", "lang")
    val r = Classify.nbConfusion(d)
      .as[(String, String, Long)].collect().toSeq
    assert(r == Seq(("aa", "aa", 1L), ("bb", "aa", 1L)))
    Caches.releaseAll()
  }

  test("giniStump: the perfect split is found at Gini 0 against a " +
    "maximal baseline") {
    // en docs long (100, 200), fr short (10, 20): threshold 20 puts
    // both classes pure — weighted Gini 0; the unsplit baseline is
    // maximal (2e6·2·2 div 4 = 2e6).
    val d = Seq(
      (1L, "t", "fr", 10L), (2L, "t", "fr", 20L),
      (3L, "t", "en", 100L), (4L, "t", "en", 200L))
      .toDF("doc_id", "text", "lang", "n_chars")
    val r = Classify.giniStump(d)
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    assert(r == ((20L, 2L, 0L, 2L, 2L, 0L, 2000000L)))
    Caches.releaseAll()
  }

  test("giniStump: equal-impurity splits break to the smaller " +
    "threshold") {
    // en(10), fr(20), en(30): t=10 and t=20 both score 1e6 — the
    // argmin's (gini, threshold) order picks 10
    val d = Seq(
      (1L, "t", "en", 10L), (2L, "t", "fr", 20L), (3L, "t", "en", 30L))
      .toDF("doc_id", "text", "lang", "n_chars")
    val r = Classify.giniStump(d)
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    assert(r == ((10L, 1L, 1L, 2L, 1L, 1000000L, 1333333L)))
    Caches.releaseAll()
  }
}
