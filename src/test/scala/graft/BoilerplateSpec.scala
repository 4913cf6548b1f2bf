package graft

import graft.operators.Boilerplate

/** Per-source boilerplate detection/strip: the df threshold (absolute
  * floor + relative rule), per-source isolation, and the distinct-
  * position overlap semantics of the strip. */
class BoilerplateSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "source", "text")

  test("boilerplateNgrams: df >= max(minDf, ceil(n_docs/divisor)) flags") {
    // s1: "accept cookies" in 3 of 4 docs; every other bigram unique
    val d = docs(
      (0L, "s1", "accept cookies alpha beta"),
      (1L, "s1", "accept cookies gamma delta"),
      (2L, "s1", "accept cookies epsilon zeta"),
      (3L, "s1", "eta theta iota kappa"),
      (4L, "s2", "accept cookies lambda mu"))
    val p = Boilerplate.boilerplateNgrams(d, minDf = 2L, divisor = 10L)
      .orderBy("source")
      .select("source", "n_docs", "n_boiler", "max_df")
      .as[(String, Long, Long, Long)].collect().toSeq
    // s1: threshold max(2, ceil(4/10)=1) = 2 → only "accept cookies"
    // (df 3) flags; s2: its single "accept cookies" has df 1 < 2
    assert(p == Seq(("s1", 4L, 1L, 3L), ("s2", 1L, 0L, 1L)))
  }

  test("boilerplateNgrams: the relative rule binds over the floor") {
    // 30 docs; a bigram in 3 docs clears ceil(30/10)=3 but a bigram
    // in 2 does not, even though both clear the absolute floor of 2
    val base = (0L until 30L).map(i =>
      (i, "s", s"u${i}a u${i}b u${i}c"))
    val withShared = base.map { case (i, s, t) =>
      val extra =
        if (i < 3) " shared three" else if (i < 5) " shared2 two" else ""
      (i, s, t + extra)
    }
    val p = Boilerplate.boilerplateNgrams(docs(withShared: _*),
        minDf = 2L, divisor = 10L)
      .select("n_boiler").as[Long].head()
    // only "shared three" (df 3) flags; "shared2 two" (df 2) misses
    // the relative bar ceil(30/10) = 3
    assert(p == 1L)
  }

  test("boilerplateStrip: overlapping occurrences share tokens (distinct positions)") {
    // make both "a b" and "b a" boilerplate of s (df 2 each), then
    // strip "a b a b a": starts 0,2 cover {0..3}, starts 1,3 cover
    // {1..4} → union = all 5 tokens, not 8
    val d = docs(
      (0L, "s", "a b a b a"),
      (1L, "s", "a b x0 x1"),
      (2L, "s", "b a y0 y1"))
    val out = Boilerplate.boilerplateStrip(d, minDf = 2L, divisor = 10L)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "removed_tokens", "kept_tokens")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((0L, 5L, 5L, 0L), (1L, 4L, 2L, 2L),
      (2L, 4L, 2L, 2L)))
  }

  test("boilerplateStripInc: batch strips on the CORPUS profile only") {
    val corpus = docs(
      (0L, "s", "the footer a0 a1"),
      (2L, "s", "the footer b0 b1"))
    val batch = docs(
      (1L, "s", "the footer c0 c1"),      // corpus boilerplate strips
      (3L, "s", "new banner d0 d1"),      // batch-internal template...
      (5L, "s", "new banner e0 e1"))      // ...is INVISIBLE (staleness)
    val out = Boilerplate.boilerplateStripInc(corpus, batch,
        minDf = 2L, divisor = 10L)
      .orderBy("doc_id").select("doc_id", "removed_tokens")
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L), (3L, 0L), (5L, 0L)))
  }

  test("boilerplateStrip: per-source isolation and untouched docs survive") {
    // "the footer" is boilerplate of s1 only; s2's doc containing it
    // is untouched, and a single-token doc still appears with 0 removed
    val d = docs(
      (0L, "s1", "the footer a0 a1"),
      (1L, "s1", "the footer b0 b1"),
      (2L, "s2", "the footer c0 c1"),
      (3L, "s2", "solo"))
    val out = Boilerplate.boilerplateStrip(d, minDf = 2L, divisor = 10L)
      .orderBy("doc_id")
      .select("doc_id", "removed_tokens")
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((0L, 2L), (1L, 2L), (2L, 0L), (3L, 0L)))
  }
}
