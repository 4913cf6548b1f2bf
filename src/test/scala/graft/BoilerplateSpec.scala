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

  test("line granularity (VERDICT r16 #3): a 3-line template header " +
      "strips from every doc of its source; body lines survive") {
    // width 4: the 12-token header = synthesized lines 0..2 of every
    // s1 doc (df 6 >= max(5, ceil(6/10)=1)); each body is unique
    // (df 1). The s2 doc shares the header text but its source has
    // one doc — per-source isolation keeps it whole.
    val header = (0 until 12).map(i => s"nav$i").mkString(" ")
    val d = docs(
      (0L to 5L).map(i =>
        (i, "s1", s"$header body${i}a body${i}b body${i}c")) :+
      (9L, "s2", s"$header solo"): _*)
    val prof = Boilerplate.boilerplateLines(d, width = 4)
      .orderBy("source")
      .select("source", "n_docs", "n_boiler", "max_df")
      .as[(String, Long, Long, Long)].collect().toSeq
    // s1: exactly the 3 header lines flag; body lines have df 1
    assert(prof == Seq(("s1", 6L, 3L, 6L), ("s2", 1L, 0L, 1L)),
      s"got $prof")
    val strip = Boilerplate.boilerplateLineStrip(d, width = 4)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "removed_tokens", "kept_tokens")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // every s1 doc loses its 12 header tokens, keeps its 3 body
    // tokens; the s2 doc is untouched
    assert(strip == (0L to 5L).map(i => (i, 15L, 12L, 3L)) :+
      ((9L, 13L, 0L, 13L)), s"got $strip")
  }

  test("line granularity: a line repeating INSIDE one doc counts df 1 " +
      "but strips every instance once flagged") {
    // "x0 x1 x2 x3" appears twice in docs 0..4 (df 5 ≥ 5): both
    // instances of each doc strip (8 tokens)
    val line = "x0 x1 x2 x3"
    val d = docs((0L to 4L).map(i =>
      (i, "s1", s"$line $line u${i}a u${i}b u${i}c u${i}d")): _*)
    val prof = Boilerplate.boilerplateLines(d, width = 4)
      .select("n_lines", "n_boiler", "max_df")
      .as[(Long, Long, Long)].head()
    // per doc: lines are {x-line, x-line, unique body line} → distinct
    // (source, line) rows = 1 template + 5 bodies; df counts docs (5)
    assert(prof == ((6L, 1L, 5L)), s"got $prof")
    val strip = Boilerplate.boilerplateLineStrip(d, width = 4)
      .orderBy("doc_id").select("removed_tokens", "kept_tokens")
      .as[(Long, Long)].collect().toSeq
    assert(strip == Seq.fill(5)((8L, 4L)), s"got $strip")
  }
}
