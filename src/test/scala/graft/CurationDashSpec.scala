package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Sampling, TextAnalysis}

/** Gates for the curation-dashboard compositions: per-source dup
  * rates, the dup-vs-kept quality gap, greedy budget allocation, and
  * winnowing candidate pairs. */
class CurationDashSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "source", "text")
      .withColumn("n_chars", length(col("text")))
      .withColumn("lang", lit("en"))

  test("sourceDupRates: a mirrored source shows its duplicate share") {
    val dup = "alpha beta gamma delta epsilon zeta eta theta " * 4
    val d = docs(
      (1L, "mirror", dup), (2L, "mirror", dup), (3L, "mirror", dup),
      (4L, "clean", "one unique sentence about apples and harvest"),
      (5L, "clean", "another unique sentence about rivers and stone"))
    val m = Curation.sourceDupRates(d).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2), x.getLong(3)))
      .toMap
    assert(m("mirror") == ((3L, 2L, 666666L)),
      "keep-lowest drops 2 of 3 mirror docs")
    assert(m("clean") == ((2L, 0L, 0L)))
  }

  test("sourceOverlap: cross-source mirror cell, within-source cell, " +
    "clean sources absent") {
    val dup = "alpha beta gamma delta epsilon zeta eta theta " * 4
    val d = docs(
      (1L, "m1", dup), (2L, "m2", dup), (3L, "m2", dup),
      (4L, "clean", "one unique sentence about apples and harvest"))
    val r = Curation.sourceOverlap(d)
      .as[(String, String, Long, Long, Long)].collect().toSeq
    // pairs: (1,2) m1×m2, (1,3) m1×m2, (2,3) m2×m2 — and nothing
    // touches the clean source
    assert(r == Seq(("m1", "m2", 1L, 2L, 2L), ("m2", "m2", 2L, 2L, 1L)))
    Caches.releaseAll()
  }

  test("dupQualityGap: NULL when no duplicates exist") {
    val d = docs(
      (1L, "a", "totally unique words here about mountains"),
      (2L, "a", "different unique words there about oceans"))
    val r = Curation.dupQualityGap(d)
      .as[(Long, Long, Long, Long, Option[Long])].head()
    assert(r._1 == 2L && r._3 == 0L && r._5.isEmpty)
  }

  test("budgetAllocation: greedy funds best sources first, boundary partial") {
    // source q (stopword-dense) outscores source z (punctuation junk);
    // a budget below q's tokens splits q and zeroes z
    val good = "the a and of to in is it " * 10
    val junk = "@@@ ### !!! ??? ;;; ::: " * 10
    val d = docs((1L, "q", good), (2L, "q", good), (3L, "z", junk))
    val all = Sampling.budgetAllocation(d, budgetTokens = 1000000L)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(all.map(_._1).toSeq == Seq("q", "z"), "ranked by mean quality")
    assert(all.forall(_._6 == 1000000L), "a huge budget funds everything")
    val qTokens = all.find(_._1 == "q").get._3
    val part = Sampling.budgetAllocation(d, budgetTokens = qTokens / 2)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    val (qRow, zRow) = (part.find(_._1 == "q").get, part.find(_._1 == "z").get)
    assert(qRow._6 == (1000000L * (qTokens / 2)) / qTokens,
      "boundary source takes the exact partial ppm")
    assert(zRow._6 == 0L, "beyond-budget source takes nothing")
  }

  test("winnowPairs: a long shared passage pairs the docs; unrelated don't") {
    val passage = "quick brown fox jumps over the lazy dog near the bank " * 3
    val d = docs(
      (1L, "s", passage + "unique tail one here now"),
      (2L, "s", "unique head two first " + passage),
      (3L, "s", "completely different content about astronomy and orbits"))
    val r = TextAnalysis.winnowPairs(d)
      .as[(Long, Long, Long)].collect()
    assert(r.map(x => (x._1, x._2)).toSet == Set((1L, 2L)),
      s"only the passage-sharing pair surfaces: ${r.mkString(",")}")
    assert(r.head._3 >= 2L)
    Caches.releaseAll()
  }

  test("kmvOverlap: sketches holding the whole set are exact") {
    // k >= vocab → every estimate is the true cardinality: |A|=3,
    // |B|=3, |A∪B|=4, |A∩B|=2, J = 500000 ppm
    val d = docs((1L, "s1", "a b c"), (2L, "s2", "b c d"))
    val r = Curation.kmvOverlap(d, k = 64)
      .as[(String, String, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(r == Seq(("s1", "s2", 3L, 3L, 4L, 2L, 500000L)))
    Caches.releaseAll()
  }

  test("kmvOverlap: truncated sketches match a hand-run md5 reference") {
    // k=2 < vocab: replicate the estimator in plain Scala off the
    // same md5 lane and demand bit-equality
    def h32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"kmv:$s".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(4).map("%02x".format(_)).mkString, 16)
    }
    val k = 2
    val a = Seq("a", "b", "c", "e").map(h32).sorted.take(k)
    val b = Seq("b", "c", "d", "f").map(h32).sorted.take(k)
    def est(sk: Seq[Long], full: Boolean) =
      if (!full) sk.size.toLong
      else ((k - 1).toLong * 4294967296L) / math.max(sk.last, 1L)
    val union = (a ++ b).distinct.sorted.take(k)
    val cBoth = union.count(h => a.contains(h) && b.contains(h)).toLong
    val eu = est(union, full = union.size == k)
    val expect = (("s1", "s2", est(a, a.size == k), est(b, b.size == k),
      eu, cBoth * eu / union.size, 1000000L * cBoth / union.size))
    val d2 = docs((1L, "s1", "a b c e"), (2L, "s2", "b c d f"))
    val r = Curation.kmvOverlap(d2, k = k)
      .as[(String, String, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(r == Seq(expect), s"got $r expected $expect")
    Caches.releaseAll()
  }
}
