package graft

import org.apache.spark.sql.functions._

import graft.functions.PortableHash
import graft.operators.TextAnalysis

/** Winnowing fingerprints (Schleimer et al. 2003): differential vs a
  * brute-force reimplementation, the paper's window-coverage guarantee,
  * the robust (rightmost) tie-break, and the locality property that
  * makes winnowing a shared-passage detector. */
class WinnowSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(texts: (Long, String)*) = texts.toDF("doc_id", "text")

  /** Brute-force winnowing over collected (pos, hash) gram streams:
    * for every full window pick (min hash, rightmost pos), dedupe. */
  private def brute(grams: Map[Long, Seq[(Long, Long)]], winSize: Int)
      : Set[(Long, Long, Long)] =
    grams.flatMap { case (doc, gs) =>
      val sorted = gs.sortBy(_._1)
      sorted.indices.dropRight(winSize - 1).map { i =>
        val win = sorted.slice(i, i + winSize)
        val mh = win.map(_._2).min
        val pos = win.filter(_._2 == mh).map(_._1).max
        (doc, pos, mh)
      }.toSet
    }.toSet

  /** The operator's own k-gram hash stream, re-derived independently
    * via the builtin-composition hash (not PortableHash32Expr). */
  private def gramStream(d: org.apache.spark.sql.DataFrame, k: Int)
      : Map[Long, Seq[(Long, Long)]] = {
    import org.apache.spark.sql.expressions.Window
    val wd = Window.partitionBy("doc_id").orderBy("pos")
    val gram = (0 until k).map(i =>
        if (i == 0) col("w") else lead(col("w"), i).over(wd))
      .reduce((a, b) => concat(a, lit(" "), b))
    d.select(col("doc_id"),
        posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos", "w")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        PortableHash.hash32Builtin(concat(lit("wf:"), gram)).as("gh"))
      .filter(col("gh").isNotNull)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (k2, v) => k2 -> v.map(t => (t._2, t._3)).toSeq }
  }

  private val fixture = docs(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "a a a a a a a a a a a a"), // all-equal hashes: tie-break stress
    (2L, "one two three four five six seven eight nine ten eleven twelve"),
    (3L, "short doc"), // fewer than k tokens: no grams at all
    (4L, "exactly six words here no more")) // grams=4 < winSize+0? (k=3 -> 4 grams, windows=1)

  test("differential: selection equals brute-force winnowing (min, rightmost tie)") {
    val got = TextAnalysis.winnowFingerprints(fixture, k = 3, winSize = 4)
      .select("doc_id", "fp_pos", "fp_hash")
      .as[(Long, Long, Long)].collect().toSet
    val want = brute(gramStream(fixture, 3), 4)
    assert(got == want, s"got ${got.size} want ${want.size}")
    assert(want.nonEmpty)
    // doc 3 has < k tokens -> nothing; doc 1 collapses to ONE repeated
    // hash selected at the rightmost position of each window
    assert(!got.exists(_._1 == 3L))
    val d1 = got.filter(_._1 == 1L)
    assert(d1.nonEmpty && d1.map(_._3).size == 1,
      "identical grams must share one hash")
  }

  test("coverage guarantee: every full window contains a selected position") {
    // equivalent form: consecutive selections are < winSize apart, and
    // the first/last selections are within winSize of the stream edges
    val winSize = 4
    val sel = TextAnalysis.winnowFingerprints(fixture, 3, winSize)
      .select("doc_id", "fp_pos").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val streams = gramStream(fixture, 3)
    sel.foreach { case (doc, ps) =>
      val nGrams = streams(doc).size
      assert(ps.head <= winSize - 1, s"doc $doc first selection ${ps.head}")
      assert(ps.last >= nGrams - winSize, s"doc $doc last selection ${ps.last}")
      ps.sliding(2).foreach {
        case Array(a, b) =>
          assert(b - a <= winSize, s"doc $doc gap $a -> $b exceeds $winSize")
        case _ => ()
      }
    }
  }

  test("rightmost tie-break: repeated-gram doc selects the latest position") {
    // doc 1 is "a"×12: every window's grams hash identically, so robust
    // winnowing must pick the window's LAST position — selections are
    // exactly {winSize-1+i : windows i}, i.e. every position from
    // winSize-1 to nGrams-1
    val winSize = 4
    val ps = TextAnalysis.winnowFingerprints(fixture, 3, winSize)
      .filter(col("doc_id") === 1L)
      .select("fp_pos").as[Long].collect().sorted
    val nGrams = 12 - 3 + 1
    assert(ps.toSeq == (winSize - 1L until nGrams.toLong).toSeq)
  }

  test("locality: a shared interior passage fingerprints identically (shared flag)") {
    val passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val d = docs(
      (10L, "completely different preamble words first " + passage),
      (11L, "x1 y2 " + passage + " trailing bits"))
    val out = TextAnalysis.winnowFingerprints(d, 3, 4)
      .select("doc_id", "fp_pos", "fp_hash", "shared")
      .as[(Long, Long, Long, Boolean)].collect()
    // every fingerprint selected strictly inside the passage (past the
    // winSize+k boundary slack on both ends) must appear in BOTH docs
    val pre10 = 5L; val pre11 = 2L // tokens before the passage
    val pLen = 20L; val slack = 4L + 3L
    def interior(doc: Long, pre: Long) = out
      .filter(t => t._1 == doc && t._2 >= pre + slack &&
        t._2 <= pre + pLen - slack).toSeq
    val i10 = interior(10L, pre10); val i11 = interior(11L, pre11)
    assert(i10.nonEmpty && i11.nonEmpty, "interior must fingerprint")
    assert((i10 ++ i11).forall(_._4), s"interior fingerprints must be shared: $i10 $i11")
    // and the two docs' interior hash sets coincide
    assert(i10.map(_._3).toSet == i11.map(_._3).toSet)
  }
}
