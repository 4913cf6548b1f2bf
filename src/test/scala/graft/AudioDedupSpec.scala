package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.operators.Dedup

/** Audio fingerprint near-dup (VERDICT r14 #6): WAV round-trip through
  * real javax.sound codecs, block-mean quantization, q-gram rolling
  * hashes, and the pairing contract — a clip sharing a segment pairs
  * with its original, an exact re-encode collapses to multiplicity, a
  * distinct clip stays out. */
class AudioDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(texts: (Long, String)*) =
    texts.toDF("doc_id", "text")

  // deterministic varied 64-char prefix: 8 distinct-sum blocks
  private val prefix =
    (0 until 64).map(i => ('a' + (i * 7 + i / 8) % 26).toChar).mkString

  test("audioBlocks: WAV round-trip equals character block sums") {
    val text = prefix // 64 chars → 8 blocks
    val blocks = Multimodal.audioBlocks(docs((1L, text)))
      .orderBy("blk").as[Multimodal.AudioBlock].collect().toSeq
    val expected = (0 until 8).map { j =>
      Multimodal.AudioBlock(1L, j.toLong,
        (j * 8 until j * 8 + 8).map(text.charAt(_).toInt.toLong).sum / 8)
    }
    assert(blocks == expected)
  }

  test("audioAssets drops sub-window docs; assets are real RIFF-WAVE") {
    val a = Multimodal.audioAssets(docs((1L, "short text"), (2L, prefix)))
      .as[Multimodal.AudioAsset].collect().toSeq
    assert(a.map(_.doc_id) == Seq(2L)) // 10 chars < 32 → dropped
    val riff = a.head.payload
    assert(new String(riff, 0, 4, "US-ASCII") == "RIFF" &&
      new String(riff, 8, 4, "US-ASCII") == "WAVE")
  }

  test("qgramFingerprints: lead-window q-grams hash by the rolling fold") {
    val blocks = Seq((1L, 0L, 10L), (1L, 1L, 20L), (1L, 2L, 30L),
      (1L, 3L, 40L), (1L, 4L, 50L)).toDF("doc_id", "blk", "q")
    val fps = Dedup.qgramFingerprints(blocks)
      .orderBy("fp").as[(Long, Long)].collect().toSeq
    def roll(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % 1000000007L)
    val expected = Seq("10:20:30:40", "20:30:40:50").map(roll)
    assert(fps.map(_._2).sorted == expected.sorted)
  }

  test("fingerprintNeardupInc: batch probes corpus; partners count once each") {
    val corpusFps = Multimodal.audioFingerprints(
      docs((2L, prefix + ("a" * 32))))
    val batchFps = Multimodal.audioFingerprints(docs(
      (11L, prefix + ("a" * 32)), // exact corpus dup
      (13L, prefix + ("z" * 32)), // shares the 5 prefix windows
      (15L, (0 until 96).map(i => ('A' + (i * 11 + 3) % 26).toChar).mkString),
      (17L, prefix + ("a" * 32)))) // dup of corpus, 11, and (partially) 13
    val out = Dedup.fingerprintNeardupInc(corpusFps, batchFps,
        minShared = 4, maxDf = 64).orderBy("doc_id")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      (11L, 1L, false), // corpus partner (lowest batch doc)
      (13L, 2L, false), // corpus + batch 11 via the 5 shared windows
      (15L, 0L, true),  // novel: kept
      (17L, 3L, false))) // corpus + batch 11 + batch 13
    Caches.releaseAll()
  }

  test("fingerprintNeardup: shared-segment clip pairs, re-encode collapses") {
    val d = docs(
      (1L, prefix + ("a" * 32)),  // 12 blocks → 9 windows
      (2L, prefix + ("z" * 32)),  // shares the 5 prefix-only windows
      (3L, (0 until 96).map(i => ('A' + (i * 11 + 3) % 26).toChar).mkString),
      (4L, prefix + ("a" * 32)))  // exact dup of 1 → set collapse
    val fps = Multimodal.audioFingerprints(d)
    val pairs = Dedup.fingerprintNeardup(fps, minShared = 4, maxDf = 64)
      .select("rep_a", "rep_b", "n_shared", "n_doc_pairs")
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    // windows fully inside the shared 8-block prefix: starts 0..4 → 5
    // shared fps; docs 1/4 collapse to rep 1 with m = 2 → the (1, 2)
    // rep pair stands for 2 doc pairs; doc 3 pairs with nothing
    assert(pairs == Seq((1L, 2L, 5L, 2L)))
    Caches.releaseAll()
  }

  test("audio CDC lane: an UNALIGNED re-trim still pairs (boundaries " +
      "re-sync on content); the fixed-window lane provably misses it") {
    // VERDICT r15 #5: doc 2 is doc 1 re-trimmed by a 3-char prefix —
    // NOT a multiple of the 8-sample block, so every fixed 8-sample
    // block mean changes and the q-gram lane loses every fingerprint;
    // CDC boundaries (content-defined: the sample values of '\'' 'Z'
    // 'r' land in the 1/16 hash slice) re-synchronize at the first
    // boundary sample, so every later chunk hashes identically.
    val base = "the quick brown fox jumps over the lazy dog and runs " +
      "around the riverbank for more than forty furlongs before " +
      "resting quietly near the river mouth"
    val d = docs(
      (1L, base),
      (2L, "xq " + base), // 3-char unaligned re-trim
      (3L, (0 until 96).map(i => ('A' + (i * 7 + 5) % 25).toChar).mkString))
    // fixed-window lane: NO pair survives the 4-shared-q-gram gate
    val fixedPairs = Dedup.fingerprintNeardup(
        Multimodal.audioFingerprints(d), minShared = 4, maxDf = 64)
      .select("rep_a", "rep_b").as[(Long, Long)].collect().toSet
    assert(!fixedPairs.contains((1L, 2L)),
      "the unaligned copy must defeat the fixed-window lane " +
        s"(got $fixedPairs) — otherwise this fixture proves nothing")
    // CDC lane: the pair survives with many re-synced shared chunks
    val cdcPairs = Dedup.fingerprintNeardup(
        Multimodal.audioCdcFingerprints(d), minShared = 4, maxDf = 64)
      .select("rep_a", "rep_b", "n_shared")
      .as[(Long, Long, Long)].collect().toSeq
    assert(cdcPairs.map(p => (p._1, p._2)) == Seq((1L, 2L)),
      s"CDC lane must pair exactly the re-trimmed copy: $cdcPairs")
    assert(cdcPairs.head._3 >= 4,
      s"expected many re-synced shared chunks: $cdcPairs")
    Caches.releaseAll()
  }

  test("fingerprintSweep: thresholds re-aggregate ONE pair list; zero rows kept") {
    // docs 1/2 have IDENTICAL fp sets (collapse to one rep — no pair);
    // doc 3 shares 2 fps with the rep; doc 4 is unrelated
    val fps = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L),
      (2L, 10L), (2L, 11L), (2L, 12L), (2L, 13L),
      (3L, 10L), (3L, 11L), (3L, 90L), (3L, 91L),
      (4L, 99L)).toDF("doc_id", "fp")
    val r = Dedup.fingerprintSweep(fps, threshes = Seq(1L, 2L, 4L))
      .orderBy("thresh")
      .as[(Long, Long, Long)].collect().toSeq
    // rep(1,2) ~ 3 share 2 fps → one rep pair standing for 2 doc
    // pairs; survives t ∈ {1,2}, dies at 4
    assert(r == Seq((1L, 1L, 2L), (2L, 1L, 2L), (4L, 0L, 0L)), s"got $r")
    Caches.releaseAll()
  }

  test("audioVad: adaptive energy gate + min-duration segment rule") {
    // blocks of 8 identical chars give exact block means: 'z' → 122,
    // '!' → 33; the gate q·n ≥ Σq is integer on both engines
    val alt = "z" * 8 + "!" * 8 + "z" * 8 + "!" * 8 // 122,33,122,33
    val run = "z" * 16 + "!" * 16                   // 122,122,33,33
    val out = Multimodal.audioVad(docs((1L, alt), (2L, run)), minRun = 2)
      .orderBy("doc_id")
      .select("doc_id", "n_blocks", "n_active", "n_segments",
        "longest_seg")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // both docs: Σq = 310, n = 4, active iff 4q ≥ 310 → loud only.
    // doc 1's two actives are isolated (runs of 1 → no segment at
    // minRun 2 but still counted in n_active); doc 2's form one
    // 2-block segment
    assert(out == Seq((1L, 4L, 2L, 0L, 1L), (2L, 4L, 2L, 1L, 2L)))
    Caches.releaseAll()
  }
}
