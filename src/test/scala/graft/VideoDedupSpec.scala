package graft

import graft.multimodal.Multimodal
import graft.operators.Dedup

/** Video frame-hash dedup: the real RIFF container round-trip, the
  * per-frame dHash identity against character math, and the pairing
  * contract over shared frames. */
class VideoDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(texts: (Long, String)*) =
    texts.toDF("doc_id", "text")

  // two deterministic 72-char "scenes" with distinct gradients
  private val sceneA =
    (0 until 72).map(i => ('a' + (i * 5 + 1) % 26).toChar).mkString
  private val sceneB =
    (0 until 72).map(i => ('A' + (i * 11 + 3) % 26).toChar).mkString
  private val sceneC =
    (0 until 72).map(i => ('0' + (i * 3 + 2) % 10).toChar).mkString

  private def dhashOfChars(s: String, base: Int): Long =
    (0 until 64).foldLeft(0L) { (acc, b) =>
      val i = (b / 8) * 9 + (b % 8)
      val l = s.charAt((base + i) % s.length).toInt
      val r = s.charAt((base + i + 1) % s.length).toInt
      if (l < r) acc | (1L << b) else acc
    }

  test("videoFrameHash: container round-trip equals per-frame char math") {
    val text = sceneA + sceneB // 144 chars → 2 frames
    val out = Multimodal.videoFrameHash(docs((1L, text)))
      .orderBy("frame_id").as[Multimodal.VideoFrameHash].collect().toSeq
    assert(out == Seq(
      Multimodal.VideoFrameHash(1L, 0L, dhashOfChars(text, 0)),
      Multimodal.VideoFrameHash(1L, 1L, dhashOfChars(text, 72))))
  }

  test("videoAssets: short docs make one cycled frame; container walks back") {
    val out = Multimodal.videoFrameHash(docs((3L, "tiny clip")))
      .as[Multimodal.VideoFrameHash].collect().toSeq
    assert(out == Seq(
      Multimodal.VideoFrameHash(3L, 0L, dhashOfChars("tiny clip", 0))))
    // and the staged asset is a walkable RIFF/AVI with one frame
    val payload = Multimodal.videoAssets(docs((3L, "tiny clip")))
      .as[Multimodal.VideoAsset].head().payload
    assert(Multimodal.aviFrameBytes(payload).map(_.size).contains(1))
  }

  test("videoFrameHash drops malformed containers (fail closed)") {
    val junk = Seq((9L, Array[Byte](1, 2, 3, 4))).toDF("doc_id", "payload")
    // route junk through the hash stage directly: a non-RIFF payload
    // yields no frame rows
    val hashed = Multimodal.videoFrameHash(
      docs((5L, sceneA))) // well-formed control
    assert(hashed.count() == 1L)
    assert(Multimodal.aviFrameBytes(junk.as[(Long, Array[Byte])]
      .head()._2).isEmpty)
  }

  test("videoScenes: repeated frames never cut; scene jumps count") {
    // frames: A, A, B — the repeat has delta 0 (no cut); the A→B jump
    // cuts exactly when its Hamming exceeds the threshold, which the
    // test derives from the same char math the twin uses
    val text = sceneA + sceneA + sceneB
    val hA = dhashOfChars(text, 0)
    val hB = dhashOfChars(text, 144)
    val jump = java.lang.Long.bitCount(hA ^ hB)
    val out = Multimodal.videoScenes(docs((1L, text), (2L, "one frame")))
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Option[Long])].collect().toSeq
    val expCuts = if (jump > 36) 1L else 0L
    assert(out(0) == ((1L, 3L, expCuts, expCuts + 1,
      Some(1000L * jump / 2))))
    // a single-frame doc: one scene, undefined motion
    assert(out(1) == ((2L, 1L, 0L, 1L, None)))
  }

  test("fingerprintNeardup over frame hashes: shared scenes pair") {
    val d = docs(
      (1L, sceneA + sceneB), // scenes A, B
      (2L, sceneA + sceneC), // shares scene A only → below minShared 2
      (3L, sceneB + sceneA), // same scene SET as 1 (reordered) → collapses
      (4L, sceneC.reverse + sceneA.reverse)) // distinct scenes
    val fps = Multimodal.videoFrameHash(d)
      .select($"doc_id", $"dhash".as("fp")).distinct()
    val pairs = Dedup.fingerprintNeardup(fps, minShared = 2, maxDf = 64)
      .select("rep_a", "rep_b", "n_shared", "n_doc_pairs")
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    // docs 1 and 3 have the same frame-hash SET → collapse to rep 1
    // (m = 2); no other doc shares >= 2 frames → no pairs emitted,
    // which is exactly the strictly-near contract
    assert(pairs == Seq.empty)
    // at minShared = 1, doc 2 pairs with the collapsed rep of {1, 3}
    val loose = Dedup.fingerprintNeardup(fps, minShared = 1, maxDf = 64)
      .select("rep_a", "rep_b", "n_shared", "n_doc_pairs")
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    assert(loose == Seq((1L, 2L, 1L, 2L)))
    Caches.releaseAll()
  }

  test("videoSceneFingerprints: an inserted scene leaves the other " +
      "scene signatures intact; WHOLE scenes are the match unit") {
    val d = docs(
      (1L, sceneA + sceneB),          // scenes [A], [B]
      (2L, sceneA + sceneC + sceneB), // inserted C: scenes [A], [C], [B]
      (4L, sceneC + sceneC))          // ONE two-frame scene [C, C]
    // fixture sanity: every inter-scene jump cuts at this spec's dial
    // (the fixture scenes sit 26-31 bits apart — real shot changes;
    // the operator's cutHamming is the dial, 20 here)
    val hA = dhashOfChars(sceneA, 0)
    val hB = dhashOfChars(sceneB, 0)
    val hC = dhashOfChars(sceneC, 0)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hA, hC) > 20 && ham(hC, hB) > 20 && ham(hA, hB) > 20,
      "fixture scenes must cut at every boundary")
    val fps = Multimodal.videoSceneFingerprints(d, cutHamming = 20)
    // the scale story: the scene index is strictly smaller than the
    // frame table (per-scene rows, not per-frame rows)
    assert(fps.count() < Multimodal.videoFrameHash(d).count())
    val pairs = Dedup.fingerprintNeardup(fps, minShared = 1, maxDf = 64)
      .select("rep_a", "rep_b", "n_shared")
      .as[(Long, Long, Long)].collect().toSeq
    // doc 2 shares BOTH of doc 1's scene signatures despite the
    // insertion (scene boundaries are content-defined); the two-frame
    // [C, C] scene signature differs from the single-frame [C] — the
    // whole scene, not any frame, is the unit
    assert(pairs == Seq((1L, 2L, 2L)), s"got $pairs")
    Caches.releaseAll()
  }

  test("scene dedup incremental: batch probes corpus + lower-batch scenes") {
    val d = docs(
      (0L, sceneA + sceneB), // corpus: scenes [A], [B]
      (1L, sceneA + sceneB), // batch: exact scene copy of corpus 0
      (2L, sceneC),          // corpus: scene [C]
      (3L, sceneC),          // batch: copies corpus 2's scene
      (5L, sceneB + sceneA), // batch: REORDERED scenes — single-frame
                             // scenes salt at p=0, so both signatures
                             // still match corpus 0 and lower-batch 1
      (7L, sceneA.reverse))  // batch: novel scene
    val fps = Multimodal.videoSceneFingerprints(d, cutHamming = 20)
    val out = Dedup.fingerprintNeardupInc(
        fps.filter("doc_id % 2 = 0"), fps.filter("doc_id % 2 = 1"),
        minShared = 1, maxDf = 64)
      .orderBy("doc_id").select("doc_id", "n_dup", "kept")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(out == Seq((1L, 1L, false), (3L, 1L, false),
      (5L, 2L, false), (7L, 0L, true)), s"got $out")
    Caches.releaseAll()
  }

  test("mediaLaneMatrix: an exact dup drops in every media lane under " +
      "keep-lowest; uniques survive; drops attribute to THEIR source") {
    // T is media-eligible in all three lanes (>= 72 chars for a video
    // frame, >= 32 for audio, varied so the image flat gate passes);
    // docs 1/2/9 share T exactly — the identical-dhash / identical-
    // fp-set star groups are corpus-wide, keep-lowest keeps doc 1, so
    // s1 loses doc 2 and s2 loses doc 9, each attributed to its OWN
    // source; doc 3's distinct content drops nowhere
    val t = sceneA + sceneB
    val u = sceneC + sceneC.reverse
    val d = Seq(
      (1L, "s1", t), (2L, "s1", t), (3L, "s1", u),
      (9L, "s2", t))
      .toDF("doc_id", "source", "text")
    val m = Multimodal.mediaLaneMatrix(d)
      .orderBy("source")
      .select("source", "n_docs", "drop_image", "drop_audio",
        "drop_video", "drop_any", "kept")
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(m == Seq(
      ("s1", 3L, 1L, 1L, 1L, 1L, 2L),
      ("s2", 1L, 1L, 1L, 1L, 1L, 0L)), s"got $m")
    Caches.releaseAll()
  }
}
