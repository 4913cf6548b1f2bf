package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.operators.Dedup

/** Perceptual image near-dup (VERDICT r14 #1): the dHash pipeline over
  * REAL ImageIO decode — grid extraction, gradient bits, banding, and
  * the robustness contract that justifies the whole operator: a
  * resized or re-encoded copy of an image pairs with its original; a
  * distinct image does not. */
class ImageDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(texts: (Long, String)*) =
    texts.toDF("doc_id", "text")

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  /** A blocky deterministic test image: 10×10-pixel cells whose gray
    * level is a fixed function of the cell — strong cell-level
    * gradients that survive downscaling, which is exactly the signal
    * dHash is built on. */
  private def blockyImage(w: Int, h: Int, salt: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = (((x / 10) * 31 + (y / 10) * 17 + salt) * 53 + 11) % 200 + 20
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    img
  }

  private def resize(img: BufferedImage, w: Int, h: Int): BufferedImage = {
    val scaled = img.getScaledInstance(w, h, java.awt.Image.SCALE_AREA_AVERAGING)
    val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    g.drawImage(scaled, 0, 0, null)
    g.dispose()
    out
  }

  test("lumaGrid9x8 is the identity on a 9×8 grayscale image") {
    val img = new BufferedImage(9, 8, BufferedImage.TYPE_INT_RGB)
    val vals = Array.tabulate(72)(i => (i * 37 + 5) % 128)
    vals.zipWithIndex.foreach { case (v, i) =>
      img.setRGB(i % 9, i / 9, (v << 16) | (v << 8) | v)
    }
    // PNG round-trip then grid: the exact pipeline the gated query runs
    val back = ImageIO.read(new java.io.ByteArrayInputStream(encode(img, "png")))
    val grid = Multimodal.lumaGrid9x8(back)
    assert(grid.toSeq == vals.map(_.toDouble).toSeq)
    // and the dHash bits match the direct adjacent-compare definition
    val expected = (0 until 64).foldLeft(0L) { (acc, b) =>
      val i = (b / 8) * 9 + (b % 8)
      if (vals(i) < vals(i + 1)) acc | (1L << b) else acc
    }
    assert(Multimodal.dhashOfGrid(grid) == expected)
  }

  test("dHash: resized and re-encoded copies stay near; distinct images far") {
    val original = blockyImage(90, 80, salt = 0)
    val distinct = blockyImage(90, 80, salt = 7)
    def dhash(bytes: Array[Byte]): Long =
      Multimodal.dhashOfGrid(Multimodal.lumaGrid9x8(
        ImageIO.read(new java.io.ByteArrayInputStream(bytes))))
    val hOrig = dhash(encode(original, "png"))
    val hResized = dhash(encode(resize(original, 45, 40), "png"))
    val hJpeg = dhash(encode(original, "jpg"))
    val hDistinct = dhash(encode(distinct, "png"))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hOrig, hResized) <= 10,
      s"resized copy drifted ${ham(hOrig, hResized)} bits")
    assert(ham(hOrig, hJpeg) <= 10,
      s"jpeg re-encode drifted ${ham(hOrig, hJpeg)} bits")
    assert(ham(hOrig, hDistinct) > 10,
      s"distinct image only ${ham(hOrig, hDistinct)} bits away")
  }

  /** A light watermark box over the top-left cell — the one realistic
    * edit in this suite that actually flips dHash bits (resize and
    * JPEG re-encode of a blocky image preserve every gradient sign,
    * which the robustness test above proves). */
  private def watermark(img: BufferedImage): BufferedImage = {
    val out = new BufferedImage(img.getWidth, img.getHeight,
      BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    g.drawImage(img, 0, 0, null)
    g.setColor(new java.awt.Color(230, 230, 230))
    g.fillRect(0, 0, 18, 12)
    g.dispose()
    out
  }

  test("hash64Neardup: edited copies pair, distinct does not, exact dups collapse") {
    val original = blockyImage(90, 80, salt = 0)
    val hashes = Seq(
      (1L, encode(original, "png")),
      // watermarked + resized: a NEAR copy (probed: hamming 2, 3 of 4
      // bands still agree) — the perceptual-dup class this op exists for
      (2L, encode(resize(watermark(original), 47, 41), "png")),
      (3L, encode(blockyImage(90, 80, salt = 7), "png")), // distinct
      (4L, encode(original, "png")), // exact byte dup of 1
      (5L, encode(original, "jpg")) // re-encode, dHash-identical to 1
    ).toDF("doc_id", "payload")
    val dh = Multimodal.dhashOf(hashes)
    val pairs = Dedup.hash64Neardup(dh, "dhash", maxHamming = 10)
      .select("rep_a", "rep_b", "hamming", "n_doc_pairs")
      .as[(Long, Long, Int, Long)].collect().toSeq.sorted
    // docs 1/4/5 share a dhash → collapse to rep 1 with m = 3, so the
    // (1, 2) rep pair stands for 3 doc pairs; doc 3 pairs with nothing
    assert(pairs == Seq((1L, 2L, 2, 3L)))
    Caches.releaseAll()
  }

  test("hash64Neardup nBands=8: catches the straddle 4x16 provably misses") {
    // 4 flips, one in the LOW byte of each 16-bit band: every 16-bit
    // band differs (4x16 finds nothing) but the four HIGH bytes still
    // match (8x8 finds 4 shared bands) — the geometry the two recall
    // curves price
    val base = 0x1234_5678_9abc_def0L
    val straddle = base ^ ((1L << 0) | (1L << 16) | (1L << 32) | (1L << 48))
    val hashes = Seq((1L, base), (2L, straddle)).toDF("doc_id", "dhash")
    val wide = Dedup.hash64Neardup(hashes, "dhash", maxHamming = 12)
      .count()
    val narrow = Dedup.hash64Neardup(hashes, "dhash", maxHamming = 12,
        nBands = 8)
      .select("rep_a", "rep_b", "hamming")
      .as[(Long, Long, Int)].collect().toSeq
    assert(wide == 0L, "a flip in every 16-bit band must defeat 4x16")
    assert(narrow == Seq((1L, 2L, 4)), s"got $narrow")
    Caches.releaseAll()
  }

  test("hash64NeardupInc nBands=8: the incremental lane catches the " +
      "straddle 4x16 misses (VERDICT r16 #1)") {
    // Same geometry as the batch straddle test, on the CONTINUOUS
    // lane: the corpus holds base, the batch arrival differs by one
    // flip in the low byte of each 16-bit band — every 16-bit band
    // differs (4x16 admits the near-dup as novel) but the four high
    // bytes still match (8x8 flags it, hamming 4 <= 12)
    val base = 0x1234_5678_9abc_def0L
    val straddle = base ^ ((1L << 0) | (1L << 16) | (1L << 32) | (1L << 48))
    val corpus = Seq((2L, base)).toDF("doc_id", "dhash")
    val batch = Seq((11L, straddle)).toDF("doc_id", "dhash")
    val wide = Dedup.hash64NeardupInc(corpus, batch, "dhash",
        maxHamming = 12).as[(Long, Long, Boolean)].collect().toSeq
    val narrow = Dedup.hash64NeardupInc(corpus, batch, "dhash",
        maxHamming = 12, nBands = 8)
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(wide == Seq((11L, 0L, true)),
      s"4x16 must miss the all-band straddle: $wide")
    assert(narrow == Seq((11L, 1L, false)),
      s"8x8 must flag the straddle via its shared high bytes: $narrow")
    Caches.releaseAll()
  }

  test("hash64NeardupInc: batch probes corpus; exact AND near dups flag") {
    val original = blockyImage(90, 80, salt = 0)
    val corpusDh = Multimodal.dhashOf(Seq(
      (2L, encode(original, "png"))).toDF("doc_id", "payload"))
    val batchDh = Multimodal.dhashOf(Seq(
      (11L, encode(original, "png")), // exact corpus dup (hamming 0)
      (13L, encode(resize(watermark(original), 47, 41), "png")), // near
      (15L, encode(blockyImage(90, 80, salt = 7), "png")), // novel
      (17L, encode(original, "png")) // dup of corpus AND of batch 11
    ).toDF("doc_id", "payload"))
    val out = Dedup.hash64NeardupInc(corpusDh, batchDh, "dhash",
        maxHamming = 10).orderBy("doc_id")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      (11L, 1L, false), // corpus partner only (it is the lowest batch doc)
      (13L, 2L, false), // corpus + batch 11, both within hamming 2
      (15L, 0L, true),  // novel: kept
      (17L, 3L, false))) // corpus + batch 11 + batch 13
    Caches.releaseAll()
  }

  test("hash64Neardup: band-bucket occupancy cap drops hot-bucket pairs; " +
      "a cold shared band still surfaces the pair") {
    // VERDICT r15 #1: six hashes share band 0 (a structurally-hot
    // bucket); docs 0/1 ALSO share band 3 (a cold 2-member bucket).
    // With the cap at 4 the hot bucket's 15 candidate pairs vanish and
    // only (0,1) survives via its cold band — the join stays linear in
    // the face of a pile-up. With a generous cap all 15 pairs emit.
    val hashes = (0 until 6).map { i =>
      val band3 = if (i < 2) 0x3L << 48 else 1L << (48 + i)
      (i.toLong, 0x1234L | (1L << (16 + i)) | (1L << (32 + i)) | band3)
    }.toDF("doc_id", "dhash")
    val capped = Dedup.hash64Neardup(hashes, "dhash", maxHamming = 8,
        maxBucket = 4)
      .select("rep_a", "rep_b", "hamming")
      .as[(Long, Long, Int)].collect().toSeq.sorted
    assert(capped == Seq((0L, 1L, 4)),
      s"hot band-0 bucket must be dropped, cold band-3 pair kept: $capped")
    val open = Dedup.hash64Neardup(hashes, "dhash", maxHamming = 8,
        maxBucket = 64).count()
    assert(open == 15L, s"open cap must emit all C(6,2) pairs, got $open")
    Caches.releaseAll()
  }

  test("image_neardup flat gate: a near-flat dHash halo produces no pairs") {
    // Two near-flat docs (contrast 1 — solid-background material):
    // their dHashes sit 2 bits apart, so UNGATED banding would pair
    // them. The image_neardup composition pre-gates on the
    // image_quality contrast, so the flat halo contributes NOTHING to
    // the band join (flat images are exact-hash dedup material).
    val flatA = "a" * 20 + "b" + "a" * 59
    val flatB = "a" * 40 + "b" + "a" * 39
    val d = docs((1L, flatA), (3L, flatB))
    val dh = Multimodal.imageDhash(d)
    // ungated: the halo pair IS within the production threshold
    val ungated = Dedup.hash64Neardup(dh, "dhash", maxHamming = 12)
    assert(ungated.count() == 1L, "fixture must plant a would-pair halo")
    // gated (the registration's composition): no pairs
    val gated = Dedup.hash64Neardup(
      dh.join(Multimodal.imageGridStats(d)
          .filter(col("lmax") - col("lmin") > 15).select("doc_id"),
        Seq("doc_id"), "leftsemi"),
      "dhash", maxHamming = 12)
    assert(gated.count() == 0L, "flat images must be pre-gated out")
    Caches.releaseAll()
  }

  test("hash64NeardupInc two lanes: exact-hash flags gated rows; " +
      "band lane respects the band_ok gate") {
    val hFlat = 0L // the all-flat dHash
    val hC = 0x0f0f0f0f0f0f0f0fL
    val corpus = Seq((2L, hFlat, false), (4L, hC, true))
      .toDF("doc_id", "dhash", "band_ok")
    val batch = Seq(
      (11L, hFlat, false),     // exact dup of flat corpus doc -> flagged
      (13L, hFlat ^ 2L, false),// NEAR the flat mass but band-gated -> kept
      (15L, hC ^ 3L, true),    // near dup of corpus 4 via band lane
      (17L, 0x5a5a00ffL << 8, true)) // novel
      .toDF("doc_id", "dhash", "band_ok")
    val out = Dedup.hash64NeardupInc(corpus, batch, "dhash",
        maxHamming = 6, bandCol = Some("band_ok"))
      .orderBy("doc_id").as[(Long, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      (11L, 1L, false), // exact lane: corpus 2 (band lane never saw it)
      (13L, 0L, true),  // hamming 1 from the flat mass, but gated: kept
      (15L, 1L, false), // band lane: corpus 4
      (17L, 0L, true)))
    Caches.releaseAll()
  }

  test("hash64BandRecall: concentrated flips are found, straddling " +
      "flips are counted as misses — the dial's recall is measured") {
    // VERDICT r15 #4: 4×16-bit bands do NOT guarantee a collision at
    // Hamming ≤ 12 — 12 flips can straddle all four bands. Plant both
    // cases: h1 flips 3 bits inside band 0 (bands 1-3 still agree with
    // h0 → candidate, tp); h2 flips 2 bits in EVERY band (8 total ≤ 12
    // but no band agrees with h0 or h1 → missed, fn both times).
    val hashes = Seq(
      (1L, 0L),
      (2L, 0x7L),
      (3L, 0x0003000300030003L)).toDF("doc_id", "dhash")
    val r = Dedup.hash64BandRecall(hashes, "dhash", maxHamming = 12,
        maxBucket = 64, sampleMod = 1)
      .as[(Long, Long, Long, Long)].head()
    // truth = {(h0,h1) ham 3, (h0,h2) ham 8, (h1,h2) ham 7};
    // candidates = {(h0,h1)} → recall 1/3
    assert(r == ((3L, 1L, 2L, 333333L)), s"got $r")
    // an empty sample reports a well-typed zero row, never NULL lanes
    val empty = Dedup.hash64BandRecall(
        hashes.filter(col("doc_id") < 0), "dhash", sampleMod = 1)
      .as[(Long, Long, Long, Long)].head()
    assert(empty == ((0L, 0L, 0L, 0L)))
    Caches.releaseAll()
  }

  test("hash64BandRecallCurve: planted probes are exact-Hamming, d<=3 " +
      "is geometrically guaranteed, the curve fades with distance") {
    // 40 spread-out hashes so no band bucket gets hot
    val hashes = (0 until 40).map(i =>
      (i.toLong, (i.toLong * 0x9e3779b97f4a7c15L) | 1L))
      .toDF("doc_id", "dhash")
    val r = Dedup.hash64BandRecallCurve(hashes, "dhash",
        dists = Seq(2, 3, 8, 12), sampleMod = 1)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(r.map(_._1) == Seq(2L, 3L, 8L, 12L), s"one row per d: $r")
    assert(r.forall(_._2 == 40L), s"every doc planted per d: $r")
    // d <= 3 distinct flips touch at most 3 of the 4 bands -> at least
    // one band survives untouched -> the probe ALWAYS finds its source
    assert(r(0) == ((2L, 40L, 40L, 1000000L)), s"d=2 must be total: $r")
    assert(r(1) == ((3L, 40L, 40L, 1000000L)), s"d=3 must be total: $r")
    // larger drift can straddle all four bands; the curve is the point
    assert(r(3)._3 <= r(2)._3,
      s"recall must not grow from d=8 to d=12: $r")
    assert(r.forall(x => x._4 == 1000000L * x._3 / x._2))
    Caches.releaseAll()
  }

  test("probeBits=1: the one-flip-per-band pair exact 8x8 provably " +
      "misses collides via the band multi-probe (VERDICT r17 #1)") {
    // 8 flips, one in the LOW bit of each 8-bit band: EVERY 8-bit
    // band differs by exactly one bit, so exact 8x8 banding finds
    // nothing — and every band is 1 flip away, so the 1-bit
    // multi-probe fan collides on all 8 (hamming 8, verified exact)
    val base = 0x1234_5678_9abc_def0L
    val oneEach = base ^ (0 until 8).map(b => 1L << (8 * b))
      .reduce(_ | _)
    val hashes = Seq((1L, base), (2L, oneEach)).toDF("doc_id", "dhash")
    val exact = Dedup.hash64Neardup(hashes, "dhash", maxHamming = 12,
      nBands = 8).count()
    val mp = Dedup.hash64Neardup(hashes, "dhash", maxHamming = 12,
        nBands = 8, probeBits = 1)
      .select("rep_a", "rep_b", "hamming")
      .as[(Long, Long, Int)].collect().toSeq
    assert(exact == 0L, "one flip per band must defeat exact 8x8")
    assert(mp == Seq((1L, 2L, 8)), s"got $mp")
    // the incremental lane rides the same dial (batch side fans)
    val inc = Dedup.hash64NeardupInc(
        Seq((2L, base)).toDF("doc_id", "dhash"),
        Seq((11L, oneEach)).toDF("doc_id", "dhash"), "dhash",
        maxHamming = 12, nBands = 8, probeBits = 1)
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(inc == Seq((11L, 1L, false)), s"got $inc")
    // geometry guard (ADVICE r17 #1): non-divisors and nBands=1 refuse
    Seq(1, 3).foreach { g =>
      val err = intercept[IllegalArgumentException] {
        Dedup.hash64Neardup(hashes, "dhash", nBands = g).count()
      }
      assert(err.getMessage.contains("divisor"), s"nBands=$g")
    }
    Caches.releaseAll()
  }

  test("hash64BandRecallMatrix: one cell per (geometry, d); d < nBands " +
      "is geometrically total; multi-probe never loses to exact") {
    // the 40-hash spread fixture (no hot buckets at any geometry
    // except 16x4, where 40/16 = 2.5 stays under the cap too)
    val hashes = (0 until 40).map(i =>
      (i.toLong, (i.toLong * 0x9e3779b97f4a7c15L) | 1L))
      .toDF("doc_id", "dhash")
    val r = Dedup.hash64BandRecallMatrix(hashes, "dhash",
        dists = Seq(2, 6, 20), sampleMod = 1)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(r.map(x => (x._1, x._2)) ==
      Seq(4L, 8L, 16L).flatMap(g => Seq(2L, 6L, 20L).map(d => (g, d))),
      s"one row per (geometry, d): $r")
    assert(r.forall(_._3 == 40L), s"every doc planted per cell: $r")
    // d distinct flips touch at most d bands: every d < nBands cell
    // keeps at least one clean band -> exact recall is total
    r.filter(x => x._2 < x._1).foreach(x =>
      assert(x._6 == 1000000L, s"d<g must be total: $x"))
    // the multi-probe fan only ADDS candidate buckets
    r.foreach(x => assert(x._5 >= x._4 && x._7 >= x._6,
      s"mp must dominate exact: $x"))
    r.foreach(x => assert(x._6 == 1000000L * x._4 / x._3
      && x._7 == 1000000L * x._5 / x._3, s"ppm lanes: $x"))
    Caches.releaseAll()
  }

  test("image_quality lanes: constant grid flags flat, varied does not") {
    // constant text → constant luma grid → zero variance and contrast
    val stats = Multimodal.imageGridStats(docs(
        (1L, "a" * 80),
        (2L, "the quick brown fox jumps over the lazy dog vexingly")))
      .orderBy("doc_id")
      .as[Multimodal.ImageGridStats].collect().toSeq
    val a = 'a'.toInt.toLong
    assert(stats(0) == Multimodal.ImageGridStats(1L, 72 * a, 72 * a * a, a, a))
    assert(stats(1).lmax - stats(1).lmin > 15) // varied text: not flat
    // and the moments match direct char math for the varied doc
    val t = "the quick brown fox jumps over the lazy dog vexingly"
    val vals = (0 until 72).map(i => t.charAt(i % t.length).toInt.toLong)
    assert(stats(1) == Multimodal.ImageGridStats(2L, vals.sum,
      vals.map(v => v * v).sum, vals.min, vals.max))
  }

  test("dhashOf drops undecodable payloads; imageAssets matches char math") {
    val junk = Seq((9L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    assert(Multimodal.dhashOf(junk).count() == 0L)
    // the staged 9×8 assets decode back to the text's character codes:
    // dhash equals the direct definition over the cycled char grid
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val dh = Multimodal.dhashOf(Multimodal.imageAssets(docs((5L, text))))
      .as[Multimodal.ImageHash].head()
    val expected = (0 until 64).foldLeft(0L) { (acc, b) =>
      val i = (b / 8) * 9 + (b % 8)
      val l = text.charAt(i % text.length).toInt
      val r = text.charAt((i + 1) % text.length).toInt
      if (l < r) acc | (1L << b) else acc
    }
    assert(dh == Multimodal.ImageHash(5L, expected))
  }
}
