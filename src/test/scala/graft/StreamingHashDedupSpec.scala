package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingHashDedup

/** Streaming perceptual-hash dedup: the stateful band-bucket operator
  * must find exactly the pairs a brute-force Hamming scan over the
  * band-sharing pairs finds — including pairs whose members arrive in
  * different triggers — and nothing among unrelated hashes. */
case class Hashed(doc_id: Long, dhash: Long)

class StreamingHashDedupSpec extends SparkTestBase {
  import spark.implicits._

  // hand-built 64-bit hashes with controlled band structure:
  // doc 2 = base ^ 0x3 (hamming 2, bands 1-3 shared with doc 1);
  // doc 6 = base ^ 0x7_0001 (hamming 4 to doc 1, bands 2-3 shared);
  // doc 4 = ~base (hamming 64 — no shared band, never a candidate);
  // doc 5 is unrelated filler (hamming 32 to base)
  private val base = 0x1234_5678_9abc_def0L
  private val batch1 = Seq(
    Hashed(1L, base),
    Hashed(5L, 0x0f0f_0f0f_0f0f_0f0fL)) // unrelated to base (ham 32)
  private val batch2 = Seq(
    Hashed(2L, base ^ 0x3L), // hamming 2, shares bands 1..3 with doc 1
    Hashed(4L, ~base), // complement: hamming 64 to 1, 32 to 5
    Hashed(6L, base ^ 0x7_0001L)) // hamming 4 to 1, 2 to... (bands 2,3 shared)

  /** Brute-force reference, GEOMETRY-AGNOSTIC (VERDICT r16 #1): pairs
    * sharing >= 1 of the nBands (64/nBands)-bit bands with
    * Hamming <= maxHamming. */
  private def reference(maxHamming: Int, nBands: Int = 4,
                        docs: Seq[Hashed] = batch1 ++ batch2)
      : Set[(Long, Long, Int)] = {
    val width = 64 / nBands
    val mask = (1L << width) - 1
    (for {
      a <- docs; b <- docs if a.doc_id < b.doc_id
      shared = (0 until nBands).exists(j =>
        ((a.dhash >> (j * width)) & mask) == ((b.dhash >> (j * width)) & mask))
      ham = java.lang.Long.bitCount(a.dhash ^ b.dhash)
      if shared && ham <= maxHamming
    } yield (a.doc_id, b.doc_id, ham)).toSet
  }

  test("cross-trigger pairs: streamed set ≡ band-sharing Hamming pairs") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Hashed]
    // streaming inputs must arm a bound (VERDICT r17 #3); the cap of
    // 64 is far above any fixture bucket, so behavior is unchanged
    val q = StreamingHashDedup.nearDupStream(input.toDF(), maxHamming = 10,
        maxBucketEntries = 64)
      .writeStream.format("memory").queryName("hashdedup")
      .outputMode("append").start()
    input.addData(batch1: _*)
    q.processAllAvailable()
    val afterFirst = spark.table("hashdedup").count()
    input.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()
    assert(afterFirst == 0L, "unrelated first trigger must emit nothing")
    val rows = spark.table("hashdedup")
      .as[(Long, Long, Int)].collect().toSet
    val ref = reference(10)
    assert(rows == ref, s"streamed $rows != reference $ref")
    // the hamming-2 pair crossed triggers: state carried over
    assert(rows.exists(r => r._1 == 1L && r._2 == 2L && r._3 == 2))
  }

  test("nBands=8 stream catches the cross-trigger straddle 4x16 misses " +
      "(VERDICT r16 #1) and still equals its brute-force reference") {
    // One flip in the low byte of each 16-bit band: no 16-bit band
    // survives (the 4x16 stream admits the near-dup) but all four
    // high bytes do (the 8x8 stream emits the hamming-4 pair) — the
    // straddle arrives in a LATER trigger, so catching it exercises
    // bucket state, not just the projection
    implicit val sqlCtx = spark.sqlContext
    val base2 = 0x0fed_cba9_8765_4321L
    val straddle = Hashed(9L,
      base2 ^ ((1L << 0) | (1L << 16) | (1L << 32) | (1L << 48)))
    val first = Seq(Hashed(7L, base2))
    def run(nBands: Int): Set[(Long, Long, Int)] = {
      val input = MemoryStream[Hashed]
      val name = s"hashdedup_g$nBands"
      val q = StreamingHashDedup.nearDupStream(input.toDF(),
          maxHamming = 12, nBands = nBands, maxBucketEntries = 64)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      input.addData(first: _*)
      q.processAllAvailable()
      input.addData(straddle)
      q.processAllAvailable()
      q.stop()
      spark.table(name).as[(Long, Long, Int)].collect().toSet
    }
    val docs = first :+ straddle
    val wide = run(4)
    val narrow = run(8)
    assert(wide == reference(12, 4, docs) && wide.isEmpty,
      s"4x16 must miss the all-band straddle: $wide")
    assert(narrow == reference(12, 8, docs) &&
        narrow == Set((7L, 9L, 4)),
      s"8x8 must emit the straddle pair across triggers: $narrow")
  }

  test("batch execution with armed TTL wiring changes nothing") {
    val out = StreamingHashDedup.nearDupStream(
        (batch1 ++ batch2).toDF(), maxHamming = 10, stateTtlMs = 60000L)
      .collect().map(p => (p.doc_a, p.doc_b, p.hamming)).toSet
    assert(out == reference(10))
  }

  test("maxBucketEntries caps the per-bucket lookback: an evicted " +
      "hash no longer pairs with later arrivals") {
    // three identical hashes in one bucket stream in doc_id order;
    // with cap 1 the window holds only the most-recent entry, so doc
    // 3 pairs with 2 but NOT with the evicted 1 — the uncapped run
    // emits all three pairs
    val same = Seq(Hashed(1L, base), Hashed(2L, base), Hashed(3L, base))
    def pairsWith(cap: Int): Set[(Long, Long)] =
      StreamingHashDedup.nearDupStream(same.toDF(), maxHamming = 0,
          maxBucketEntries = cap)
        .collect().map(p => (p.doc_a, p.doc_b)).toSet
    assert(pairsWith(0) == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(pairsWith(1) == Set((1L, 2L), (2L, 3L)),
      "cap 1 must evict doc 1 before doc 3 arrives")
  }

  test("probeBits=1 online: the one-flip-per-band pair exact 8x8 misses " +
      "is caught by probe-only rows, cross- AND same-trigger; state " +
      "stays exact-bucket-only") {
    implicit val sqlCtx = spark.sqlContext
    // one flip in the LOW bit of each 8-bit band: every band differs
    // by exactly 1 bit -> exact 8x8 never collides; every band is one
    // flip away -> the probe fan collides in all 8 buckets (hamming 8)
    val base2 = 0x1234_5678_9abc_def0L
    val oneEach = Hashed(9L,
      base2 ^ (0 until 8).map(b => 1L << (8 * b)).reduce(_ | _))
    def run(pb: Int, triggers: Seq[Seq[Hashed]], name: String)
        : Set[(Long, Long, Int)] = {
      val input = MemoryStream[Hashed]
      val q = StreamingHashDedup.nearDupStream(input.toDF(),
          maxHamming = 12, nBands = 8, maxBucketEntries = 64,
          probeBits = pb)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      triggers.foreach { t =>
        input.addData(t: _*)
        q.processAllAvailable()
      }
      q.stop()
      spark.table(name).as[(Long, Long, Int)].collect().toSet
    }
    val cross = Seq(Seq(Hashed(7L, base2)), Seq(oneEach))
    assert(run(0, cross, "mp_exact").isEmpty,
      "one flip per band must defeat the exact 8x8 stream")
    assert(run(1, cross, "mp_cross") == Set((7L, 9L, 8)),
      "the second arrival's probe rows must find the stored first")
    // same trigger: the doc_id sort gives 9 the probing role over 7
    assert(run(1, Seq(Seq(Hashed(7L, base2), oneEach)), "mp_same")
      == Set((7L, 9L, 8)))
    // an unrelated hash (32 bits off) stays silent under the fan
    assert(run(1, Seq(Seq(Hashed(7L, base2)),
      Seq(Hashed(5L, 0x0f0f_0f0f_0f0f_0f0fL))), "mp_far").isEmpty)
  }

  test("streaming input without a state bound is refused; a non-divisor " +
      "nBands is refused (VERDICT r17 #3, ADVICE r17 #1/#4)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Hashed]
    val err = intercept[IllegalArgumentException] {
      StreamingHashDedup.nearDupStream(input.toDF())
    }
    assert(err.getMessage.contains("bound its state"))
    // nBands = 3 would leave bit 63 unbanded; nBands = 1 would wrap
    // the mask to 0 (every hash in one bucket) — both refused
    Seq(1, 3).foreach { g =>
      val geo = intercept[IllegalArgumentException] {
        StreamingHashDedup.nearDupStream(batch1.toDF(), nBands = g)
      }
      assert(geo.getMessage.contains("divisor"), s"nBands=$g")
    }
  }

  test("armed cap: a mid-trigger re-arrival of an EVICTED doc is " +
      "admitted as new, same as a cross-trigger one (ADVICE r17 #3)") {
    implicit val sqlCtx = spark.sqlContext
    // state holds doc 5; the next trigger delivers [3, 9, 5] (doc_id
    // order). With cap 1, doc 3 pairs with 5 and evicts it; 5's
    // re-arrival is then NEW (it left the window, so it left the seen
    // set too), re-enters, evicts 3, and pairs with 9 — the same
    // verdicts the arrivals would get spread over three triggers
    def run(triggers: Seq[Seq[Hashed]], name: String): Set[(Long, Long)] = {
      val input = MemoryStream[Hashed]
      val q = StreamingHashDedup.nearDupStream(input.toDF(),
          maxHamming = 0, maxBucketEntries = 1)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      triggers.foreach { t =>
        input.addData(t: _*)
        q.processAllAvailable()
      }
      q.stop()
      spark.table(name).as[(Long, Long, Int)].collect()
        .map(p => (p._1, p._2)).toSet
    }
    val d3 = Hashed(3L, base); val d5 = Hashed(5L, base)
    val d9 = Hashed(9L, base)
    val oneTrigger = run(Seq(Seq(d5), Seq(d3, d9, d5)), "rearr_mid")
    val spread = run(Seq(Seq(d5), Seq(d3), Seq(d5), Seq(d9)), "rearr_x")
    assert(oneTrigger == Set((3L, 5L), (5L, 9L)),
      s"mid-trigger re-arrival must re-enter the window: $oneTrigger")
    assert(oneTrigger == spread,
      s"mid-trigger ($oneTrigger) and cross-trigger ($spread) " +
        "re-arrivals must agree")
  }

  test("composition: sign codes make this the ONLINE embedding dedup gate") {
    import graft.operators.Similarity
    // an exact embedding copy (same signs → hamming 0) and a small
    // perturbation that flips exactly one sign; an unrelated vector
    // flips many — the stream flags the first two pairs and not the
    // third, with NO embedding-specific streaming code
    def v(head: Double*): Seq[Double] =
      head ++ Seq.fill(64 - head.size)(0.25)
    val emb = Seq(
      (1L, v(1.0, 1.0)),            // all 64 signs positive
      (2L, v(1.0, 1.0)),            // exact copy → hamming 0
      (3L, v(1.0, -0.1)),           // one sign flip vs 1 → hamming 1
      (4L, Seq.fill(64)(-0.5)))     // all signs flipped → no band shared
      .map { case (id, vec) => (id, vec.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
    val pairs = StreamingHashDedup.nearDupStream(
        Similarity.signCodes(emb), maxHamming = 1)
      .collect().map(p => (p.doc_a, p.doc_b, p.hamming)).toSet
    assert(pairs == Set((1L, 2L, 0), (1L, 3L, 1), (2L, 3L, 1)),
      s"got $pairs")
  }
}
