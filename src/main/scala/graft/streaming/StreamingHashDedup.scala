package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.{col, explode, lit, shiftright, struct}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming perceptual-hash near-dup detection — the unbounded-stream
  * sibling of [[graft.operators.Dedup.hash64Neardup]] for 64-bit
  * signatures (image dHash, simhash): as hashed assets arrive, emit
  * (doc_a, doc_b, hamming) for every pair within `maxHamming` — the
  * online image-dedup gate a media-ingestion pipeline runs before
  * paying for storage or featurization.
  *
  * Shape mirrors [[StreamingNearDup]] exactly: the stateless band
  * projection (the batch nBands × (64/nBands)-bit band recipe, the
  * SAME `nBands` dial as [[graft.operators.Dedup.hash64Neardup]] —
  * VERDICT r16 #1: the measured 8×8 geometry holds 885 714 ppm recall
  * at Hamming 12 where the 4×16 default holds 71 428, at the price of
  * 256× hotter uniform buckets and 2× state rows) runs unchanged on
  * the stream; the stateful step keys by (band_id, band_val) — the
  * key the batch band JOIN shuffles on — and keeps each bucket's seen
  * (doc_id, hash) entries in `flatMapGroupsWithState` state; a new
  * arrival compares against bucket-mates only (|bucket| XOR+popcounts,
  * never corpus-wide).
  *
  * Contract divergences from the batch op, both deliberate:
  * identical hashes are NOT collapsed (a stream can't know a hash's
  * final multiplicity; exact dups emit as hamming-0 pairs, and the
  * batch op's rep collapse is a compaction the nightly pass applies),
  * and a pair sharing several bands emits once per shared band
  * (windowed uniqueness composes downstream via
  * `dropDuplicatesWithinWatermark`). State bounding (VERDICT r17 #3 —
  * the [[StreamingSemDedup]] contract, now uniform across all three
  * sibling streams): a STREAMING input must arm `stateTtlMs > 0` (a
  * processing-time timeout, exactly as [[StreamingNearDup]] documents
  * — pair with a paced trigger) or `maxBucketEntries > 0` (a
  * continuous most-recent window per bucket); the op REFUSES a
  * streaming input with both at 0, because each asset lands in nBands
  * buckets, so unbounded state multiplies by the band count (ADVICE
  * r15 #4). The TTL-0/cap-0 combination is reserved for the
  * batch-execution differential gate, where state must survive the
  * whole run by definition and the run itself bounds it.
  *
  * Runs unchanged on a BATCH frame (state starts empty, one group per
  * key) — the differential spec proves the streamed pair set equals
  * the brute-force Hamming pairs sharing ≥ 1 band.
  *
  * `probeBits = 1` is the batch lanes' 1-bit band multi-probe
  * ([[graft.operators.Dedup.hash64Neardup]] probeBits — the decided
  * sign-code geometry) made ONLINE via PROBE-ONLY rows: each arrival
  * fans, per band, its stored row plus the width single-bit flips
  * marked store = false; probe rows compare against a flip-bucket's
  * entries but never enter state, so state size is UNCHANGED and only
  * the per-trigger compare fan pays the (1 + 64/nBands)× price. A
  * pair whose closest band differs by one bit is caught by whichever
  * member arrives second (its probe row lands in the first member's
  * stored bucket — the XOR symmetry that lets the batch op expand one
  * join side only); within a trigger the doc_id sort gives the
  * later-sorted doc the probing role. Probe rows are STATELESS: a
  * duplicate delivery re-probes (and may re-emit), the same
  * per-colliding-bucket multiplicity contract as shared bands. */
object StreamingHashDedup {

  /** One banded hash row entering the bucket operator; `store = false`
    * marks a PROBE-ONLY row (a 1-bit band flip of the arrival), which
    * compares against the bucket's entries but never enters state. */
  case class BandedHash(doc_id: Long, h: Long, band_id: Int,
                        band_val: Long, store: Boolean)

  case class HashEntry(doc_id: Long, h: Long)
  case class HashBucket(entries: Seq[HashEntry])

  /** An emitted candidate: ids lowest-first + exact Hamming. */
  case class HashPair(doc_a: Long, doc_b: Long, hamming: Int)

  /** `hashes`: a (doc_id, <hashCol>) frame or stream.
    * `maxBucketEntries` (0 = unbounded): a CONTINUOUS most-recent
    * window per band bucket — the [[StreamingSemDedup]] maxMembers
    * discipline sized for 16-byte hash entries instead of full
    * vectors; evicted hashes no longer pair with later arrivals (the
    * documented lookback trade), and a hot bucket's per-trigger scan
    * is bounded by the cap instead of its history. */
  def nearDupStream(hashes: DataFrame, hashCol: String = "dhash",
                    maxHamming: Int = 10,
                    stateTtlMs: Long = 0L,
                    nBands: Int = 4,
                    maxBucketEntries: Int = 0,
                    probeBits: Int = 0): Dataset[HashPair] = {
    // same silent-zero-recall guard as the batch band projection
    // (ADVICE r17 #1): a non-divisor leaves high bits unbanded and
    // nBands = 1 wraps the mask to 0
    require(nBands >= 2 && 64 % nBands == 0,
      s"nBands must be a divisor of 64 in [2, 64], got $nBands")
    require(probeBits == 0 || probeBits == 1,
      s"probeBits is 0 (exact banding) or 1 (1-bit multi-probe), " +
        s"got $probeBits")
    // the StreamingSemDedup bounded-state contract (VERDICT r17 #3):
    // a STREAMING input must arm a TTL or the bucket cap — each asset
    // lands in nBands buckets, so unbounded state multiplies by the
    // band count; TTL 0 + cap 0 is reserved for the batch-execution
    // differential path, where the run itself bounds state
    require(!hashes.isStreaming || stateTtlMs > 0L || maxBucketEntries > 0,
      "a streaming input must bound its state: arm stateTtlMs (lookback " +
        "window) or maxBucketEntries (per-bucket cap); TTL 0 + cap 0 is " +
        "reserved for the batch differential path")
    val spark = hashes.sparkSession
    import spark.implicits._
    val width = 64 / nBands
    val mask = (1L << width) - 1
    // flip 0 is the STORED row; with probeBits = 1 each band also
    // fans the width single-bit flips as probe-only rows — a doc's
    // rows land in (1 + width) DISTINCT buckets per band, so no
    // bucket ever sees two rows of one doc
    val flips: Seq[Long] =
      if (probeBits == 0) Seq(0L) else 0L +: (0 until width).map(b => 1L << b)
    val banded = hashes
      .select(col("doc_id"), col(hashCol).as("h"),
        explode(org.apache.spark.sql.functions.array(
          (for (j <- 0 until nBands; f <- flips) yield struct(
            lit(j).as("band_id"),
            shiftright(col(hashCol), j * width).bitwiseAND(mask)
              .bitwiseXOR(lit(f)).as("band_val"),
            lit(f == 0L).as("store"))): _*)).as("b"))
      .select(col("doc_id"), col("h"), col("b.band_id"), col("b.band_val"),
        col("b.store"))
      .as[BandedHash]
    val timeoutConf =
      if (stateTtlMs > 0L) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout

    def onBucket(key: (Int, Long), arrivals: Iterator[BandedHash],
                 state: GroupState[HashBucket]): Iterator[HashPair] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        // Mutable buffer + doc_id hash set per trigger: arrival dedup
        // is O(1) membership instead of the O(|bucket|) exists-scan
        // that made a hot bucket O(n²) per trigger (ADVICE r15 #4).
        // The Hamming scan over bucket-mates below is the candidate
        // generation itself, not overhead.
        val entries = scala.collection.mutable.ArrayBuffer.empty[HashEntry]
        state.getOption.foreach(b => entries ++= b.entries)
        val seen = scala.collection.mutable.HashSet.empty[Long]
        entries.foreach(e => seen += e.doc_id)
        // armed cap: a continuous most-recent window (the start
        // pointer advances as arrivals land, so mid-trigger arrivals
        // see the same bounded lookback a cross-trigger one does).
        // `seen` tracks the LIVE window only — an evicted doc's id
        // leaves the set with its entry, so a re-arrival of an evicted
        // doc is admitted as new mid-trigger exactly as it would be in
        // a later trigger (ADVICE r17 #3: the symmetry must hold for
        // re-arrivals too, not just first arrivals)
        var start = 0
        val out = Seq.newBuilder[HashPair]
        def scan(d: BandedHash): Unit = {
          var ei = start
          while (ei < entries.length) {
            val s = entries(ei)
            if (s.doc_id != d.doc_id) {
              val ham = java.lang.Long.bitCount(s.h ^ d.h)
              if (ham <= maxHamming) {
                val (a, b) = if (s.doc_id < d.doc_id) (s.doc_id, d.doc_id)
                             else (d.doc_id, s.doc_id)
                out += HashPair(a, b, ham)
              }
            }
            ei += 1
          }
        }
        arrivals.toSeq.sortBy(_.doc_id).foreach { d =>
          if (!d.store) scan(d) // probe-only: compare, never store
          else if (seen.add(d.doc_id)) {
            scan(d)
            entries += HashEntry(d.doc_id, d.h)
            if (maxBucketEntries > 0 &&
                entries.length - start > maxBucketEntries) {
              seen -= entries(start).doc_id
              start += 1
            }
          }
        }
        state.update(HashBucket(entries.drop(start).toSeq))
        if (stateTtlMs > 0L) state.setTimeoutDuration(stateTtlMs)
        out.result().iterator
      }
    }

    banded.groupByKey(b => (b.band_id, b.band_val))
      .flatMapGroupsWithState[HashBucket, HashPair](
        OutputMode.Append, timeoutConf)(onBucket)
  }
}
