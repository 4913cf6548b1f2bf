package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Dedup

/** Streaming LSH near-duplicate candidate detection — the unbounded-
  * stream sibling of the batch minhash tier ([[Dedup.pairsFromSigs]] +
  * [[Dedup.jaccardEstForPairs]]): as documents arrive, emit (doc_a,
  * doc_b, matches, est_milli) for every pair whose minhash lane
  * agreement clears `estMilli` — the online front half of the tiered
  * dedup judgement, with exact verification left to a downstream
  * batch pass over the (tiny) candidate stream.
  *
  * Shape: the stateless projections run unchanged on the stream — the
  * 16-lane md5 signature ([[Dedup.signatures]]) and the shared band-key
  * recipe ([[Dedup.bandedSigs]]) are the SAME code the batch tier
  * runs. The stateful step keys by (band_id, band_key) — the exact key
  * the batch band JOIN shuffles on — and keeps each bucket's seen
  * (doc_id, signature) entries in `flatMapGroupsWithState` state; a
  * new arrival compares against its bucket-mates only (|bucket|
  * comparisons of 16 longs — never corpus-wide), exactly the
  * candidate-generation work the batch equi-join does per band.
  *
  * State contract (the StreamingDedup trade, stated the same way;
  * VERDICT r17 #3: a STREAMING input now REFUSES TTL 0 + cap 0 — the
  * unbounded combination is batch-differential-only, as in
  * [[StreamingSemDedup]] and [[StreamingHashDedup]]):
  * bucket state grows with the docs seen per band key, so an unbounded
  * run MUST bound it — `stateTtlMs > 0` arms a processing-time timeout
  * that drops a bucket's state `stateTtlMs` after its last arrival
  * (state size ≈ throughput × TTL, tunable; a near-dup arriving after
  * its mate's bucket expired is missed — the same re-emission-window
  * trade `dropDuplicatesWithinWatermark` makes, in the other
  * direction). With timeouts armed, the micro-batch engine schedules
  * batches to FIRE them even without data — pair an armed TTL with a
  * paced `Trigger.ProcessingTime(...)` in production; the default
  * immediate trigger would spin empty timeout batches. Two batch-vs-stream divergences, both deliberate:
  * a pair sharing SEVERAL bands is emitted once per shared band
  * (the batch tier's `.distinct()` is unbounded state on a stream —
  * compose `dropDuplicatesWithinWatermark(doc_a, doc_b)` downstream
  * for windowed uniqueness), and candidate order follows arrival
  * order, not doc_id order (pair ids are still emitted lowest-first).
  *
  * Runs unchanged on a BATCH frame (state starts empty, one group per
  * key) — the differential spec uses exactly that to prove the
  * streamed candidate SET equals the batch tier's est-gated pairs. */
object StreamingNearDup {

  /** One banded signature row entering the bucket operator. */
  case class Banded(doc_id: Long, sig: Seq[Long],
                    band_id: Int, band_key: String)

  /** A bucket's seen entries (doc_id + full signature, ~16 longs). */
  case class SigEntry(doc_id: Long, sig: Seq[Long])
  case class BucketState(entries: Seq[SigEntry])

  /** An emitted candidate: ids lowest-first, lane agreement, and the
    * integer milli estimate the batch tier would assign the pair. */
  case class Candidate(doc_a: Long, doc_b: Long,
                       matches: Long, est_milli: Long)

  /** `maxBucketEntries` (0 = unbounded): a CONTINUOUS most-recent
    * window per band bucket — the [[StreamingSemDedup]] maxMembers
    * discipline for the signature lane (~16 longs per entry); evicted
    * docs no longer pair with later arrivals (the lookback trade),
    * and a hot bucket's per-trigger scan is bounded by the cap. */
  def nearDupStream(docs: DataFrame, estMilli: Long = 500L,
                    numHashes: Int = 16, bands: Int = 4,
                    stateTtlMs: Long = 0L,
                    maxBucketEntries: Int = 0): Dataset[Candidate] = {
    // signature-lane analog of the 64-bit nBands guard (ADVICE r17
    // #1): a non-divisor leaves the trailing numHashes mod bands
    // lanes out of every band key — silent recall loss, not an error
    require(bands >= 1 && numHashes % bands == 0,
      s"bands must divide numHashes ($numHashes), got $bands")
    // the StreamingSemDedup bounded-state contract (VERDICT r17 #3):
    // signature entries are ~16 longs, and each doc lands in `bands`
    // buckets — a streaming input must arm the TTL or the bucket cap;
    // TTL 0 + cap 0 is reserved for the batch differential path
    require(!docs.isStreaming || stateTtlMs > 0L || maxBucketEntries > 0,
      "a streaming input must bound its state: arm stateTtlMs (lookback " +
        "window) or maxBucketEntries (per-bucket cap); TTL 0 + cap 0 is " +
        "reserved for the batch differential path")
    val spark = docs.sparkSession
    import spark.implicits._
    val banded = Dedup.bandedSigs(Dedup.signatures(docs, numHashes),
        numHashes, bands)
      .select(col("doc_id"), col("__sig").as("sig"),
        col("band_id"), col("band_key"))
      .as[Banded]
    val timeoutConf =
      if (stateTtlMs > 0L) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout

    def onBucket(key: (Int, String), arrivals: Iterator[Banded],
                 state: GroupState[BucketState]): Iterator[Candidate] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        // Vector, not List: a hot bucket appends per arrival, and a
        // List `:+` is O(n) — quadratic over the bucket's lifetime
        var entries = state.getOption
          .map(_.entries.toVector).getOrElse(Vector.empty)
        val out = Seq.newBuilder[Candidate]
        // deterministic within-trigger order so a re-run of the same
        // batch emits identically
        arrivals.toSeq.sortBy(_.doc_id).foreach { d =>
          if (!entries.exists(_.doc_id == d.doc_id)) {
            entries.foreach { s =>
              val m = s.sig.iterator.zip(d.sig.iterator)
                .count { case (x, y) => x == y }.toLong
              val est = 1000L * m / numHashes
              if (est >= estMilli) {
                val (a, b) = if (s.doc_id < d.doc_id) (s.doc_id, d.doc_id)
                             else (d.doc_id, s.doc_id)
                out += Candidate(a, b, m, est)
              }
            }
            entries = entries :+ SigEntry(d.doc_id, d.sig)
            // armed cap: continuous most-recent window (eviction in
            // arrival order, mid-trigger included)
            if (maxBucketEntries > 0 && entries.length > maxBucketEntries)
              entries = entries.drop(entries.length - maxBucketEntries)
          }
        }
        state.update(BucketState(entries))
        if (stateTtlMs > 0L) state.setTimeoutDuration(stateTtlMs)
        out.result().iterator
      }
    }

    banded.groupByKey(b => (b.band_id, b.band_key))
      .flatMapGroupsWithState[BucketState, Candidate](
        OutputMode.Append, timeoutConf)(onBucket)
  }
}
