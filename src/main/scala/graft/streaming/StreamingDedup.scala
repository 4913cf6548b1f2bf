package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming exact deduplication — the unbounded-stream twin of the
  * batch `Events.exactDedup` (§2.4): keep the first arrival per key,
  * drop later duplicates.
  *
  * Built on `dropDuplicatesWithinWatermark`, which is the ONLY
  * state-bounded shape that survives an unbounded stream: plain
  * `dropDuplicates` on a stream keeps every key ever seen in the state
  * store forever; the within-watermark variant drops a key's state as
  * soon as the watermark passes its event time + delay, so state size
  * is bounded by (throughput × watermark delay), not by history. The
  * trade is explicit and documented: a duplicate arriving AFTER its
  * key's state expired is emitted again — at 100 TB/day that is the
  * correct trade (exactly the one Kafka/Kinesis consumers make), and
  * the re-emission window is directly tunable by the watermark delay.
  *
  * State is keyed by `keys` in the RocksDB-backed state store on a
  * production cluster, hash-partitioned — one shuffle, no driver
  * state.
  */
object StreamingDedup {

  /** First-arrival-wins dedup on `keys` over a stream that already
    * carries a watermark (set `withWatermark` upstream — the watermark
    * column must be among the dedup state's expiry inputs). */
  def exactDedupStream(events: DataFrame, keys: Seq[String]): DataFrame =
    events.dropDuplicatesWithinWatermark(keys)
}
