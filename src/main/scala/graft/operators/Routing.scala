package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sink-side physical semantics of the reference, expressed as relational
  * operators so they are oracle-checkable (SURVEY §2.1 S3/S4/S6/S8/S11).
  */
object Routing {

  /** S4: partition-key → shard routing (go :209, 2nd arg of Add).
    * Kinesis assigns a shard by hashing the partition key; we model it as
    * an engine-portable deterministic hash (md5 first hex char) so the
    * DuckDB oracle can reproduce shard ids exactly. At scale this is the
    * column you `repartition(numShards, ...)` on — same hash-partition
    * semantics Spark applies in its exchange. */
  def shardFor(key: Column, numShards: Int): Column =
    ascii(substring(md5(key.cast("binary")), 1, 1)) % numShards

  /** Route a payload DataFrame: assign shard and hash-partition by it so
    * each task writes one shard's records — the distributed equivalent of
    * the producer's per-shard batching. */
  def routed(payload: DataFrame, keyCol: String, numShards: Int): DataFrame =
    payload.withColumn("shard", shardFor(col(keyCol), numShards))
      .repartition(numShards, col("shard"))

  /** S3/S11: the producer groups buffered records into batches of
    * `batchSize` per shard in arrival order (go batchproducer, config
    * :139). Batch assignment is a windowed row_number per shard — at
    * scale each shard's window sorts only that shard's partition. */
  def withBatchIds(df: DataFrame, shard: Column, orderBy: Seq[Column],
                   batchSize: Int): DataFrame = {
    val w = Window.partitionBy(shard).orderBy(orderBy: _*)
    // floor-division (`div`), not `/` + cast: Spark casts double→long by
    // truncation but DuckDB rounds, so both sides must use integer div.
    df.withColumn("seq_in_shard", row_number().over(w))
      .withColumn("batch_id", expr(s"(seq_in_shard - 1) div $batchSize").cast("long"))
  }

  /** S8: per-fetch record cap (readstream.py:32, limit=500) — batch
    * analog: deterministic top-N by offset. */
  def fetchLimit(df: DataFrame, orderKey: Column, n: Int): DataFrame =
    df.orderBy(orderKey).limit(n)

  /** S6/S7: offset positioning (AT_SEQUENCE_NUMBER, readstream.py:26) —
    * batch analog: resume the scan from a given offset. The predicate is
    * pushed down to the parquet scan by Catalyst. */
  def resumeFrom(df: DataFrame, offsetCol: Column, offset: Long): DataFrame =
    df.filter(offsetCol >= offset)
}
