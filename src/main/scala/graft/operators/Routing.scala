package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.PortableHash

/** Sink-side physical semantics of the reference, expressed as relational
  * operators so they are oracle-checkable (SURVEY §2.1 S3/S4/S6/S8/S11).
  */
object Routing {

  /** S4: partition-key → shard routing (go :209, 2nd arg of Add).
    * Kinesis assigns a shard by hashing the partition key; we model it as
    * a full-width deterministic hash (first 32 bits of md5) so the DuckDB
    * oracle can reproduce shard ids exactly AND the distribution stays
    * uniform at any shard count — at scale this is the column you
    * `repartition(numShards, ...)` on, so its entropy caps cluster
    * parallelism. */
  def shardFor(key: Column, numShards: Int): Column =
    (PortableHash.hash32(key) % numShards).cast("int")

  /** Route a payload DataFrame: assign shard and hash-partition by it so
    * each task writes one shard's records — the distributed equivalent of
    * the producer's per-shard batching. */
  def routed(payload: DataFrame, keyCol: String, numShards: Int): DataFrame =
    payload.withColumn("shard", shardFor(col(keyCol), numShards))
      .repartition(numShards, col("shard"))

  /** Rendezvous / highest-random-weight routing audit (Thaler & Ravi-
    * shankar 1998) — the resharding story [[shardFor]]'s modulo can't
    * tell: under modulo, growing k→k+1 remaps ~k/(k+1) of ALL keys;
    * under HRW (shard = argmax over s of h(s:key)) a key moves ONLY
    * when the NEW shard's lane wins, so exactly the ~1/(k+1) mass that
    * lands on the new shard moves and no key ever moves BETWEEN old
    * shards. Emits per shard the population at k and at k+1 plus the
    * arrivals; the structural invariant (moved_in = 0 for every old
    * shard, n_k1 ≤ n_k) is the gate.
    *
    * Shape: pure map pass — per doc, argmax of k+1 md5 lanes as a
    * lexicographic greatest(struct(h, s)) (tie to the higher shard id;
    * the twin's row_number (h DESC, s DESC) picks identically) — then
    * two shard-count aggregates full-outer-joined; |shards|+1 rows out
    * at any corpus scale. */
  def rendezvousShards(docs: DataFrame, k: Int = 8): DataFrame = {
    require(k >= 2, "need at least two shards for greatest()")
    def lane(s: Int) = struct(
      PortableHash.hash32(
        concat(lit(s"$s:"), col("doc_id").cast("string"))).as("h"),
      lit(s.toLong).as("s"))
    val assigned = docs.select(col("doc_id"),
      greatest((0 until k).map(lane): _*).getField("s").as("shard_k"),
      greatest((0 to k).map(lane): _*).getField("s").as("shard_k1"))
    val atK = assigned.groupBy(col("shard_k").as("shard"))
      .agg(count(lit(1)).as("n_k"))
    val atK1 = assigned.groupBy(col("shard_k1").as("shard"))
      .agg(count(lit(1)).as("n_k1"),
        sum(when(col("shard_k") =!= col("shard_k1"), 1L).otherwise(0L))
          .as("moved_in"))
    atK.join(atK1, Seq("shard"), "full_outer")
      .select(col("shard"), coalesce(col("n_k"), lit(0L)).as("n_k"),
        coalesce(col("n_k1"), lit(0L)).as("n_k1"),
        coalesce(col("moved_in"), lit(0L)).as("moved_in"))
      .orderBy("shard")
  }

  /** S3/S11: the producer groups buffered records into batches of
    * `batchSize` per shard in arrival order (go batchproducer, config
    * :139).
    *
    * Scale design: a naive `row_number() over (partition by shard)` sorts
    * each shard's ENTIRE history in one task — with 4 shards that is a
    * 4-task ceiling, unusable at 100 TB. Instead we bucket time (daily),
    * number rows within (shard, bucket) — parallelism = shards × buckets
    * — and add each bucket's start offset, computed from a tiny
    * per-(shard, bucket) count table that is broadcast back. Output is
    * identical to the global per-shard row_number because the order key
    * (time, tieBreak) sorts bucket-majorly by construction. */
  def withBatchIds(df: DataFrame, shard: Column, time: Column,
                   tieBreak: Column, batchSize: Int): DataFrame = {
    val bucketed = df.withColumn("__shard", shard)
      .withColumn("__bucket", date_trunc("day", time))
    val counts = bucketed.groupBy(col("__shard"), col("__bucket")).count()
    val offsets = counts.withColumn("__offset",
        coalesce(sum("count").over(
          Window.partitionBy(col("__shard")).orderBy(col("__bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("count")
    val w = Window.partitionBy(col("__shard"), col("__bucket"))
      .orderBy(time, tieBreak)
    bucketed
      .join(broadcast(offsets), Seq("__shard", "__bucket"))
      // stays LONG: the whole point of bucketing is unbounded per-shard
      // history, where a global position overflows int32
      .withColumn("seq_in_shard",
        row_number().over(w) + col("__offset"))
      .withColumn("batch_id", expr(s"(seq_in_shard - 1) div $batchSize").cast("long"))
      .drop("__shard", "__bucket", "__offset")
  }

  /** S8: per-fetch record cap (readstream.py:32, limit=500) — batch
    * analog: deterministic top-N by offset. Compiles to
    * TakeOrderedAndProject (per-partition top-N + merge), no global sort. */
  def fetchLimit(df: DataFrame, orderKey: Column, n: Int): DataFrame =
    df.orderBy(orderKey).limit(n)

  /** S6/S7: offset positioning (AT_SEQUENCE_NUMBER, readstream.py:26) —
    * batch analog: resume the scan from a given offset. The predicate is
    * pushed down to the parquet scan by Catalyst. */
  def resumeFrom(df: DataFrame, offsetCol: Column, offset: Long): DataFrame =
    df.filter(offsetCol >= offset)
}
