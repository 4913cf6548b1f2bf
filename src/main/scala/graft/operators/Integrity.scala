package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Anti-entropy table checksums (SURVEY §2.4 extension surface): the
  * order-independent fingerprint two replicas (or a source and its
  * replicated/exported copy) compare to detect divergence without
  * shipping rows — the Merkle-leaf primitive of Dynamo/Cassandra-style
  * repair, expressed as one aggregate.
  *
  * Determinism: each row serializes to an explicit, typed string
  * (epoch-µs for time — no formatter), hashes through md5 (the
  * engine-portable lane this library already uses for routing and
  * dedup), keeps 48 bits, and SUMS — addition is commutative, so the
  * checksum is independent of row order, partitioning, and combine
  * order. The sum runs in a DECIMAL(38,0) lane and reduces mod 2⁶² so
  * the emitted value is a plain BIGINT on any engine at any row count. */
object Integrity {

  private val Mod = 4611686018427387904L // 2^62

  /** Collision-proof field serialization (the r11 ADVICE finding: bare
    * concat_ws skips NULLs and leaves the delimiter unescaped, so
    * ('a|b', NULL) and ('a','b') — or a NULL/empty shift across
    * columns — collided to one hash and misread as "unchanged").
    * Every field escapes backslash then the delimiter; NULL renders as
    * the sentinel `\N`, which no non-null field can produce (a literal
    * "\N" escapes to "\\N"). The serialization is therefore injective
    * per row, so equal hashes ⇔ equal rows up to md5 collision. */
  private def serField(c: Column): Column =
    coalesce(replace(replace(c.cast("string"), lit("\\"), lit("\\\\")),
      lit("|"), lit("\\|")), lit("\\N"))

  private def rowSer(cols: Seq[Column]): Column =
    concat_ws("|", cols.map(serField): _*)

  /** Per-shard checksums over `events` (shard = user_id mod nShards —
    * the same key a replicated store would range-partition on): each
    * shard row carries its row count and order-independent checksum, so
    * two copies diff shard-by-shard and re-sync only unequal shards.
    * One map-side-combined aggregate; output = nShards rows at any
    * scale. `value` (IEEE double) is deliberately NOT serialized — a
    * float printer is an engine-specific function; the checksum covers
    * the identity/time/dimension columns. */
  def checksumShards(events: DataFrame, nShards: Int = 16): DataFrame =
    events
      .select(pmod(col("user_id"), lit(nShards.toLong)).as("shard"),
        conv(substring(md5(rowSer(Seq(col("event_id"),
            unix_micros(col("ts")), col("user_id"), col("event_type"),
            col("props"))).cast("binary")), 1, 12), 16, 10)
          .cast("long").as("h48"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"),
        expr(s"CAST(pmod(sum(CAST(h48 AS DECIMAL(38,0))), ${Mod}L) AS BIGINT)")
          .as("checksum"))
      .orderBy(col("shard"))

  /** Snapshot reconciliation — the itemizing step after
    * [[checksumShards]] detects divergence: given two keyed snapshots
    * of the same table (yesterday's export vs today's, a source vs its
    * replica), classify every key as added / removed / changed /
    * unchanged and count each class. Rows compare by ONE md5 row hash
    * over an explicit serialization (never column-by-column predicates
    * that drift as the schema grows); the classification itself is
    * engine-independent because equal serializations hash equal and
    * differing ones differ.
    *
    * Scale shape: one full-outer equi-join on the key — both sides
    * shuffle-partition on it, nothing but (key, 32-char hash) crosses
    * the join — then a 4-row aggregate. At 100 TB this is the cheapest
    * exact diff there is; the checksum pass prunes equal shards first
    * so the join only runs over suspect partitions. */
  def snapshotDiff(a: DataFrame, b: DataFrame, key: String,
                   hashCols: Seq[String]): DataFrame = {
    val ser = md5(rowSer(hashCols.map(col)).cast("binary"))
    val ha = a.select(col(key).as("key_a"), ser.as("hash_a"))
    val hb = b.select(col(key).as("key_b"), ser.as("hash_b"))
    ha.join(hb, col("key_a") === col("key_b"), "full_outer")
      .select(
        when(col("key_a").isNull, "added")
          .when(col("key_b").isNull, "removed")
          .when(col("hash_a") =!= col("hash_b"), "changed")
          .otherwise("unchanged").as("status"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_rows"))
      .orderBy(col("status"))
  }
}
