package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.BloomExprs

import graft.functions.PortableHash

/** Explicit bloom-filter-pruned semi-join — the "runtime row-level
  * filter" pattern (what `spark.sql.optimizer.runtime.bloomFilter.*`
  * injects for selective joins) as a first-class operator, for when the
  * filtering side is TOO BIG to broadcast as a hash relation but its
  * bloom sketch is not.
  *
  * Shape: the key set aggregates into ONE binary bloom value (partial
  * sketches merge map-side — constant-size buffers); it reaches the
  * big side as a scalar subquery (evaluated once, shipped to tasks as
  * a bound constant), where `might_contain` drops non-matching rows
  * BEFORE the semi-join shuffle. The final left-semi
  * hash join makes the result EXACT — the bloom's false positives
  * (~1%) just ride through the prefilter and are removed there; no
  * false negatives exist by construction, so the prefilter never drops
  * a matching row.
  *
  * At 100 TB the win is shuffle volume: a 1%-selectivity semi-join
  * shuffles ~1% of the big side instead of all of it, for the price of
  * one broadcast measured in KB/MB (8 bits per expected key). The
  * pattern degrades gracefully — a saturated bloom only loses pruning,
  * never correctness. */
object BloomJoin {

  /** Exact `big SEMI JOIN keys` with a bloom prefilter on the big side.
    * `keys` must be a single-column frame of join keys (any row
    * multiplicity — the bloom and the semi-join both tolerate dups). */
  def bloomPrunedSemiJoin(big: DataFrame, keys: DataFrame,
                          key: String, expectedItems: Long): DataFrame = {
    val bloom = keys.agg(BloomExprs.bloomAgg(col(key), expectedItems).as("__bf"))
    // no .distinct() on the build side: a left_semi hash join already
    // tolerates duplicate build keys, and the distinct would add a full
    // shuffle+aggregate over the key set the join makes redundant
    big.filter(BloomExprs.mightContain(bloom, col(key)))
      .join(keys, Seq(key), "left_semi")
  }

  /** Portable Bloom-filter false-positive audit (Bloom 1970) — the
    * measured-FPR companion the sketch family's CMS/KMV audits get and
    * [[bloomPrunedSemiJoin]]'s opaque engine filter can't give: build
    * an m-bit / k-lane filter over the md5 `lane:key` hash family
    * (the cms_topk lanes — fully portable, so the DuckDB twin builds
    * the IDENTICAL filter), probe it with the non-member keys, and
    * report load (bits_set/m) and the measured false-positive rate.
    * The filter is modeled relationally as the DISTINCT (bit) set —
    * semantically the bit array, sized ≤ m rows at any corpus scale.
    *
    * Shape: members collapse to the distinct key set once (tracked,
    * reused by the bit build and the probe anti-join); probes expand
    * ×k lanes, semi-join the broadcast ≤m-row bit set, and a key is a
    * false positive iff ALL k of its lane rows survive (count == k —
    * duplicate bit values within a key's lanes keep their own rows, so
    * the count stays exact). One summary row out. */
  def bloomFpr(members: DataFrame, probes: DataFrame,
               mBits: Int = 65536, kLanes: Int = 3): DataFrame = {
    def bit(lane: Column, k: Column) = pmod(
      PortableHash.hash32(concat(lane.cast("string"), lit(":"),
        k.cast("string"))), lit(mBits.toLong))
    def lanes = explode(array((0 until kLanes).map(i => lit(i)): _*))
    val keys = graft.Caches.track(
      members.select(col(members.columns.head).as("k")).distinct())
    val bits = graft.Caches.track(
      keys.select(col("k"), lanes.as("lane"))
        .select(bit(col("lane"), col("k")).as("bit"))
        .distinct())
    val nonMembers = graft.Caches.track(
      probes.select(col(probes.columns.head).as("k")).distinct()
        .join(keys, Seq("k"), "leftanti"))
    val falsePos = nonMembers.select(col("k"), lanes.as("lane"))
      .select(col("k"), bit(col("lane"), col("k")).as("bit"))
      .join(broadcast(bits), Seq("bit"), "leftsemi")
      .groupBy("k").agg(count(lit(1)).as("h"))
      .filter(col("h") === kLanes)
      .agg(count(lit(1)).as("false_pos"))
    keys.agg(count(lit(1)).as("n_keys"))
      .crossJoin(broadcast(bits.agg(count(lit(1)).as("bits_set"))))
      .crossJoin(broadcast(nonMembers.agg(count(lit(1)).as("n_probes"))))
      .crossJoin(broadcast(falsePos))
      .select(lit(mBits.toLong).as("m_bits"),
        lit(kLanes.toLong).as("k_lanes"), col("n_keys"),
        col("bits_set"), col("n_probes"), col("false_pos"),
        expr("(1000000 * false_pos) div greatest(n_probes, 1)")
          .as("fpr_ppm"))
  }
}
