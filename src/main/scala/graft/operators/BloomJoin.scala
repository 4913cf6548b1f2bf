package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.BloomExprs

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
}
