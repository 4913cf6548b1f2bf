package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Skew mitigation for joins (SURVEY §2.4 scale toolbox). A hash join
  * on a skewed key puts every row of the hot key into ONE task; at
  * 100 TB a single Zipf-head key can be a straggler that dominates the
  * stage. Salting splits each key's rows across `salts` sub-partitions
  * deterministically and replicates the (small) build side once per
  * salt, so the hot key's probe rows spread over `salts` tasks while
  * every row still meets its build match exactly once.
  *
  * This complements — not replaces — AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default): AQE splits
  * oversized SORT-MERGE partitions after the fact at shuffle-block
  * granularity; explicit salting also covers broadcast-ineligible
  * build sides, streaming state joins, and engines/plans AQE cannot
  * rewrite. The salt is a deterministic hash of a caller-chosen
  * tie-break column (never rand() — retries and speculative tasks
  * must salt identically or rows duplicate/vanish). */
object Skew {

  /** Inner-join `big` (skewed on `key`) with `small`, spreading each
    * key over `salts` sub-partitions. `tieBreak` is any big-side
    * column with per-row entropy (an id); output = exactly the rows of
    * the unsalted join, with a `__salt`-free schema. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 tieBreak: Column, salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "inputs must not contain a __salt column")
    val salted = big.withColumn("__salt",
      pmod(PortableHash.hash32(tieBreak.cast("string")), lit(salts.toLong))
        .cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Derive the salt factor [[saltedJoin]] needs so no (key, salt)
    * sub-partition exceeds `targetPerTask` probe rows:
    * ceil(max key count / target), min 1. Driver-side cost is ONE
    * aggregate row — the same sentinel pattern as `KMeans.deriveK` and
    * `Sampling.deriveBlockSize`, so the 100 TB salting decision is
    * code, not a hand-tuned constant. Equals the max `rec_salts` of
    * [[skewProfile]] over the same key by construction. */
  def deriveSalts(big: DataFrame, key: String, targetPerTask: Long): Int = {
    require(targetPerTask > 0, s"targetPerTask must be positive, got $targetPerTask")
    val maxN = big.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .agg(coalesce(max("n"), lit(0L))).head().getLong(0)
    math.max(1L, (maxN + targetPerTask - 1) / targetPerTask).toInt
  }

  /** Pre-join cardinality audit: EXACTLY how many rows an inner
    * equi-join on `key` would emit — computed without running the join.
    * Each side reduces to its per-key count table (map-side-combined
    * groupBy, the cheapest possible pass), the two VOCAB-sized count
    * tables join, and Σ n_left·n_right over matching keys is the join's
    * output size; max n_left·n_right is the single hottest key's
    * contribution — the "will this join explode / straggle" check run
    * BEFORE committing a 100 TB shuffle. Output is ONE row
    * (matching_keys, join_rows, max_key_rows); all-integer, engine-
    * exact. */
  def joinCardinality(left: DataFrame, right: DataFrame,
                      key: String): DataFrame = {
    val l = left.groupBy(col(key).cast("string").as("__k"))
      .agg(count(lit(1)).as("__nl"))
    val r = right.groupBy(col(key).cast("string").as("__k"))
      .agg(count(lit(1)).as("__nr"))
    l.join(r, "__k")
      .select((col("__nl") * col("__nr")).as("__rows"))
      .agg(count(lit(1)).as("matching_keys"),
        coalesce(sum("__rows"), lit(0L)).as("join_rows"),
        coalesce(max("__rows"), lit(0L)).as("max_key_rows"))
  }

  /** Join-key skew diagnostics — the measurement that DECIDES whether
    * (and how much) to salt before anyone pays for [[saltedJoin]]'s
    * build-side replication: the top-N keys by row count with their
    * corpus share in ppm and the salt factor that would cap any one
    * (key, salt) sub-partition at `targetPerTask` rows
    * (ceil(n / target), 1 for keys already under the cap).
    *
    * 100 TB shape: one map-side-combined groupBy on the key (the same
    * shuffle the join itself would pay), a 1-row total broadcast back,
    * and a rank window over the k-bounded survivors — the profile's
    * output is top-N-sized regardless of corpus size. All-integer
    * shares and ceilings so the recommendation is engine-exact. */
  def skewProfile(df: DataFrame, key: String, topN: Int = 10,
                  targetPerTask: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(key).cast("string").as("key"))
      .agg(count(lit(1)).as("n"))
    val total = counts.agg(sum("n").as("__total"))
    // orderBy+limit → TakeOrderedAndProject (map-side partial top-N,
    // never a global sort); the rank window then runs over topN rows
    val top = counts.orderBy(col("n").desc, col("key")).limit(topN)
    top.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n").desc, col("key"))))
      .select(col("rank").cast("int").as("rank"), col("key"), col("n"),
        expr("(1000000 * n) div __total").as("share_ppm"),
        expr(s"(n + $targetPerTask - 1) div $targetPerTask")
          .as("rec_salts"))
  }
}
