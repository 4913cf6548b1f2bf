package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join — for each left row, the most recent right row with the
  * same key at-or-before its timestamp. Spark has no native as-of
  * operator; the scalable composition is the SORT-BASED UNION shape:
  * tag both sides, union, one window over (key, time) with a
  * last-non-null carry-forward, keep the left rows. Cost = ONE shuffle
  * on the key + a per-key sort — the same price as any keyed window,
  * with no join explosion, no per-row probing, and no range condition
  * that would force a nested-loop join. This is how you as-of at
  * 100 TB: both sides flow through the same hash partitioning, skew
  * follows the key distribution exactly like any other keyed op.
  *
  * Tie discipline: at equal timestamps right rows sort BEFORE left
  * rows (side 0 < 1), so the match is inclusive (a right row at
  * exactly t matches a left row at t); `idCol` breaks residual ties
  * for full determinism.
  */
object AsOf {

  /** Left rows + (id, event-time µs) of the as-of matched right row;
    * NULL columns where a key has no right row yet. `right`'s columns
    * must be a subset of `left`'s (right-only columns would leak into
    * the output schema). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               tsCol: String, idCol: String): DataFrame = {
    val reserved = Seq("__side", "__pid", "__pus", "__asof_id", "__asof_us")
    require(!left.columns.exists(reserved.contains),
      s"left side must not contain reserved columns ${reserved.mkString(", ")}")
    require(right.columns.toSet.subsetOf(left.columns.toSet),
      "right columns must be a subset of left's")
    val l = left.withColumn("__side", lit(1))
      .withColumn("__pid", lit(null).cast("long"))
      .withColumn("__pus", lit(null).cast("long"))
    val r = right.withColumn("__side", lit(0))
      .withColumn("__pid", col(idCol))
      .withColumn("__pus", unix_micros(col(tsCol)))
    val w = Window.partitionBy(key)
      .orderBy(col(tsCol), col("__side"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__asof_id", last(col("__pid"), ignoreNulls = true).over(w))
      .withColumn("__asof_us", last(col("__pus"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side", "__pid", "__pus")
  }

  /** Feature-engineering query over the events table: each event's
    * most recent purchase by the same user (self-inclusive for
    * purchase events) and the gap in whole seconds. */
  def lastPurchase(events: DataFrame): DataFrame =
    asofJoin(events,
        events.filter(col("event_type") === "purchase"),
        "user_id", "ts", "event_id")
      .select(col("event_id"), col("user_id"),
        col("__asof_id").as("last_purchase_id"),
        expr("(unix_micros(ts) - __asof_us) div 1000000").as("gap_sec"))
}
