package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils

/** Column wrappers over Spark's own bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the machinery
  * behind `spark.sql.optimizer.runtime.bloomFilter.*` runtime filters,
  * catalyst-internal but not registered as SQL functions). Exposing
  * them lets an operator build the row-level-filter pattern EXPLICITLY
  * where the optimizer's injection heuristics wouldn't fire.
  *
  * Both sides hash with Spark's XxHash64 — these sketches never cross
  * an engine boundary (the bloom is an opaque intermediate, not an
  * output column), so engine-portable md5 is not required and the
  * codegen'd native hash is strictly better. */
object BloomExprs {

  /** Aggregate a key column into one binary bloom-filter value.
    * `expectedItems` sizes the filter (~8 bits/item at the default
    * FPP); the result is a few hundred KB for a million keys — small
    * enough to broadcast when the key SET itself is not. */
  def bloomAgg(key: Column, expectedItems: Long): Column =
    ExpressionUtils.column(
      new BloomFilterAggregate(
        new XxHash64(Seq(ExpressionUtils.expression(key))),
        Literal(expectedItems)).toAggregateExpression())

  /** Probe: true if `key` MIGHT be in the bloom (no false negatives).
    * `might_contain` requires its bloom side to be a CONSTANT or a
    * scalar subquery (it is bound once per query, not per row), so the
    * 1-row bloom frame is wired in as a ScalarSubquery over its
    * analyzed plan — the exact shape Spark's own InjectRuntimeFilter
    * produces. */
  def mightContain(bloomFrame: DataFrame, key: Column): Column =
    ExpressionUtils.column(
      BloomFilterMightContain(
        ScalarSubquery(bloomFrame.queryExecution.analyzed),
        new XxHash64(Seq(ExpressionUtils.expression(key)))))
}
