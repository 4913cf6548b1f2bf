package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Probe a serialized Count-Min sketch (the binary produced by Spark's
  * built-in `count_min_sketch(...)` aggregate) for a string item's
  * frequency estimate — the missing read half of the CMS story: Spark
  * ships the AGGREGATE but no scalar probe function, so without this
  * the sketch must be collected and queried on the driver.
  *
  * The sketch side is expected to be a broadcast 1-row table (a few KB:
  * depth×width counters); the deserialized sketch is cached per
  * partition keyed on reference identity, so N probe rows deserialize
  * once, not N times. Probing uses the same UTF-8-byte hashing as the
  * aggregate's add path (CountMinSketch#estimateCount on the decoded
  * string), so estimate ≥ true count holds by CMS construction —
  * asserted in TextAnalysisSpec across every term of a fixture.
  *
  * CodegenFallback is deliberate: probes run on top-N-sized frames
  * (cold path), never on the corpus-sized hot path — the aggregate
  * that scans the corpus is the built-in, codegen'd one. */
final case class CmsEstimateExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedSketch: CountMinSketch = _

  override protected def nullSafeEval(sketchBytes: Any, item: Any): Any = {
    val bytes = sketchBytes.asInstanceOf[Array[Byte]]
    if (!(bytes eq cachedBytes)) {
      cachedSketch = CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(bytes))
      cachedBytes = bytes
    }
    cachedSketch.estimateCount(item.asInstanceOf[UTF8String].toString)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimateExpr =
    copy(left = newLeft, right = newRight)
}

object CmsEstimateExpr {
  def apply(sketch: Column, item: Column): Column =
    ExpressionUtils.column(CmsEstimateExpr(
      ExpressionUtils.expression(sketch), ExpressionUtils.expression(item)))
}
