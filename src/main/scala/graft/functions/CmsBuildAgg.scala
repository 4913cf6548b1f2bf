package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** WEIGHTED Count-Min-sketch build: `cms_build(term, weight)` folds
  * (term, weight) rows into the same serialized sketch that Spark's
  * built-in `count_min_sketch(term)` would produce over a stream with
  * each term repeated `weight` times — CMS counters are pure sums, so
  * `addBinary(bytes, w)` lands exactly where `w` separate unit adds
  * would (bit-identical counters for a fixed seed, any partitioning).
  *
  * Why Spark's aggregate isn't enough: the built-in only ingests one
  * occurrence per input row, so sketching a corpus alongside an exact
  * per-term aggregate forces either a second corpus-sized scan or a
  * corpus-sized cache of the exploded term stream (the r9-verdict
  * memory blemish in [[graft.operators.TextAnalysis.heavyHitters]]).
  * With a weighted build the sketch derives from the VOCAB-sized
  * (term, cnt) table the exact aggregate produces anyway — the corpus
  * is scanned once and nothing corpus-sized is ever persisted.
  *
  * The add path hashes the term's UTF-8 bytes exactly like the
  * built-in aggregate's string branch, so [[CmsEstimateExpr]] probes
  * (which hash the same bytes) retain the CMS guarantees: estimate ≥
  * truth always, ≤ truth + ε·total at the configured confidence.
  * Buffers serialize through `CountMinSketch.writeTo/readFrom` — the
  * same wire format the built-in emits — so downstream consumers can't
  * tell which aggregate built the sketch. */
final case class CmsBuildAgg(
    left: Expression, right: Expression,
    eps: Double, confidence: Double, seed: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinSketch]
  with BinaryLike[Expression] with ExpectsInputTypes {

  override def prettyName: String = "cms_build"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): CountMinSketch =
    CountMinSketch.create(eps, confidence, seed)

  override def update(buf: CountMinSketch, input: InternalRow): CountMinSketch = {
    val term = left.eval(input)
    val weight = right.eval(input)
    if (term != null && weight != null) {
      val w = weight.asInstanceOf[Long]
      if (w > 0L) buf.addBinary(term.asInstanceOf[UTF8String].getBytes, w)
    }
    buf
  }

  override def merge(buf: CountMinSketch, other: CountMinSketch): CountMinSketch = {
    buf.mergeInPlace(other)
    buf
  }

  override def eval(buf: CountMinSketch): Any = serialize(buf)

  override def serialize(buf: CountMinSketch): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buf.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsBuildAgg =
    copy(left = newLeft, right = newRight)
}

object CmsBuildAgg {
  def apply(term: Column, weight: Column,
            eps: Double, confidence: Double, seed: Int): Column =
    ExpressionUtils.column(CmsBuildAgg(
      ExpressionUtils.expression(term), ExpressionUtils.expression(weight),
      eps, confidence, seed).toAggregateExpression())
}
