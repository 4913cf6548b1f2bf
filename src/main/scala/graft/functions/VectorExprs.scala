package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native codegen'd dot product of two double arrays — semantically
  * identical to the composed higher-order form
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (acc, x) -> acc + x)`
  * and to DuckDB's `list_dot_product`: a SEQUENTIAL left fold of
  * correctly-rounded IEEE multiply-adds, so results are bit-exact across
  * all three forms (locked by VectorExprsSpec's differential test).
  *
  * Why native: Spark evaluates higher-order functions through
  * per-element expression-tree dispatch with a boxed lambda variable per
  * step — a 64-element embedding pays ~128 tree walks per dot product,
  * and the similarity family evaluates a dot per CANDIDATE PAIR (the
  * round-4 verdict's #2 hot spot). This expression is one tight JVM
  * loop; `doGenCode` emits a direct static call so the projection stays
  * inside whole-stage codegen. Same recipe as [[WordShinglesExpr]].
  *
  * Null semantics mirror the composed form exactly: null array → null;
  * length mismatch → null (zip_with pads with null, the fold absorbs
  * it); any null element → null. */
final case class DotF64Expr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_f64"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotF64Expr.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("dotRes")
      s"""
      java.lang.Double $boxed = org.apache.spark.sql.graft.DotF64Expr.compute($a, $b);
      if ($boxed == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $boxed.doubleValue(); }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotF64Expr =
    copy(left = newLeft, right = newRight)
}

object DotF64Expr {
  /** Sequential left fold acc = (...((0 + a0*b0) + a1*b1)...) — the
    * exact op order of the composed form and of list_dot_product. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(DotF64Expr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

/** Native squared euclidean distance — the composed
  * `aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0d, +)` as
  * one JVM loop; same fold order, null semantics, and codegen discipline
  * as [[DotF64Expr]]. Sits under every k-means assignment (a distance
  * per vector × centroid). */
final case class Dist2F64Expr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dist2_f64"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Dist2F64Expr.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("dist2Res")
      s"""
      java.lang.Double $boxed = org.apache.spark.sql.graft.Dist2F64Expr.compute($a, $b);
      if ($boxed == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $boxed.doubleValue(); }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Dist2F64Expr =
    copy(left = newLeft, right = newRight)
}

object Dist2F64Expr {
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(Dist2F64Expr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
