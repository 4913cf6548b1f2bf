package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 31-polynomial rolling hash over a string's code points,
  * mod 1e9+7 — semantically identical to the composed built-ins
  * `aggregate(transform(split(text, ""), c -> ascii(c)), 0L,
  * (acc, c) -> (acc * 31 + c) % 1000000007)` and to the DuckDB twin's
  * `list_reduce(list_prepend(0, list_transform(string_split(text, ''),
  * c -> ascii(c))), ...)` (locked by RollingHashSpec's differential
  * test; the empty string folds to 0 in all three forms).
  *
  * Why native: the composed form materializes one single-character
  * UTF8String PER CHARACTER and then folds them through interpreted
  * expression-tree dispatch — ~chars× slower than this one JVM loop,
  * which allocates nothing and stays inside whole-stage codegen
  * (round-4 verdict wrong #3; same recipe as [[WordShinglesExpr]]). */
final case class RollingHash31Expr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash31"

  override protected def nullSafeEval(input: Any): Any =
    RollingHash31Expr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.RollingHash31Expr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : RollingHash31Expr = copy(child = newChild)
}

object RollingHash31Expr {
  /** acc_{i+1} = (acc_i * 31 + codepoint_i) mod 1e9+7 — acc stays under
    * 2^35, so the multiply never overflows a long in any engine. */
  def compute(text: UTF8String): Long = {
    val s = text.toString
    var acc = 0L
    var i = 0
    val len = s.length
    while (i < len) {
      val cp = s.codePointAt(i)
      acc = (acc * 31L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }

  def apply(c: Column): Column =
    ExpressionUtils.column(RollingHash31Expr(ExpressionUtils.expression(c)))
}
