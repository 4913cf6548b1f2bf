package org.apache.spark.sql.graft

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, LongType}

/** Native Catalyst expression for the engine's portable 32-bit hash
  * (first 32 bits of md5 as an unsigned value in a LONG).
  *
  * Semantically identical to the composed built-ins
  * `conv(substring(md5(x), 1, 8), 16, 10)` (and therefore to the DuckDB
  * oracle twin `CAST(concat('0x', substr(md5(x),1,8)) AS BIGINT)`), but
  * one JVM call instead of md5-hex-encode → substring → base-16 parse —
  * this hash sits in the inner loop of every minhash/simhash/LSH
  * operator. `doGenCode` keeps it inside whole-stage codegen: the
  * generated Java calls the static helper directly, no interpreted
  * expression dispatch.
  *
  * Lives under org.apache.spark.sql because the expression SPI types it
  * extends (AbstractDataType, ExpressionUtils) are private[sql] — the
  * standard placement for third-party native expressions. */
final case class PortableHash32Expr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "portable_hash32"

  override protected def nullSafeEval(input: Any): Any =
    PortableHash32Expr.hash(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.PortableHash32Expr.hash($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : PortableHash32Expr = copy(child = newChild)
}

object PortableHash32Expr {
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First 4 md5 bytes, big-endian, as an unsigned 32-bit value. */
  def hash(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  def apply(c: Column): Column =
    ExpressionUtils.column(
      PortableHash32Expr(ExpressionUtils.expression(c.cast("binary"))))
}
