package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Conv, Expression, ExpressionInfo, Literal, Md5, Substring}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, LongType}

/** Catalyst optimizer rule: rewrite the built-in md5-prefix hash chain
  *
  *   cast(conv(substring(md5(x), 1, 8), 16, 10) as bigint)
  *
  * into the native [[PortableHash32Expr]] — same value (PortableHashSpec
  * proves bit-equality), one JVM call instead of hex-encode → substring
  * → base-16 parse → cast. Users writing the portable idiom by hand (or
  * code generated from the DuckDB oracle twin) get the fast path
  * automatically. */
object RewriteMd5PrefixHash extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Cast(
            Conv(Substring(md5 @ Md5(bytes), Literal(1, _), Literal(8, _)),
              Literal(16, _), Literal(10, _), _),
            LongType, _, _) =>
        PortableHash32Expr(bytes)
    }
}

/** SparkSessionExtensions installer (`spark.sql.extensions=
  * org.apache.spark.sql.graft.GraftExtensions`): registers the
  * `portable_hash32` SQL function and the rewrite rule — the S1-style
  * "register by name" mechanism for engine extensions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.portableHash32Descriptor)
    ext.injectOptimizerRule(_ => RewriteMd5PrefixHash)
  }
}

/** Programmatic installation on an EXISTING session (extensions only
  * apply at session construction; these use public/runtime hooks). */
object GraftFunctions {

  val portableHash32Descriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("portable_hash32"),
    new ExpressionInfo(classOf[PortableHash32Expr].getName,
      "portable_hash32"),
    (children: Seq[Expression]) =>
      PortableHash32Expr(Cast(children.head, BinaryType)))

  /** Register `portable_hash32` for spark.sql(...) on a live session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "portable_hash32",
      children => PortableHash32Expr(Cast(children.head, BinaryType)),
      "built-in")

  /** Add the rewrite rule to a live session (public experimental hook). */
  def installOptimization(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(RewriteMd5PrefixHash))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteMd5PrefixHash
}
