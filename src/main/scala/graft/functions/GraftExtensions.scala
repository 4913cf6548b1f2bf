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
    GraftFunctions.descriptors.foreach(ext.injectFunction)
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

  private def descriptor(name: String, clazz: Class[_],
                         build: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), build)

  /** The full SQL surface of the native expression library — every
    * codegen'd Expression the DataFrame operators use is also callable
    * from spark.sql(...): `dot_f64`/`dist2_f64` (sequential-fold vector
    * math), `word_tokens`/`word_shingles` (tokenizer + distinct n-gram
    * shingles), `rolling_hash31`, and `portable_hash32`. */
  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    portableHash32Descriptor,
    descriptor("dot_f64", classOf[DotF64Expr],
      cs => DotF64Expr(cs(0), cs(1))),
    descriptor("dist2_f64", classOf[Dist2F64Expr],
      cs => Dist2F64Expr(cs(0), cs(1))),
    descriptor("rolling_hash31", classOf[RollingHash31Expr],
      cs => RollingHash31Expr(cs.head)),
    descriptor("word_tokens", classOf[WordTokensExpr],
      cs => WordTokensExpr(cs.head)),
    descriptor("longest_repeat", classOf[LongestRepeatExpr],
      cs => LongestRepeatExpr(cs.head)),
    descriptor("cms_estimate", classOf[CmsEstimateExpr],
      cs => CmsEstimateExpr(cs(0), cs(1))),
    descriptor("word_shingles", classOf[WordShinglesExpr], {
      case Seq(c) => WordShinglesExpr(c, 3)
      case Seq(c, Literal(n: Int, _)) => WordShinglesExpr(c, n)
      case cs => throw new IllegalArgumentException(
        s"word_shingles(text[, n literal]): got ${cs.size} args")
    }))

  /** Register the full function surface for spark.sql(...) on a live
    * session (extensions only apply at session construction). */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (id, _, build) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        id.funcName, build, "built-in")
    }

  /** Add the rewrite rule to a live session (public experimental hook). */
  def installOptimization(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(RewriteMd5PrefixHash))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteMd5PrefixHash
}
