package org.apache.spark.sql.graft

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC (canonical composition, UAX #15) as a native codegen'd
  * expression — the first step of any text-normalization pass: "café"
  * typed as `e` + COMBINING ACUTE and "café" typed as the precomposed
  * `é` must hash/dedup/tokenize identically. Spark ships no
  * normalization builtin; the JDK's `java.text.Normalizer` implements
  * the same UAX #15 algorithm DuckDB's `nfc_normalize` (utf8proc)
  * does, so the twin is exact. The NFC quick-check fast path skips the
  * copy for already-composed text (virtually all real corpora), making
  * the common case a single scan of the char array. */
final case class NfcNormalizeExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalizeExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.NfcNormalizeExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : NfcNormalizeExpr = copy(child = newChild)
}

object NfcNormalizeExpr {
  def compute(text: UTF8String): UTF8String = {
    val s = text.toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) text
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }

  def apply(c: Column): Column =
    ExpressionUtils.column(NfcNormalizeExpr(ExpressionUtils.expression(c)))
}
