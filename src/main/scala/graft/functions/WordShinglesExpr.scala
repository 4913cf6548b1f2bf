package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing the DISTINCT word n-gram
  * shingles of a document in one pass — semantically identical to the
  * composed built-ins
  * `array_distinct(transform(sequence(...), i -> concat_ws(" ",
  * slice(filter(split(lower(text), " "), t -> t != ""), i+1, n))))`
  * with the whole-text fallback for short docs, and therefore to the
  * DuckDB twin (`list_distinct(list_transform(range(...), ...))`).
  *
  * Why native: interpreted higher-order functions re-evaluate per
  * element through expression-tree dispatch, so the composed form costs
  * tokens × n-gram-width tree walks per row even after column staging
  * (SURVEY round-3 notes). This expression tokenizes, joins and
  * dedups in one tight JVM loop; `doGenCode` emits a direct static
  * call, keeping the projection inside whole-stage codegen. It sits at
  * the bottom of every minhash/LSH/Jaccard dedup query.
  *
  * Parity contract (locked by WordShinglesSpec's differential test):
  * lower → split on the literal single space → drop empty tokens →
  * n-grams joined by one space, first-occurrence-ordered distinct;
  * fewer than n tokens → ONE whole-text shingle (the empty string for
  * an empty/whitespace-only doc). */
final case class WordShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShinglesExpr.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.WordShinglesExpr.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression)
      : WordShinglesExpr = copy(child = newChild)
}

object WordShinglesExpr {

  /** Lowercased tokens split on the literal single space, empties
    * dropped — the shared tokenizer for both native expressions. */
  private[graft] def tokenize(text: UTF8String): java.util.ArrayList[String] = {
    val s = text.toLowerCase.toString
    val toks = new java.util.ArrayList[String](32)
    var i = 0
    val len = s.length
    while (i < len) {
      var j = s.indexOf(' ', i)
      if (j < 0) j = len
      if (j > i) toks.add(s.substring(i, j))
      i = j + 1
    }
    toks
  }

  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = tokenize(text)
    val m = toks.size
    val out = new java.util.LinkedHashSet[String]()
    if (m >= n) {
      var k = 0
      while (k + n <= m) {
        val sb = new java.lang.StringBuilder(toks.get(k))
        var t = 1
        while (t < n) { sb.append(' ').append(toks.get(k + t)); t += 1 }
        out.add(sb.toString)
        k += 1
      }
    } else {
      out.add(String.join(" ", toks))
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var idx = 0
    while (it.hasNext) { arr(idx) = UTF8String.fromString(it.next()); idx += 1 }
    new GenericArrayData(arr)
  }

  def apply(c: Column, n: Int): Column =
    ExpressionUtils.column(WordShinglesExpr(ExpressionUtils.expression(c), n))
}

/** Native tokenizer: `filter(split(lower(text), " "), t -> t != "")`
  * as one JVM loop — the column every text-analysis operator starts
  * from. Same parity/differential discipline as WordShinglesExpr. */
final case class WordTokensExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_tokens"

  override protected def nullSafeEval(input: Any): Any =
    WordTokensExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.WordTokensExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : WordTokensExpr = copy(child = newChild)
}

object WordTokensExpr {
  def compute(text: UTF8String): ArrayData = {
    val toks = WordShinglesExpr.tokenize(text)
    val arr = new Array[Any](toks.size)
    var i = 0
    while (i < toks.size) { arr(i) = UTF8String.fromString(toks.get(i)); i += 1 }
    new GenericArrayData(arr)
  }

  def apply(c: Column): Column =
    ExpressionUtils.column(WordTokensExpr(ExpressionUtils.expression(c)))
}
