package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** EXACT longest repeated token span per document, as one native
  * codegen'd expression — the suffix structure
  * [[graft.operators.TextAnalysis.repeatDepth]]'s contract points at
  * ("a power-of-two lower bound of the true max; exact needs a suffix
  * structure"): a suffix automaton over the token sequence (Blumer et
  * al. 1985 construction, the textbook online O(n·log σ) build), where
  * the longest repeated substring is the maximum `len` over states
  * whose endpos class has ≥ 2 members (overlapping occurrences count,
  * the classic LRS convention — "a a a" repeats "a a" at 0 and 1).
  *
  * Why an Expression and not a join: a repeated-span search is
  * per-document imperative work with document-bounded state — exactly
  * the scalar-function tier of the custom-operator ladder. As a
  * native expression it stays inside whole-stage codegen and the
  * operator is a pure map over the corpus: no explode, no shuffle, no
  * per-L probe passes (repeatDepth pays 6 shingle-set expressions for
  * its ladder; this pays one linear build). The DuckDB twin
  * brute-forces all (L, pos) n-grams per doc — O(n²) — which is why
  * the twin is the ORACLE and this is the engine.
  *
  * Parity contract: tokens are [[WordShinglesExpr.tokenize]] (lower,
  * split on the literal space, empties dropped); output is the span
  * length in TOKENS, 0 when no token repeats (includes empty docs). */
final case class LongestRepeatExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "longest_repeat"

  override protected def nullSafeEval(input: Any): Any =
    LongestRepeatExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.LongestRepeatExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : LongestRepeatExpr = copy(child = newChild)
}

object LongestRepeatExpr {

  def compute(text: UTF8String): Int = {
    val toks = WordShinglesExpr.tokenize(text)
    val n = toks.size
    if (n < 2) return 0
    // token -> dense symbol id (the automaton alphabet)
    val symOf = new java.util.HashMap[String, Integer](n * 2)
    val seq = new Array[Int](n)
    var i = 0
    while (i < n) {
      val t = toks.get(i)
      var s = symOf.get(t)
      if (s == null) { s = Integer.valueOf(symOf.size); symOf.put(t, s) }
      seq(i) = s.intValue()
      i += 1
    }
    // suffix automaton over seq: ≤ 2n states
    val cap = 2 * n + 2
    val len = new Array[Int](cap)
    val link = new Array[Int](cap)
    val cnt = new Array[Long](cap)
    val trans = new Array[java.util.HashMap[Integer, Integer]](cap)
    trans(0) = new java.util.HashMap[Integer, Integer]()
    link(0) = -1
    var size = 1
    var last = 0
    i = 0
    while (i < n) {
      val c = Integer.valueOf(seq(i))
      val cur = size; size += 1
      len(cur) = len(last) + 1
      cnt(cur) = 1L
      trans(cur) = new java.util.HashMap[Integer, Integer]()
      var p = last
      while (p != -1 && !trans(p).containsKey(c)) {
        trans(p).put(c, Integer.valueOf(cur)); p = link(p)
      }
      if (p == -1) link(cur) = 0
      else {
        val q = trans(p).get(c).intValue()
        if (len(p) + 1 == len(q)) link(cur) = q
        else {
          val clone = size; size += 1
          len(clone) = len(p) + 1
          link(clone) = link(q)
          cnt(clone) = 0L
          trans(clone) =
            new java.util.HashMap[Integer, Integer](trans(q))
          while (p != -1 && {
            val t = trans(p).get(c); t != null && t.intValue() == q
          }) {
            trans(p).put(c, Integer.valueOf(clone)); p = link(p)
          }
          link(q) = clone
          link(cur) = clone
        }
      }
      last = cur
      i += 1
    }
    // endpos sizes: propagate along suffix links in len-descending
    // order (counting sort by len — len ≤ n)
    val buckets = new Array[Int](n + 2)
    var v = 1
    while (v < size) { buckets(len(v)) += 1; v += 1 }
    var l = 1
    while (l <= n) { buckets(l) += buckets(l - 1); l += 1 }
    val order = new Array[Int](size - 1)
    v = 1
    while (v < size) {
      buckets(len(v)) -= 1; order(buckets(len(v))) = v; v += 1
    }
    var best = 0
    var oi = order.length - 1
    while (oi >= 0) {
      val s = order(oi)
      if (cnt(s) >= 2L && len(s) > best) best = len(s)
      if (link(s) > 0) cnt(link(s)) += cnt(s)
      else if (link(s) == 0) () // root collects everything; ignored
      oi -= 1
    }
    best
  }

  def apply(c: Column): Column =
    ExpressionUtils.column(LongestRepeatExpr(ExpressionUtils.expression(c)))
}
