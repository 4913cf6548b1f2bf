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
    // Per-state transitions as primitive open-addressing int maps —
    // two parallel int arrays, linear probing, key slot −1 = empty
    // (symbols are dense ≥ 0). Boxed HashMaps here allocated an
    // Integer pair per edge on the per-row codegen path
    // (ADVICE r16 #1); these stay primitive and grow by doubling.
    val tKeys = new Array[Array[Int]](cap)
    val tVals = new Array[Array[Int]](cap)
    val tLive = new Array[Int](cap)
    def tInit(s: Int, capacity: Int): Unit = {
      val k = new Array[Int](capacity)
      java.util.Arrays.fill(k, -1)
      tKeys(s) = k; tVals(s) = new Array[Int](capacity); tLive(s) = 0
    }
    // Fibonacci mix then mask: dense consecutive symbols spread fine
    def slot(key: Int, mask: Int): Int = ((key * 0x9E3779B9) >>> 16) & mask
    def tGet(s: Int, key: Int): Int = {
      val ks = tKeys(s); val mask = ks.length - 1
      var idx = slot(key, mask)
      while (ks(idx) != -1) {
        if (ks(idx) == key) return tVals(s)(idx)
        idx = (idx + 1) & mask
      }
      -1
    }
    def tPut(s: Int, key: Int, value: Int): Unit = {
      var ks = tKeys(s); var mask = ks.length - 1
      if ((tLive(s) + 1) * 2 > ks.length) { // grow at 50% load
        val ok = ks; val ov = tVals(s)
        tInit(s, ks.length * 2)
        var j = 0
        while (j < ok.length) {
          if (ok(j) != -1) tPut(s, ok(j), ov(j))
          j += 1
        }
        ks = tKeys(s); mask = ks.length - 1
      }
      var idx = slot(key, mask)
      while (ks(idx) != -1 && ks(idx) != key) idx = (idx + 1) & mask
      if (ks(idx) == -1) { ks(idx) = key; tLive(s) += 1 }
      tVals(s)(idx) = value
    }
    tInit(0, 4)
    link(0) = -1
    var size = 1
    var last = 0
    i = 0
    while (i < n) {
      val c = seq(i)
      val cur = size; size += 1
      len(cur) = len(last) + 1
      cnt(cur) = 1L
      tInit(cur, 4)
      var p = last
      while (p != -1 && tGet(p, c) == -1) {
        tPut(p, c, cur); p = link(p)
      }
      if (p == -1) link(cur) = 0
      else {
        val q = tGet(p, c)
        if (len(p) + 1 == len(q)) link(cur) = q
        else {
          val clone = size; size += 1
          len(clone) = len(p) + 1
          link(clone) = link(q)
          cnt(clone) = 0L
          // exact layout copy: same capacity ⇒ same probe sequence
          tKeys(clone) = tKeys(q).clone()
          tVals(clone) = tVals(q).clone()
          tLive(clone) = tLive(q)
          while (p != -1 && tGet(p, c) == q) {
            tPut(p, c, clone); p = link(p)
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
      if (link(s) > 0) cnt(link(s)) += cnt(s) // root accumulation moot
      oi -= 1
    }
    best
  }

  def apply(c: Column): Column =
    ExpressionUtils.column(LongestRepeatExpr(ExpressionUtils.expression(c)))
}
