package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

/** Boundary tests for the Gopher rule filter — every published ratio
  * threshold is exercised exactly AT the boundary (keep) and one unit
  * past it (drop), since the whole point of the integer re-expression
  * is that those edges are deterministic. */
class GopherRulesSpec extends SparkTestBase {
  import spark.implicits._

  private def run(minWords: Long, maxWords: Long, texts: (Long, String)*) =
    Curation.gopherRules(texts.toDF("doc_id", "text"), minWords, maxWords)

  private def flags(minWords: Long, maxWords: Long, text: String) =
    run(minWords, maxWords, (0L, text))
      .select("r_wordcount", "r_meanlen", "r_symbol", "r_bullet",
        "r_ellipsis", "r_alpha", "r_stopwords", "keep")
      .as[(Boolean, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .head()

  private def one(minWords: Long, maxWords: Long, text: String, colName: String) =
    run(minWords, maxWords, (0L, text)).select(colName).as[Boolean].head()

  test("word count: inclusive at both bounds, drops one past either") {
    assert(one(2, 5, "a b", "r_wordcount"))
    assert(!one(2, 5, "a", "r_wordcount"))
    assert(one(2, 5, "a b c d e", "r_wordcount"))
    assert(!one(2, 5, "a b c d e f", "r_wordcount"))
  }

  test("mean word length: 3n <= sum <= 10n, boundaries keep") {
    assert(one(1, 100, "abc abc", "r_meanlen")) // sum=6 = 3n
    assert(!one(1, 100, "ab ab", "r_meanlen")) // sum=4 < 6
    assert(one(1, 100, "abcdefghij abcdefghij", "r_meanlen")) // sum=20 = 10n
    assert(!one(1, 100, "abcdefghijk abcdefghijk", "r_meanlen")) // 22 > 20
  }

  test("symbols: '#' chars and non-overlapping '...' runs, 10*sym <= n") {
    val tenWords = Seq.fill(10)("w").mkString(" ")
    assert(one(1, 100, s"$tenWords #", "r_symbol")) // 11 words incl '#': 10<=11
    assert(!one(1, 100, s"$tenWords # #", "r_symbol")) // 20 > 12
    // '....' = one leftmost '...' + residue; '......' = two
    val r = run(1, 100, (0L, "a .... b"), (1L, "a ...... b"))
      .select("doc_id", "n_symbols").as[(Long, Long)].collect().toMap
    assert(r == Map(0L -> 1L, 1L -> 2L))
  }

  test("bullets: keeps at exactly 90% of lines, drops past") {
    val nine = (1 to 9).map(i => s"- item $i")
    assert(one(1, 100, (nine :+ "plain").mkString("\n"), "r_bullet"))
    assert(!one(1, 100, (nine :+ "* ten").mkString("\n"), "r_bullet"))
    // all three bullet glyphs count
    assert(!one(1, 100, "- a\n* b\n• c", "r_bullet")) // 30 > 27
  }

  test("ellipsis lines: keeps at exactly 30%, drops past") {
    val plain = (1 to 7).map(i => s"line $i")
    val ell = (1 to 3).map(i => s"trail $i...")
    assert(one(1, 100, (plain ++ ell).mkString("\n"), "r_ellipsis"))
    assert(!one(1, 100,
      (plain.take(6) ++ ell :+ "more...").mkString("\n"), "r_ellipsis"))
  }

  test("alpha words: keeps at exactly 80%, drops below") {
    assert(one(1, 100, "a1 b2 c3 d4 55", "r_alpha")) // 4/5
    assert(!one(1, 100, "a1 b2 c3 44 55", "r_alpha")) // 3/5
  }

  test("required stopwords: two distinct needed; duplicates don't count") {
    assert(one(1, 100, "the cat with hat", "r_stopwords"))
    assert(!one(1, 100, "the the the the", "r_stopwords"))
    assert(!one(1, 100, "cat hat mat", "r_stopwords"))
  }

  test("keep is the conjunction; a clean paragraph passes all rules") {
    val f = flags(5, 100,
      "the quick brown fox jumps with ease over the lazy dog today")
    assert(f == ((true, true, true, true, true, true, true, true)))
    // same text minus its stopwords fails exactly r_stopwords
    val g = flags(5, 100, "quick brown fox jumps over lazy dog today")
    assert(g._7 == false && g._8 == false && g._1 && g._2 && g._3)
  }

  test("sourceQuality: per-source means and keep rates recount the two laws") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = graft.sources.Tables
      .documents(spark, "/root/testdata/sf0.001")
    val got = graft.operators.Curation.sourceQuality(docs)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // differential: recount from the two scoring operators directly
    val q = graft.operators.TextAnalysis.qualityScore(docs)
      .select(col("doc_id"), col("score"), col("keep"))
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    val g = graft.operators.Curation.gopherRules(docs)
      .select(col("doc_id"), col("keep"))
      .as[(Long, Boolean)].collect().toMap
    val bySrc = docs.select("doc_id", "source")
      .as[(Long, String)].collect().groupBy(_._2)
    assert(got.keySet == bySrc.keySet)
    bySrc.foreach { case (src, ds) =>
      val ids = ds.map(_._1)
      val sumScore = ids.map(q(_)._2).sum
      val floorMean = Math.floorDiv(sumScore, ids.length.toLong)
      val (nq, ng) = (ids.count(q(_)._3).toLong, ids.count(g).toLong)
      assert(got(src) == ((src, ids.length.toLong, floorMean,
        1000000L * nq / ids.length, 1000000L * ng / ids.length)),
        s"source $src mismatch: ${got(src)}")
    }
  }
}
