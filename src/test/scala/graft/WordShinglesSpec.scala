package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.WordShinglesExpr
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Dedup

/** Differential contract: the native word_shingles expression must be
  * indistinguishable from the composed built-in column recipe it
  * replaces (which the DuckDB oracle twin mirrors). */
class WordShinglesSpec extends SparkTestBase {
  import spark.implicits._

  /** The round-3 composed-builtins recipe, kept here as the reference
    * semantics for the differential test. */
  private def composed(text: org.apache.spark.sql.Column, n: Int) = {
    val toks = filter(split(lower(text), " "), t => t =!= "")
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
      .otherwise(array(concat_ws(" ", toks)))
  }

  private def diff(texts: Seq[String], n: Int): Unit = {
    val df = texts.toDF("text")
    val got = df.select(WordShinglesExpr(col("text"), n)).as[Seq[String]].collect()
    val want = df.select(composed(col("text"), n)).as[Seq[String]].collect()
    got.zip(want).zip(texts).foreach { case ((g, w), t) =>
      assert(g == w, s"mismatch for n=$n text='$t': native=$g composed=$w")
    }
  }

  test("edge cases match the composed recipe exactly") {
    val cases = Seq("", " ", "   ", "a", "a b", "a b c", "a b c d",
      "  leading and   multi  spaces ", "x y x y x y", "UPPER Case MiX",
      "tab\tis not a separator", "ünïcode tökens herë again ok")
    Seq(1, 2, 3, 5).foreach(n => diff(cases, n))
  }

  test("∀ generated strings: native == composed (n=3)") {
    val g = Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr.map(_.take(6)), Gen.const(""), Gen.const(" ")))
      .map(_.mkString(" "))
    val texts = (0 until 200).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)))
    diff(texts, 3)
  }

  test("word_tokens matches the composed filter(split(lower)) recipe") {
    val texts = Seq("", " ", "A b  C ", "ünï  cöde", "one", " x y z ")
    val df = texts.toDF("text")
    val got = df.select(org.apache.spark.sql.graft.WordTokensExpr(col("text")))
      .as[Seq[String]].collect()
    val want = df.select(filter(split(lower(col("text")), " "), t => t =!= ""))
      .as[Seq[String]].collect()
    got.zip(want).zip(texts).foreach { case ((g, w), t) =>
      assert(g == w, s"mismatch for '$t': native=$g composed=$w")
    }
  }

  test("codegen and interpreted paths agree") {
    val df = Seq("the quick brown fox", "a b").toDF("text")
    val whole = df.select(WordShinglesExpr(col("text"), 3).as("sh"))
    whole.collect() // executes through codegen
    val interp = WordShinglesExpr.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("the quick brown fox"), 3)
    assert(interp.numElements() == 2)
  }
}
