package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.RollingHash31Expr
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Differential contract: the native rolling_hash31 expression must be
  * indistinguishable from the composed per-character fold it replaces
  * (which the DuckDB oracle twin mirrors). */
class RollingHashSpec extends SparkTestBase {
  import spark.implicits._

  /** The round-3 composed-builtins form, kept as reference semantics. */
  private def composed(text: Column): Column =
    aggregate(transform(split(text, ""), c => ascii(c)), lit(0L),
      (acc, c) => (acc * 31 + c) % 1000000007L)

  private def diff(texts: Seq[String]): Unit = {
    val df = texts.toDF("text")
    val rows = df.select(RollingHash31Expr(col("text")).as("n"),
      composed(col("text")).as("c")).as[(Long, Long)].collect()
    rows.zip(texts).foreach { case ((n, c), t) =>
      assert(n == c, s"mismatch for '$t': native=$n composed=$c")
    }
  }

  test("edge cases match the composed fold exactly") {
    diff(Seq("", "a", "ab", " leading", "trailing ", "with  spaces",
      "punct!?#", "0123456789", "ünïcode tökens", "日本語テキスト",
      "a" * 500))
  }

  test("∀ generated strings: native == composed") {
    val g = Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const(' '),
      Gen.const('!'), Gen.const('é'))).map(_.mkString)
    val texts = (0 until 200).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)))
    diff(texts)
  }

  test("known values: empty folds to 0, single char folds to its codepoint") {
    import org.apache.spark.unsafe.types.UTF8String
    assert(RollingHash31Expr.compute(UTF8String.fromString("")) == 0L)
    assert(RollingHash31Expr.compute(UTF8String.fromString("A")) == 65L)
    assert(RollingHash31Expr.compute(UTF8String.fromString("AB")) ==
      65L * 31 + 66)
  }
}
