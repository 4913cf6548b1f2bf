package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Prefix

/** The shared two-phase prefix sum: equality with the single-window
  * global cumsum, block-choice invariance, multi-column sums. */
class PrefixSpec extends SparkTestBase {
  import spark.implicits._

  private val rows = (0 until 200).map { i =>
    val k = (i * 37 + 11) % 1000   // unordered insert order
    (k.toLong, (k % 7 + 1).toLong, (k % 3).toLong)
  }.distinct
  private def df = rows.toDF("k", "a", "b")

  private def global = {
    val w = Window.orderBy("k")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_a", sum("a").over(w))
      .withColumn("cum_b", sum("b").over(w))
      .select("k", "cum_a", "cum_b")
      .as[(Long, Long, Long)].collect().toSet
  }

  test("two-phase == global single-window cumsum, for any block coarsening") {
    val want = global
    for (blkDiv <- Seq(1L, 7L, 100L, 100000L)) {
      val got = Prefix.inclusiveCumsum(df, expr(s"k div $blkDiv"),
          col("k"), Seq("a" -> col("a"), "b" -> col("b")))
        .select("k", "cum_a", "cum_b")
        .as[(Long, Long, Long)].collect().toSet
      assert(got == want, s"blkDiv=$blkDiv diverged")
    }
  }

  test("negative keys: floor-style blocks preserve global order") {
    val d = Seq((-5L, 1L), (-1L, 1L), (0L, 1L), (3L, 1L))
      .toDF("k", "a")
    // floor division keeps b(x) monotone for negative x (div truncates
    // toward zero — use a floor expression exactly as callers must)
    val got = Prefix.inclusiveCumsum(d,
        expr("CAST(floor(k / 2.0) AS BIGINT)"), col("k"),
        Seq("a" -> col("a")))
      .select("k", "cum_a").as[(Long, Long)].collect().toMap
    assert(got == Map(-5L -> 1L, -1L -> 2L, 0L -> 3L, 3L -> 4L))
  }
}
