package graft

import org.apache.spark.sql.functions._

import graft.operators.Bucketing

/** Bucketed-layout co-located join: result equality with the plain
  * join and the actual CLAIM — zero exchanges under the sort-merge
  * join when both sides share the bucket spec. */
class BucketingSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketedEquiJoin: no shuffle, exact result") {
    val left = (0L until 100L).map(i => (i % 17, i)).toDF("k", "v")
    val right = (0L until 40L).map(i => (i % 17, i * 10)).toDF("k", "w")
    Bucketing.writeBucketed(left, "bspec_left", 4, "k")
    Bucketing.writeBucketed(right, "bspec_right", 4, "k")
    val joined = Bucketing.bucketedEquiJoin(spark, "bspec_left", "bspec_right", "k")

    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), s"merge hint must hold:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"same-bucketed sides must join with zero exchanges:\n$p")

    val plain = left.join(right, Seq("k")).select("k", "v", "w")
    val got = joined.select("k", "v", "w")
    assert(got.count() == plain.count())
    assert(got.exceptAll(plain).count() == 0L &&
      plain.exceptAll(got).count() == 0L)
  }
}
