package graft

import org.apache.spark.sql.functions._

import graft.operators.{Coreset, Curation, KMeans}

/** Gates for greedy k-center selection and the filter-agreement kappa. */
class CoresetSpec extends SparkTestBase {
  import spark.implicits._

  test("kCenter: farthest-point traversal on a line picks the extremes") {
    // points at x = id on axis 0: seed = 0, then 9 (farthest), then 4
    // (midpoint, d2 = 16 to nearer extreme), ties broken by lowest id
    val emb = (0 until 10).map { i =>
      (i.toLong, Array.tabulate(KMeans.dim)(j => if (j == 0) i.toDouble else 0d))
    }.toDF("vec_id", "embedding")
    val r = Coreset.kCenter(emb, k = 3).as[(Long, Long, Long)].collect()
    assert(r.map(x => (x._1, x._2)).toSeq ==
      Seq((1L, 0L), (2L, 9L), (3L, 4L)))
    assert(r(0)._3 == 0L)             // seed has no prior coverage
    assert(r(1)._3 == 81000L)         // 9² in milli
    assert(r(2)._3 == 16000L)         // min(4², 5²) = 16
  }

  test("kCenter: selection radii are non-increasing after the seed") {
    val emb = (0 until 50).map { i =>
      (i.toLong, Array.tabulate(KMeans.dim)(j =>
        ((i * 31 + j * 7) % 13 - 6).toDouble))
    }.toDF("vec_id", "embedding")
    val r = Coreset.kCenter(emb, k = 6).as[(Long, Long, Long)].collect()
    val radii = r.drop(1).map(_._3)
    assert(radii.sliding(2).forall { case Array(a, b) => a >= b },
      s"greedy radii must shrink monotonically: ${radii.mkString(",")}")
    assert(r.map(_._2).distinct.length == 6, "centers are distinct")
  }

  test("filterKappa: perfect agreement gives kappa 1e6, counts add up") {
    // long clean English text passes BOTH laws; short junk fails both
    val good = ("the be to of and that have with good words " * 30).trim
    val docs = ((0 until 8).map(i => (i.toLong, good)) ++
      (8 until 16).map(i => (i.toLong, "zz")))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
    val r = Curation.filterKappa(docs)
      .as[(Long, Long, Long, Long, Long, Long, Option[Long])].head()
    assert(r._1 == 16L && r._2 + r._3 + r._4 + r._5 == 16L)
    assert(r._2 == 8L && r._5 == 8L, s"expected clean 8/8 split: $r")
    assert(r._6 == 1000000L && r._7.contains(1000000L))
  }

  test("filterKappa: degenerate marginals (everything kept by both) -> NULL") {
    val good = ("the be to of and that have with good words " * 30).trim
    val docs = (0 until 5).map(i => (i.toLong, good))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
    val r = Curation.filterKappa(docs)
      .as[(Long, Long, Long, Long, Long, Long, Option[Long])].head()
    assert(r._2 == 5L && r._6 == 1000000L && r._7.isEmpty,
      s"pe = 1 must yield NULL kappa, not a fabricated value: $r")
  }
}
