package graft

import org.apache.spark.sql.functions._

import graft.operators.KMeans

/** Deterministic Lloyd's k-means: convergence behavior on separable
  * clusters and the IVF pruning contract. */
class KMeansSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 64

  private def vec(head: Float*): Seq[Float] =
    head ++ Seq.fill(dim - head.size)(0f)

  test("separable clusters: members assigned to their own centroid") {
    // two tight blobs far apart; init takes vec_id 0 and 1 (one per blob)
    val rows = Seq(
      (0L, vec(100f, 0f)), (2L, vec(101f, 1f)), (4L, vec(99f, -1f)),
      (1L, vec(-100f, 0f)), (3L, vec(-101f, 1f)), (5L, vec(-99f, -1f)))
      .map { case (id, v) => (id, v, 0) }
    val emb = rows.toDF("vec_id", "embedding", "label")
    val a = KMeans.assignments(emb, k = 2, iters = 2)
      .select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    assert(a(0L) == a(2L) && a(2L) == a(4L))
    assert(a(1L) == a(3L) && a(3L) == a(5L))
    assert(a(0L) != a(1L))
  }

  test("fit is deterministic across invocations") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val a = KMeans.assignments(emb).orderBy("vec_id")
      .as[(Long, Long, Long)].collect().toSeq
    val b = KMeans.assignments(emb).orderBy("vec_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(a == b)
    assert(a.map(_._2).distinct.size > 1, "uses more than one cluster")
  }

  test("annIvfNprobe(2) candidates span at most the 2 nearest clusters " +
      "and results are a superset-quality refinement of nprobe=1") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    def sims(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Long] =
      df.select("query_id", "rank", "sim_micro").as[(Long, Int, Long)]
        .collect().map(t => (t._1, t._2.toLong) -> t._3).toMap
    val one = sims(KMeans.annIvf(emb, nQueries = 10))
    val two = sims(KMeans.annIvfNprobe(emb, nQueries = 10, nprobe = 2))
    // widening the probe set can only raise (or keep) the similarity at
    // each rank — candidates are a superset
    one.keys.foreach { k =>
      assert(two.getOrElse(k, Long.MinValue) >= one(k),
        s"rank slot $k got worse with nprobe=2")
    }
    assert(two.values.sum > one.values.sum,
      "at least one query found a strictly better neighbor in cluster #2")
  }

  test("annIvf searches only the query's cluster") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val asg = KMeans.fit(emb).select(col("vec_id"), col("cluster"))
      .as[(Long, Long)].collect().toMap
    val ann = KMeans.annIvf(emb, nQueries = 10)
      .select("query_id", "cand_id").as[(Long, Long)].collect()
    assert(ann.nonEmpty)
    assert(ann.forall { case (q, c) => asg(q) == asg(c) },
      "every neighbor shares the query's trained cluster")
  }
}
