package graft

import graft.operators.Similarity

class RandProjSpec extends SparkTestBase {
  import spark.implicits._

  test("signMatrix is deterministic, ±1-valued, and shape-correct") {
    val a = Similarity.signMatrix(4, 8)
    assert(a == Similarity.signMatrix(4, 8))
    assert(a.size == 4 && a.forall(_.size == 8))
    assert(a.flatten.forall(s => s == 1L || s == -1L))
    // not degenerate: both signs occur
    assert(a.flatten.toSet == Set(1L, -1L))
  }

  test("projection equals the manual matrix product over quantized codes") {
    val emb = Seq(
      (0L, Seq(1.0f, -2.0f, 0.5f, 4.0f)),
      (1L, Seq(0.0f, 0.0f, 0.0f, 0.0f)), // zero vector -> all-zero codes
      (2L, Seq(-3.0f, 3.0f, 3.0f, -3.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.randProj(emb, dOut = 3, dIn = 4)
      .as[(Long, Int, Long)].collect()
      .map { case (v, j, p) => (v, j) -> p }.toMap
    val s = Similarity.signMatrix(3, 4)
    val vecs = Map(
      0L -> Seq(1.0, -2.0, 0.5, 4.0),
      1L -> Seq(0.0, 0.0, 0.0, 0.0),
      2L -> Seq(-3.0, 3.0, 3.0, -3.0))
    for ((vid, v) <- vecs; j <- 0 until 3) {
      val scale = v.map(math.abs).max
      val q = if (scale == 0) v.map(_ => 0L)
              else v.map(x => math.floor(x * 127d / scale).toLong)
      val expect = q.zip(s(j)).map { case (x, sg) => x * sg }.sum
      assert(got((vid, j)) == expect, s"vec $vid dim $j")
    }
  }

  test("plan is a pure projection: no shuffle, no join") {
    val emb = Seq((0L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val plan = Similarity.randProj(emb, dOut = 2, dIn = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"))
  }

  test("projRecall equals recall recomputed from the two rank lists") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val exact = Similarity.topkCosine(emb).select("query_id", "cand_id")
      .as[(Long, Long)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val proj = Similarity.projTopK(emb).select("query_id", "cand_id")
      .as[(Long, Long)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val got = Similarity.projRecall(emb)
      .select("query_id", "n_true", "n_hit", "recall_pct")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length == exact.size)
    got.foreach { case (qid, nTrue, nHit, pct) =>
      val hits = (exact(qid) intersect proj.getOrElse(qid, Set.empty)).size
      assert(nTrue == exact(qid).size && nHit == hits, s"query $qid")
      assert(pct == (100L * hits) / 5, s"query $qid pct")
    }
    // the projection must actually retrieve something at 16 dims
    assert(got.map(_._3).sum > 0)
  }
}
