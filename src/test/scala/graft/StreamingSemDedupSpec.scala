package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingSemDedup

/** Streaming SemDeDup: assign-to-staged-centroid + cluster-scoped
  * cosine verdicts must reproduce a brute-force replay of the batch
  * rule (floor(cos·1e6) ≥ minSimMicro, priors = same-cluster earlier
  * arrivals), including across trigger boundaries. */
case class Emb(vec_id: Long, embedding: Seq[Double])

class StreamingSemDedupSpec extends SparkTestBase {
  import spark.implicits._

  // two well-separated clusters on the first two axes
  private val centroids = Seq(
    0 -> Seq(1.0, 0.0, 0.0, 0.0),
    1 -> Seq(0.0, 1.0, 0.0, 0.0))

  // corpus arrivals (trigger 1), then batch arrivals (trigger 2):
  // 10 = exact copy of 0; 11 = near copy of 2 (cos ≈ 0.9998);
  // 12 = novel in cluster 0 (orthogonal-ish, cos ≈ 0.7 < 0.95);
  // 13/15 = batch-internal exact dups of each other in cluster 1
  private val corpus = Seq(
    Emb(0L, Seq(0.9, 0.1, 0.0, 0.0)),
    Emb(2L, Seq(0.1, 0.95, 0.0, 0.0)),
    Emb(4L, Seq(0.8, 0.0, 0.2, 0.0)))
  private val batch = Seq(
    Emb(10L, Seq(0.9, 0.1, 0.0, 0.0)),
    Emb(11L, Seq(0.1, 0.94, 0.01, 0.0)),
    Emb(12L, Seq(0.6, 0.0, 0.0, 0.8)),
    Emb(13L, Seq(0.0, 0.9, 0.3, 0.0)),
    Emb(15L, Seq(0.0, 0.9, 0.3, 0.0)))

  private val tau = 950000L

  /** Brute-force replay of the operator contract over an arrival
    * order: nearest centroid by (d2, cid), priors = same-cluster
    * earlier arrivals (across lists; vec_id order within a list). */
  private def reference(lists: Seq[Seq[Emb]])
      : Map[Long, (Int, Long, Boolean)] = {
    // minBy keeps the FIRST minimum and centroids are cid-ascending —
    // the operator's (d2, cid) tie-break
    def cluster(v: Seq[Double]): Int =
      centroids.minBy { case (_, c) =>
        v.zip(c).map(t => (t._1 - t._2) * (t._1 - t._2)).sum
      }._1
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map(t => t._1 * t._2).sum
      dot / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
    }
    val ordered = lists.flatMap(_.sortBy(_.vec_id))
    ordered.zipWithIndex.map { case (d, i) =>
      val cl = cluster(d.embedding)
      val priors = ordered.take(i)
        .filter(p => cluster(p.embedding) == cl)
      val nDup = priors.count(p =>
        math.floor(cos(p.embedding, d.embedding) * 1000000d)
          .toLong >= tau)
      d.vec_id -> ((cl, nDup.toLong, nDup == 0))
    }.toMap
  }

  test("cross-trigger verdicts ≡ brute-force replay of the batch rule") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Emb]
    // streaming inputs must bound state (ADVICE r16 #2). The bound
    // here is a generous member CAP, not a TTL: an armed
    // ProcessingTimeTimeout busy-spins empty timeout batches under
    // the unit-test immediate trigger (see StreamingNearDupSpec's
    // armed-TTL note), while the cap rides NoTimeout and — sized far
    // above the fixture — provably alters no verdict
    val q = StreamingSemDedup.semDedupStream(
        input.toDF(), centroids, minSimMicro = tau, maxMembers = 1000)
      .writeStream.format("memory").queryName("semdedup")
      .outputMode("append").start()
    input.addData(corpus: _*)
    q.processAllAvailable()
    input.addData(batch: _*)
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("semdedup")
      .as[(Long, Int, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val ref = reference(Seq(corpus, batch))
    assert(rows == ref, s"streamed $rows != reference $ref")
    // the exact copy (10) and near copy (11) flagged against CORPUS
    // members — cross-trigger state; the novel arrival (12) kept;
    // 15 flags its batch-internal lower-id twin 13 (which also sees
    // corpus member 2 within cosine reach? — the reference decides)
    assert(!rows(10L)._3 && !rows(11L)._3 && rows(12L)._3)
    assert(rows(15L)._2 >= 1L && !rows(15L)._3)
  }

  test("streaming input without a state bound is refused; an armed " +
      "maxMembers cap bounds the lookback (ADVICE r16 #2)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Emb]
    val err = intercept[IllegalArgumentException] {
      StreamingSemDedup.semDedupStream(input.toDF(), centroids,
        minSimMicro = tau)
    }
    assert(err.getMessage.contains("bound its state"))
    // cluster 0 arrivals: 0, then a far-but-same-cluster mate 4
    // (cos ≈ 0.60 < tau), then an exact copy of 0. Uncapped: 20
    // flags 0. With maxMembers = 1 only the most-recent member (4)
    // survives the window, so the copy of the EVICTED 0 is admitted
    // as novel — the documented lookback trade
    val seq = Seq(
      Emb(0L, Seq(0.9, 0.1, 0.0, 0.0)),
      Emb(4L, Seq(0.6, 0.0, 0.0, 0.8)),
      Emb(20L, Seq(0.9, 0.1, 0.0, 0.0)))
    val open = StreamingSemDedup.semDedupStream(seq.toDF(), centroids,
        minSimMicro = tau)
      .collect().map(v => v.vec_id -> v.kept).toMap
    val capped = StreamingSemDedup.semDedupStream(seq.toDF(), centroids,
        minSimMicro = tau, maxMembers = 1)
      .collect().map(v => v.vec_id -> v.kept).toMap
    assert(!open(20L), "uncapped: the exact copy of 0 must flag")
    assert(capped(20L), "cap 1: 0 was evicted, so its copy is novel")
  }

  test("armed cap: a mid-trigger re-arrival of an EVICTED vec is " +
      "re-admitted, same as a cross-trigger one (ADVICE r17 #3)") {
    implicit val sqlCtx = spark.sqlContext
    // state holds vec 5 (cluster 0); one trigger delivers [3, 5, 9]
    // (vec_id order). With maxMembers 1, vec 3 (dissimilar) evicts 5,
    // so 5's re-arrival leaves the seen set with its entry and is
    // re-admitted — it gets a verdict (dropped silently before the
    // fix) and becomes the prior that flags the copy 9
    val v0 = Seq(0.9, 0.1, 0.0, 0.0)
    val vFar = Seq(0.6, 0.0, 0.0, 0.8) // cluster 0, cos ≈ 0.60 < tau
    def run(triggers: Seq[Seq[Emb]], name: String): Seq[(Long, Boolean)] = {
      val input = MemoryStream[Emb]
      val q = StreamingSemDedup.semDedupStream(input.toDF(), centroids,
          minSimMicro = tau, maxMembers = 1)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      triggers.foreach { t =>
        input.addData(t: _*)
        q.processAllAvailable()
      }
      q.stop()
      spark.table(name).as[(Long, Int, Long, Boolean)].collect().toSeq
        .map(r => r._1 -> r._4)
    }
    val mid = run(Seq(Seq(Emb(5L, v0)),
      Seq(Emb(3L, vFar), Emb(9L, v0), Emb(5L, v0))), "sem_rearr_mid")
    val spread = run(Seq(Seq(Emb(5L, v0)), Seq(Emb(3L, vFar)),
      Seq(Emb(5L, v0)), Seq(Emb(9L, v0))), "sem_rearr_x")
    assert(mid.count(_._1 == 5L) == 2,
      s"the evicted 5 must get a verdict on re-arrival: $mid")
    assert(mid.toSet == spread.toSet,
      s"mid-trigger ($mid) and cross-trigger ($spread) must agree")
    assert(mid.contains(9L -> false),
      "the copy 9 must flag against the re-admitted 5")
  }

  test("batch execution + duplicate re-arrival dropped O(1)") {
    val out = StreamingSemDedup.semDedupStream(
        (corpus ++ batch ++ Seq(corpus.head)).toDF(), centroids,
        minSimMicro = tau, stateTtlMs = 60000L)
      .collect().map(v => v.vec_id -> ((v.cluster, v.n_dup, v.kept)))
      .toMap
    // the re-arrival of vec 0 is dropped, not double-counted
    assert(out.size == corpus.size + batch.size)
    assert(out == reference(Seq(corpus ++ batch)))
  }
}
