package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Graph, Relational, Similarity}

/** Gates for the round-11 join/graph/embedding operators: ordered-wedge
  * triangle counting, the star-schema revenue rollup, and mutual-NN
  * pairing. */
class Round11OpsSpec extends SparkTestBase {
  import spark.implicits._

  private def events(rows: (Long, Long, Long, String)*) =
    rows.toDF("event_id", "ts_us", "user_id", "event_type")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")

  // ---- triangleCount -----------------------------------------------

  test("triangleCount: one closed wedge = one triangle at every corner") {
    // user 1 walks a→b→c→a: undirected edges {ab, bc, ac} — exactly one
    // triangle, counted once, credited to all three corners.
    val ev = events(
      (1L, 1000L, 1L, "a"), (2L, 2000L, 1L, "b"),
      (3L, 3000L, 1L, "c"), (4L, 4000L, 1L, "a"))
    val r = Graph.triangleCount(ev).as[(String, Long)].collect().toMap
    assert(r == Map("a" -> 1L, "b" -> 1L, "c" -> 1L))
    Caches.releaseAll()
  }

  test("triangleCount: an open path has no triangles (empty result)") {
    // a→b→c only: wedge abc never closes (no ac edge).
    val ev = events(
      (1L, 1000L, 1L, "a"), (2L, 2000L, 1L, "b"), (3L, 3000L, 1L, "c"))
    assert(Graph.triangleCount(ev).count() == 0)
    Caches.releaseAll()
  }

  test("triangleCount: K4 has 4 triangles, 3 per corner") {
    // every ordered pair of {a,b,c,d} appears as a transition.
    val types = Seq("a", "b", "c", "d")
    val walks = for {
      (x, i) <- types.zipWithIndex; (y, j) <- types.zipWithIndex if i != j
    } yield (x, y)
    val rows = walks.zipWithIndex.flatMap { case ((x, y), k) =>
      // separate user per transition so each walk contributes one edge
      Seq((k * 2 + 1L, 1000L, k + 100L, x), (k * 2 + 2L, 2000L, k + 100L, y))
    }
    val r = Graph.triangleCount(events(rows: _*)).as[(String, Long)]
      .collect().toMap
    assert(r == types.map(_ -> 3L).toMap, "C(4,3)=4 triangles, each corner in 3")
    Caches.releaseAll()
  }

  // ---- revenueByNation ---------------------------------------------

  test("revenueByNation: cents floor per row, dims resolve, buckets split") {
    val li = Seq(
      (1L, 10.0, 0.1), // 10·0.9·100 = 900 cents
      (1L, 0.555, 0.0), //  55.5 → 55 cents (floor BEFORE the sum)
      (2L, 100.0, 0.25) // 7500 cents
    ).toDF("l_orderkey", "l_extendedprice", "l_discount")
    val day = 86400000000L
    val ord = Seq(
      (1L, 5L, new Timestamp(10L * 86400000L)), // day 10 → bucket 0
      (2L, 6L, new Timestamp(40L * 86400000L))  // day 40 → bucket 1
    ).toDF("o_orderkey", "o_custkey", "o_orderdate")
    val cust = Seq((5L, 1), (6L, 2)).toDF("c_custkey", "c_nationkey")
    val nat = Seq((1, "FRANCE"), (2, "KENYA")).toDF("n_nationkey", "n_name")
    val r = Relational.revenueByNation(li, ord, cust, nat)
      .select("n_name", "bucket", "n_items", "revenue_cents")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(r == Seq(("FRANCE", 0L, 2L, 955L), ("KENYA", 1L, 1L, 7500L)))
  }

  test("revenueByNation: the nation dim joins as a broadcast") {
    val li = Seq((1L, 10.0, 0.0)).toDF("l_orderkey", "l_extendedprice", "l_discount")
    val ord = Seq((1L, 5L, new Timestamp(0L))).toDF("o_orderkey", "o_custkey", "o_orderdate")
    val cust = Seq((5L, 1)).toDF("c_custkey", "c_nationkey")
    val nat = Seq((1, "FRANCE")).toDF("n_nationkey", "n_name")
    val plan = Relational.revenueByNation(li, ord, cust, nat)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "nation must broadcast")
  }

  // ---- mutualTop1 --------------------------------------------------

  test("mutualTop1: emits exactly the reciprocal pairs, once, a<b") {
    // one plane (1,0): all +x vectors share bucket 1. Cosines:
    // v0·v1 nearly parallel (mutual), v2 closest to v1 but v1's top-1
    // is v0 — one-sided, must NOT appear.
    val emb = Seq(
      (0L, Array(1.0f, 0.1f)),
      (1L, Array(1.0f, 0.12f)),
      (2L, Array(1.0f, 0.5f))
    ).toDF("vec_id", "embedding")
    val ps = Seq(Seq(1L, 0L))
    val r = Similarity.mutualTop1(emb, ps)
      .as[(Long, Long, Long)].collect().toSeq
    assert(r.map(p => (p._1, p._2)) == Seq((0L, 1L)))
    assert(r.head._3 > 990000L, "near-parallel pair: sim_micro ≈ 1e6")
  }

  test("mutualTop1: vectors in different buckets never pair") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), // bucket 1
      (1L, Array(-1.0f, 0.0f)) // bucket 0 — opposite side of the plane
    ).toDF("vec_id", "embedding")
    val ps = Seq(Seq(1L, 0L))
    assert(Similarity.mutualTop1(emb, ps).count() == 0)
  }

  // ---- editDistConfirm / prefixDup / invertedIndex -----------------

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("editDistConfirm: identical docs pair at distance 0, confirmed") {
    // identical token sets → identical minhash signatures → candidate
    val d = docs(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "utterly different words entirely here now"))
    val r = graft.operators.Dedup.editDistConfirm(d)
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(r == Seq((1L, 2L, 0L, true)))
    Caches.releaseAll()
  }

  test("editDistConfirm: a candidate pair beyond maxDist is unconfirmed") {
    // Long shared tail → the shingle min-lanes land in shared shingles
    // and at least one band agrees (deterministic for this fixture);
    // the differing HEADS sit inside the prefix, so the character tier
    // rejects what the set tier proposed.
    val tail = (1 to 60).map(i => s"w$i").mkString(" ")
    val d = docs(
      (1L, s"zebra zulu $tail"),
      (2L, s"quark quill $tail"))
    val r = graft.operators.Dedup.editDistConfirm(d, maxDist = 1)
      .select("edit_dist", "confirmed").as[(Long, Boolean)].collect().toSeq
    assert(r.size == 1, "the shared-tail pair must survive banding")
    assert(r.head._1 > 1L && !r.head._2)
    Caches.releaseAll()
  }

  test("prefixDup: clusters on first-k tokens, keep-lowest canonical") {
    val d = docs(
      (7L, "the quick brown fox"),
      (3L, "the quick red panda"), // shares first 2 tokens with 7
      (9L, "a different start entirely"))
    val r = graft.operators.Dedup.prefixDup(d, k = 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(r == Seq((3L, 3L, 2L), (7L, 3L, 2L)))
  }

  test("invertedIndex: df band filters, postings sorted, per-doc distinct") {
    val d = docs(
      (5L, "apple banana apple"), // apple df-counts once here
      (2L, "apple cherry"),
      (8L, "apple banana"))
    // apple df=3 (> maxDf 2, dropped), banana df=2, cherry df=1 (< minDf)
    val r = graft.operators.TextAnalysis.invertedIndex(d, minDf = 2, maxDf = 2)
      .as[(String, Long, String)].collect().toSeq
    assert(r == Seq(("banana", 2L, "5,8")))
  }
}
