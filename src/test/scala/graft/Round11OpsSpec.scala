package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Graph, Relational, Sampling, Similarity}

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

  test("editDistConfirm: a set-equal rep pair confirms within maxDist") {
    // identical shingle SETS over distinct texts → identical minhash
    // signatures → candidate rep pair (identical TEXTS collapse away
    // since r16 — they are textExactDedup's report, not a candidate);
    // the appended 6 characters are the whole edit distance
    val d = docs(
      (1L, "a b c a b c a b c"),
      (2L, "a b c a b c a b c a b c"),
      (3L, "utterly different words entirely here now"))
    val r = graft.operators.Dedup.editDistConfirm(d)
      .select("doc_a", "doc_b", "edit_dist", "confirmed")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(r == Seq((1L, 2L, 6L, true)))
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

  // ---- recencyFeatures / targetEncode ------------------------------

  test("recencyFeatures: first-event gap is NULL, ordinals count per user") {
    val ev = Seq(
      (1L, 100L, 1L, "a", 0.0), (2L, 350L, 1L, "b", 0.0),
      (3L, 200L, 2L, "a", 0.0))
      .toDF("event_id", "ts_us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
    val r = graft.operators.Events.recencyFeatures(ev)
      .as[(Long, Long, Option[Long], Long)].collect().toSeq
    assert(r == Seq((1L, 1L, None, 1L), (2L, 1L, Some(250L), 2L),
      (3L, 2L, None, 1L)))
  }

  test("targetEncode: LOO excludes self; singleton category is den=0") {
    val ev = Seq(
      (1L, 10L, 1L, "a", 1.0), (2L, 20L, 1L, "a", 2.0),
      (3L, 30L, 1L, "a", 3.0),
      (4L, 40L, 1L, "b", 9.0))
      .toDF("event_id", "ts_us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
    val r = graft.operators.Stats.targetEncode(ev)
      .select("event_id", "loo_num", "loo_den")
      .as[(Long, Long, Long)].collect().toSeq
    assert(r == Seq((1L, 5000000L, 2L), (2L, 4000000L, 2L),
      (3L, 3000000L, 2L), (4L, 0L, 0L)))
  }

  test("sourceTerms: lift ranks the source-distinctive term first") {
    // "zzz" appears only in source A (10×); "common" is everywhere.
    // Lift(zzz | A) = (c_st·T)/(c_s·c_t) > 1e6; lift(common) ≈ 1e6.
    val d = (1 to 10).map(i => (i.toLong, "zzz common", "A")) ++
      (11 to 20).map(i => (i.toLong, "common common", "B"))
    val df = d.toDF("doc_id", "text", "source")
    val r = graft.operators.TextAnalysis.sourceTerms(df, k = 1, minCount = 5)
      .select("source", "term", "lift_ppm")
      .as[(String, String, Long)].collect().toSeq
    assert(r.head == ("A", "zzz", 2000000L),
      "zzz: (10·40)/(20·10) = 2× corpus share")
    assert(r.map(_._1) == Seq("A", "B"))
    Caches.releaseAll()
  }

  test("dedupThresholdSweep: a set-equal rep pair is perfect at every threshold") {
    val d = docs(
      (1L, "a b c a b c a b c"),
      (2L, "a b c a b c a b c a b c"), // same shingle set, distinct text
      (3L, "wholly different content with other words"))
    val r = graft.operators.Dedup.dedupThresholdSweep(d)
      .select("thresh_milli", "n_pairs", "tp", "precision_ppm", "recall_ppm")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(r.size == 6)
    assert(r.forall(t => t._2 == 1L && t._3 == 1L
      && t._4 == 1000000L && t._5 == 1000000L))
    Caches.releaseAll()
  }

  test("termCooc: perfectly-coupled rare terms earn positive PPMI bits") {
    val d = docs(
      (1L, "aa bb"), (2L, "aa bb"), // aa,bb always together
      (3L, "cc dd"), (4L, "cc dd"))
    // df(aa)=df(bb)=2, c_ab=2, N=4: lift = 2·4/(2·2) = 2 → 1 bit
    val r = graft.operators.TextAnalysis.termCooc(d, minPairCount = 1L)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(r == Seq(("aa", "bb", 2L, 1L), ("cc", "dd", 2L, 1L)))
    Caches.releaseAll()
  }

  test("docVectors + kmeans: identical docs share a vector and a cluster") {
    val d = docs(
      (0L, "aa aa aa"), (2L, "aa aa aa"), (4L, "aa aa aa"),
      (1L, "zz zz zz"), (3L, "zz zz zz"), (5L, "zz zz zz"))
    // nBuckets must match KMeans's fixed 64-dim contract
    val vecs = graft.operators.TextAnalysis.docVectors(d)
    assert(vecs.select("embedding").distinct().count() == 2,
      "two distinct texts -> two distinct hashed vectors")
    val r = graft.operators.KMeans.assignments(vecs, k = 2, iters = 2)
      .select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    assert(r(0L) == r(2L) && r(2L) == r(4L))
    assert(r(1L) == r(3L) && r(3L) == r(5L))
    assert(r(0L) != r(1L), "seeded one side each: groups must separate")
    Caches.releaseAll()
  }

  // ---- featureHash / docChunks -------------------------------------

  test("featureHash: buckets match the builtin md5 lane, counts conserve tokens") {
    val d = docs((1L, "aa bb aa"), (2L, "cc"))
    val r = graft.operators.TextAnalysis.featureHash(d, nBuckets = 8)
    val rows = r.as[(Long, Long, Long)].collect().toSeq
    assert(rows.map(_._3).sum == 4L, "every token lands in a bucket")
    assert(rows.forall(t => t._2 >= 0 && t._2 < 8))
    // differential vs the composed builtin form
    import graft.functions.PortableHash
    val expect = d.select(col("doc_id"),
        explode(graft.operators.TextAnalysis.tokens(col("text"))).as("t"))
      .select(col("doc_id"),
        pmod(PortableHash.hash32Builtin(col("t")), lit(8L)).as("bucket"))
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("cnt"))
      .orderBy("doc_id", "bucket")
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows == expect)
  }

  test("docChunks: overlap, tail cap, and full coverage") {
    val d = docs((1L, "a b c d e"))
    val r = graft.operators.TextAnalysis.docChunks(d, window = 3, stride = 2)
      .select("chunk_id", "start_tok", "end_tok", "chunk_text")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(r == Seq(
      (0L, 0L, 3L, "a b c"),
      (1L, 2L, 5L, "c d e"),
      (2L, 4L, 5L, "e")))
  }

  // ---- tfidfSim ----------------------------------------------------

  test("tfidfSim: rare shared terms outrank common ones; self excluded") {
    // 8 docs so idf bits differ: "rare" df=2, "mid" df=4, "stop" df=8.
    // Query doc 0 shares "rare" with doc 4 and "mid" with doc 5 — the
    // rare-term pair must rank first.
    val d = Seq(
      (0L, "rare mid stop"),
      (1L, "stop x1 x2"), (2L, "stop x1 x3"), (3L, "stop x2 x4"),
      (4L, "rare stop x5"),
      (5L, "mid stop x6"), (6L, "mid stop x7"), (7L, "mid stop x8")
    ).toDF("doc_id", "text")
    val r = graft.operators.TextAnalysis.tfidfSim(d, nQueries = 1, k = 3)
      .select("rank", "cand_id").as[(Int, Long)].collect().toSeq
    assert(r.head == (1, 4L), "the rare-term pair wins")
    assert(!r.exists(_._2 == 0L), "a doc never retrieves itself")
    Caches.releaseAll()
  }

  test("tfidfSim: maxDf cap drops a term from both dot AND norm") {
    // With maxDf = 1 every term (df >= 2 here) is dropped -> no vectors,
    // no pairs: the cap is part of the vector definition, not a
    // post-filter.
    val d = Seq((0L, "a b"), (1L, "a b")).toDF("doc_id", "text")
    val r = graft.operators.TextAnalysis.tfidfSim(d, nQueries = 1, k = 3,
      maxDf = 1)
    assert(r.count() == 0)
    Caches.releaseAll()
  }

  // ---- pricingSummary / topCustomers -------------------------------

  test("pricingSummary: per-row cent floors, grouped lanes") {
    val li = Seq(
      ("A", "F", 2.0, 10.555, 0.1, 0.2), // base 1055, disc 949, charge 1139
      ("A", "F", 1.0, 1.004, 0.0, 0.0), //  base 100,  disc 100, charge 100
      ("R", "O", 3.0, 50.0, 0.5, 0.1) //   base 5000, disc 2500, charge 2750
    ).toDF("l_returnflag", "l_linestatus", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax")
    val r = Relational.pricingSummary(li)
      .as[(String, String, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(r == Seq(
      ("A", "F", 3L, 1155L, 1049L, 1239L, 1000L, 2L),
      ("R", "O", 3L, 5000L, 2500L, 2750L, 5000L, 1L)))
  }

  test("topCustomers: plans as TakeOrdered (no global sort) and tie-breaks on key") {
    val ord = Seq(
      (1L, 10.0), (1L, 10.0), // cust 1: 2000 cents
      (2L, 20.0), //             cust 2: 2000 cents — tie, lower key first
      (3L, 5.0) //               cust 3: 500, cut by k=2
    ).toDF("o_custkey", "o_totalprice")
    val cust = Seq((1L, "alice"), (2L, "bo"), (3L, "kai"))
      .toDF("c_custkey", "c_name")
    val q = Relational.topCustomers(ord, cust, k = 2)
    assert(q.queryExecution.executedPlan.toString.contains("TakeOrdered"),
      "top-k must be a TakeOrderedAndProject, not a global Sort")
    val r = q.select("c_custkey", "revenue_cents").as[(Long, Long)]
      .collect().toSeq
    assert(r == Seq((1L, 2000L), (2L, 2000L)))
  }

  test("regionalVolume: only local-supplier revenue in the named region counts") {
    val li = Seq(
      (1L, 10L, 100.0, 0.0), // order 1, supp 10 (nation 1) — local ✓
      (2L, 20L, 50.0, 0.0), //  order 2, supp 20 (nation 2) — cust nation 1 ✗
      (3L, 30L, 25.0, 0.0) //   order 3, supp 30 (nation 3, region B) ✗ region
    ).toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val ord = Seq((1L, 5L), (2L, 5L), (3L, 6L))
      .toDF("o_orderkey", "o_custkey")
    val cust = Seq((5L, 1), (6L, 3)).toDF("c_custkey", "c_nationkey")
    val supp = Seq((10L, 1), (20L, 2), (30L, 3))
      .toDF("s_suppkey", "s_nationkey")
    val nat = Seq((1, "JAPAN", 0), (2, "CHINA", 0), (3, "FRANCE", 1))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val reg = Seq((0, "ASIA"), (1, "EUROPE")).toDF("r_regionkey", "r_name")
    val r = Relational.regionalVolume(li, ord, cust, supp, nat, reg, "ASIA")
      .as[(String, Long, Long)].collect().toSeq
    assert(r == Seq(("JAPAN", 1L, 10000L)),
      "non-local supplier and out-of-region nation must both drop")
  }

  test("priorityExists: LeftSemi plan; an order with many qualifying lines counts once") {
    val ord = Seq((1L, "1-URGENT"), (2L, "1-URGENT"), (3L, "5-LOW"))
      .toDF("o_orderkey", "o_orderpriority")
    val li = Seq(
      (1L, 50.0), (1L, 49.0), // two qualifying lines, ONE order
      (3L, 10.0) //              below threshold
    ).toDF("l_orderkey", "l_quantity")
    val q = Relational.priorityExists(ord, li, minQty = 45.0)
    assert(q.queryExecution.executedPlan.toString.contains("LeftSemi"),
      "EXISTS must plan as a semi-join")
    val r = q.as[(String, Long)].collect().toSeq
    assert(r == Seq(("1-URGENT", 1L)))
  }

  test("fkOrphans: orphan children counted, clean edge flagged clean") {
    val li = Seq(1L, 1L, 2L, 9L).toDF("l_orderkey") // 9 has no parent
    val ord = Seq((1L, 5L), (2L, 5L)).toDF("o_orderkey", "o_custkey")
    val cust = Seq(Tuple1(5L)).toDF("c_custkey")
    val r = Relational.fkOrphans(li, ord, cust)
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(r == Seq(
      ("lineitem.l_orderkey->orders", 4L, 1L, false),
      ("orders.o_custkey->customer", 2L, 0L, true)))
  }

  test("outageGaps: gaps between non-empty minutes, largest first") {
    val ev = events(
      (1L, 0L, 1L, "a"), (2L, 60000000L, 1L, "a"), // minutes 0, 1
      (3L, 5L * 60000000L, 1L, "a"), (4L, 6L * 60000000L, 1L, "a"), // 5, 6
      (5L, 20L * 60000000L, 1L, "a")) //                               20
    val r = graft.operators.Events.outageGaps(ev)
      .as[(Long, Long, Long)].collect().toSeq
    assert(r == Seq((7L, 13L, 20L), (2L, 3L, 5L)))
  }

  test("embedExactDedup: identical vectors cluster to the lowest id") {
    val emb = Seq(
      (3L, Array(1.0f, 2.0f)),
      (7L, Array(1.0f, 2.0f)),
      (5L, Array(9.0f, 9.0f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.embedExactDedup(emb)
      .as[(Long, Long, Long)].collect().toSeq
    assert(r == Seq((3L, 3L, 2L), (7L, 3L, 2L)))
  }

  // ---- plan-shape guards for the r11 SURVEY claims -----------------

  test("cdcApply plans as an aggregate, never a per-key history sort window") {
    val ev = Seq((1L, 100L, 1L, "view", 1.0), (2L, 200L, 1L, "click", 2.0))
      .toDF("event_id", "ts_us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
    val plan = graft.operators.Lifecycle.cdcApply(ev)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "latest-per-key must ride max(struct) partial aggregation")
    assert(plan.contains("Aggregate"))
  }

  test("fkOrphans plans both edges as LeftAnti joins") {
    val li = Seq(1L).toDF("l_orderkey")
    val ord = Seq((1L, 5L)).toDF("o_orderkey", "o_custkey")
    val cust = Seq(Tuple1(5L)).toDF("c_custkey")
    val plan = Relational.fkOrphans(li, ord, cust)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"))
  }

  test("regionalVolume broadcasts the region-filtered nation dim") {
    val li = Seq((1L, 10L, 1.0, 0.0))
      .toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val ord = Seq((1L, 5L)).toDF("o_orderkey", "o_custkey")
    val cust = Seq((5L, 1)).toDF("c_custkey", "c_nationkey")
    val supp = Seq((10L, 1)).toDF("s_suppkey", "s_nationkey")
    val nat = Seq((1, "JAPAN", 0)).toDF("n_nationkey", "n_name", "n_regionkey")
    val reg = Seq((0, "ASIA")).toDF("r_regionkey", "r_name")
    val plan = Relational.regionalVolume(li, ord, cust, supp, nat, reg, "ASIA")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  // ---- groupedPercentiles / paretoDocs -----------------------------

  test("groupedPercentiles: lower empirical quantile per group, no cross-group carry") {
    // type a: values 1..10 → p50 = 5 (smallest with cum ≥ 50%), p90 = 9.
    // type b: all 100s → both quantiles 100 (carry from a would shift
    // b's ranks and break this).
    val rows = (1 to 10).map(i => (i.toLong, 1000L + i, 1L, "a", i.toDouble)) ++
      (1 to 4).map(i => (100L + i, 2000L + i, 2L, "b", 100.0))
    val ev = rows.toDF("event_id", "ts_us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
    val r = graft.operators.Profile.groupedPercentiles(ev)
      .as[(String, Double, Double)].collect().toSeq
    assert(r == Seq(("a", 5.0, 9.0), ("b", 100.0, 100.0)))
    Caches.releaseAll()
  }

  test("quantileNormalize: within-type inclusive-rank ppm, no cross-type carry") {
    val rows = (1 to 4).map(i => (i.toLong, 1000L + i, 1L, "a", i.toDouble)) ++
      Seq((9L, 2000L, 2L, "b", 50.0))
    val ev = rows.toDF("event_id", "ts_us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
    val r = graft.operators.Profile.quantileNormalize(ev)
      .select("event_id", "cdf_ppm").as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 250000L, 2L -> 500000L, 3L -> 750000L,
      4L -> 1000000L, 9L -> 1000000L))
    Caches.releaseAll()
  }

  test("winsorize: values clamp to the per-type cuts, rows preserved") {
    val rows = (1 to 10).map(i => (i.toLong, 1000L + i, 1L, "a", i.toDouble))
    val ev = rows.toDF("event_id", "ts_us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
    // lower-quantile cuts on 1..10: p10 = 1 (cum 1/10 hits 10%), p90 = 9
    val m = graft.operators.Profile.winsorize(ev)
      .select("event_id", "clipped", "was_clipped")
      .as[(Long, Double, Boolean)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(m(10L) == (9.0, true), "10 clamps down to p90 = 9")
    assert(m(9L) == (9.0, false) && m(1L) == (1.0, false))
    assert(m.size == 10, "winsorize never drops rows")
    Caches.releaseAll()
  }

  test("paretoDocs: skyline keeps per-score best length and strict improvements only") {
    // stopword-free all-alpha texts → score = n_tokens·100 exactly.
    val d = Seq(
      (1L, "aa bb cc", 20L), //   score 300, len 20 — top score, survives
      (2L, "aa bb", 10L), //      score 200, len 10 — beaten by doc 3
      (3L, "aa bb", 5L), //       score 200, len  5 — survives (5 < 20)
      (4L, "aa", 3L), //          score 100, len  3 — survives (3 < 5)
      (5L, "aa", 8L) //           score 100, len  8 — beaten by doc 4
    ).toDF("doc_id", "text", "n_chars")
    val r = Sampling.paretoDocs(d)
      .as[(Long, Long, Long)].collect().toSeq
    assert(r == Seq((1L, 300L, 20L), (3L, 200L, 5L), (4L, 100L, 3L)))
    Caches.releaseAll()
  }
}
