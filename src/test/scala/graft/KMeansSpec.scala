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

  test("semDedup: crafted near-identical cluster-mates drop, lowest id kept") {
    // blob A: three near-identical vectors (cos ~1) + blob B: one far
    // vector and one near-identical partner; init (vec_id 0, 1) puts a
    // centroid in each blob
    val rows = Seq(
      (0L, vec(100f, 0f)), (2L, vec(100f, 0.1f)), (4L, vec(100f, -0.1f)),
      (1L, vec(-100f, 0f)), (3L, vec(-100f, 0.2f)))
      .map { case (id, v) => (id, v, 0) }
    val emb = rows.toDF("vec_id", "embedding", "label")
    val r = KMeans.semDedup(emb, k = 2, iters = 2, minSimMicro = 990000L)
      .select("vec_id", "keep", "dup_sim_micro")
      .as[(Long, Boolean, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(r(0L)._1 && r(1L)._1, "lowest ids are kept")
    assert(!r(2L)._1 && !r(4L)._1 && !r(3L)._1,
      "near-identical higher-id cluster-mates are dropped")
    assert(r(0L)._2 == -1L, "kept rows carry the -1 sentinel")
    assert(r(2L)._2 >= 990000L, "dropped rows carry the duplicate sim")
    Caches.releaseAll()
  }

  test("semDedupInc: exact copy / near copy / novel / batch-internal " +
      "verdicts against the corpus-trained staged model") {
    // VERDICT r15 #3. Orthonormal axes: corpus holds A = e0 and
    // B = e1; targetClusterSize huge → k = 1 (one cluster, so the
    // cluster scoping is out of the way and the four CASES drive the
    // verdicts). Batch: an exact copy of A, a near copy of A, a novel
    // axis e3, and a batch-internal dup of that novel vector.
    def axis(i: Int, eps: Double = 0.0): Seq[Float] =
      Seq.tabulate(dim)(j => if (j == i) 1f
        else if (eps != 0.0 && j == 8) eps.toFloat else 0f)
    val corpus = Seq((0L, axis(0), 0), (2L, axis(1), 0))
      .toDF("vec_id", "embedding", "label")
    val batch = Seq(
      (1L, axis(0), 0),        // exact copy of corpus 0
      (3L, axis(0, 0.01), 0),  // near copy (cos ≈ 0.99995)
      (5L, axis(3), 0),        // novel axis
      (7L, axis(3), 0))        // batch-internal dup of 5
      .toDF("vec_id", "embedding", "label")
    val out = KMeans.semDedupInc(corpus, batch,
        targetClusterSize = 1000L)
      .orderBy("vec_id")
      .select("vec_id", "n_dup", "kept")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, 1L, false), // corpus 0 only (cos(A, B) = 0)
      (3L, 2L, false), // corpus 0 + lower batch 1
      (5L, 0L, true),  // novel: kept
      (7L, 1L, false)), // lower batch sibling 5 only
      s"got $out")
    // asymmetry: the corpus is canonical — only batch rows get verdicts
    assert(out.map(_._1) == Seq(1L, 3L, 5L, 7L))
    Caches.releaseAll()
  }

  test("semDedup pairs are cluster-scoped; keep-count + drops = corpus") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val asg = KMeans.fit(emb).select(col("vec_id"), col("cluster"))
      .as[(Long, Long)].collect().toMap
    val r = KMeans.semDedup(emb, k = 8).select("vec_id", "cluster", "keep")
      .as[(Long, Long, Boolean)].collect()
    assert(r.length == asg.size, "one row per vector, kept or not")
    assert(r.forall { case (id, cl, _) => asg(id) == cl })
    val dropped = r.filter(!_._3).map(_._1).toSet
    // every dropped vector must have a LOWER-id cluster-mate (the
    // pairwise keep-lowest policy can never drop a cluster minimum)
    val minPerCluster = asg.groupBy(_._2).map { case (c, m) => c -> m.keys.min }
    assert(dropped.forall(id => minPerCluster(asg(id)) < id))
    Caches.releaseAll()
  }

  test("semDedup == brute-force within-cluster near-dup (fixture differential)") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val tau = 350000L
    // test-side reference: exact all-pairs cosine WITHIN each trained
    // cluster, drop policy = any lower-id mate with floor(sim*1e6) >= τ
    val asg = KMeans.fit(emb)
      .select(col("vec_id"), col("cluster"), col("v"))
      .as[(Long, Long, Seq[Double])].collect()
    def dot(a: Seq[Double], b: Seq[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    val expectDropped = (for {
      Seq((ia, ca, va), (ib, cb, vb)) <- asg.sortBy(_._1).toSeq.combinations(2)
      if ca == cb
      sim = dot(va, vb) / (math.sqrt(dot(va, va)) * math.sqrt(dot(vb, vb)))
      if math.floor(sim * 1000000L).toLong >= tau
    } yield math.max(ia, ib)).toSet
    val got = KMeans.semDedup(emb, k = 8, minSimMicro = tau)
      .select("vec_id", "keep").as[(Long, Boolean)].collect()
      .filter(!_._2).map(_._1).toSet
    assert(got == expectDropped,
      s"drop sets differ: extra=${got -- expectDropped} missing=${expectDropped -- got}")
    assert(got.nonEmpty, "fixture should produce at least one drop at τ=0.35")
    Caches.releaseAll()
  }

  test("deriveK bounds expected cluster size at any corpus scale") {
    assert(KMeans.deriveK(0) == 1)
    assert(KMeans.deriveK(500) == 1)             // fixture-sized: 1 cluster ok
    assert(KMeans.deriveK(100000000L) == 100000) // the paper's web-scale shape
    assert(KMeans.deriveK(10000000000000L) == Int.MaxValue) // clamped, no overflow
    assert(KMeans.deriveK(Long.MaxValue) == Int.MaxValue)
  }

  test("pqEncode == per-subspace brute-force fixed-point Lloyd (differential)") {
    // 8 vectors of 4 16-dim blocks; block j of vector i follows
    // prototype (i+j)%4 with a small per-vector jitter (no ties)
    val vecs: Map[Long, Seq[Double]] = (0L until 8L).map { i =>
      i -> (0 until 64).map { d =>
        val proto = ((i + d / 16) % 4 + 1).toDouble
        proto + i * 0.001 + d * 0.0001
      }
    }.toMap
    val emb = vecs.toSeq.map { case (id, v) => (id, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
    // test-side reference: the EXACT fixed-point Lloyd of
    // KMeans.updateCentroids (sum of floor(x*1e6) / 1e6 / n — all
    // doubles exact below 2^53, so bit-equality is expected)
    def d2(a: Seq[Double], b: Seq[Double]): Double =
      a.indices.foldLeft(0.0)((s, i) => s + (a(i) - b(i)) * (a(i) - b(i)))
    def lloyd(sub: Map[Long, Seq[Double]], k: Int,
              iters: Int): Map[Long, (Int, Double)] = {
      var cents: Map[Long, Seq[Double]] = sub.filter(_._1 < k)
      def assignAll() = sub.map { case (id, v) =>
        val best = cents.toSeq
          .map { case (cid, c) => (d2(v, c), cid) }.minBy(identity)
        id -> (best._2, best._1)
      }
      var asg = assignAll()
      (1 until iters).foreach { _ =>
        val upd = asg.groupBy(_._2._1).map { case (cid, members) =>
          val vs = members.keys.map(sub).toSeq
          cid -> vs.head.indices.map(d =>
            vs.map(v => math.floor(v(d) * 1e6)).sum / 1e6 / vs.size)
        }
        cents = cents.map { case (cid, c) => cid -> upd.getOrElse(cid, c) }
        asg = assignAll()
      }
      asg.map { case (id, (cid, dd)) => id -> (cid.toInt, dd) }
    }
    // float32 storage: mirror the cast the operator reads back
    val asDouble = vecs.map { case (id, v) =>
      id -> v.map(x => x.toFloat.toDouble)
    }
    val expect = (0L until 8L).map { i =>
      val perBlock = (0 until 4).map { j =>
        lloyd(asDouble.map { case (id, v) =>
          id -> v.slice(j * 16, (j + 1) * 16)
        }, k = 4, iters = 2)(i)
      }
      i -> (perBlock.map(_._1),
        math.floor(perBlock.map(_._2).sum * 1000).toLong)
    }.toMap
    val got = KMeans.pqEncode(emb)
      .as[(Long, Int, Int, Int, Int, Long)].collect()
      .map(t => t._1 -> ((Seq(t._2, t._3, t._4, t._5), t._6))).toMap
    Caches.releaseAll()
    assert(got.keySet == expect.keySet)
    got.foreach { case (id, (codes, err)) =>
      assert(codes == expect(id)._1, s"vec $id codes: $codes != ${expect(id)._1}")
      assert(err == expect(id)._2, s"vec $id err: $err != ${expect(id)._2}")
    }
    // layout invariance: same codes under a different physical deal
    val again = KMeans.pqEncode(emb.repartition(5))
      .as[(Long, Int, Int, Int, Int, Long)].collect().toSet
    assert(again == KMeans.pqEncode(emb)
      .as[(Long, Int, Int, Int, Int, Long)].collect().toSet)
    Caches.releaseAll()
  }

  test("topkPqAdc: shape, self-exclusion, ADC ordering, code-equivalence") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val r = KMeans.topkPqAdc(emb).as[(Long, Int, Long, Long)].collect()
    Caches.releaseAll()
    val byQ = r.groupBy(_._1)
    assert(byQ.keySet == (0L until 10L).toSet, "one block per query")
    byQ.foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to rows.length),
        s"query $q ranks must be 1..k")
      assert(rows.forall(_._3 != q), s"query $q must exclude itself")
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sorted.toSeq,
        s"query $q ADC distance must ascend with rank")
    }
    // ADC sees only codes: two vectors with identical codewords are
    // indistinguishable — any that appear for the same query must
    // carry the same distance
    val codes = KMeans.pqEncode(emb)
      .as[(Long, Int, Int, Int, Int, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    Caches.releaseAll()
    r.groupBy(t => (t._1, codes(t._3))).values.foreach { grp =>
      assert(grp.map(_._4).toSet.size == 1,
        "identical codes must be ADC-indistinguishable")
    }
  }

  test("annIvfAdc: candidates stay in the query's coarse cell; ADC ordering") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val r = KMeans.annIvfAdc(emb).as[(Long, Int, Long, Long)].collect()
    Caches.releaseAll()
    // independent coarse assignment with the same parameters
    val cells = KMeans.fit(emb, k = 8, iters = 2)
      .select(col("vec_id"), col("cluster"))
      .as[(Long, Long)].collect().toMap
    Caches.releaseAll()
    assert(r.nonEmpty)
    r.groupBy(_._1).foreach { case (q, rows) =>
      rows.foreach { t =>
        assert(cells(t._3) == cells(q),
          s"query $q: candidate ${t._3} escaped the coarse cell")
      }
      assert(rows.forall(_._3 != q), s"query $q must exclude itself")
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to rows.length))
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sorted.toSeq,
        s"query $q ADC distance must ascend with rank")
    }
  }

  test("annIvfAdcNprobe(2) refines annIvfAdc: wider probe never worsens ADC top-k") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val one = KMeans.annIvfAdc(emb)
      .as[(Long, Int, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._4)).toMap
    Caches.releaseAll()
    val two = KMeans.annIvfAdcNprobe(emb, nprobe = 2)
      .as[(Long, Int, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._4)).toMap
    Caches.releaseAll()
    assert(one.keySet == two.keySet)
    // nprobe=2's candidate pool is a superset (own cell ⊆ 2 nearest
    // cells), so at every rank its ADC distance can only improve
    one.keySet.foreach { q =>
      one(q).zip(two(q)).zipWithIndex.foreach { case ((d1, d2x), r) =>
        assert(d2x <= d1, s"query $q rank ${r + 1}: nprobe=2 worsened")
      }
    }
  }

  test("k=0 sentinel: semDedup/clusterOutliers derive k from the corpus count") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val n = emb.count()
    val kd = KMeans.deriveK(n, 64)
    assert(kd == 7, "500-row fixture at targetClusterSize=64 derives k=7")
    // the derived k bounds expected pair work: E[|cluster|] ≤ target,
    // so the within-cluster self-join emits ~n·target/2 candidate
    // rows, linear in the corpus — not n²/2
    assert(n / kd <= 64 + 64, "expected cluster size stays ~target")
    val auto = KMeans.semDedup(emb, targetClusterSize = 64)
      .select("vec_id", "cluster", "keep")
      .as[(Long, Long, Boolean)].collect().toSet
    Caches.releaseAll()
    val pinned = KMeans.semDedup(emb, k = kd)
      .select("vec_id", "cluster", "keep")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(auto == pinned, "sentinel path must equal the pinned derived k")
    Caches.releaseAll()
    val autoOut = KMeans.clusterOutliers(emb, targetClusterSize = 64)
      .as[(Long, Int, Long, Long)].collect().toSet
    val pinnedOut = KMeans.clusterOutliers(emb, k = kd)
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(autoOut == pinnedOut)
    Caches.releaseAll()
  }

  test("clusterOutliers: rank 1 is the cluster's max distance, bounded per cluster") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = KMeans.clusterOutliers(emb, k = 8, perCluster = 3)
      .as[(Long, Int, Long, Long)].collect()
    val byCluster = out.groupBy(_._1)
    assert(byCluster.values.forall(_.length <= 3))
    val full = KMeans.fit(emb)
      .select(col("cluster"), col("vec_id"),
        floor(col("d2") * 1000).cast("long").as("d2_milli"))
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    byCluster.foreach { case (cl, rows) =>
      val top = rows.sortBy(_._2).map(_._4)
      assert(top.toSeq == top.sorted.reverse.toSeq,
        s"cluster $cl outlier ranks are distance-descending")
      assert(top.head == full(cl).map(_._3).max,
        s"cluster $cl rank 1 is the true farthest member")
    }
    Caches.releaseAll()
  }

  test("clusterQuality: exact dashboard on two separable blobs") {
    // blob A at x≈±100 (spread 1 on y), blob B mirrored; init takes
    // vec_ids 0 and 1 — converged after iters=2, centroids at the
    // fixed-point means
    val rows = Seq(
      (0L, vec(100f, 0f)), (2L, vec(100f, 1f)), (4L, vec(100f, -1f)),
      (1L, vec(-100f, 0f)), (3L, vec(-100f, 1f)), (5L, vec(-100f, -1f)))
      .map { case (id, v) => (id, v, 0) }
    val emb = rows.toDF("vec_id", "embedding", "label")
    val r = KMeans.clusterQuality(emb, k = 2, iters = 2)
      .as[(Long, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().toSeq
    assert(r.map(t => (t._1, t._2)) == Seq(0L -> 3L, 1L -> 3L))
    // per-cluster mean dist²: centroid at y = 0 exactly (sum of
    // {0, 1e6, −1e6} micro lanes), members at y ∈ {0, ±1} → d2 ∈
    // {0, 1, 1} → sum_intra = 2e6, mean = 666666
    assert(r.forall(_._3 == 666666L))
    // nearest (only) other centroid: gap 200 on x → d2 = 40000
    assert(r.map(_._4) == Seq(Some(1L), Some(0L)))
    assert(r.forall(_._5.contains(40000000000L)))
    assert(r.forall(_._6.contains(666666L * 1000000L / 40000000000L)))
    Caches.releaseAll()
  }

  test("clusterQuality rows cover exactly the populated clusters of " +
    "the shared model") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = KMeans.clusterQuality(emb)
      .as[(Long, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().toSeq
    val pops = KMeans.fit(emb).groupBy("cluster")
      .agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(q.map(_._1).toSet == pops.keySet)
    q.foreach { case (cl, n, mean, near, gap, ratio) =>
      assert(n == pops(cl))
      assert(mean >= 0L)
      assert(near.isDefined && gap.isDefined, s"cluster $cl has a rival")
      assert(ratio.isDefined == gap.exists(_ > 0L))
    }
    Caches.releaseAll()
  }

  test("silhouette: exact coefficients on two separable blobs") {
    // same converged fixture as the clusterQuality test: centroids at
    // (±100, 0), members at y ∈ {0, ±1}. Per point a = d2 to own
    // centroid ∈ {0, 1, 1} micro-floored; b = d2 to the other centroid
    // (40000 for y=0; 40001 for y=±1). s_milli = (1000·(b−a)) div b:
    // y=0 → 1000 exactly; y=±1 → floor(1000·40000e6/40001e6) = 999.
    val rows = Seq(
      (0L, vec(100f, 0f)), (2L, vec(100f, 1f)), (4L, vec(100f, -1f)),
      (1L, vec(-100f, 0f)), (3L, vec(-100f, 1f)), (5L, vec(-100f, -1f)))
      .map { case (id, v) => (id, v, 0) }
    val emb = rows.toDF("vec_id", "embedding", "label")
    val r = KMeans.silhouette(emb, k = 2, iters = 2)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq((0L, 3L, 2998L, 999L), (1L, 3L, 2998L, 999L)))
    Caches.releaseAll()
  }

  test("silhouette covers the shared model's populated clusters; " +
    "coefficients stay in [-1000, 1000]") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val s = KMeans.silhouette(emb)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val pops = KMeans.fit(emb).groupBy("cluster")
      .agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(s.map(_._1).toSet == pops.keySet)
    s.foreach { case (cl, n, sumS, meanS) =>
      assert(n == pops(cl))
      assert(meanS >= -1000L && meanS <= 1000L)
      assert(sumS >= -1000L * n && sumS <= 1000L * n)
    }
    Caches.releaseAll()
  }

  test("clusterPurity: modal label per blob, mislabeled member costs " +
    "exactly one third") {
    // blob A (ids 0,2,4) labeled 7 except id 4 labeled 9 → purity
    // 666666 with modal 7; blob B (ids 1,3,5) uniformly 9 → 1e6.
    val rows = Seq(
      (0L, vec(100f, 0f), 7), (2L, vec(100f, 1f), 7),
      (4L, vec(100f, -1f), 9),
      (1L, vec(-100f, 0f), 9), (3L, vec(-100f, 1f), 9),
      (5L, vec(-100f, -1f), 9))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val r = KMeans.clusterPurity(emb, k = 2, iters = 2)
      .as[(Long, Long, Int, Long, Long)].collect().toSeq
    assert(r == Seq((0L, 3L, 7, 2L, 666666L), (1L, 3L, 9, 3L, 1000000L)))
    Caches.releaseAll()
  }

  test("clusterPurity: modal ties break on the smaller label") {
    // one blob, labels 1 and 2 twice each → modal must be 1
    val rows = Seq(
      (0L, vec(50f, 0f), 2), (1L, vec(50f, 1f), 1),
      (2L, vec(50f, -1f), 2), (3L, vec(50f, 2f), 1))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val r = KMeans.clusterPurity(emb, k = 1, iters = 2)
      .as[(Long, Long, Int, Long, Long)].collect().toSeq
    assert(r == Seq((0L, 4L, 1, 2L, 500000L)))
    Caches.releaseAll()
  }

  test("elbowCurve: k=2 captures both blobs exactly; k=1 row has no " +
    "drop; inertia at the separating k collapses") {
    // two blobs at x = ±100 with y-spread 1. k=1 (init vec 0 only):
    // centroid converges to the global fixed-point mean; k=2 separates
    // and leaves inertia = Σ y² = 4e6 micro (2 per blob at y ±1)
    val rows = Seq(
      (0L, vec(100f, 0f)), (2L, vec(100f, 1f)), (4L, vec(100f, -1f)),
      (1L, vec(-100f, 0f)), (3L, vec(-100f, 1f)), (5L, vec(-100f, -1f)))
      .map { case (id, v) => (id, v, 0) }
    val emb = rows.toDF("vec_id", "embedding", "label")
    val r = KMeans.elbowCurve(emb, ks = Seq(1, 2), iters = 2)
      .as[(Long, Long, Long, Option[Long])].collect().toSeq
    assert(r.map(_._1) == Seq(1L, 2L))
    assert(r.forall(_._2 == 6L))
    val Seq(i1, i2) = r.map(_._3)
    assert(i2 == 4000000L, "separated blobs leave only the y spread")
    assert(i1 > i2, "one centroid cannot separate the blobs")
    assert(r.head._4.isEmpty, "first sweep row has no predecessor")
    // exact drop ratio replay from the two inertia values
    assert(r(1)._4.contains(1000000L * (i1 - i2) / i1))
    Caches.releaseAll()
  }

  test("elbowCurve on the shared fixture: one row per k, k=8 matches " +
    "the family model's own inertia") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val r = KMeans.elbowCurve(emb)
      .as[(Long, Long, Long, Option[Long])].collect().toSeq
    assert(r.map(_._1) == Seq(2L, 4L, 8L, 16L))
    val fam = KMeans.fit(emb)
      .agg(sum(floor(col("d2") * 1000000L).cast("long")))
      .as[Long].head()
    assert(r.find(_._1 == 8L).get._3 == fam,
      "sweep k=8 must read the SAME staged artifact as the family")
    Caches.releaseAll()
  }

  test("OPQ: identity candidate equals plain PQ; chosen error is the min") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val eval = KMeans.opqEval(emb)
      .as[(String, Long, Boolean)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(eval.keySet == Set("identity", "householder", "snake_perm",
      "householder_snake"))
    val pqTotal = KMeans.pqEncode(emb)
      .agg(sum(col("recon_err_milli"))).as[Long].head()
    assert(eval("identity")._1 == pqTotal,
      "identity candidate IS plain PQ — errors must agree exactly")
    val chosenErr = eval.values.collect { case (e, true) => e }.toSeq
    assert(chosenErr.size == 1, "exactly one argmin")
    assert(chosenErr.head == eval.values.map(_._1).min)
    assert(chosenErr.head <= eval("identity")._1,
      "OPQ reconstruction error must be <= plain PQ (identity in family)")
    Caches.releaseAll()
  }

  test("OPQ encode: codes come from the argmin candidate; rotation is " +
      "an isometry (norms preserved)") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val eval = KMeans.opqEval(emb)
      .as[(String, Long, Boolean)].collect()
    val chosen = eval.collect { case (c, _, true) => c }.head
    val enc = KMeans.opqEncode(emb)
    assert(enc.select("cand").distinct().as[String].collect().toSeq
      == Seq(chosen))
    assert(enc.count() == emb.count())
    // total error of the emitted codes equals the eval row's
    val encErr = enc.agg(sum(col("recon_err_milli"))).as[Long].head()
    assert(encErr == eval.collect { case (_, e, true) => e }.head)
    // Householder reflection preserves L2 norms (orthogonal transform):
    // reconstruct via a 1-row differential against the raw vectors
    val dote = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      org.apache.spark.sql.graft.DotF64Expr(a, b)
    val raw = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    val mismatches = KMeans.opqRotatedForTest(emb)
      .withColumnRenamed("v", "rv")
      .join(raw, "vec_id")
      .select((abs(dote(col("rv"), col("rv")) - dote(col("v"), col("v")))
        > 1e-9).as("bad"))
      .filter(col("bad")).count()
    assert(mismatches == 0L, "reflection must preserve every norm")
    // snake_perm is a PERMUTATION: per-vector coordinate multisets agree
    val permBad = KMeans.opqPermutedForTest(emb)
      .withColumnRenamed("v", "pv")
      .join(raw, "vec_id")
      .select((array_sort(col("pv")) =!= array_sort(col("v"))).as("bad"))
      .filter(col("bad")).count()
    assert(permBad == 0L, "snake_perm must permute, never alter, values")
    Caches.releaseAll()
  }

  test("OPQ read path: topkOpq carries the eval's argmin; opqRecall is " +
      "a valid per-query recall over the exact L2 truth") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val chosen = KMeans.opqEval(emb)
      .as[(String, Long, Boolean)].collect()
      .collect { case (c, _, true) => c }.head
    val adc = KMeans.topkOpq(emb)
      .as[(Long, Int, Long, Long, String)].collect()
    assert(adc.nonEmpty)
    assert(adc.map(_._5).distinct.toSeq == Seq(chosen),
      "ADC codes must come from the eval's argmin candidate")
    assert(adc.forall(r => r._1 != r._3), "no self-matches")
    adc.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.size).toSeq,
        "ranks are dense from 1 per query")
    }
    val rec = KMeans.opqRecall(emb)
      .as[(Long, Long, Long, Long)].collect()
    assert(rec.length == 10, "one row per query")
    rec.foreach { case (_, nTrue, nHit, pct) =>
      assert(nTrue == 3L && nHit >= 0L && nHit <= 3L)
      assert(pct == 100L * nHit / 3L)
    }
    Caches.releaseAll()
  }

  test("ivfRecall: one cell is exact; spherical recall is scale-invariant") {
    val rows = Seq(
      (0L, vec(1f, 0.2f)), (1L, vec(0.1f, 1f)), (2L, vec(0.9f, 0.3f)),
      (3L, vec(0.2f, 1.1f)), (4L, vec(1.1f, 0.1f)), (5L, vec(0.3f, 0.9f)))
    val emb = rows.map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")
    // k = 1: a single Voronoi cell holds every candidate, so the
    // "approximate" path IS the exact scan — recall must read 100
    val one = KMeans.ivfRecall(emb, k = 1, iters = 2, nQueries = 3,
        topK = 2)
      .select("query_id", "recall_pct").as[(Long, Long)].collect().toMap
    assert(one.size == 3 && one.values.forall(_ == 100L), s"got $one")
    // spherical quantization sees DIRECTION only: scaling any vector
    // by a positive constant must change neither the cells nor the
    // cosine truth, hence not one output row
    val scaled = rows.map { case (id, v) =>
      (id, v.map(_ * (if (id % 2 == 0) 7f else 1f)), 0)
    }.toDF("vec_id", "embedding", "label")
    def sph(e: org.apache.spark.sql.DataFrame) =
      KMeans.ivfRecall(e, k = 2, iters = 2, nQueries = 3, topK = 2,
          normalize = true)
        .as[(Long, Long, Long, Long)].collect().toSeq
    assert(sph(emb) == sph(scaled))
    Caches.releaseAll()
  }

  test("normalize dial ≡ pre-applied l2Normalize on every IVF serving " +
      "entry point (the r19 deploy contract)") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val pre = KMeans.l2Normalize(emb)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.collect().toSeq.map(_.toSeq)
    assert(rows(KMeans.annIvf(emb, nQueries = 6, normalize = true)
        .orderBy("query_id", "rank"))
      == rows(KMeans.annIvf(pre, nQueries = 6).orderBy("query_id", "rank")))
    assert(rows(KMeans.annIvfNprobe(emb, nQueries = 6, nprobe = 2,
        normalize = true).orderBy("query_id", "rank"))
      == rows(KMeans.annIvfNprobe(pre, nQueries = 6, nprobe = 2)
        .orderBy("query_id", "rank")))
    assert(rows(KMeans.annIvfAdc(emb, nQueries = 4, normalize = true)
        .orderBy("query_id", "rank"))
      == rows(KMeans.annIvfAdc(pre, nQueries = 4)
        .orderBy("query_id", "rank")))
    assert(rows(KMeans.annIvfAdcNprobe(emb, nQueries = 4, nprobe = 2,
        normalize = true).orderBy("query_id", "rank"))
      == rows(KMeans.annIvfAdcNprobe(pre, nQueries = 4, nprobe = 2)
        .orderBy("query_id", "rank")))
    Caches.releaseAll()
  }

  test("l2Normalize: unit norms out, zero-norm vectors filtered " +
      "(never NaN-poisoned)") {
    val emb = Seq(
      (0L, vec(3f, 4f), 0), (1L, vec(), 0), (2L, vec(0f, 0f, 5f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = KMeans.l2Normalize(emb)
      .select(col("vec_id"),
        org.apache.spark.sql.graft.DotF64Expr(
          col("embedding"), col("embedding")).as("n2"))
      .as[(Long, Double)].collect().toMap
    assert(out.keySet == Set(0L, 2L), "zero vector (vec 1) filtered")
    out.values.foreach(n2 => assert(math.abs(n2 - 1d) < 1e-12))
  }

  test("ivfRecallCurve: monotone non-decreasing in nprobe; " +
      "nprobe = k is exact (recall 100)") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cur = KMeans.ivfRecallCurve(emb, k = 4, iters = 2, nQueries = 5,
        topK = 3, nprobes = Seq(1, 2, 4))
      .select("nprobe", "n_hit", "recall_pct")
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(cur.map(_._1) == Seq(1L, 2L, 4L))
    // widening the probe budget can only add candidates
    assert(cur.sliding(2).forall { case Seq(a, b) => b._2 >= a._2 })
    // probing every cell of k=4 IS the exact scan
    assert(cur.last._3 == 100L, s"nprobe=k must be exact, got $cur")
    Caches.releaseAll()
  }

  test("semDedupCellLossSweep: hand-exact per-tau rows; single-tau " +
      "instrument agrees (VERDICT r18 #5)") {
    // two ±x blobs, k=2 (init one seed per blob) → every truth pair
    // is within-blob and within-cell, loss 0 on both lanes. Scalar
    // cosines: (0,2) 999950, (0,4) 980580, (2,4) 982495 micro (and
    // the mirrored blob identically) — so tau 0.98 reads 3 truth
    // pairs per blob and tau 0.999 reads 1, all captured.
    val rows = Seq(
      (0L, vec(100f, 0f)), (2L, vec(100f, 1f)), (4L, vec(100f, 20f)),
      (1L, vec(-100f, 0f)), (3L, vec(-100f, 1f)), (5L, vec(-100f, 20f)))
      .map { case (id, v) => (id, v, 0) }
    val e = rows.toDF("vec_id", "embedding", "label")
    val sweep = KMeans.semDedupCellLossSweep(e, k = 2,
        tausMicro = Seq(980000L, 999000L), sampleMod = 1)
      .select("lane", "tau_micro", "n_truth", "n_captured", "loss_ppm")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(sweep == Set(
      ("l2", 980000L, 6L, 6L, 0L), ("l2", 999000L, 2L, 2L, 0L),
      ("spherical", 980000L, 6L, 6L, 0L),
      ("spherical", 999000L, 2L, 2L, 0L)), s"got $sweep")
    // the single-tau instrument is the sweep at one grid point
    val one = KMeans.semDedupCellLoss(e, k = 2, minSimMicro = 999000L,
        sampleMod = 1)
      .select("lane", "n_truth", "n_captured", "loss_ppm")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(one == Set(("l2", 2L, 2L, 0L), ("spherical", 2L, 2L, 0L)),
      s"got $one")
    Caches.releaseAll()
  }
}
