package graft

import graft.operators.Density

/** §2.4 density clustering (Density.scala): exact roles/labels on
  * hand-built geometries, and the DBSCAN structural invariants on a
  * deterministic pseudo-random corpus. */
class DensitySpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 64

  private def vec(head: Float*): Seq[Float] =
    head ++ Seq.fill(dim - head.size)(0f)

  /** k·pattern scaled copies are colinear: pairwise cosine exactly 1,
    * identical LSH bucket (signs survive positive scaling). */
  private def colinear(ids: Seq[Long], pattern: Seq[Float]) =
    ids.zipWithIndex.map { case (id, i) =>
      (id, pattern.map(_ * (i + 1)), 0)
    }

  private def emb(rows: Seq[(Long, Seq[Float], Int)]) =
    rows.toDF("vec_id", "embedding", "label")

  // two exactly-orthogonal 32-hot patterns + a far-from-both probe
  private val pa = Seq.tabulate(dim)(d => if (d < 32) 1f else 0f)
  private val pb = Seq.tabulate(dim)(d => if (d >= 32) 1f else 0f)
  // cos(pc, pa) = cos(pc, pb) = 1/(√2·√32) ≈ 0.125 < 0.25
  private val pc = Seq.tabulate(dim)(d =>
    if (d == 0 || d == 32) 1f else 0f)

  test("colinear family is all-core one cluster; sub-minPts family and " +
    "isolated probe are noise") {
    val e = emb(colinear(Seq(0L, 1L, 2L, 3L, 4L), pa) ++
      colinear(Seq(10L, 11L, 12L), pb) ++ Seq((20L, pc, 0)))
    val r = Density.dbscan(e).orderBy("vec_id")
      .as[(Long, Long, String, Option[Long])].collect().toSeq
    val expect = Seq(
      (0L, 4L, "core", Some(0L)), (1L, 4L, "core", Some(0L)),
      (2L, 4L, "core", Some(0L)), (3L, 4L, "core", Some(0L)),
      (4L, 4L, "core", Some(0L)),
      // 2 neighbors < minPts=3 and no core neighbor → noise, not border
      (10L, 2L, "noise", None), (11L, 2L, "noise", None),
      (12L, 2L, "noise", None),
      (20L, 0L, "noise", None))
    assert(r == expect)
    Caches.releaseAll()
  }

  test("minPts=2 promotes the small family: two density components " +
    "with min-id labels") {
    val e = emb(colinear(Seq(0L, 1L, 2L), pa) ++
      colinear(Seq(10L, 11L, 12L), pb))
    val r = Density.dbscan(e, minPts = 2).orderBy("vec_id")
      .as[(Long, Long, String, Option[Long])].collect().toSeq
    assert(r.forall(_._3 == "core"))
    assert(r.filter(_._1 < 10).forall(_._4.contains(0L)))
    assert(r.filter(_._1 >= 10).forall(_._4.contains(10L)))
    Caches.releaseAll()
  }

  test("dbscanStats aggregates the per-point labels exactly " +
    "(noise keyed -1)") {
    val e = emb(colinear(Seq(0L, 1L, 2L, 3L, 4L), pa) ++
      colinear(Seq(10L, 11L, 12L), pb) ++ Seq((20L, pc, 0)))
    val r = Density.dbscanStats(e).orderBy("cluster_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq((-1L, 4L, 0L, 0L), (0L, 5L, 5L, 0L)))
    Caches.releaseAll()
  }

  test("adjustedRand: identical partitions 1e6, the classic crossing " +
    "case -0.5, degenerate NULL") {
    def lbl(name: String, rows: (Long, Long)*) =
      rows.toDF("vec_id", name)
    val a = lbl("la", 1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L)
    // identical partition (different label ids — ARI is label-invariant)
    val same = lbl("lb", 1L -> 7L, 2L -> 7L, 3L -> 9L, 4L -> 9L)
    assert(Density.adjustedRand(a, same)
      .as[(Long, Option[Long])].head() == ((4L, Some(1000000L))))
    // {1,2}{3,4} vs {1,3}{2,4}: every nij = 1 → ARI = −1/2 exactly
    val cross = lbl("lb", 1L -> 0L, 3L -> 0L, 2L -> 1L, 4L -> 1L)
    assert(Density.adjustedRand(a, cross)
      .as[(Long, Option[Long])].head() == ((4L, Some(-500000L))))
    // all-singletons vs all-singletons: denominator degenerates
    val sing = lbl("la", 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L)
    val sing2 = lbl("lb", 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L)
    assert(Density.adjustedRand(sing, sing2)
      .as[(Long, Option[Long])].head() == ((4L, None)))
    Caches.releaseAll()
  }

  test("ariVsKmeans runs on the fixture and stays in [-1e6, 1e6]") {
    val e = graft.sources.Tables
      .embeddings(spark, "/root/testdata/sf0.001")
    val r = Density.ariVsKmeans(e).as[(Long, Option[Long])].head()
    assert(r._1 == 500L)
    assert(r._2.forall(p => p >= -1000000L && p <= 1000000L))
    Caches.releaseAll()
  }

  test("DBSCAN invariants hold on a deterministic mixed corpus") {
    // pseudo-random spread + planted colinear families: role is a pure
    // function of blocked degree and core adjacency
    val rand = (0 until 24).map { i =>
      (100L + i, Seq.tabulate(dim)(d =>
        (((i * 31 + d * 7) % 13) - 6).toFloat), 0)
    }
    val e = emb(colinear(Seq(0L, 1L, 2L, 3L), pa) ++
      colinear(Seq(10L, 11L, 12L, 13L), pb) ++ rand)
    val minPts = 3
    val rows = Density.dbscan(e, minPts = minPts)
      .as[(Long, Long, String, Option[Long])].collect().toSeq
    val coreIds = rows.filter(_._3 == "core").map(_._1).toSet
    rows.foreach { case (id, nn, role, cl) =>
      // core ⟺ blocked degree ≥ minPts — the definition, exactly
      assert((role == "core") == (nn >= minPts), s"vec $id")
      if (role == "core") assert(cl.exists(_ <= id), s"vec $id")
      if (role == "border") assert(cl.isDefined && nn < minPts, s"vec $id")
      if (role == "noise") assert(cl.isEmpty, s"vec $id")
    }
    // every cluster label is a core point that labels itself (min-id
    // members label their own component)
    val selfLabelled = rows
      .filter(r => r._3 == "core" && r._4.contains(r._1)).map(_._1).toSet
    val usedLabels = rows.flatMap(_._4).toSet
    assert(usedLabels.subsetOf(selfLabelled))
    assert(usedLabels.subsetOf(coreIds))
    Caches.releaseAll()
  }
}
