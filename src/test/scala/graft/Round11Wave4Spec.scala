package graft

import java.sql.Timestamp

import graft.operators.{Graph, Integrity, Sampling}

/** Gates for the round-11 fourth-wave operators: snapshot
  * reconciliation, deterministic label-propagation communities, and
  * half-sample stability bands. */
class Round11Wave4Spec extends SparkTestBase {
  import spark.implicits._

  // ---- snapshotDiff ------------------------------------------------

  test("snapshotDiff: added/removed/changed/unchanged counted exactly") {
    val a = Seq((1L, "x", 10L), (2L, "y", 20L), (3L, "z", 30L))
      .toDF("k", "s", "v")
    val b = Seq((2L, "y", 20L), (3L, "z", 31L), (4L, "w", 40L))
      .toDF("k", "s", "v")
    val r = Integrity.snapshotDiff(a, b, "k", Seq("s", "v"))
      .as[(String, Long)].collect().toSeq
    assert(r == Seq(("added", 1L), ("changed", 1L), ("removed", 1L),
      ("unchanged", 1L)))
  }

  test("snapshotDiff: identical snapshots are all unchanged") {
    val a = Seq((1L, "x", 10L), (2L, "y", 20L)).toDF("k", "s", "v")
    val r = Integrity.snapshotDiff(a, a, "k", Seq("s", "v"))
      .as[(String, Long)].collect().toSeq
    assert(r == Seq(("unchanged", 2L)))
  }

  // ---- labelCommunities --------------------------------------------

  private val hour = 3600000L // ms

  private def ev(user: Long, tpe: String, h: Long) =
    (user, tpe, new Timestamp(h * hour))

  test("labelCommunities: two cliques converge to their min label; " +
      "isolated node keeps its own") {
    val events = Seq(
      // clique {1,2,3}: share two ("a", hour) cells -> edges w=2
      ev(1, "a", 0), ev(2, "a", 0), ev(3, "a", 0),
      ev(1, "a", 1), ev(2, "a", 1), ev(3, "a", 1),
      // clique {10,11,12}
      ev(10, "b", 2), ev(11, "b", 2), ev(12, "b", 2),
      ev(10, "b", 3), ev(11, "b", 3), ev(12, "b", 3),
      // isolated user
      ev(20, "c", 4)
    ).toDF("user_id", "event_type", "ts")
    val r = Graph.labelCommunities(events, rounds = 3)
      .as[(Long, Long)].collect().toSeq
    assert(r == Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L),
      (12L, 10L), (20L, 20L)))
  }

  test("labelCommunities: hot cells above the cap contribute no edges") {
    val events = Seq(
      ev(1, "a", 0), ev(2, "a", 0), ev(3, "a", 0),
      ev(1, "a", 1), ev(2, "a", 1), ev(3, "a", 1)
    ).toDF("user_id", "event_type", "ts")
    // every cell has 3 users > cap of 2: the graph is empty, every
    // user keeps its own label
    val r = Graph.labelCommunities(events, rounds = 3, maxCellUsers = 2)
      .as[(Long, Long)].collect().toSeq
    assert(r == Seq((1L, 1L), (2L, 2L), (3L, 3L)))
  }

  test("labelCommunities: one shared cell is below minShared — no edge") {
    val events = Seq(
      ev(1, "a", 0), ev(2, "a", 0) // single shared cell, minShared = 2
    ).toDF("user_id", "event_type", "ts")
    val r = Graph.labelCommunities(events, rounds = 2)
      .as[(Long, Long)].collect().toSeq
    assert(r == Seq((1L, 1L), (2L, 2L)))
  }

  // ---- communityModularity -----------------------------------------

  test("communityModularity: two clean cliques score Q = 1/2 exactly") {
    val events = Seq(
      ev(1, "a", 0), ev(2, "a", 0), ev(3, "a", 0),
      ev(1, "a", 1), ev(2, "a", 1), ev(3, "a", 1),
      ev(10, "b", 2), ev(11, "b", 2), ev(12, "b", 2),
      ev(10, "b", 3), ev(11, "b", 3), ev(12, "b", 3),
      ev(20, "c", 4)
    ).toDF("user_id", "event_type", "ts")
    val r = Graph.communityModularity(events)
      .as[(Long, Long, Long, Long, Option[Long])].collect().head
    // m=6 (two triangles), all edges inside; degrees all 2, two
    // communities of degree-sum 6 plus the isolated singleton:
    // Q = (4·6·6 − 72)/(4·36) = 72/144 = 1/2
    assert(r == ((6L, 3L, 72L, 144L, Some(500000L))))
  }

  test("communityModularity: edgeless graph emits NULL ppm") {
    val events = Seq(ev(1, "a", 0)).toDF("user_id", "event_type", "ts")
    val r = Graph.communityModularity(events)
      .as[(Long, Long, Long, Long, Option[Long])].collect().head
    assert(r == ((0L, 1L, 0L, 0L, None)))
  }

  // ---- halfSampleCi ------------------------------------------------

  test("halfSampleCi: constant values give zero spread, exact mean") {
    val events = (1L to 100L).map(i => (i, 5.0))
      .toDF("event_id", "value")
    val r = Sampling.halfSampleCi(events)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    val (nRep, mn, mx, spread, meanAll, nRows) = r
    assert(nRep == 32L && mn == 5000L && mx == 5000L && spread == 0L
      && meanAll == 5000L && nRows == 100L)
  }

  test("halfSampleCi: band brackets the overall mean and is stable") {
    val events = (1L to 200L).map(i => (i, if (i % 2 == 0) 0.0 else 10.0))
      .toDF("event_id", "value")
    val r1 = Sampling.halfSampleCi(events)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    val r2 = Sampling.halfSampleCi(events)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(r1 == r2, "hash-bit replicas must be rerun-stable")
    val (_, mn, mx, spread, meanAll, _) = r1
    assert(mn <= meanAll && meanAll <= mx)
    assert(spread == mx - mn && spread > 0)
  }
}
