package graft

import org.apache.spark.sql.functions._

import graft.operators.{Graph, Integrity}

/** Gates for grouping sets, the anti-entropy checksum, and the
  * bipartite engagement audits. */
class IntegritySpec extends SparkTestBase {
  import spark.implicits._

  private val day = 86400000000L // µs

  private def events(rows: (Long, Long, Long, String)*) =
    rows.toDF("event_id", "ts_us", "user_id", "event_type")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
      .withColumn("props", lit("{}"))

  // ---- groupingSetsCounts ------------------------------------------

  test("groupingSetsCounts: exactly the three declared sets, no grand total") {
    val ev = events(
      (1L, 0L, 1L, "a"), (2L, 0L, 2L, "a"), (3L, 3L * day, 1L, "b"))
    val r = graft.operators.Events.groupingSetsCounts(ev)
      .select(col("event_type"), col("dow"), col("n"), col("n_users"))
      .as[(Option[String], Option[Long], Long, Long)].collect().toSet
    assert(r == Set(
      (Some("a"), Some(4L), 2L, 2L), // type × dow (epoch day 0 = Thu = 4)
      (Some("b"), Some(0L), 1L, 1L),
      (Some("a"), None, 2L, 2L),     // per-type margin
      (Some("b"), None, 1L, 1L),
      (None, Some(4L), 2L, 2L),      // per-dow margin
      (None, Some(0L), 1L, 1L)))     // NO (None, None) grand total
  }

  // ---- checksumShards ----------------------------------------------

  test("checksumShards: row-order and partitioning independent") {
    val ev = events((0 until 64).map(i =>
      (i.toLong, i * 1000L, i.toLong % 7, s"t${i % 3}")): _*)
    val a = Integrity.checksumShards(ev, nShards = 4)
      .as[(Long, Long, Long)].collect().toSeq
    val b = Integrity.checksumShards(ev.orderBy(rand(42)).repartition(7), 4)
      .as[(Long, Long, Long)].collect().toSeq
    assert(a == b, "checksum must not depend on order or partitioning")
    assert(a.map(_._2).sum == 64L)
  }

  test("checksumShards: any single-field change flips its shard only") {
    val ev = events((0 until 32).map(i =>
      (i.toLong, i * 1000L, i.toLong % 4, "t")): _*)
    val mutated = ev.withColumn("event_type",
      when(col("event_id") === 5, "MUTATED").otherwise(col("event_type")))
    val a = Integrity.checksumShards(ev, 4).as[(Long, Long, Long)]
      .collect().map { case (s, n, c) => s -> ((n, c)) }.toMap
    val b = Integrity.checksumShards(mutated, 4).as[(Long, Long, Long)]
      .collect().map { case (s, n, c) => s -> ((n, c)) }.toMap
    // event 5 → user 1 → shard 1: only that shard's checksum differs
    assert(a(1) != b(1))
    assert(Seq(0L, 2L, 3L).forall(s => a(s) == b(s)))
  }

  // ---- snapshotDiff serialization injectivity ----------------------

  test("snapshotDiff: delimiter-in-field and NULL shifts never read as unchanged") {
    // the r11 ADVICE collision classes: ('a|b', NULL) vs ('a', 'b')
    // concat_ws-collided to 'a|b' on both sides; NULL vs '' likewise.
    // With escaped fields + the \N sentinel each pair must classify
    // as changed.
    val a = Seq((1L, "a|b", null.asInstanceOf[String]),
        (2L, null.asInstanceOf[String], "x"),
        (3L, "p", "q"))
      .toDF("k", "c1", "c2")
    val b = Seq((1L, "a", "b"), (2L, "", "x"), (3L, "p", "q"))
      .toDF("k", "c1", "c2")
    val r = Integrity.snapshotDiff(a, b, "k", Seq("c1", "c2"))
      .as[(String, Long)].collect().toMap
    assert(r == Map("changed" -> 2L, "unchanged" -> 1L))
  }

  test("snapshotDiff: a field containing the literal NULL sentinel is not NULL") {
    val a = Seq((1L, "\\N")).toDF("k", "c1")
    val b = Seq((1L, null.asInstanceOf[String])).toDF("k", "c1")
    val r = Integrity.snapshotDiff(a, b, "k", Seq("c1"))
      .as[(String, Long)].collect().toMap
    assert(r == Map("changed" -> 1L))
  }

  // ---- typeJaccard / degreeDistribution ----------------------------

  test("typeJaccard: user-day co-occurrence, inclusion-exclusion union") {
    val ev = events(
      (1L, 0L, 1L, "a"), (2L, 1000L, 1L, "b"),       // day 0: a,b together
      (3L, day, 1L, "a"),                             // day 1: a alone
      (4L, day, 2L, "b"))                             // day 1, other user
    val r = Graph.typeJaccard(ev)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    // a-days: {(1,0),(1,1)} = 2; b-days: {(1,0),(2,1)} = 2; shared: 1
    assert(r == Seq(("a", "b", 1L, 2L, 2L, 333333L)))
    Caches.releaseAll()
  }

  test("degreeDistribution: per user-day distinct types") {
    val ev = events(
      (1L, 0L, 1L, "a"), (2L, 1000L, 1L, "b"), (3L, 2000L, 1L, "a"),
      (4L, day, 1L, "a"))
    val r = Graph.degreeDistribution(ev).as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 1L, 2L -> 1L)) // day0: degree 2; day1: degree 1
  }
}
