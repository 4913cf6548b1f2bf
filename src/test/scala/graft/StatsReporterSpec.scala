package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.scalatest.funsuite.AnyFunSuite

/** The reference's StatInterval surface: one stats line per interval
  * carrying the interval's counter DELTAS (not running totals), plus
  * the running delivered total. Ticks are driven directly so the spec
  * is deterministic — the scheduled cadence is plain
  * scheduleAtFixedRate and needs no timing assertions. */
class StatsReporterSpec extends AnyFunSuite {

  test("each tick reports the interval's deltas and the running total") {
    val name = "stats-spec"
    InMemoryKinesis.create(name, numShards = 2, capacity = 100)
    try {
      val lines = ArrayBuffer.empty[String]
      val rep = new ProducerStatsReporter(name, 60.0, lines += _)

      (1 to 5).foreach(i => InMemoryKinesis.tryPut(name, i, s"k$i", "d", block = false))
      rep.tick()
      // 2 failed attempts count as attempts, not deliveries
      InMemoryKinesis.get(name).failNextPuts.set(2)
      (1 to 3).foreach(i => InMemoryKinesis.tryPut(name, i, s"k$i", "d", block = false))
      rep.tick()
      rep.tick() // quiet interval -> all-zero deltas

      assert(lines.size == 3, s"one line per tick: $lines")
      assert(lines(0).contains("putAttempts=5") && lines(0).contains("delivered=5")
        && lines(0).contains("totalDelivered=5"), lines(0))
      assert(lines(1).contains("putAttempts=3") && lines(1).contains("delivered=1")
        && lines(1).contains("totalDelivered=6"), lines(1))
      assert(lines(2).contains("putAttempts=0") && lines(2).contains("delivered=0")
        && lines(2).contains("totalDelivered=6"), lines(2))
      rep.close()
    } finally InMemoryKinesis.delete(name)
  }

  test("a tick after stream deletion is a silent no-op") {
    val name = "stats-gone"
    InMemoryKinesis.create(name, numShards = 1, capacity = 10)
    val lines = ArrayBuffer.empty[String]
    val rep = new ProducerStatsReporter(name, 60.0, lines += _)
    rep.tick()
    InMemoryKinesis.delete(name)
    rep.tick() // must not throw
    assert(lines.size == 1)
    rep.close()
  }
}
