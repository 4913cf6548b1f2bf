package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Z-order layout: bit-interleave correctness (differential vs a plain
  * Scala reference) and the actual PRUNING claim — a filter on the
  * non-major dimension touches few z-range buckets but every
  * one-dimension-sorted bucket. */
class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  private def zRef(a: Long, b: Long, bits: Int): Long =
    (0 until bits).map(i =>
      (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))).sum

  test("zValue interleaves bits (known value + exhaustive 4-bit differential)") {
    assert(zRef(5L, 3L, 4) == 27L) // a bits at even slots, b at odd
    val pairs = for (a <- 0L to 15L; b <- 0L to 15L) yield (a, b)
    val got = pairs.toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b"), 4).as("z"))
      .as[Long].collect().toSeq
    assert(got == pairs.map { case (a, b) => zRef(a, b, 4) })
  }

  test("z-order layout prunes on the non-major dimension; 1-d sort cannot") {
    // 64x64 grid split into 16 range buckets ("files"); query filters
    // y only. x-major layout puts every y in every bucket — zero
    // skipping. The z curve keeps y-locality too, so the y-slab lives
    // in a handful of buckets.
    val grid = (for (x <- 0 until 64; y <- 0 until 64)
      yield (x.toLong, y.toLong)).toDF("x", "y")
    def bucketsTouched(key: Column): Long =
      grid.withColumn("bucket", ntile(16).over(Window.orderBy(key)))
        .filter(col("y") >= 8 && col("y") < 16)
        .select("bucket").distinct().count()
    val zTouched = bucketsTouched(Layout.zValue(col("x"), col("y"), 6))
    val xMajorTouched = bucketsTouched(col("x") * 64 + col("y"))
    assert(xMajorTouched == 16L, "1-d layout must touch every bucket")
    assert(zTouched <= 8L,
      s"z layout should confine the y-slab to few buckets, got $zTouched")
  }

  test("zorderRepartition: range partition + intra-partition sort on z") {
    val grid = (for (x <- 0 until 16; y <- 0 until 16)
      yield (x.toLong, y.toLong)).toDF("x", "y")
    val out = Layout.zorderRepartition(grid, col("x"), col("y"), 4, 4)
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("rangepartitioning"),
      s"layout pass must range-partition on the z key:\n$p")
    assert(out.count() == 256, "layout pass must not change the data")
    // every partition's z values must be sorted and partitions must
    // cover disjoint, increasing z ranges
    val zs = out.select(Layout.zValue(col("x"), col("y"), 4).as("z"))
      .rdd.mapPartitionsWithIndex { case (i, it) =>
        Iterator((i, it.map(_.getLong(0)).toSeq)) }.collect().toSeq
      .sortBy(_._1).map(_._2).filter(_.nonEmpty)
    zs.foreach(p => assert(p == p.sorted, "z must be sorted within files"))
    zs.sliding(2).foreach {
      case Seq(lo, hi) => assert(lo.last <= hi.head,
        "file z ranges must be disjoint and increasing")
      case _ =>
    }
  }

  test("partitionedWrite: one file per directory, exact manifest, pruned reads") {
    val out = java.nio.file.Files.createTempDirectory("graft_pw").toString
    val df = Seq((1L, "en", "a"), (2L, "en", "a"), (3L, "de", "b"),
      (4L, "en", "b"), (5L, "de", "a")).toDF("id", "lang", "src")
    val m = Layout.partitionedWrite(df, out, Seq("lang", "src"))
      .as[(String, String, Long, Long)].collect().toSet
    assert(m == Set(("en", "a", 2L, 1L), ("en", "b", 1L, 1L),
      ("de", "a", 1L, 1L), ("de", "b", 1L, 1L)),
      s"manifest must show every partition compacted to ONE file: $m")
    val rb = spark.read.parquet(out).select("id").as[Long].collect().toSet
    assert(rb == Set(1L, 2L, 3L, 4L, 5L), "round-trip must lose nothing")
    // the layout's point: a partition-column filter prunes at the source
    val p = spark.read.parquet(out).filter(col("lang") === "en")
      .queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [") && p.contains("= en"),
      s"lang filter must prune partition directories, not scan-and-filter:\n$p")
  }

  test("rangePartitionAudit: balanced values split evenly at exact cuts") {
    val ev = (1L to 8L).map(i => (i, (i % 4 + 1).toDouble))
      .toDF("event_id", "value") // values 1..4 milli 1000..4000, 2 each
    val r = Layout.rangePartitionAudit(ev, k = 4)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq((0L, 2L, 1000L, 1000L), (1L, 2L, 2000L, 2000L),
      (2L, 2L, 3000L, 3000L), (3L, 2L, 4000L, 4000L)))
  }

  test("hilbertIndexed: bijective and unit-step over the full 4x4 grid") {
    // the two defining Hilbert properties, checked exhaustively at
    // bits=2: indexes are a permutation of 0..15, and consecutive
    // indexes are ADJACENT cells (|Δx|+|Δy| = 1) — the property the
    // Z-curve violates at every quadrant seam
    val grid = (for (x <- 0L to 3L; y <- 0L to 3L) yield (x, y))
      .toDF("x", "y")
    val cells = Layout.hilbertIndexed(grid, col("x"), col("y"), bits = 2)
      .select("h", "x", "y").as[(Long, Long, Long)].collect()
      .sortBy(_._1)
    assert(cells.map(_._1).toSeq == (0L to 15L))
    val steps = cells.sliding(2).map { case Array((_, x1, y1), (_, x2, y2)) =>
      math.abs(x2 - x1) + math.abs(y2 - y1)
    }.toSeq
    assert(steps.forall(_ == 1L),
      s"every consecutive Hilbert step must be unit Manhattan: $steps")
    assert(cells.head._2 == 0L && cells.head._3 == 0L,
      "the curve starts at the origin")
  }

  test("hilbertIndexed: beats z-order on worst-seam neighbor distance") {
    // at the central seam the Z-curve jumps diagonally across the
    // grid; Hilbert never exceeds step 1 — compare max consecutive
    // Manhattan step over the full 8x8 grid
    val grid = (for (x <- 0L to 7L; y <- 0L to 7L) yield (x, y))
      .toDF("x", "y")
    def maxStep(indexed: Seq[(Long, Long, Long)]): Long =
      indexed.sortBy(_._1).sliding(2).map {
        case Seq((_, x1, y1), (_, x2, y2)) =>
          math.abs(x2 - x1) + math.abs(y2 - y1)
      }.max
    val h = maxStep(Layout.hilbertIndexed(grid, col("x"), col("y"), 3)
      .select("h", "x", "y").as[(Long, Long, Long)].collect().toSeq)
    val z = maxStep(grid.select(
        Layout.zValue(col("x"), col("y"), 3).as("z"), col("x"), col("y"))
      .as[(Long, Long, Long)].collect().toSeq)
    assert(h == 1L, s"hilbert max step must be 1, got $h")
    assert(z > 1L, s"z-order max step must exceed 1, got $z")
  }

  test("rangePartitionAudit: heavy ties make range partitions lopsided") {
    // nine 1.0s and one 2.0 with k=2: the median cut IS 1.0, every tie
    // lands left of the strict cut — the audit must SHOW the 9/1 skew
    val ev = ((1L to 9L).map(i => (i, 1.0)) :+ (10L, 2.0))
      .toDF("event_id", "value")
    val r = Layout.rangePartitionAudit(ev, k = 2)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq((0L, 9L, 1000L, 1000L), (1L, 1L, 2000L, 2000L)))
  }
}
