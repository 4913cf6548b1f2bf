package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data LAYOUT for scan pruning — the write-side half
  * of the 100 TB story. Parquet/file skipping works off per-file
  * min/max stats, and those stats are only tight for columns the data
  * is clustered on. Sorting by one column makes ITS ranges tight and
  * every other column's ranges useless; interleaving the bits of two
  * key columns (a Z-order / Morton curve) makes BOTH dimensions'
  * min/max ranges narrow in every file, so a filter on EITHER dimension
  * (or a box on both) skips most files.
  *
  * All pure per-row integer bit math — shift/mask/add terms that stay
  * inside whole-stage codegen, no shuffle until the explicit
  * range-repartition that uses the key. The same recipe extends to
  * more dimensions (interleave k ways) and to doubles (index the
  * exponent+mantissa bits). */
object Layout {

  /** Morton/Z-value of two non-negative dimensions, `bits` bits each:
    * bit i of `a` lands at output bit 2i, bit i of `b` at 2i+1. Inputs
    * are masked to `bits` (callers bucket/modulo first). The terms set
    * DISJOINT output bits, so + is exactly bitwise-OR — and + is the
    * form every engine reproduces bit-identically. */
  def zValue(a: Column, b: Column, bits: Int = 10): Column = {
    require(bits >= 1 && bits <= 31, "bits must fit both lanes in a long")
    // widen to long FIRST: shiftleft preserves the input's type, so an
    // int-typed column with bits > 15 would place bits at position >= 31
    // and wrap inside the 32-bit lane instead of filling the long
    val (al, bl) = (a.cast("long"), b.cast("long"))
    val terms = (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i),
          shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ + _)
  }

  /** Hive-partitioned parquet sink with a compaction guarantee + the
    * manifest that PROVES it: repartition by the partition columns
    * first, so every partition-directory's rows land in exactly ONE
    * task and each directory gets exactly ONE file — the small-files
    * discipline a 100 TB table needs (partitionBy without the
    * repartition writes up to `shuffle.partitions` files per directory;
    * a 1000-executor job would shred the table into millions of tiny
    * files). Returns the read-back manifest (partition values, row
    * count, file count via `_metadata.file_path`), so a gate on the
    * manifest checks BOTH round-trip row fidelity and the one-file
    * layout — the write path is verified end-to-end, not assumed. */
  def partitionedWrite(df: DataFrame, outDir: String,
                       partitionCols: Seq[String]): DataFrame = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    val spark = df.sparkSession
    df.repartition(partitionCols.map(col): _*)
      .write.mode("overwrite").partitionBy(partitionCols: _*)
      .parquet(outDir)
    spark.read.parquet(outDir)
      .groupBy(partitionCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("_metadata.file_path")).as("n_files"))
  }

  /** The write-side layout pass: range-partition on the z-value into
    * `numFiles` output tasks and sort within each — after this, every
    * written file covers one tight z-range, i.e. a small rectangle of
    * the (a, b) space, and both dimensions' file stats prune. This is
    * the operator a compaction/OPTIMIZE job runs; downstream readers
    * need nothing special. */
  /** Range-partitioner audit — the EXACT version of what Spark's
    * RangePartitioner estimates by reservoir sampling: the k−1 value
    * cut points that would split rows into k range partitions, and the
    * size histogram those cuts actually produce. This is the planning
    * read before a `repartitionByRange`/sort at 100 TB: heavy value
    * ties make range partitions lopsided no matter where the cuts land
    * (all ties go to one side of a strict cut), and this audit SHOWS
    * that skew exactly instead of sampling around it.
    *
    * Cuts are the exact p=⌊100·i/k⌋ lower quantiles via the shared
    * [[graft.operators.Prefix.rankSelect]] over the distinct-value
    * count table; bucket id = number of cuts strictly below the value
    * (one broadcast row of cuts, a codegen'd sum of comparisons — no
    * per-row join). Output is k rows: bucket, rows, min/max value. */
  def rangePartitionAudit(events: DataFrame, k: Int = 8): DataFrame = {
    require(k >= 2 && k <= 32, s"rangePartitionAudit: need 2 <= k <= 32, got $k")
    val vals = graft.Caches.track(events
      .filter(col("value").isNotNull)
      .select(expr("CAST(floor(value * 1000) AS BIGINT)").as("v")))
    val counts = vals.groupBy(col("v")).agg(count(lit(1)).as("n"))
    // ONE cumulative pass yields every cut (duplicate pcts collapse to
    // one column, re-aliased per cut index)
    val cutPcts = (1 until k).map(i => math.max(1, math.min(99, 100 * i / k)))
    val multi = Prefix.rankSelectMulti(counts, col("v"), col("n"),
      x => length(bin(x)).cast("long"), cutPcts.distinct)
    val cutsRow = broadcast(multi.select(
      cutPcts.zipWithIndex.map { case (p, i0) =>
        col(s"q$p").as(s"c${i0 + 1}")
      }: _*))
    val bucket = (1 until k).map(i => when(col("v") > col(s"c$i"), 1L)
      .otherwise(0L)).reduce(_ + _)
    vals.crossJoin(cutsRow)
      .select(bucket.as("bucket"), col("v"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"), min(col("v")).as("min_v"),
        max(col("v")).as("max_v"))
      .orderBy(col("bucket"))
  }

  def zorderRepartition(df: DataFrame, a: Column, b: Column,
                        numFiles: Int, bits: Int = 10): DataFrame = {
    val z = zValue(a, b, bits).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Hilbert-curve index of two non-negative dimensions, `bits` bits
    * each — the locality-tighter sibling of [[zValue]]: consecutive
    * Hilbert indexes are ALWAYS adjacent cells (unit Manhattan step),
    * where the Z-curve takes long diagonal jumps at quadrant
    * boundaries, so per-file bounding boxes come out measurably
    * tighter on range-heavy workloads (the reason Delta/Iceberg offer
    * both orders).
    *
    * The classic top-down quadrant walk (Wikipedia xy2d recurrence):
    * per level s = 2^i, quadrant digit (3·rx) XOR ry weights s², then
    * the frame rotates — (x, y) reflect-and-swap when ry = 0, with the
    * reflection as the FULL-WIDTH complement m − v (= v XOR m): bits
    * at or above s are never read again, so the full-width form is
    * exactly the s-scoped one on every bit that matters, and it keeps
    * the lanes pure integer subtract (identical in any engine).
    *
    * The walk is stateful, so it is expressed as `bits` CHAINED
    * projections over three state columns — per-row integer math,
    * no shuffle, linear plan size (CollapseProject will not duplicate
    * the multiply-referenced non-cheap state expressions). Inputs are
    * reduced mod 2^bits (callers bucket first, as with [[zValue]]). */
  def hilbertIndexed(df: DataFrame, a: Column, b: Column,
                     bits: Int = 10, out: String = "h"): DataFrame = {
    require(bits >= 1 && bits <= 31, "bits must fit both lanes in a long")
    val m = (1L << bits) - 1
    var cur = df
      .withColumn("__hx", pmod(a.cast("long"), lit(1L << bits)))
      .withColumn("__hy", pmod(b.cast("long"), lit(1L << bits)))
      .withColumn("__hd", lit(0L))
    for (i <- (bits - 1) to 0 by -1) {
      val s = 1L << i
      cur = cur
        .withColumn("__rx",
          when(col("__hx").bitwiseAND(lit(s)) > 0, lit(1L))
            .otherwise(lit(0L)))
        .withColumn("__ry",
          when(col("__hy").bitwiseAND(lit(s)) > 0, lit(1L))
            .otherwise(lit(0L)))
        .withColumn("__hd", col("__hd") + lit(s * s) *
          (lit(3L) * col("__rx")).bitwiseXOR(col("__ry")))
        .withColumn("__nx", when(col("__ry") === 0,
            when(col("__rx") === 1, lit(m) - col("__hy"))
              .otherwise(col("__hy")))
          .otherwise(col("__hx")))
        .withColumn("__ny", when(col("__ry") === 0,
            when(col("__rx") === 1, lit(m) - col("__hx"))
              .otherwise(col("__hx")))
          .otherwise(col("__hy")))
        .withColumn("__hx", col("__nx"))
        .withColumn("__hy", col("__ny"))
        .drop("__nx", "__ny", "__rx", "__ry")
    }
    cur.withColumn(out, col("__hd")).drop("__hx", "__hy", "__hd")
  }

  /** The Hilbert write-side layout pass — [[zorderRepartition]] with
    * the tighter curve. */
  def hilbertRepartition(df: DataFrame, a: Column, b: Column,
                         numFiles: Int, bits: Int = 10): DataFrame =
    hilbertIndexed(df, a, b, bits, "__h")
      .repartitionByRange(numFiles, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")
}
