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

  /** The write-side layout pass: range-partition on the z-value into
    * `numFiles` output tasks and sort within each — after this, every
    * written file covers one tight z-range, i.e. a small rectangle of
    * the (a, b) space, and both dimensions' file stats prune. This is
    * the operator a compaction/OPTIMIZE job runs; downstream readers
    * need nothing special. */
  def zorderRepartition(df: DataFrame, a: Column, b: Column,
                        numFiles: Int, bits: Int = 10): DataFrame = {
    val z = zValue(a, b, bits).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
