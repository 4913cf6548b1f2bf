package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The two-phase distributed prefix sum — the scale-safe replacement
  * for `Window.orderBy(...)` with no partition clause, which drags
  * EVERY row through one task. Rows are grouped into ordered BLOCKS by
  * a caller-chosen coarsening of the sort key; phase 1 runs a
  * partitioned per-block cumsum, phase 2 runs the trivial serial
  * window over BLOCK TOTALS (block-count-sized, never row-count-sized)
  * and broadcast-joins each block's exclusive prefix back.
  *
  * Shared by [[Sampling.packSequences]] (token budgets over doc-id
  * blocks), [[Profile.ksDrift]] (CDF steps over value blocks), and
  * [[Sampling.temporalSplit]] (rank-select over hour blocks) — one
  * implementation of the pattern, three operators composing it.
  *
  * The caller picks `block` so block COUNT stays bounded (id ranges,
  * integer floors of a bounded metric, time buckets); correctness
  * never depends on the choice — only the size of the serial stage
  * does (spec-pinned block-invariance). */
object Prefix {

  /** Adds an INCLUSIVE running sum `cum_<name>` for every (name, col)
    * in `sums`, under the global order (block asc, order asc). The
    * block column must be an order-preserving coarsening of `order`:
    * b(x) ≤ b(y) whenever x ≤ y. */
  def inclusiveCumsum(df: DataFrame, block: Column, order: Column,
                      sums: Seq[(String, Column)]): DataFrame = {
    require(sums.nonEmpty, "need at least one column to sum")
    val in = df.withColumn("__blk", block)
    val local = Window.partitionBy("__blk").orderBy(order)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val serial = Window.orderBy("__blk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val withLocal = sums.foldLeft(in) { case (d, (name, c)) =>
      d.withColumn(s"__l_$name", sum(c).over(local))
    }
    val aggCols = sums.map { case (name, c) => sum(c).as(s"__t_$name") }
    val totals = sums.foldLeft(
      in.groupBy("__blk").agg(aggCols.head, aggCols.tail: _*)) {
      case (d, (name, _)) =>
        d.withColumn(s"__p_$name",
          coalesce(sum(col(s"__t_$name")).over(serial), lit(0L)))
    }.select(col("__blk") +: sums.map { case (name, _) =>
      col(s"__p_$name")
    }: _*)
    val joined = withLocal.join(broadcast(totals), Seq("__blk"))
    val out = sums.foldLeft(joined) { case (d, (name, _)) =>
      d.withColumn(s"cum_$name", col(s"__p_$name") + col(s"__l_$name"))
    }
    out.drop("__blk")
      .drop(sums.flatMap { case (name, _) =>
        Seq(s"__l_$name", s"__p_$name")
      }: _*)
  }

  /** Distributed rank-select over a per-distinct-value count table:
    * the smallest value whose INCLUSIVE rank reaches pct% of the total
    * (the empirical lower quantile — always an existing value, never
    * an interpolation, so nothing synthetic crosses an oracle).
    * Returns ONE row (q_value, q_cum, q_total). `block` maps the value
    * column to its order-preserving block. Composed by
    * [[Sampling.temporalSplit]] (time cutoff) and
    * [[Profile.madOutliers]] (median and MAD). */
  def rankSelect(counts: DataFrame, value: Column, n: Column,
                 block: Column => Column, pct: Int): DataFrame = {
    require(pct > 0 && pct < 100, s"pct=$pct")
    val base = counts.select(value.as("__v"), n.as("__n"))
    val total = base.agg(sum("__n").as("__total"))
    inclusiveCumsum(base, block(col("__v")), col("__v"),
        Seq("n" -> col("__n")))
      .crossJoin(broadcast(total))
      .filter(col("cum_n") * 100 >= col("__total") * pct)
      .agg(min(col("__v")).as("q_value"), min(col("cum_n")).as("q_cum"),
        max(col("__total")).as("q_total"))
  }

  /** Multi-percentile [[rankSelect]]: ONE cumulative pass answers every
    * requested percentile (same lower-quantile convention), emitted as
    * a single row with one `q<pct>` column per pct. Callers that need
    * several quantiles of the same distribution (session_summary's
    * p50+p90, range_partition_audit's k−1 cuts) pay one Prefix sweep
    * instead of one per percentile. */
  def rankSelectMulti(counts: DataFrame, value: Column, n: Column,
                      block: Column => Column, pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p > 0 && p < 100),
      s"pcts=$pcts")
    require(pcts.distinct.size == pcts.size, s"duplicate pcts: $pcts")
    val base = counts.select(value.as("__v"), n.as("__n"))
    val total = base.agg(sum("__n").as("__total"))
    val cum = inclusiveCumsum(base, block(col("__v")), col("__v"),
        Seq("n" -> col("__n")))
      .crossJoin(broadcast(total))
    val aggs = pcts.map(p =>
      min(when(col("cum_n") * 100 >= col("__total") * p, col("__v")))
        .as(s"q$p"))
    cum.agg(aggs.head, aggs.tail: _*)
  }
}
