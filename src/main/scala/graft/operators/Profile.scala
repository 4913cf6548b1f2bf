package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table profiling — the first thing a pipeline runs against a new
  * 100 TB drop: per-column row/null/distinct counts and value ranges,
  * in ONE aggregation over one scan (no per-column re-scan loop, no
  * driver-side iteration — the long-format output is produced by
  * exploding the single 1-row aggregate).
  *
  * Two cardinality modes:
  *  - exact (`approx = false`): `count(DISTINCT c)` per column. Catalyst
  *    rewrites the multi-distinct aggregate through one Expand (data
  *    replicated once per distinct column) — exact, but the scan is
  *    multiplied by |columns|+1. This is the mode the oracle gate runs.
  *  - approx (`approx = true`): HLL `approx_count_distinct` — a true
  *    single-pass plan (no Expand, partial aggregation on every column
  *    at once). At 100 TB this is the only sane default; the spec pins
  *    the no-Expand plan shape.
  *
  * Values are surfaced as strings with deterministic cross-engine
  * formatting: integers/strings cast directly, timestamps as epoch-µs
  * integers, floating point through DECIMAL(28,9) so neither engine's
  * shortest-round-trip float printer gets a vote. */
object Profile {

  private def strOf(c: Column, dt: DataType): Column = dt match {
    case DoubleType | FloatType => c.cast(DecimalType(28, 9)).cast("string")
    case TimestampType => unix_micros(c).cast("string")
    case _ => c.cast("string")
  }

  def dataProfile(df: DataFrame, approx: Boolean = false): DataFrame = {
    val fields = df.schema.fields.toSeq
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      Seq(
        count(c).as(s"__n_${f.name}"),
        (if (approx) approx_count_distinct(c) else countDistinct(c))
          .cast("long").as(s"__d_${f.name}"),
        strOf(min(c), f.dataType).as(s"__mn_${f.name}"),
        strOf(max(c), f.dataType).as(s"__mx_${f.name}"))
    }
    val allAggs = count(lit(1)).as("__rows") +: aggs
    val one = df.agg(allAggs.head, allAggs.tail: _*)
    val entries = fields.map { f =>
      struct(lit(f.name).as("column"),
        col("__rows").as("n_rows"),
        (col("__rows") - col(s"__n_${f.name}")).as("n_null"),
        col(s"__d_${f.name}").as("n_distinct"),
        col(s"__mn_${f.name}").as("min_str"),
        col(s"__mx_${f.name}").as("max_str"))
    }
    one.select(explode(array(entries: _*)).as("p")).select("p.*")
  }
}
