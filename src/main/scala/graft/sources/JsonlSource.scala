package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON-lines source/sink for the event stream — the interchange
  * format every log shipper (including the reference's logspout
  * lineage) actually emits. The discipline that makes JSONL safe at
  * 100 TB:
  *
  *  - ALWAYS an explicit schema on read. Schema inference is a full
  *    extra pass over the data before the real one, and a single odd
  *    line can silently widen a column for the whole corpus.
  *  - Timestamps travel as epoch-MICROSECOND integers (`ts_us`), not
  *    formatted strings — no timezone/format parser in the hot path,
  *    no precision loss, and any engine agrees on the value.
  *  - Malformed lines are either counted (PERMISSIVE +
  *    columnNameOfCorruptRecord, the audit path) or dropped
  *    (DROPMALFORMED, the throughput path) — never a job failure five
  *    hours into a corpus read.
  *
  * Both read modes are plain `spark.read.json` over the line-split
  * text — distributed scan, per-partition JSON parsing, no shuffle. */
object JsonlSource {

  /** The wire schema: events with the timestamp as epoch-µs BIGINT. */
  val wireSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts_us", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private val wireCols =
    Seq(col("event_id"), unix_micros(col("ts")).as("ts_us"),
      col("user_id"), col("event_type"), col("value"), col("props"))

  /** Write the event frame as JSONL (one object per line, one file per
    * partition — the write parallelism IS the partition count). */
  def writeJsonl(events: DataFrame, path: String): Unit =
    events.select(wireCols: _*).write.mode("overwrite").json(path)

  /** Strict audited read: explicit schema, PERMISSIVE mode, corrupt
    * lines surfaced as `corrupt` (raw line) with every data column
    * NULL — the audit query counts them before anyone trusts the
    * batch. */
  def readJsonlAudited(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(wireSchema.add(StructField("corrupt", StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "corrupt")
      .json(path)

  /** Throughput read: explicit schema, malformed lines silently
    * dropped. */
  def readJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(wireSchema)
      .option("mode", "DROPMALFORMED")
      .json(path)
}
