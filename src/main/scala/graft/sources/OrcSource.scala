package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ORC source/sink for the event stream — the third interchange format
  * beside [[CsvSource]] and [[JsonlSource]], covering the columnar
  * half of the warehouse world (Hive/Trino shops standardize on ORC
  * the way Spark shops do on parquet). Same wire discipline: explicit
  * schema on read (never inference), timestamps as epoch-µs BIGINTs so
  * no engine's timestamp codec sits in the round-trip path (ORC's own
  * TIMESTAMP encoding is timezone-entangled across writers — BIGINT
  * sidesteps the entire class of bugs the events fixture's parquet
  * unit flip exemplified). Column pruning and predicate pushdown work
  * as with parquet (ORC carries min/max stripe stats); a projection
  * over a subset of columns reads only those streams. */
object OrcSource {

  /** Same wire schema as JSONL/CSV (epoch-µs BIGINT timestamps). */
  val wireSchema = JsonlSource.wireSchema

  def writeOrc(events: DataFrame, path: String): Unit =
    events.select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").orc(path)

  /** Explicit-schema read: a schema mismatch fails loudly at plan time
    * instead of silently widening (the JSONL read discipline). */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(wireSchema).orc(path)
}
