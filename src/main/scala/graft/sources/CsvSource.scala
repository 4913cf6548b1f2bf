package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CSV source/sink for the event stream — same read discipline as
  * [[JsonlSource]] (explicit schema, epoch-µs timestamps, audited or
  * dropped malformed lines), plus the CSV-specific hazards pinned
  * down: `props` carries embedded commas, double quotes, and newlines,
  * so quoting/escaping must round-trip exactly (quote doubling per
  * RFC 4180 — `escape` is set to the quote char, not backslash, so
  * any RFC reader agrees), and empty-string-vs-NULL is made
  * unambiguous with an explicit nullValue token (CSV cannot otherwise
  * distinguish them; JSON can). Distributed scan, per-partition
  * parsing, no shuffle. */
object CsvSource {

  /** The same wire schema as JSONL (epoch-µs BIGINT timestamps). */
  val wireSchema = JsonlSource.wireSchema

  private val opts = Map(
    "header" -> "true",
    "quote" -> "\"",
    "escape" -> "\"",          // RFC 4180 quote doubling
    "multiLine" -> "true",     // quoted newlines inside props
    "nullValue" -> "\\N")      // disambiguate NULL from empty string

  def writeCsv(events: DataFrame, path: String): Unit =
    events.select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").options(opts).csv(path)

  /** Throughput read: explicit schema, malformed lines dropped. */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(wireSchema).options(opts)
      .option("mode", "DROPMALFORMED").csv(path)

  /** Audited read: corrupt lines surfaced with the raw line. */
  def readCsvAudited(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(wireSchema.add("corrupt", "string"))
      .options(opts)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "corrupt")
      .csv(path)
}
