package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S2 (SURVEY §2.1): the stream source, batch analog.
  *
  * The reference ingests `chan *router.Message` (logspoutkinesis.go:182).
  * In this environment the driver's `events` parquet stands in for the log
  * stream (FIXTURES.md §B): we deterministically derive the
  * `RouterMessage` columns from `events` columns so every downstream
  * operator has a DuckDB-expressible oracle. The derivation is pure
  * column arithmetic — its SQL twin lives in graft.OracleFragments.
  */
object LogSource {

  /** Schema for reading the events fixture: `ts` is parquet
    * TIMESTAMP(NANOS). Declaring it LongType up front makes Spark hand us
    * the raw ns — no schema inference, no legacy session conf, works in
    * ANY caller's session (the driver passes its own). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // ns since epoch; convert to µs after read
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)
  ))

  /** ns→µs truncate-divide — byte-identical to DuckDB's ns→µs truncation
    * on the same file (verified against epoch_us). */
  private def nsToMicros(df: DataFrame): DataFrame =
    df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  def readEvents(spark: SparkSession, sfDir: String): DataFrame =
    nsToMicros(spark.read.schema(eventsSchema).parquet(s"$sfDir/events.parquet"))

  /** events → RouterMessage-shaped DataFrame. Deterministic, 1:1, pure. */
  def asRouterMessages(events: DataFrame): DataFrame = {
    val uid = col("user_id")
    val eid = col("event_id")
    events.select(
      concat(col("event_type"), lit(" #"), eid.cast("string")).as("data"),
      col("ts").as("time"),
      when(eid % 2 === 0, "stdout").otherwise("stderr").as("source"),
      md5(eid.cast("string").cast("binary")).as("containerId"),
      concat(lit("/app-"), (uid % 10).cast("string")).as("containerName"),
      when(eid % 3 === 0,
          concat(lit("registry:5000/svc-"), (uid % 5).cast("string"), lit(":v2")))
        .when(eid % 3 === 1,
          concat(lit("svc-"), (uid % 5).cast("string"), lit(":latest")))
        .otherwise(concat(lit("svc-"), (uid % 5).cast("string"))).as("image"),
      concat(lit("host-"), (uid % 4).cast("string")).as("hostname"),
      when(uid % 7 === 0, map())
        .otherwise(map(
          lit("env"), when(uid % 3 === 0, "dev").when(uid % 3 === 1, "staging").otherwise("prod"),
          lit("team"), concat(lit("t"), (uid % 3).cast("string"))))
        .as("labels"),
      eid.as("event_id") // carried for deterministic ordering in oracle queries
    )
  }

  /** Structured Streaming variant of the same source (S2 streaming):
    * identical schema and derivation over a file stream. The explicit
    * LongType-ns schema + µs conversion matches the batch path, so the
    * stream reads the TIMESTAMP(NANOS) fixture correctly. */
  def streamRouterMessages(spark: SparkSession, dir: String): DataFrame =
    asRouterMessages(nsToMicros(
      spark.readStream.schema(eventsSchema).parquet(dir)))
}
