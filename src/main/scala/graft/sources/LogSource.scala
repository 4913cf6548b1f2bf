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

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)
  ))

  /** The events fixture stores `ts` as parquet TIMESTAMP(NANOS), which
    * Spark's vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]). We read
    * nanos as Long and truncate-divide to µs — byte-identical to DuckDB's
    * ns→µs truncation (verified against epoch_us on the same file). */
  def readEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

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
    * identical schema and derivation over a file stream. */
  def streamRouterMessages(spark: SparkSession, dir: String): DataFrame =
    asRouterMessages(spark.readStream.schema(eventsSchema).parquet(dir))
}
