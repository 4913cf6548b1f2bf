package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** The consumer side (readstream.py:13-38) as Structured Streaming.
  *
  * The reference hand-rolls what the micro-batch engine provides:
  * shard discovery (S5) = source partition planning; round-robin poll +
  * iterator advance (S7) = checkpointed offsets; per-fetch limit (S8) =
  * maxFilesPerTrigger / maxOffsetsPerTrigger; print loop (S9) = console
  * sink; the 5-reads/s/shard sleep (S10, readstream.py:37-38) =
  * Trigger.ProcessingTime(200 ms).
  */
object ConsumerPipeline {

  /** Schema of the producer's file-stream output (one JSON doc per
    * record plus its routing metadata). */
  val recordSchema: StructType = StructType(Seq(
    StructField("log_json", StringType),
    StructField("partition_key", StringType)))

  /** Streaming read of the sharded output directory. `startingOffsets`
    * semantics (S6, LATEST vs AT_SEQUENCE_NUMBER, readstream.py:26-27):
    * a fresh checkpoint replays from the earliest available record (the
    * commented-out TRIM_HORIZON path); an existing checkpoint resumes
    * exactly where the last run stopped — which IS the
    * AT_SEQUENCE_NUMBER contract, persisted instead of in-memory. */
  def readRecords(spark: SparkSession, dir: String,
                  maxFilesPerTrigger: Int = 500): DataFrame =
    spark.readStream
      .schema(recordSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger) // S8: fetch cap
      .json(dir)

  /** Console sink + 200 ms trigger — readstream.py's print loop with its
    * rate-limit sleep (S9 + S10). */
  def startConsole(spark: SparkSession, dir: String,
                   checkpointDir: String): StreamingQuery =
    readRecords(spark, dir).writeStream
      .format("console")
      .option("truncate", "false")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(200L))
      .start()

  /** Memory-sink variant for tests: same plan, assertable output. */
  def startMemory(spark: SparkSession, dir: String, queryName: String,
                  checkpointDir: String, maxFilesPerTrigger: Int = 500)
      : StreamingQuery =
    readRecords(spark, dir, maxFilesPerTrigger).writeStream
      .format("memory")
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(200L))
      .start()
}
