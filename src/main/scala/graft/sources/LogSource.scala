package graft.sources

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit

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

  /** Schema for reading the events fixture. `ts` is declared LongType so
    * Spark hands us the RAW int64 epoch value regardless of the parquet
    * logical-type annotation — the fixture generation has flipped between
    * TIMESTAMP(NANOS) and TIMESTAMP(MICROS) across driver runs, so the
    * unit is NOT assumed here; it is detected per file from the parquet
    * footer (see [[tsUnitDivisor]]) and normalized to µs after read. */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // raw epoch int64; unit detected from footer
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)
  ))

  /** Detected unit of a raw epoch value, expressed as the divisor that
    * converts it to µs (NANOS → 1000, MICROS → 1, MILLIS → -1000 meaning
    * "multiply by 1000"). Cached per path: `readEvents` is called by every
    * gated query, and the footer read — though driver-side and cheap —
    * shouldn't repeat 138×. */
  private val unitCache = new ConcurrentHashMap[String, Long]()

  /** Epoch magnitude cut points for the no-annotation fallback:
    * 4e17 ns ≈ 1982, 4e17 µs ≈ year 14655 — any plausible event epoch in
    * ns exceeds it and any in µs is far below it. Same reasoning one
    * level down for µs-vs-ms. */
  private val NsFloor = 400000000000000000L // 4e17
  private val UsFloor = 400000000000000L // 4e14

  private val Y2000Us = 946684800000000L
  private val Y2100Us = 4102444800000000L

  /** Read the `ts` field's logical-type annotation from the parquet footer
    * of the first file under `path` — a single driver-side metadata read,
    * no Spark job. Falls back to a magnitude probe on the column-chunk
    * statistics when the column is a plain (unannotated) INT64. A
    * year-range guard on the CONVERTED stats makes the next fixture unit
    * flip fail loudly instead of silently compressing time 1000×. */
  private def tsUnitDivisor(spark: SparkSession, path: String): Long =
    unitCache.computeIfAbsent(path, _ => {
      val hconf = spark.sessionState.newHadoopConf()
      val p = new Path(path)
      val fs = p.getFileSystem(hconf)
      val file =
        if (fs.getFileStatus(p).isDirectory)
          fs.listStatus(p).map(_.getPath)
            .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
            .minBy(_.getName)
        else p
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, hconf))
      try {
        val schema = reader.getFileMetaData.getSchema
        require(schema.containsField("ts"), s"events parquet at $path has no `ts` column")
        // Min/max of the raw int64 from the first row group's column-chunk
        // statistics (no Spark job); absent for stats-less writers.
        val tsStats = reader.getFooter.getBlocks.asScala.headOption.flatMap(
          _.getColumns.asScala.find(_.getPath.toDotString == "ts")
            .map(_.getStatistics).filter(s => s != null && s.hasNonNullValue))
        def statLong(c: Comparable[_]): Long = c.asInstanceOf[java.lang.Long].longValue()
        val divisor = schema.getType(Seq("ts"): _*).asPrimitiveType().getLogicalTypeAnnotation match {
          case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            t.getUnit match {
              case TimeUnit.NANOS  => 1000L
              case TimeUnit.MICROS => 1L
              case TimeUnit.MILLIS => -1000L
            }
          case _ =>
            // Plain INT64: infer the unit from the raw max's magnitude.
            val maxRaw = tsStats.map(s => statLong(s.genericGetMax)).getOrElse(
              throw new IllegalStateException(
                s"events parquet at $path: `ts` has no timestamp annotation and no stats to probe"))
            if (maxRaw >= NsFloor) 1000L
            else if (maxRaw >= UsFloor) 1L
            else -1000L
        }
        val toMicros = (v: Long) => if (divisor > 0) v / divisor else v * -divisor
        tsStats.foreach { s =>
          val loUs = toMicros(statLong(s.genericGetMin))
          val hiUs = toMicros(statLong(s.genericGetMax))
          require(loUs >= Y2000Us && hiUs <= Y2100Us,
            s"events ts unit detection failed for $path: converted range " +
              s"[$loUs, $hiUs] µs is outside years [2000, 2100] (divisor=$divisor)")
        }
        divisor
      } finally reader.close()
    })

  /** raw epoch → µs timestamp SQL fragment for the detected unit.
    * `div` (integer division) for the ns case is byte-identical to
    * DuckDB's ns→µs truncation on the same file — `/` would round through
    * a double and drift by ±1 µs on ~2^60 inputs. */
  private def toMicrosSql(divisor: Long): String =
    if (divisor == 1L) "timestamp_micros(ts)"
    else if (divisor > 0) s"timestamp_micros(ts div $divisor)"
    else s"timestamp_micros(ts * ${-divisor})"

  def readEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val div = tsUnitDivisor(spark, s"$sfDir/events.parquet")
    spark.read.schema(eventsSchema).parquet(s"$sfDir/events.parquet")
      .withColumn("ts", expr(toMicrosSql(div)))
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
    * identical schema and derivation over a file stream. The unit is
    * detected once from the directory's first file at stream start; a
    * mid-stream unit flip within one directory is not supported (and
    * would trip the year-range guard on the next cold start). */
  def streamRouterMessages(spark: SparkSession, dir: String): DataFrame = {
    val div = tsUnitDivisor(spark, dir)
    asRouterMessages(
      spark.readStream.schema(eventsSchema).parquet(dir)
        .withColumn("ts", expr(toMicrosSql(div))))
  }
}
