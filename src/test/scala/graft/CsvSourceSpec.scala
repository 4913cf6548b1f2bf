package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.CsvSource

/** CSV source: RFC 4180 quoting round-trip (commas, quotes, newlines
  * in fields), NULL-vs-empty disambiguation, parquet-truth identity. */
class CsvSourceSpec extends SparkTestBase {
  import spark.implicits._

  test("quoting hazards round-trip: commas, doubled quotes, newlines, NULLs") {
    val rows = Seq(
      (1L, 1000L, 7L, "click", Some(1.5), Some("""{"a":1,"b":"x,y"}""")),
      (2L, 2000L, 8L, "view", None, Some("say \"hi\"\nsecond line")),
      (3L, 3000L, 9L, "error", Some(0.0), None),   // NULL props
      (4L, 4000L, 9L, "error", Some(0.0), Some(""))) // EMPTY props
      .toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
    val dir = Files.createTempDirectory("csv_spec").toString + "/out"
    rows.withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .transform(d => { CsvSource.writeCsv(d, dir); d })
    val back = CsvSource.readCsv(spark, dir)
      .as[(Long, Long, Long, String, Option[Double], Option[String])]
      .collect().sortBy(_._1).toSeq
    assert(back.map(_._6) == Seq(
      Some("""{"a":1,"b":"x,y"}"""),
      Some("say \"hi\"\nsecond line"),
      None, Some("")),
      "quote doubling, embedded newline, and NULL-vs-empty must survive")
    assert(back.map(_._5) == Seq(Some(1.5), None, Some(0.0), Some(0.0)))
  }

  test("round-trip is the identity on the event fixture") {
    val ev = graft.sources.LogSource
      .readEvents(spark, "/root/testdata/sf0.001")
    val dir = Files.createTempDirectory("csv_rt").toString + "/out"
    CsvSource.writeCsv(ev, dir)
    val back = CsvSource.readCsv(spark, dir)
    val orig = ev.select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
      col("user_id"), col("event_type"), col("value"), col("props"))
    assert(back.count() == orig.count())
    assert(back.exceptAll(orig).count() == 0L &&
      orig.exceptAll(back).count() == 0L)
  }
}
