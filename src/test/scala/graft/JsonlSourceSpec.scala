package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.JsonlSource

/** JSONL source: schema-enforced round-trip, PERMISSIVE corrupt-line
  * audit, DROPMALFORMED throughput path. */
class JsonlSourceSpec extends SparkTestBase {
  import spark.implicits._

  private def writeLines(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("jsonl_spec").toString
    Files.write(Paths.get(dir, "part-00000.json"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir
  }

  private val good = Seq(
    """{"event_id":1,"ts_us":1000000,"user_id":7,"event_type":"click","value":1.5,"props":"{\"k\":1}"}""",
    """{"event_id":2,"ts_us":2000000,"user_id":8,"event_type":"view","value":null,"props":null}""")
  private val bad = Seq(
    """{"event_id":3,"ts_us":BROKEN""",        // unparseable JSON
    """not json at all""")

  test("audited read surfaces corrupt lines with data columns NULL") {
    val dir = writeLines(good ++ bad)
    // Spark disallows querying ONLY the corrupt column off a raw JSON
    // scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache the parsed
    // result first, exactly what a real audit pass does anyway
    val df = JsonlSource.readJsonlAudited(spark, dir).cache()
    try {
      assert(df.count() == 4)
      val corrupt = df.filter(col("corrupt").isNotNull)
      assert(corrupt.count() == 2)
      assert(corrupt.filter(col("event_id").isNotNull).count() == 0,
        "corrupt rows must not carry parsed data")
      val rawLines = corrupt.select("corrupt").as[String].collect().toSet
      assert(rawLines == bad.toSet, "the raw line is preserved for the audit")
    } finally df.unpersist()
  }

  test("DROPMALFORMED read keeps exactly the parseable rows") {
    val dir = writeLines(good ++ bad)
    val r = JsonlSource.readJsonl(spark, dir)
      .select("event_id", "ts_us", "user_id", "event_type", "props")
      .as[(Long, Long, Long, String, Option[String])]
      .collect().sortBy(_._1).toSeq
    assert(r == Seq(
      (1L, 1000000L, 7L, "click", Some("{\"k\":1}")),
      (2L, 2000000L, 8L, "view", None)))
  }

  test("round-trip: write then read is the identity on the event frame") {
    val ev = graft.sources.LogSource
      .readEvents(spark, "/root/testdata/sf0.001")
    val dir = Files.createTempDirectory("jsonl_rt").toString + "/out"
    JsonlSource.writeJsonl(ev, dir)
    val back = JsonlSource.readJsonl(spark, dir)
    val orig = ev.select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
      col("user_id"), col("event_type"), col("value"), col("props"))
    assert(back.count() == orig.count())
    assert(back.exceptAll(orig).count() == 0L &&
      orig.exceptAll(back).count() == 0L,
      "JSONL round-trip must preserve every row bit-for-bit")
  }
}
