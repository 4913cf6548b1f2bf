package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.OrcSource

/** ORC source: parquet-truth round-trip identity, NULL survival, and
  * the column-pruning scan claim. */
class OrcSourceSpec extends SparkTestBase {
  import spark.implicits._

  test("round-trip is the identity on the event fixture") {
    val ev = graft.sources.LogSource
      .readEvents(spark, "/root/testdata/sf0.001")
    val dir = Files.createTempDirectory("orc_rt").toString + "/out"
    OrcSource.writeOrc(ev, dir)
    val back = OrcSource.readOrc(spark, dir)
    val orig = ev.select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
      col("user_id"), col("event_type"), col("value"), col("props"))
    assert(back.count() == orig.count())
    assert(back.exceptAll(orig).count() == 0L &&
      orig.exceptAll(back).count() == 0L)
  }

  test("NULLs survive the round-trip") {
    val rows = Seq(
      (1L, 1000L, 7L, "click", Some(1.5), Some("""{"k":1}""")),
      (2L, 2000L, 8L, "view", None, None))
      .toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
    val dir = Files.createTempDirectory("orc_null").toString + "/out"
    OrcSource.writeOrc(
      rows.withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"), col("props")), dir)
    val back = OrcSource.readOrc(spark, dir)
      .as[(Long, Long, Long, String, Option[Double], Option[String])]
      .collect().sortBy(_._1).toSeq
    assert(back.map(_._5) == Seq(Some(1.5), None))
    assert(back.map(_._6) == Seq(Some("""{"k":1}"""), None))
  }

  test("a 2-column projection prunes the ORC scan's read schema") {
    val ev = graft.sources.LogSource
      .readEvents(spark, "/root/testdata/sf0.001")
    val dir = Files.createTempDirectory("orc_prune").toString + "/out"
    OrcSource.writeOrc(ev, dir)
    val plan = OrcSource.readOrc(spark, dir)
      .select("event_id", "event_type")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<event_id:bigint,event_type:string>"),
      s"expected pruned ReadSchema in:\n$plan")
  }
}
