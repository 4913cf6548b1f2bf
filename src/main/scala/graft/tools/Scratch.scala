package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only probe main — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = graft.sources.LogSource.readEvents(spark, "/root/testdata/sf0.001")
    ev.printSchema()
    ev.orderBy("event_id").show(3, false)
    import org.apache.spark.sql.functions._
    ev.select(date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").as("fmt"))
      .orderBy(col("fmt")).show(3, false)
    val rm = graft.sources.LogSource.asRouterMessages(ev)
    val v1 = graft.operators.Logstash.producerPayload(rm, "dockerhost-a")
    v1.show(3, false)
    spark.stop()
  }
}
