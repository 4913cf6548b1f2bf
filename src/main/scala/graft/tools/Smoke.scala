package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: replicate the driver's t1 smoke — SparkEntry.entry rows>0. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    println(s"[smoke] entry rows=$n schema=${df.schema.simpleString}")
    df.show(2, false)
    assert(n > 0, "entry returned no rows")
    spark.stop()
  }
}
