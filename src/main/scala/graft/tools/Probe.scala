package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe (see .claude/skills/verify): checked-in empty-ish. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .appName("probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = Seq(1L, 2L, 3L).toDF("k")
    try {
      val b = df.agg(expr("bloom_filter_agg(xxhash64(k), 10L, 100L)").as("bf"))
      b.show()
      println("[probe] bloom_filter_agg OK")
      val r = df.crossJoin(b)
        .select(col("k"), expr("might_contain(bf, xxhash64(k))").as("hit"))
      r.show()
      println("[probe] might_contain OK")
    } catch { case e: Exception => println("[probe] bloom FAIL: " + e.getMessage.take(300)) }
    spark.stop()
  }
}
