package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway timing probe (verify-skill pattern): times one named
  * SparkEntry query min-of-N on a given SF dir. */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "heavy_hitters"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    def once(): Double = {
      graft.Caches.releaseAll(); spark.catalog.clearCache()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    once() // warmup
    val ts = (1 to 5).map(_ => once())
    println(f"[probe] $name min=${ts.min}%.4f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    spark.stop()
  }
}
