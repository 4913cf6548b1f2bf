package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway perf probe (dev-only, see .claude/skills/verify): min-of-N
  * timings for a named subset of SparkEntry queries at a given SF. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args(1).split(",").toSeq
      else Seq("dedup_clusters", "dedup_clusters_star", "cluster_keeplist")
    val runs = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      def once(): Double = {
        graft.Caches.releaseAll(); spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup
      val ts = (1 to runs).map(_ => once())
      println(f"[probe] $n%-24s min=${ts.min}%.3f samples=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
