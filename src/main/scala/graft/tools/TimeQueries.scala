package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev tool: time a SUBSET of SparkEntry.queries with exactly the bench
  * session and action (.count(), caches cleared between runs), min-of-N.
  * Usage: runMain graft.tools.TimeQueries q1 q2 ...  (env:
  * SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_RUNS). */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq
                else graft.SparkEntry.queries.keys.toSeq
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      graft.Caches.releaseAll()
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case e: Throwable =>
        println(s"[timequeries] ERR ${e.getClass.getSimpleName}: ${e.getMessage}")
        return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }
    // warmup (stages artifacts, JIT)
    names.foreach(n => timeOnce(graft.SparkEntry.queries(n)))
    val out = names.map { n =>
      val ts = (1 to runs).map(_ => timeOnce(graft.SparkEntry.queries(n)))
        .filter(_ >= 0)
      val mn = if (ts.isEmpty) -1.0 else ts.min
      println(f"[timequeries] $n%-36s min=$mn%8.4f  all=${ts.map(t => f"$t%.3f").mkString(",")}")
      n -> mn
    }
    println("[timequeries] TOTAL " + f"${out.map(_._2).filter(_ >= 0).sum}%.3f")
    spark.stop()
  }
}
