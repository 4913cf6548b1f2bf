package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Driver-run benchmark: times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR. Discipline: one untimed warmup pass (JIT +
  * page-cache), then min-of-3 timed runs per query so round-over-round
  * numbers compare builder work, not JVM warmth. Prints ONE JSON line to
  * stdout (the driver contract) and also writes it to bench_out.json so
  * the driver's `parsed` field never depends on log scraping. */
object Bench {
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

    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      // cold-cache discipline: operators that persist() intermediate
      // projections (ngram_jaccard) must not carry cache across timed
      // runs, or min-of-3 measures the cache, not the query.
      // releaseAll drains the Caches registry's strong handles too —
      // clearCache alone frees storage but would let ~10 plan trees
      // per query accumulate on the driver heap across the suite
      graft.Caches.releaseAll()
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    // warmup pass (untimed)
    SparkEntry.queries.foreach { case (_, fn) => timeOnce(fn) }
    // per-query min AND [min, median, max]: a contended host shows up
    // as a wide spread, so a bad sample flags itself instead of
    // reading as a code regression (the round-4 bench artifact lesson)
    val samples = SparkEntry.queries.map { case (name, fn) =>
      name -> (1 to runs).map(_ => timeOnce(fn)).filter(_ >= 0).sorted
    }
    val results = samples.map { case (name, ts) =>
      name -> (if (ts.nonEmpty) ts.min else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.4f" }
      .mkString("{", ",", "}")
    val disp = samples.map { case (k, ts) =>
      // lower median: unbiased-low for even run counts (a 2-sample
      // split like [1.0, 9.9] must not report the outlier as "median")
      val (mn, md, mx) =
        if (ts.isEmpty) (-1.0, -1.0, -1.0)
        else (ts.min, ts((ts.size - 1) / 2), ts.max)
      "\"" + k + "\":[" + f"$mn%.4f,$md%.4f,$mx%.4f" + "]"
    }.mkString("{", ",", "}")
    val unstable = samples.collect {
      case (k, ts) if ts.nonEmpty && ts.min > 0.2 && ts.max > 2 * ts.min => k
    }
    val unstableJson = unstable.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.values.filter(_ >= 0).sum
    val line =
      f"""{"metric":"total","value":$total%.4f,"unit":"sec","queries":$qs,"dispersion":$disp,"unstable":$unstableJson,"sf":"$sfDir","runs":$runs}"""
    println(line)
    try Files.writeString(Paths.get("bench_out.json"), line)
    catch { case _: Throwable => () }
    spark.stop()
  }
}
