package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway timing probe for the similarity family (delete me). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = Seq("topk_cosine", "ann_lsh", "ann_lsh_multiprobe",
      "ann_ivf", "ann_ivf_nprobe", "embed_neardup", "ivf_kmeans")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      // warmup
      spark.catalog.clearCache(); fn(spark, sfDir).count()
      val ts = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $n%-20s min=${ts.min}%.3f med=${ts.sorted.apply(1)}%.3f max=${ts.max}%.3f")
    }
    spark.stop()
  }
}
