package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev tool: dump formatted plans of load-bearing queries for the scale
  * audit (pushdown, broadcast, codegen spans). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val targets =
      if (args.nonEmpty) args.toSeq
      else Seq("offset_resume", "logstash_v1_json", "ngram_jaccard",
        "topk_cosine", "ann_lsh", "exact_dedup", "event_windows", "batching",
        "minhash_pairs")
    targets.foreach { name =>
      println(s"\n########## $name ##########")
      graft.SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
