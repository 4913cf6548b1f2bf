package graft



import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan

/** The two remaining scale patterns from the design brief, demonstrated
  * and asserted on real plans: bucketed co-located joins (shuffle
  * elimination) and salted aggregation for skewed keys. */
class ScalePatternsSpec extends SparkTestBase {
  import spark.implicits._

  private def countShuffles(plan: SparkPlan): Int = {
    // descend into AQE's finalized plan and its materialized stages —
    // a plain collect stops at the AdaptiveSparkPlanExec boundary
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def walk(p: SparkPlan): Int = {
      val self = p match {
        case _: ShuffleExchangeLike => 1
        case _ => 0
      }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      self + kids.map(walk).sum
    }
    walk(plan)
  }

  test("bucketed tables join WITHOUT a shuffle (co-located join)") {
    // (warehouse dir is a static conf — tables land in ./spark-warehouse,
    // dropped below and gitignored)
    spark.sql("DROP TABLE IF EXISTS b_events")
    spark.sql("DROP TABLE IF EXISTS b_users")
    spark.range(1000).select(col("id").as("user_id"),
        (col("id") % 7).as("event_type"))
      .write.bucketBy(8, "user_id").sortBy("user_id")
      .saveAsTable("b_events")
    spark.range(200).select(col("id").as("user_id"),
        concat(lit("u"), col("id")).as("name"))
      .write.bucketBy(8, "user_id").sortBy("user_id")
      .saveAsTable("b_users")

    // disable broadcast so the join would NEED a shuffle if not bucketed
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_events")
        .join(spark.table("b_users"), "user_id")
      assert(joined.count() == 200L)
      val shuffles = countShuffles(joined.queryExecution.executedPlan)
      assert(shuffles == 0,
        s"bucketed join must not shuffle, found $shuffles exchanges")

      // control: the same join over UNbucketed data DOES shuffle
      val plainA = spark.range(1000).select(col("id").as("user_id"))
      val plainB = spark.range(200).select(col("id").as("user_id"))
      val control = plainA.join(plainB, "user_id")
      control.count()
      assert(countShuffles(control.queryExecution.executedPlan) > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_events")
      spark.sql("DROP TABLE IF EXISTS b_users")
    }
  }

  test("salted two-phase aggregation equals direct aggregation on skewed keys") {
    // 90% of rows share one hot key — the classic skew shape
    val skewed = spark.range(100000).select(
      when(col("id") % 10 =!= 0, "hot").otherwise(concat(lit("k"), col("id")))
        .as("key"),
      col("id").as("v"))
    // phase 1: aggregate on (key, salt); phase 2: merge salts per key
    val salted = skewed
      .withColumn("salt", pmod(hash(col("v")), lit(16)))
      .groupBy("key", "salt").agg(sum("v").as("ps"), count(lit(1)).as("pn"))
      .groupBy("key").agg(sum("ps").as("total"), sum("pn").as("n"))
    val direct = skewed.groupBy("key")
      .agg(sum("v").as("total"), count(lit(1)).as("n"))
    val diff = salted.join(direct, "key")
      .filter(salted("total") =!= direct("total") || salted("n") =!= direct("n"))
    assert(salted.count() == direct.count())
    assert(diff.count() == 0L)
  }
}
