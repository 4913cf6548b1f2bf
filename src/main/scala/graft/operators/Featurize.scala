package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Customer/storage featurization operators (SURVEY §2.4 extension
  * surface): RFM segmentation (the classic marketing-science user
  * triage), a varint delta-encoding size estimator (storage planning
  * for the event stream), and blocked two-table record linkage
  * (entity resolution between a table and a degraded copy).
  *
  * The shared discipline: no global sort over an unbounded table.
  * Quintile scores come from a distributed CDF join (value → score
  * maps built with the Prefix cumsum over per-distinct-value counts),
  * varint lengths from integer bit-length, and linkage candidates from
  * equi-joined blocks — each piece map-side or key-shuffled only. */
object Featurize {

  /** value→quintile-score map for one metric: score =
    * ⌊5·cum_below/total⌋ + 1 ∈ 1..5 by the exclusive CDF, so ties (equal
    * metric values) share a score deterministically and no window ever
    * orders the full user table. */
  private def quintileMap(perUser: DataFrame, metric: String,
                          block: Column => Column): DataFrame = {
    val counts = perUser.groupBy(col(metric).as("__v"))
      .agg(count(lit(1)).as("__n"))
    val total = counts.agg(sum(col("__n")).as("__total"))
    Prefix.inclusiveCumsum(counts, block(col("__v")), col("__v"),
        Seq("n" -> col("__n")))
      .crossJoin(broadcast(total))
      .select(col("__v").as(metric),
        (expr("5 * (cum_n - __n) div __total") + 1)
          .as(s"${metric}_score"))
  }

  /** RFM segmentation: per user, Recency (days since last event),
    * Frequency (events), Monetary (Σ value cents), each scored into
    * quintiles 1–5 (5 best), rolled up to segment counts. The three
    * score maps are distinct-value-sized joins — the user table is
    * never globally sorted or windowed. Output ≤ 125 segments. */
  def rfmSegments(events: DataFrame): DataFrame = {
    val maxDay = events.agg(
      max(expr("unix_micros(ts) div 86400000000")).as("__maxd"))
    val perUser = events
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        expr("CAST(floor(value * 100) AS BIGINT)").as("cents"))
      .groupBy(col("user_id"))
      .agg(max(col("day")).as("last_day"), count(lit(1)).as("f"),
        sum(col("cents")).as("m"))
      .crossJoin(broadcast(maxDay))
      .select(col("user_id"), (col("__maxd") - col("last_day")).as("r"),
        col("f"), col("m"))
    val rMap = quintileMap(perUser, "r", v => floor(v / lit(8d)).cast("long"))
    val fMap = quintileMap(perUser, "f", v => floor(v / lit(8d)).cast("long"))
    val mMap = quintileMap(perUser, "m",
      v => floor(v / lit(65536d)).cast("long"))
    perUser
      // r's map is bounded by calendar days → always broadcastable;
      // f/m maps are distinct-value-sized (monetary is near-continuous,
      // so potentially user-sized at warehouse scale) — leave those to
      // AQE, which broadcasts them while they fit and shuffles when not
      .join(broadcast(rMap), "r").join(fMap, "f")
      .join(mMap, "m")
      // recency: SMALL r (recent) must score 5
      .select(col("user_id"), (lit(6L) - col("r_score")).as("r_score"),
        col("f_score"), col("m_score"))
      .groupBy(expr("r_score * 100 + f_score * 10 + m_score").as("segment"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("segment"))
  }

  /** Delta-encoding storage estimate for the event stream: per-user
    * timestamps gap-encoded (LEB128-style varints — first event pays
    * its absolute epoch, each next one only the gap), versus 8 bytes
    * fixed. The answer a storage planner wants before picking an
    * encoding; one user-keyed lag window + one aggregate. */
  def varintEstimate(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("us"))
      .withColumn("__prev", lag(col("us"), 1).over(w))
      .select(when(col("__prev").isNull,
          expr("CAST((length(bin(us)) + 6) div 7 AS BIGINT)"))
        .otherwise(expr("CAST((length(bin(us - __prev)) + 6) div 7 AS BIGINT)"))
        .as("vbytes"))
      .agg(count(lit(1)).as("n_events"),
        expr("8 * count(1)").cast("long").as("raw_bytes"),
        sum(col("vbytes")).as("varint_bytes"))
      .select(col("n_events"), col("raw_bytes"), col("varint_bytes"),
        expr("1000000 * varint_bytes div raw_bytes").as("ratio_ppm"))
      .orderBy(col("n_events"))
  }

  /** Blocked record linkage: match `customer` against a degraded copy
    * (names perturbed, keys re-issued) — the two-table entity-
    * resolution shape (vs. editDistConfirm's self-dedup). Blocking =
    * equi-join on (nationkey, acctbal-band) — perturbation preserves
    * both, so recall is exact here while the join only compares
    * within-block pairs (|block|² work, never |table|²). Confirmation
    * = Levenshtein ≤ maxDist on the name. */
  def recordLinkage(customer: DataFrame, degraded: DataFrame,
                    maxDist: Int = 2): DataFrame = {
    def withBlock(df: DataFrame, key: String, name: String) =
      df.select(col(key).as(s"${name}_id"),
        col("c_name").as(s"${name}_name"),
        col("c_nationkey").as(s"${name}_nat"),
        expr("CAST(floor(c_acctbal) AS BIGINT) div 100").as(s"${name}_band"))
    val a = withBlock(customer, "c_custkey", "a")
    val b = withBlock(degraded, "d_id", "b")
    a.join(b, col("a_nat") === col("b_nat")
        && col("a_band") === col("b_band"))
      .withColumn("dist", levenshtein(col("a_name"), col("b_name")))
      .filter(col("dist") <= maxDist)
      .select(col("a_id"), col("b_id"), col("dist"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Deterministically degraded customer copy for the linkage gate:
    * every third customer's name loses one character (position keyed
    * on the custkey), keys are re-issued with an offset so nothing
    * joins on id. */
  def degradeCustomers(customer: DataFrame): DataFrame =
    customer.select((col("c_custkey") + 1000000L).as("d_id"),
      when(col("c_custkey") % 3 === 0,
        expr("""concat(substring(c_name, 1, CAST(pmod(c_custkey, length(c_name) - 1) AS INT)),
                substring(c_name, CAST(pmod(c_custkey, length(c_name) - 1) AS INT) + 2, 1000000))"""))
        .otherwise(col("c_name")).as("c_name"),
      col("c_nationkey"), col("c_acctbal"))
}
