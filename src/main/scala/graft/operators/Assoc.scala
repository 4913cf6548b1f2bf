package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Association-rule mining (the Agrawal-Imielinski-Swami market-basket
  * framework) over per-user event-type baskets: for every ordered pair
  * of co-occurring event types A → B, the three classic measures —
  * support P(AB), confidence P(B|A), lift P(AB)/(P(A)P(B)) — in exact
  * integer ppm, so the mining verdict hashes identically on any
  * engine. The behavioral-analytics question this answers: "users who
  * error also purchase — dependent or coincidence?" (lift ⋛ 1e6).
  *
  * Scale shape: baskets = DISTINCT (user, type) — one shuffle with
  * map-side combine, rows ≤ users × |type vocab|. The pair join is a
  * SELF-JOIN ON user_id, whose per-user fan-out is bounded by the TYPE
  * VOCABULARY squared (not by event count — a user with 1M events
  * still contributes ≤ |vocab|² pairs), so the join output is
  * users-sized with a small constant factor. Supports are vocab-sized
  * aggregates, broadcast back; the user-count is a 1-row aggregate.
  * Lift's nab·N product overflows a 64-bit lane past ~3e9 users —
  * DECIMAL(38,0) lanes (HUGEINT twin), BIGINT ppm out. */
object Assoc {

  /** @param events (user_id, event_type) stream
    * @param minUsers prune pairs co-occurring for fewer users (the
    *   Apriori support floor — applied to the PAIR table before the
    *   rule math, so rare-pair noise never reaches the output) */
  def assocRules(events: DataFrame, minUsers: Long = 1L): DataFrame = {
    val baskets = graft.Caches.track(
      events.select(col("user_id"), col("event_type")).distinct())
    val nUsers = baskets.agg(
      count_distinct(col("user_id")).as("n_users"))
    val item = baskets.groupBy("event_type")
      .agg(count(lit(1)).as("n_item"))
    val pairs = baskets.as("a")
      .join(baskets.as("b"), col("a.user_id") === col("b.user_id") &&
        col("a.event_type") =!= col("b.event_type"))
      .groupBy(col("a.event_type").as("antecedent"),
        col("b.event_type").as("consequent"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minUsers)
    pairs
      .join(broadcast(item.select(col("event_type").as("antecedent"),
        col("n_item").as("n_a"))), "antecedent")
      .join(broadcast(item.select(col("event_type").as("consequent"),
        col("n_item").as("n_b"))), "consequent")
      .crossJoin(broadcast(nUsers))
      .select(col("antecedent"), col("consequent"),
        col("n_a"), col("n_b"), col("n_ab"),
        expr("(1000000 * n_ab) div n_users").as("supp_ppm"),
        expr("(1000000 * n_ab) div n_a").as("conf_ppm"),
        expr("""CAST((CAST(1000000 AS DECIMAL(38,0)) * n_ab * n_users)
                     div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)""")
          .as("lift_ppm"))
  }
}
