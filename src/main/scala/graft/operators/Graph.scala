package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph centrality over the behavioral transition graph — PageRank
  * (Brin & Page 1998) on the event-type digraph whose edges are
  * [[Events.transitionMatrix]]'s per-user consecutive transitions. The
  * training-data angle: ranking nodes of an interaction/link graph is
  * the classic importance prior for crawl scheduling and corpus
  * weighting, and the event-type graph gives it an oracle-checkable
  * fixture.
  *
  * All-integer ppm arithmetic — the KMeans/LinearProbe discipline
  * applied to the power iteration: the transition matrix is row-
  * normalized in ppm (truncating div, positive so Spark `div` and
  * DuckDB `//` agree), each iteration's mass sums are exact BIGINT
  * (associative, any combine order), and the damping step is integer:
  * r' = (850000·(s div 1e6)) div 1e6 + 150000 div n. Truncation leaks
  * a few ppm of mass per round (as does any fixed-point PageRank);
  * both engines leak IDENTICALLY, which is what the gate needs.
  *
  * Scale shape: one corpus pass (the per-user lead window — user-keyed
  * shuffle) collapses to the vocab²-bounded edge table; every power
  * iteration joins the vocab-sized rank frame to the cached edge table
  * and re-aggregates — corpus size never reappears. Rank frames are
  * eagerly localCheckpoint'd per round (vocab-sized rows): r is
  * referenced once per round so the plan grows only linearly, but 5
  * rounds of join+agg+outer-join lineage is still worth truncating. */
object Graph {

  def pagerankEvents(events: DataFrame, iters: Int = 5): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(unix_micros(col("ts")), col("event_id"))
    val pairs = events
      .select(col("event_type").as("src"),
        lead(col("event_type"), 1).over(w).as("dst"))
      .filter(col("dst").isNotNull)
      .groupBy("src", "dst").agg(count(lit(1)).as("c"))
    val edges = graft.Caches.track(
      pairs.join(pairs.groupBy("src").agg(sum(col("c")).as("out")), "src")
        .select(col("src"), col("dst"),
          expr("(1000000 * c) div out").as("p_ppm")))
    val nodes = graft.Caches.track(
      events.select(col("event_type").as("node")).distinct())
    val nc = nodes.agg(count(lit(1)).as("n"))

    var r = nodes.crossJoin(broadcast(nc))
      .select(col("node"), expr("1000000 div n").as("r_ppm"))
      .localCheckpoint()
    (0 until iters).foreach { _ =>
      val contrib = r.join(edges, col("node") === col("src"))
        .groupBy(col("dst"))
        .agg(sum(col("r_ppm") * col("p_ppm")).as("s"))
      r = nodes.join(contrib, col("node") === col("dst"), "left")
        .crossJoin(broadcast(nc))
        .select(col("node"),
          expr("(850000 * (coalesce(s, 0) div 1000000)) div 1000000" +
            " + (150000 div n)").as("r_ppm"))
        .localCheckpoint()
    }
    r.select(col("node").as("event_type"), col("r_ppm").as("rank_ppm"))
  }
}
