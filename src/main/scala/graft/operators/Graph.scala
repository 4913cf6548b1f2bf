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

  def pagerankEvents(events: DataFrame, iters: Int = 5): DataFrame =
    pagerankCore(Events.stagedTransitionPairs(events),
      events.select(col("event_type").as("node")).distinct(), iters)
      .select(col("node").as("event_type"), col("r_ppm").as("rank_ppm"))

  /** The damped ppm power iteration over an arbitrary weighted
    * (src, dst, c) edge frame plus a node frame — the engine under
    * [[pagerankEvents]] and TextAnalysis.textrankTerms (identical
    * update, so both oracle twins unroll the SAME round SQL).
    * Returns (node, r_ppm). */
  private[graft] def pagerankCore(pairs: DataFrame, nodes0: DataFrame,
                                  iters: Int): DataFrame =
    // Staged (r19 optimization): the converged rank table joins the
    // staged converged-graph-artifact family (graph_lpa_labels,
    // graph_components, betweenness) — pagerank_events and
    // textrank_terms each re-ran the full power iteration per call.
    // Key covers BOTH input plans (edge and node frames).
    graft.Stage.parquet(pairs.sparkSession,
      graft.Stage.key(pairs, "pagerank_scores", iters,
        nodes0.queryExecution.analyzed.canonicalized.semanticHash())) {
      pagerankCoreLive(pairs, nodes0, iters)
    }

  private def pagerankCoreLive(pairs: DataFrame, nodes0: DataFrame,
                               iters: Int): DataFrame = {
    val edges = graft.Caches.track(
      pairs.join(pairs.groupBy("src").agg(sum(col("c")).as("out")), "src")
        .select(col("src"), col("dst"),
          expr("(1000000 * c) div out").as("p_ppm")))
    val nodes = graft.Caches.track(nodes0)
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
    r
  }

  /** Personalized PageRank (the random-walk-with-restart proximity of
    * Haveliwala 2002/Jeh-Widom 2003) from a deterministic seed — the
    * lexicographically-first event type: where [[pagerankEvents]]
    * teleports uniformly ("globally important"), PPR teleports to the
    * SEED only, so scores rank nodes by proximity to it (the
    * recommendation / related-items primitive). Same integer ppm
    * discipline; the restart term is 150000 on the seed and 0
    * elsewhere (init likewise concentrates the full 1e6 on the seed),
    * so every operand stays non-negative and both engines truncate
    * identically. Same scale shape as the shared core: corpus appears
    * once via the staged transition pairs, every round is
    * vocab²-bounded, rank frames localCheckpoint per round. */
  def pprEvents(events: DataFrame, iters: Int = 5): DataFrame =
    // staged converged scores (r19 optimization — same discipline as
    // pagerankCore; orderBy re-applies on the read-back)
    graft.Stage.parquet(events.sparkSession,
      graft.Stage.key(events, "ppr_scores", iters)) {
      pprEventsLive(events, iters)
    }.orderBy("event_type")

  private def pprEventsLive(events: DataFrame, iters: Int): DataFrame = {
    val pairs = Events.stagedTransitionPairs(events)
    val edges = graft.Caches.track(
      pairs.join(pairs.groupBy("src").agg(sum(col("c")).as("out")), "src")
        .select(col("src"), col("dst"),
          expr("(1000000 * c) div out").as("p_ppm")))
    val nodes = graft.Caches.track(
      events.select(col("event_type").as("node")).distinct())
    val seed = nodes.agg(min(col("node")).as("seed"))

    var r = nodes.crossJoin(broadcast(seed))
      .select(col("node"),
        when(col("node") === col("seed"), 1000000L).otherwise(0L)
          .as("r_ppm"))
      .localCheckpoint()
    (0 until iters).foreach { _ =>
      val contrib = r.join(edges, col("node") === col("src"))
        .groupBy(col("dst"))
        .agg(sum(col("r_ppm") * col("p_ppm")).as("s"))
      r = nodes.join(contrib, col("node") === col("dst"), "left")
        .crossJoin(broadcast(seed))
        .select(col("node"),
          (expr("(850000 * (coalesce(s, 0) div 1000000)) div 1000000") +
            when(col("node") === col("seed"), 150000L).otherwise(0L))
            .as("r_ppm"))
        .localCheckpoint()
    }
    r.select(col("node").as("event_type"), col("r_ppm").as("ppr_ppm"))
  }

  /** HITS hubs-and-authorities (Kleinberg 1999) on the weighted
    * event-type transition graph — the directed-role decomposition
    * [[pagerankEvents]]'s single centrality cannot express: a type that
    * FUNNELS INTO important states (hub) vs one important states land
    * ON (authority). Classic alternation a ← Aᵀh, h ← A·a with
    * transition counts as edge weights.
    *
    * Determinism: Kleinberg's L2 normalization has no cross-engine
    * closed integer form, and HITS rankings are normalization-scheme
    * invariant — so each half-step L1-normalizes to a 1e6 total
    * (ppm lanes, truncating div AFTER the full BIGINT sum; the raw
    * Σ h_ppm·c products are exact integers summed order-free). The
    * ppm-scaled re-division runs in DECIMAL(38,0) so corpus-scale edge
    * masses cannot overflow the 64-bit lane.
    *
    * Scale shape: identical to [[pagerankEvents]] — the corpus pass is
    * the shared staged transition-pair artifact; every half-step is one
    * vocab²-bounded join + vocab-sized aggregate + 1-row broadcast
    * total; score frames localCheckpoint per round. */
  def hitsScores(events: DataFrame, iters: Int = 4): DataFrame =
    // staged converged scores (r19 optimization — same discipline as
    // pagerankCore; orderBy re-applies on the read-back)
    graft.Stage.parquet(events.sparkSession,
      graft.Stage.key(events, "hits_scores", iters)) {
      hitsScoresLive(events, iters)
    }.orderBy("event_type")

  private def hitsScoresLive(events: DataFrame, iters: Int): DataFrame = {
    val edges = graft.Caches.track(Events.stagedTransitionPairs(events))
    val nodes = graft.Caches.track(
      events.select(col("event_type").as("node")).distinct())

    def normalize(raw: DataFrame, key: String, out: String): DataFrame = {
      val tot = raw.agg(sum(col("s")).as("t"))
      nodes.join(raw, col("node") === col(key), "left")
        .crossJoin(broadcast(tot))
        .select(col("node"),
          expr("""CAST((CAST(1000000 AS DECIMAL(38,0)) * coalesce(s, 0))
                       div t AS BIGINT)""").as(out))
        .localCheckpoint()
    }

    var h = nodes.select(col("node"), lit(1000000L).as("h_ppm"))
      .localCheckpoint()
    var a = h.select(col("node"), col("h_ppm").as("a_ppm"))
    (0 until iters).foreach { _ =>
      a = normalize(
        h.join(edges, col("node") === col("src"))
          .groupBy(col("dst")).agg(sum(col("h_ppm") * col("c")).as("s")),
        "dst", "a_ppm")
      h = normalize(
        a.join(edges, col("node") === col("dst"))
          .groupBy(col("src")).agg(sum(col("a_ppm") * col("c")).as("s")),
        "src", "h_ppm")
    }
    h.join(a, "node")
      .select(col("node").as("event_type"), col("h_ppm").as("hub_ppm"),
        col("a_ppm").as("auth_ppm"))
  }

  /** Per-type transition entropy in whole-bit lanes — "given the
    * current event, how predictable is the NEXT one": the Shannon
    * entropy of each row of the transition matrix, with every log
    * floored to whole bits (bits(out div c) = length(bin)−1 — the
    * unigram_surprisal discipline: engine-exact, no float log crosses
    * the oracle) and the weighted mean carried in milli-bits. A
    * deterministic template/bot emits near 0; organic traffic sits
    * near the hmax_bits = ⌊log2(n_next)⌋ uniform bound. The
    * predictability complement of transition_matrix's raw counts and
    * pagerank/HITS' importance views, off the SAME staged pair
    * artifact — zero new corpus passes, one vocab²-bounded aggregate. */
  def transitionEntropy(events: DataFrame): DataFrame = {
    val pairs = Events.stagedTransitionPairs(events)
    val tot = pairs.groupBy("src").agg(sum(col("c")).as("out"),
      count(lit(1)).as("n_next"))
    pairs.join(tot, Seq("src"))
      .groupBy(col("src").as("event_type"), col("out"), col("n_next"))
      .agg(sum(expr("c * (length(bin(out div c)) - 1)")).as("__h"))
      .select(col("event_type"), col("out").as("n_transitions"),
        col("n_next").as("n_next_types"),
        expr("(1000 * __h) div out").as("h_milli_bits"),
        (length(bin(col("n_next"))) - 1).cast("long").as("hmax_bits"))
      .orderBy("event_type")
  }

  /** Per-node triangle counts on the undirected event-type transition
    * graph — the clustering/cohesion signal next to [[pagerankEvents]]'s
    * centrality (triangle density is the classic spam-vs-community
    * discriminator in link-graph curation).
    *
    * Algorithm: compact-forward / ordered wedge join (Latapy 2008;
    * node-iterator family). Every undirected edge is stored once as
    * (a < b); a triangle {a<b<c} is found EXACTLY once as wedge
    * (a,b)+(b,c) closed by (a,c) — two equi-joins on the edge table,
    * never a per-node neighbor explode. Per-node counts come from
    * exploding each found triangle to its three corners (triangle-
    * count-sized, bounded far below wedge count).
    *
    * Scale shape: the corpus pass is the same user-keyed lead window
    * every transition op shares; after it the edge table is vocab²-
    * bounded, so the wedge join's cost is independent of corpus size.
    * On a BIG graph (edges ∝ corpus) the same two-equi-join plan is
    * the standard distributed triangle enumeration — shuffle keyed on
    * edge endpoints, skew-handled by the a<b<c orientation (each
    * triangle probes its lowest-degree-ordered corner once). */
  def triangleCount(events: DataFrame): DataFrame = {
    val edges = graft.Caches.track(Events.stagedTransitionPairs(events)
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct())
    val tri = edges.as("e1")
      .join(edges.as("e2"), col("e1.b") === col("e2.a"))
      .join(edges.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("event_type"))
      .groupBy("event_type").agg(count(lit(1)).as("n_triangles"))
      .orderBy("event_type")
  }

  /** Bipartite (user-day ↔ event-type) incidence table: each
    * (user, day, type) triple once. Day granularity (not lifetime)
    * because long-lived fixture users eventually touch every type —
    * the per-day view is where co-engagement actually varies. One
    * distinct — the shared base of the two audits below. */
  private def incidence(events: DataFrame): DataFrame =
    events.select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        col("event_type"))
      .distinct()

  /** Jaccard similarity between event types by shared user-days — the
    * bipartite co-engagement audit (same shape as item-item
    * collaborative similarity). Exact ppm: |A∩B| from the
    * (user, day)-keyed self-join of the incidence table,
    * |A∪B| = nA + nB − |A∩B| by inclusion-exclusion — set sizes from
    * ONE aggregate, broadcast back. Scale: the self-join shuffles on
    * (user, day); one user-day with d types contributes d² pairs (d is
    * capped by the type vocabulary, not corpus size); output is
    * |types|²-bounded. */
  def typeJaccard(events: DataFrame): DataFrame = {
    val ut = graft.Caches.track(incidence(events))
    val deg = ut.groupBy(col("event_type")).agg(count(lit(1)).as("nu"))
    val shared = ut
      .select(col("user_id"), col("day"), col("event_type").as("ta"))
      .join(ut.select(col("user_id"), col("day"),
        col("event_type").as("tb")), Seq("user_id", "day"))
      .filter(col("ta") < col("tb"))
      .groupBy(col("ta"), col("tb"))
      .agg(count(lit(1)).as("shared_days"))
    shared
      .join(broadcast(deg.select(col("event_type").as("ta"),
        col("nu").as("na"))), "ta")
      .join(broadcast(deg.select(col("event_type").as("tb"),
        col("nu").as("nb"))), "tb")
      .select(col("ta"), col("tb"), col("shared_days"), col("na"), col("nb"),
        expr("1000000 * shared_days div (na + nb - shared_days)")
          .as("jaccard_ppm"))
      .orderBy(col("ta"), col("tb"))
  }

  /** Degree distribution of the bipartite graph's user-day side: how
    * many distinct event types a user touches within one day,
    * histogrammed. The breadth-of-engagement complement to
    * [[typeJaccard]]; output ≤ |types| rows. */
  def degreeDistribution(events: DataFrame): DataFrame =
    incidence(events)
      .groupBy(col("user_id"), col("day")).agg(count(lit(1)).as("degree"))
      .groupBy(col("degree")).agg(count(lit(1)).as("n_user_days"))
      .orderBy(col("degree"))

  /** Community detection on the USER co-occurrence graph — synchronous
    * label propagation (Raghavan et al. 2007), made fully deterministic:
    * a fixed number of rounds, every node updates from the PREVIOUS
    * round's labels, and the update is the neighbor-majority label with
    * a total (count desc, label asc) tie-break — so both engines land
    * on identical communities with no randomness anywhere.
    *
    * The graph: users are adjacent when they share ≥ `minShared`
    * activity cells (event_type × hour). Hot cells are CAPPED at
    * `maxCellUsers` distinct users before pairing — the same
    * hot-shingle discipline as ngram_jaccard — because one viral cell
    * with u users mints u² pairs; dropping it loses no community
    * signal (a cell everyone touched distinguishes nobody) and bounds
    * the pair fan-out at cells·cap² regardless of corpus size.
    *
    * Scale shape per round: one (edge ⋈ label) shuffle on the node key
    * + one per-node window over ≤ degree distinct neighbor labels —
    * rounds are a constant, so total cost is O(rounds · |edges|).
    * Isolated users keep their own label (left join + coalesce: silence
    * is an observation, not a dropped row). */
  def labelCommunities(events: DataFrame, rounds: Int = 3,
                       maxCellUsers: Int = 64, minShared: Int = 2): DataFrame =
    stagedLabels(events, rounds, maxCellUsers, minShared)
      .select(col("node").as("user_id"), col("label").as("community"))
      .orderBy(col("user_id"))

  /** The edge set, staged once per (corpus, params) via [[graft.Stage]]:
    * [[labelCommunities]] and [[communityModularity]] are co-gated over
    * the same graph, and re-deriving the pair table (the corpus-keyed
    * cell self-join — the expensive pass) per query is exactly the
    * re-staging the IVFADC model artifact eliminated for the ANN
    * family. The read-back is also what makes the modularity consumer
    * safe: every occurrence below embeds a parquet scan, not the
    * self-join plan. */
  private def stagedPairs(events: DataFrame, maxCellUsers: Int,
                          minShared: Int): DataFrame =
    graft.Stage.parquet(events.sparkSession,
      graft.Stage.key(events, "graph_user_pairs", maxCellUsers, minShared)) {
      userPairs(events, maxCellUsers, minShared)
    }

  /** The LPA partition, staged once per (corpus, params): propagate runs
    * a single time (untruncated — the write is a single-occurrence
    * consumer, so the linear 3-round plan executes as ~4 AQE jobs; see
    * the probe note on [[propagate]]) and every consumer reads the
    * nodes-sized parquet back. NB resolve the pairs artifact BEFORE
    * entering the labels build: Stage's computeIfAbsent must not nest. */
  private def stagedLabels(events: DataFrame, rounds: Int,
                           maxCellUsers: Int, minShared: Int): DataFrame = {
    val pairs = stagedPairs(events, maxCellUsers, minShared)
    graft.Stage.parquet(events.sparkSession,
      graft.Stage.key(events, "graph_lpa_labels", rounds, maxCellUsers,
        minShared)) {
      propagate(events, pairs, rounds)
    }
  }

  /** The undirected user co-occurrence edge set (ua < ub): users
    * adjacent when they share ≥ `minShared` capped activity cells.
    * Shared base of [[labelCommunities]] and [[communityModularity]]. */
  private def userPairs(events: DataFrame, maxCellUsers: Int,
                        minShared: Int): DataFrame = {
    val inc = events.select(col("user_id"),
        concat_ws("#", col("event_type"),
          expr("CAST(unix_micros(ts) div 3600000000 AS STRING)")).as("cell"))
      .distinct()
    val coldCells = inc.groupBy(col("cell"))
      .agg(count(lit(1)).as("cu"))
      .filter(col("cu") <= maxCellUsers)
      .select(col("cell"))
    val capped = graft.Caches.track(
      inc.join(coldCells, Seq("cell"), "leftsemi"))
    capped.select(col("cell"), col("user_id").as("ua"))
      .join(capped.select(col("cell"), col("user_id").as("ub")), Seq("cell"))
      .filter(col("ua") < col("ub"))
      .groupBy(col("ua"), col("ub"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= minShared)
      .select(col("ua"), col("ub"))
  }

  /** Fixed-round synchronous LPA over a given edge set; returns
    * (node, label). Now only ever run as [[stagedLabels]]' build — a
    * single-occurrence consumer (the parquet write), so the linear
    * 3-round plan needs NO per-round lineage truncation: it executes in
    * ~4 AQE jobs, while per-round localCheckpoint actions cost more in
    * scheduling than they save (probed 0.6 s vs 4.2 s). The historical
    * hazard this file documents (a consumer embedding the iterative
    * RESULT in several sibling subtrees re-embeds the full lineage per
    * occurrence — probed at a 15 399-line physical plan with 2 495
    * exchanges) is now structurally impossible: consumers read the
    * staged artifact, never this plan. */
  private def propagate(events: DataFrame, pairs: DataFrame,
                        rounds: Int): DataFrame = {
    val sym = graft.Caches.track(
      pairs.select(col("ua").as("src"), col("ub").as("dst"))
        .unionByName(pairs.select(col("ub").as("src"), col("ua").as("dst"))))
    val nodes = graft.Caches.track(
      events.select(col("user_id").as("node")).distinct())
    var labels = nodes.select(col("node"), col("node").as("label"))
    for (_ <- 1 to rounds) {
      val counted = sym
        .join(labels.select(col("node").as("dst"),
          col("label").as("nbr_label")), Seq("dst"))
        .groupBy(col("src"), col("nbr_label"))
        .agg(count(lit(1)).as("c"))
      // argmax by (count desc, label asc) as ONE struct-max aggregate —
      // lexicographic struct ordering makes max(struct(c, −label)) the
      // majority label with the min-label tie-break, no sort window
      val won = counted
        .groupBy(col("src"))
        .agg(max(struct(col("c"), (-col("nbr_label")).as("neg"))).as("m"))
        .select(col("src").as("node"), (-col("m.neg")).as("new_label"))
      labels = nodes.join(won, Seq("node"), "left")
        .select(col("node"), coalesce(col("new_label"), col("node"))
          .as("label"))
    }
    labels
  }

  /** Newman modularity of the [[labelCommunities]] partition — the
    * "was that clustering any good" evaluation, exact:
    * Q = (4m·e_in − Σ_c d_c²) / (4m²) where m = edges, e_in = edges
    * inside a community, d_c = community degree sum. Emitted as the
    * exact BIGINT rational (q_num, q_den) PLUS a ppm headline whose
    * truncation toward zero is made explicit via sign·(1e6·|num| div
    * den) — engine-independent even where the engines' native
    * negative-division semantics differ. Q > 0 means the partition
    * beats random edge placement; NULL on an edgeless graph.
    *
    * Lane audit: q_num ≤ 4m², inside BIGINT up to m ≈ 1.5e9 edges; the
    * ppm product runs in DECIMAL(38,0)/HUGEINT regardless. Everything
    * after the shared pair table is communities-sized aggregates. */
  def communityModularity(events: DataFrame, rounds: Int = 3,
                          maxCellUsers: Int = 64,
                          minShared: Int = 2): DataFrame = {
    // Both inputs are staged artifacts shared with [[labelCommunities]]
    // (computed once per corpus, read back as parquet), so every
    // occurrence in the branches below embeds a shallow scan — the
    // plan-explosion hazard the old localCheckpoint discipline managed
    // is gone by construction, and the expensive passes (cell self-join
    // + 3 LPA rounds) never re-run for this query.
    val pairs = stagedPairs(events, maxCellUsers, minShared)
    val labels = stagedLabels(events, rounds, maxCellUsers, minShared)
    // annot: each edge with both endpoint communities — ONE pass over
    // the pair table; everything below derives from it or from labels.
    val annot = pairs
      .join(labels.select(col("node").as("ua"), col("label").as("ca")),
        Seq("ua"))
      .join(labels.select(col("node").as("ub"), col("label").as("cb")),
        Seq("ub"))
      .select(col("ca"), col("cb"))
    // ONE linear tree for all four statistics — a first attempt that
    // combined four broadcast one-row aggregates raced each other past
    // lazy caches (43 jobs / 1100 tasks re-running the pair join per
    // subtree): the union-tagged two-level aggregate answers m, e_in,
    // Σd_c², and the community count in one execution.
    //   kind=pair: one lvl1 row (lbl null) carrying m and e_in;
    //   kind=end : one lvl1 row per community, c = d_c;
    //   kind=node: one lvl1 row per community (n_comm = row count).
    val tall = annot
      .select(lit("pair").as("kind"), lit(null).cast("long").as("lbl"),
        when(col("ca") === col("cb"), 1L).otherwise(0L).as("x"))
      .unionByName(annot.select(lit("end").as("kind"),
        col("ca").as("lbl"), lit(0L).as("x")))
      .unionByName(annot.select(lit("end").as("kind"),
        col("cb").as("lbl"), lit(0L).as("x")))
      .unionByName(labels.select(lit("node").as("kind"),
        col("label").as("lbl"), lit(0L).as("x")))
    tall
      .groupBy(col("kind"), col("lbl"))
      .agg(count(lit(1)).as("c"), sum(col("x")).as("sx"))
      .agg(
        coalesce(sum(when(col("kind") === "pair", col("c"))), lit(0L))
          .as("m"),
        coalesce(sum(when(col("kind") === "pair", col("sx"))), lit(0L))
          .as("ein"),
        coalesce(sum(when(col("kind") === "end", expr("c * c"))), lit(0L))
          .as("sd2"),
        sum(when(col("kind") === "node", 1L).otherwise(0L))
          .as("n_communities"))
      .select(col("m").as("n_edges"), col("n_communities"),
        expr("4 * m * ein - sd2").as("q_num"),
        expr("4 * m * m").as("q_den"),
        when(col("m") === 0, lit(null).cast("long")).otherwise(
          signum(expr("4 * m * ein - sd2")).cast("long") *
            expr("""CAST(CAST(1000000 AS DECIMAL(38,0))
                    * abs(4 * m * ein - sd2)
                    div (CAST(4 AS DECIMAL(38,0)) * m * m) AS BIGINT)"""))
          .as("q_ppm"))
      .orderBy(col("n_edges"))
  }

  /** k-core of the user co-occurrence graph (Seidman 1983): the
    * maximal subgraph in which every surviving user still has ≥ k
    * surviving neighbors, found by the classic peeling fixpoint —
    * repeatedly delete nodes whose degree WITHIN THE REMAINDER falls
    * below k. Where [[labelCommunities]] partitions the graph, k-core
    * grades embeddedness: the densely-woven cohort that survives
    * peeling is the bot-ring/power-user candidate set a curation run
    * inspects (and, on a similarity graph, the template-family core),
    * while the peeled fringe is the long tail no pruning policy needs
    * to fear. Output: (user_id, core_degree) for members of the k-core,
    * with degree measured inside the core.
    *
    * Scale shape: the edge set is the staged pair artifact shared with
    * the LPA family (computed once per corpus); each round is two
    * hash semi-joins of the edge table against the shrinking alive set
    * plus one aggregation — never anything corpus²; rounds terminate
    * at the fixpoint (each non-final round removes ≥ 1 node, and the
    * alive frame is localCheckpoint'd per round so the iterative
    * lineage never nests). Like the CC loop, an unconverged budget is
    * an ERROR, not a result: a half-peeled "core" silently overstates
    * embeddedness. */
  def kCore(events: DataFrame, k: Int = 3, maxRounds: Int = 32,
            maxCellUsers: Int = 64, minShared: Int = 2): DataFrame = {
    // the fixpoint is an iterative trained artifact like the LPA labels
    // and the Lloyd model: staged once per (corpus, params) — consumers
    // and every bench rerun read the nodes-sized parquet back.
    // maxRounds is in the key although it can't change a SUCCESSFUL
    // result (peeling is deterministic; the budget only gates the error
    // path) so a tight-budget probe never short-circuits into an
    // artifact a generous earlier call staged.
    val pairs = stagedPairs(events, maxCellUsers, minShared)
    graft.Stage.parquet(events.sparkSession,
      graft.Stage.key(events, "k_core", k, maxRounds, maxCellUsers,
        minShared)) {
      buildKCore(pairs, k, maxRounds)
    }.orderBy("user_id")
  }

  private def buildKCore(pairs: DataFrame, k: Int,
                         maxRounds: Int): DataFrame = {
    // the loop state is the SYMMETRIC LIVE EDGE SET, not an alive-node
    // list: each round's semi-joins then run against the shrinking
    // remainder (never re-filtering the full graph), and the
    // convergence round's degree table IS the answer — no final pass.
    var cur = pairs.select(col("ua").as("src"), col("ub").as("dst"))
      .union(pairs.select(col("ub").as("src"), col("ua").as("dst")))
      .localCheckpoint()
    var curEdges = cur.count()
    var coreDeg: DataFrame = null
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val deg = cur.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("deg"))
      val alive = deg.filter(col("deg") >= k).select("node")
      val next = cur
        .join(alive.select(col("node").as("src")), Seq("src"), "leftsemi")
        .join(alive.select(col("node").as("dst")), Seq("dst"), "leftsemi")
        .localCheckpoint()
      val n = next.count()
      // next ⊆ cur by construction, so equal edge counts ⇒ equal sets
      // ⇒ no node fell below k this round: `deg ≥ k` is the fixpoint
      converged = n == curEdges
      if (converged) coreDeg = deg.filter(col("deg") >= k)
      cur = next
      curEdges = n
      round += 1
      // an emptied graph is a converged (empty) core — don't spend
      // the remaining budget confirming nothing shrinks further
      if (n == 0 && !converged) {
        converged = true
        coreDeg = deg.filter(col("deg") >= k).limit(0)
      }
    }
    if (!converged) throw new IllegalStateException(
      s"kCore(k=$k) did not reach the peeling fixpoint within " +
        s"maxRounds=$maxRounds; a partially-peeled core overstates " +
        "embeddedness. Raise maxRounds.")
    coreDeg.select(col("node").as("user_id"), col("deg").as("core_degree"))
  }

  /** k-truss of the user co-occurrence graph (Cohen 2008): the maximal
    * subgraph in which every surviving EDGE still closes ≥ k−2
    * triangles with surviving edges. Where [[kCore]] grades NODE
    * embeddedness (a star center survives k-core on degree alone),
    * k-truss demands the neighborhoods actually interlock — the
    * community-grade cohesion signal: a bot ring stamping the same
    * cells triangulates densely, a popular-hub coincidence does not.
    * Output: (user_a, user_b, support) for the truss edges, support
    * measured inside the truss.
    *
    * Scale shape: same discipline as [[kCore]] — the loop state is the
    * live undirected edge list (localCheckpoint'd per round, so the
    * iterative lineage never nests); each round enumerates the live
    * triangles ONCE via the id-oriented 2-path + closing-edge
    * semi-join (the [[triangleCount]]/[[clusteringCoeff]] wedge
    * discipline) and credits each triangle's three edges through a
    * 3-row explode — wedge-bounded work on the SHRINKING remainder,
    * never corpus², and ~4× cheaper per round than the former
    * symmetric-adjacency probe (the hot-cell cap in [[userPairs]]
    * already bounds degree skew); convergence-round supports ARE the
    * answer. An exhausted budget is an ERROR — a half-peeled truss
    * overstates cohesion. */
  def kTruss(events: DataFrame, k: Int = 3, maxRounds: Int = 32,
             maxCellUsers: Int = 64, minShared: Int = 2): DataFrame = {
    require(k >= 3, s"k-truss needs k >= 3 (got $k): below that the " +
      "support threshold is 0 and every edge trivially survives")
    // staged like kCore: the triangle-recount rounds are the most
    // expensive build in the graph family (each is |E|·avgdeg), so the
    // fixpoint is exactly the artifact a production pipeline keeps
    val pairs = stagedPairs(events, maxCellUsers, minShared)
    graft.Stage.parquet(events.sparkSession,
      graft.Stage.key(events, "k_truss", k, maxRounds, maxCellUsers,
        minShared)) {
      buildKTruss(pairs, k, maxRounds)
    }.orderBy("user_a", "user_b")
  }

  private def buildKTruss(pairs: DataFrame, k: Int,
                          maxRounds: Int): DataFrame = {
    var cur = pairs.select(col("ua"), col("ub")).localCheckpoint()
    var curEdges = cur.count()
    var truss: DataFrame = null
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      // ORIENTED triangle enumeration (VERDICT r14 #5 — the
      // triangle_count/clusteringCoeff discipline): each live triangle
      // a < b < c is produced exactly ONCE via the ordered 2-path
      // (a,b)+(b,c) and the closing-edge semi-join, then credits all
      // three of its edges through one 3-row explode. The old plan
      // probed the SYMMETRIC adjacency from every live edge —
      // Σ_e deg(ua) join rows; the oriented wedge probes only the
      // higher-id tail of the middle vertex, roughly quartering the
      // dominant per-round join. support(e) = common-neighbor count is
      // IDENTICAL (each common neighbor of e closes exactly one
      // triangle crediting e), so the fixpoint — and the staged
      // artifact hash — is unchanged; edges with zero triangles vanish
      // from the aggregate, which is exactly the k ≥ 3 peel.
      val tri = cur.as("e1")
        .join(cur.as("e2"), col("e2.ua") === col("e1.ub"))
        .join(cur.as("e3"),
          col("e3.ua") === col("e1.ua") && col("e3.ub") === col("e2.ub"),
          "leftsemi")
        .select(col("e1.ua").as("a"), col("e1.ub").as("b"),
          col("e2.ub").as("c"))
      val sup = tri
        .select(explode(array(
          struct(col("a").as("ua"), col("b").as("ub")),
          struct(col("b").as("ua"), col("c").as("ub")),
          struct(col("a").as("ua"), col("c").as("ub")))).as("e"))
        .groupBy(col("e.ua").as("ua"), col("e.ub").as("ub"))
        .agg(count(lit(1)).as("support"))
      val next = sup.filter(col("support") >= k - 2).localCheckpoint()
      val n = next.count()
      // next ⊆ cur, so equal counts ⇒ equal sets ⇒ every edge's
      // support was measured inside the surviving set: the fixpoint
      converged = n == curEdges
      if (converged) truss = next
      cur = next.select(col("ua"), col("ub"))
      curEdges = n
      round += 1
      if (n == 0 && !converged) { converged = true; truss = next }
    }
    if (!converged) throw new IllegalStateException(
      s"kTruss(k=$k) did not reach the peeling fixpoint within " +
        s"maxRounds=$maxRounds; a partially-peeled truss overstates " +
        "cohesion. Raise maxRounds.")
    truss.select(col("ua").as("user_a"), col("ub").as("user_b"),
      col("support"))
  }

  /** Per-node clustering coefficient of the user co-occurrence graph
    * (Watts–Strogatz): how much of each user's neighborhood is itself
    * interconnected — 2·triangles(v) / (deg(v)·(deg(v)−1)) in ppm.
    * The local texture statistic between [[degreeDistribution]]
    * (volume) and [[kTruss]] (global cohesion): a coordinated ring
    * scores near 1e6 (everyone's contacts know each other), an
    * organic hub scores near 0 — and the DIP of coefficient with
    * rising degree is the classic hierarchical-structure signature.
    *
    * Exact integers throughout: triangles enumerated once via the
    * oriented 2-path + closing-edge join over the staged (ua < ub)
    * edge list (each triangle a < b < c produced exactly once, every
    * corner credited via one explode — |E|·avgdeg work, the
    * [[kTruss]] round shape, run ONCE), degrees from the symmetric
    * closure, the ratio in BIGINT ppm with deg < 2 NULL (undefined,
    * not zero). */
  def clusteringCoeff(events: DataFrame, maxCellUsers: Int = 64,
                      minShared: Int = 2): DataFrame = {
    val pairs = stagedPairs(events, maxCellUsers, minShared)
    val deg = pairs.select(col("ua").as("user_id"))
      .union(pairs.select(col("ub").as("user_id")))
      .groupBy("user_id").agg(count(lit(1)).as("degree"))
    val tri = pairs.as("e1")
      .join(pairs.as("e2"), col("e2.ua") === col("e1.ub"))
      .join(pairs.as("e3"),
        col("e3.ua") === col("e1.ua") && col("e3.ub") === col("e2.ub"),
        "leftsemi")
      .select(col("e1.ua").as("x"), col("e1.ub").as("y"),
        col("e2.ub").as("z"))
    val perNode = tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("user_id"))
      .groupBy("user_id").agg(count(lit(1)).as("n_triangles"))
    deg.join(perNode, Seq("user_id"), "left")
      .select(col("user_id"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("degree") >= 2,
          expr("""(2000000 * coalesce(n_triangles, 0))
                  div (degree * (degree - 1))"""))
          .as("coeff_ppm"))
      .orderBy("user_id")
  }

  /** Link prediction over the staged co-occurrence graph (Liben-Nowell
    * & Kleinberg 2003): score NON-adjacent pairs by shared
    * neighborhood — common-neighbor count, Adamic-Adar (a rare shared
    * friend is stronger evidence than a hub), and neighborhood
    * Jaccard. AA's 1/log(deg z) runs in the whole-bit lane
    * 1e6 div (length(bin(deg_z)) − 1) — the unigram_surprisal
    * floor-log2 discipline; a wedge hinge has both endpoints as
    * neighbors, so deg_z ≥ 2 and the divisor is ≥ 1 (exact both
    * engines).
    *
    * Shape: degrees pre-join onto the symmetric edge list ONCE
    * (node-sized), so the single hinge self-join emits each wedge
    * a<b already carrying deg_z — the join partitions on z, no second
    * exchange for the weight; existing edges leave via anti-join
    * AFTER the (a,b) aggregate (candidate-pairs-sized, never
    * wedge-sized); Jaccard's |N(a)∪N(b)| = deg_a + deg_b − cn needs
    * only two node-sized joins; top-k by (cn, aa, pair) is a
    * TakeOrderedAndProject, never a global sort. Wedge fan-out is
    * deg² at the hinge, bounded by the staged graph's maxCellUsers
    * cap — the same bound every triangle/truss consumer rides. */
  def linkPredict(events: DataFrame, topK: Int = 20,
                  maxCellUsers: Int = 64, minShared: Int = 2): DataFrame =
    linkPredictFromPairs(
      stagedPairs(events, maxCellUsers, minShared), topK)

  /** [[linkPredict]] over an explicit undirected (ua < ub) edge frame —
    * `private[graft]` so the spec drives hand-checkable toy graphs.
    *
    * `maxHinge` caps the degree of the wedge HINGE (the shared
    * neighbor): the hinge self-join fans out deg(z)² per hinge, so one
    * unfiltered hub turns the wedge table quadratic (measured 35 s at
    * sf0.1 uncapped vs 1.0 s capped — and at 100 TB the uncapped form
    * simply dies). The cap is also the statistically honest bound:
    * a super-hub shared by everyone carries ~zero Adamic-Adar weight
    * by construction, so dropping hubs ABOVE the cap removes the
    * least-informative evidence first. Contract: cn/aa count only
    * common neighbors of degree ≤ maxHinge (documented; the twin
    * applies the identical cap); Jaccard denominators keep FULL
    * degrees. */
  private[graft] def linkPredictFromPairs(pairs: DataFrame,
                                          topK: Int,
                                          maxHinge: Int = 64): DataFrame = {
    val sym = pairs.select(col("ua").as("z"), col("ub").as("n"))
      .unionByName(pairs.select(col("ub").as("z"), col("ua").as("n")))
    val deg = sym.groupBy(col("z")).agg(count(lit(1)).as("deg"))
    val symd = sym.join(deg.filter(col("deg") <= maxHinge), Seq("z"))
    val cand = symd.select(col("z"), col("n").as("a"), col("deg"))
      .join(symd.select(col("z"), col("n").as("b")), Seq("z"))
      .filter(col("a") < col("b"))
      .groupBy(col("a").as("ua"), col("b").as("ub"))
      .agg(count(lit(1)).as("cn"),
        sum(expr("1000000 div (length(bin(deg)) - 1)")).as("aa_micro"))
      .join(pairs, Seq("ua", "ub"), "leftanti")
    cand
      .join(deg.select(col("z").as("ua"), col("deg").as("deg_a")),
        Seq("ua"))
      .join(deg.select(col("z").as("ub"), col("deg").as("deg_b")),
        Seq("ub"))
      .select(col("ua"), col("ub"), col("cn"), col("aa_micro"),
        expr("(1000000 * cn) div (deg_a + deg_b - cn)").as("jaccard_ppm"))
      .orderBy(col("cn").desc, col("aa_micro").desc, col("ua"), col("ub"))
      .limit(topK)
  }

  /** Connected components of the user co-occurrence graph: every user
    * labeled with the MIN user id reachable through shared-activity
    * edges — singletons (users with no qualifying co-occurrence) are
    * their own component. The population-structure complement of
    * [[labelCommunities]]: LPA splits a connected mass into dense
    * regions, components answer the prior question of what is connected
    * AT ALL — the unit an incident/abuse investigation quarantines, and
    * the frame [[componentSizes]] turns into the giant-component audit.
    *
    * Scale shape: the edge set is the staged pair artifact (shared with
    * the whole graph family); labels come from
    * [[Dedup.connectedComponentsStar]]'s O(log n)-round large/small-star
    * alternation (diameter-proof — a min-label propagate would pay
    * path-length rounds on chains); the labeled frame is STAGED once
    * per corpus so both gated consumers read a nodes-sized artifact. */
  def userComponents(events: DataFrame, maxCellUsers: Int = 64,
                     minShared: Int = 2): DataFrame = {
    val labels = stagedComponents(events, maxCellUsers, minShared)
    labels.select(col("user_id"), col("component_id"))
      .orderBy("user_id")
  }

  /** The component-size histogram off the same staged component frame:
    * (component_size, n_components) — the giant-component/fragmentation
    * audit read before trusting any per-community statistic. Two
    * nested aggregates; nothing user-sized survives the first. */
  def componentSizes(events: DataFrame, maxCellUsers: Int = 64,
                     minShared: Int = 2): DataFrame =
    stagedComponents(events, maxCellUsers, minShared)
      .groupBy(col("component_id"))
      .agg(count(lit(1)).as("component_size"))
      .groupBy(col("component_size"))
      .agg(count(lit(1)).as("n_components"))
      .orderBy("component_size")

  private def stagedComponents(events: DataFrame, maxCellUsers: Int,
                               minShared: Int): DataFrame = {
    val pairs = stagedPairs(events, maxCellUsers, minShared)
    graft.Stage.parquet(events.sparkSession,
      graft.Stage.key(events, "graph_components", maxCellUsers,
        minShared)) {
      val cc = Dedup.connectedComponentsStar(
        pairs.select(col("ua").as("doc_a"), col("ub").as("doc_b")))
      events.select(col("user_id")).distinct()
        .join(cc, col("user_id") === col("doc_id"), "left")
        .select(col("user_id"),
          coalesce(col("cluster_id"), col("user_id")).as("component_id"))
    }
  }

  /** Degree assortativity of the user co-occurrence graph (Newman
    * 2002): the Pearson correlation between the degrees at the two
    * ends of an edge, over BOTH orientations of every undirected edge
    * (the standard estimator — the (x, y) multiset is then symmetric,
    * so the two marginals coincide and ONE variance lane serves both).
    * Positive = hubs attach to hubs (a social core), negative = hubs
    * attach to leaves (a broadcast/star topology — the bot-farm
    * signature where one driver account touches many throwaways).
    *
    * Integer discipline ([[graft.operators.Stats.typeCorr]]'s): the
    * correlation never leaves exact arithmetic — numerator n·Σxy−Σx·Σy
    * and variance n·Σxx−(Σx)² in DECIMAL(38,0) lanes (Σ deg² at 100 TB
    * outgrows a 64-bit product), reported as the sign-explicit squared
    * correlation in ppm. Scale shape: one degree aggregate off the
    * staged edge artifact, one edges-sized join to annotate endpoint
    * degrees (declared plain — the degree side is nodes-sized and
    * Catalyst broadcasts it when it fits), one 1-row aggregate. */
  def degreeAssortativity(events: DataFrame, maxCellUsers: Int = 64,
                          minShared: Int = 2): DataFrame = {
    val pairs = stagedPairs(events, maxCellUsers, minShared)
    val sym = pairs.select(col("ua").as("src"), col("ub").as("dst"))
      .union(pairs.select(col("ub").as("src"), col("ua").as("dst")))
    val deg = sym.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
    sym
      .join(deg.select(col("node").as("src"), col("deg").as("x")), "src")
      .join(deg.select(col("node").as("dst"), col("deg").as("y")), "dst")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"))
      .select(col("n").as("n_edges"),
        expr("""CAST(n AS DECIMAL(38,0)) * sxy -
                CAST(sx AS DECIMAL(38,0)) * sx""").as("num"),
        expr("""CAST(n AS DECIMAL(38,0)) * sxx -
                CAST(sx AS DECIMAL(38,0)) * sx""").as("varr"))
      // the decimal lanes stay internal: the reported quotient is
      // ppm-bounded BIGINT, the oracle-portable face
      .select(col("n_edges"),
        when(col("varr") > 0,
          when(col("num") >= 0, lit(1L)).otherwise(lit(-1L)) *
            expr("""(CAST(1000000 AS DECIMAL(38,0)) * num * num)
                    div (varr * varr)""").cast("long"))
          .as("assort2_signed_ppm"))
      // 1 row, but the driver hash is row-order-sensitive and the
      // VerifyOrderSpec guard demands a liftable top-level sort
      .orderBy("n_edges")
  }

  /** Sampled Brandes betweenness centrality (Brandes 2001 / the
    * Brandes-Pich sampled estimator) over the staged co-occurrence
    * graph: the bridge/broker score degree and k-core structurally miss
    * — a low-degree user connecting two dense communities outranks
    * every hub inside either. Exact all-pairs betweenness is O(V·E);
    * the standard estimator runs Brandes' single-source stage from a
    * SAMPLE of sources, here a deterministic salted-hash sample
    * (lowest md5 lanes over 'btw:'||node — reproducible in any engine,
    * no RNG), and reports the un-normalized sampled sum.
    *
    * Per source the two Brandes passes, both level-synchronous joins:
    *  - forward: multi-source BFS carrying (s, node, σ) — each level is
    *    ONE frontier⋈edges hash join + ONE (s,node) path-count
    *    aggregate + ONE anti-join against the visited set (the k_core
    *    per-round shape; all sources advance in the same three jobs);
    *  - backward: dependency accumulation level by level,
    *    δ(v) = Σ_{w∈succ(v)} σ(v)·(1+δ(w))/σ(w), as (s,node)-keyed
    *    aggregates over the level⋈edges⋈level+1 predecessor join.
    * Depth is a FIXED unroll (`maxDepth`), not a convergence probe —
    * pairs farther than maxDepth apart contribute nothing, which is the
    * documented truncation (and what makes the DuckDB twin an identical
    * fixed unroll); fixture diameters sit well inside the default.
    *
    * Engine-exact arithmetic: σ is an exact BIGINT path count
    * (associative integer sums); the dependency ratio is quantized at
    * each level — δ_micro(v) = Σ (σ_v·(1e6+δ_micro(w))) div σ_w, all
    * BIGINT, truncating division — so the recursion is integer
    * throughout and any aggregation order agrees. Lane audit: the
    * product needs σ_v·(1e6+δ) < 2⁶³ — path counts within a bounded
    * depth of a degree-capped graph ([[userPairs]]' hot-cell cap) keep
    * σ far below 2³⁰ at any corpus scale; past that, drop the 1e6
    * quantum to 1e4 (the KMeans fixed-point trade). State is
    * O(sources·V) rows of four BIGINTs, localCheckpoint'd per level
    * (the iterative-lineage discipline); nothing corpus² ever
    * materializes. */
  def betweennessTopK(events: DataFrame, nSources: Int = 8,
                      maxDepth: Int = 4, topK: Int = 20,
                      maxCellUsers: Int = 64,
                      minShared: Int = 2): DataFrame = {
    val pairs = stagedPairs(events, maxCellUsers, minShared)
    graft.Stage.parquet(events.sparkSession,
      graft.Stage.key(events, "betweenness", nSources, maxDepth,
        maxCellUsers, minShared)) {
      betweennessFromPairs(pairs, nSources, maxDepth)
    }.orderBy(col("betweenness_micro").desc, col("user_id")).limit(topK)
  }

  /** The Brandes forward+backward stages over an explicit (ua, ub)
    * edge frame — `private[graft]` so the spec drives hand-checkable
    * graphs (path, diamond) without the events→cells derivation. */
  private[graft] def betweennessFromPairs(pairs: DataFrame, nSources: Int,
                                          maxDepth: Int): DataFrame = {
    val sym = graft.Caches.track(
      pairs.select(col("ua").as("src"), col("ub").as("dst"))
        .union(pairs.select(col("ub").as("src"), col("ua").as("dst"))))
    val srcs = sym.select(col("src").as("node")).distinct()
      .orderBy(graft.functions.PortableHash.hash32(
        concat(lit("btw:"), col("node").cast("string"))), col("node"))
      .limit(nSources)
      .select(col("node").as("s"))
    val f0 = srcs.select(col("s"), col("s").as("node"), lit(1L).as("sigma"))
      .localCheckpoint()
    val levels = scala.collection.mutable.ArrayBuffer(f0)
    var visited = f0.select("s", "node").localCheckpoint()
    for (_ <- 1 to maxDepth) {
      val prev = levels.last
      val nxt = prev.join(sym, prev("node") === sym("src"))
        .select(col("s"), col("dst").as("node"), col("sigma"))
        .groupBy("s", "node").agg(sum(col("sigma")).as("sigma"))
        .join(visited, Seq("s", "node"), "left_anti")
        .localCheckpoint()
      levels += nxt
      visited = visited.union(nxt.select("s", "node")).localCheckpoint()
    }
    // backward: deepest level has no successors within the horizon
    var delta = levels(maxDepth)
      .select(col("s"), col("node"), lit(0L).as("delta"))
      .localCheckpoint()
    val deltas = scala.collection.mutable.ArrayBuffer(delta)
    for (l <- (maxDepth - 1) to 1 by -1) {
      val v = levels(l)
      val succ = levels(l + 1)
        .select(col("s"), col("node").as("w"), col("sigma").as("wsigma"))
        .join(delta.select(col("s"), col("node").as("w"), col("delta")),
          Seq("s", "w"))
      val contrib = v.join(sym, v("node") === sym("src"))
        .select(col("s"), col("node"), col("sigma"), col("dst").as("w"))
        .join(succ, Seq("s", "w"))
        .select(col("s"), col("node"),
          expr("(sigma * (1000000 + delta)) div wsigma").as("c"))
        .groupBy("s", "node").agg(sum(col("c")).as("cdelta"))
      delta = v.select(col("s"), col("node"))
        .join(contrib, Seq("s", "node"), "left")
        .select(col("s"), col("node"),
          coalesce(col("cdelta"), lit(0L)).as("delta"))
        .localCheckpoint()
      deltas += delta
    }
    deltas.map(_.select(col("node"), col("delta")))
      .reduce(_ union _)
      .groupBy("node").agg(sum(col("delta")).as("betweenness_micro"))
      .select(col("node").as("user_id"), col("betweenness_micro"))
  }

  /** First-visit BFS level table (s, node, level) from the salted
    * source sample — the shared forward pass of the distance-based
    * centrality family ([[harmonicTopK]], [[graphReach]]). Identical
    * level-synchronous shape to [[betweennessFromPairs]]' forward
    * stage minus the path counts: per level ONE frontier⋈edges hash
    * join + ONE distinct + ONE anti-join against the visited set, each
    * level localCheckpoint'd (the iterative-lineage discipline). Depth
    * is the same FIXED unroll, so the DuckDB twin is the identical
    * computation. State ≤ sources·V rows of three BIGINTs. */
  private[graft] def bfsLevelsFromPairs(pairs: DataFrame, nSources: Int,
                                        maxDepth: Int): DataFrame = {
    val sym = graft.Caches.track(
      pairs.select(col("ua").as("src"), col("ub").as("dst"))
        .union(pairs.select(col("ub").as("src"), col("ua").as("dst"))))
    val srcs = sym.select(col("src").as("node")).distinct()
      .orderBy(graft.functions.PortableHash.hash32(
        concat(lit("bfs:"), col("node").cast("string"))), col("node"))
      .limit(nSources)
      .select(col("node").as("s"))
    val f0 = srcs.select(col("s"), col("s").as("node"),
      lit(0L).as("level")).localCheckpoint()
    val levels = scala.collection.mutable.ArrayBuffer(f0)
    var visited = f0.select("s", "node").localCheckpoint()
    for (l <- 1 to maxDepth) {
      val prev = levels.last
      val nxt = prev.join(sym, prev("node") === sym("src"))
        .select(col("s"), col("dst").as("node")).distinct()
        .join(visited, Seq("s", "node"), "left_anti")
        .select(col("s"), col("node"), lit(l.toLong).as("level"))
        .localCheckpoint()
      levels += nxt
      visited = visited.union(nxt.select("s", "node")).localCheckpoint()
    }
    levels.reduce(_ union _)
  }

  /** The BFS level table staged once per (corpus, params):
    * [[harmonicTopK]] and [[graphReach]] are co-gated over the same
    * sampled forward pass, and the level build (maxDepth shuffle
    * rounds) is exactly the artifact class [[graft.Stage]] exists for.
    * Pairs resolve BEFORE the levels build — Stage must not nest. */
  private def stagedBfsLevels(events: DataFrame, nSources: Int,
                              maxDepth: Int, maxCellUsers: Int,
                              minShared: Int): DataFrame = {
    val pairs = stagedPairs(events, maxCellUsers, minShared)
    graft.Stage.parquet(events.sparkSession,
      graft.Stage.key(events, "graph_bfs_levels", nSources, maxDepth,
        maxCellUsers, minShared)) {
      bfsLevelsFromPairs(pairs, nSources, maxDepth)
    }
  }

  /** Sampled harmonic centrality (Marchiori & Latora 2000; the
    * Boldi-Vigna axiomatic pick among closeness variants because it
    * handles disconnection natively): H(v) = Σ_s 1/d(s,v) over the
    * salted source sample, unreachable pairs contributing zero instead
    * of poisoning the mean the way classic closeness does. Integer
    * lanes: each level-l visit contributes 1e6 div l micro-units, so
    * the per-node sum is an exact BIGINT in any aggregation order.
    * Cost beyond the staged BFS artifact: one node-keyed aggregate of
    * the sources·V level table + TakeOrdered — no new corpus pass. */
  def harmonicTopK(events: DataFrame, nSources: Int = 8,
                   maxDepth: Int = 4, topK: Int = 20,
                   maxCellUsers: Int = 64, minShared: Int = 2): DataFrame =
    harmonicFromLevels(
      stagedBfsLevels(events, nSources, maxDepth, maxCellUsers, minShared),
      topK)

  /** The harmonic aggregation over an explicit level table —
    * `private[graft]` so the spec hand-checks path/star graphs. */
  private[graft] def harmonicFromLevels(lv: DataFrame,
                                        topK: Int): DataFrame =
    lv.filter(col("level") >= 1)
      .groupBy(col("node"))
      .agg(sum(expr("1000000 div level")).cast("long").as("harmonic_micro"))
      .select(col("node").as("user_id"), col("harmonic_micro"))
      .orderBy(col("harmonic_micro").desc, col("user_id"))
      .limit(topK)

  /** Sampled eccentricity — per sampled source, how deep its BFS
    * actually ran (capped at maxDepth: the documented truncation, same
    * contract as the whole distance family) and how many nodes it
    * reached: the per-source complement of [[graphReach]]'s aggregate
    * curve, and the standard radius/diameter lower-bound estimator
    * (max over sampled eccentricities ≤ diameter). Pure read-back of
    * the SHARED staged BFS-levels artifact — one |sources|-bounded
    * aggregate, no new graph pass. */
  def eccentricity(events: DataFrame, nSources: Int = 8,
                   maxDepth: Int = 4, maxCellUsers: Int = 64,
                   minShared: Int = 2): DataFrame =
    eccFromLevels(
      stagedBfsLevels(events, nSources, maxDepth, maxCellUsers, minShared))

  private[graft] def eccFromLevels(lv: DataFrame): DataFrame =
    lv.groupBy(col("s").as("source_node"))
      .agg(max(col("level")).as("ecc_capped"),
        count(lit(1)).as("n_reached"))
      .orderBy("source_node")

  /** Neighborhood function / effective-diameter curve (the exact
    * sampled counterpart of HyperANF, Boldi-Rosa-Vigna 2011): per BFS
    * level, how many (source, node) pairs lie within distance l, as a
    * count, a running cumulative, and a reach fraction in ppm of the
    * sources × graph-nodes denominator. The level table is the staged
    * artifact; the per-level aggregate is maxDepth+1 rows, so the
    * cumulative window's single-task sort is an aggregate-bounded
    * frame (the weekly_profile class), not a corpus sort. */
  def graphReach(events: DataFrame, nSources: Int = 8, maxDepth: Int = 4,
                 maxCellUsers: Int = 64, minShared: Int = 2): DataFrame =
    reachFromLevels(
      stagedBfsLevels(events, nSources, maxDepth, maxCellUsers, minShared),
      stagedPairs(events, maxCellUsers, minShared))

  /** The reach curve over explicit level/pair tables — `private[graft]`
    * for the hand-checkable-graph specs. */
  private[graft] def reachFromLevels(lv: DataFrame,
                                     pairs: DataFrame): DataFrame = {
    val nodes = pairs.select(col("ua").as("node"))
      .union(pairs.select(col("ub").as("node"))).distinct()
    val totals = lv.filter(col("level") === 0)
      .agg(count(lit(1)).as("n_sources"))
      .crossJoin(broadcast(nodes.agg(count(lit(1)).as("n_nodes"))))
    lv.groupBy(col("level"))
      .agg(count(lit(1)).as("pairs_at_level"))
      .withColumn("cum_pairs",
        sum(col("pairs_at_level")).over(Window.orderBy(col("level"))))
      .crossJoin(broadcast(totals))
      .select(col("level"), col("pairs_at_level"), col("cum_pairs"),
        expr("(1000000 * cum_pairs) div (n_sources * n_nodes)")
          .as("reach_ppm"))
      .orderBy(col("level"))
  }
}
