package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Density-based clustering (DBSCAN, Ester et al. KDD 1996) over the
  * LSH-blocked cosine neighbor graph — the density complement to the
  * centroid family in [[KMeans]]: clusters are maximal chains of
  * "core" points (≥ `minPts` ε-neighbors) plus the "border" points
  * they absorb, and everything else is "noise". The curation read: the
  * noise set IS the outlier list a centroid method can't give you
  * (k-means assigns every point somewhere), and density clusters of a
  * near-dup-grade ε are template families — boilerplate docs stamped
  * from one mold — which is exactly the structure SemDeDup-style
  * pruning wants surfaced at corpus scale.
  *
  * ε-neighborhood definition (shared verbatim with
  * [[Similarity.nearDupPairs]], whose candidate generation this
  * composes): two vectors are neighbors iff they land in the same
  * hyperplane-LSH bucket AND exact cosine ≥ minSim. Blocking is part
  * of the OPERATOR CONTRACT, not an approximation to hide: at 100 TB
  * the unblocked ε-graph is a quadratic object nobody materializes,
  * so the deployable semantics are "DBSCAN over the blocked graph" —
  * the oracle twin runs the identical definition, so the gate is
  * exact, and recall is bought the measured way (more/banded tables,
  * the [[Similarity.nearDupPairsBanded]] dial), never by all-pairs.
  *
  * Scale shape: candidates come from the bucket equi-join (hash
  * shuffle on bucket id, never cartesian — the hot-bucket hazard is
  * the same one the LSH family already documents); degrees and the
  * core set are one aggregation over the pair list; cluster ids are
  * min-label connected components over the CORE-CORE subgraph only
  * (the pruned graph a density run actually propagates through —
  * border points never conduct density, per the original paper), via
  * the O(log n)-round large/small-star loop
  * ([[Dedup.connectedComponentsStar]] — the ε-graph at a loose ε grows
  * long chains, where min-label propagation would pay diameter
  * rounds); border points attach map-side (edge ⋈ core-labels, one
  * aggregate). The finished per-point label frame is STAGED once per
  * (corpus, ε, minPts, planes) — [[dbscan]] and [[dbscanStats]] are
  * co-gated consumers of one density model, the [[graft.Stage]]
  * pattern every trained-model family here follows — and the output is
  * one row per vector, a left-join projection of the corpus.
  */
object Density {

  /** 3 planes → 8 buckets: at near-dup ε the bucket count trades
    * candidate volume against blocked recall exactly like
    * [[Similarity.nearDupPlanes]]'s 256 — density neighborhoods use a
    * LOOSER ε than near-dup identity, so the default blocks coarser to
    * keep ε-neighbor recall high while still never joining all-pairs. */
  val defaultPlanes = 3

  private def buildLabels(emb: DataFrame, minSimMicro: Long,
                          minPts: Int, nPlanes: Int): DataFrame = {
    val ps = Similarity.planes(nPlanes)
    val pairs = graft.Caches.track(
      Similarity.nearDupPairs(emb, minSimMicro, ps)
        .select(col("vec_a"), col("vec_b")))
    val sym = pairs.select(col("vec_a").as("src"), col("vec_b").as("dst"))
      .union(pairs.select(col("vec_b").as("src"), col("vec_a").as("dst")))
    val deg = graft.Caches.track(
      sym.groupBy(col("src").as("vec_id"))
        .agg(count(lit(1)).as("n_neighbors")))
    val core = graft.Caches.track(
      deg.filter(col("n_neighbors") >= minPts).select("vec_id"))
    // density conducts through core points only: CC over the core-core
    // subgraph; an isolated core (all its neighbors are border) is its
    // own singleton cluster via the coalesce.
    val coreEdges = pairs
      .join(core.select(col("vec_id").as("vec_a")), Seq("vec_a"), "leftsemi")
      .join(core.select(col("vec_id").as("vec_b")), Seq("vec_b"), "leftsemi")
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    val cc = Dedup.connectedComponentsStar(coreEdges)
    val coreLbl = graft.Caches.track(
      core.join(cc, core("vec_id") === cc("doc_id"), "left")
        .select(core("vec_id"),
          coalesce(col("cluster_id"), core("vec_id")).as("cluster_id")))
    // border = non-core adjacent to ≥1 core; deterministic attachment:
    // the MIN cluster id over its core neighbors
    val borderLbl = sym
      .join(coreLbl.select(col("vec_id").as("dst"),
        col("cluster_id").as("cl")), "dst")
      .join(coreLbl.select(col("vec_id").as("src")), Seq("src"), "leftanti")
      .groupBy(col("src").as("vec_id"))
      .agg(min(col("cl")).as("cluster_id"))
    emb.select(col("vec_id"))
      .join(deg, Seq("vec_id"), "left")
      .join(coreLbl.select(col("vec_id"), col("cluster_id").as("__ccl")),
        Seq("vec_id"), "left")
      .join(borderLbl.select(col("vec_id"), col("cluster_id").as("__bcl")),
        Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("n_neighbors"), lit(0L)).as("n_neighbors"),
        when(col("__ccl").isNotNull, lit("core"))
          .when(col("__bcl").isNotNull, lit("border"))
          .otherwise(lit("noise")).as("role"),
        coalesce(col("__ccl"), col("__bcl")).as("cluster_id"))
  }

  /** Per-point DBSCAN labels: (vec_id, n_neighbors, role ∈
    * {core, border, noise}, cluster_id — min vec_id of the density
    * component, NULL for noise). Staged once per (corpus, parameters);
    * consumers read the artifact back. */
  def dbscan(emb: DataFrame, minSimMicro: Long = 250000, minPts: Int = 3,
             nPlanes: Int = defaultPlanes): DataFrame =
    if (emb.isStreaming) buildLabels(emb, minSimMicro, minPts, nPlanes)
    else graft.Stage.parquet(emb.sparkSession,
      graft.Stage.key(emb, "dbscan_labels", minSimMicro, minPts, nPlanes)) {
      buildLabels(emb, minSimMicro, minPts, nPlanes)
    }

  /** Adjusted Rand Index between two labelings of the same id space
    * (Hubert & Arabie 1985) — chance-corrected pair-counting
    * agreement, EXACT: with doubled binomials I2 = Σ n_ij(n_ij−1),
    * A2/B2 the same over the two marginals and N2 = n(n−1),
    * ARI = 2(I2·N2 − A2·B2) / (N2·(A2+B2) − 2·A2·B2) — every term an
    * integer, combined in DECIMAL(38,0)/HUGEINT lanes, reported as
    * the sign-explicit ppm (NULL when the denominator degenerates:
    * both partitions all-singleton or both one cluster). Scale shape:
    * one id-keyed join, one contingency aggregate (≤ |clusters_a| ×
    * |clusters_b| rows), marginal folds off the contingency — nothing
    * corpus-sized past the first groupBy. */
  def adjustedRand(a: DataFrame, b: DataFrame): DataFrame = {
    val ct = graft.Caches.track(
      a.join(b, "vec_id").groupBy("la", "lb")
        .agg(count(lit(1)).as("nij")))
    val i2n = ct.agg(sum(expr("nij * (nij - 1)")).as("i2"),
      sum(col("nij")).as("n"))
    val a2 = ct.groupBy("la").agg(sum(col("nij")).as("c"))
      .agg(sum(expr("c * (c - 1)")).as("a2"))
    val b2 = ct.groupBy("lb").agg(sum(col("nij")).as("c"))
      .agg(sum(expr("c * (c - 1)")).as("b2"))
    i2n.crossJoin(broadcast(a2)).crossJoin(broadcast(b2))
      .select(col("n").as("n_points"),
        expr("""CAST(i2 AS DECIMAL(38,0)) * (CAST(n AS DECIMAL(38,0))
                * (n - 1)) - CAST(a2 AS DECIMAL(38,0)) * b2""")
          .as("half_num"),
        expr("""CAST(n AS DECIMAL(38,0)) * (n - 1) * (CAST(a2 AS
                DECIMAL(38,0)) + b2) - 2 * CAST(a2 AS DECIMAL(38,0))
                * b2""").as("den"))
      .select(col("n_points"),
        when(col("den") > 0,
          when(col("half_num") >= 0, lit(1L)).otherwise(lit(-1L)) *
            expr("""(CAST(2000000 AS DECIMAL(38,0)) * abs(half_num))
                    div den""").cast("long"))
          .as("ari_signed_ppm"))
      .orderBy("n_points")
  }

  /** The cross-family sanity audit: ARI between the STAGED density
    * labels (noise points as their own singletons — the standard
    * treatment, keyed −(vec_id+1) so they can never collide with a
    * real min-id label) and the STAGED Lloyd assignment. High
    * agreement means the corpus has real block structure both methods
    * see; near-zero means at least one partition is carving noise —
    * read it before trusting either clustering downstream. Pure
    * composition of two artifacts. */
  def ariVsKmeans(emb: DataFrame, minSimMicro: Long = 250000,
                  minPts: Int = 3, nPlanes: Int = defaultPlanes,
                  k: Int = 8, iters: Int = 2): DataFrame = {
    val da = dbscan(emb, minSimMicro, minPts, nPlanes)
      .select(col("vec_id"),
        coalesce(col("cluster_id"), col("vec_id") * -1 - 1).as("la"))
    val kb = KMeans.fit(emb, k, iters)
      .select(col("vec_id"), col("cluster").as("lb"))
    adjustedRand(da, kb)
  }

  /** The density dashboard [[dbscan]] feeds a curation run: per-cluster
    * sizes split core/border, plus ONE noise row (cluster_id = −1 so
    * the sort key is never NULL across engines). Aggregate-on-aggregate
    * over the staged per-point labels — nothing corpus-sized rides
    * past the groupBy. */
  def dbscanStats(emb: DataFrame, minSimMicro: Long = 250000,
                  minPts: Int = 3, nPlanes: Int = defaultPlanes)
      : DataFrame =
    dbscan(emb, minSimMicro, minPts, nPlanes)
      .select(coalesce(col("cluster_id"), lit(-1L)).as("cluster_id"),
        col("role"))
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_points"),
        sum(when(col("role") === "core", 1L).otherwise(0L)).as("n_core"),
        sum(when(col("role") === "border", 1L).otherwise(0L)).as("n_border"))
}
