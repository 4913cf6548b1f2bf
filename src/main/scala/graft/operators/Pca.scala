package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA (top principal component) WITHOUT materializing the
  * covariance matrix — the spectral half of embedding-space curation
  * (projection outliers are the classic "off-manifold junk" detector
  * next to [[KMeans.clusterOutliers]]' cluster-distance view, and the
  * top component is the first thing an embedding-drift audit looks at).
  *
  * Algorithm: power iteration on the centered second moment
  * C = Σ_v (v−μ)(v−μ)ᵀ, but C is never built — each iteration uses the
  * identity C·w = Σ_v s_v·(v−μ) with s_v = (v−μ)·w, so one pass
  * computes the per-vector scalar s_v (a codegen'd sequential-fold dot
  * against the broadcast 1-row w) and folds Σ s_v·v into `dim` lane
  * sums. Centering rides the same linearity: s_v = v·w − μ·w and
  * Σ s_v·(v−μ) = Σ s_v·v − μ·Σ s_v, so the raw corpus is read as-is —
  * no centered copy, no d×d anything. Per iteration: ONE broadcast +
  * ONE `dim`-lane aggregate over the corpus; at 100 TB that is the
  * same shape as a Lloyd round with k=1.
  *
  * Determinism (the oracle contract): every corpus-sized float sum is
  * fixed-point — contributions quantize to floor(x·1e6) BIGINT lanes
  * (associative, any combine order — the KMeans.updateCentroids
  * discipline) — and every remaining double op (mean reconstruction,
  * the s_v dot, normalization) is a fixed-order sequential fold or a
  * single correctly-rounded IEEE op, identical in both engines. Init
  * is the deterministic e₁ basis vector; iterations are a fixed count,
  * not a convergence test. The model (w, λ-estimate, μ) is staged once
  * per (corpus, iters) via [[graft.Stage]] and shared by the component
  * dump and the projection/outlier queries. */
object Pca {

  val dim: Int = KMeans.dim

  private def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.DotF64Expr(a, b)

  /** One row: (w array — unit top component, nrm — ‖C·w‖ of the last
    * round (the eigenvalue estimate, since ‖C·w‖ → λ‖w‖), mu array).
    * `private[operators]`: [[KMeans.opqEval]] builds its learned
    * Householder rotation candidate from this model. */
  private[operators] def model(emb: DataFrame, iters: Int): DataFrame = {
    val spark = emb.sparkSession
    val d = graft.Stage.dir(
      graft.Stage.key(emb, "pca_power", iters)) { dir =>
      val vecs = graft.Caches.track(emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v")))
      // fixed-point corpus mean (the updateCentroids lane discipline)
      val muSums = (0 until dim).map(j =>
        sum(floor(element_at(col("v"), j + 1) * 1000000L)).as(s"__s$j"))
      val mu = graft.Caches.track(vecs
        .agg(count(lit(1)).as("__n"), muSums: _*)
        .select(array((0 until dim).map(j =>
          col(s"__s$j").cast("double") / 1000000d / col("__n")): _*)
          .as("mu")))
      var w = mu.select(
        array(lit(1d) +: Seq.fill(dim - 1)(lit(0d)): _*).as("w"),
        lit(0d).as("nrm"), col("mu"))
        .localCheckpoint()
      (1 to iters).foreach { _ =>
        val s = vecs.crossJoin(broadcast(w))
          .select(col("v"),
            (dot(col("v"), col("w")) - dot(col("mu"), col("w"))).as("s"))
        val lanes = (0 until dim).map(j =>
          sum(floor(col("s") * element_at(col("v"), j + 1) * 1000000L))
            .as(s"__y$j"))
        val y = s.agg(sum(floor(col("s") * 1000000L)).as("__ss"), lanes: _*)
          .crossJoin(broadcast(mu))
          .select(array((0 until dim).map(j =>
            col(s"__y$j").cast("double") / 1000000d
              - element_at(col("mu"), j + 1)
                * (col("__ss").cast("double") / 1000000d)): _*).as("y"),
            col("mu"))
        // eager per-round checkpoint: 1 row, and round i's plan would
        // otherwise embed round i−1 twice (w appears in s AND in mu's
        // carry) — the Bpe.train lineage discipline
        w = y.select(col("y"), sqrt(dot(col("y"), col("y"))).as("nrm"),
            col("mu"))
          .select(transform(col("y"), x => x / col("nrm")).as("w"),
            col("nrm"), col("mu"))
          .localCheckpoint()
      }
      w.write.mode("overwrite").parquet(s"$dir/model")
    }
    spark.read.parquet(s"$d/model")
  }

  /** The learned component as rows: (j 1-based, comp_micro, plus the
    * shared eigenvalue estimate) — 64 rows at any corpus scale. */
  def topComponent(emb: DataFrame, iters: Int = 3): DataFrame =
    model(emb, iters)
      .select(posexplode(col("w")).as(Seq("pos", "x")), col("nrm"))
      .select((col("pos") + 1).cast("long").as("j"),
        floor(col("x") * 1000000L).cast("long").as("comp_micro"),
        floor(col("nrm") * 1000L).cast("long").as("eigval_milli"))
      .orderBy(col("j"))

  /** Per-vector projection onto the top component, top-k by magnitude —
    * the spectral outlier list (vectors far along the dominant
    * direction are the duplicated-template/cluster-collapse suspects an
    * embedding audit reviews first). Pure map pass over the corpus +
    * TakeOrdered top-k; `mag_micro` is emitted so the ordering key is a
    * plain output column. */
  def projectionOutliers(emb: DataFrame, iters: Int = 3,
                         topK: Int = 20): DataFrame =
    emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .crossJoin(broadcast(model(emb, iters)))
      .select(col("vec_id"),
        floor((dot(col("v"), col("w")) - dot(col("mu"), col("w")))
          * 1000000L).cast("long").as("proj_micro"))
      .select(col("vec_id"), col("proj_micro"),
        abs(col("proj_micro")).as("mag_micro"))
      .orderBy(col("mag_micro").desc, col("vec_id"))
      .limit(topK)
}
