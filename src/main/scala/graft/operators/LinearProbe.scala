package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic full-batch gradient-descent linear classifier — the
  * "quality/domain probe" a training-data pipeline trains on cheap
  * document features to triage a corpus before an expensive model sees
  * it (fasttext-style filtering, cf. CCNet / Gopher pipelines). The
  * fixture probe predicts `lang = 'en'` from length/token-shape
  * features; the point of the gate is the TRAINER, not the task.
  *
  * Why this is oracle-twinnable when real logistic regression is not:
  * - the link is a HARD sigmoid, clamp(0.25·m + 0.5, 0, 1) — only IEEE
  *   multiply/add/compare, every engine correctly-rounded; exp() has no
  *   cross-engine bit guarantee.
  * - per-example gradient contributions are quantized to integers
  *   (floor(g·1e6)) and summed as BIGINT — integer addition is
  *   associative, so Spark's unordered map-side combine agrees with
  *   DuckDB's single-threaded sum exactly (the KMeans fixed-point-mean
  *   discipline applied to gradients).
  * - every float expression is written with identical association both
  *   sides (left-assoc dot product, explicit parenthesization).
  *
  * Scale shape: the feature frame is built in ONE corpus pass and
  * cached; each of the `iters` rounds is one broadcast of the 1-row
  * weight frame + one aggregate whose buffer is 4 longs + a count —
  * constant-size, map-side combined, the exact update shape of
  * [[KMeans.updateCentroids]]. Rounds end in an eager localCheckpoint
  * (1 row) so the plan stays O(1) deep instead of nesting each round's
  * tree inside the next (the Bpe.train lesson). */
object LinearProbe {

  private val featNames =
    Seq("w0" -> "bias", "w1" -> "chars_1k", "w2" -> "tokens_64",
      "w3" -> "ttr")

  /** Train `iters` full-batch rounds; returns (feature, weight_micro)
    * — 4 rows, the trained probe. lr = 0.5 (a power of two, so the
    * update's scale step is exact). */
  /** The probe's feature frame (y, x0..x3) — ONE corpus pass; x1/x2
    * scale by powers of two (exact), x3 is the type-token ratio (one
    * IEEE divide, identical both engines). Shared by [[train]] and
    * [[calibration]]. */
  private[graft] def features(docs: DataFrame): DataFrame =
    docs.select(featureCols: _*)

  /** The feature expressions themselves — [[labelNoise]] re-selects
    * them beside doc_id (the audit needs to NAME its suspects). */
  private def featureCols: Seq[Column] = {
    val toksC = TextAnalysis.tokens(col("text"))
    Seq(
      when(col("lang") === "en", 1.0d).otherwise(0.0d).as("y"),
      lit(1.0d).as("x0"),
      (col("n_chars").cast("double") / 1024.0d).as("x1"),
      (size(toksC).cast("double") / 64.0d).as("x2"),
      when(size(toksC) === 0, 0.0d)
        .otherwise(size(array_distinct(toksC)).cast("double") /
          size(toksC).cast("double")).as("x3"))
  }

  def train(docs: DataFrame, iters: Int = 3, lr: Double = 0.5)
      : DataFrame = {
    // Staged (r19 optimization): the trained 4-row probe is the
    // model artifact every downstream audit (calibration, AUC,
    // Brier, conformal, label noise) scores with — train once per
    // (corpus, iters, lr), read the weights back like every other
    // staged model (kmeans_model, pq_blocks).
    if (!docs.isStreaming)
      graft.Stage.parquet(docs.sparkSession,
        graft.Stage.key(docs, "probe_weights", iters, lr))(
        trainLive(docs, iters, lr)).orderBy("feature")
    else trainLive(docs, iters, lr).orderBy("feature")
  }

  private def trainLive(docs: DataFrame, iters: Int, lr: Double)
      : DataFrame = {
    val feats = graft.Caches.track(features(docs))

    var w = docs.sparkSession.range(1).select(
      lit(0.0d).as("w0"), lit(0.0d).as("w1"),
      lit(0.0d).as("w2"), lit(0.0d).as("w3"))

    (0 until iters).foreach { _ =>
      val joined = feats.crossJoin(broadcast(w))
      // left-associated dot product — same association in the twin
      val margin = col("x0") * col("w0") + col("x1") * col("w1") +
        col("x2") * col("w2") + col("x3") * col("w3")
      val p = least(greatest(margin * lit(0.25d) + lit(0.5d),
        lit(0.0d)), lit(1.0d))
      def g(xj: String) =
        sum(floor(((p - col("y")) * col(xj)) * lit(1000000.0d))
          .cast("long")).as("g" + xj.drop(1))
      val grads = joined.agg(count(lit(1)).as("n"),
        g("x0"), g("x1"), g("x2"), g("x3"))
      def upd(wj: String, gj: String) =
        (col(wj) - lit(lr) * (col(gj).cast("double") / lit(1000000.0d)
          / col("n").cast("double"))).as(wj)
      // hint the 1-row WEIGHTS side (the loop's convention at the
      // feats join above): hinting grads instead forces a
      // BroadcastExchange on the aggregate per GD iteration —
      // measured +28-55% on the probe family in the r18 bench
      w = broadcast(w).crossJoin(grads)
        .select(upd("w0", "g0"), upd("w1", "g1"),
          upd("w2", "g2"), upd("w3", "g3"))
        .localCheckpoint()
    }

    featNames.map { case (c, name) =>
      w.select(lit(name).as("feature"),
        floor(col(c) * lit(1000000.0d)).cast("long").as("weight_micro"))
    }.reduce(_.union(_))
  }

  /** Reliability diagram / expected-calibration-error bins (Naeini et
    * al. 2015's ECE, the standard post-hoc audit of a filter model's
    * scores): the trained probe's predicted probabilities bucketed
    * into `nBins` equal-width bins, each reporting mean confidence vs
    * empirical positive rate and their absolute gap — the table a
    * curation pipeline reads before trusting probe scores as sampling
    * weights ([[graft.operators.Sampling]]'s importance lanes).
    *
    * Determinism contract: scoring starts from the FLOORED micro
    * weights [[train]] emits (the gated, cross-engine-identical
    * artifact), not the trainer's float state — so the only float ops
    * here are per-row IEEE multiply/add/compare (the hard-sigmoid
    * link), and every aggregate runs on floor-quantized BIGINT
    * confidences (order-free sums; the LinearProbe gradient
    * discipline). bin = conf_micro div 100000 capped at nBins−1 —
    * derived from the already-quantized integer, not a second float
    * pass. Scale shape: one corpus scoring pass against the broadcast
    * 1-row weight frame, one nBins-row aggregate. */
  /** The trained weights pivoted to one broadcastable row of floored
    * micro lanes — the scoring input of [[calibration]] and
    * [[crossValidate]]. */
  private def weightsRow(docs: DataFrame, iters: Int, lr: Double)
      : DataFrame =
    train(docs, iters, lr).agg(
      sum(when(col("feature") === "bias", col("weight_micro"))).as("wm0"),
      sum(when(col("feature") === "chars_1k", col("weight_micro")))
        .as("wm1"),
      sum(when(col("feature") === "tokens_64", col("weight_micro")))
        .as("wm2"),
      sum(when(col("feature") === "ttr", col("weight_micro"))).as("wm3"))

  /** floor(p·1e6) under the hard-sigmoid link from the micro weight
    * row — per-row IEEE ops only, the calibration determinism
    * contract. */
  private def confCol: Column = {
    def wd(j: Int) = col(s"wm$j").cast("double") / lit(1000000.0d)
    val margin = col("x0") * wd(0) + col("x1") * wd(1) +
      col("x2") * wd(2) + col("x3") * wd(3)
    val p = least(greatest(margin * lit(0.25d) + lit(0.5d),
      lit(0.0d)), lit(1.0d))
    floor(p * lit(1000000.0d)).cast("long")
  }

  def calibration(docs: DataFrame, iters: Int = 3, lr: Double = 0.5)
      : DataFrame = {
    features(docs).crossJoin(broadcast(weightsRow(docs, iters, lr)))
      .select(col("y"), confCol.as("conf"))
      .groupBy(least(expr("conf div 100000"), lit(9L)).as("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("y") === 1.0d, 1L).otherwise(0L)).as("pos"),
        sum(col("conf")).as("sc"))
      .select(col("bin"), col("n_docs"),
        expr("sc div n_docs").as("conf_micro"),
        expr("(1000000 * pos) div n_docs").as("acc_micro"),
        abs(expr("sc div n_docs") -
          expr("(1000000 * pos) div n_docs")).as("gap_micro"))
      .orderBy("bin")
  }

  /** k-fold cross-validated probe accuracy — the evaluation
    * resubstitution metrics ([[calibration]]) cannot give: each fold's
    * model never saw its test docs, so acc_ppm is the generalization
    * estimate a filter model must clear before its scores gate a
    * corpus. Folds are [[Sampling.kfoldSplit]]'s salted-hash
    * assignment (deterministic, engine-portable, no RNG); per fold the
    * FULL trainer runs on the other k−1 folds and scoring restarts
    * from the floored micro weights (the calibration determinism
    * contract: per-row IEEE only, integer aggregates; predicted
    * positive ⇔ conf ≥ 5e5).
    *
    * ALL k MODELS TRAIN IN ONE GROUPED AGGREGATE PER ITERATION (r18;
    * the update that took probe_cv off the top-expensive list): each
    * doc explodes into the k−1 models its fold doesn't test, the
    * gradient aggregate groups by model (buffer = k × 5 longs,
    * map-side combined), and the k-row weight frame broadcasts back —
    * so a GD run is `iters` corpus passes instead of k·iters, and
    * scoring is ONE pass (each doc joins its own fold's floored micro
    * weights) instead of k. Numerically IDENTICAL to the k
    * independent chains: per-model gradient contributions are the
    * same floor-quantized longs, and integer addition is associative
    * regardless of grouping — the oracle twin is untouched. */
  def crossValidate(docs: DataFrame, k: Int = 5, iters: Int = 3,
                    lr: Double = 0.5): DataFrame = {
    val spark = docs.sparkSession
    val fold = (graft.functions.PortableHash.hash32(
      concat(lit("fold:"), col("doc_id").cast("string"))) % k)
      .cast("int")
    val feats = graft.Caches.track(
      docs.select(fold.as("fold") +: featureCols: _*))
    val trainView = feats
      .withColumn("model", explode(array((0 until k).map(lit(_)): _*)))
      .filter(col("model") =!= col("fold"))

    var w = spark.range(k).select(
      col("id").cast("int").as("model"),
      lit(0.0d).as("w0"), lit(0.0d).as("w1"),
      lit(0.0d).as("w2"), lit(0.0d).as("w3"))

    (0 until iters).foreach { _ =>
      val joined = trainView.join(broadcast(w), "model")
      val margin = col("x0") * col("w0") + col("x1") * col("w1") +
        col("x2") * col("w2") + col("x3") * col("w3")
      val p = least(greatest(margin * lit(0.25d) + lit(0.5d),
        lit(0.0d)), lit(1.0d))
      def g(xj: String) =
        sum(floor(((p - col("y")) * col(xj)) * lit(1000000.0d))
          .cast("long")).as("g" + xj.drop(1))
      val grads = joined.groupBy("model").agg(count(lit(1)).as("n"),
        g("x0"), g("x1"), g("x2"), g("x3"))
      def upd(wj: String, gj: String) =
        (col(wj) - lit(lr) * (col(gj).cast("double") / lit(1000000.0d)
          / col("n").cast("double"))).as(wj)
      w = w.join(broadcast(grads), Seq("model"))
        .select(col("model"), upd("w0", "g0"), upd("w1", "g1"),
          upd("w2", "g2"), upd("w3", "g3"))
        .localCheckpoint()
    }

    // the train() emission contract: weights floor-quantize to micro
    // lanes BEFORE scoring (the calibration determinism boundary)
    val wm = w.select(col("model"),
      floor(col("w0") * lit(1000000.0d)).cast("long").as("wm0"),
      floor(col("w1") * lit(1000000.0d)).cast("long").as("wm1"),
      floor(col("w2") * lit(1000000.0d)).cast("long").as("wm2"),
      floor(col("w3") * lit(1000000.0d)).cast("long").as("wm3"))
    val scored = feats
      .join(broadcast(wm), col("fold") === col("model"))
      .select(col("fold"), col("y"), confCol.as("conf"))
      .groupBy("fold")
      .agg(count(lit(1)).as("n_test"),
        sum(when((col("conf") >= 500000L) === (col("y") === 1.0d), 1L)
          .otherwise(0L)).as("n_correct"))
    // an empty test fold still prints its row as (f, 0, 0, null) —
    // n_correct coalesces to 0 to match the twin's
    // coalesce(sum(hit), 0) (sum over zero rows is NULL in both
    // engines; both sides pin the 0 explicitly)
    spark.range(k).select(col("id").cast("int").as("fold"))
      .join(scored, Seq("fold"), "left")
      .select(col("fold").cast("long").as("fold"),
        coalesce(col("n_test"), lit(0L)).as("n_test"),
        coalesce(col("n_correct"), lit(0L)).as("n_correct"),
        when(coalesce(col("n_test"), lit(0L)) > 0,
          expr("(1000000 * n_correct) div n_test")).as("acc_ppm"))
      .orderBy("fold")
  }

  /** Split-conformal prediction audit at α = 0.1 (Vovk et al. 2005;
    * Angelopoulos & Bates 2021) — the distribution-free guarantee a
    * filter model can actually promise: train on a 60% slice, take the
    * ⌈0.9·(n+1)⌉-th smallest calibration nonconformity score as the
    * threshold q, and the prediction set {c : s_c(x) ≤ q} on fresh docs
    * covers the true label with probability ≥ 90% — whatever the
    * probe's calibration looks like ([[calibration]] measures how
    * honest the scores are; this measures what they GUARANTEE).
    *
    * Nonconformity is the quantized true-class complement
    * s = 1e6 − conf (y=1) / conf (y=0) — integer lanes end to end, so
    * the exact order statistic comes from the [[graft.operators.Prefix
    * .inclusiveCumsum]] value-count sweep (never a global sort):
    * q = min score with 10·cum ≥ 9·(n+1), the integer form of
    * ⌈0.9(n+1)⌉; an undersized calibration set (k > n) degrades to
    * q = 1e6 (every set is {0,1} — coverage 100%, sets useless), never
    * an error. Bands split by salted hash (train 0-5, calib 6-7, test
    * 8-9); scoring restarts from the floored micro weights (the
    * [[calibration]] determinism contract). Output is ONE row. */
  def conformal(docs: DataFrame, iters: Int = 3, lr: Double = 0.5)
      : DataFrame = {
    val band = graft.functions.PortableHash.hash32(
      concat(lit("conf:"), col("doc_id").cast("string"))) % 10
    val w = weightsRow(docs.filter(band < 6), iters, lr)
    def scored(part: DataFrame): DataFrame =
      features(part).crossJoin(broadcast(w))
        .select(col("y"), confCol.as("conf"))
        .select(
          when(col("y") === 1.0d, lit(1000000L) - col("conf"))
            .otherwise(col("conf")).as("s_true"),
          (lit(1000000L) - col("conf")).as("s_pos"),
          col("conf").as("s_neg"))

    val cal = graft.Caches.track(
      scored(docs.filter(band === 6 || band === 7)))
    val nCal = cal.agg(count(lit(1)).as("n_calib"))
    val counts = cal.groupBy("s_true").agg(count(lit(1)).as("n"))
    val qv = Prefix.inclusiveCumsum(counts,
        length(bin(col("s_true"))), col("s_true"), Seq("n" -> col("n")))
      .crossJoin(broadcast(nCal))
      .filter(col("cum_n") * 10 >= (col("n_calib") + 1) * 9)
      .agg(min(col("s_true")).as("__q"))
      .select(coalesce(col("__q"), lit(1000000L)).as("q_score"))

    scored(docs.filter(band >= 8))
      .crossJoin(broadcast(qv)).crossJoin(broadcast(nCal))
      .agg(max(col("n_calib")).as("n_calib"),
        max(col("q_score")).as("q_score"),
        count(lit(1)).as("n_test"),
        sum(when(col("s_true") <= col("q_score"), 1L).otherwise(0L))
          .as("__cov"),
        sum(when(col("s_pos") <= col("q_score"), 1L).otherwise(0L)
          + when(col("s_neg") <= col("q_score"), 1L).otherwise(0L))
          .as("__set"))
      .select(col("n_calib"), col("q_score"), col("n_test"),
        expr("(1000000 * __cov) div n_test").as("coverage_ppm"),
        expr("(1000 * __set) div n_test").as("avg_set_milli"))
  }

  /** Brier score with the Murphy (1973) decomposition — the single
    * proper-scoring-rule number the [[calibration]] table rolls up to,
    * split into its three readable parts: BS = REL − RES + UNC
    * (reliability: how far bin confidence sits from bin accuracy;
    * resolution: how much the bins separate the base rate;
    * uncertainty: the base rate's own variance). The mean-squared term
    * is EXACT per row (Σ(conf − y·1e6)² in DECIMAL(38,0) — ≤1e25 at
    * 1e13 rows); REL/RES use the FLOORED micro decile means the
    * calibration table already publishes (c̄ = sc div n,
    * ā = 1e6·pos div n, floored base rate), so the decomposition
    * identity holds up to that documented quantization and every lane
    * is engine-identical. One corpus scoring pass, a 10-row bin
    * aggregate, one summary row. */
  def brier(docs: DataFrame, iters: Int = 3, lr: Double = 0.5)
      : DataFrame = {
    val scored = graft.Caches.track(
      features(docs).crossJoin(broadcast(weightsRow(docs, iters, lr)))
        .select(col("y"), confCol.as("conf")))
    val tot = scored.agg(count(lit(1)).as("n"),
      sum(when(col("y") === 1.0d, 1L).otherwise(0L)).as("p"),
      sum(expr("""CAST(conf - CAST(y * 1000000 AS BIGINT)
                    AS DECIMAL(38,0))
                  * (conf - CAST(y * 1000000 AS BIGINT))"""))
        .as("sq"))
      .withColumn("base_micro", expr("(1000000 * p) div n"))
    val bins = scored
      .groupBy(least(expr("conf div 100000"), lit(9L)).as("bin"))
      .agg(count(lit(1)).as("n_k"),
        sum(when(col("y") === 1.0d, 1L).otherwise(0L)).as("pos"),
        sum(col("conf")).as("sc"))
      .select(col("n_k"), expr("sc div n_k").as("cbar"),
        expr("(1000000 * pos) div n_k").as("abar"))
    bins.crossJoin(broadcast(tot))
      .agg(max(col("n")).as("n_docs"), max(col("sq")).as("sq"),
        max(col("base_micro")).as("base_micro"),
        sum(expr("""CAST(n_k AS DECIMAL(38,0))
                    * (cbar - abar) * (cbar - abar)""")).as("rel_s"),
        sum(expr("""CAST(n_k AS DECIMAL(38,0)) * (abar - base_micro)
                    * (abar - base_micro)""")).as("res_s"))
      .select(col("n_docs"),
        expr("""CAST(sq div (CAST(n_docs AS DECIMAL(38,0)) * 1000000)
                AS BIGINT)""").as("brier_micro"),
        expr("""CAST(rel_s div (CAST(n_docs AS DECIMAL(38,0)) * 1000000)
                AS BIGINT)""").as("rel_micro"),
        expr("""CAST(res_s div (CAST(n_docs AS DECIMAL(38,0)) * 1000000)
                AS BIGINT)""").as("res_micro"),
        col("base_micro"),
        expr("""(base_micro * (1000000 - base_micro)) div 1000000""")
          .as("unc_micro"))
      .orderBy("n_docs")
  }

  /** Exact ROC AUC of the trained probe — the DISCRIMINATION dial
    * beside [[brier]]'s calibration one (a model can be perfectly
    * calibrated yet rank nothing, and vice versa): AUC =
    * P(conf⁺ > conf⁻) + ½P(tie), computed exactly from the confidence
    * value-count table via the rank-sum identity — per distinct conf
    * value v, pos_v·(2·neg_below(v) + neg_v) summed, divided once by
    * 2·P·N. No sort of the corpus: negatives-below comes from the
    * shared Prefix sweep over the ≤1e6-row value table (block =
    * conf div 1e5 — an order-preserving coarsening). Numerator in
    * DECIMAL(38,0); a single-class corpus floors the denominator and
    * reports 0. One row out. */
  def auc(docs: DataFrame, iters: Int = 3, lr: Double = 0.5)
      : DataFrame = {
    val vc = features(docs)
      .crossJoin(broadcast(weightsRow(docs, iters, lr)))
      .select(col("y"), confCol.as("conf"))
      .groupBy(col("conf"))
      .agg(sum(when(col("y") === 1.0d, 1L).otherwise(0L)).as("pos_v"),
        sum(when(col("y") === 1.0d, 0L).otherwise(1L)).as("neg_v"))
    Prefix.inclusiveCumsum(vc, expr("conf div 100000"), col("conf"),
        Seq("neg" -> col("neg_v")))
      .select(col("pos_v"), col("neg_v"),
        (col("cum_neg") - col("neg_v")).as("neg_lt"))
      .agg(sum(col("pos_v")).as("n_pos"), sum(col("neg_v")).as("n_neg"),
        sum(expr("""CAST(pos_v AS DECIMAL(38,0))
                    * (2 * neg_lt + neg_v)""")).as("num"))
      .select(col("n_pos"), col("n_neg"),
        expr("""CAST((CAST(1000000 AS DECIMAL(38,0)) * num)
                     div greatest(2 * CAST(n_pos AS DECIMAL(38,0))
                                    * n_neg, 1)
                AS BIGINT)""").as("auc_ppm"))
      .orderBy("n_pos")
  }

  /** Label-noise audit (the confident-learning idea of Northcutt et
    * al. 2021, reduced to its actionable core): rank documents by how
    * hard the trained probe DISAGREES with their label — extremity =
    * conf for label-0 docs (the model is sure it's positive) and
    * 1e6 − conf for label-1 docs. The top of this list is where
    * annotation errors, scraper mislabels, and distribution leaks
    * concentrate; `flagged` marks extremity ≥ `hi` (the symmetric
    * threshold pair hi / 1e6−hi). Scoring RESTARTS from the floored
    * micro weights (the gated cross-engine artifact) exactly like
    * [[calibration]]; one corpus pass against the broadcast 1-row
    * weight frame, top-k = TakeOrderedAndProject. */
  def labelNoise(docs: DataFrame, iters: Int = 3, lr: Double = 0.5,
                 hi: Long = 800000L, topK: Int = 20): DataFrame =
    docs.select(col("doc_id") +: featureCols: _*)
      .crossJoin(broadcast(weightsRow(docs, iters, lr)))
      .select(col("doc_id"), col("y").cast("long").as("label"),
        confCol.as("conf_micro"))
      .select(col("doc_id"), col("label"), col("conf_micro"),
        when(col("label") === 0L, col("conf_micro"))
          .otherwise(lit(1000000L) - col("conf_micro"))
          .as("extremity_micro"))
      .withColumn("flagged", col("extremity_micro") >= hi)
      .orderBy(col("extremity_micro").desc, col("doc_id"))
      .limit(topK)
}
