package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Embedding-space classification and health audits over `embeddings`
  * (SURVEY §2.4 extension surface): k-NN and nearest-centroid label
  * prediction — the two classifiers a data pipeline runs to propagate
  * labels from a seed set onto an unlabeled corpus — plus per-dimension
  * distribution statistics (the embedding-collapse audit).
  *
  * Determinism discipline: similarities are the shared sequential-fold
  * double dot (bit-identical to DuckDB's list_dot_product); votes,
  * centroid sums, and scores are exact integers on per-element-quantized
  * values (never a float mean, whose value depends on combine order);
  * every argmax tie-breaks on (score, label) totally. */
object Classify {

  private def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.DotF64Expr(a, b)

  /** k-NN majority-vote classification of the first `nTest` vectors
    * against the rest. Scale shape: the test set is BROADCAST against
    * the train table (no shuffle of the big side); the per-test top-k
    * is a WindowGroupLimit-pruned rank window; votes aggregate k rows
    * per test vector. Prediction tie-breaks (votes desc, label asc).
    * At 100 TB the train side stays partition-parallel and only
    * |test|×k rows ever shuffle. */
  def knnClassify(emb: DataFrame, nTest: Long = 50, k: Int = 5): DataFrame = {
    val n = Similarity.withNorm(emb)
    val test = n.filter(col("vec_id") < nTest)
      .select(col("vec_id").as("test_id"), col("label").as("true_label"),
        col("v").as("qv"), col("norm2").as("qn"))
    val train = n.filter(col("vec_id") >= nTest)
      .select(col("vec_id").as("cand_id"), col("label").as("cand_label"),
        col("v").as("cv"), col("norm2").as("cn"))
    val sim = dot(col("qv"), col("cv")) / (sqrt(col("qn")) * sqrt(col("cn")))
    val topk = train.join(broadcast(test), col("cand_id") =!= col("test_id"))
      .select(col("test_id"), col("true_label"), col("cand_id"),
        col("cand_label"), sim.as("sim"))
      .withColumn("rank", row_number().over(Window.partitionBy(col("test_id"))
        .orderBy(col("sim").desc, col("cand_id"))))
      .filter(col("rank") <= k)
    val votes = topk.groupBy(col("test_id"), col("true_label"),
        col("cand_label"))
      .agg(count(lit(1)).as("votes"))
    votes
      .withColumn("vr", row_number().over(Window.partitionBy(col("test_id"))
        .orderBy(col("votes").desc, col("cand_label"))))
      .filter(col("vr") === 1)
      .select(col("test_id").as("vec_id"), col("true_label"),
        col("cand_label").as("pred_label"), col("votes"),
        (col("true_label") === col("cand_label")).as("correct"))
      .orderBy(col("vec_id"))
  }

  /** Nearest-centroid classification: per-label centroids from the
    * train split as exact integer sums of per-element-quantized
    * components (⌊x·2¹⁰⌋ — quantize FIRST, so the sum is associative
    * and engine-independent, unlike a float mean), score =
    * (1e6·⟨test,Σ⟩) div n_c (the mean centroid dot, scaled — both
    * engines truncate toward zero). Scale shape: centroids live in
    * long format (label × dim rows — |labels|·dim, broadcastable at
    * any corpus size); the test side explodes to dim rows and the
    * score join is a broadcast equi-join on dim, partial-aggregated
    * map-side. The corpus contributes one map-side-combined aggregate
    * and is never re-scanned per label. */
  def centroidClassify(emb: DataFrame, nTest: Long = 50,
                       qScale: Long = 1024): DataFrame = {
    val q = emb.select(col("vec_id"), col("label"),
      transform(col("embedding").cast("array<double>"),
        x => floor(x * qScale).cast("long")).as("qv"))
    val train = q.filter(col("vec_id") >= nTest)
    val counts = train.groupBy(col("label").as("c_label"))
      .agg(count(lit(1)).as("n_c"))
    val cent = train
      .select(col("label").as("c_label"), posexplode(col("qv")))
      .groupBy(col("c_label"), col("pos"))
      .agg(sum(col("col")).as("csum"))
    val testLong = q.filter(col("vec_id") < nTest)
      .select(col("vec_id"), col("label").as("true_label"),
        posexplode(col("qv")))
      .withColumnRenamed("col", "qx")
    testLong.join(broadcast(cent), "pos")
      .groupBy(col("vec_id"), col("true_label"), col("c_label"))
      .agg(sum(expr("qx * csum")).as("dot_q"))
      .join(broadcast(counts), "c_label")
      .select(col("vec_id"), col("true_label"), col("c_label"),
        expr("(1000000 * dot_q) div n_c").as("score"))
      .withColumn("vr", row_number().over(Window.partitionBy(col("vec_id"))
        .orderBy(col("score").desc, col("c_label"))))
      .filter(col("vr") === 1)
      .select(col("vec_id"), col("true_label"),
        col("c_label").as("pred_label"), col("score"),
        (col("true_label") === col("c_label")).as("correct"))
      .orderBy(col("vec_id"))
  }

  /** Per-dimension distribution audit: n, Σq, Σq², min, max of the
    * ⌊x·2¹⁰⌋-quantized component per dimension — the dead-dimension /
    * variance-collapse check run before trusting an embedding space.
    * One posexplode + one map-side-combined aggregate; output = dim
    * rows at any scale. */
  def dimStats(emb: DataFrame, qScale: Long = 1024): DataFrame =
    emb.select(posexplode(transform(col("embedding").cast("array<double>"),
        x => floor(x * qScale).cast("long"))))
      .withColumnRenamed("col", "qx")
      .groupBy(col("pos").cast("long").as("dim"))
      .agg(count(lit(1)).as("n"), sum(col("qx")).as("sum_q"),
        sum(expr("qx * qx")).as("sum_q2"),
        min(col("qx")).as("min_q"), max(col("qx")).as("max_q"))
      .orderBy(col("dim"))

  /** Redundant-dimension audit: the top-k most-correlated embedding
    * dimension PAIRS by exact squared Pearson correlation over the
    * quantized component lane — the "did the encoder collapse two
    * coordinates onto one axis" health check next to [[dimStats]].
    *
    * Exactness: with q = floor(x·qScale), every moment (n, Σqᵢ, Σqᵢ²,
    * Σqᵢqⱼ) is an exact BIGINT; r² lands in ppm via one DECIMAL(38,0)
    * division — num²·1e6 div (A·B) where num = nΣxy−ΣxΣy,
    * A = nΣx²−(Σx)², B = nΣy²−(Σy)² — so no square root or float
    * quotient ever crosses the oracle. Lane-width audit at the fixture
    * quantization: |q| ≤ ~2¹¹, so num ≤ n·2²² and num²·1e6 ≤ 10⁶·n²·2⁴⁴
    * — inside DECIMAL(38,0) up to n ≈ 10⁶ vectors; at 100 TB this
    * audit runs on a bounded sample (like ann_recall), not the corpus.
    *
    * Scale shape: one posexplode (n·d rows), one vec_id equi-join
    * producing the n·d(d−1)/2 component-pair stream — d is a model
    * constant, so this is linear in the corpus — then a d²-bounded
    * aggregate; the per-dim moment table (d rows) broadcasts back onto
    * the pair cells; top-k via TakeOrdered. */
  def dimCorr(emb: DataFrame, qScale: Long = 1024, k: Int = 20): DataFrame = {
    val ex = emb.select(col("vec_id"),
        posexplode(transform(col("embedding").cast("array<double>"),
          x => floor(x * qScale).cast("long"))))
      .select(col("vec_id"), col("pos").cast("long").as("dim"),
        col("col").as("qx"))
    val pairCells = ex.alias("a")
      .join(ex.alias("b"), col("a.vec_id") === col("b.vec_id")
        && col("a.dim") < col("b.dim"))
      .select(col("a.dim").as("dim_a"), col("b.dim").as("dim_b"),
        (col("a.qx") * col("b.qx")).as("qxy"))
      .groupBy(col("dim_a"), col("dim_b"))
      .agg(count(lit(1)).as("n"), sum(col("qxy")).as("sum_xy"))
    val moments = ex.groupBy(col("dim"))
      .agg(sum(col("qx")).as("s1"), sum(expr("qx * qx")).as("s2"))
    pairCells
      .join(broadcast(moments.select(col("dim").as("ma_dim"),
        col("s1").as("sx"), col("s2").as("sxx"))),
        col("dim_a") === col("ma_dim"))
      .join(broadcast(moments.select(col("dim").as("mb_dim"),
        col("s1").as("sy"), col("s2").as("syy"))),
        col("dim_b") === col("mb_dim"))
      .select(col("dim_a"), col("dim_b"),
        expr("n * sum_xy - sx * sy").as("num"),
        expr("n * sxx - sx * sx").as("var_a"),
        expr("n * syy - sy * sy").as("var_b"))
      .filter(col("var_a") > 0 && col("var_b") > 0)
      .select(col("dim_a"), col("dim_b"),
        expr("""CAST(CAST(num AS DECIMAL(38,0)) * num * 1000000
                div (CAST(var_a AS DECIMAL(38,0)) * var_b) AS BIGINT)""")
          .as("r2_ppm"),
        signum(col("num")).cast("long").as("sign"))
      .orderBy(col("r2_ppm").desc, col("dim_a"), col("dim_b"))
      .limit(k)
  }

  /** Multinomial Naive Bayes language classifier in whole-bit
    * surprisal lanes (McCallum & Nigam 1998's event model; add-one
    * smoothing) — the generative text classifier a pipeline trains in
    * one counting pass when the GD probe ([[LinearProbe]]) is too
    * heavy, here predicting `lang` from term counts and reporting the
    * resubstitution confusion matrix.
    *
    * The log-space trick under the no-floats contract: instead of
    * Σ log P (cross-engine float), each smoothed probability becomes a
    * whole-bit COST, w(t,l) = floor(log2((c_l+V)/(c_tl+1))) via the
    * exact length(bin(·))−1 integer log2 (the surprisal-lane
    * discipline), priors likewise; a doc's class score is the exact
    * BIGINT Σ tf·w + prior_bits, argmin with (score, lang) tie-break.
    * Coarser than float NB — and identically coarse in both engines,
    * which is the gate's requirement.
    *
    * Scale shape: counts fold off the ONE staged posting base joined
    * to the doc→lang map (posting-sized shuffle); the smoothed model
    * is the full vocab×|langs| grid (absent cells ARE model mass —
    * the unseen-term cost); scoring is a term-keyed join with |langs|
    * fan-out + a (doc, lang) aggregate + a |langs|-row-per-doc rank
    * window; the confusion output is |langs|²-bounded. Zero-token
    * docs have no posting rows and drop from the matrix (both engines
    * identically). */
  def nbConfusion(docs: DataFrame): DataFrame = {
    val tf = TextAnalysis.stagedDocTermTf(docs)
    val ctl = graft.Caches.track(
      tf.join(docs.select(col("doc_id"), col("lang")), "doc_id")
        .groupBy("term", "lang").agg(sum(col("tf")).as("c_tl")))
    val cl = ctl.groupBy("lang").agg(sum(col("c_tl")).as("c_l"))
    val vocab = tf.select("term").distinct()
    val vsz = vocab.agg(count(lit(1)).as("v"))
    val nl = docs.groupBy("lang").agg(count(lit(1)).as("n_l"))
    val ntot = docs.agg(count(lit(1)).as("n"))
    val grid = vocab.crossJoin(broadcast(cl)).crossJoin(broadcast(vsz))
      .join(ctl, Seq("term", "lang"), "left")
      .select(col("term"), col("lang"),
        (length(bin(expr(
          "(c_l + v) div (coalesce(c_tl, CAST(0 AS BIGINT)) + 1)"))) - 1)
          .cast("long").as("wbits"))
    val prior = nl.crossJoin(broadcast(ntot))
      .select(col("lang"),
        (length(bin(expr("n div n_l"))) - 1).cast("long").as("pbits"))
    val pred = tf.join(grid, "term")
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("tf") * col("wbits")).as("sbits"))
      .join(broadcast(prior), "lang")
      .withColumn("rn", row_number().over(Window.partitionBy("doc_id")
        .orderBy(col("pbits") + col("sbits"), col("lang"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang").as("predicted"))
    docs.select(col("doc_id"), col("lang")).join(pred, "doc_id")
      .groupBy("lang", "predicted").agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "predicted")
  }

  /** The CART split primitive (Breiman et al. 1984) run at corpus
    * scale: the single n_chars threshold minimizing weighted Gini
    * impurity for the lang='en' label — the root-node decision-stump
    * the probe family's linear/NB models bracket from the other side
    * (one exact, interpretable split vs a weighted sum). Emits the
    * best split beside the unsplit baseline so the Gini GAIN is
    * readable in one row.
    *
    * All-integer: a side's weighted Gini contribution collapses to
    * 2p(n−p)/n (exact rational), scored as
    * (2e6·p·(n−p)) div n in DECIMAL(38,0) lanes (p·(n−p)·1e6 ≈ 1e32
    * at 100 TB — far past BIGINT); operands non-negative throughout.
    *
    * Shape: the corpus collapses ONCE to the value-count table
    * (distinct n_chars values); left-side cumulatives come from the
    * shared Prefix sweep (block = bit-length — an order-preserving
    * coarsening, never a global sort); every candidate threshold is
    * one row of that bounded table and the argmin is a min_by
    * aggregate. */
  def giniStump(docs: DataFrame): DataFrame = {
    val vc = docs.groupBy(col("n_chars").as("v"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("pos"))
    val cum = Prefix.inclusiveCumsum(vc,
      length(bin(col("v"))).cast("long"), col("v"),
      Seq("n" -> col("n"), "pos" -> col("pos")))
    val tot = cum.agg(max(col("cum_n")).as("tn"),
      max(col("cum_pos")).as("tp"))
    val scoredCols = cum.crossJoin(broadcast(tot))
      .filter(col("cum_n") < col("tn")) // right side must be non-empty
      .select(col("v").as("threshold"),
        col("cum_n").as("n_left"), col("cum_pos").as("pos_left"),
        (col("tn") - col("cum_n")).as("n_right"),
        (col("tp") - col("cum_pos")).as("pos_right"),
        col("tn"), col("tp"))
      .select(col("threshold"), col("n_left"), col("pos_left"),
        col("n_right"), col("pos_right"), col("tn"), col("tp"),
        (expr("""CAST((2000000 * CAST(pos_left AS DECIMAL(38,0))
                    * (n_left - pos_left)) div n_left AS BIGINT)""") +
          expr("""CAST((2000000 * CAST(pos_right AS DECIMAL(38,0))
                    * (n_right - pos_right)) div n_right AS BIGINT)"""))
          .as("gini_micro"))
    scoredCols
      .agg(min_by(
        struct(col("threshold"), col("n_left"), col("pos_left"),
          col("n_right"), col("pos_right"), col("gini_micro")),
        struct(col("gini_micro"), col("threshold"))).as("__b"),
        max(col("tn")).as("n_total"), max(col("tp")).as("pos_total"))
      .select(col("__b.threshold").as("threshold"),
        col("__b.n_left").as("n_left"),
        col("__b.pos_left").as("pos_left"),
        col("__b.n_right").as("n_right"),
        col("__b.pos_right").as("pos_right"),
        col("__b.gini_micro").as("gini_micro"),
        expr("""CAST((2000000 * CAST(pos_total AS DECIMAL(38,0))
                  * (n_total - pos_total)) div n_total AS BIGINT)""")
          .as("gini_base_micro"))
      .orderBy("threshold")
  }
}
