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
  def train(docs: DataFrame, iters: Int = 3, lr: Double = 0.5)
      : DataFrame = {
    val toksC = TextAnalysis.tokens(col("text"))
    // ONE corpus pass; x1/x2 scale by powers of two (exact), x3 is the
    // type-token ratio (one IEEE divide, identical both engines)
    val feats = graft.Caches.track(docs.select(
      when(col("lang") === "en", 1.0d).otherwise(0.0d).as("y"),
      lit(1.0d).as("x0"),
      (col("n_chars").cast("double") / 1024.0d).as("x1"),
      (size(toksC).cast("double") / 64.0d).as("x2"),
      when(size(toksC) === 0, 0.0d)
        .otherwise(size(array_distinct(toksC)).cast("double") /
          size(toksC).cast("double")).as("x3")))

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
      w = w.crossJoin(grads)
        .select(upd("w0", "g0"), upd("w1", "g1"),
          upd("w2", "g2"), upd("w3", "g3"))
        .localCheckpoint()
    }

    featNames.map { case (c, name) =>
      w.select(lit(name).as("feature"),
        floor(col(c) * lit(1000000.0d)).cast("long").as("weight_micro"))
    }.reduce(_.union(_)).orderBy("feature")
  }
}
