package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Greedy k-center coreset selection (Gonzalez 1985 farthest-point
  * traversal — the 2-approximation to the k-center objective) over the
  * embeddings table: pick the point farthest from everything chosen so
  * far, k times. The classic diversity-first data-selection primitive —
  * where importance sampling buys typicality, k-center buys COVERAGE
  * (every point ends within the final selection radius of a chosen
  * one), which is what seed-set curation and eval-set construction
  * actually want.
  *
  * Scale shape: each of the k−1 rounds is ONE corpus pass — the ≤k-row
  * chosen set broadcasts, a codegen'd fold computes dist² per
  * (vector, center), a (vec_id)-keyed min + a 1-row struct-argmax pick
  * the farthest point, and ONE k-row broadcast join fetches its vector.
  * Chosen rows are 1-row localCheckpoints, so round plans stay shallow
  * (the Bpe.train lineage discipline); nothing corpus-sized is ever
  * cached or sorted. O(k·corpus) distance work total — the same budget
  * as k Lloyd rounds.
  *
  * Determinism: the seed is the minimum vec_id; each round's argmax
  * tie-breaks (d2 DESC, vec_id ASC) via one max(struct) aggregate;
  * distances are the shared sequential-fold expression. `sel_d2_milli`
  * is the min-distance² of the chosen point at selection time — the
  * coverage radius² the selection just improved (0 for the seed). */
object Coreset {

  private def dist2(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Dist2F64Expr(a, b)

  /** The selection is staged once per (corpus, k) via [[graft.Stage]]
    * — a chosen seed/eval set is a STORED pipeline artifact (that is
    * its entire point), and the greedy traversal is an iterative
    * trainer like the Lloyd chain: select once, read back everywhere. */
  def kCenter(emb: DataFrame, k: Int = 8): DataFrame =
    graft.Stage.parquet(emb.sparkSession,
        graft.Stage.key(emb, "kcenter_coreset", k)) {
        kCenterPlan(emb, k)
      }
      .orderBy(col("round"))

  private def kCenterPlan(emb: DataFrame, k: Int): DataFrame = {
    val vecs = graft.Caches.track(emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v")))
    val seed = vecs.orderBy(col("vec_id")).limit(1)
      .select(col("vec_id"), col("v"), lit(0d).as("d2"))
      .localCheckpoint()
    var chosen = Vector(seed)
    (2 to k).foreach { _ =>
      val centers = chosen.map(_.select(col("v").as("c")))
        .reduce(_.unionByName(_))
      val dmin = vecs.crossJoin(broadcast(centers))
        .select(col("vec_id"), dist2(col("v"), col("c")).as("d2"))
        .groupBy(col("vec_id")).agg(min(col("d2")).as("d2"))
      val best = dmin
        .agg(max(struct(col("d2"), (-col("vec_id")).as("neg"))).as("m"))
        .select((-col("m.neg")).as("vec_id"), col("m.d2").as("d2"))
      chosen = chosen :+ vecs.join(broadcast(best), Seq("vec_id"))
        .select(col("vec_id"), col("v"), col("d2"))
        .localCheckpoint()
    }
    chosen.zipWithIndex.map { case (c, i) =>
      c.select(lit(i + 1L).as("round"), col("vec_id"),
        floor(col("d2") * 1000L).cast("long").as("sel_d2_milli"))
    }.reduce(_.unionByName(_))
  }
}
