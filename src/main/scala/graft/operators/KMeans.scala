package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic Lloyd's k-means over the embeddings table — the
  * trained coarse quantizer behind IVF-style ANN (SURVEY §2.4: "IVF or
  * LSH-bucketed variant as the scale path"; LSH is in Similarity, this
  * is the IVF half).
  *
  * Every step is engine-reproducible:
  * - init: centroids = the first k vectors by vec_id (deterministic)
  * - assignment: argmin of the sequential-fold squared distance, ties
  *   broken by lowest centroid id
  * - update: member vectors summed IN vec_id ORDER (sorted collect_list
  *   fold) then divided by the count — identical order in DuckDB's
  *   `list(v ORDER BY vec_id)` fold, so the means agree bit-for-bit;
  *   empty clusters keep their previous centroid
  *
  * Scale notes: assignment broadcasts the k-row centroid table (k is
  * small by construction for a coarse quantizer); the update is one
  * groupBy(cluster) shuffle. collect_list per cluster is the textbook
  * scale hazard — per-cluster member counts are |data|/k, so for a real
  * 100 TB run the update switches to a two-level mean (per-partition
  * partial sums, then merge); the sorted-fold form here exists to make
  * the ORACLE bit-exact, which a floating mean with unordered reduction
  * cannot be. */
object KMeans {

  val dim = 64

  private def dist2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0d), (acc, x) => acc + x)

  /** Nearest centroid per vector (broadcast join + argmin window). */
  def assign(vecs: DataFrame, centroids: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("v"), col("cid"),
        dist2(col("v"), col("c")).as("d2"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("d2"), col("cid"))))
      .filter(col("rn") === 1).drop("rn")

  /** Mean of members in vec_id order; empty clusters keep `prev`. */
  def updateCentroids(assigned: DataFrame, prev: DataFrame): DataFrame = {
    val means = assigned.groupBy("cid")
      .agg(sort_array(collect_list(struct(col("vec_id"), col("v"))))
        .as("members"))
      .select(col("cid"),
        transform(
          aggregate(col("members"),
            array_repeat(lit(0d), dim),
            (acc, m) => zip_with(acc, m.getField("v"), (a, b) => a + b)),
          x => x / size(col("members"))).as("c_new"))
    prev.join(means, Seq("cid"), "left")
      .select(col("cid"), coalesce(col("c_new"), col("c")).as("c"))
  }

  /** `iters` Lloyd rounds from the deterministic init; returns the
    * final assignment (vec_id, v, cluster, d2). */
  def fit(emb: DataFrame, k: Int = 8, iters: Int = 2): DataFrame = {
    val vecs = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    var centroids = vecs.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("v").as("c"))
    var assigned = assign(vecs, centroids)
    (1 until iters).foreach { _ =>
      centroids = updateCentroids(assigned, centroids)
      assigned = assign(vecs, centroids)
    }
    assigned.select(col("vec_id"), col("v"), col("cid").as("cluster"),
      col("d2"))
  }

  /** The trained-quantizer assignment as an oracle-checked result. */
  def assignments(emb: DataFrame, k: Int = 8, iters: Int = 2): DataFrame =
    fit(emb, k, iters).select(col("vec_id"), col("cluster"),
      floor(col("d2") * 1000).cast("long").as("d2_milli"))

  /** IVF ANN: search only the query's own (trained) cluster — the
    * quantizer prunes the candidate set to |data|/k per query; at scale
    * the join is an equi-join on the cluster id, exactly like the LSH
    * bucket path but with learned partitions. */
  def annIvf(emb: DataFrame, k: Int = 8, iters: Int = 2,
             nQueries: Int = 20, topK: Int = 3): DataFrame = {
    val dot = (a: Column, b: Column) =>
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0d), (acc, x) => acc + x)
    val nv = fit(emb, k, iters)
      .select(col("vec_id"), col("v"), col("cluster"),
        dot(col("v"), col("v")).as("norm2"))
    val q = nv.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("norm2").as("qn"), col("cluster"))
    val c = nv.select(col("vec_id").as("cand_id"), col("v").as("cv"),
      col("norm2").as("cn"), col("cluster"))
    val sim = dot(col("qv"), col("cv")) / (sqrt(col("qn")) * sqrt(col("cn")))
    c.join(broadcast(q), Seq("cluster"))
      .filter(col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"), sim.as("sim"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("sim").desc, col("cand_id"))))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col("cand_id"), floor(col("sim") * 1000000L).cast("long").as("sim_micro"))
  }
}
