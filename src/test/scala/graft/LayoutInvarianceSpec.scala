package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators._

/** Partition-layout invariance: THE distributed-correctness property.
  * A deterministic operator must produce byte-identical results no
  * matter how the input is partitioned — 1 task, a prime uneven count,
  * or full parallelism — because at 100 TB the layout is whatever the
  * cluster happens to give you (and task retries re-deal it mid-job).
  * Any operator that leans on partition order, partition count, or
  * accumulation order fails this sweep. The hash-sensitive oracle gate
  * only ever sees ONE layout; this spec is the guard for the rest. */
class LayoutInvarianceSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  private val layouts = Seq(1, 7, 32)

  /** Render the full result deterministically (rows already ordered by
    * the operator's own total ORDER BY). */
  private def fingerprint(df: DataFrame): String =
    df.collect().map(_.mkString("")).mkString("")

  private def sweep(name: String, input: DataFrame,
                    op: DataFrame => DataFrame): Unit = {
    val fps = layouts.map { p =>
      graft.Caches.releaseAll(); spark.catalog.clearCache()
      p -> fingerprint(op(input.repartition(p)))
    }
    val distinct = fps.map(_._2).distinct
    assert(distinct.size == 1,
      s"$name output depends on the input partition layout: " +
        fps.map { case (p, f) => s"parts=$p -> ${f.hashCode}" }.mkString(", "))
    assert(fps.head._2.nonEmpty, s"$name produced empty output")
  }

  test("pack_sequences is layout-invariant (global prefix sum)") {
    sweep("pack_sequences", docs,
      d => Sampling.packSequences(d).orderBy("doc_id"))
  }

  test("domain_cap and stratified_sample are layout-invariant (windows)") {
    sweep("domain_cap", docs, d => Sampling.domainCap(d).orderBy("source", "rk"))
    sweep("stratified_sample", docs,
      d => Sampling.stratifiedSample(d).orderBy("lang", "rk"))
  }

  test("minhash est + clusters are layout-invariant (joins + iteration)") {
    sweep("minhash_est", docs,
      d => Dedup.minhashJaccardEst(d).orderBy("doc_a", "doc_b"))
    sweep("dedup_clusters", docs,
      d => Dedup.dedupClusters(d).orderBy("doc_id"))
  }

  test("sem_dedup and bm25_rank are layout-invariant (agg + broadcast)") {
    // targetClusterSize=64 keeps the small fixture multi-cluster (k=7)
    // so the sweep exercises real cluster-scoped joins, and the k=0
    // sentinel's count() is itself layout-invariant
    sweep("sem_dedup", emb,
      e => KMeans.semDedup(e, targetClusterSize = 64).orderBy("vec_id"))
    sweep("bm25_rank", docs, d => TextAnalysis.bm25Rank(d).orderBy("rank"))
  }

  test("uniform_sample and dup_spans are layout-invariant (TakeOrdered + joins)") {
    // TakeOrdered merges per-partition top-ks — the (hash, doc_id)
    // tie-break makes the merged k identical under any deal
    sweep("uniform_sample", docs,
      d => Sampling.uniformSample(d, k = 50).orderBy("doc_id"))
    sweep("dup_spans", docs, d => Dedup.dupSpans(d).orderBy("doc_id"))
  }

  test("heavy_hitters is layout-invariant (CMS merges commute)") {
    // the sketch's counter merges are integer adds, so the ESTIMATE
    // (not just the gated flags) must be identical under any partition
    // layout — probe flags + exact counts via the query output
    sweep("heavy_hitters", docs,
      d => TextAnalysis.heavyHitters(d).orderBy("rank"))
  }
}
