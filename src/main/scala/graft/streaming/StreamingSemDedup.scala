package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SemDeDup — the unbounded-stream sibling of
  * [[graft.operators.KMeans.semDedupInc]]: as embedded assets arrive,
  * each assigns to the nearest centroid of the STAGED Lloyd model (the
  * kmeans_model artifact the nightly pass trains — the stream never
  * re-clusters) and emits its duplicate verdict against the cluster's
  * previously-seen members only. This is the online admission gate an
  * embedding-indexed corpus runs at ingestion: pay for storage and
  * indexing only when the arrival is semantically novel.
  *
  * Shape mirrors [[StreamingHashDedup]]: the stateless step is the
  * broadcast centroid assign (k centroids ride the closure — the same
  * k-row broadcast as the batch op, with the identical (d2, cid)
  * min tie-break); the stateful step keys by cluster id — the key the
  * batch dedup equi-joins on — and keeps each cluster's seen (vec_id,
  * vector, norm²) entries in `flatMapGroupsWithState` state. An
  * arrival's candidate set is its cluster's members (|corpus|/k by
  * the derived-k dial), never corpus-wide; the duplicate rule is the
  * batch rule verbatim: floor(cosine·1e6) ≥ minSimMicro.
  *
  * Within a trigger, arrivals process in vec_id order and earlier
  * arrivals are priors of later ones — exactly semDedupInc's
  * lower-id-batch-member rule, so replaying corpus-then-batch through
  * the stream reproduces the batch verdicts (the differential spec).
  * Duplicate vec_id re-arrivals are dropped O(1) via the seen set
  * (the ADVICE r15 #4 discipline). State bounding (ADVICE r16 #2 —
  * unbounded full-vector state is the production footgun, so the
  * unbounded configuration is now BATCH-ONLY): a streaming input must
  * arm `stateTtlMs > 0` (processing-time timeout per cluster, sized
  * to the dedup lookback window — pair with a paced trigger, as
  * [[StreamingNearDup]] documents) or `maxMembers > 0` (each cluster
  * retains its most-recent maxMembers vectors — a per-cluster
  * lookback that trades recall against arrivals older than the cap
  * for O(maxMembers·d) bounded compare cost); the unbounded TTL-0 /
  * cap-0 combination is reserved for the batch-execution differential
  * gate, where state must survive the whole run by definition and
  * the run itself bounds it.
  *
  * RECALL CAVEAT (r19, measured): the cluster-scoped candidate set
  * inherits SemDeDup's cell-split loss — the
  * `sem_dedup_cell_loss_sweep` instruments price it (~90% of
  * τ=0.95 truth pairs cross cells at sf0.1; 16–23% even at τ=0.98),
  * and the banded sign-code stream ([[StreamingHashDedup]] over
  * [[graft.operators.Similarity.signCodes]], the gated
  * `embed_binary_stream` composition) was measured to capture ALL of
  * that truth geometrically (`sem_dedup_crosscell_capture`). An
  * online pipeline that cannot afford cell-split misses should run
  * the sign-code stream as its admission gate, or beside this one. */
object StreamingSemDedup {

  case class AssignedVec(vec_id: Long, cluster: Int, v: Seq[Double])
  case class VecEntry(vec_id: Long, v: Seq[Double], norm2: Double)
  case class ClusterMembers(entries: Seq[VecEntry])

  /** Per-arrival verdict: duplicate-partner count within the cluster
    * and the keep decision (the semDedupInc output row). */
  case class SemVerdict(vec_id: Long, cluster: Int, n_dup: Long,
                        kept: Boolean)

  /** `emb`: a (vec_id, embedding) frame or stream. `centroids`: the
    * staged model's (cid, centroid) rows — k rows, driver-side by
    * construction (the model artifact, not data). */
  def semDedupStream(emb: DataFrame, centroids: Seq[(Int, Seq[Double])],
                     minSimMicro: Long = 350000L,
                     stateTtlMs: Long = 0L,
                     maxMembers: Int = 0): Dataset[SemVerdict] = {
    require(centroids.nonEmpty, "semDedupStream needs a trained model")
    require(!emb.isStreaming || stateTtlMs > 0L || maxMembers > 0,
      "a streaming input must bound its state: arm stateTtlMs (lookback " +
        "window) or maxMembers (per-cluster cap); TTL 0 + cap 0 is " +
        "reserved for the batch differential path")
    val spark = emb.sparkSession
    import spark.implicits._
    // ascending cid + strict < replicates the batch (d2, cid) min
    val cents: Array[(Int, Array[Double])] =
      centroids.sortBy(_._1).map { case (c, v) => (c, v.toArray) }.toArray
    val assigned = emb
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .as[(Long, Seq[Double])]
      .map { case (id, v) =>
        val a = v.toArray
        var best = cents(0)._1
        var bestD = Double.MaxValue
        cents.foreach { case (cid, c) =>
          var d = 0d
          var j = 0
          while (j < a.length) { val t = a(j) - c(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = cid }
        }
        AssignedVec(id, best, v)
      }
    val timeoutConf =
      if (stateTtlMs > 0L) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout

    def onCluster(key: Int, arrivals: Iterator[AssignedVec],
                  state: GroupState[ClusterMembers])
        : Iterator[SemVerdict] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        val entries = scala.collection.mutable.ArrayBuffer.empty[VecEntry]
        state.getOption.foreach(m => entries ++= m.entries)
        val seen = scala.collection.mutable.HashSet.empty[Long]
        entries.foreach(e => seen += e.vec_id)
        // armed cap: a CONTINUOUS most-recent-maxMembers window — the
        // start pointer advances as arrivals land, so mid-trigger
        // arrivals see the same bounded lookback a cross-trigger one
        // does (eviction order = arrival order). `seen` tracks the
        // LIVE window only: an evicted vec_id leaves with its entry,
        // so a re-arrival of an evicted vec is admitted as new
        // mid-trigger exactly as in a later trigger (ADVICE r17 #3)
        var start = 0
        val out = Seq.newBuilder[SemVerdict]
        arrivals.toSeq.sortBy(_.vec_id).foreach { d =>
          if (seen.add(d.vec_id)) {
            val dv = d.v.toArray
            var n2 = 0d
            var j = 0
            while (j < dv.length) { n2 += dv(j) * dv(j); j += 1 }
            var nDup = 0L
            var ei = start
            while (ei < entries.length) {
              val e = entries(ei)
              val ev = e.v.toArray
              var dot = 0d
              var i = 0
              while (i < ev.length) { dot += ev(i) * dv(i); i += 1 }
              val sim = dot / (math.sqrt(e.norm2) * math.sqrt(n2))
              if (math.floor(sim * 1000000d).toLong >= minSimMicro)
                nDup += 1L
              ei += 1
            }
            out += SemVerdict(d.vec_id, key, nDup, nDup == 0L)
            entries += VecEntry(d.vec_id, d.v, n2)
            if (maxMembers > 0 && entries.length - start > maxMembers) {
              seen -= entries(start).vec_id
              start += 1
            }
          }
        }
        state.update(ClusterMembers(entries.drop(start).toSeq))
        if (stateTtlMs > 0L) state.setTimeoutDuration(stateTtlMs)
        out.result().iterator
      }
    }

    assigned.groupByKey(_.cluster)
      .flatMapGroupsWithState[ClusterMembers, SemVerdict](
        OutputMode.Append, timeoutConf)(onCluster)
  }
}
