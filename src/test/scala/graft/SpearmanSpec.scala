package graft

import org.apache.spark.sql.functions._

import graft.operators.{Stats, TextAnalysis}

/** Exact Spearman between the two quality laws (Stats.spearmanQuality):
  * differential against a BigInt recomputation from the collected
  * per-doc scores, and the degenerate zero-variance lane. */
class SpearmanSpec extends SparkTestBase {
  import spark.implicits._

  /** Tie-aware doubled average ranks + sign-explicit ρ² ppm, BigInt. */
  private def spearmanRef(pairs: Seq[(Long, Long)]): (Long, Option[Long]) = {
    def rank2(vs: Seq[Long]): Map[Long, BigInt] = {
      val cnt = vs.groupBy(identity).view.mapValues(_.size).toMap
      cnt.map { case (v, c) =>
        val m = vs.count(_ <= v)
        v -> (BigInt(2) * m - c + 1)
      }
    }
    val rx = rank2(pairs.map(_._1))
    val ry = rank2(pairs.map(_._2))
    val n = BigInt(pairs.size)
    val xs = pairs.map(p => rx(p._1))
    val ys = pairs.map(p => ry(p._2))
    val sx = xs.sum; val sy = ys.sum
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val syy = ys.map(a => a * a).sum
    val num = n * sxy - sx * sy
    val varx = n * sxx - sx * sx
    val vary = n * syy - sy * sy
    val ppm =
      if (varx > 0 && vary > 0)
        Some((((num.sign max 0) * 2 - 1) *
          (BigInt(1000000) * num * num / (varx * vary))).toLong)
      else None
    (pairs.size.toLong, ppm)
  }

  test("spearmanQuality equals the BigInt recomputation on the fixture") {
    val docs = graft.sources.Tables
      .documents(spark, "/root/testdata/sf0.001")
    val xs = TextAnalysis.qualityScoreStaged(docs)
      .select("doc_id", "score").as[(Long, Long)].collect().toMap
    val ys = TextAnalysis.unigramSurprisal(docs)
      .select("doc_id", "surprisal_milli").as[(Long, Long)]
      .collect().toMap
    val pairs = xs.keySet.intersect(ys.keySet).toSeq.sorted
      .map(id => (xs(id), ys(id)))
    val expect = spearmanRef(pairs)
    val got = Stats.spearmanQuality(docs)
      .as[(Long, Option[Long])].head()
    assert(got == expect, s"got $got expected $expect")
    // the metric measures something real on natural-ish text
    assert(got._2.isDefined && got._2.get.abs <= 1000000L)
    Caches.releaseAll()
  }

  test("identical docs: zero rank variance yields NULL ppm") {
    val same = "the quick brown fox jumps over the lazy dog and runs"
    val docs = (1L to 4L).map(id => (id, "src", same)).toSeq
      .toDF("doc_id", "source", "text")
      .withColumn("n_chars", length(col("text")))
      .withColumn("lang", lit("en"))
    val r = Stats.spearmanQuality(docs).as[(Long, Option[Long])].head()
    assert(r == ((4L, None)))
    Caches.releaseAll()
  }
}
