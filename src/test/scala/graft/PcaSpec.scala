package graft

import org.apache.spark.sql.functions._

import graft.operators.{KMeans, Pca, Stats}

/** Gates for the spectral (power-iteration PCA) and rank-sum operators. */
class PcaSpec extends SparkTestBase {
  import spark.implicits._

  /** Synthetic embeddings whose variance is overwhelmingly along axis
    * `axis`: component `axis` spreads ±(id scaled), every other
    * component is a small constant wiggle. */
  private def axisHeavy(n: Int, axis: Int) = {
    val rows = (0 until n).map { i =>
      val v = Array.tabulate(KMeans.dim)(j =>
        if (j == axis) (i - n / 2).toDouble
        else 0.01 * ((i + j) % 3))
      (i.toLong, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("topComponent: unit norm and alignment with the dominant axis") {
    val r = Pca.topComponent(axisHeavy(200, axis = 5))
      .as[(Long, Long, Long)].collect()
    assert(r.length === KMeans.dim)
    // unit vector: Σ comp² ≈ 1 (micro² lanes; floor loses ≤1e-6/comp)
    val norm2 = r.map { case (_, c, _) => c.toDouble / 1e6 }
      .map(x => x * x).sum
    assert(math.abs(norm2 - 1.0) < 1e-3, s"norm² = $norm2")
    // the dominant axis carries essentially all the weight
    val byJ = r.map { case (j, c, _) => j -> math.abs(c.toDouble / 1e6) }
      .toMap
    assert(byJ(6L) > 0.999, s"axis-6 (1-based) weight = ${byJ(6L)}")
    assert(byJ.filter(_._1 != 6L).values.max < 0.03,
      "off-axis components must be negligible")
    // eigenvalue estimate is shared across rows and positive
    assert(r.map(_._3).distinct.length === 1 && r.head._3 > 0L)
  }

  test("projectionOutliers: extremes of the dominant axis, by magnitude") {
    val r = Pca.projectionOutliers(axisHeavy(100, axis = 0), topK = 4)
      .as[(Long, Long, Long)].collect()
    assert(r.length === 4)
    // magnitudes are non-increasing and equal |proj|
    assert(r.sliding(2).forall { case Array(a, b) => a._3 >= b._3 })
    assert(r.forall { case (_, p, m) => math.abs(p) == m })
    // the farthest-from-center ids (0 and 99) lead the list
    assert(r.take(2).map(_._1).toSet == Set(0L, 99L))
  }

  test("mannWhitney: hand-computed U on a tiny two-group fixture") {
    // A values (cents): 100, 300; B values: 200, 300
    // U_A = #{b<a} + ½#{b=a}: a=100→0; a=300→1 + ½ = 1.5 → U_A=1.5, u2=3
    val ev = Seq(
      (1L, "a", 1.00), (2L, "a", 3.00), (3L, "b", 2.00), (4L, "b", 3.00))
      .toDF("event_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("event_id") * 1000000L))
      .withColumn("user_id", col("event_id"))
    val r = Stats.mannWhitney(ev, "a", "b")
      .as[(Long, Long, Long, Long, Boolean)].head()
    assert(r == ((2L, 2L, 3L, 375000L, false)))
  }

  test("mannWhitney: a clean separation maximizes U and the AUC") {
    // every A value above every B value → U_A = nA·nB, AUC = 1e6
    val ev = ((1 to 30).map(i => (i.toLong, "a", 100.0 + i)) ++
      (31 to 60).map(i => (i.toLong, "b", i / 100.0)))
      .toDF("event_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("event_id") * 1000000L))
      .withColumn("user_id", col("event_id"))
    val r = Stats.mannWhitney(ev, "a", "b")
      .as[(Long, Long, Long, Long, Boolean)].head()
    assert(r._3 == 2L * 30 * 30, "u2 = 2·nA·nB under clean separation")
    assert(r._4 == 1000000L)
    assert(r._5, "clean separation at n=30+30 must be significant")
  }
}
