package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Salted-join skew mitigation: result equality with the plain join,
  * actual spreading of the hot key, and salt determinism (speculative
  * task re-execution must salt identically). */
class SkewSpec extends SparkTestBase {
  import spark.implicits._

  // 1000 rows of the hot key + a handful of others: the Zipf shape
  private def big = ((0 until 1000).map(i => (i.toLong, "hot")) ++
    Seq((2000L, "warm"), (2001L, "warm"), (2002L, "cold")))
    .toDF("id", "k")
  private def small = Seq(("hot", 1L), ("warm", 2L), ("cold", 3L))
    .toDF("k", "v")

  test("salted join returns exactly the unsalted join's rows") {
    val salted = Skew.saltedJoin(big, small, "k", col("id"), salts = 8)
      .select("id", "k", "v")
    val plain = big.join(small, "k").select("id", "k", "v")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0L)
    assert(plain.exceptAll(salted).count() == 0L)
  }

  test("skewProfile: hand-computed shares and salt recommendations") {
    // hot=1000, warm=2, cold=1, total=1003; target 300 → ceil(1000/300)=4
    val rows = Skew.skewProfile(big, "k", topN = 10, targetPerTask = 300L)
      .as[(Int, String, Long, Long, Long)].collect().toList
    assert(rows == List(
      (1, "hot", 1000L, 1000000L * 1000 / 1003, 4L),
      (2, "warm", 2L, 2000000L / 1003, 1L),
      (3, "cold", 1L, 1000000L / 1003, 1L)))
  }

  test("skewProfile: topN bounds the output regardless of key cardinality") {
    val rows = Skew.skewProfile(big, "k", topN = 2, targetPerTask = 300L)
      .as[(Int, String, Long, Long, Long)].collect().toList
    assert(rows.map(r => (r._1, r._2)) == List((1, "hot"), (2, "warm")))
  }

  test("deriveSalts = skewProfile's max rec_salts, and the derived join is exact") {
    // hot=1000, target 300 → ceil = 4; profile must recommend the same
    val derived = Skew.deriveSalts(big, "k", targetPerTask = 300L)
    assert(derived == 4)
    val profileMax = Skew.skewProfile(big, "k", topN = 10, targetPerTask = 300L)
      .agg(max("rec_salts")).as[Long].head()
    assert(derived.toLong == profileMax)
    val auto = Skew.saltedJoin(big, small, "k", col("id"), derived)
      .select("id", "k", "v")
    val plain = big.join(small, "k").select("id", "k", "v")
    assert(auto.exceptAll(plain).count() == 0L &&
      plain.exceptAll(auto).count() == 0L)
    // keys already under the cap derive the identity factor
    assert(Skew.deriveSalts(big.filter(col("k") =!= "hot"), "k", 300L) == 1)
  }

  test("joinCardinality predicts the real join size without running it") {
    // hand-computed: hot 1000·1, warm 2·1, cold 1·1 → 1003 rows, max 1000
    val card = Skew.joinCardinality(big, small, "k")
      .as[(Long, Long, Long)].head()
    assert(card == ((3L, 1003L, 1000L)))
    // differential: the prediction equals the executed join's count
    assert(card._2 == big.join(small, "k").count())
    // no matching keys → all-zero row, not an empty frame
    val none = Skew.joinCardinality(big, small.filter(col("k") === "zzz"), "k")
      .as[(Long, Long, Long)].head()
    assert(none == ((0L, 0L, 0L)))
  }

  test("the hot key actually spreads over multiple salts, deterministically") {
    def salts() = big.filter(col("k") === "hot")
      .withColumn("__salt", pmod(graft.functions.PortableHash
        .hash32(col("id").cast("string")), lit(8L)).cast("int"))
      .groupBy("__salt").count()
      .as[(Int, Long)].collect().toMap
    val s1 = salts()
    assert(s1.size == 8, s"1000 hot rows must hit all 8 salts, got ${s1.size}")
    assert(s1.values.max <= 200L, "no salt bucket hoards the hot key")
    assert(salts() == s1, "salt assignment is deterministic across evaluations")
  }
}
