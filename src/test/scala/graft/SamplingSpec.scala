package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Sampling

class SamplingSpec extends SparkTestBase {
  import org.apache.spark.sql.DataFrame

  private lazy val docs: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("kfoldSplit: disjoint exhaustive folds, balanced, salt-keyed") {
    import spark.implicits._
    val a = Sampling.kfoldSplit(docs, k = 5)
      .select("doc_id", "fold").as[(Long, Int)].collect().toMap
    val b = Sampling.kfoldSplit(docs, k = 5)
      .select("doc_id", "fold").as[(Long, Int)].collect().toMap
    assert(a == b, "same corpus must fold identically on re-run")
    assert(a.size == 500, "every doc gets exactly one fold")
    assert(a.values.forall(f => f >= 0 && f < 5))
    // uniform hash: 500 draws at p=0.2 per fold — accept ±4σ (≈±36)
    val sizes = a.values.groupBy(identity).view.mapValues(_.size)
    assert(sizes.size == 5 && sizes.values.forall(n => n > 64 && n < 136),
      s"fold sizes off: ${sizes.toMap}")
    // a different salt is an independent fold family
    val c = Sampling.kfoldSplit(docs, k = 5, salt = "v2")
      .select("doc_id", "fold").as[(Long, Int)].collect().toMap
    assert(a != c, "salt must key the fold family")
    intercept[IllegalArgumentException](Sampling.kfoldSplit(docs, k = 1))
  }

  test("trainTestSplit is deterministic, total, and ~testPermille sized") {
    import spark.implicits._
    val a = Sampling.trainTestSplit(docs, testPermille = 100)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val b = Sampling.trainTestSplit(docs, testPermille = 100)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(a == b, "same corpus must split identically on re-run")
    assert(a.size == 500 && a.values.forall(s => s == "train" || s == "test"))
    val nTest = a.values.count(_ == "test")
    // md5 is uniform: 500 draws at p=0.1 — accept ±4σ (≈±27)
    assert(nTest > 23 && nTest < 77, s"test fraction off: $nTest/500")
    // a different salt is an independent split, not a shifted one
    val c = Sampling.trainTestSplit(docs, testPermille = 100, salt = "v2")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(a != c, "salt must key the split family")
  }

  test("stratifiedSample takes exactly min(k, |stratum|) lowest-hash docs") {
    import spark.implicits._
    val out = Sampling.stratifiedSample(docs, perStratum = 50)
    val perLang = out.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    // every sf0.001 lang has >= 64 docs, so every stratum is exactly 50
    assert(perLang.values.forall(_ == 50L), s"per-stratum sizes: $perLang")
    // ranks are 1..50 dense per stratum
    val ranks = out.groupBy("lang").agg(min("rk"), max("rk"),
        countDistinct("rk")).collect()
    assert(ranks.forall(r => r.getInt(1) == 1 && r.getInt(2) == 50
      && r.getLong(3) == 50L))
  }

  test("deriveBlockSize bounds the single-task block-totals stage at any corpus size") {
    // the r6 verdict nit: a FIXED blockSize default regrows the serial
    // block-totals window at 1e13 docs (1e7 rows through one task).
    // The derived size keeps it ≤ targetBlocks+1 for any id range.
    for (maxId <- Seq(0L, 499L, 1000000L, 10000000000000L, Long.MaxValue)) {
      val blk = Sampling.deriveBlockSize(maxId)
      assert(blk >= 1L)
      val nBlocks = maxId / blk + 1
      assert(nBlocks <= 1000001L, s"maxId=$maxId blk=$blk blocks=$nBlocks")
    }
    // auto mode (the blockSize<=0 default) is the same operator — the
    // blockSize-invariance property guarantees identical pack output
    import spark.implicits._
    val auto = Sampling.packSequences(docs, budget = 512L)
      .as[(Long, Long, Long)].collect().toSet
    val pinned = Sampling.packSequences(docs, budget = 512L, blockSize = 7L)
      .as[(Long, Long, Long)].collect().toSet
    assert(auto == pinned, "auto-derived blockSize must not change pack assignment")
  }

  test("packSequences: block-phased prefix sum == single global cumsum") {
    import spark.implicits._
    // block size chosen to NOT divide the corpus evenly, and a second
    // one to force many tiny blocks — pack assignment must not depend
    // on the blocking at all
    val a = Sampling.packSequences(docs, budget = 512L, blockSize = 7L)
      .as[(Long, Long, Long)].collect().toSet
    val b = Sampling.packSequences(docs, budget = 512L, blockSize = 1000L)
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b, "pack assignment must be blockSize-invariant")
    // exclusive-prefix semantics: first doc is always pack 0; packs are
    // contiguous and nondecreasing in doc_id order
    val byDoc = a.toSeq.sortBy(_._1)
    assert(byDoc.head._3 == 0L)
    assert(byDoc.sliding(2).forall {
      case Seq((_, _, p1), (_, _, p2)) => p2 >= p1 && p2 - p1 <= 16
      case _ => true
    }, "pack ids must be nondecreasing along doc order")
    // every pack except possibly the last holds >= budget tokens when
    // closed (a pack only closes because the running sum crossed it)
    val packTokens = byDoc.groupBy(_._3).view.mapValues(_.map(_._2).sum)
    val lastPack = byDoc.last._3
    packTokens.filter(_._1 != lastPack).foreach { case (p, tot) =>
      assert(tot >= 1, s"pack $p empty")
    }
  }

  test("importanceSample: deterministic, clamped, hash-consistent") {
    import spark.implicits._
    val out = Sampling.importanceSample(docs)
      .as[(Long, Long, Long, Boolean)].collect()
    assert(out.length == 500)
    assert(out.forall { case (_, _, p, _) => p >= 0L && p <= 900000L })
    // higher prob_micro can only raise the sampled rate
    val (hi, lo) = out.partition(_._3 >= 500000L)
    if (hi.nonEmpty && lo.nonEmpty) {
      val rHi = hi.count(_._4).toDouble / hi.length
      val rLo = lo.count(_._4).toDouble / lo.length
      assert(rHi >= rLo, s"sampling rate must follow prob: $rHi vs $rLo")
    }
    val again = Sampling.importanceSample(docs)
      .as[(Long, Long, Long, Boolean)].collect()
    assert(out.sortBy(_._1).sameElements(again.sortBy(_._1)))
  }

  test("domainCap two-phase == naive single-window rank (differential)") {
    import spark.implicits._
    val twoPhase = Sampling.domainCap(docs, cap = 10, salts = 4)
      .select("source", "rk", "doc_id").as[(String, Int, Long)].collect().toSet
    val naive = docs.withColumn("rk", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("doc_id"))))
      .filter(col("rk") <= 10)
      .select(col("source"), col("rk").cast("int"), col("doc_id"))
      .as[(String, Int, Long)].collect().toSet
    assert(twoPhase == naive,
      "salted two-phase top-k must keep exactly the naive window's rows")
    assert(twoPhase.groupBy(_._1).forall(_._2.size == 10))
  }

  test("qualityDeciles: monotone in score, total, 1..10, near-balanced") {
    import spark.implicits._
    val r = Sampling.qualityDeciles(docs)
      .select("doc_id", "score", "decile")
      .as[(Long, Long, Long)].collect()
    assert(r.length == docs.count(), "every doc gets a decile")
    assert(r.forall(x => x._3 >= 1 && x._3 <= 10))
    // deciles must be a monotone function of the score
    val byScore = r.sortBy(_._2)
    byScore.sliding(2).foreach {
      case Array(lo, hi) => assert(lo._3 <= hi._3,
        s"decile not monotone: $lo vs $hi")
      case _ =>
    }
    // percentile cuts keep buckets within 2x of even (ties permitting)
    val sizes = r.groupBy(_._3).view.mapValues(_.length)
    assert(sizes.values.max <= r.length / 5,
      s"a decile collapsed the distribution: ${sizes.toMap}")
    assert(sizes.size >= 8, s"expected ~10 distinct deciles: ${sizes.toMap}")
  }

  test("uniformSample: exact size, deterministic, layout-independent, prefix-nested") {
    import spark.implicits._
    val k50 = Sampling.uniformSample(docs, k = 50)
      .select("doc_id").as[Long].collect().toSet
    assert(k50.size == 50)
    // same draw on re-run AND under a different physical layout
    val again = Sampling.uniformSample(docs.repartition(7), k = 50)
      .select("doc_id").as[Long].collect().toSet
    assert(k50 == again, "sample must not depend on partitioning or run")
    // hash order is a fixed permutation: smaller k is a prefix of larger
    val k100 = Sampling.uniformSample(docs, k = 100)
      .select("doc_id").as[Long].collect().toSet
    assert(k50.subsetOf(k100), "k=50 must be a prefix of k=100")
    // k >= corpus returns everything
    val all = Sampling.uniformSample(docs, k = 100000)
      .select("doc_id").as[Long].collect()
    assert(all.length == docs.count())
    // a different salt is an independent permutation
    val other = Sampling.uniformSample(docs, k = 50, salt = "v2")
      .select("doc_id").as[Long].collect().toSet
    assert(k50 != other, "salt must key the draw")
  }

  test("weightedSample: deterministic, size-biased, priority-exact") {
    import spark.implicits._
    val r = Sampling.weightedSample(docs, k = 100)
      .as[(Long, String, Long, Long)].collect()
    assert(r.length == 100)
    // layout independence: repartitioned input draws the same set
    val again = Sampling.weightedSample(docs.repartition(7), k = 100)
      .as[(Long, String, Long, Long)].collect()
    assert(r.map(_._1).toSet == again.map(_._1).toSet)
    // the emitted priority IS the lane the rank used: recompute per row
    r.foreach { case (id, _, w, pri) =>
      val u = java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils
          .md5Hex(s"wsamp:$id").substring(0, 8), 16)
      assert(pri == 1000000L * u / math.max(w, 1L), s"doc $id lane")
    }
    // size bias: the weighted draw's mean doc length must exceed the
    // uniform draw's (P[i] ~ w_i under priority sampling)
    val uni = Sampling.uniformSample(docs, k = 100)
      .select("doc_id").as[Long].collect().toSet
    val lens = docs.select("doc_id", "n_chars")
      .as[(Long, Long)].collect().toMap
    val wMean = r.map(x => lens(x._1)).sum.toDouble / r.length
    val uMean = uni.toSeq.map(lens).sum.toDouble / uni.size
    assert(wMean > uMean,
      s"weighted mean $wMean must exceed uniform mean $uMean")
  }

  test("domainMix: binding domain keeps all, others thin to target shares") {
    import spark.implicits._
    // a: 100 docs / target 500‰ -> binding (100e6/500 is the min ratio)
    // b: 300 docs / target 500‰ -> keep rate 333333 ppm (~100 expected)
    // c: 50 docs, NOT in targets -> dropped entirely
    val mixDocs = ((0L until 100L).map(i => (i, "a", "en")) ++
      (100L until 400L).map(i => (i, "b", "en")) ++
      (400L until 450L).map(i => (i, "c", "en")))
      .toDF("doc_id", "source", "lang")
    val out = Sampling.domainMix(mixDocs, Map("a" -> 500, "b" -> 500))
      .select("doc_id", "source").as[(Long, String)].collect()
    val bySrc = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc.getOrElse("a", 0) == 100, "binding domain must keep all")
    assert(!bySrc.contains("c"), "untargeted domains must drop")
    // b draws Bernoulli(1/3) over 300 docs: mean 100, σ≈8.2 — accept ±5σ
    val nb = bySrc.getOrElse("b", 0)
    assert(nb > 59 && nb < 141, s"b keep count off: $nb/300 at p=1/3")
    // deterministic: same corpus, same targets -> identical mixture,
    // regardless of physical layout
    val again = Sampling.domainMix(mixDocs.repartition(7),
        Map("a" -> 500, "b" -> 500))
      .select("doc_id").as[Long].collect().toSet
    assert(out.map(_._1).toSet == again, "mixture must be retry-stable")
  }

  test("domainMix: binding domain keeps all even when quantization doesn't cancel") {
    import spark.implicits._
    import graft.functions.PortableHash
    // n=3, t=7: M = floor(3e6/7) = 428571 and (7·M) div 3 = 999999 — the
    // composed divisions lose one ppm, so a doc whose salted draw lands
    // on the last ppm cell would be dropped by a naive least(1e6, ·)
    // rate. Find exactly such a victim id and put it IN the binding
    // domain: the binding-ratio pin must keep it.
    val victim = spark.range(0, 3000000)
      .filter(PortableHash.hash32(
        concat(lit("mix:"), col("id").cast("string"))) % 1000000 === 999999)
      .select(min(col("id"))).as[Long].head()
    val mixDocs = (Seq(victim, victim + 3000000L, victim + 6000000L)
        .map(i => (i, "a", "en")) ++
      (0L until 1000L).map(i => (i, "b", "en")))
      .toDF("doc_id", "source", "lang")
    val out = Sampling.domainMix(mixDocs, Map("a" -> 7, "b" -> 1))
      .select("doc_id", "source").as[(Long, String)].collect()
    val aKept = out.filter(_._2 == "a").map(_._1).toSet
    assert(aKept.contains(victim),
      "binding domain must keep its last-ppm-cell doc (exact 1e6 rate)")
    assert(aKept.size == 3, "binding domain must keep ALL its docs")
  }

  test("domainMix: achieved proportions match targets within quantization") {
    import spark.implicits._
    // equal supply, skewed targets 50/30/20 — the SparkEntry gate shape
    val mixDocs = (0L until 900L).map(i =>
      (i, s"s${i % 3}", "en")).toDF("doc_id", "source", "lang")
    val out = Sampling.domainMix(mixDocs,
        Map("s0" -> 500, "s1" -> 300, "s2" -> 200))
      .select("source").as[String].collect()
    val n = out.groupBy(identity).view.mapValues(_.length).toMap
    // s0 binds (largest target over equal supply) -> keeps all 300;
    // expected s1 = 180, s2 = 120 (Bernoulli: σ≈11 and ≈10 — ±5σ)
    assert(n("s0") == 300)
    assert(n("s1") > 125 && n("s1") < 235, s"s1 off: ${n("s1")}")
    assert(n("s2") > 70 && n("s2") < 170, s"s2 off: ${n("s2")}")
  }

  test("temporalSplit: exact rank-select cutoff; ties stay on one side") {
    import spark.implicits._
    import java.sql.Timestamp
    // 10 events: 6 distinct µs then a 3-way tie then one more.
    // 80% of 10 = 8: cum at tie-µs (rows 7,8,9 share ts) reaches 9 —
    // the first µs with cum*100 >= 800 is the TIE µs, all of it train.
    val times = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 7L, 7L, 8L)
    val ev = times.zipWithIndex.map { case (sec, i) =>
      (i.toLong, new Timestamp(sec * 1000L))
    }.toDF("event_id", "ts")
    val r = Sampling.temporalSplit(ev, trainPct = 80)
      .as[(Long, Long, Long, Long)].head()
    assert(r == ((7000000L, 9L, 1L, 900000L)),
      s"cutoff must land on the tie and keep it whole: $r")
    // the split predicate reproduces the counts (no leakage, no gap)
    val nTrain = ev.filter(unix_micros(col("ts")) <= r._1).count()
    assert(nTrain == r._2 && ev.count() - nTrain == r._3)
  }

  test("packFill: per-pack totals, fill pct, and first-doc-only overflow") {
    import spark.implicits._
    // token counts: 6,6,6,20,6 with budget 10 — exclusive prefix sums
    // 0,6,12,18,38: packs 0,0,1,1,3. Pack 1 = 6+20 = 26 tokens BUT its
    // first doc entered under budget (prefix 12 -> pack 1) and the
    // 20-token doc STARTS there: overflow flag fires on pack 1 only.
    val d = Seq(
      (1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "a b c d e f"),
      (4L, (1 to 20).map(i => s"w$i").mkString(" ")),
      (5L, "a b c d e f")).toDF("doc_id", "text")
    val r = Sampling.packFill(d, budget = 10L)
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .sortBy(_._1).toSeq
    assert(r == Seq(
      (0L, 2L, 12L, 120L, true),   // 6+6 crosses 10 at the tail: 120%
      (1L, 2L, 26L, 260L, true),   // the giant doc lands here
      (3L, 1L, 6L, 60L, false)))
    // totals conserve the corpus
    assert(r.map(_._3).sum == 12L + 26L + 6L)
  }

  test("temperatureMix: sqrt weights flatten the head, boost the tail") {
    import spark.implicits._
    // A 9 docs, B 1: w = (3, 1), tn = 10, tw = 4 — natural 9:1
    // flattens to 3:1; A's boost < 1e6 (downsampled), B's 2.5e6
    val d = ((1L to 9L).map(i => (i, "t", "A")).toList :+
      ((10L, "t", "B")))
      .toDF("doc_id", "text", "source")
    val r = graft.operators.Sampling.temperatureMix(d)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq(("A", 9L, 900000L, 750000L, 833333L),
      ("B", 1L, 100000L, 250000L, 2500000L)))
  }
}
