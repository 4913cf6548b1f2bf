package graft

import graft.operators.LinearProbe

/** Gates for the deterministic GD linear probe (LinearProbe.scala):
  * a hand-computed single round, sign/direction on a separable corpus,
  * and run-to-run determinism (the fixed-point gradient claim). */
class LinearProbeSpec extends SparkTestBase {

  import spark.implicits._

  private def docs(rows: (Long, String, String, Long)*) =
    rows.toDF("doc_id", "text", "lang", "n_chars")

  private def weights(rows: Array[(String, Long)]) = rows.toMap

  test("one round matches the closed form") {
    // doc1: x=(1, 1, 2/64, 1)   y=1 ; doc2: x=(1, 2, 2/64, 0.5) y=0
    // w=0 → p=0.5 → quantized sums G=(0, 500000, 0, -250000), n=2
    // w' = -0.5·(G/1e6/2) = (0, -0.125, 0, 0.0625)
    val w = weights(LinearProbe.train(
      docs((1L, "a b", "en", 1024L), (2L, "a a", "fr", 2048L)),
      iters = 1)
      .as[(String, Long)].collect())
    assert(w == Map("bias" -> 0L, "chars_1k" -> -125000L,
      "tokens_64" -> 0L, "ttr" -> 62500L))
    Caches.releaseAll()
  }

  test("separable corpus: the discriminative feature gets the sign") {
    // en docs are long, non-en short; everything else identical → the
    // chars_1k weight must come out positive (longer ⇒ more en-like)
    val d = docs(
      (1L, "w x", "en", 4096L), (2L, "w x", "en", 4096L),
      (3L, "w x", "fr", 512L), (4L, "w x", "de", 512L))
    val w = weights(LinearProbe.train(d, iters = 3)
      .as[(String, Long)].collect())
    assert(w("chars_1k") > 0L,
      s"expected positive chars_1k weight, got $w")
    Caches.releaseAll()
  }

  test("calibration: zero-round probe scores exactly 0.5 — one bin") {
    // w = 0 → every doc lands at conf 500000, bin 5; 2 of 4 docs en
    // → acc 500000, gap 0: a perfectly calibrated constant predictor
    val d = docs(
      (1L, "a b", "en", 100L), (2L, "c d", "en", 200L),
      (3L, "e f", "fr", 300L), (4L, "g h", "de", 400L))
    val r = LinearProbe.calibration(d, iters = 0)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq((5L, 4L, 500000L, 500000L, 0L)))
    Caches.releaseAll()
  }

  test("calibration: one-round weights score the closed-form confs") {
    // the one-round fixture's floored micro weights are exact doubles
    // (-0.125, 0.0625): doc1 conf = 484375, doc2 = 445312 — both bin
    // 4, conf_micro = 929687 div 2 = 464843, acc 500000, gap 35157
    val d = docs((1L, "a b", "en", 1024L), (2L, "a a", "fr", 2048L))
    val r = LinearProbe.calibration(d, iters = 1)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq((4L, 2L, 464843L, 500000L, 35157L)))
    Caches.releaseAll()
  }

  test("crossValidate: folds partition the corpus; accuracies bounded") {
    // 20 docs, 5 folds: n_test sums to the corpus; every acc_ppm in
    // [0, 1e6]; fold ids are exactly 0..4 (salted hash covers all)
    val d = docs((1L to 20L).map(i =>
      (i, s"w$i x", if (i % 2 == 0) "en" else "fr", 100L * i)): _*)
    val r = LinearProbe.crossValidate(d, k = 5, iters = 1)
      .as[(Long, Long, Long, Option[Long])].collect().toSeq
    assert(r.map(_._1) == (0L to 4L))
    assert(r.map(_._2).sum == 20L)
    assert(r.forall(x => x._3 <= x._2))
    assert(r.flatMap(_._4).forall(a => a >= 0L && a <= 1000000L))
    Caches.releaseAll()
  }

  test("crossValidate: a perfectly separable corpus scores 1e6 per fold") {
    // en docs long, others short, strongly separable on chars_1k —
    // three GD rounds push every held-out doc to the right side
    val d = docs((1L to 30L).map(i =>
      (i, "w x", if (i % 2 == 0) "en" else "fr",
        if (i % 2 == 0) 65536L else 16L)): _*)
    val r = LinearProbe.crossValidate(d, k = 3, iters = 3)
      .as[(Long, Long, Long, Option[Long])].collect().toSeq
    assert(r.forall(_._4.contains(1000000L)),
      s"separable corpus must be perfectly classified per fold: $r")
    Caches.releaseAll()
  }

  test("training is bit-deterministic across runs") {
    val d = docs(
      (1L, "a b c a", "en", 100L), (2L, "d d d", "fr", 900L),
      (3L, "e f", "en", 300L), (4L, "g g h", "zh", 700L))
    val a = LinearProbe.train(d).as[(String, Long)].collect().toSeq
    Caches.releaseAll()
    val b = LinearProbe.train(d).as[(String, Long)].collect().toSeq
    assert(a == b)
    Caches.releaseAll()
  }

  private def band(id: Long): Long =
    java.lang.Long.parseLong(org.apache.commons.codec.digest.DigestUtils
      .md5Hex(s"conf:$id").substring(0, 8), 16) % 10

  test("conformal: structural invariants + the coverage guarantee") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val r = LinearProbe.conformal(d)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(r.length == 1)
    val (nCal, q, nTest, cov, set) = r.head
    assert(nCal > 0 && nTest > 0)
    assert(q >= 0L && q <= 1000000L)
    // covered rows have the true label in the set, so every covered
    // row contributes >= 1 to set size: exact structural inequality
    assert(set >= cov / 1000, s"set $set vs coverage $cov")
    // finite-sample 90% guarantee with slack for split noise
    assert(cov >= 800000L, s"coverage collapsed: $cov")
    Caches.releaseAll()
    // bit-deterministic on re-run
    val r2 = LinearProbe.conformal(d)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(r == r2)
    Caches.releaseAll()
  }

  test("conformal: empty calibration slice degrades to full sets") {
    // keep only docs whose salted band avoids the calibration slice
    // {6,7}: q must clamp to 1e6 -> coverage 100%, every set = {0,1}
    val ids = (1L to 400L).filter(i => band(i) != 6L && band(i) != 7L)
    val d = ids.map(i =>
        (i, "w x", if (i % 2 == 0) "en" else "fr", 100L))
      .toDF("doc_id", "text", "lang", "n_chars")
    val r = LinearProbe.conformal(d)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(r.length == 1)
    val (nCal, q, nTest, cov, set) = r.head
    assert(nCal == 0L)
    assert(nTest > 0L)
    assert(q == 1000000L, s"empty calibration must clamp q: $q")
    assert(cov == 1000000L && set == 2000L)
    Caches.releaseAll()
  }

  test("brier: the zero-round constant predictor is pure uncertainty") {
    // iters=0 → conf 500000 everywhere; balanced labels → base 1/2:
    // BS = 250000 micro, REL = RES = 0, UNC = 250000 (BS = REL−RES+UNC)
    val d = docs((1L, "a", "en", 100L), (2L, "b", "en", 200L),
      (3L, "c", "fr", 300L), (4L, "d", "fr", 400L))
    val r = LinearProbe.brier(d, iters = 0)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(r == ((4L, 250000L, 0L, 0L, 500000L, 250000L)))
    Caches.releaseAll()
  }

  test("brier: a separable trained probe scores far below the " +
    "constant predictor; decomposition parts stay consistent") {
    val d = docs((1L to 30L).map(i =>
      (i, "w x", if (i % 2 == 0) "en" else "fr",
        if (i % 2 == 0) 65536L else 16L)): _*)
    val (n, bs, rel, res, base, unc) = LinearProbe.brier(d)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(n == 30L && base == 500000L && unc == 250000L)
    assert(bs < 250000L, "training must beat the constant predictor")
    assert(rel >= 0L && res >= 0L && res <= unc + 1L)
    // Murphy identity up to the documented floored-mean quantization
    assert(math.abs(bs - (rel - res + unc)) < 2000L,
      s"BS=$bs REL=$rel RES=$res UNC=$unc")
    Caches.releaseAll()
  }

  test("auc: the zero-round constant predictor is pure ties at " +
    "exactly 1/2; a separable trained probe reaches 1") {
    val d = docs((1L to 30L).map(i =>
      (i, "w x", if (i % 2 == 0) "en" else "fr",
        if (i % 2 == 0) 65536L else 16L)): _*)
    val tie = LinearProbe.auc(d, iters = 0)
      .as[(Long, Long, Long)].head()
    assert(tie == ((15L, 15L, 500000L)),
      "constant conf → every pair a tie → AUC exactly 1/2")
    val sep = LinearProbe.auc(d).as[(Long, Long, Long)].head()
    assert(sep == ((15L, 15L, 1000000L)),
      "separable corpus must rank every positive above every negative")
    Caches.releaseAll()
  }

  test("auc: a single-class corpus reports the floored zero, not an " +
    "error") {
    val d = docs((1L, "a", "en", 100L), (2L, "b", "en", 200L))
    assert(LinearProbe.auc(d).as[(Long, Long, Long)].head()
      == ((2L, 0L, 0L)))
    Caches.releaseAll()
  }

  test("labelNoise: the planted mislabel tops the extremity ranking") {
    // strongly separable (en ⇔ long): 30 clean docs + doc 99, which
    // has the full positive feature signature but carries label fr —
    // the probe scores it like the positives, so its extremity
    // (= conf for a 0-label) must beat every clean doc's.
    val clean = (1L to 30L).map(i =>
      (i, "w x", if (i % 2 == 0) "en" else "fr",
        if (i % 2 == 0) 65536L else 16L))
    val d = docs(clean :+ ((99L, "w x", "fr", 65536L)): _*)
    val r = LinearProbe.labelNoise(d, topK = 31)
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(r.head._1 == 99L, s"mislabel must rank first: ${r.take(3)}")
    assert(r.head._2 == 0L, "the suspect carries the wrong 0 label")
    // the ranking is by extremity desc and every value is a valid
    // distance-from-own-label confidence
    assert(r.map(_._4) == r.map(_._4).sorted.reverse)
    r.foreach { case (_, label, conf, ext, flagged) =>
      assert(ext == (if (label == 0L) conf else 1000000L - conf))
      assert(flagged == (ext >= 800000L))
    }
    Caches.releaseAll()
  }

  test("labelNoise: a clean separable corpus flags nothing") {
    val d = docs((1L to 30L).map(i =>
      (i, "w x", if (i % 2 == 0) "en" else "fr",
        if (i % 2 == 0) 65536L else 16L)): _*)
    val r = LinearProbe.labelNoise(d, topK = 30)
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(r.forall(!_._5), s"no clean doc may be flagged")
    Caches.releaseAll()
  }
}
