package graft

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.model.RouterMessage
import graft.operators.Logstash

/** SURVEY §5.3 property tests (ScalaCheck generators, evaluated in ONE
  * Spark job per property rather than one job per case): JSON
  * round-trip, projection count preservation, invariants of the derived
  * columns. */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private val N = 100

  /** Deterministic sample of n values from a generator. */
  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val strGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(30)),
    Gen.asciiPrintableStr.map(_.take(30)), // quotes, backslashes, etc.
    Gen.const(""),
    Gen.listOfN(8, Gen.oneOf('ü', '東', '"', '\\', '\n', 'x'))
      .map(_.mkString))

  private val msgGen: Gen[RouterMessage] = for {
    data <- strGen
    epochMicros <- Gen.choose(0L, 4102444800000000L) // 1970..2100
    source <- Gen.oneOf("stdout", "stderr")
    cid <- Gen.listOfN(32, Gen.hexChar).map(_.mkString)
    name <- strGen.map("/" + _)
    image <- Gen.oneOf(strGen, strGen.map(_ + ":tag"),
      strGen.map("reg:5000/" + _))
    host <- Gen.alphaNumStr.map(_.take(10))
    labels <- Gen.mapOfN(2, Gen.zip(Gen.alphaNumStr.map(_.take(5)),
      Gen.alphaNumStr.map(_.take(5))))
  } yield RouterMessage(data,
    Timestamp.from(Instant.ofEpochSecond(epochMicros / 1000000L,
      (epochMicros % 1000000L) * 1000L)),
    source, cid, name, image, host, labels)

  private lazy val msgs = sample(msgGen, N)
  private lazy val df = spark.createDataset(msgs).toDF()

  test("round-trip: parse(serialize(doc)) re-serializes to the same JSON") {
    // structs with MAP fields have no Catalyst ordering, so the law is
    // stated on the serialized form: jsonize . parse . jsonize == jsonize
    val schema = Logstash.toV1(df, "dh").schema
    val doc = Logstash.v1Doc(df, "dh")
    val back = df.select(
      Logstash.jsonize(doc).as("orig"),
      Logstash.jsonize(from_json(Logstash.jsonize(doc), schema)).as("rt"))
    val mismatches = back.filter(not(col("orig") <=> col("rt"))).count()
    assert(mismatches == 0L, s"$mismatches of $N rows failed the round-trip")
  }

  test("projection is 1:1 — output count == input count for V0 and V1") {
    assert(Logstash.toV1(df, "dh").count() == N.toLong)
    assert(Logstash.toV0(df, "dh").count() == N.toLong)
    assert(Logstash.producerPayload(df, "dh").count() == N.toLong)
  }

  test("invariants: cid <= 12 chars; image name+tag reassemble; V0/V1 agree") {
    val checked = df.select(
      length(Logstash.shortCid(col("containerId"))).as("cidLen"),
      Logstash.imageName(col("image")).as("n"),
      Logstash.imageTag(col("image")).as("t"),
      col("image"))
    assert(checked.filter(col("cidLen") > 12).count() == 0L)
    // name:tag (when tag nonempty) or name alone == original image
    val reassembled = checked.filter(
      not(when(col("t") === "", col("n"))
        .otherwise(concat(col("n"), lit(":"), col("t"))) === col("image")))
    assert(reassembled.count() == 0L)
    // V0 and V1 carry identical docker structs (compared serialized —
    // set ops and <=> don't support MAP-bearing structs)
    val v0docker = Logstash.toV0(df, "dh")
      .select(to_json(col("@fields.docker")).as("d"))
    val v1docker = Logstash.toV1(df, "dh")
      .select(to_json(col("docker")).as("d"))
    assert(v0docker.exceptAll(v1docker).count() == 0L)
  }

  test("∀ vectors: int8 quantization codes bounded, signs preserved, " +
      "absmax element hits ±127") {
    val vecGen: Gen[Seq[Float]] =
      Gen.listOfN(64, Gen.choose(-8f, 8f)).map(_.toSeq)
    val vecs = sample(vecGen, N).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
    val emb = vecs.toDF("vec_id", "embedding")
    val q = graft.operators.Similarity.quantizeInt8(emb)
      .select("vec_id", "q_first", "q_last", "q_abs_sum")
      .as[(Long, Long, Long, Long)].collect()
    // |floor(x*127/scale)| <= 127 element-wise => abs-sum <= 64*127;
    // the first/last codes are individually bounded
    assert(q.forall(r => math.abs(r._2) <= 127 && math.abs(r._3) <= 127))
    assert(q.forall(_._4 <= 64L * 127L))
    // sign preservation on the sampled elements
    val signs = vecs.map { case (id, v) =>
      id -> (math.signum(v.head), math.signum(v.last)) }.toMap
    q.foreach { r =>
      val (sFirst, sLast) = signs(r._1)
      if (sFirst > 0) assert(r._2 >= 0)
      if (sLast > 0) assert(r._3 >= 0)
      // floor makes negative elements quantize to <= -1, never to +
      if (sFirst < 0) assert(r._2 < 0)
      if (sLast < 0) assert(r._3 < 0)
    }
  }

  test("∀ corpora: two-phase pack assignment == naive exclusive cumsum," +
      " for any budget and block size") {
    import graft.operators.Sampling
    // random doc sizes incl. empty docs and ids with gaps (deletions)
    val lens = sample(Gen.choose(0, 40), 200)
    val ids = sample(Gen.choose(1L, 4L), 200)
      .scanLeft(0L)(_ + _).tail // strictly increasing with gaps
    val docs = ids.zip(lens).map { case (id, n) =>
      (id, Seq.fill(n)("tok").mkString(" "))
    }.toDF("doc_id", "text")
    val naive = {
      val toks = ids.zip(lens).sortBy(_._1)
      toks.scanLeft((0L, 0L, 0L)) { case ((_, _, cum), (id, n)) =>
        (id, n.toLong, cum + n)
      }.tail.map { case (id, n, cum) => (id, n, (cum - n) / 100L) }.toSet
    }
    for (blockSize <- Seq(3L, 17L, 1000L)) {
      val got = Sampling.packSequences(docs, budget = 100L,
          blockSize = blockSize)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == naive, s"blockSize=$blockSize diverged from naive")
    }
  }
}
