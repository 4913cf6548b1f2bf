package graft

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.functions._

import graft.model.RouterMessage
import graft.operators.Logstash

/** SURVEY §5.1-5.2: per-operator unit tests for the P2-P11 transform
  * chain, including the golden byte-exact V0/V1 JSON documents with
  * escaping edge cases (reference field names: logspoutkinesis.go:28-54;
  * split semantics: go:223-229). */
class LogstashSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.from(Instant.parse(s))

  private def one(msg: RouterMessage) =
    spark.createDataset(Seq(msg)).toDF()

  private val base = RouterMessage(
    data = "hello",
    time = ts("2024-03-01T12:34:56.123456Z"),
    source = "stdout",
    containerId = "0123456789abcdef0123456789abcdef",
    containerName = "/web-1",
    image = "svc:latest",
    hostname = "host-a",
    labels = Map("env" -> "prod"))

  // ---- P2: first-colon image split (go :223-229) ----
  test("imageName/imageTag: simple repo:tag") {
    val r = one(base).select(
      Logstash.imageName(col("image")), Logstash.imageTag(col("image")))
      .as[(String, String)].head()
    assert(r == ("svc", "latest"))
  }

  test("imageName/imageTag: no colon -> empty tag") {
    val r = one(base.copy(image = "plain")).select(
      Logstash.imageName(col("image")), Logstash.imageTag(col("image")))
      .as[(String, String)].head()
    assert(r == ("plain", ""))
  }

  test("imageName/imageTag: registry with port splits at FIRST colon") {
    // the reference uses strings.Index (first occurrence), so
    // registry:5000/img:tag -> ("registry", "5000/img:tag")
    val r = one(base.copy(image = "registry:5000/img:tag")).select(
      Logstash.imageName(col("image")), Logstash.imageTag(col("image")))
      .as[(String, String)].head()
    assert(r == ("registry", "5000/img:tag"))
  }

  // ---- P3: cid truncation (go :233) ----
  test("shortCid truncates to 12 chars") {
    val r = one(base).select(Logstash.shortCid(col("containerId")))
      .as[String].head()
    assert(r == "0123456789ab")
  }

  // ---- P4: leading-slash strip (go :234) ----
  test("stripLeadingChar drops Docker's leading slash") {
    val r = one(base).select(Logstash.stripLeadingChar(col("containerName")))
      .as[String].head()
    assert(r == "web-1")
  }

  // ---- P5: RFC3339Nano trailing-zero trim (go :236) ----
  test("rfc3339Nano trims trailing fraction zeros like Go") {
    val times = Seq(
      "2024-03-01T12:34:56.123456Z" -> "2024-03-01T12:34:56.123456Z",
      "2024-03-01T12:34:56.500000Z" -> "2024-03-01T12:34:56.5Z",
      "2024-03-01T12:34:56.000000Z" -> "2024-03-01T12:34:56Z",
      "2024-03-01T12:34:56.120000Z" -> "2024-03-01T12:34:56.12Z")
    times.foreach { case (in, expected) =>
      val r = one(base.copy(time = ts(in)))
        .select(Logstash.rfc3339Nano(col("time"))).as[String].head()
      assert(r == expected, s"for input $in")
    }
  }

  // ---- P7: omitempty (go :32-35) ----
  test("omitempty: tagless image and empty labels vanish from JSON") {
    val msg = base.copy(image = "plain", labels = Map.empty)
    val df = one(msg)
    val json = df.select(Logstash.jsonize(Logstash.v1Doc(df, "dh")))
      .as[String].head()
    assert(!json.contains("image_tag"))
    assert(!json.contains("labels"))
    assert(json.contains("\"image\":\"plain\""))
  }

  // ---- P1/P8/P9/P10/P11: golden documents ----
  test("golden V1 JSON: byte-exact, declaration-order keys, escaping") {
    val msg = base.copy(data = "he said \"hi\" \\ bye")
    val df = one(msg)
    val json = df.select(Logstash.jsonize(Logstash.v1Doc(df, "dockerhost-a")))
      .as[String].head()
    val expected =
      """{"@timestamp":"2024-03-01T12:34:56.123456Z","host":"host-a",""" +
      """"message":"he said \"hi\" \\ bye","docker":{"name":"web-1",""" +
      """"cid":"0123456789ab","image":"svc","image_tag":"latest",""" +
      """"source":"stdout","docker_host":"dockerhost-a",""" +
      """"labels":{"env":"prod"}}}"""
    assert(json == expected)
  }

  test("golden V0 JSON: double-nested @fields layout") {
    val df = one(base)
    val json = df.select(Logstash.jsonize(Logstash.v0Doc(df, "dockerhost-a")))
      .as[String].head()
    val expected =
      """{"@timestamp":"2024-03-01T12:34:56.123456Z","@source_host":"host-a",""" +
      """"@message":"hello","@fields":{"docker":{"name":"web-1",""" +
      """"cid":"0123456789ab","image":"svc","image_tag":"latest",""" +
      """"source":"stdout","docker_host":"dockerhost-a",""" +
      """"labels":{"env":"prod"}}}}"""
    assert(json == expected)
  }

  test("producerPayload emits payload + constant partition key (S4)") {
    val df = one(base)
    val r = Logstash.producerPayload(df, "dh-1")
    assert(r.columns.toSeq == Seq("log_json", "partition_key"))
    assert(r.select("partition_key").as[String].head() == "dh-1")
  }
}
