package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

/** Contract of the write-once/read-many artifact registry every staged
  * operator family now leans on. */
class StageSpec extends SparkTestBase {
  import spark.implicits._

  private val seq = new AtomicInteger(0)
  private def freshKey(tag: String): String =
    s"stagespec_${tag}_${seq.incrementAndGet()}"

  test("parquet: build runs exactly once per key; read-back matches") {
    val builds = new AtomicInteger(0)
    def build = {
      builds.incrementAndGet()
      Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    }
    val k = freshKey("once")
    val r1 = Stage.parquet(spark, k)(build)
    val r2 = Stage.parquet(spark, k)(build)
    assert(builds.get() == 1, "second call must hit the artifact")
    assert(r1.orderBy("id").collect().toSeq ==
      r2.orderBy("id").collect().toSeq)
    assert(r2.as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
  }

  test("parquet: distinct keys stage distinct artifacts") {
    val a = Stage.parquet(spark, freshKey("a"))(Seq(1L).toDF("x"))
    val b = Stage.parquet(spark, freshKey("b"))(Seq(2L).toDF("x"))
    assert(a.as[Long].head() == 1L && b.as[Long].head() == 2L)
  }

  test("key: same logical plan and params agree; either differing changes it") {
    val d1 = Seq((1L, "t")).toDF("doc_id", "text")
    val d2 = Seq((1L, "t")).toDF("doc_id", "text")
    val d3 = Seq((2L, "u")).toDF("doc_id", "text")
    assert(Stage.key(d1, "tag", 8) == Stage.key(d2, "tag", 8),
      "semantically equal plans must share the artifact")
    assert(Stage.key(d1, "tag", 8) != Stage.key(d1, "tag", 9))
    assert(Stage.key(d1, "tag", 8) != Stage.key(d1, "other", 8))
    assert(Stage.key(d1, "tag", 8) != Stage.key(d3, "tag", 8),
      "different source data must stage separately")
  }

  test("dir: multi-artifact build writes once, subpaths read back") {
    val builds = new AtomicInteger(0)
    val k = freshKey("dir")
    def resolve() = Stage.dir(k) { dir =>
      builds.incrementAndGet()
      Seq(1L, 2L).toDF("x").write.parquet(s"$dir/left")
      Seq(3L).toDF("y").write.parquet(s"$dir/right")
    }
    val d1 = resolve(); val d2 = resolve()
    assert(d1 == d2 && builds.get() == 1)
    assert(spark.read.parquet(s"$d1/left").count() == 2L)
    assert(spark.read.parquet(s"$d1/right").as[Long].head() == 3L)
  }

  test("staged operators bypass staging for streaming inputs") {
    // qualityScoreStaged is the canonical guard: a streaming frame
    // must flow through as a per-row plan, not hit a write
    val src = java.nio.file.Files.createTempDirectory("stagespec-src")
    Seq((1L, "hello world", 11L)).toDF("doc_id", "text", "n_chars")
      .write.mode("overwrite").parquet(src.toString)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, n_chars LONG")
      .parquet(src.toString)
    val out = graft.operators.TextAnalysis.qualityScoreStaged(stream)
    assert(out.isStreaming, "staging must not materialize a stream")
  }
}
