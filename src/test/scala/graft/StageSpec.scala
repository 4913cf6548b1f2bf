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

  test("concurrent first-callers of one key build once; both read back") {
    val builds = new AtomicInteger(0)
    val gate = new java.util.concurrent.CountDownLatch(2)
    val k = freshKey("race")
    def run() = {
      gate.countDown(); gate.await() // maximize overlap
      Stage.parquet(spark, k) {
        builds.incrementAndGet()
        Thread.sleep(200) // hold the build open so the loser must wait
        Seq(7L).toDF("x")
      }
    }
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val (a, b) = (Future(run()), Future(run()))
    val ra = Await.result(a, 60.seconds)
    val rb = Await.result(b, 60.seconds)
    assert(builds.get() == 1, "the losing racer must join the winner's build")
    assert(ra.as[Long].head() == 7L && rb.as[Long].head() == 7L)
  }

  test("a build may stage a NESTED artifact under another key") {
    val k1 = freshKey("outer"); val k2 = freshKey("inner")
    val out = Stage.parquet(spark, k1) {
      val inner = Stage.parquet(spark, k2)(Seq(1L, 2L).toDF("x"))
      inner.agg(sum("x").as("s"))
    }
    assert(out.as[Long].head() == 3L)
    // and the nested artifact is independently resolvable
    assert(Stage.parquet(spark, k2)(fail("must hit artifact"))
      .count() == 2L)
  }

  test("same-key re-entrant build fails fast instead of deadlocking") {
    val k = freshKey("reentrant")
    val e = intercept[IllegalStateException] {
      Stage.parquet(spark, k) {
        Stage.parquet(spark, k)(Seq(1L).toDF("x")) // resolve ITSELF
      }
    }
    assert(e.getMessage.contains("re-entrant"))
    // the failed build must not poison the key
    assert(Stage.parquet(spark, k)(Seq(9L).toDF("x")).as[Long].head() == 9L)
  }

  test("failed build leaves the key retryable") {
    val k = freshKey("fail")
    val attempts = new AtomicInteger(0)
    intercept[RuntimeException] {
      Stage.parquet(spark, k) {
        attempts.incrementAndGet()
        throw new RuntimeException("boom")
      }
    }
    val ok = Stage.parquet(spark, k) {
      attempts.incrementAndGet(); Seq(5L).toDF("x")
    }
    assert(attempts.get() == 2 && ok.as[Long].head() == 5L)
  }

  test("drop of an IN-FLIGHT build defers reaping until the next drop") {
    // ADVICE r14 #1: dropping a key mid-build removed the promise from
    // the map, so the orphaned build's temp dir escaped every later
    // drop/dropAll — a permanent leak in the teardown path. ADVICE r15
    // #1: deleting at promise completion ran synchronously inside
    // fresh.complete(a) and destroyed the dir BEFORE resolve() returned
    // the Artifact — the one-off build was unusable. The contract now:
    // the orphaned build stays READABLE after completion, and its
    // directory is reaped by the NEXT drop/dropAll.
    val k = freshKey("inflight")
    val started = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val victimDir = new java.util.concurrent.atomic.AtomicReference[String]()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fut = Future {
      val d = Stage.dir(k) { d =>
        victimDir.set(d)
        started.countDown()
        release.await()
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(d, "payload.txt"), "x"): Unit
      }
      // the builder's returned artifact must still be usable AFTER the
      // drop — the whole point of deferring the reap
      java.nio.file.Files.readString(
        java.nio.file.Paths.get(d, "payload.txt"))
    }
    started.await()
    val dropped = Stage.drop(k) // victim is mid-build
    assert(dropped == 1)
    release.countDown()
    assert(Await.result(fut, 60.seconds) == "x",
      "orphaned build must remain readable by its builder")
    val f = new java.io.File(victimDir.get())
    assert(f.exists(), "orphan is reaped at the NEXT drop, not at completion")
    // the next drop (any prefix) processes the to-reap list
    assert(Stage.drop(freshKey("unrelated")) == 0)
    assert(!f.exists(), "orphaned in-flight build dir must be reaped " +
      "by the next drop")
    // and the key rebuilds fresh (drop evicted it)
    assert(Stage.parquet(spark, k)(Seq(2L).toDF("x")).as[Long].head() == 2L)
  }

  test("lifecycle: builds record time+bytes; drop evicts; rebuild after drop") {
    val builds = new AtomicInteger(0)
    val k = freshKey("lifecycle")
    def resolve() = Stage.parquet(spark, k) {
      builds.incrementAndGet(); Seq((1L, "payload")).toDF("id", "s")
    }
    resolve()
    val rec = Stage.builds.find(_._1 == k).get._2
    assert(rec.bytes > 0L, "artifact bytes must be measured")
    assert(rec.buildSec >= 0.0)
    assert(Stage.stagedBytes >= rec.bytes)
    val dir = new java.io.File(rec.dir)
    assert(dir.exists())
    assert(Stage.drop(k) == 1)
    assert(!dir.exists(), "drop must delete the artifact directory")
    resolve()
    assert(builds.get() == 2, "post-drop caller must rebuild")
    assert(Stage.drop(k) == 1) // cleanup
  }

  test("Caches.releaseAll(dropStaged = true) drains staged artifacts too") {
    val k = freshKey("drain")
    Stage.parquet(spark, k)(Seq(1L).toDF("x"))
    val dir = new java.io.File(Stage.builds.find(_._1 == k).get._2.dir)
    assert(dir.exists())
    Caches.releaseAll(dropStaged = true)
    assert(!dir.exists() && !Stage.builds.exists(_._1 == k))
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
