package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.{Sampling, Scrub}

/** Top-level so Spark can instantiate the encoder without an outer
  * scope (an inner case class fails ResolveNewInstance in streaming). */
case class TwinDoc(doc_id: Long, text: String)

case class TwinEvt(event_id: Long, user_id: Long, ts: java.sql.Timestamp)

/** Streaming twins for the round-6 per-row corpus operators (VERDICT r6
  * "Next round" #4): trainTestSplit / piiRedact / importanceSample are
  * stateless per-row projections, so the SAME library call runs
  * unchanged on a readStream frame — no watermark, no state, append
  * mode. The spec drives each through MemoryStream → memory sink across
  * two batches and asserts the streamed output is row-for-row the batch
  * result on the same rows: the retry/backfill-stability contract
  * (salted hashes, never rand()) is exactly what makes the streaming
  * twin trivially correct — a nondeterministic draw would diverge
  * between the two execution modes. */
class StreamingTwinsSpec extends SparkTestBase {
  import spark.implicits._

  

  private val fixture: Seq[TwinDoc] = (0L until 120L).map { i =>
    TwinDoc(i, s"the quick example number $i of a few sample words to and" +
      (if (i % 3 == 0) " reach person@mail.example.com" else "") +
      (if (i % 5 == 0) " call 555-867-5309 now!!" else ""))
  }

  /** Run `op` over a 2-batch stream and over the same rows as a batch;
    * assert multiset equality (per-row ops impose no output order). */
  private def parity(name: String)(op: DataFrame => DataFrame): Unit = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TwinDoc]
    val q = op(input.toDF()).writeStream.format("memory")
      .queryName(name).outputMode("append").start()
    input.addData(fixture.take(50): _*)
    q.processAllAvailable()
    input.addData(fixture.drop(50): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table(name)
    val batch = op(fixture.toDF())
    assert(streamed.count() == fixture.size.toLong, s"$name lost rows")
    assert(streamed.exceptAll(batch).isEmpty
      && batch.exceptAll(streamed).isEmpty,
      s"$name: streaming output != batch output")
  }

  test("trainTestSplit: streaming ≡ batch row-for-row") {
    parity("twin_split")(Sampling.trainTestSplit(_))
  }

  test("piiRedact: streaming ≡ batch row-for-row") {
    parity("twin_pii") { df =>
      Scrub.piiRedact(df, org.apache.spark.sql.functions.col("text"))
        .select("doc_id", "n_pii", "redacted")
    }
  }

  test("importanceSample: streaming ≡ batch row-for-row") {
    parity("twin_imp")(Sampling.importanceSample(_))
  }

  // the rest of the stateless text-analysis family runs unchanged on a
  // stream for the same reason — pin that with twins too
  test("qualityScore: streaming ≡ batch row-for-row") {
    parity("twin_q")(graft.operators.TextAnalysis.qualityScore(_))
  }

  test("langId: streaming ≡ batch row-for-row") {
    parity("twin_lang")(graft.operators.TextAnalysis.langId(_))
  }

  test("tokenCounts: streaming ≡ batch row-for-row") {
    parity("twin_tok")(graft.operators.TextAnalysis.tokenCounts(_))
  }

  test("fingerprints: streaming ≡ batch row-for-row") {
    parity("twin_fp")(graft.operators.TextAnalysis.fingerprints(_))
  }

  test("repeatedNgrams: streaming ≡ batch row-for-row") {
    parity("twin_rep")(graft.operators.TextAnalysis.repeatedNgrams(_))
  }

  test("zValue: streaming ≡ batch row-for-row") {
    import org.apache.spark.sql.functions._
    parity("twin_z") { df =>
      df.select(col("doc_id"),
        graft.operators.Layout.zValue(col("doc_id") % 64,
          length(col("text")).cast("long") % 64, 6).as("z"))
    }
  }

  test("valueHistogram: streaming (complete mode) ≡ batch") {
    // an aggregation twin: same library call, complete output mode —
    // each trigger emits the full up-to-date histogram
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    def toEvents(df: DataFrame): DataFrame =
      df.select(col("doc_id").as("event_id"),
        (length(col("text")).cast("double") / 8.0).as("value"))
    val input = MemoryStream[TwinDoc]
    val q = graft.operators.Events.valueHistogram(toEvents(input.toDF()))
      .writeStream.format("memory").queryName("twin_hist")
      .outputMode("complete").start()
    input.addData(fixture.take(50): _*)
    q.processAllAvailable()
    input.addData(fixture.drop(50): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("twin_hist")
    val batch = graft.operators.Events.valueHistogram(toEvents(fixture.toDF()))
    assert(streamed.exceptAll(batch).isEmpty
      && batch.exceptAll(streamed).isEmpty,
      "complete-mode streaming histogram != batch histogram")
    assert(streamed.count() > 1, "fixture must span several bins")
  }

  test("checksumShards: streaming (complete mode) ≡ batch anti-entropy") {
    // the replica-divergence checksum run ONLINE: sums are commutative
    // integer adds in a DECIMAL(38,0) buffer, so the complete-mode
    // aggregate after any batch split must equal the one-shot batch
    // checksum — the property that lets a replica maintain its Merkle
    // leaves incrementally instead of rescanning.
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    def toEvents(df: DataFrame): DataFrame =
      df.select(col("doc_id").as("event_id"),
        timestamp_micros(col("doc_id") * 60000000L).as("ts"),
        (col("doc_id") % 7).as("user_id"),
        substring(col("text"), 1, 3).as("event_type"),
        lit("{}").as("props"))
    val input = MemoryStream[TwinDoc]
    val q = graft.operators.Integrity.checksumShards(toEvents(input.toDF()), 4)
      .writeStream.format("memory").queryName("twin_checksum")
      .outputMode("complete").start()
    input.addData(fixture.take(50): _*)
    q.processAllAvailable()
    input.addData(fixture.drop(50): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("twin_checksum")
    val batch = graft.operators.Integrity.checksumShards(
      toEvents(fixture.toDF()), 4)
    assert(streamed.exceptAll(batch).isEmpty
      && batch.exceptAll(streamed).isEmpty,
      "complete-mode streaming checksum != batch checksum")
    assert(streamed.count() == 4, "all four shards must report")
  }

  test("CMS frequency sketch: streaming (complete mode) ≡ batch, byte-identical") {
    // the heavy_hitters sketch run ONLINE: each trigger folds the new
    // batch's terms into the state-store aggregation buffer (CmsBuildAgg
    // serialize/merge — counter merges are commutative integer adds), so
    // the final sketch must equal the one-shot batch sketch BYTE for
    // byte, and every estimate read off it inherits the CMS guarantees
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graft.{CmsBuildAgg, CmsEstimateExpr}
    implicit val sqlCtx = spark.sqlContext
    def sketchOf(df: DataFrame): DataFrame =
      df.select(explode(
          graft.operators.TextAnalysis.tokens(col("text"))).as("term"))
        .agg(CmsBuildAgg(col("term"), lit(1L), 0.005, 0.99, 42).as("sk"))
    val input = MemoryStream[TwinDoc]
    val q = sketchOf(input.toDF()).writeStream.format("memory")
      .queryName("twin_cms").outputMode("complete").start()
    input.addData(fixture.take(50): _*)
    q.processAllAvailable()
    input.addData(fixture.drop(50): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("twin_cms").head().getAs[Array[Byte]]("sk")
    val batch = sketchOf(fixture.toDF()).head().getAs[Array[Byte]]("sk")
    assert(java.util.Arrays.equals(streamed, batch),
      "streaming-merged CMS != one-shot batch CMS")
    // estimates off the streamed sketch dominate the exact counts
    val exact = fixture.toDF()
      .select(explode(
        graft.operators.TextAnalysis.tokens(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
    val probed = exact
      .crossJoin(spark.table("twin_cms"))
      .select(col("term"), col("cnt"),
        CmsEstimateExpr(col("sk"), col("term")).as("est"))
      .as[(String, Long, Long)].collect()
    assert(probed.nonEmpty && probed.forall { case (_, c, e) => e >= c },
      "streamed-sketch estimate undercounted a term")
  }

  test("decontaminate: stream-static broadcast join (complete mode) ≡ batch") {
    // a twin CLASS the others don't cover: the benchmark shingle set is
    // a STATIC frame broadcast-joined against the streaming corpus,
    // then a streaming aggregation counts shared shingles per doc —
    // exactly how a decontamination sweep runs over an arriving corpus
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val bench = fixture.filter(_.doc_id % 10 == 0).toDF()
    def op(df: DataFrame): DataFrame = Scrub.decontaminate(df, bench)
    val stream = fixture.filter(_.doc_id % 10 != 0)
    val input = MemoryStream[TwinDoc]
    val q = op(input.toDF()).writeStream.format("memory")
      .queryName("twin_decon").outputMode("complete").start()
    input.addData(stream.take(50): _*)
    q.processAllAvailable()
    input.addData(stream.drop(50): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("twin_decon")
    val batch = op(stream.toDF())
    assert(streamed.exceptAll(batch).isEmpty
      && batch.exceptAll(streamed).isEmpty,
      "stream-static decontaminate != batch decontaminate")
    assert(streamed.count() > 0, "fixture must flag contaminated docs")
  }

  test("HLL distinct sketch: streaming (complete mode) ≡ batch") {
    // the approx_distinct sketch run ONLINE: HLL++ buffers merge by
    // register-wise max — commutative and idempotent — so the grouped
    // estimate after N triggers must equal the one-shot batch estimate
    // exactly (the third mergeable-sketch twin beside CMS and the
    // histogram). Exact count_distinct is deliberately absent: distinct
    // aggregation doesn't stream, WHICH IS THE POINT of shipping HLL.
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    def hllOf(df: DataFrame): DataFrame =
      df.select((col("doc_id") % 3).as("grp"), (col("doc_id") % 37).as("u"))
        .groupBy("grp")
        .agg(approx_count_distinct(col("u"), 0.005).as("n_approx"))
    val input = MemoryStream[TwinDoc]
    val q = hllOf(input.toDF()).writeStream.format("memory")
      .queryName("twin_hll").outputMode("complete").start()
    input.addData(fixture.take(50): _*)
    q.processAllAvailable()
    input.addData(fixture.drop(50): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("twin_hll")
    val batch = hllOf(fixture.toDF())
    assert(streamed.exceptAll(batch).isEmpty
      && batch.exceptAll(streamed).isEmpty,
      "complete-mode streaming HLL != batch HLL")
    // sparse regime: the estimate is exact — every group sees 37 users
    // across the 120-doc fixture... (groups of 40 docs, doc_id%37 hits
    // at most 37 distinct values; assert against the true count)
    val truth = fixture.groupBy(_.doc_id % 3)
      .map { case (g, ds) => g -> ds.map(_.doc_id % 37).distinct.size.toLong }
    val got = streamed.as[(Long, Long)].collect().toMap
    assert(got == truth, s"sparse-regime HLL must be exact: $got vs $truth")
  }

  test("percentile sketch: streaming (complete mode) ≡ batch") {
    // the FIFTH mergeable-sketch twin (CMS, HLL, histogram, sessions):
    // approx_percentile's QuantileSummaries buffers merge associatively,
    // so the grouped streamed digest after N triggers must equal the
    // one-shot batch digest on the same rows — and at fixture
    // cardinality the summaries are exact, so pin against the true
    // per-group percentiles too
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    def pctOf(df: DataFrame): DataFrame =
      df.select((col("doc_id") % 3).as("grp"),
          length(col("text")).cast("double").as("v"))
        .groupBy("grp")
        .agg(percentile_approx(col("v"), array(lit(0.5), lit(0.9)),
          lit(10000)).as("p"))
    val input = MemoryStream[TwinDoc]
    val q = pctOf(input.toDF()).writeStream.format("memory")
      .queryName("twin_pct").outputMode("complete").start()
    input.addData(fixture.take(50): _*)
    q.processAllAvailable()
    input.addData(fixture.drop(50): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("twin_pct")
    val batch = pctOf(fixture.toDF())
    assert(streamed.exceptAll(batch).isEmpty
      && batch.exceptAll(streamed).isEmpty,
      "complete-mode streaming percentile digest != batch digest")
    // exact-regime truth: percentile_approx with a generous accuracy is
    // exact below the compression threshold
    val truth = fixture.groupBy(_.doc_id % 3).map { case (g, ds) =>
      val sorted = ds.map(_.text.length.toDouble).sorted
      def pct(p: Double) =
        sorted(math.ceil(p * sorted.size).toInt - 1)
      g -> Seq(pct(0.5), pct(0.9))
    }
    val got = streamed.as[(Long, Seq[Double])].collect().toMap
    assert(got == truth, s"exact-regime percentiles: $got vs $truth")
  }

  test("stateful sessions: streaming ≡ batch session_window on fixture events") {
    // the FOURTH twin class: custom flatMapGroupsWithState state vs the
    // built-in batch session_window, on the real fixture stream. The
    // stateful operator emits session_end = last event; session_window
    // emits last + gap — shift by the gap and the two session sets must
    // match exactly once the watermark has flushed everything.
    import org.apache.spark.sql.functions._
    import graft.streaming.StatefulSessions
    implicit val sqlCtx = spark.sqlContext
    // quantize to millis first: the stateful operator keys its state on
    // epoch-ms (java.sql.Timestamp.getTime), so parity is defined on
    // ms-precision events — both sides see the same quantized input
    val ev = graft.sources.LogSource
      .readEvents(spark, "/root/testdata/sf0.001")
      .select(col("user_id"),
        expr("timestamp_millis(unix_millis(ts))").as("ts"))
    val rows = ev.as[(Long, java.sql.Timestamp)].collect()
      .sortBy(t => (t._2.getTime, t._1))
    val input = MemoryStream[StatefulSessions.Event]
    val q = StatefulSessions.sessions(
        input.toDS().withWatermark("ts", "1 minute"), gapSec = 3600L)
      .writeStream.format("memory").queryName("twin_sessions")
      .outputMode("append").start()
    rows.grouped((rows.length + 2) / 3).foreach { b =>
      input.addData(b.map(t => StatefulSessions.Event(t._1, t._2)): _*)
      q.processAllAvailable()
    }
    // sentinel user far past every gap horizon flushes all real
    // sessions; a second sentinel event triggers its timeout eval
    val maxMs = rows.map(_._2.getTime).max
    Seq(10L, 11L).foreach { d =>
      input.addData(StatefulSessions.Event(-1L,
        new java.sql.Timestamp(maxMs + d * 86400000L)))
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("twin_sessions")
      .filter(col("user_id") >= 0)
      .select(col("user_id"), col("session_start"),
        expr("session_end + INTERVAL 1 HOUR").as("session_end"),
        col("n").cast("long").as("n"))
    val batch = graft.operators.Events
      .sessionWindows(ev.withColumn("event_id", lit(0L)), "1 hour")
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n"))
    assert(streamed.count() > 10, "fixture must yield many sessions")
    assert(streamed.exceptAll(batch).isEmpty
      && batch.exceptAll(streamed).isEmpty,
      "stateful streaming sessions != batch session_window sessions")
  }

  test("attribution join: STREAM-STREAM join ≡ batch join on fixture events") {
    // the sixth twin class — Spark's stream-stream join: both sides are
    // unbounded, both are watermarked, and the equi-join + event-time
    // range condition is what lets the engine buffer and evict state.
    // Same library call on both sides; inner-join matches emit as soon
    // as both rows have arrived, so interleaved chunked arrival must
    // reproduce the batch join exactly.
    import org.apache.spark.sql.functions._
    import graft.operators.Events
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.sources.LogSource
      .readEvents(spark, "/root/testdata/sf0.001")
    def arrivals(t: String): Seq[TwinEvt] = ev
      .filter(col("event_type") === t)
      .select("event_id", "user_id", "ts")
      .as[(Long, Long, java.sql.Timestamp)].collect()
      .sortBy(r => (r._3.getTime, r._1)).toSeq
      .map(r => TwinEvt(r._1, r._2, r._3))
    val views = arrivals("view")
    val clicks = arrivals("click")
    val vIn = MemoryStream[TwinEvt]
    val cIn = MemoryStream[TwinEvt]
    // generous watermark delay: state eviction is exercised structurally
    // (the plan requires the watermarks), while no row can be evicted
    // before its cross-chunk partner arrives
    val q = Events.attributionJoin(
        vIn.toDF().withWatermark("ts", "90 days"),
        cIn.toDF().withWatermark("ts", "90 days"))
      .writeStream.format("memory").queryName("twin_attr")
      .outputMode("append").start()
    val vChunks = views.grouped((views.size + 2) / 3).toSeq
    val cChunks = clicks.grouped((clicks.size + 2) / 3).toSeq
    (0 until 3).foreach { i =>
      if (i < vChunks.size) vIn.addData(vChunks(i): _*)
      if (i < cChunks.size) cIn.addData(cChunks(i): _*)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("twin_attr")
    val batch = Events.attributionJoin(
      ev.filter(col("event_type") === "view"),
      ev.filter(col("event_type") === "click"))
    assert(streamed.count() > 0, "fixture must yield attribution pairs")
    assert(streamed.exceptAll(batch).isEmpty
      && batch.exceptAll(streamed).isEmpty,
      "stream-stream attribution != batch attribution")
  }
}
