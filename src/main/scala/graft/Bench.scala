package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Driver-run benchmark: times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR. Discipline: one untimed warmup pass (JIT +
  * page-cache), then min-of-3 consecutive timed runs per query PLUS
  * one extra pass in seeded-shuffle order merged into the same minima
  * — the shuffled sample breaks order-coupled false floors (same
  * order ⇒ repeatable ≠ real; VERDICT r14 #2) without re-basing the
  * consecutive-run warmth every prior round's totals were measured
  * under — so round-over-round numbers compare builder work, not JVM
  * warmth or neighborhood GC. The LAST stdout line is
  * the compact driver-contract JSON (≤1800 chars — the driver parses it
  * out of a 2000-char stdout tail that sbt's trailer also shares); the
  * full diagnostics go to bench_out.json and an earlier [bench-full]
  * stdout line.
  *
  * Host-contention self-diagnosis (VERDICT r6 "Next round" #2): three
  * rounds running, the committed artifact was contaminated by co-tenant
  * load and a naive reader mistook host noise for regression. The tell
  * is now built in: a fixed CALIBRATION query (`short_cid`, a pure
  * projection whose cost cannot change with builder work) is re-timed
  * between every ~10 suite queries. If the calibration spread exceeds
  * 2×, the artifact stamps `"contaminated": true` — an explicit marker
  * that totals are not comparable round-over-round. Queries whose own
  * samples spread >2× are re-sampled once more (min-of-N over the merged
  * set), so a transient spike must strike the same query twice to
  * survive into the reported minimum.
  *
  * A would-be contaminated artifact first tries to SELF-HEAL (VERDICT
  * r11 #5): fresh calibration probes decide whether the spike was
  * transient; if the host is quiet again, the queries timed inside each
  * spiked window are re-sampled from the now-clean host and the stamp is
  * recomputed over the widened probe set (`healed_n` records how many
  * queries were re-timed). Sustained load keeps the stamp.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      // cold-cache discipline: operators that persist() intermediate
      // projections (ngram_jaccard) must not carry cache across timed
      // runs, or min-of-3 measures the cache, not the query.
      // releaseAll drains the Caches registry's strong handles too —
      // clearCache alone frees storage but would let ~10 plan trees
      // per query accumulate on the driver heap across the suite
      graft.Caches.releaseAll()
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    val calibFn = SparkEntry.queries("short_cid")
    val calib = collection.mutable.ArrayBuffer.empty[Double]
    // each calibration POINT is a min-of-2 — a single probe sample
    // catches one-off GC pauses (the first post-warmup probes read ~2×
    // high on a quiet host) and would stamp every artifact; min-of-2 is
    // the same outlier discipline the per-query min-of-3 applies, so a
    // >2× calibration spread now means sustained external load
    def calibOnce(): Double = {
      val a = timeOnce(calibFn); val b = timeOnce(calibFn)
      if (a < 0) b else if (b < 0) a else math.min(a, b)
    }

    // warmup pass (untimed)
    SparkEntry.queries.foreach { case (_, fn) => timeOnce(fn) }
    // settle the warmup boundary: the heap is full of warmup garbage and
    // the first probe after the pass reliably catches the collection
    // (r11: calib[0]=0.35 vs 0.077 median on a quiet host, stamping the
    // artifact contaminated with zero actual co-tenant load). One
    // explicit GC + one DISCARDED calibration probe puts the boundary
    // cost outside the timed window; the 16+ timed points that follow
    // keep their full sensitivity to genuine external load.
    System.gc()
    calibOnce()
    val t0Wall = System.nanoTime()

    // per-query min AND [min, median, max]: a contended host shows up
    // as a wide spread, so a bad sample flags itself instead of
    // reading as a code regression (the round-4 bench artifact lesson).
    // The calibration probe interleaves every 10 queries so contention
    // is localized in TIME, not just per-query.
    //
    // ORDER-SHUFFLED EXTRA PASS (VERDICT r14 #2, refined in r15):
    // replaying the same query order in every timed run made
    // order-coupled costs — GC/page-cache pressure inherited from a
    // query's NEIGHBORS — repeat identically in all runs, a stable
    // FALSE floor the min-of-3 cannot wash out (r14: hapax_stats 4.07×
    // on byte-identical code). The first r15 fix shuffled EVERY timed
    // run — which broke the false floors but re-based the whole suite:
    // 252/318 shared queries drifted up ~uniformly (shared-set total
    // 1.50×) because consecutive same-query runs had been harvesting
    // back-to-back warmth (page-cached artifacts, hot codegen classes)
    // and the shuffled minima no longer could — a measurement-policy
    // cliff that would read as a code regression in every cross-round
    // diff. Policy now: the `runs` consecutive warm samples stay (the
    // minima remain comparable round-over-round), PLUS one extra full
    // pass in seeded-shuffle order (seed recorded) whose samples merge
    // into min AND dispersion — a query stuck in a bad neighborhood
    // gets one sample from a different neighborhood, so a false floor
    // breaks toward truth, while an order-coupled cost that only the
    // shuffled position hits widens dispersion → unstable, never a
    // stable wrong number.
    calib += calibOnce()
    val qnames = SparkEntry.queries.keys.toSeq
    val samples = collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    qnames.foreach(n => samples(n) = Vector.empty[Double])
    // windows(k) = queries timed immediately before calibration point k
    // (index-aligned with `calib`): the self-heal pass needs the
    // query↔probe mapping explicit since order varies across passes
    val calibWindows = collection.mutable.ArrayBuffer[Seq[String]](Seq.empty)
    val orderSeeds = Seq(0x9e3779b9L * (runs + 1) + 0x15L)
    var window = collection.mutable.ArrayBuffer.empty[String]
    // flushEvery is in SAMPLES: 10 queries' worth per probe in either
    // phase (the consecutive phase takes `runs` samples per query)
    def timeInto(name: String, flushEvery: Int): Unit = {
      val t = timeOnce(SparkEntry.queries(name))
      if (t >= 0) samples(name) = samples(name) :+ t
      window += name
      if (window.size >= flushEvery) {
        calib += calibOnce()
        calibWindows += window.toSeq
        window = collection.mutable.ArrayBuffer.empty[String]
      }
    }
    // consecutive warm passes (the cross-round-comparable minima)
    qnames.foreach(n => (1 to runs).foreach(_ => timeInto(n, 10 * runs)))
    // one seeded-shuffle pass (the false-floor breaker)
    orderSeeds.foreach { seed =>
      new scala.util.Random(seed).shuffle(qnames)
        .foreach(timeInto(_, 10))
    }
    calib += calibOnce()
    calibWindows += window.toSeq
    samples.keys.toSeq.foreach(n => samples(n) = samples(n).sorted)

    def spread2x(ts: Seq[Double]): Boolean =
      ts.nonEmpty && ts.min > 0.2 && ts.max > 2 * ts.min
    // host-noise rescue pass: one extra min-of-N for each wide-spread
    // query; the merged min stands. A genuine regression reproduces in
    // the rerun; a co-tenant spike does not.
    val firstUnstable = samples.collect { case (k, ts) if spread2x(ts) => k }.toSeq
    firstUnstable.foreach { name =>
      val extra = (1 to runs).map(_ => timeOnce(SparkEntry.queries(name))).filter(_ >= 0)
      samples(name) = (samples(name) ++ extra).sorted
    }
    // one more calibration point AFTER the rescue pass: co-tenant load
    // arriving during the reruns must be visible to the contamination
    // stamp, since the rerun samples feed the reported minima
    if (firstUnstable.nonEmpty) calib += calibOnce()

    // contamination = any calibration point spiking >2× the MEDIAN
    // point. Max/min is the wrong test: the min drifts DOWN across the
    // run as the JVM warms (observed quiet-host sequences decline
    // 0.12 → 0.06 and read as "2× spread"), while genuine co-tenant
    // load shows as points FAR ABOVE the center (the r6 contaminated
    // artifacts had probes 6-14× typical). Median is warmth-robust.
    def contamOf(cs: Seq[Double]): Boolean = {
      val s = cs.filter(_ >= 0).sorted
      s.isEmpty || s.last > 2 * s((s.size - 1) / 2)
    }
    var contaminated = contamOf(calib.toSeq)
    // transient-noise self-heal (the r11 artifact lesson: ONE co-tenant
    // spike in one ~10-query window stamped the whole round even though
    // every reported minimum was already spike-robust). When the stamp
    // WOULD be set, probe again: if the host is quiet now, the spike was
    // transient — re-time the queries sampled inside each spiked window
    // so their merged minima include clean-window samples, and stamp
    // from the widened probe set. Sustained load keeps the stamp.
    var healedN = 0
    var healedNames: Seq[String] = Nil
    if (contaminated) {
      val fresh = (1 to 4).map(_ => calibOnce())
      if (!contamOf(fresh)) {
        val sortedC = calib.filter(_ >= 0).toSeq.sorted
        val med = sortedC((sortedC.size - 1) / 2)
        // a spiked probe contaminates the queries timed just before it
        // (its own window) and just after (the next window) — the
        // explicit probe↔query mapping, since order varies per run
        val affected = calib.zipWithIndex.collect {
          case (v, j) if v >= 0 && v > 2 * med => j
        }.flatMap { j =>
          calibWindows.lift(j).getOrElse(Seq.empty) ++
            calibWindows.lift(j + 1).getOrElse(Seq.empty)
        }.distinct
        affected.foreach { name =>
          val extra = (1 to runs).map(_ => timeOnce(SparkEntry.queries(name)))
            .filter(_ >= 0)
          samples(name) = (samples(name) ++ extra).sorted
        }
        val post = (1 to 2).map(_ => calibOnce())
        if (!contamOf(fresh ++ post)) {
          contaminated = false
          healedN = affected.size
          healedNames = affected.toSeq
          calib ++= fresh ++ post
        }
      }
    }

    val results = samples.map { case (name, ts) =>
      name -> (if (ts.nonEmpty) ts.min else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.4f" }
      .mkString("{", ",", "}")
    val disp = samples.map { case (k, ts) =>
      // lower median: unbiased-low for even run counts (a 2-sample
      // split like [1.0, 9.9] must not report the outlier as "median")
      val (mn, md, mx) =
        if (ts.isEmpty) (-1.0, -1.0, -1.0)
        else (ts.min, ts((ts.size - 1) / 2), ts.max)
      "\"" + k + "\":[" + f"$mn%.4f,$md%.4f,$mx%.4f" + "]"
    }.mkString("{", ",", "}")
    // final instability is MEDIAN-based: the reported value is the min,
    // so one spike among 6 post-rescue samples is already neutralized —
    // a query is only flagged when the CENTER of its distribution sits
    // 2× above the min (sustained variance the min can't be trusted
    // against). The max-based spread2x stays as the cheap rescue-pass
    // trigger above.
    val unstable = samples.collect {
      case (k, ts) if ts.nonEmpty && ts.min > 0.2
        && ts((ts.size - 1) / 2) > 2 * ts.min => k
    }
    val unstableJson = unstable.map("\"" + _ + "\"").mkString("[", ",", "]")
    // emit in TEMPORAL order (drift vs spike is visible), sort only for the stamp
    val calibJson = calib.filter(_ >= 0).map(t => f"$t%.4f").mkString("[", ",", "]")
    val calibOk = calib.filter(_ >= 0).toSeq.sorted
    val calibMedian = if (calibOk.isEmpty) -1.0 else calibOk((calibOk.size - 1) / 2)
    val total = results.values.filter(_ >= 0).sum
    val wallSec = (System.nanoTime() - t0Wall) / 1e9

    // staged-artifact build accounting (VERDICT r12 #2): every Stage
    // artifact built this JVM — all during the untimed warmup pass,
    // since staging is build-once — with its build wall-time and bytes,
    // so the cost amortized OUT of the per-query timings is visible
    // beside them instead of silently folded into whichever gated query
    // first touched the artifact. Keys are tag:planhash:params.
    val stageBuilds = graft.Stage.builds
      .sortBy { case (k, _) => k }
      .map { case (k, a) =>
        "\"stage_build:" + k.replace("\"", "") + "\":" +
          f"[${a.buildSec}%.4f,${a.bytes}]"
      }.mkString("{", ",", "}")
    val stagedBytes = graft.Stage.stagedBytes

    // The driver captures only the LAST ~2000 chars of stdout and parses
    // the JSON line out of that tail (BENCH_r07 recorded parsed:null when
    // the dispersion+calibration fields pushed the line past the window
    // and the tail began mid-line). Two artifacts now:
    //  - bench_out.json (+ an early stdout line): the FULL diagnostics —
    //    dispersion, calibration sequence + cross-round absolute median,
    //    rescue list, wall clock;
    //  - the FINAL stdout line: the compact driver contract, kept under
    //    1800 chars (sbt's trailing "[success]" line shares the window) by
    //    degrading per-query decimal places before ever dropping a field.
    // accounting note: "rerun" = spread-triggered rescue re-samples;
    // "healed" = queries re-timed by the contamination self-heal (the
    // two passes are independent — a query can appear in both, and
    // healed_n == healed.length by construction; ADVICE r13 #2)
    // calibration-normalized minima (VERDICT r14 #7): min ÷ the run's
    // calibration median, so cross-round diffs read host-load-corrected
    // units (a quiet round and a loaded round agree on the ratio even
    // when raw seconds drift together)
    val calnorm = results.map { case (k, v) =>
      val r = if (v >= 0 && calibMedian > 0) v / calibMedian else -1.0
      "\"" + k + "\":" + f"$r%.3f"
    }.mkString("{", ",", "}")
    val seedsJson = orderSeeds.map(_.toString).mkString("[", ",", "]")
    val rich =
      f"""{"metric":"total","value":$total%.4f,"unit":"sec","queries":$qs,"dispersion":$disp,"queries_calnorm":$calnorm,"order_seeds":$seedsJson,"unstable":$unstableJson,"calibration":$calibJson,"calib_median":$calibMedian%.4f,"contaminated":$contaminated,"healed_n":$healedN,"healed":${healedNames.map("\"" + _ + "\"").mkString("[", ",", "]")},"rerun":${firstUnstable.map("\"" + _ + "\"").mkString("[", ",", "]")},"stage_builds":$stageBuilds,"staged_bytes":$stagedBytes,"wall_sec":$wallSec%.1f,"sf":"$sfDir","runs":$runs}"""
    println("[bench-full] " + rich)
    try Files.writeString(Paths.get("bench_out.json"), rich)
    catch { case _: Throwable => () }

    def compactLine(dec: Int, fullLists: Boolean): String = {
      val q = results.map { case (k, v) =>
        "\"" + k + "\":" + s"%.${dec}f".format(v)
      }.mkString("{", ",", "}")
      // the unstable NAME list is unbounded (a noisy host can flag
      // many queries at once — r6 flagged 5); degrade it to a count
      // before shrinking decimals below useful, so the stamp survives
      // without the line ever outgrowing the tail window
      val unst = if (fullLists) s""""unstable":$unstableJson"""
                 else s""""unstable_n":${unstable.size}"""
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$q,$unst,"contaminated":$contaminated,"sf":"$sfDir","runs":$runs}"""
    }
    // integer-rounded per-query values are worse than none (BENCH_r09
    // recorded 0/1/2-second "timings" useless for regression tracking):
    // when even 1 decimal can't fit, the line drops the map entirely and
    // points at the committed full-precision artifact instead
    val pointerLine =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries_file":"bench_out.json","n_queries":${results.size},"unstable_n":${unstable.size},"contaminated":$contaminated,"sf":"$sfDir","runs":$runs}"""
    val line = Seq((3, true), (2, true), (1, true), (1, false))
      .map { case (d, l) => compactLine(d, l) }.find(_.length <= 1800)
      .getOrElse(pointerLine)
    println(line)
    spark.stop()
  }
}
