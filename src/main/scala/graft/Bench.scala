package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** Fixed-work CPU calibration: seconds to run a deterministic xorshift
    * spin whose cost is constant on a given host. Run before AND after
    * the timed queries, it bounds host contention for the whole window:
    * on an idle machine the two readings match the host's reference
    * (~tenths of a second); a contended artifact shows inflated readings
    * and is thereby SELF-diagnosing (the round-7 driver run was 4-6×
    * the idle band with no code change, and proving contention required
    * cross-referencing committed artifacts — this line carries the
    * proof inside the artifact).
    */
  private def spinCalibration(): Double = {
    val t0 = System.nanoTime()
    var x = 0x9E3779B97F4A7C15L; var i = 0
    while (i < 200000000) { // ~0.1-0.3 s of pure ALU on one core
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1
    }
    if (x == 42L) println("") // defeat dead-code elimination
    (System.nanoTime() - t0) / 1e9
  }

  /** Short fixed-work spin (~1/8 of [[spinCalibration]], ~50 ms idle)
    * run immediately BEFORE each rep's timed window: a per-rep host-load
    * probe. On an idle host every probe reads the same ~50 ms; a probe
    * far above the run's own minimum marks THAT rep as contended —
    * which is what the round-11 artifact could not express (two
    * multi-minute co-tenant bursts swallowed whole median-of-3 windows
    * and attributing them took judge-side forensics across artifacts).
    * benchdiff reads `probe_s` and annotates contended reps
    * automatically.
    */
  private def spinProbe(): Double = {
    val t0 = System.nanoTime()
    var x = 0x9E3779B97F4A7C15L; var i = 0
    while (i < 25000000) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1
    }
    if (x == 42L) println("")
    (System.nanoTime() - t0) / 1e9
  }

  /** Cumulative JVM GC milliseconds across all collectors — recorded
    * per query so a one-off multi-second rep spike is attributable:
    * a spike with a matching GC delta is heap pressure (raise
    * SPARK_DRIVER_MEM); one without is the host (steal/IO stall).
    */
  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(b => math.max(b.getCollectionTime, 0L)).sum
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.engine.Sessions.tune(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup 1: touch every BYTE of the testdata once (OS page cache).
    // count() alone prunes the scan to zero columns and reads little
    // beyond footers, which left data pages cold on a shared host and
    // made round-over-round comparisons swing ±16% diffusely (r4→r5:
    // a bit-identical query moved 4.5×). Raw reads warm the exact
    // cache the timed scans hit.
    locally {
      val buf = new Array[Byte](1 << 20)
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(sfDir))
      try walk.filter(p => p.toString.endsWith(".parquet"))
        .forEach { p =>
          val in = java.nio.file.Files.newInputStream(p)
          try { while (in.read(buf) >= 0) () } finally in.close()
        }
      finally walk.close()
    }
    // warmup 2: JIT/codegen paths + parquet footer/file-index for every
    // table, so the first timed query doesn't absorb session cold-start
    Tables.all.foreach(t => try Tables.load(spark, sfDir, t).count()
      catch { case _: Throwable => () })
    val calBefore = spinCalibration()
    // median-of-N per query (N >= 3, round-6 VERDICT process item): the
    // r6 driver artifact read 1.45× slower than r5 because ONE contended
    // run dominated a best-of-two — a median across three in-process
    // repetitions is robust to a single contended rep; the RAW per-rep
    // times and each query's wall-clock start are recorded too (round-7
    // process item), so within-run contention shows as rep swing at a
    // known time instead of needing to be inferred from spreads
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    // NAME order, not Map iteration order: adding registry entries used
    // to reshuffle every query's neighbors (hash-map iteration), which
    // showed up in benchdiff as ≤1 s "regressions" that were really
    // warm-state ordering effects (round-9 BASELINE note). Sorted order
    // is stable across rounds, so run-to-run diffs compare like to like.
    val timings = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // a throwing query reports -1.0, never a fake timing — round-over-
      // round comparison must distinguish "broke" from "got fast"
      def once(): (Double, Long, Double) = {
        val probe = spinProbe() // per-rep load probe, outside the timed window
        val s0 = System.currentTimeMillis()
        val t0 = System.nanoTime()
        val t = try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
          catch { case _: Throwable => -1.0 }
        // per-REP cache isolation (outside the timed window): operators
        // register internal persist()s and checkpoint blocks with the
        // tracked-cache registry; releasing after EVERY rep makes each
        // rep steady-state — the r8 verdict measured q162's median as
        // ~2× its true warm cost because reps 2-3 paid rep 1's leaked
        // storage. clearCache sweeps anything cached outside the
        // registry (it cannot free checkpoint blocks; the registry can).
        graft.engine.Caches.releaseAll()
        spark.catalog.clearCache()
        (t, s0, probe)
      }
      val startedAt = System.currentTimeMillis()
      val gc0 = gcMillis()
      val repRuns = Seq.fill(reps)(once())
      val gcMs = gcMillis() - gc0
      val runs = repRuns.map(_._1)
      // per-rep start OFFSETS from started_at_ms (round-10 verdict:
      // q162's 29.9 s rep 3 with flat GC needed manual inference — a
      // rep-granular timestamp lets benchdiff pin an outlier rep to a
      // wall-clock window and co-tenant attribution becomes automatic)
      val repStarts = repRuns.map(_._2 - startedAt)
      val probes = repRuns.map(_._3)
      val med =
        if (runs.exists(_ < 0)) -1.0
        else { val s = runs.sorted; s(s.size / 2) }
      (name, med, runs, startedAt, gcMs, repStarts, probes)
    }
    val calAfter = spinCalibration()
    val results = timings.map { case (k, med, _, _, _, _, _) => k -> med }
    def jnum(v: Double): String = if (v < 0) "null" else v.toString
    def jmap(m: Iterable[(String, String)]): String =
      m.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    // the stdout contract keeps the -1.0 sentinel (the driver parses this
    // line); bench_local.json below uses null + an explicit failed list so
    // artifact consumers can't silently sum a sentinel into a total
    val qs = jmap(results.toSeq.sortBy(_._1)
      .map { case (k, v) => k -> v.toString })
    val failedNames = results.toSeq.filter(_._2 < 0).map(_._1).sorted
    val failed = failedNames.size
    val done = results.toSeq.filter(_._2 >= 0)
    val total = done.map(_._2).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    // full per-query artifact in-repo: the driver captures only the
    // stdout TAIL, which truncates the per-query map past ~60 queries —
    // reviewers read this file for the complete picture. `queries` holds
    // the medians (null for a failed query — never a sentinel a summing
    // consumer mistakes for a timing); `reps_raw` the raw per-rep times
    // in run order; `started_at_ms` each query's wall-clock start;
    // `calibration_s` the fixed-spin readings bracketing the run;
    // `gc_ms` the JVM GC time inside each query's reps (attributes a
    // rep spike: matching GC delta ⇒ heap, none ⇒ host);
    // `per_query_s` total/completed (failures excluded from BOTH sides);
    // `min_s`/`min_total_s` the per-query min-of-reps and its sum (the
    // contention-robust plan-cost estimate — round-11 verdict item); and
    // `probe_s`/`probe_ref_s` the per-rep host-load probe readings and
    // the run's idle reference (benchdiff flags reps whose probe blows
    // past the reference — co-tenant windows become machine-readable).
    val qsNull = jmap(results.toSeq.sortBy(_._1)
      .map { case (k, v) => k -> jnum(v) })
    val raws = jmap(timings.toSeq.sortBy(_._1).map { case (k, _, runs, _, _, _, _) =>
      k -> runs.map(jnum).mkString("[", ",", "]") })
    // min_s: min of the non-failed reps — the plan-cost estimator ROBUST
    // to contention bursts (round-11 verdict process item: contention
    // only ever ADDS time, so the min survives a burst that swallows the
    // median; 16 weak-pending rows needed exactly this column)
    val mins = timings.toSeq.sortBy(_._1).map { case (k, _, runs, _, _, _, _) =>
      val ok = runs.filter(_ >= 0)
      k -> (if (ok.isEmpty || runs.exists(_ < 0)) None else Some(ok.min)) }
    val minsJ = jmap(mins.map { case (k, m) =>
      k -> m.map(_.toString).getOrElse("null") })
    val minTotal = mins.flatMap(_._2).sum
    // probe_s: the per-rep host-load probe readings, aligned with
    // reps_raw; probe_ref_s is the run's own idle estimate (its min)
    val probesJ = jmap(timings.toSeq.sortBy(_._1)
      .map { case (k, _, _, _, _, _, ps) =>
        k -> ps.map(_.toString).mkString("[", ",", "]") })
    val probeRef = {
      val all = timings.flatMap(_._7)
      if (all.isEmpty) 0.0 else all.min
    }
    // warm_s: median of reps 2+ (rep 1 pays once-per-JVM costs — codegen
    // of large literals, shuffle-file creation, first-touch of an index
    // dir). Surfacing it beside the cold median lets benchdiff separate
    // cold-methodology movement from genuine plan regressions (the r9
    // verdict spent a page attributing a 1.5× that warm_s answers in
    // one column): cold moved + warm flat ⇒ once-per-JVM cost; both
    // moved ⇒ the plan changed.
    val warms = jmap(timings.toSeq.sortBy(_._1).map { case (k, _, runs, _, _, _, _) =>
      val tail = runs.drop(1).filter(_ >= 0).sorted
      k -> (if (tail.isEmpty) "null" else tail(tail.size / 2).toString) })
    val starts = jmap(timings.toSeq.sortBy(_._1).map { case (k, _, _, t, _, _, _) =>
      k -> t.toString })
    val gcs = jmap(timings.toSeq.sortBy(_._1).map { case (k, _, _, _, g, _, _) =>
      k -> g.toString })
    val repStartsJ = jmap(timings.toSeq.sortBy(_._1)
      .map { case (k, _, _, _, _, ro, _) =>
        k -> ro.map(_.toString).mkString("[", ",", "]") })
    val failedJson = failedNames.map("\"" + _ + "\"").mkString("[", ",", "]")
    val perQuery = if (done.nonEmpty) total / done.size else 0.0
    println(line)
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_local.json"),
      (s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,""" +
        s""""per_query_s":$perQuery,"n_completed":${done.size},""" +
        s""""calibration_s":{"before":$calBefore,"after":$calAfter},""" +
        s""""min_total_s":$minTotal,"probe_ref_s":$probeRef,""" +
        s""""queries":$qsNull,"warm_s":$warms,"min_s":$minsJ,""" +
        s""""reps_raw":$raws,"started_at_ms":$starts,""" +
        s""""reps_start_ms":$repStartsJ,"probe_s":$probesJ,""" +
        s""""gc_ms":$gcs,"heap_max_mb":${Runtime.getRuntime.maxMemory >> 20},""" +
        s""""failed":$failed,"failed_queries":$failedJson,"sf":"$sfDir"}""" +
        "\n").getBytes("UTF-8"))
    // compact LAST line: the full line is ~8 KB at 143 queries and fell
    // out of the driver's tail window in r4/r5 ("parsed": null). This
    // one always fits whichever way the tail truncates; per-query map
    // trimmed to the 15 slowest (the full map lives in bench_local.json)
    val slow = done.sortBy(-_._2).take(15)
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val compact = s"""{"metric":"total","value":$total,"unit":"sec","queries":$slow,"failed":$failed,"sf":"$sfDir","queries_note":"15 slowest of ${results.size}; full map in bench_local.json"}"""
    spark.stop()
    // sentinel-prefixed copy first (grep-recoverable whatever follows),
    // then the BARE compact JSON as the genuinely last stdout line of
    // the whole sbt invocation: build.sbt sets outputStrategy :=
    // StdoutOutput (child stdout passes through with no [info] prefix)
    // and showSuccess := false (no trailing "[success] Total time"
    // line), so a parser taking "the last line" now gets raw JSON.
    // BENCH_r07..r09 all read "parsed": null under the old ordering.
    println(s"BENCH_JSON: $compact")
    println(compact)
    System.out.flush()
  }
}
