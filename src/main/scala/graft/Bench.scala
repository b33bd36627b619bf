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
    * run immediately BEFORE each rep's timed window: a per-rep CPU-side
    * host-load probe. On an idle host every probe reads the same ~50 ms;
    * a probe far above the run's own minimum marks THAT rep as contended.
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

  /** Per-rep I/O-side host-load probe: a timed ~8 MB streaming read of
    * the run's largest testdata parquet file. The round-12 driver run
    * carried a ~195–350 s burst window during which query reps swung
    * 13× while the CPU spin probe read quiet (1.0–1.6×) — the
    * contention was on the I/O/memory side, invisible to pure ALU. The
    * file is page-cache-warm after the byte-walk warmup, so on an idle
    * host this reads at memory-copy speed (single-digit ms); a reading
    * far above the run's own minimum means the page cache was evicted
    * or the storage/memory path is saturated by a co-tenant — exactly
    * the burst class the spin probe missed. benchdiff reads
    * `io_probe_s` against `io_probe_ref_s` the same way it reads the
    * spin probe columns.
    */
  private var ioProbePath: java.nio.file.Path = null
  private def pickIoProbeFile(sfDir: String): Unit = {
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(sfDir))
    try {
      import scala.jdk.CollectionConverters._
      val parquets = walk.iterator().asScala
        .filter(_.toString.endsWith(".parquet")).toVector
      if (parquets.nonEmpty)
        ioProbePath = parquets.maxBy(p => java.nio.file.Files.size(p))
    } finally walk.close()
  }
  private def ioProbe(): Double = {
    if (ioProbePath == null) return 0.0
    val t0 = System.nanoTime()
    val buf = new Array[Byte](1 << 20)
    val in = java.nio.file.Files.newInputStream(ioProbePath)
    try {
      var n = 0L
      var r = in.read(buf)
      while (r >= 0 && n < (8L << 20)) { n += r; r = in.read(buf) }
    } finally in.close()
    (System.nanoTime() - t0) / 1e9
  }

  /** Cumulative JVM GC milliseconds across all collectors — recorded
    * per rep so a one-off multi-second rep spike is attributable:
    * a spike with a matching GC delta is heap pressure (raise
    * SPARK_DRIVER_MEM); one without is the host (steal/IO stall).
    */
  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(b => math.max(b.getCollectionTime, 0L)).sum
  }

  /** One timed execution of one query, with its per-rep telemetry. */
  private final case class Rep(t: Double, startMs: Long, probe: Double,
                               io: Double, gcMs: Long)

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
    pickIoProbeFile(sfDir)
    // warmup 2: JIT/codegen paths + parquet footer/file-index for every
    // table, so the first timed query doesn't absorb session cold-start
    Tables.all.foreach(t => try Tables.load(spark, sfDir, t).count()
      catch { case _: Throwable => () })
    val calBefore = spinCalibration()
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    // NAME order, not Map iteration order: adding registry entries used
    // to reshuffle every query's neighbors (hash-map iteration), which
    // showed up in benchdiff as ≤1 s "regressions" that were really
    // warm-state ordering effects (round-9 BASELINE note). Sorted order
    // is stable across rounds, so run-to-run diffs compare like to like.
    val named = SparkEntry.queries.toSeq.sortBy(_._1)
    // INTERLEAVED rep passes (round-12 verdict process item): the full
    // sorted registry runs once per pass — pass 1 for every query, then
    // pass 2, then pass 3 — instead of N back-to-back reps per query.
    // With back-to-back reps, a minutes-long co-tenant burst covers ALL
    // of one query's reps (the r12 driver burst swallowed q170's entire
    // sample: 6.1/4.8/3.0 s vs 0.41 s committed, so even min-of-reps
    // stayed 7× inflated). Interleaved, the same burst lands on one rep
    // of MANY queries and each query keeps (reps-1) clean readings —
    // min-of-reps becomes robust to any burst shorter than a whole
    // pass (~1-2 min at sf0.1), and a longer burst is visible as an
    // entire inflated pass bracketed by clean ones. Per-rep telemetry
    // (probe/io-probe/gc/start-offset) is unchanged, just reassembled
    // per query afterward. Cold/warm semantics are preserved: pass 1
    // still pays each query's once-per-JVM costs, passes 2+ are warm.
    val repsByQuery = Array.fill(named.size)(List.empty[Rep])
    var pass = 0
    while (pass < reps) {
      var qi = 0
      while (qi < named.size) {
        val (_, fn) = named(qi)
        val probe = spinProbe() // per-rep load probes, outside the timed window
        val io = ioProbe()
        val gc0 = gcMillis()
        val s0 = System.currentTimeMillis()
        val t0 = System.nanoTime()
        // a throwing query reports -1.0, never a fake timing — round-
        // over-round comparison must distinguish "broke" from "got fast"
        val t = try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
          catch { case _: Throwable => -1.0 }
        val gcD = gcMillis() - gc0
        // per-REP cache isolation (outside the timed window): operators
        // register internal persist()s and checkpoint blocks with the
        // tracked-cache registry; releasing after EVERY rep makes each
        // rep steady-state — the r8 verdict measured q162's median as
        // ~2× its true warm cost because reps 2-3 paid rep 1's leaked
        // storage. clearCache sweeps anything cached outside the
        // registry (it cannot free checkpoint blocks; the registry can).
        graft.engine.Caches.releaseAll()
        spark.catalog.clearCache()
        repsByQuery(qi) = repsByQuery(qi) :+ Rep(t, s0, probe, io, gcD)
        qi += 1
      }
      pass += 1
    }
    val calAfter = spinCalibration()
    // reassemble the per-query view the artifact contract promises:
    // median-of-N (round-6 process item), min-of-reps (round-11),
    // warm median of passes 2+ (round-9), per-rep raw/starts/probes
    val timings = named.zipWithIndex.map { case ((name, _), qi) =>
      val rs = repsByQuery(qi)
      val runs = rs.map(_.t)
      val med =
        if (runs.exists(_ < 0)) -1.0
        else { val s = runs.sorted; s(s.size / 2) }
      val startedAt = rs.head.startMs
      // per-rep start OFFSETS from started_at_ms (round-10 verdict):
      // under interleaving these are minutes apart — which is the point;
      // benchdiff pins an outlier rep to a wall-clock window and sees
      // whether neighboring queries' same-pass reps spiked with it
      val repStarts = rs.map(_.startMs - startedAt)
      val probes = rs.map(_.probe)
      val ios = rs.map(_.io)
      val gcMs = rs.map(_.gcMs).sum
      (name, med, runs, startedAt, gcMs, repStarts, probes, ios)
    }
    val results = timings.map { case (k, med, _, _, _, _, _, _) => k -> med }
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
    // in PASS order (rep i of every query ran in the same wall-clock
    // window — the interleaved schedule); `started_at_ms` each query's
    // pass-1 wall-clock start; `calibration_s` the fixed-spin readings
    // bracketing the run; `gc_ms` the summed JVM GC time inside each
    // query's reps; `per_query_s` total/completed; `min_s`/`min_total_s`
    // the per-query min-of-reps and its sum (the contention-robust
    // plan-cost estimate); `probe_s`/`probe_ref_s` the per-rep CPU
    // spin-probe readings and the run's idle reference; and
    // `io_probe_s`/`io_probe_ref_s` the per-rep timed-8MB-read readings
    // and reference (round-12: the burst the spin probe missed was
    // I/O-side; this column makes that class machine-readable).
    val qsNull = jmap(results.toSeq.sortBy(_._1)
      .map { case (k, v) => k -> jnum(v) })
    val raws = jmap(timings.toSeq.sortBy(_._1).map { case (k, _, runs, _, _, _, _, _) =>
      k -> runs.map(jnum).mkString("[", ",", "]") })
    // min_s: min of the non-failed reps — the plan-cost estimator ROBUST
    // to contention bursts (contention only ever ADDS time, so the min
    // survives a burst; under the interleaved schedule a burst must
    // outlast ALL passes — the whole run — to inflate it)
    val mins = timings.toSeq.sortBy(_._1).map { case (k, _, runs, _, _, _, _, _) =>
      val ok = runs.filter(_ >= 0)
      k -> (if (ok.isEmpty || runs.exists(_ < 0)) None else Some(ok.min)) }
    val minsJ = jmap(mins.map { case (k, m) =>
      k -> m.map(_.toString).getOrElse("null") })
    val minTotal = mins.flatMap(_._2).sum
    // probe_s: the per-rep host-load probe readings, aligned with
    // reps_raw; probe_ref_s is the run's own idle estimate (its min)
    val probesJ = jmap(timings.toSeq.sortBy(_._1)
      .map { case (k, _, _, _, _, _, ps, _) =>
        k -> ps.map(_.toString).mkString("[", ",", "]") })
    val probeRef = {
      val all = timings.flatMap(_._7)
      if (all.isEmpty) 0.0 else all.min
    }
    val ioProbesJ = jmap(timings.toSeq.sortBy(_._1)
      .map { case (k, _, _, _, _, _, _, ios) =>
        k -> ios.map(_.toString).mkString("[", ",", "]") })
    val ioProbeRef = {
      val all = timings.flatMap(_._8)
      if (all.isEmpty) 0.0 else all.min
    }
    // warm_s: median of passes 2+ (pass 1 pays once-per-JVM costs —
    // codegen of large literals, shuffle-file creation, first-touch of
    // an index dir). cold moved + warm flat ⇒ once-per-JVM cost; both
    // moved ⇒ the plan changed.
    val warms = jmap(timings.toSeq.sortBy(_._1).map { case (k, _, runs, _, _, _, _, _) =>
      val tail = runs.drop(1).filter(_ >= 0).sorted
      k -> (if (tail.isEmpty) "null" else tail(tail.size / 2).toString) })
    val starts = jmap(timings.toSeq.sortBy(_._1).map { case (k, _, _, t, _, _, _, _) =>
      k -> t.toString })
    val gcs = jmap(timings.toSeq.sortBy(_._1).map { case (k, _, _, _, g, _, _, _) =>
      k -> g.toString })
    val repStartsJ = jmap(timings.toSeq.sortBy(_._1)
      .map { case (k, _, _, _, _, ro, _, _) =>
        k -> ro.map(_.toString).mkString("[", ",", "]") })
    val failedJson = failedNames.map("\"" + _ + "\"").mkString("[", ",", "]")
    val perQuery = if (done.nonEmpty) total / done.size else 0.0
    println(line)
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_local.json"),
      (s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,""" +
        s""""schedule":"interleaved","per_query_s":$perQuery,""" +
        s""""n_completed":${done.size},""" +
        s""""calibration_s":{"before":$calBefore,"after":$calAfter},""" +
        s""""min_total_s":$minTotal,"probe_ref_s":$probeRef,""" +
        s""""io_probe_ref_s":$ioProbeRef,""" +
        s""""queries":$qsNull,"warm_s":$warms,"min_s":$minsJ,""" +
        s""""reps_raw":$raws,"started_at_ms":$starts,""" +
        s""""reps_start_ms":$repStartsJ,"probe_s":$probesJ,""" +
        s""""io_probe_s":$ioProbesJ,""" +
        s""""gc_ms":$gcs,"heap_max_mb":${Runtime.getRuntime.maxMemory >> 20},""" +
        s""""head":"${graft.engine.Sessions.gitHead.getOrElse("unknown")}",""" +
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
    println(s"BENCH_JSON: $compact")
    println(compact)
    System.out.flush()
  }
}
