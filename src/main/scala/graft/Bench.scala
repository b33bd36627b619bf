package graft
import org.apache.spark.sql.SparkSession
object Bench {
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
    // median-of-N per query (N >= 3, round-6 VERDICT process item): the
    // r6 driver artifact read 1.45× slower than r5 because ONE contended
    // run dominated a best-of-two — a median across three in-process
    // repetitions is robust to a single contended rep, and the recorded
    // spread (max−min over reps) lets a reviewer see residual host noise
    // per query instead of inferring it from round-over-round deltas
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    val timings = SparkEntry.queries.map { case (name, fn) =>
      // a throwing query reports -1.0, never a fake timing — round-over-
      // round comparison must distinguish "broke" from "got fast"
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case _: Throwable => -1.0 }
      }
      val runs = Seq.fill(reps)(once())
      // per-query cache isolation: several operators persist() frames for
      // self-join reuse (similarity/dedup) and a lazy result hands the
      // unpersist obligation to the caller — that's Bench here. Without
      // this, caches accumulate across the 80-query run and later scans
      // pay eviction/GC for earlier queries' storage (the r2 q28/q34/q36
      // co-regression pattern); with it, every timing is order-independent.
      spark.catalog.clearCache()
      if (runs.exists(_ < 0)) name -> ((-1.0, -1.0))
      else {
        val sorted = runs.sorted
        name -> ((sorted(sorted.size / 2), sorted.last - sorted.head))
      }
    }
    val results = timings.map { case (k, (med, _)) => k -> med }
    def jmap(m: Iterable[(String, Double)]): String =
      m.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qs = jmap(results.toSeq.sortBy(_._1))
    val spreads = jmap(timings.toSeq.sortBy(_._1)
      .map { case (k, (_, sp)) => k -> sp })
    val failed = results.count(_._2 < 0)
    val total = results.values.filter(_ >= 0).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    // full per-query artifact in-repo: the driver captures only the
    // stdout TAIL, which truncates the per-query map past ~60 queries —
    // reviewers read this file for the complete picture. `queries` holds
    // the medians (the comparable number); `spread` the per-query
    // max−min over the reps (the noise floor).
    println(line)
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_local.json"),
      (s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"queries":$qs,"spread":$spreads,"failed":$failed,"sf":"$sfDir"}""" + "\n")
        .getBytes("UTF-8"))
    // compact LAST line: the full line is ~8 KB at 143 queries and fell
    // out of the driver's tail window in r4/r5 ("parsed": null). This
    // one always fits whichever way the tail truncates; per-query map
    // trimmed to the 15 slowest (the full map lives in bench_local.json)
    val slow = results.toSeq.filter(_._2 >= 0).sortBy(-_._2).take(15)
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$slow,"failed":$failed,"sf":"$sfDir","queries_note":"15 slowest of ${results.size}; full map in bench_local.json"}""")
    spark.stop()
  }
}
