package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg (dev iteration only; the driver passes two): a
    // comma-separated list of query names to dump instead of all
    val (sfDir, outDir, only) = args match {
      case Array(s, o)    => (s, o, None)
      case Array(s, o, f) => (s, o, Some(f.split(",").toSet))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.engine.Sessions.tune(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // A throwing query must be LOUD, not silently absent (round 7: q91
    // vanished from CORRECTNESS instead of appearing red). Each failure
    // leaves a per-query `_ERROR.txt` marker where its parquet would be,
    // all failures are listed in `failed.json`, and the run ends with a
    // one-line scoreboard on stdout.
    val failed = scala.collection.mutable.LinkedHashMap[String, String]()
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = s"${e.getClass.getName}: ${e.getMessage}"
        failed(name) = msg
        System.err.println(s"[verify] $name failed: $msg")
        // clear any STALE parquet from a previous run into the same
        // outDir first — a leftover part file next to _ERROR.txt would
        // let the comparer report a stale PASS for a failing query,
        // the exact masking this marker exists to prevent
        val d = Paths.get(s"$outDir/$name")
        if (Files.exists(d)) {
          val walk = Files.walk(d)
          try walk.sorted(java.util.Comparator.reverseOrder())
            .forEach(p => Files.deleteIfExists(p))
          finally walk.close()
        }
        Files.createDirectories(d)
        Files.writeString(Paths.get(s"$outDir/$name/_ERROR.txt"), msg)
      }
      // release per-query operator-internal caches: the tracked-cache
      // registry frees persist()s AND checkpoint blocks (which
      // clearCache alone cannot); clearCache still sweeps anything
      // cached outside the registry
      graft.engine.Caches.releaseAll()
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // corpus-tied exact-twin oracles (approximate == exact is a measured
    // fact of the corpus, not a law) are emitted only on the corpora
    // where the premise is pinned — elsewhere the driver records the
    // weaker rows-check instead of a spurious hash failure
    val corpus = Paths.get(sfDir).getFileName.toString
    val json = SparkEntry.oracleSql
      .filter { case (k, _) =>
        SparkEntry.oracleMeasuredOn.get(k).forall(_.contains(corpus)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    Files.writeString(Paths.get(s"$outDir/failed.json"),
      failed.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    // HEAD stamp (round-14 structural fix): twice in a row a sweep's
    // provenance was ambiguous because queries landed after the close
    // — every dump now records the commit it ran at, so "the sweep ran
    // at the close HEAD" is a checkable fact of the artifact, not a
    // claim in prose. DOTFILE on purpose: the comparer enumerates
    // query dirs with a `*` glob (check.py:45 mirrors the driver), so
    // a visible name would enter the compare as a bogus query row.
    Files.writeString(Paths.get(s"$outDir/.head"),
      graft.engine.Sessions.gitHead.getOrElse("unknown") +
        s" queries=${selected.size}\n")
    // exit code stays 0 either way — the driver's per-query compare is
    // the failure surface; a nonzero exit could void the whole dump
    println(s"[verify] ${selected.size - failed.size}/${selected.size} " +
      s"dumped, failed: ${failed.keys.mkString("[", ", ", "]")}")
    spark.stop()
  }
}
