package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Steady-state APPEND battery for the sketch lifecycle trio (round-11):
  * N consecutive batch commits into the persisted HLL register file,
  * KMV sample file, and CMS cell table, per-commit wall-clock printed.
  * The claim under test: each append pays one scan of the BATCH plus a
  * rewrite of the SKETCH-SIZED standing file — so per-commit cost must
  * stay flat as commits accumulate (unlike a rebuild, which grows with
  * the corpus). Batches are disjoint hash-slices of the src0 documents
  * against the non-src0 standing corpus, as DevAppendSteady.
  *
  * Usage: runMain graft.DevSketchSteady [nBatches]
  */
object DevSketchSteady {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(10)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.Sessions.tune(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")
    val corpus = docs.filter(col("source") =!= "src0")
    val batchPool = docs.filter(col("source") === "src0")
    corpus.count(); batchPool.count()

    val root = java.nio.file.Files.createTempDirectory("graft_sketch_steady")
      .toString
    text.TextStats.buildHllRegisters(corpus, "source", "text", 3, 10, s"$root/hll")
    text.TextStats.buildKmvSamples(corpus, "source", "text", 3, 64, s"$root/kmv")
    text.TextStats.buildCmsSketch(corpus, "text", 3, s"$root/cms")
    // untimed warm-in commit (JIT + codec paths), as DevAppendSteady
    val warm = batchPool.limit(20)
    text.TextStats.appendHllRegisters(spark, warm, "source", "text", s"$root/hll")
    text.TextStats.appendKmvSamples(spark, warm, "source", "text", s"$root/kmv")
    text.TextStats.appendCmsSketch(spark, warm, "text", s"$root/cms")

    def series(label: String)(commit: org.apache.spark.sql.DataFrame => Unit): Unit = {
      val ts = (1 to n).map { i =>
        val batch = batchPool.filter(
          pmod(xxhash64(col("doc_id")), lit(n)) === (i - 1))
        val t0 = System.nanoTime()
        commit(batch)
        (System.nanoTime() - t0) / 1e9
      }
      val warmTs = ts.drop(1)
      val mean = warmTs.sum / warmTs.size
      println(f"[sketch-steady] $label n=$n warm_mean=$mean%.2f s " +
        f"max/min(warm)=${warmTs.max / warmTs.min}%.2f " +
        f"series=${ts.map(t => f"$t%.2f").mkString("[", ",", "]")}")
    }
    series("hll_registers") { b =>
      text.TextStats.appendHllRegisters(spark, b, "source", "text", s"$root/hll") }
    series("kmv_samples") { b =>
      text.TextStats.appendKmvSamples(spark, b, "source", "text", s"$root/kmv") }
    series("cms_cells") { b =>
      text.TextStats.appendCmsSketch(spark, b, "text", s"$root/cms") }
    // fourth axis (round 12): the quantile sketch's bottom-k sample
    // file under the same commit cadence — batches are disjoint hash
    // slices of the ODD event ids against a standing even-id corpus
    locally {
      val events = Tables.load(spark, sfDir, "events")
      val standing = events.filter(col("event_id") % 2 === 0)
      val pool = events.filter(col("event_id") % 2 =!= 0)
      standing.count(); pool.count()
      ops.Stats.buildQuantileSketch(standing, "event_type", "event_id",
        col("value"), k = 256, s"$root/quant")
      ops.Stats.appendQuantileSketch(spark, pool.limit(50), "event_type",
        "event_id", col("value"), s"$root/quant") // untimed warm-in
      val ts = (1 to n).map { i =>
        val batch = pool.filter(
          pmod(xxhash64(col("event_id")), lit(n)) === (i - 1))
        val t0 = System.nanoTime()
        ops.Stats.appendQuantileSketch(spark, batch, "event_type",
          "event_id", col("value"), s"$root/quant")
        (System.nanoTime() - t0) / 1e9
      }
      val warmTs = ts.drop(1)
      println(f"[sketch-steady] quantile_samples n=$n " +
        f"warm_mean=${warmTs.sum / warmTs.size}%.2f s " +
        f"max/min(warm)=${warmTs.max / warmTs.min}%.2f " +
        f"series=${ts.map(t => f"$t%.2f").mkString("[", ",", "]")}")
      val r0 = System.nanoTime()
      ops.Stats.quantileFromSketch(spark, s"$root/quant").count()
      println(f"[sketch-steady] quantile read after $n commits: " +
        f"${(System.nanoTime() - r0) / 1e9}%.2f s")
    }
    // the read paths stay sketch-sized regardless of commit count
    val t0 = System.nanoTime()
    text.TextStats.hllEstimateFromRegisters(spark, s"$root/hll").count()
    val t1 = System.nanoTime()
    text.TextStats.kmvOverlapFromSamples(spark, s"$root/kmv").count()
    graft.engine.Caches.releaseAll()
    val t2 = System.nanoTime()
    text.TextStats.cmsLookupFromSketch(spark, s"$root/cms",
      text.TextStats.CmsProbeGrams).count()
    val t3 = System.nanoTime()
    println(f"[sketch-steady] reads after $n commits: " +
      f"hll=${(t1 - t0) / 1e9}%.2f s kmv=${(t2 - t1) / 1e9}%.2f s " +
      f"cms=${(t3 - t2) / 1e9}%.2f s")
    spark.stop()
  }
}
