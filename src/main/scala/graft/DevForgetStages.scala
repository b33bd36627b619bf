package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage attribution for the two forget-cycle queries (round-14
  * verdict stretch #8): q240 (signature tier) and q241 (ANN tier) are
  * the registry's most expensive operational verbs, and the q162
  * lesson says ATTRIBUTE before optimizing — if the floor is job
  * count (many small Spark jobs, each paying fixed scheduling/commit
  * overhead), leave them and say so; only a data-shaped stage is
  * worth touching. Replays each cycle's exact stages (the
  * DevAppendStages discipline) on fresh copies of the pristine
  * indexes, timing recovery / record / report / policy purge / fsck
  * in isolation, plus each stage's Spark job count from the
  * scheduler's listener counters.
  *
  * Usage: runMain graft.DevForgetStages
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS — as Bench.
  */
object DevForgetStages {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.Sessions.tune(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.multimodal.Curate
    import graft.vector.Similarity

    val jobs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })
    def time[T](label: String)(f: => T): T = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[forgetstages] $label%-34s $s%8.3f s  jobs=${jobs.get() - j0}")
      r
    }

    val docs = Tables.load(spark, sfDir, "documents")
    val emb = Tables.load(spark, sfDir, "embeddings")
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI("file:///"),
      spark.sparkContext.hadoopConfiguration)

    // ---- q240: the signature-tier cycle, stage by stage
    println("[forgetstages] ===== q240_forget_cycle (signature tier) =====")
    val sigBase = java.nio.file.Files.createTempDirectory("graft_fs_sig")
      .toString + "/index"
    Curate.buildSignatureIndex(spark, docs, "doc_id", "text", sigBase)
    graft.engine.Caches.releaseAll()
    val dead = docs.filter(col("doc_id") % 10 === 3).select("doc_id")
    time("recovery (heal probes)") {
      Seq("shingles", "text_hashes", "image_hashes", "audio_hashes",
          "edges", "shingle_freq", "tombstones").foreach { t =>
        val p = s"$sigBase/$t"
        if (fs.exists(new org.apache.hadoop.fs.Path(p)))
          graft.engine.Layout.healStagedReplace(spark, p,
            discardMarkerless = true)
      }
    }
    time("record (tombstone append)") {
      Curate.deleteFromSignatureIndex(spark, sigBase, dead, "doc_id",
        purgeAboveRows = 100000L)
    }
    time("report (masked fractions)") {
      Curate.deletionReport(spark, sigBase)
        .agg(coalesce(max(col("masked_fraction")), lit(0.0))).head()
    }
    time("purge (staged rewrites)") {
      Curate.purgeSignatureIndex(spark, sigBase)
    }
    time("fsck (audit)") {
      Curate.fsckSignatureIndex(spark, sigBase).filter(!col("ok")).count()
    }
    time("q240 one-verb total (fresh copy)") {
      val copy = java.nio.file.Files.createTempDirectory("graft_fs_sig2")
        .toString + "/index"
      org.apache.hadoop.fs.FileUtil.copy(fs,
        new org.apache.hadoop.fs.Path(sigBase), fs,
        new org.apache.hadoop.fs.Path(copy), false,
        spark.sparkContext.hadoopConfiguration)
      // the copy above copied the PURGED index — rebuild request set on
      // survivors misses nothing; run the verb for the composite floor
      Curate.forgetAndVerify(spark, copy,
        docs.filter(col("doc_id") % 10 === 4).select("doc_id"), "doc_id",
        purgeAboveMaskedFraction = 0.05).head()
    }
    graft.engine.Caches.releaseAll(); spark.catalog.clearCache()

    // ---- q241: the ANN-tier cycle, stage by stage
    println("[forgetstages] ===== q241_forget_cycle_ann (ANN tier) =====")
    val annBase = java.nio.file.Files.createTempDirectory("graft_fs_ann")
      .toString + "/index"
    Similarity.buildIvfAdcIndex(emb, "vec_id", "embedding", annBase)
    graft.engine.Caches.releaseAll()
    val deadV = emb.filter(col("vec_id") % 7 === 2).select("vec_id")
    time("recovery (heal probe)") {
      graft.engine.Layout.healStagedPartitionSwap(spark, s"$annBase/codes",
        discardMarkerless = true, writerRole = true)
    }
    time("record (tombstone append)") {
      Similarity.deleteFromIvfAdcIndex(spark, annBase, deadV, "vec_id",
        purgeAboveRows = 100000L)
    }
    time("report (masked fraction)") {
      val codes = spark.read.parquet(s"$annBase/codes").select(col("id"))
      graft.engine.Layout.tombstones(spark, annBase).foreach { ts =>
        codes.join(broadcast(ts), Seq("id"), "left_semi").count()
      }
      codes.count()
    }
    time("purge (partition swap)") {
      Similarity.purgeIvfAdcIndex(spark, annBase)
    }
    time("fsck (audit)") {
      Similarity.fsckIvfAdcIndex(spark, annBase).filter(!col("ok")).count()
    }
    time("q241 one-verb total (fresh set)") {
      Similarity.forgetAndVerifyAnn(spark, annBase,
        emb.filter(col("vec_id") % 7 === 3).select("vec_id"), "vec_id",
        purgeAboveMaskedFraction = 0.05).head()
    }
    graft.engine.Caches.releaseAll(); spark.catalog.clearCache()

    // ---- q248: the BM25-tier cycle, stage by stage
    println("[forgetstages] ===== q248_forget_cycle_bm25 (lexical tier) =====")
    import graft.text.TextStats
    val bmBase = java.nio.file.Files.createTempDirectory("graft_fs_bm")
      .toString + "/index"
    TextStats.buildBm25Index(docs, "doc_id", "text", bmBase)
    graft.engine.Caches.releaseAll()
    val deadD = docs.filter(col("doc_id") % 10 === 3).select("doc_id")
    time("recovery (heal probes)") {
      Seq("tf", "df", "doclen").foreach(t =>
        graft.engine.Layout.healStagedPartitionSwap(spark, s"$bmBase/$t",
          discardMarkerless = true, writerRole = true))
    }
    time("record (tombstone append)") {
      TextStats.deleteFromBm25Index(spark, bmBase, deadD, "doc_id",
        purgeAboveRows = 100000L)
    }
    time("report (masked fraction)") {
      val dl = spark.read.parquet(s"$bmBase/doclen").select(col("doc_id"))
      graft.engine.Layout.tombstones(spark, bmBase).foreach { ts =>
        dl.join(broadcast(ts.select(col("id").as("doc_id"))),
          Seq("doc_id"), "left_semi").count()
      }
      dl.count()
    }
    time("purge (tf/df/doclen/totals rewrites)") {
      TextStats.purgeBm25Index(spark, bmBase)
    }
    time("fsck (audit)") {
      TextStats.fsckBm25Index(spark, bmBase).filter(!col("ok")).count()
    }
    time("q248 one-verb total (fresh set)") {
      TextStats.forgetAndVerifyBm25(spark, bmBase,
        docs.filter(col("doc_id") % 10 === 4).select("doc_id"), "doc_id",
        purgeAboveMaskedFraction = 0.05).head()
    }
    spark.stop()
  }
}
