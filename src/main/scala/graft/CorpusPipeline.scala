package graft

import org.apache.spark.sql.functions._

// dev scratch — end-to-end corpus curation run over the documents table:
// quality gate → transitive near-dup dedup (canonical docs only) →
// deterministic split assignment → split/lang-partitioned parquet layout
// + quality-signal sidecar (repetition ratio, corpus-LM logprob). The
// text-side twin of DevPipeline's medallion stress run.
object CorpusPipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val base = java.nio.file.Files.createTempDirectory("corpus").toString
    val spark = engine.Sessions.local("graft-corpus", cores = 32)
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    def lap(tag: String, from: Long): Long = {
      val now = System.nanoTime()
      println(f"[stage] $tag%-18s ${(now - from) / 1e9}%.2f s")
      now
    }
    val docs = Tables.load(spark, sfDir, "documents")
    // curate: quality gate → canonical-per-cluster dedup → split column
    val curated = text.Curation.curate(docs, "doc_id", "text",
      minTokens = 25, maxStopwordRatio = 0.15)
    // split/lang-partitioned layout, co-located so each partition dir
    // gets one file per write, not one per shuffle partition
    curated.repartition(col("split"), col("lang"))
      .write.mode("overwrite").partitionBy("split", "lang")
      .parquet(s"$base/corpus")
    val t1 = lap("curate+write", t0)
    // quality-signal sidecar over the kept docs only, committed as a
    // SNAPSHOT so each curation run is a reproducible, time-travelable
    // version and concurrent readers never see a half-written sidecar
    val kept = spark.read.parquet(s"$base/corpus")
    val signals = text.Curation.repetitionRatio(kept, "doc_id", "text", 3)
      .join(text.Curation.docLogProb(kept, "doc_id", "text"), "doc_id")
    val version = engine.Snapshots.write(signals, s"$base/signals")
    val reaped = engine.Snapshots.vacuum(spark, s"$base/signals", keepLast = 2)
    println(s"[stage] signals v$version committed, ${reaped.size} vacuumed")
    val t2 = lap("signals", t1)
    val n = docs.count()
    val k = kept.count()
    println(f"[total] $n docs in, $k kept " +
      f"(${100.0 * k / n}%.1f%%), ${(System.nanoTime() - t0) / 1e9}%.2f s end-to-end")
    spark.stop()
  }
}
