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
    // curation audits: which source polluted the raw corpus, and is the
    // shipped split hygienic? Dedup-then-split makes leakage zero BY
    // CONSTRUCTION (a >=threshold pair is an edge, edges collapse to one
    // canonical doc, so no near-dup pair survives to straddle a split) —
    // assert the invariant rather than trust it. The construction is
    // exact up to jaccardPairs' hotShingleCap (identical settings on
    // both passes): a nonzero count means either a cap-induced miss on
    // the denser pre-dedup corpus (raise hotShingleCap) or a real
    // regression — both warrant failing the run.
    val clusters = text.Clusters.dupClusters(docs, "doc_id", "text", 5, 0.5)
    docs.select(col("doc_id").cast("long").as("doc_id"), col("source"))
      .join(clusters, "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n"),
        sum(when(!col("is_canonical"), 1L).otherwise(0L)).as("dups"))
      .orderBy(col("dups").desc).limit(3).collect()
      .foreach(r => println(s"[audit] source=${r.get(0)} " +
        s"docs=${r.get(1)} dups=${r.get(2)}"))
    val sp = kept.select(col("doc_id").cast("long").as("doc_id"), col("split"))
    val leaks = text.Dedup.jaccardPairs(kept, "doc_id", "text", 5, 0.5)
      .join(sp.toDF("doc_a", "split_a"), "doc_a")
      .join(sp.toDF("doc_b", "split_b"), "doc_b")
      .filter(col("split_a") =!= col("split_b")).count()
    require(leaks == 0L,
      s"split leakage after dedup must be zero by construction, got $leaks")
    println(s"[audit] split leakage pairs = $leaks (invariant holds)")
    // curation BIAS report: how far did filtering+dedup shift the length
    // distribution of what ships vs what arrived? A large KL here means
    // the quality gates are selecting a different corpus than the crawl
    // delivered — the q147 drift monitor pointed at the pipeline's own
    // input/output boundary
    val bias = text.TextStats.distributionDrift(kept, docs,
        floor(length(col("text")) / lit(50)))
      .select("kl_total").as[Double](org.apache.spark.sql.Encoders.scalaDouble)
      .head()
    println(f"[audit] curation length-distribution bias KL(kept||input) = $bias%.6f")
    // model-free SEMANTIC residue audit: after the token-level dedup,
    // how many shipped docs still near-duplicate each other in the
    // hashed-TF-IDF embedding space? Token-level Jaccard misses
    // paraphrase-shaped duplication; the hashed-cosine pass (no trained
    // model in the loop) measures what survives it — a large residue
    // says the corpus wants the semantic-cluster stage
    // (q204 machinery) added to its keep rule.
    val semResidue = vector.Similarity.embedNearDup(
        text.TextStats.hashedTfidfEmbed(kept, "doc_id", "text", 64),
        "doc_id", "embedding", 0.95).count()
    println(s"[audit] semantic near-dup residue pairs (cos>=0.95) = $semResidue")
    // release the audits' persisted shingle relations (jaccardPairs'
    // caller-releases-cache contract) before the final counting stages
    spark.catalog.clearCache()
    val t3 = lap("audits", t2)
    val n = docs.count()
    val k = kept.count()
    println(f"[total] $n docs in, $k kept " +
      f"(${100.0 * k / n}%.1f%%), ${(System.nanoTime() - t0) / 1e9}%.2f s end-to-end")
    spark.stop()
  }
}
