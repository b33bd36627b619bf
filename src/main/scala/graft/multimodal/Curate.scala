package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.{Clusters, Curation, Dedup}

/** Unified MULTIMODAL corpus curation: one keep/drop/split manifest
  * across every modality of a document — text near-dups (exact-hash ∪
  * n-gram Jaccard), perceptual image near-dups (aHash banding), and
  * perceptual audio near-dups (energy-hash banding) — composed into a
  * single transitive cluster graph.
  *
  * Why one graph instead of per-modality passes: a training document is
  * a leak if ANY of its modalities near-duplicates a document in
  * another split — two pages with different text but the same photo
  * must not straddle train/test. Unioning the modality edge lists
  * before the connected-components walk makes the cluster the unit of
  * atomicity for every modality at once, so hashing the cluster id for
  * split assignment gives ZERO cross-split near-dup pairs in each
  * modality by construction (the [[graft.text.Clusters.clusterSafeSplits]]
  * argument, extended to the union graph; spec-asserted per modality).
  *
  * Scale posture: every edge source is the guarded sub-quadratic
  * variant — Jaccard via the shared-shingle equi-join, image/audio via
  * 16-bit-chunk pigeonhole banding with hot-chunk refusal — the
  * component walk is the hybrid driver/star dispatch, and the split is
  * a map-only hash of the cluster id. Nothing new is quadratic; the
  * composition adds two unions and one left-join per modality flag.
  */
object Curate {

  /** The manifest: one row per doc — `(doc_id, cluster_id, keep,
    * split, text_dup, image_dup, audio_dup)` where `keep` marks the
    * min-id canonical of each unified cluster (the drop list IS the
    * dedup delete set), `split` hashes the cluster id, and the flags
    * say which modality made the doc a duplicate of anything.
    *
    * `imageMedia`/`audioMedia` are the per-modality payload tables
    * (`media_id` keyed to `docs`' ids, `format`, binary `payload` —
    * the [[Media]] row shape). They DEFAULT to the deterministic
    * id-derived fixture tables so the driver gate can verify the whole
    * composition against a closed-form oracle; a production corpus
    * passes its real payload tables here — with the defaults, the
    * perceptual edges describe the fixture, not any actual media.
    */
  def unifiedManifest(spark: SparkSession, docs: DataFrame, idCol: String,
                      textCol: String, pcts: Seq[(String, Int)],
                      shingleN: Int = 5, threshold: Double = 0.5,
                      maxDist: Int = 3,
                      maxChunkBucket: Long = graft.ops.GuardBounds.MaxChunkBucket,
                      imageMedia: Option[DataFrame] = None,
                      audioMedia: Option[DataFrame] = None): DataFrame =
   graft.engine.Caches.scopedMaterialized("unifiedManifest.result") {
    val ids = docs.select(col(idCol).cast("long").as("doc_id"))

    // text edges: exact-dup stars (min id ← members) ∪ Jaccard pairs —
    // the dupClusters edge recipe, kept here so the modality flag can
    // see the text edge list before the union erases provenance
    val jac = Dedup.jaccardPairs(docs, idCol, textCol, shingleN, threshold)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val byHash = docs.select(col(idCol).cast("long").as("id"),
      md5(col(textCol)).as("h"))
    val exact = byHash
      .withColumn("src", min(col("id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("h")))
      .filter(col("id") =!= col("src"))
      .select(col("src"), col("id").as("dst"))
    val textEdges = jac.union(exact)

    // perceptual edges, one banded pass per modality (both inherit the
    // pigeonhole completeness law and the hot-chunk refusal)
    val imageEdges = Media.phashBandedPairs(spark,
        imageMedia.getOrElse(Media.imageHashTable(spark, docs, idCol)),
        maxDist, maxChunkBucket)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val audioEdges = Media.audioHashBandedPairs(spark,
        audioMedia.getOrElse(Media.audioHashTable(spark, docs, idCol)),
        maxDist, maxChunkBucket)
      .select(col("id_a").as("src"), col("id_b").as("dst"))

    // Each edge frame feeds the walk AND its provenance flag. They are
    // deliberately NOT persisted: every frame is two cheap joins over
    // base relations that ARE cached (the shingle and chunk relations),
    // and measured at sf0.1 an extra cache layer here made the whole
    // manifest ~50% slower (serialize+materialize ahead of the CC
    // checkpoint) than recomputing from those caches per consumer.
    val comp = Clusters.connectedComponents(
      textEdges.union(imageEdges).union(audioEdges), "src", "dst")

    val assigned = ids
      .join(comp.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("cluster_id"))
    withModalityFlags(Curation.splitAssign(assigned, "cluster_id", pcts),
        textEdges, imageEdges, audioEdges)
      .select(col("doc_id"), col("cluster_id"),
        (col("doc_id") === col("cluster_id")).as("keep"), col("split"),
        col("text_dup"), col("image_dup"), col("audio_dup"))
   }

  /** Join the three modality incidence flags onto a per-doc frame —
    * a doc is `<modality>_dup` iff it is incident to an edge of that
    * family. ONE definition shared by [[unifiedManifest]] and
    * [[appendManifest]] so flag semantics cannot desync.
    */
  private def withModalityFlags(docs: DataFrame, textEdges: DataFrame,
                                imageEdges: DataFrame,
                                audioEdges: DataFrame): DataFrame = {
    def dupFlag(e: DataFrame, name: String): DataFrame =
      e.select(col("src").as("doc_id"))
        .union(e.select(col("dst").as("doc_id")))
        .distinct().withColumn(name, lit(true))
    docs
      .join(dupFlag(textEdges, "text_dup"), Seq("doc_id"), "left")
      .join(dupFlag(imageEdges, "image_dup"), Seq("doc_id"), "left")
      .join(dupFlag(audioEdges, "audio_dup"), Seq("doc_id"), "left")
      .withColumn("text_dup", coalesce(col("text_dup"), lit(false)))
      .withColumn("image_dup", coalesce(col("image_dup"), lit(false)))
      .withColumn("audio_dup", coalesce(col("audio_dup"), lit(false)))
  }

  /** Incremental MULTIMODAL append: [[graft.text.Clusters.appendDedup]]
    * extended to every modality — a batch doc is a duplicate if its
    * text, image, OR audio near-duplicates the corpus or another batch
    * doc, and the verdict component is walked over the union of the
    * three incremental edge families (text via the asymmetric prefix
    * join, image/audio via the asymmetric chunk joins — every family
    * scales with the batch, never corpus²). One row per batch doc:
    * `(doc_id, dup_of, keep, text_dup, image_dup, audio_dup)` — the
    * verdict columns follow appendDedup's contract and the flags say
    * which modality made the doc a duplicate of anything. Same
    * deduped-corpus precondition per modality; same fixture-default
    * media tables as [[unifiedManifest]] (pass real payload tables in
    * production). Cache contract: SELF-CLEANING — the recurring
    * operator (once per ingest batch) materializes its batch-sized
    * verdict eagerly and releases every internal cache before
    * returning ([[graft.engine.Caches.scopedMaterialized]]), so N
    * consecutive appends hold batch-sized state only.
    */
  def appendManifest(spark: SparkSession, corpus: DataFrame,
                     batch: DataFrame, idCol: String, textCol: String,
                     shingleN: Int = 5, threshold: Double = 0.5,
                     maxDist: Int = 3, maxChunkBucket: Long = graft.ops.GuardBounds.MaxChunkBucket,
                     hotShingleCap: Int = graft.ops.GuardBounds.HotShingleCap,
                     imageMedia: Option[DataFrame] = None,
                     audioMedia: Option[DataFrame] = None): DataFrame =
   graft.engine.Caches.scopedMaterialized("appendManifest.result") {
    val c = corpus.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("text"))
    val b = batch.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("text"))
    val all = c.union(b)
    val newIds = b.select("doc_id")
    val textEdges = Clusters.appendTextEdges(all, b, shingleN, threshold,
      hotShingleCap)
    val imageEdges = Media.phashBandedPairsIncremental(spark,
        imageMedia.getOrElse(Media.imageHashTable(spark, all, "doc_id")),
        newIds, maxDist, maxChunkBucket)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val audioEdges = Media.audioHashBandedPairsIncremental(spark,
        audioMedia.getOrElse(Media.audioHashTable(spark, all, "doc_id")),
        newIds, maxDist, maxChunkBucket)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    // NOT persisted — same measured tradeoff as unifiedManifest: the
    // frames recompute from cached shingle/chunk relations cheaper
    // than an extra cache layer
    withModalityFlags(
        Clusters.appendVerdicts(c.select("doc_id"), newIds,
          textEdges.union(imageEdges).union(audioEdges)),
        textEdges, imageEdges, audioEdges)
      .select(col("doc_id"), col("dup_of"), col("keep"),
        col("text_dup"), col("image_dup"), col("audio_dup"))
   }

  /** Persist the SIGNATURE INDEX of a standing corpus — the build half
    * of the build/probe split applied to the manifest family (the
    * [[graft.vector.Similarity.buildIvfAdcIndex]] discipline): every
    * derived signature the dedup/manifest operators consume, written
    * once so consumers stop re-deriving them per call. Layout:
    *
    *   - `shingles`     `(doc, shingle)` — the text n-gram set relation
    *   - `text_hashes`  `(doc_id, h)`    — md5 exact-dup keys
    *   - `image_hashes` `(media_id, phash)` — perceptual aHash64
    *   - `audio_hashes` `(media_id, phash)` — energy hash64
    *   - `meta`         `(shingle_n)`    — build parameter, validated
    *                                        by consumers
    *
    * Signatures are deterministic functions of the corpus, so an
    * indexed consumer's output is bit-identical to its self-deriving
    * twin (law-tested) and the existing DuckDB oracles — which recompute
    * from raw documents — keep gating the indexed paths end to end.
    * Media defaults are the id-derived fixture tables, as everywhere in
    * this family; pass real payload tables in production.
    */
  def buildSignatureIndex(spark: SparkSession, corpus: DataFrame,
                          idCol: String, textCol: String, path: String,
                          shingleN: Int = 5,
                          imageMedia: Option[DataFrame] = None,
                          audioMedia: Option[DataFrame] = None): Unit = {
    val c = corpus.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("text"))
    Dedup.shingleSets(c, "doc_id", "text", shingleN)
      .write.mode("overwrite").parquet(s"$path/shingles")
    // corpus shingle frequencies (round 12): counts are SUM-mergeable,
    // so the index carries them as a first-class relation — the append
    // path's canonical rarest-first ordering then reads vocabulary-
    // sized state instead of re-aggregating the corpus-sized
    // (doc, shingle) relation per call. Derived from the just-written
    // parquet (a read-back, not a second tokenization).
    spark.read.schema(graft.engine.IndexSchemas.shingles)
      .parquet(s"$path/shingles")
      .groupBy(col("shingle")).agg(count(lit(1)).as("freq"))
      .write.mode("overwrite").parquet(s"$path/shingle_freq")
    c.select(col("doc_id"), md5(col("text")).as("h"))
      .write.mode("overwrite").parquet(s"$path/text_hashes")
    Media.imageHashes(spark,
        imageMedia.getOrElse(Media.imageHashTable(spark, c, "doc_id"))).toDF()
      .write.mode("overwrite").parquet(s"$path/image_hashes")
    Media.audioHashes(spark,
        audioMedia.getOrElse(Media.audioHashTable(spark, c, "doc_id"))).toDF()
      .write.mode("overwrite").parquet(s"$path/audio_hashes")
    spark.range(1).select(lit(shingleN).as("shingle_n"))
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** The index's recorded shingle width — consumers validate their
    * `shingleN` against it instead of silently mixing n-gram widths.
    */
  private[graft] def indexShingleN(spark: SparkSession, path: String): Int =
    spark.read.schema(graft.engine.IndexSchemas.sigMeta)
      .parquet(s"$path/meta").head().getInt(0)

  /** GLOBAL shingle frequencies for an indexed append: the persisted
    * vocabulary-sized counts (possibly multi-segment — freq deltas
    * append per commit) SUM-merged with the batch's own deltas —
    * exactly the counts a corpus-relation aggregation would produce
    * (counts of disjoint doc sets add), at vocabulary-relation cost.
    * None when the index predates the freq relation (round-12);
    * consumers then fall back to aggregating the shingle relation.
    */
  private[graft] def indexFreqFor(spark: SparkSession, indexPath: String,
                                  batchShingles: DataFrame): Option[DataFrame] = {
    val p = s"$indexPath/shingle_freq"
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(indexPath),
      spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(p))) None
    else {
      graft.engine.Layout.healStagedReplace(spark, p)
      Some(spark.read.schema(graft.engine.IndexSchemas.shingleFreq).parquet(p)
        .unionByName(batchShingles.groupBy(col("shingle"))
          .agg(count(lit(1)).as("freq")))
        .groupBy(col("shingle")).agg(sum(col("freq")).as("freq")))
    }
  }

  /** Append a committed batch's signatures INTO the index — the
    * maintenance half that keeps N appends batch-proportional: each
    * call derives signatures for the BATCH only and parquet-appends
    * them. Call after [[appendManifestIndexed]]'s verdicts are acted
    * on (typically with the kept docs).
    *
    * File hygiene is part of the contract (round-10 verdict: the
    * steady-append loop drifted 6.1→7.7 s over 10 commits purely from
    * small-file accretion — the one scale-with-time leak left):
    * batch-sized writes land as `filesPerCommit` files (a batch never
    * needs a shuffle-partition-count fan-out), and any signature
    * table whose file count exceeds `compactAbove` is rewritten by
    * [[graft.engine.Layout.compactFlat]] before returning — so the
    * per-commit cost is flat-with-batches plus an amortized
    * compaction whose cadence is every `compactAbove/filesPerCommit`
    * commits, and consumer scan cost is bounded regardless of commit
    * count. Pass `compactAbove = Int.MaxValue` to manage compaction
    * externally.
    *
    * Interaction with [[deleteFromSignatureIndex]]: an appended doc
    * whose id is currently TOMBSTONED stays masked until
    * [[purgeSignatureIndex]] folds the tombstones in — ids are
    * identities here, so re-using a deleted id for new content
    * requires a purge first (refusing silent resurrection is the
    * right default for a forget-request pipeline).
    */
  def appendSignatures(spark: SparkSession, batch: DataFrame,
                       idCol: String, textCol: String, path: String,
                       imageMedia: Option[DataFrame] = None,
                       audioMedia: Option[DataFrame] = None,
                       filesPerCommit: Int = 4,
                       compactAbove: Int = 48): Unit = {
    val shingleN = indexShingleN(spark, path)
    require(filesPerCommit >= 1, s"filesPerCommit must be >= 1")
    val b = batch.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("text"))
    Dedup.shingleSets(b, "doc_id", "text", shingleN)
      .repartition(filesPerCommit)
      .write.mode("append").parquet(s"$path/shingles")
    // freq DELTAS append as segments (batch-proportional work; readers
    // SUM across segments — counts merge exactly); the compaction
    // cadence below re-aggregates so the table stays vocabulary-sized
    Dedup.shingleSets(b, "doc_id", "text", shingleN)
      .groupBy(col("shingle")).agg(count(lit(1)).as("freq"))
      .repartition(filesPerCommit)
      .write.mode("append").parquet(s"$path/shingle_freq")
    b.select(col("doc_id"), md5(col("text")).as("h"))
      .repartition(filesPerCommit)
      .write.mode("append").parquet(s"$path/text_hashes")
    Media.imageHashes(spark,
        imageMedia.getOrElse(Media.imageHashTable(spark, b, "doc_id"))).toDF()
      .repartition(filesPerCommit)
      .write.mode("append").parquet(s"$path/image_hashes")
    Media.audioHashes(spark,
        audioMedia.getOrElse(Media.audioHashTable(spark, b, "doc_id"))).toDF()
      .repartition(filesPerCommit)
      .write.mode("append").parquet(s"$path/audio_hashes")
    Seq("shingles", "text_hashes", "image_hashes", "audio_hashes")
      .foreach { t =>
        val sub = s"$path/$t"
        if (graft.engine.Layout.flatFileCount(spark, sub) > compactAbove)
          graft.engine.Layout.compactFlat(spark, sub,
            targetFiles = filesPerCommit * 2)
      }
    // the freq table compacts by RE-AGGREGATION (segments carry
    // per-commit deltas; the sum-merge collapses them back to one row
    // per shingle), so its steady-state size is the vocabulary, not
    // vocabulary × commits — same crash-safe swap as compactFlat
    locally {
      val sub = s"$path/shingle_freq"
      if (graft.engine.Layout.flatFileCount(spark, sub) > compactAbove)
        // snapshot-read re-aggregation: delta segments appended while
        // the merge runs carry over as extra segments — the SUM-merge
        // read semantics absorb them exactly
        graft.engine.Layout.stagedReplaceSnapshot(spark, sub) { (stg, files) =>
          (if (files.isEmpty)
             spark.read.schema(graft.engine.IndexSchemas.shingleFreq)
               .parquet(sub)
           else spark.read.schema(graft.engine.IndexSchemas.shingleFreq)
             .parquet(files: _*))
            .groupBy(col("shingle")).agg(sum(col("freq")).as("freq"))
            .repartition(filesPerCommit * 2)
            .write.mode("overwrite").parquet(stg)
        }
    }
  }

  /** A signature table read through the index's tombstone filter:
    * deleted docs vanish from every consumer (edges, manifests,
    * appends) the moment [[deleteFromSignatureIndex]] returns, without
    * touching a data file — the anti-join side is bounded by the
    * delete verb's auto-purge threshold, so it broadcasts. Indexes
    * with no delete history skip the join entirely (one listing
    * probe).
    */
  private[graft] def liveSig(spark: SparkSession, path: String, table: String,
                             key: String): DataFrame = {
    // explicit schema (IndexSchemas): skips the per-read footer-
    // inference job on the layout's fixed tables
    val df = graft.engine.IndexSchemas.sigTables.get(table) match {
      case Some(s) => spark.read.schema(s).parquet(s"$path/$table")
      case None => spark.read.parquet(s"$path/$table")
    }
    graft.engine.Layout.tombstones(spark, path) match {
      case Some(ts) =>
        df.join(broadcast(ts.withColumnRenamed("id", key)), Seq(key), "left_anti")
      case None => df
    }
  }

  /** Right-to-be-forgotten deletes against a signature index — the
    * LSM shape, because the alternatives don't survive 100 TB: an
    * eager rewrite pays index-sized work per delete batch, and a
    * "filter at the application layer" leaks the docs through every
    * reader that forgets. Here a delete appends the ids to
    * `$path/tombstones` (delete-proportional), every index reader
    * anti-joins them out from that moment, and once the tombstone set
    * crosses `purgeAboveRows` the data files rewrite once via
    * [[purgeSignatureIndex]] — amortized index-sized work, bounded
    * tombstone state, readers correct at every point in between.
    *
    * `shingle_freq` stays STALE until the purge: the counts feed only
    * the AllPairs prefix ordering, whose completeness holds under any
    * consistent total order (Dedup.jaccardPairsFromShingles's
    * citation), and the verify step is exact — so verdicts off a
    * tombstoned index equal the rebuild-on-remaining form (law-tested)
    * while the purge restores exact counts.
    */
  def deleteFromSignatureIndex(spark: SparkSession, path: String,
                               ids: DataFrame, idColName: String,
                               purgeAboveRows: Long = 100000L): Unit = {
    ids.select(col(idColName).cast("long").as("id")).distinct()
      .coalesce(1).write.mode("append").parquet(s"$path/tombstones")
    // the FILE-count axis: many small forget batches accrete one file
    // each long before the row threshold purges — compact the
    // (tombstone-sized) table on the appendSignatures cadence so read
    // listings stay bounded; snapshot carry-over makes this safe under
    // a concurrent deleter
    if (graft.engine.Layout.flatFileCount(spark, s"$path/tombstones") > 48)
      graft.engine.Layout.compactFlat(spark, s"$path/tombstones",
        targetFiles = 1)
    if (spark.read.schema(graft.engine.IndexSchemas.tombstones)
          .parquet(s"$path/tombstones").count() > purgeAboveRows)
      purgeSignatureIndex(spark, path)
  }

  /** Fold the tombstone set into the data files: each signature table
    * rewrites WITHOUT the deleted docs (crash-safe
    * [[graft.engine.Layout.stagedReplace]] swaps), `shingle_freq`
    * re-derives exactly from the purged shingle relation, a persisted
    * edge tier (if built) drops every edge touching a deleted doc, and
    * the tombstone dir clears LAST — so a crash at any earlier point
    * leaves the tombstones in place and every read still correct (the
    * purge is idempotent; re-running completes it).
    */
  def purgeSignatureIndex(spark: SparkSession, path: String,
                          targetFiles: Int = 8): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path),
      spark.sparkContext.hadoopConfiguration)
    // entry-time tombstone snapshot (ADVICE r12): one materialized id
    // universe for every table rewrite, immune to a concurrent
    // deleter's dir churn; the cleanup deletes only the snapshot files
    // so a forget request appended mid-purge is never lost
    graft.engine.Layout.tombstoneSnapshot(spark, path).foreach {
      case (ts0, tsFiles) =>
      val ts = broadcast(ts0)
      // snapshot-read rewrites: each table rewrite reads exactly the
      // files listed at its swap's entry; files appended concurrently
      // carry over through the swap unfiltered (appends of tombstoned
      // ids are contract-forbidden pre-purge, so carried-over rows are
      // clean) — a forget-request purge racing a streaming appender
      // loses neither side
      def purge(table: String, keys: Seq[String]): Seq[String] = {
        val p = s"$path/$table"
        if (!fs.exists(new org.apache.hadoop.fs.Path(p))) Seq.empty
        else graft.engine.Layout.stagedReplaceSnapshot(spark, p) { (stg, files) =>
          val rd = graft.engine.IndexSchemas.sigTables.get(table)
            .fold(spark.read)(spark.read.schema)
          keys.foldLeft(
            if (files.isEmpty) rd.parquet(p)
            else rd.parquet(files: _*)) { (df, k) =>
            df.join(ts.withColumnRenamed("id", k), Seq(k), "left_anti")
          }.repartition(targetFiles)
            .write.mode("overwrite").parquet(stg)
        }
      }
      // the five table rewrites are INDEPENDENT (separate dirs, each
      // crash-safe on its own; reads stay correct under any completed
      // subset because the tombstones — cleared LAST, below — keep
      // masking), so overlap them on driver threads (guide §2.6: the
      // scheduler happily runs several jobs at once; actions were only
      // sequential because this code called them sequentially —
      // q240's purge stage measured 2.7 s / 23 near-serial jobs). The
      // freq recompute needs only the SHINGLE swap's staged files, so
      // it overlaps the other four rewrites too.
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(5)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      val fShingles = Future(purge("shingles", Seq("doc")))
      val fOthers = Seq(
        Future(purge("text_hashes", Seq("doc_id"))),
        Future(purge("image_hashes", Seq("media_id"))),
        Future(purge("audio_hashes", Seq("media_id"))),
        Future(purge("edges", Seq("src", "dst"))))
      val purgedShingles = Await.result(fShingles, Duration.Inf)
      // freq recompute reads the shingle purge's STAGED output only
      // (its exact post-delete content — never the live dir, where a
      // concurrent append may already have landed and would be counted
      // twice once its own freq deltas carry over below); stateless,
      // so a crash-retried purge recomputes identically. Residual race
      // (documented, bounded): an append whose shingle write precedes
      // the shingle swap while its delta write follows the freq swap's
      // listing gets that one batch's counts twice — frequencies feed
      // only the AllPairs prefix ORDERING, whose completeness holds
      // under any consistent total order, so verdicts are unaffected;
      // exact counts need a quiesced purge (or a rebuild)
      val freqP = s"$path/shingle_freq"
      try {
        if (fs.exists(new org.apache.hadoop.fs.Path(freqP)) &&
            purgedShingles.nonEmpty)
          graft.engine.Layout.stagedReplaceSnapshot(spark, freqP) { (stg, _) =>
            spark.read.schema(graft.engine.IndexSchemas.shingles)
              .parquet(purgedShingles: _*)
              .groupBy(col("shingle")).agg(count(lit(1)).as("freq"))
              .repartition(targetFiles)
              .write.mode("overwrite").parquet(stg)
          }
        // every rewrite must have COMPLETED before the tombstones clear
        // (the crash contract: clearing early would unmask rows a still-
        // running swap has not dropped yet)
        fOthers.foreach(Await.result(_, Duration.Inf))
      } finally pool.shutdown()
      graft.engine.Layout.clearTombstoneFiles(spark, path, tsFiles)
    }
  }

  /** The deletion-state report of a signature index — the operational
    * signal that drives purge cadence (the q186 guard-report
    * discipline applied to the delete family): one row per signature
    * table with its total, tombstone-masked, and live row counts.
    * `masked_fraction` is the garbage ratio every read pays the
    * anti-join for; a production pipeline purges when it (or the
    * absolute masked count) crosses policy. Aggregate-only: four
    * count jobs, nothing corpus-sized leaves the executors.
    */
  def deletionReport(spark: SparkSession, indexPath: String): DataFrame = {
    import spark.implicits._
    val ts = graft.engine.Layout.tombstones(spark, indexPath)
    // ONE tombstone broadcast + one aggregation over the tagged union
    // of all four key columns (r15): the per-table form built FOUR
    // separate broadcast exchanges of the same tombstone set — each a
    // driver round-trip at cycle cadence (q240's report stage measured
    // 1.67 s / 12 jobs). Per-table counts are identical: the left join
    // + count(_dead) runs per tagged row exactly as it did per table
    // (dup tombstone ids fan out identically), and the static name
    // frame re-attaches empty tables so they keep reporting a zero row
    // with the same 0/0 masked_fraction expression.
    val tables = Seq(("audio_hashes", "media_id"), ("image_hashes", "media_id"),
      ("shingles", "doc"), ("text_hashes", "doc_id"))
    val tagged = tables.map { case (table, key) =>
      spark.read.schema(graft.engine.IndexSchemas.sigTables(table))
        .parquet(s"$indexPath/$table")
        .select(lit(table).as("table_name"), col(key).as("_k"))
    }.reduce(_ unionByName _)
    val flagged = ts match {
      case Some(t) => tagged.join(
        broadcast(t.withColumnRenamed("id", "_k").withColumn("_dead", lit(1))),
        Seq("_k"), "left")
      case None => tagged.withColumn("_dead", lit(null).cast("int"))
    }
    val counts = flagged.groupBy(col("table_name")).agg(
      count(lit(1)).as("_t"), count(col("_dead")).as("_m"))
    tables.map(_._1).toDF("table_name")
      .join(counts, Seq("table_name"), "left")
      .select(col("table_name"),
        coalesce(col("_t"), lit(0L)).as("total_rows"),
        coalesce(col("_m"), lit(0L)).as("masked_rows"))
      .select(col("table_name"), col("total_rows"), col("masked_rows"),
        (col("total_rows") - col("masked_rows")).as("live_rows"),
        (col("masked_rows").cast("double") /
          col("total_rows").cast("double")).as("masked_fraction"))
      .orderBy(col("table_name"))
  }

  /** Integrity audit (fsck) of a signature index — the
    * [[graft.vector.Similarity.fsckIvfAdcIndex]] discipline for the
    * manifest tier: one row per invariant,
    * `(check, ok, n_violations, detail)`, aggregate-sized.
    * Checks: the four signature tables + meta exist; every shingle row
    * belongs to a doc in `text_hashes` (the id universe — an orphan
    * means a partial append or a half-completed purge); one md5 row
    * per doc; `shingle_freq` sums to the shingle row count when no
    * tombstones are pending (under tombstones freq is stale by
    * documented design — the check reports ok with the reason);
    * no in-flight swap leftovers (healable, named per table).
    */
  def fsckSignatureIndex(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path),
      spark.sparkContext.hadoopConfiguration)
    def ex(sub: String) =
      fs.exists(new org.apache.hadoop.fs.Path(s"$path/$sub"))
    val required = Seq("shingles", "text_hashes", "image_hashes",
      "audio_hashes", "meta")
    val missing = required.filter(!ex(_))
    val layoutRow = Seq(("layout_parts", missing.isEmpty,
      missing.size.toLong,
      if (missing.isEmpty) "all signature tables present"
      else s"missing: ${missing.mkString(",")}"))
    if (missing.nonEmpty)
      return layoutRow.toDF("check_name", "ok", "n_violations", "detail")
    val hashes = spark.read.schema(graft.engine.IndexSchemas.textHashes)
      .parquet(s"$path/text_hashes")
    // ONE doc-keyed pass + aggregate branches unioned into a single
    // collect (r15, the fsckBm25Index r14 consolidation applied to
    // this tier: the check-per-action form ran ~5 sequential driver
    // round-trips, scanning shingles twice — q240's fsck stage
    // measured 1.4 s / 15 jobs). Counts are BIT-IDENTICAL to the
    // originals (FsckSpec fault injection is the regression):
    //   orphans — shingle docs absent from text_hashes; the old
    //             distinct+left_anti counted a null shingle doc
    //             ALWAYS (null never joins), and the full-outer join
    //             reproduces that: null keys stay unmatched per side,
    //             so a shingle-side null row has _hrows null
    //   dup_docs — text_hashes docs with >1 md5 rows (null group
    //             behaves as in the old groupBy)
    //   shingle row total — Σ per-doc counts == the old raw count()
    val docChecks = spark.read.schema(graft.engine.IndexSchemas.shingles)
      .parquet(s"$path/shingles")
      .groupBy(col("doc").as("doc_id")).agg(count(lit(1)).as("_srows"))
      .join(hashes.groupBy(col("doc_id")).agg(count(lit(1)).as("_hrows")),
        Seq("doc_id"), "full_outer")
      .agg(
        coalesce(sum(when(col("_srows").isNotNull && col("_hrows").isNull,
          lit(1L)).otherwise(lit(0L))), lit(0L)).as("c1"),
        coalesce(sum(when(col("_hrows") > 1, lit(1L)).otherwise(lit(0L))),
          lit(0L)).as("c2"),
        coalesce(sum(col("_srows")), lit(0L)).as("c3"))
      .select(lit("doc").as("chk"), col("c1"), col("c2"), col("c3"))
    val branches = Seq(Some(docChecks),
      graft.engine.Layout.tombstones(spark, path).map(
        _.agg(count(lit(1)).as("c1"))
          .select(lit("ts").as("chk"), col("c1"), lit(0L).as("c2"),
            lit(0L).as("c3"))),
      (if (ex("shingle_freq"))
        Some(spark.read.schema(graft.engine.IndexSchemas.shingleFreq)
          .parquet(s"$path/shingle_freq")
          .agg(coalesce(sum(col("freq")), lit(0L)).as("c1"))
          .select(lit("freq").as("chk"), col("c1"), lit(0L).as("c2"),
            lit(0L).as("c3")))
      else None)).flatten
    val rows = branches.reduce(_ unionByName _).collect()
      .map(r => r.getString(0) -> r).toMap
    val orphanShingles = rows("doc").getLong(1)
    val dupDocs = rows("doc").getLong(2)
    val tombstoned = rows.get("ts").map(_.getLong(1)).getOrElse(0L)
    val (freqOk, freqN, freqDetail) =
      if (!ex("shingle_freq"))
        (true, 0L, "no freq relation (pre-round-12 index)")
      else if (tombstoned > 0)
        (true, 0L, s"stale by design under $tombstoned pending tombstones")
      else {
        val sumFreq = rows("freq").getLong(1)
        val nRows = rows("doc").getLong(3)
        (sumFreq == nRows, math.abs(sumFreq - nRows),
          s"freq segments sum to $sumFreq vs $nRows shingle rows")
      }
    val leftovers = (required ++ Seq("shingle_freq", "edges"))
      .flatMap(t => Seq(s"${t}_swap_staging", s"${t}_swap_old"))
      .filter(ex)
    (layoutRow ++ Seq(
      ("doc_universe", orphanShingles == 0L, orphanShingles,
        "every shingle doc exists in text_hashes"),
      ("docs_unique", dupDocs == 0L, dupDocs, "one md5 row per doc"),
      ("freq_consistent", freqOk, freqN, freqDetail),
      ("no_swap_leftovers", leftovers.isEmpty, leftovers.size.toLong,
        if (leftovers.isEmpty) "no in-flight staged swap"
        else s"run healStagedReplace: ${leftovers.mkString(",")}"),
      ("tombstones_pending", true, tombstoned,
        "pending forget requests (anti-joined on read; purge folds them)")))
      .toDF("check_name", "ok", "n_violations", "detail")
      .orderBy(col("check_name"))
  }

  /** ONE operational forget cycle — the round-12 deletion pieces
    * chained into the verb a production pipeline actually schedules
    * (round-12 verdict item #6): recover any interrupted predecessor,
    * record the forget requests, read the deletion report, purge when
    * the masked fraction crosses policy, and AUDIT the result. Returns
    * a one-row operational report:
    * `(n_requested, masked_fraction, purged, pending_tombstones,
    * fsck_ok, failing_checks)` — `masked_fraction` is the pre-purge
    * worst per-table garbage ratio ([[deletionReport]]), the number
    * the purge policy fires on.
    *
    * Crash contract (ForgetCycleSpec kills the cycle between every
    * stage): each stage boundary leaves the index readable and correct
    * — stage 1's tombstones mask immediately, an interrupted stage-3
    * purge self-heals ([[graft.engine.Layout.stagedReplaceSnapshot]]'s
    * protocol), and spent-but-uncleared tombstones mask absent ids (a
    * no-op). The NEXT cycle's entry recovery (writer-role heal +
    * re-evaluating policy over the still-pending tombstones) completes
    * whatever was interrupted, so fsck reads green at every cycle
    * boundary without operator intervention. The per-batch streaming
    * face is [[graft.streaming.EventStream.forgetAndVerifyStream]].
    */
  def forgetAndVerify(spark: SparkSession, indexPath: String,
                      ids: DataFrame, idColName: String,
                      purgeAboveMaskedFraction: Double = 0.25,
                      purgeAboveRows: Long = 100000L): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(indexPath),
      spark.sparkContext.hadoopConfiguration)
    // stage 0 — recovery: the cycle holds the index's single-writer
    // role, so a marker-less staging remnant here is a dead crash, not
    // a concurrent writer — finish or discard every table's swap
    Seq("shingles", "text_hashes", "image_hashes", "audio_hashes",
        "edges", "shingle_freq", "tombstones").foreach { t =>
      val p = s"$indexPath/$t"
      if (fs.exists(new org.apache.hadoop.fs.Path(p)) ||
          fs.exists(new org.apache.hadoop.fs.Path(p + "_swap_staging")) ||
          fs.exists(new org.apache.hadoop.fs.Path(p + "_swap_old")))
        graft.engine.Layout.healStagedReplace(spark, p,
          discardMarkerless = true)
    }
    // stage 1 — record: delete-proportional tombstone append (this
    // verb's own ROW-COUNT cadence may fire a purge on its own)
    val nRequested = ids.select(col(idColName)).distinct().count()
    if (nRequested > 0)
      deleteFromSignatureIndex(spark, indexPath, ids, idColName,
        purgeAboveRows)
    // stage 2 — report → policy: the garbage ratio every read pays
    val worst = deletionReport(spark, indexPath)
      .agg(coalesce(max(col("masked_fraction")), lit(0.0)))
      .head().getDouble(0)
    // stage 3 — purge when policy says the anti-join overlay costs
    // more than one amortized rewrite
    val purged = worst > purgeAboveMaskedFraction
    if (purged) purgeSignatureIndex(spark, indexPath)
    // stage 4 — audit: the fsck verdicts are the cycle's exit status
    val fsck = fsckSignatureIndex(spark, indexPath)
    val failing = fsck.filter(!col("ok")).count()
    val pending = graft.engine.Layout.tombstones(spark, indexPath)
      .map(_.count()).getOrElse(0L)
    spark.range(1).select(
      lit(nRequested).as("n_requested"),
      lit(worst).as("masked_fraction"),
      lit(purged).as("purged"),
      lit(pending).as("pending_tombstones"),
      lit(failing == 0L).as("fsck_ok"),
      lit(failing).as("failing_checks"))
  }

  /** The unified forget verb across ALL index tiers a corpus may have
    * standing — signature ([[forgetAndVerify]]), ANN
    * ([[graft.vector.Similarity.forgetAndVerifyAnn]]), and lexical
    * BM25 ([[graft.text.TextStats.forgetAndVerifyBm25]]) — one forget
    * request, one audited report row PER TIER:
    * `(tier, n_requested, masked_fraction, purged, pending_tombstones,
    * fsck_ok, failing_checks)`. Until round 14 the per-tier verbs
    * existed separately, and a compliance run that forgot a document
    * from the signature and ANN tiers silently left its tokens
    * probe-visible in any BM25 index built over the same corpus (the
    * r13 verdict's first gap) — this verb makes "the corpus forgot
    * doc X" one call whose report names every index that still holds
    * state. Tiers are opt-in by path: pass the indexes that exist;
    * at least one is required (an empty call would report a forget
    * that touched nothing).
    */
  def forgetAndVerifyAll(spark: SparkSession, ids: DataFrame,
                         idColName: String,
                         signatureIndexPath: Option[String] = None,
                         annIndexPath: Option[String] = None,
                         bm25IndexPath: Option[String] = None,
                         purgeAboveMaskedFraction: Double = 0.25,
                         purgeAboveRows: Long = 100000L): DataFrame = {
    require(signatureIndexPath.orElse(annIndexPath).orElse(bm25IndexPath)
        .nonEmpty,
      "forgetAndVerifyAll: at least one index tier path is required — " +
        "a forget cycle over zero indexes audits nothing")
    // the tiers are INDEPENDENT cycles over disjoint index roots (each
    // verb's report is a function of its own index + the shared request
    // set alone), so run them on driver threads and let the scheduler
    // overlap their jobs (guide §2.6; r15 — serially q249 was the #1
    // bench row at 11 s = sig 5.2 s + ann 3.0 s + bm25 7.7 s strictly
    // back-to-back while most of each cycle's jobs leave the cluster
    // near-idle). Every per-tier verb's own internal cross-thread state
    // is already safe: Caches entries are keyed by registering thread,
    // Layout swap locks are per-path, and each tier writes only under
    // its own root. The report rows are deterministic per tier, so the
    // unioned output is unchanged.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val futures =
      signatureIndexPath.map(p => Future(
        forgetAndVerify(spark, p, ids, idColName,
            purgeAboveMaskedFraction, purgeAboveRows)
          .withColumn("tier", lit("signature")))).toSeq ++
      annIndexPath.map(p => Future(
        graft.vector.Similarity.forgetAndVerifyAnn(spark, p, ids, idColName,
            purgeAboveMaskedFraction, purgeAboveRows)
          .withColumn("tier", lit("ann")))).toSeq ++
      bm25IndexPath.map(p => Future(
        graft.text.TextStats.forgetAndVerifyBm25(spark, p, ids, idColName,
            purgeAboveMaskedFraction, purgeAboveRows)
          .withColumn("tier", lit("bm25")))).toSeq
    val reports =
      try futures.map(Await.result(_, Duration.Inf))
      finally pool.shutdown()
    reports.reduce(_ unionByName _)
      .select(col("tier"), col("n_requested"), col("masked_fraction"),
        col("purged"), col("pending_tombstones"), col("fsck_ok"),
        col("failing_checks"))
      .orderBy(col("tier"))
  }

  /** [[appendManifest]] against a persisted signature index: the
    * standing corpus contributes its PRE-DERIVED shingle/md5/perceptual
    * signatures from [[buildSignatureIndex]]'s layout, so an append
    * tokenizes, hashes, and decodes only the BATCH — the re-derivation
    * the round-9 bench measured as the family's dominant cost (q196
    * precedent: probe 3.5× cheaper than inline). Verdicts are identical
    * to `appendManifest(corpus, batch)` whenever the index was built
    * from that corpus with the same parameters (law-tested; shingle
    * width validated against the index meta). `imageMedia`/`audioMedia`
    * here are the BATCH's payload tables (corpus media signatures live
    * in the index); defaults are the usual id-derived fixtures. Same
    * self-cleaning cache contract as [[appendManifest]].
    */
  def appendManifestIndexed(spark: SparkSession, indexPath: String,
                            batch: DataFrame, idCol: String, textCol: String,
                            shingleN: Int = 5, threshold: Double = 0.5,
                            maxDist: Int = 3,
                            maxChunkBucket: Long = graft.ops.GuardBounds.MaxChunkBucket,
                            hotShingleCap: Int = graft.ops.GuardBounds.HotShingleCap,
                            imageMedia: Option[DataFrame] = None,
                            audioMedia: Option[DataFrame] = None): DataFrame =
   graft.engine.Caches.scopedMaterialized("appendManifestIndexed.result") {
    val storedN = indexShingleN(spark, indexPath)
    require(storedN == shingleN,
      s"appendManifestIndexed: index at $indexPath was built with " +
        s"shingleN=$storedN, caller asked for $shingleN")
    val b = batch.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("text"))
    val newIds = b.select("doc_id")
    val hCorpus = liveSig(spark, indexPath, "text_hashes", "doc_id")
    val hNew = b.select(col("doc_id"), md5(col("text")).as("h"))
    // The three modality edge families are INDEPENDENT subtrees (each a
    // function of its own signature relation + the shared batch), and
    // each family is consumed TWICE downstream — once in the union the
    // component walk canonicalizes, once by its modality flag. Derive
    // each family ONCE (eager batch-sized checkpoint) on overlapped
    // driver threads (guide §2.6; r15 — serially the edge chains were
    // q162's dominant stages: text 5.3 s, image 3.7 s, audio 1.1 s
    // isolated at sf0.1, each leaving the cluster near-idle between its
    // small jobs). Thread safety is the forgetAndVerifyAll pattern:
    // Caches entries are thread-keyed, so each thread mark/releases its
    // OWN internals after its checkpoint materializes; the checkpoint
    // releases are re-registered on the calling thread so the enclosing
    // scopedMaterialized frees them once the result is materialized.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    def materializedEdges(build: => DataFrame) = Future {
      val m = graft.engine.Caches.mark()
      val (cp, release) = org.apache.spark.sql.GraftCheckpoint.withHandle(
        build, eager = true)
      graft.engine.Caches.releaseSince(m)
      (cp, release)
    }
    val textF = materializedEdges {
      val bShingles = Dedup.shingleSets(b, "doc_id", "text", shingleN)
      val sAll = graft.engine.Caches.persisted(
        "appendManifestIndexed.shingles",
        liveSig(spark, indexPath, "shingles", "doc").unionByName(bShingles))
      Clusters.appendTextEdgesFromSignatures(sAll,
        hCorpus.unionByName(hNew), hNew, threshold, hotShingleCap,
        indexFreqFor(spark, indexPath, bShingles),
        restrict = graft.engine.Layout.flatDirBytes(spark,
          s"$indexPath/shingles") >
          graft.ops.GuardBounds.PrefixRestrictAboveBytes)
    }
    val imageF = materializedEdges {
      val bImg = Media.imageHashes(spark,
        imageMedia.getOrElse(Media.imageHashTable(spark, b, "doc_id"))).toDF()
      Media.hammingBandedPairsIncremental(
          liveSig(spark, indexPath, "image_hashes", "media_id")
            .unionByName(bImg),
          newIds, maxDist, maxChunkBucket, "appendManifestIndexed.image")
        .select(col("id_a").as("src"), col("id_b").as("dst"))
    }
    val audioF = materializedEdges {
      val bAud = Media.audioHashes(spark,
        audioMedia.getOrElse(Media.audioHashTable(spark, b, "doc_id"))).toDF()
      Media.hammingBandedPairsIncremental(
          liveSig(spark, indexPath, "audio_hashes", "media_id")
            .unionByName(bAud),
          newIds, maxDist, maxChunkBucket, "appendManifestIndexed.audio")
        .select(col("id_a").as("src"), col("id_b").as("dst"))
    }
    val ((textEdges, tRel), (imageEdges, iRel), (audioEdges, aRel)) =
      try (Await.result(textF, Duration.Inf),
        Await.result(imageF, Duration.Inf),
        Await.result(audioF, Duration.Inf))
      finally pool.shutdown()
    graft.engine.Caches.trackRelease("appendManifestIndexed.textEdges")(tRel)
    graft.engine.Caches.trackRelease("appendManifestIndexed.imageEdges")(iRel)
    graft.engine.Caches.trackRelease("appendManifestIndexed.audioEdges")(aRel)
    withModalityFlags(
        Clusters.appendVerdicts(hCorpus.select("doc_id"), newIds,
          textEdges.union(imageEdges).union(audioEdges)),
        textEdges, imageEdges, audioEdges)
      .select(col("doc_id"), col("dup_of"), col("keep"),
        col("text_dup"), col("image_dup"), col("audio_dup"))
   }

  /** [[unifiedManifest]] over a persisted signature index covering the
    * WHOLE corpus: every edge family starts from the indexed signature
    * relations (shingle prefix self-join, md5 stars, banded chunk
    * joins), so the full-manifest rebuild pays the component walk and
    * the pair joins but never re-tokenizes or re-decodes the corpus.
    * Output identical to `unifiedManifest` over the indexed corpus
    * (law-tested); the doc universe is the index's own id set.
    */
  def unifiedManifestFromIndex(spark: SparkSession, indexPath: String,
                               pcts: Seq[(String, Int)],
                               threshold: Double = 0.5, maxDist: Int = 3,
                               maxChunkBucket: Long = graft.ops.GuardBounds.MaxChunkBucket,
                               hotShingleCap: Int = graft.ops.GuardBounds.HotShingleCap): DataFrame =
   graft.engine.Caches.scopedMaterialized("unifiedManifestFromIndex.result") {
    val ids = liveSig(spark, indexPath, "text_hashes", "doc_id")
      .select(col("doc_id"))
    val (textEdges, imageEdges, audioEdges) = indexEdges(spark, indexPath,
      threshold, maxDist, maxChunkBucket, hotShingleCap)
    val comp = Clusters.connectedComponents(
      textEdges.union(imageEdges).union(audioEdges), "src", "dst")
    val assigned = ids
      .join(comp.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("cluster_id"))
    withModalityFlags(Curation.splitAssign(assigned, "cluster_id", pcts),
        textEdges, imageEdges, audioEdges)
      .select(col("doc_id"), col("cluster_id"),
        (col("doc_id") === col("cluster_id")).as("keep"), col("split"),
        col("text_dup"), col("image_dup"), col("audio_dup"))
   }

  /** The three modality edge families derived FROM the signature index
    * — one definition shared by [[unifiedManifestFromIndex]] (consumes
    * them inline) and [[buildEdgeIndex]] (persists them), so the two
    * paths cannot diverge on what counts as an edge.
    */
  private def indexEdges(spark: SparkSession, indexPath: String,
                         threshold: Double, maxDist: Int,
                         maxChunkBucket: Long,
                         hotShingleCap: Int): (DataFrame, DataFrame, DataFrame) = {
    val byHash = liveSig(spark, indexPath, "text_hashes", "doc_id")
    val sAll = graft.engine.Caches.persisted("indexEdges.shingles",
      liveSig(spark, indexPath, "shingles", "doc"))
    val jac = Dedup.jaccardPairsFromShingles(sAll, threshold, hotShingleCap)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val exact = byHash.select(col("doc_id").as("id"), col("h"))
      .withColumn("src", min(col("id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("h")))
      .filter(col("id") =!= col("src"))
      .select(col("src"), col("id").as("dst"))
    val imageEdges = Media.hammingBandedPairs(
        liveSig(spark, indexPath, "image_hashes", "media_id"), maxDist,
        maxChunkBucket, "indexEdges.image")
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val audioEdges = Media.hammingBandedPairs(
        liveSig(spark, indexPath, "audio_hashes", "media_id"), maxDist,
        maxChunkBucket, "indexEdges.audio")
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    (jac.union(exact), imageEdges, audioEdges)
  }

  /** Persist the modality-tagged EDGE relation on top of a signature
    * index — the second build tier: signatures answer "what does each
    * doc look like", edges answer "who near-duplicates whom", and both
    * are deterministic corpus functions a production pipeline
    * materializes once per corpus version. After this,
    * [[manifestFromEdgeIndex]] pays only the component walk and the
    * manifest assembly per call. Edge rows: `(src, dst, modality)`.
    */
  def buildEdgeIndex(spark: SparkSession, indexPath: String,
                     threshold: Double = 0.5, maxDist: Int = 3,
                     maxChunkBucket: Long = graft.ops.GuardBounds.MaxChunkBucket,
                     hotShingleCap: Int = graft.ops.GuardBounds.HotShingleCap): Unit = {
    val m = graft.engine.Caches.mark()
    try {
      val (t, i, a) = indexEdges(spark, indexPath, threshold, maxDist,
        maxChunkBucket, hotShingleCap)
      t.withColumn("modality", lit("text"))
        .unionByName(i.withColumn("modality", lit("image")))
        .unionByName(a.withColumn("modality", lit("audio")))
        .write.mode("overwrite").parquet(s"$indexPath/edges")
    } finally graft.engine.Caches.releaseSince(m)
  }

  /** The manifest off persisted edges ([[buildEdgeIndex]]): read the
    * modality-tagged edge relation, walk components, assign splits,
    * derive flags — no signature derivation, no pair joins. Identical
    * output to [[unifiedManifest]] over the indexed corpus
    * (law-tested): flags come from the SAME edge rows via the shared
    * [[withModalityFlags]], and the component walk is the same
    * dispatch. The per-call cost a 100 TB pipeline actually pays when
    * it re-cuts splits or re-materializes the keep list from a
    * committed corpus version.
    */
  def manifestFromEdgeIndex(spark: SparkSession, indexPath: String,
                            pcts: Seq[(String, Int)]): DataFrame =
   graft.engine.Caches.scopedMaterialized("manifestFromEdgeIndex.result") {
    val ids = liveSig(spark, indexPath, "text_hashes", "doc_id")
      .select(col("doc_id"))
    val edges = graft.engine.Caches.persisted("manifestFromEdgeIndex.edges",
      graft.engine.Layout.tombstones(spark, indexPath) match {
        case Some(ts) =>
          spark.read.schema(graft.engine.IndexSchemas.edges)
            .parquet(s"$indexPath/edges")
            .join(broadcast(ts.withColumnRenamed("id", "src")),
              Seq("src"), "left_anti")
            .join(broadcast(ts.withColumnRenamed("id", "dst")),
              Seq("dst"), "left_anti")
        case None => spark.read.schema(graft.engine.IndexSchemas.edges)
          .parquet(s"$indexPath/edges")
      })
    def family(mod: String): DataFrame =
      edges.filter(col("modality") === mod).select(col("src"), col("dst"))
    val (textEdges, imageEdges, audioEdges) =
      (family("text"), family("image"), family("audio"))
    val comp = Clusters.connectedComponents(
      edges.select(col("src"), col("dst")), "src", "dst")
    val assigned = ids
      .join(comp.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("cluster_id"))
    withModalityFlags(Curation.splitAssign(assigned, "cluster_id", pcts),
        textEdges, imageEdges, audioEdges)
      .select(col("doc_id"), col("cluster_id"),
        (col("doc_id") === col("cluster_id")).as("keep"), col("split"),
        col("text_dup"), col("image_dup"), col("audio_dup"))
   }
}
