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
                      maxChunkBucket: Long = 100000L,
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
                     maxDist: Int = 3, maxChunkBucket: Long = 100000L,
                     hotShingleCap: Int = 100000,
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
}
