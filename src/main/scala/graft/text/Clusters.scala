package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate CLUSTERING for corpus curation: pairwise near-dup
  * edges (exact-hash groups ∪ Jaccard pairs) are only half the dedup
  * story — keeping one doc per *transitive* cluster needs connected
  * components over the pair graph (A~B, B~C must collapse to one
  * cluster even when A!~C directly).
  *
  * Scale posture: components come from the alternating large-star /
  * small-star algorithm (Kiveris et al., "Connected Components in
  * MapReduce and Beyond", SoCC'14) — O(log n) rounds, each round two
  * hash aggregations + joins, never materializing a node's adjacency
  * list (neighbor minima via groupBy.min, not collect_list), so a
  * star-shaped 10⁸-node dup cluster costs the same as a chain. The
  * driver loop only compares two scalars per round (count + an
  * order-independent hash) — no edge data ever reaches the driver.
  */
object Clusters {

  /** Connected components of an undirected edge list. Returns
    * `(node, component)` for every node incident to at least one edge,
    * where `component` is the minimum node id in that component.
    * Callers handle isolated nodes (left-join + coalesce to self).
    *
    * Each round ends in a lazy `localCheckpoint`: an iterative dataflow
    * re-referencing its previous round several times grows the LOGICAL
    * plan geometrically, and Catalyst re-analysis — not the tiny
    * shuffles — becomes the bottleneck within ~4 rounds. Checkpointing
    * resets the plan to a materialized leaf each round (22 s →
    * sub-second on a 256-edge graph); lazy so the round's fingerprint
    * aggregation is the single action that materializes it, instead of
    * a separate eager job per checkpoint. Old round blocks are freed
    * DETERMINISTICALLY in-loop the moment the next round materializes
    * (round-8 verdict: waiting for the ContextCleaner leaked storage
    * across an in-session bench); the FINAL round's blocks back the
    * returned frame and are registered with [[graft.engine.Caches]] for
    * the caller to release after its action. On a real cluster prefer
    * `spark.sparkContext.setCheckpointDir` + reliable `checkpoint` if
    * executor loss during the loop must be survivable.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 30,
                          maxLocalEdges: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.GraftCheckpoint
    // canonical high→low orientation, self-loops and duplicates dropped
    var (e, releaseE) = GraftCheckpoint.withHandle(edges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct(), eager = false)

    // Hybrid dispatch — the broadcast-join-threshold philosophy applied
    // to iterative CC: each distributed round costs a fixed ~6 shuffle
    // stages regardless of data (measured 3.6 s for a 256-edge graph at
    // 32 partitions — ALL scheduling overhead), while a dup-pair edge
    // set that fits one task solves in milliseconds of union-find. Below
    // `maxLocalEdges` (≤ ~16 MB collected; the bloom/centroid
    // bounded-scalar budget) solve on the driver; above it, the O(log n)
    // star rounds are the only thing that works, so they remain the path.
    // Both paths emit identical labels (min-id representative; spec'd).
    val nEdges = e.count()
    if (nEdges <= maxLocalEdges) {
      val spark = edges.sparkSession
      import spark.implicits._
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x // path compression
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      e.select(col("u"), col("v")).as[(Long, Long)].collect().foreach {
        case (u, v) =>
          val (ru, rv) = (find(u), find(v))
          if (ru != rv) { // min root wins ⇒ component = min node id
            if (ru < rv) parent(rv) = ru else parent(ru) = rv
            parent.getOrElseUpdate(math.min(ru, rv), math.min(ru, rv))
          }
      }
      val labels = parent.keys.toSeq.map(n => (n, find(n)))
      releaseE() // edges live on the driver now; free the checkpoint
      return spark.createDataset(labels).toDF("node", "component")
    }

    // convergence fingerprint: cardinality + order-independent edge hash,
    // one tiny action per round (two longs to the driver)
    def fp(d: DataFrame): (Long, Long) = {
      // pmod keeps each term < 2^30 so the ANSI-mode sum can't overflow
      val r = d.agg(count(lit(1)),
        sum(pmod(xxhash64(col("u"), col("v")), lit(1000000007L)))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    var prev = fp(e)
    var iter = 0
    var converged = prev._1 == 0L
    while (!converged && iter < maxIter) {
      // large-star: every neighbor LARGER than x re-links to x's minimum
      // neighbor. min over the symmetric neighbor list via groupBy — no
      // adjacency materialization, skew-safe under AQE.
      val sym = e.select(col("u").as("x"), col("v").as("y"))
        .union(e.select(col("v").as("x"), col("u").as("y")))
      val mins = sym.groupBy("x").agg(min(col("y")).as("mn"))
        .select(col("x"), least(col("x"), col("mn")).as("m"))
      // referenced twice below — checkpoint to compute once
      val (large, releaseLarge) = GraftCheckpoint.withHandle(
        sym.join(mins, "x")
          .filter(col("y") > col("x"))
          .select(col("y").as("u"), col("m").as("v")) // y > x >= m ⇒ canonical
          .filter(col("u") =!= col("v"))
          .distinct(), eager = false)
      // small-star: on the high→low orientation, x's smaller neighbors
      // (and x itself) all re-link to the minimum of that neighborhood
      val minsS = large.groupBy("u").agg(min(col("v")).as("m"))
      val (next, releaseNext) = GraftCheckpoint.withHandle(
        large.join(minsS, "u")
          .select(col("v").as("u"), col("m").as("v")) // v >= m within group
          .union(minsS.select(col("u"), col("m").as("v")))
          .filter(col("u") =!= col("v"))
          .distinct(), eager = false)
      val cur = fp(next) // two longs to the driver per round
      // fp() materialized `next`, so the previous round's edge blocks
      // and this round's large-star intermediate are dead — free them
      // NOW instead of waiting for the ContextCleaner to GC them (the
      // round-8 in-session storage leak)
      releaseE(); releaseLarge()
      releaseE = releaseNext
      e = next
      converged = cur == prev
      prev = cur
      iter += 1
    }
    // a non-star edge set would yield multiple labels per node and
    // silently fan out the caller's join — fail loudly instead.
    // (rounds needed ~ log2(diameter); 30 covers any realistic graph)
    require(converged,
      s"connectedComponents did not converge within $maxIter rounds")
    // the final star edge set backs the returned frame — its blocks are
    // released by the CALLER via Caches.releaseAll() after the action
    // (or by a scopedMaterialized wrapper once the result is eager)
    graft.engine.Caches.trackRelease("connectedComponents.edges")(releaseE)
    e.select(col("u").as("node"), col("v").as("component"))
      // component roots only appear on the right side of star edges —
      // emit their own self row so every edge-incident node is labeled
      .union(e.select(col("v").as("node"), col("v").as("component")).distinct())
  }

  /** Cluster assignment for a document corpus: edges are exact-duplicate
    * pairs (same md5 of text) plus n-gram Jaccard near-dup pairs; the
    * cluster id is the minimum doc id of the component and
    * `is_canonical` marks the single doc per cluster a dedup pass keeps.
    * Every input doc appears exactly once (singletons are their own
    * cluster). Reference analog: the reference dedups exact rows only
    * (src/processing/bronze_to_silver_crypto.py:60-66); transitive
    * near-dup clustering is the corpus-curation generalization.
    */
  def dupClusters(df: DataFrame, idCol: String, textCol: String,
                  shingleN: Int = 5, threshold: Double = 0.5): DataFrame = {
    val jac = Dedup.jaccardPairs(df, idCol, textCol, shingleN, threshold)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    // exact-dup groups contribute a star: min id ← every other member
    val byHash = df.select(col(idCol).cast("long").as("id"), md5(col(textCol)).as("h"))
    val exact = byHash
      .withColumn("src", min(col("id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("h")))
      .filter(col("id") =!= col("src"))
      .select(col("src"), col("id").as("dst"))
    val comp = connectedComponents(jac.union(exact), "src", "dst")
    df.select(col(idCol).cast("long").as("doc_id"))
      .join(comp.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("cluster_id"))
      .withColumn("is_canonical", col("doc_id") === col("cluster_id"))
  }

  /** Leakage-safe split assignment — the operator that PREVENTS what
    * [[graft.text.Dedup]]'s split-leakage audit (q110) measures:
    * near-dup neighbors straddling the train/val/test boundary. Splits
    * hash the CLUSTER id (the [[dupClusters]] component), not the doc
    * id, so every member of a transitive dup group lands in the SAME
    * split by construction — zero cross-split near-dup pairs, provably,
    * not statistically. Singleton docs carry their own id as cluster id
    * and the assignment degrades to the per-doc q101 hash. Uses the
    * identical multiplicative-hash arithmetic as
    * [[Curation.splitAssign]], so proportions are statistically exact
    * over CLUSTERS — the honest unit: a split sized in docs while
    * keeping clusters whole is impossible, because a cluster is atomic
    * here by definition.
    */
  def clusterSafeSplits(df: DataFrame, idCol: String, textCol: String,
                        pcts: Seq[(String, Int)], shingleN: Int = 5,
                        threshold: Double = 0.5): DataFrame =
    Curation.splitAssign(
        dupClusters(df, idCol, textCol, shingleN, threshold), "cluster_id",
        pcts)
      .select(col("doc_id"), col("cluster_id"), col("split"))

  /** Incremental APPEND dedup: admit a new batch of documents against
    * an existing corpus without recomputing the corpus pair graph. One
    * verdict row per batch doc — `(doc_id, dup_of, keep)` where
    * `dup_of` is the smallest corpus doc its duplicate component
    * touches (NULL if the component is batch-only) and `keep` marks
    * batch docs that duplicate nothing in the corpus and are the
    * min-id representative of their batch-internal component (the
    * [[dupClusters]] canonical convention) — so `keep` rows are
    * exactly what an append commits and the rest is the drop list
    * with its provenance.
    *
    * Edges are [[Dedup.incrementalJaccardPairs]] (batch×corpus ∪
    * batch×batch, never corpus×corpus) plus exact-hash pairs with a
    * new side; components come from the shared hybrid
    * [[connectedComponents]] dispatch over this batch-proportional
    * edge set. Transitivity ACROSS the corpus works through shared
    * corpus neighbors (batch₁–corpusX–batch₂ collapses to one
    * component); chains through corpus-corpus near-dup pairs are
    * invisible by design — the operator's precondition is an already
    * deduped corpus (the state every append maintains), where such
    * chains don't exist. Cache contract: SELF-CLEANING (eager
    * batch-sized result, internals released before returning — see
    * [[graft.engine.Caches.scopedMaterialized]]).
    */
  def appendDedup(corpus: DataFrame, batch: DataFrame, idCol: String,
                  textCol: String, shingleN: Int = 5,
                  threshold: Double = 0.5,
                  hotShingleCap: Int = 100000): DataFrame =
    // the RECURRING operator (once per ingest batch): self-cleaning —
    // the batch-sized verdict frame is materialized while the internal
    // shingle cache is hot, then every cache this call created is
    // released, so N consecutive appends in one session hold
    // batch-sized state only (AppendSteadySpec)
    graft.engine.Caches.scopedMaterialized("appendDedup.result") {
      val c = corpus.select(col(idCol).cast("long").as("doc_id"),
        col(textCol).as("text"))
      val b = batch.select(col(idCol).cast("long").as("doc_id"),
        col(textCol).as("text"))
      appendVerdicts(c.select("doc_id"), b.select("doc_id"),
        appendTextEdges(c.union(b), b, shingleN, threshold, hotShingleCap))
    }

  /** The text edge family of an APPEND: incremental Jaccard pairs plus
    * exact-hash pairs with a new side (batch hashes broadcast against
    * the full hash relation — the md5 twin of the shingle join). Both
    * frames carry normalized `(doc_id, text)`. Shared by
    * [[appendDedup]] and the multimodal
    * [[graft.multimodal.Curate.appendManifest]].
    */
  private[graft] def appendTextEdges(all: DataFrame, batch: DataFrame,
                                     shingleN: Int, threshold: Double,
                                     hotShingleCap: Int): DataFrame = {
    val s = graft.engine.Caches.persisted("appendTextEdges.shingles",
      Dedup.shingleSets(all, "doc_id", "text", shingleN))
    appendTextEdgesFromSignatures(s,
      all.select(col("doc_id"), md5(col("text")).as("h")),
      batch.select(col("doc_id"), md5(col("text")).as("h")),
      threshold, hotShingleCap)
  }

  /** [[appendTextEdges]] over PRECOMPUTED signatures — the indexed
    * append path ([[graft.multimodal.Curate.buildSignatureIndex]]):
    * `sAll` is the full `(doc, shingle)` relation (corpus index ∪ batch
    * shingles; caller materializes), `hAll`/`hNew` the full and
    * batch-only `(doc_id, h)` md5 relations. Identical edges to the
    * self-deriving form — the split moves WHERE signatures come from,
    * never what qualifies as an edge.
    */
  private[graft] def appendTextEdgesFromSignatures(sAll: DataFrame,
                                                   hAll: DataFrame,
                                                   hNew: DataFrame,
                                                   threshold: Double,
                                                   hotShingleCap: Int,
                                                   freqOpt: Option[DataFrame] = None,
                                                   restrict: Boolean = false): DataFrame = {
    val jac = Dedup.incrementalJaccardPairsFromShingles(sAll,
        hNew.select(col("doc_id").as("doc")), threshold, hotShingleCap,
        freqOpt, restrict)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val exact = hAll.join(
        broadcast(hNew.select(col("doc_id").as("_nid"), col("h"))), "h")
      .filter(col("doc_id") =!= col("_nid"))
      .select(least(col("doc_id"), col("_nid")).as("src"),
        greatest(col("doc_id"), col("_nid")).as("dst")).distinct()
    jac.union(exact)
  }

  /** [[appendDedup]] against a persisted signature index (the
    * build/probe split applied to the append loop): the standing
    * corpus is represented by its
    * [[graft.multimodal.Curate.buildSignatureIndex]] layout — shingle
    * and md5 relations read from parquet — so an append re-tokenizes
    * only the BATCH. Verdicts are identical to
    * `appendDedup(corpus, batch)` whenever the index was built from
    * that corpus with the same `shingleN` (validated against the
    * index's meta). Same self-cleaning cache contract.
    */
  def appendDedupIndexed(spark: org.apache.spark.sql.SparkSession,
                         indexPath: String, batch: DataFrame,
                         idCol: String, textCol: String,
                         shingleN: Int = 5, threshold: Double = 0.5,
                         hotShingleCap: Int = graft.ops.GuardBounds.HotShingleCap): DataFrame =
    graft.engine.Caches.scopedMaterialized("appendDedupIndexed.result") {
      val storedN = graft.multimodal.Curate.indexShingleN(spark, indexPath)
      require(storedN == shingleN,
        s"appendDedupIndexed: index at $indexPath was built with " +
          s"shingleN=$storedN, caller asked for $shingleN — rebuild the " +
          "index or match the parameter")
      val b = batch.select(col(idCol).cast("long").as("doc_id"),
        col(textCol).as("text"))
      val bShingles = Dedup.shingleSets(b, "doc_id", "text", shingleN)
      // tombstone-filtered reads (round-12 deletion propagation):
      // forget-request deletes vanish from the append's standing
      // corpus immediately, before any purge rewrite
      val sAll = graft.engine.Caches.persisted("appendDedupIndexed.shingles",
        graft.multimodal.Curate.liveSig(spark, indexPath, "shingles", "doc")
          .unionByName(bShingles))
      val hCorpus = graft.multimodal.Curate.liveSig(spark, indexPath,
        "text_hashes", "doc_id")
      val hNew = b.select(col("doc_id"), md5(col("text")).as("h"))
      appendVerdicts(hCorpus.select("doc_id"), b.select("doc_id"),
        appendTextEdgesFromSignatures(sAll, hCorpus.unionByName(hNew),
          hNew, threshold, hotShingleCap,
          graft.multimodal.Curate.indexFreqFor(spark, indexPath, bShingles),
          restrict = graft.engine.Layout.flatDirBytes(spark,
            s"$indexPath/shingles") >
            graft.ops.GuardBounds.PrefixRestrictAboveBytes))
    }

  /** The verdict half of an APPEND: components over the (incremental)
    * edge set, then per batch doc `dup_of` = smallest corpus member of
    * its component (NULL if batch-only) and `keep` = corpus-clean AND
    * min-id batch representative. `corpusIds`/`batchIds` are single
    * `doc_id` columns; `edges` is any `(src, dst)` incremental edge
    * union (one modality or several — the caller chooses the graph).
    */
  private[graft] def appendVerdicts(corpusIds: DataFrame, batchIds: DataFrame,
                                    edges: DataFrame): DataFrame = {
    val comp = connectedComponents(edges, "src", "dst")
    val labeled = batchIds
      .join(comp.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("cluster_id"))
    // per component: the smallest corpus member (the dup target) and
    // the smallest batch member (the candidate representative)
    val corpMin = comp.join(corpusIds.select(col("doc_id").as("node")), "node")
      .groupBy(col("component").as("cluster_id"))
      .agg(min(col("node")).as("dup_of"))
    val batchMin = labeled.groupBy(col("cluster_id"))
      .agg(min(col("doc_id")).as("_bmin"))
    labeled
      .join(corpMin, Seq("cluster_id"), "left")
      .join(batchMin, Seq("cluster_id"))
      .select(col("doc_id"), col("dup_of"),
        (col("dup_of").isNull && col("doc_id") === col("_bmin")).as("keep"))
  }

  /** Quality-aware canonical selection per duplicate cluster: where
    * [[dupClusters]] marks the min-id member canonical (cheap but
    * arbitrary), this keeps the BEST member — argmax `quality`, min
    * doc id on ties — which is what a curation pipeline actually wants
    * (near-dup groups usually contain truncated/boilerplate variants;
    * keeping the longest or highest-scoring one preserves the most
    * signal; cf. the keep-longest convention in public dedup pipelines).
    * Emits every doc with its cluster, the cluster size, its quality,
    * and the keep/drop verdict — the drop list IS the dedup delete set.
    *
    * Cost over dupClusters: one key-join of the cluster assignment with
    * the per-doc quality (both doc-sized), then rank + size windows
    * sharing ONE partition-by-cluster shuffle. No new corpus passes.
    */
  def canonicalByQuality(df: DataFrame, idCol: String, textCol: String,
                         quality: Column, shingleN: Int = 5,
                         threshold: Double = 0.5): DataFrame =
    canonicalFromClusters(df, idCol,
      dupClusters(df, idCol, textCol, shingleN, threshold), quality)

  /** The probe half of [[canonicalByQuality]] (the buildIvfIndex /
    * ivfProbe split applied to dedup): `clusters` is a precomputed
    * assignment `(doc_id, cluster_id)` — typically [[dupClusters]]
    * materialized ONCE per corpus — so every quality-selection consumer
    * costs a key-join plus two windows on one partition-by-cluster
    * shuffle, and the transitive-closure walk is never re-run per
    * consumer. Same output contract as [[canonicalByQuality]].
    */
  def canonicalFromClusters(df: DataFrame, idCol: String,
                            clusters: DataFrame, quality: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val asg = clusters.select(col("doc_id"), col("cluster_id"))
    val scored = df.select(col(idCol).cast("long").as("doc_id"),
      quality.as("quality"))
    val byCluster = Window.partitionBy(col("cluster_id"))
    val rank = byCluster.orderBy(col("quality").desc, col("doc_id").asc)
    asg.join(scored, Seq("doc_id"))
      .withColumn("cluster_size", count(lit(1)).over(byCluster))
      .withColumn("keep", row_number().over(rank) === 1)
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        col("quality"), col("keep"))
  }

  /** Fixed-iteration PageRank over a directed edge list — the standard
    * centrality pass over a similarity graph (rank "hub" documents of a
    * near-dup neighborhood, weight corpus exemplars). Classic
    * distributed shape: per-iteration one join edges⋈ranks, one hash
    * aggregation of contributions by destination, one left join back
    * onto the node set; nothing reaches the driver but the node count.
    *
    * Determinism/oracle contract: each contribution `p/out_deg · d` is
    * computed in doubles with a FIXED formula shape, cast per-row to
    * DECIMAL(28,14) before the sum (exact, order-independent — the q49
    * pattern), and the new rank is rounded to 14 dp — so any partial-
    * aggregation order and any SQL engine replaying the same formula
    * produce identical bits. Nodes with no in-edges get the teleport
    * term only; every node of a k-NN graph has out-edges (any node with
    * a same-bucket peer points somewhere), so no dangling-mass term is
    * needed — callers feeding general graphs should add one.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 3, damping: Double = 0.85): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val out = e.groupBy(col("src")).agg(count(lit(1)).as("out_deg"))
    // tiny; reused every iteration + final join (caller releases)
    val nodes = graft.engine.Caches.checkpointed("pageRank.nodes",
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct(), eager = true)
    val n = nodes.count() // one scalar to the driver
    val teleport = (1.0 - damping) / n
    var p = nodes.withColumn("p", lit(1.0 / n))
    for (_ <- 1 to iters) {
      val contrib = e.join(p, e("src") === p("node"))
        .join(out, "src")
        .select(col("dst").as("node"),
          (col("p") / col("out_deg") * lit(damping))
            .cast(DecimalType(28, 14)).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("csum"))
      p = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          round(lit(teleport) + coalesce(col("csum").cast("double"), lit(0.0)), 14)
            .as("p"))
    }
    p.select(col("node"), col("p").as("pagerank"))
  }

  /** Synchronous label propagation over an undirected graph: seed nodes
    * hold fixed labels; each iteration every other node takes the most
    * common label among its labelled neighbours (tiebreak: smallest
    * label — fully deterministic, integer counts only, so the result is
    * engine-portable with no float concerns). The semi-supervised
    * spreading pass a curation pipeline uses to extend a small set of
    * human quality/topic labels across a similarity graph. Same
    * distributed shape as [[pageRank]]: join-count-argmax per iteration,
    * driver sees nothing. Nodes unreachable from any seed stay NULL.
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       seeds: DataFrame, seedNodeCol: String,
                       seedLabelCol: String, iters: Int = 3): DataFrame = {
    val e0 = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    // reused every iteration (caller releases via Caches)
    val e = graft.engine.Caches.checkpointed("labelPropagation.edges",
      e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
        .distinct(), eager = true)
    val nodes = graft.engine.Caches.checkpointed("labelPropagation.nodes",
      e.select(col("src").as("node")).distinct(), eager = true)
    val sd = seeds.select(col(seedNodeCol).cast("long").as("node"),
      col(seedLabelCol).cast("long").as("seed_label"))
    var lab = nodes.join(sd, Seq("node"), "left")
      .select(col("node"), col("seed_label").as("label"))
    for (_ <- 1 to iters) {
      val counts = e
        .join(lab.select(col("node").as("dst"), col("label").as("_nl")), "dst")
        .filter(col("_nl").isNotNull)
        .groupBy(col("src"), col("_nl"))
        .agg(count(lit(1)).as("_c"))
      // argmax by (count desc, label asc) via min over (-count, label)
      val best = counts.groupBy(col("src"))
        .agg(min(struct((-col("_c")).as("nc"), col("_nl").as("l")))
          .getField("l").as("_new"))
        .select(col("src").as("node"), col("_new"))
      lab = nodes.join(sd, Seq("node"), "left")
        .join(best, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("seed_label"), col("_new")).as("label"))
    }
    lab
  }
}
