package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{Curate, Media}
import graft.text.Dedup

/** Unified multimodal curation manifest: cross-modality transitive
  * clustering, one keep per cluster, and the per-modality zero-leakage
  * invariant the composition exists to guarantee.
  */
class CurateSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  // Fixture ids chosen so the perceptual-fixture law (media edge iff
  // popcount(xor(ids)) <= 3) draws exactly the intended edges; the
  // popcount assumptions are asserted below, so the fixture is
  // self-checking rather than trusted.
  private val tA = 15L        // 0x0000000F ─┐ exact text dups,
  private val tB = 240L       // 0x000000F0 ─┘ hamming 8 → no media edge
  private val iA = 3840L      // 0x00000F00 ─┐ different texts,
  private val iB = 3841L      // 0x00000F01 ─┘ hamming 1 → media edge
  private val cA = 983040L    // 0x000F0000 ─┐ media edge to cB
  private val cB = 983041L    // 0x000F0001 ─┤ text dup of cC (no media)
  private val cC = 15728640L  // 0x00F00000 ─┘ → {cA,cB,cC} one cluster
  private val s1 = 251658240L // 0x0F000000 singleton: far from all

  private val docs = Seq(
    tA -> "alpha beta gamma delta epsilon zeta eta theta",
    tB -> "alpha beta gamma delta epsilon zeta eta theta",
    iA -> "one two three four five six seven eight",
    iB -> "nine ten eleven twelve thirteen fourteen fifteen sixteen",
    cA -> "red orange yellow green blue indigo violet white",
    cB -> "lorem ipsum dolor sit amet consectetur adipiscing elit",
    cC -> "lorem ipsum dolor sit amet consectetur adipiscing elit",
    s1 -> "solo unique words nothing shared with anything else"
  ).toDF("doc_id", "text")

  private lazy val manifest = Curate.unifiedManifest(spark, docs,
      "doc_id", "text", Seq(("train", 80), ("val", 10), ("test", 10)))
    .collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getBoolean(2), r.getString(3),
        r.getBoolean(4), r.getBoolean(5), r.getBoolean(6)))).toMap

  test("fixture geometry holds: intended media edges and only those") {
    val ids = Seq(tA, tB, iA, iB, cA, cB, cC, s1)
    val mediaPairs = for {
      a <- ids; b <- ids if a < b
      if java.lang.Long.bitCount(a ^ b) <= 3
    } yield (a, b)
    assert(mediaPairs.toSet === Set((iA, iB), (cA, cB)))
  }

  test("cross-modality transitivity: union graph merges what any modality links") {
    def cluster(id: Long) = manifest(id)._1
    assert(cluster(tA) === cluster(tB))           // text-only pair
    assert(cluster(iA) === cluster(iB))           // image/audio-only pair
    assert(cluster(cA) === cluster(cB))           // media edge…
    assert(cluster(cB) === cluster(cC))           // …chained to a text edge
    // the four groups are mutually distinct clusters
    assert(Set(cluster(tA), cluster(iA), cluster(cA), cluster(s1)).size === 4)
    // min-id canonical, exactly one keep per cluster
    assert(manifest(tA)._2 && !manifest(tB)._2)
    assert(manifest(iA)._2 && !manifest(iB)._2)
    assert(manifest(cA)._2 && !manifest(cB)._2 && !manifest(cC)._2)
    assert(manifest(s1)._2)
  }

  test("modality flags report which family made each doc a duplicate") {
    def flags(id: Long) = { val m = manifest(id); (m._4, m._5, m._6) }
    assert(flags(tA) === ((true, false, false)), "exact text dup only")
    assert(flags(iA) === ((false, true, true)), "perceptual pair: image+audio")
    assert(flags(cA) === ((false, true, true)), "chain head: media edge only")
    assert(flags(cC) === ((true, false, false)), "chain tail: text edge only")
    assert(flags(s1) === ((false, false, false)), "singleton")
  }

  test("appendManifest: modality-aware batch verdicts against a standing corpus") {
    // corpus ids far apart in hamming; batch ids craft one dup per
    // modality — popcount assumptions asserted like the main fixture
    val corpus = Seq(
      15L         -> "alpha beta gamma delta epsilon zeta eta theta",
      983040L     -> "red orange yellow green blue indigo violet white",
      251658240L  -> "solo unique words nothing shared with anything else"
    ).toDF("doc_id", "text")
    val batch = Seq(
      // image/audio twin of corpus 983040 (hamming 1), different text
      983041L     -> "one two three four five six seven eight",
      // exact text dup of corpus 15, hamming-far from everything
      61440L      -> "alpha beta gamma delta epsilon zeta eta theta", // 0x0000F000
      // novel in every modality
      1044480L    -> "nine ten eleven twelve thirteen fourteen fifteen sixteen" // 0x000FF000
    ).toDF("doc_id", "text")
    val ids = Seq(15L, 983040L, 251658240L, 983041L, 61440L, 1044480L)
    val mediaPairs = for {
      a <- ids; b <- ids if a < b
      if java.lang.Long.bitCount(a ^ b) <= 3
    } yield (a, b)
    assert(mediaPairs.toSet === Set((983040L, 983041L)))
    val out = Curate.appendManifest(spark, corpus, batch, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)).map(_.asInstanceOf[Long]), r.getBoolean(2),
          r.getBoolean(3), r.getBoolean(4), r.getBoolean(5)))).toMap
    spark.catalog.clearCache()
    // (dup_of, keep, text_dup, image_dup, audio_dup)
    assert(out(983041L) === ((Some(983040L), false, false, true, true)),
      "image/audio dup of the corpus drops with media provenance")
    assert(out(61440L) === ((Some(15L), false, true, false, false)),
      "exact text dup of the corpus drops with text provenance")
    assert(out(1044480L) === ((None, true, false, false, false)),
      "novel batch doc keeps")
    assert(out.size === 3)
  }

  test("incremental banded join: hot corpus buckets wedge appends only when probed") {
    // fixture hash = spreadBits(id): ids 16a (a=1..7) differ only in the
    // bits feeding chunk 1, so the corpus's all-zero chunk-0/2/3 buckets
    // each hold 7 signatures — hot at cap 5. A batch signature that
    // probes NONE of them (1153 = bits 0/7/10 → nonzero chunk 0/2/3
    // values) must append fine; one that probes them (2048 = bit 11 →
    // zero chunk 0/2 values) must refuse; the symmetric join refuses
    // outright (its blowup bound is the full bucket either way).
    val corpusIds = (1 to 7).map(a => (a << 4).toLong)
    def media(ids: Seq[Long]) =
      Media.imageHashTable(spark, ids.toDF("doc_id"), "doc_id")
    val ok = Media.phashBandedPairsIncremental(spark,
      media(corpusIds :+ 1153L), Seq(1153L).toDF("doc_id"),
      maxChunkBucket = 5L)
    assert(ok.count() >= 0L) // runs — no refusal
    spark.catalog.clearCache()
    val e = intercept[IllegalArgumentException] {
      Media.phashBandedPairsIncremental(spark,
        media(corpusIds :+ 2048L), Seq(2048L).toDF("doc_id"),
        maxChunkBucket = 5L)
    }
    assert(e.getMessage.contains("maxChunkBucket"), e.getMessage)
    spark.catalog.clearCache()
    intercept[IllegalArgumentException] {
      Media.phashBandedPairs(spark, media(corpusIds :+ 1153L),
        maxChunkBucket = 5L)
    }
    spark.catalog.clearCache()
  }

  test("zero cross-split leakage per modality, by construction") {
    // recompute each modality's edge list with the same operators the
    // manifest used and audit the shipped split assignment against it
    val split = manifest.view.mapValues(_._3).toMap
    def audit(pairs: Seq[(Long, Long)], modality: String): Unit =
      pairs.foreach { case (a, b) =>
        assert(split(a) === split(b),
          s"$modality pair ($a,$b) straddles splits ${split(a)}/${split(b)}")
      }
    val jac = Dedup.jaccardPairs(docs, "doc_id", "text", 5, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSeq
    val ex = docs.as[(Long, String)].collect().groupBy(_._2).values
      .flatMap(g => g.map(_._1).sorted.sliding(2).filter(_.size == 2)
        .map(p => (p(0), p(1)))).toSeq
    val img = Media.phashBandedPairs(spark,
        Media.imageHashTable(spark, docs, "doc_id"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    val aud = Media.audioHashBandedPairs(spark,
        Media.audioHashTable(spark, docs, "doc_id"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert((jac ++ ex).nonEmpty && img.nonEmpty && aud.nonEmpty)
    audit(jac, "jaccard"); audit(ex, "exact-text")
    audit(img, "image"); audit(aud, "audio")
    // members of one cluster share the cluster's split verbatim
    manifest.groupBy(_._2._1).foreach { case (_, members) =>
      assert(members.values.map(_._3).toSet.size === 1)
    }
    spark.catalog.clearCache() // jaccardPairs persist contract
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("signature/edge-index manifests reproduce the self-deriving manifest exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sigidx")
      .toString + "/index"
    Curate.buildSignatureIndex(spark, docs, "doc_id", "text", dir)
    val pcts = Seq(("train", 80), ("val", 10), ("test", 10))
    val inline = rows(Curate.unifiedManifest(spark, docs, "doc_id", "text", pcts))
    assert(rows(Curate.unifiedManifestFromIndex(spark, dir, pcts)) === inline,
      "signature-index manifest diverged from the self-deriving manifest")
    Curate.buildEdgeIndex(spark, dir)
    assert(rows(Curate.manifestFromEdgeIndex(spark, dir, pcts)) === inline,
      "edge-index manifest diverged from the self-deriving manifest")
    graft.engine.Caches.releaseAll(); spark.catalog.clearCache()
  }

  test("appendSignatures: compaction cadence bounds file counts without changing verdicts") {
    val corpus = Seq(
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "red orange yellow green blue indigo violet white"
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_sigidx3")
      .toString + "/index"
    Curate.buildSignatureIndex(spark, corpus, "doc_id", "text", dir)
    // 6 commits at 2 files each with compactAbove=5: the cadence must
    // fire at least once, and no signature table may exceed
    // compactAbove + filesPerCommit files at any point after a commit
    var committed = corpus
    (1 to 6).foreach { i =>
      val b = Seq((100L + i) -> s"fresh words number $i nothing shared $i")
        .toDF("doc_id", "text")
      Curate.appendSignatures(spark, b, "doc_id", "text", dir,
        filesPerCommit = 2, compactAbove = 5)
      committed = committed.union(b)
      Seq("shingles", "text_hashes", "image_hashes", "audio_hashes")
        .foreach { t =>
          val n = graft.engine.Layout.flatFileCount(spark, s"$dir/$t")
          assert(n <= 7, s"$t grew to $n files despite compactAbove=5")
        }
    }
    // compaction actually ran and logged the maintenance op
    val hist = graft.engine.Layout.history(spark, s"$dir/shingles", 50)
    assert(hist.filter($"operation" === "OPTIMIZE_FLAT").count() >= 1,
      "compaction cadence never fired")
    // verdicts off the compacted index still equal the self-deriving form
    val batch2 = Seq(
      900L -> "alpha beta gamma delta epsilon zeta eta theta", // text dup
      901L -> "entirely novel vocabulary appearing nowhere previously"
    ).toDF("doc_id", "text")
    assert(rows(Curate.appendManifestIndexed(spark, dir, batch2,
        "doc_id", "text"))
      === rows(Curate.appendManifest(spark, committed, batch2,
        "doc_id", "text")),
      "post-compaction verdicts diverged from the self-deriving append")
    graft.engine.Caches.releaseAll(); spark.catalog.clearCache()
  }

  test("indexed appends equal self-deriving appends; signature appends extend the corpus") {
    val corpus = Seq(
      15L         -> "alpha beta gamma delta epsilon zeta eta theta",
      983040L     -> "red orange yellow green blue indigo violet white",
      251658240L  -> "solo unique words nothing shared with anything else"
    ).toDF("doc_id", "text")
    val batch = Seq(
      983041L     -> "one two three four five six seven eight",
      61440L      -> "alpha beta gamma delta epsilon zeta eta theta",
      1044480L    -> "nine ten eleven twelve thirteen fourteen fifteen sixteen"
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_sigidx2")
      .toString + "/index"
    Curate.buildSignatureIndex(spark, corpus, "doc_id", "text", dir)
    assert(rows(Curate.appendManifestIndexed(spark, dir, batch, "doc_id", "text"))
      === rows(Curate.appendManifest(spark, corpus, batch, "doc_id", "text")),
      "indexed multimodal append diverged from the self-deriving append")
    assert(rows(graft.text.Clusters.appendDedupIndexed(spark, dir, batch,
        "doc_id", "text"))
      === rows(graft.text.Clusters.appendDedup(corpus, batch, "doc_id", "text")),
      "indexed text append diverged from the self-deriving append")
    graft.engine.Caches.releaseAll(); spark.catalog.clearCache()
    // commit the batch's signatures, then a second batch must see
    // corpus ∪ batch as its standing corpus — the steady-state loop
    Curate.appendSignatures(spark, batch, "doc_id", "text", dir)
    val batch2 = Seq(
      2097152L -> "alpha beta gamma delta epsilon zeta eta theta", // text dup
      4194304L -> "entirely fresh vocabulary appearing nowhere before now"
    ).toDF("doc_id", "text")
    assert(rows(Curate.appendManifestIndexed(spark, dir, batch2, "doc_id", "text"))
      === rows(Curate.appendManifest(spark, corpus.union(batch), batch2,
        "doc_id", "text")),
      "post-appendSignatures verdicts diverged from the unioned corpus")
    graft.engine.Caches.releaseAll(); spark.catalog.clearCache()
    // mixing n-gram widths is refused, not silently wrong
    val e = intercept[IllegalArgumentException] {
      Curate.appendManifestIndexed(spark, dir, batch2, "doc_id", "text",
        shingleN = 3)
    }
    assert(e.getMessage.contains("shingleN"), e.getMessage)
    intercept[IllegalArgumentException] {
      graft.text.Clusters.appendDedupIndexed(spark, dir, batch2,
        "doc_id", "text", shingleN = 3)
    }
  }
}
