package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 battery: run the indexed append's
  * `PrefixRestrictAboveBytes` switch in its OWN regime on real data
  * (round-12 verdict item #3 — "equality-specs at toy scale don't
  * certify the regime that carries the 100 TB claim", the q140
  * lesson).
  *
  * The sf0.1 shingle index is ~3 orders of magnitude under the 256 MB
  * threshold, so the above-threshold shape (indexed SUM-mergeable
  * `shingle_freq`, batch-prefix-restricted windows) had never executed
  * against data large enough to fire its own switch. This battery
  * AMPLIFIES the sf0.1 documents corpus with disjoint-vocabulary
  * variant copies — every token of variant v is suffixed `_v`, so each
  * variant is an independent replica of the corpus's full near-dup
  * structure with no cross-variant shingle collisions, preserving
  * per-doc shingle counts, frequency shape, and dup rate while scaling
  * rows linearly — then:
  *
  *   1. builds the signature index just BELOW and well ABOVE the
  *      threshold and runs `appendDedupIndexed` (the q161/q162
  *      operator) at both, letting the operator's own free-metadata
  *      switch decide the shape (printed per run);
  *   2. at the above-threshold corpus, forces BOTH shapes through the
  *      package-private internals and asserts verdict equality — the
  *      spec'd restricted≡unrestricted law, now at the scale the
  *      restricted shape exists for;
  *   3. asserts the variant-0 batch verdicts at the amplified corpus
  *      equal the plain sf0.1 verdicts under the id mapping
  *      `doc_id → doc_id·V + 0` — end-to-end correctness in the
  *      above-threshold regime against the same ground truth the
  *      oracle gate certifies at sf0.1.
  *
  * Results are recorded in BASELINE.md (timings astride the
  * threshold + the measured crossover).
  */
object DevPrefixRegime {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Sessions.tune(
      SparkSession.builder().master("local[32]"), shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = "/root/testdata/sf0.1"
    val thresholdBytes = graft.ops.GuardBounds.PrefixRestrictAboveBytes
    val root = "/tmp/graft_prefix_regime"
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"),
        col("source"))

    def amplified(v: Int): DataFrame =
      docs.crossJoin(spark.range(v).toDF("_v"))
        .select((col("doc_id") * v + col("_v")).as("doc_id"),
          array_join(transform(split(col("text"), " "),
            w => concat(w, lit("_"), col("_v"))), " ").as("text"),
          col("source"), col("_v"))

    // index over the amplified NON-src0 corpus (the q161 shape);
    // reused across runs when already on disk
    def buildIndex(v: Int): (String, Long, Double) = {
      val path = s"$root/v$v/index"
      val existing = graft.engine.Layout.flatDirBytes(spark, s"$path/shingles")
      if (existing > 0)
        return (path, existing, 0.0)
      val t0 = System.nanoTime()
      multimodal.Curate.buildSignatureIndex(spark,
        amplified(v).filter(col("source") =!= "src0").drop("_v"),
        "doc_id", "text", path)
      val secs = (System.nanoTime() - t0) / 1e9
      (path, graft.engine.Layout.flatDirBytes(spark, s"$path/shingles"), secs)
    }

    def batch(v: Int): DataFrame =
      amplified(v).filter(col("source") === "src0" && col("_v") === 0)
        .drop("_v")

    def timeAppend(path: String, v: Int, reps: Int): Seq[Double] =
      (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        text.Clusters.appendDedupIndexed(spark, path, batch(v),
          "doc_id", "text").count()
        val s = (System.nanoTime() - t0) / 1e9
        graft.engine.Caches.releaseAll(); spark.catalog.clearCache()
        s
      }

    // appendDedupIndexed's body with the shape FORCED — the only
    // departure from the operator is the restrict flag source
    def verdictsForced(path: String, v: Int, restrict: Boolean): DataFrame = {
      val b = batch(v)
      val bShingles = text.Dedup.shingleSets(b, "doc_id", "text", 5)
      val sAll = graft.engine.Caches.persisted("devprefix.shingles",
        multimodal.Curate.liveSig(spark, path, "shingles", "doc")
          .unionByName(bShingles))
      val hCorpus = multimodal.Curate.liveSig(spark, path,
        "text_hashes", "doc_id")
      val hNew = b.select(col("doc_id"), md5(col("text")).as("h"))
      text.Clusters.appendVerdicts(hCorpus.select("doc_id"),
        b.select("doc_id"),
        text.Clusters.appendTextEdgesFromSignatures(sAll,
          hCorpus.unionByName(hNew), hNew, 0.5,
          graft.ops.GuardBounds.HotShingleCap,
          multimodal.Curate.indexFreqFor(spark, path, bShingles), restrict))
    }

    def rows(df: DataFrame): Set[Seq[Any]] =
      df.collect().map(_.toSeq).toSet

    // ── sizing probe: bytes per variant from a small build ──────────
    val (probePath, probeBytes, probeSecs) = buildIndex(8)
    val bpv = probeBytes / 8.0
    println(f"[prefix] probe v=8 shingles=${probeBytes / 1048576.0}%.1f MB " +
      f"(${bpv / 1048576.0}%.2f MB/variant, build $probeSecs%.1f s) " +
      f"threshold=${thresholdBytes / 1048576}%d MB")
    val vBelow = math.max(1, math.floor(0.6 * thresholdBytes / bpv).toInt)
    val vAbove = math.ceil(1.5 * thresholdBytes / bpv).toInt

    // ── below the threshold: the operator must choose UNRESTRICTED ──
    val (pBelow, bytesBelow, buildBelow) = buildIndex(vBelow)
    require(bytesBelow <= thresholdBytes,
      s"below-corpus overshot: $bytesBelow > $thresholdBytes")
    val tBelow = timeAppend(pBelow, vBelow, 3)
    println(f"[prefix] BELOW v=$vBelow shingles=${bytesBelow / 1048576.0}%.1f MB " +
      f"(build $buildBelow%.1f s) restrict=false " +
      s"append_s=${tBelow.map(t => f"$t%.2f").mkString(",")}")

    // ── above the threshold: the operator's own switch fires ────────
    val (pAbove, bytesAbove, buildAbove) = buildIndex(vAbove)
    require(bytesAbove > thresholdBytes,
      s"above-corpus undershot: $bytesAbove <= $thresholdBytes")
    val tAbove = timeAppend(pAbove, vAbove, 3)
    println(f"[prefix] ABOVE v=$vAbove shingles=${bytesAbove / 1048576.0}%.1f MB " +
      f"(build $buildAbove%.1f s) restrict=true " +
      s"append_s=${tAbove.map(t => f"$t%.2f").mkString(",")}")

    // ── both shapes at the above-threshold corpus: timing + equality ─
    val tR = { val t0 = System.nanoTime()
      val r = rows(verdictsForced(pAbove, vAbove, restrict = true))
      graft.engine.Caches.releaseAll(); spark.catalog.clearCache()
      ((System.nanoTime() - t0) / 1e9, r) }
    val tU = { val t0 = System.nanoTime()
      val r = rows(verdictsForced(pAbove, vAbove, restrict = false))
      graft.engine.Caches.releaseAll(); spark.catalog.clearCache()
      ((System.nanoTime() - t0) / 1e9, r) }
    require(tR._2 == tU._2,
      s"restricted/unrestricted verdicts diverged ABOVE threshold: " +
        s"onlyR=${(tR._2 -- tU._2).take(3)} onlyU=${(tU._2 -- tR._2).take(3)}")
    println(f"[prefix] ABOVE shapes EQUAL (${tR._2.size} verdicts): " +
      f"restricted=${tR._1}%.2f s unrestricted=${tU._1}%.2f s")

    // ── ground truth: variant-0 verdicts == plain sf0.1 under id map ─
    val plainIdx = s"$root/plain/index"
    if (graft.engine.Layout.flatDirBytes(spark, s"$plainIdx/shingles") == 0L)
      multimodal.Curate.buildSignatureIndex(spark,
        docs.filter(col("source") =!= "src0"), "doc_id", "text", plainIdx)
    val plain = text.Clusters.appendDedupIndexed(spark, plainIdx,
        docs.filter(col("source") === "src0"), "doc_id", "text")
      .select(col("doc_id") * vAbove,
        col("dup_of") * vAbove, col("keep"))
    val mapped = rows(plain)
    graft.engine.Caches.releaseAll(); spark.catalog.clearCache()
    val big = rows(verdictsForced(pAbove, vAbove, restrict = true)
      .select(col("doc_id"), col("dup_of"), col("keep")))
    graft.engine.Caches.releaseAll(); spark.catalog.clearCache()
    require(big == mapped,
      s"above-threshold verdicts diverged from the sf0.1 ground truth: " +
        s"onlyBig=${(big -- mapped).take(3)} onlyPlain=${(mapped -- big).take(3)}")
    println(s"[prefix] ABOVE verdicts == sf0.1 ground truth under id map " +
      s"(${big.size} rows) — indexed-freq shape certified in its own regime")
    spark.stop()
  }
}
