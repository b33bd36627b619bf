package graft

import java.nio.file.{Files, Paths}

/** Plan dossier generator: writes PLANS.md with the FORMATTED physical
  * plan of each flagship query next to the scale invariant it
  * demonstrates — the human-readable face of PlanSpec's regression
  * asserts (PlanSpec proves the invariants on every test run; this
  * artifact lets a reviewer read the actual plans without running
  * anything). Regenerate after plan-shaping changes:
  * `sbt "runMain graft.DevPlans"`.
  */
object DevPlans {
  val showcase: Seq[(String, String)] = Seq(
    "q01_gold_daily_stats" ->
      ("WindowGroupLimit pushes the top-10 rank filter below the window " +
        "sort: each partition keeps 10 rows per date BEFORE sorting — " +
        "the difference between sorting 10 rows and sorting every row " +
        "per date at 100 TB."),
    "q10_join_star" ->
      ("Star dimensions broadcast (BroadcastHashJoin everywhere, no " +
        "SortMergeJoin): the fact table never shuffles for " +
        "dimension lookups."),
    "q51_salted_join" ->
      ("Skew-safe join: the hot key is salted into `salts` sub-keys " +
        "before the shuffle, then unsalted in the aggregation — " +
        "result-invariance is property-tested in LawsProps."),
    "q81_ivf_probe" ->
      ("Partition pruning does the ANN work: the scan's " +
        "PartitionFilters select exactly nProbe of the cluster " +
        "directories — the probe reads a fraction of the corpus " +
        "(PlanSpec asserts partitionCount === nProbe)."),
    "q93_bloom_decontaminate" ->
      ("The Bloom pre-filter (might_contain) sits INSIDE the scan-side " +
        "codegen span, so non-candidate shingles die map-side; the " +
        "exact verify join still broadcasts."),
    "q95_fuzzy_match" ->
      ("Entity resolution on the name VOCABULARY (records collapse " +
        "first), blocked equi-join, |Δlength| gate, then the BANDED " +
        "three-arg levenshtein — O(k·min(m,n)) per surviving pair."),
    "q96_hash_sample" ->
      ("Deterministic per-group sampling via WindowGroupLimit: k rows " +
        "per group survive per partition before any sort — sampling 5 " +
        "docs/source from 100 TB must not sort 100 TB."),
    "q104_length_quantiles" ->
      ("EXACT percentiles in one hash Exchange: exact percentile state " +
        "is bounded by DISTINCT lengths, not rows — the case where " +
        "approximate sketches buy nothing at any scale."),
    "q113_bollinger" ->
      ("The whole band computation rides rollingStats' ONE " +
        "partition-by-key Exchange; bands derive map-side from the " +
        "rolling moments."),
    "q117_inverted_index" ->
      ("Both window passes (df count, posting cap) and the collect " +
        "share ONE token-hash Exchange; the posting cap filters BEFORE " +
        "aggregation so no stop-word buffer can blow up."),
    "q118_semantic_dedup" ->
      ("SemDeDup: broadcast argmax assignment (BroadcastNestedLoopJoin " +
        "over the k-row centroid table), then the near-dup pair join " +
        "shuffles on the CLUSTER key — Σ cluster² pairs, never n²."),
    "q121_realized_variance" ->
      ("The (key, day) aggregation is satisfied by the return window's " +
        "hash(key) clustering (distribution-subset rule) — one Exchange " +
        "end to end."),
    "q125_var_cvar" ->
      ("Three windows (tick return, rank-by-return, partition count) " +
        "and the tail aggregation all ride ONE hash(key) Exchange; the " +
        "order-statistic VaR needs a per-key sort, which Spark's " +
        "external window sort spills — never the driver."),
    "q134_vol_cone" ->
      ("ALL cone horizons roll in ONE window pass over the shared key " +
        "partitioning (struct-stack explode, then the (key, horizon) " +
        "agg rides the same clustering) — a per-horizon union would " +
        "re-shuffle the frame once per horizon (measured 3 Exchanges, " +
        "this plan has 1)."),
    "q133_pair_spread" ->
      ("The tick table is touched once (bucket-mean aggregation); the " +
        "k² pair expansion BroadcastHashJoins the aggregate-sized " +
        "frame, and every pair statistic — five power sums AND the " +
        "latest bucket's values via tie-free max_by — comes from ONE " +
        "grouped aggregation."),
    "q144_leadlag_corr" ->
      ("Lead-lag: the ±3 lag stack rides ONE Window operator (array " +
        "of lag exprs over the same spec, exploded map-side); the " +
        "(pair, lag) expansion broadcast-joins aggregate-sized return " +
        "frames and all Pearson power sums come from one grouped " +
        "aggregation — ticks are touched exactly once."),
    "q145_vocab_coverage" ->
      ("One explode feeds both sides: corpus frequencies (map-side " +
        "partials into one token-hash Exchange, top-V via " +
        "TakeOrderedAndProject — never a global sort) and the per-doc " +
        "membership join, which BROADCASTS the V-row vocabulary so " +
        "the doc aggregation needs no second corpus shuffle."),
    "q153_phash_banded" ->
      ("Perceptual image dedup at scale: the 64-bit aHash blocks into " +
        "four 16-bit chunks and candidates come from a chunk EQUI-join " +
        "(never a cartesian) — pigeonhole-complete for hamming <= 3, " +
        "so the banding provably loses nothing on ANY corpus while the " +
        "pair space shrinks to colliding chunk buckets."),
    "q160_multimodal_manifest" ->
      ("Unified multimodal curation: text shingle, image chunk, and " +
        "audio chunk edge families are all equi-joins (no product " +
        "anywhere in the composition), the union graph walks through " +
        "the hybrid CC dispatch, and keep/split are map-only functions " +
        "of the unified cluster id — so the whole manifest adds no " +
        "quadratic surface over its parts."),
    "q166_pq_adc" ->
      ("PQ/ADC search: the codebook and the query distance table " +
        "(nSub·nCodes rows each) BroadcastHashJoin onto the vector " +
        "stream; assignment explodes map-side and collapses in a " +
        "partial-agg argmin before the (id, s) shuffle — the corpus " +
        "is read once and never shuffles for a join."),
    "q169_novelty" ->
      ("Shingle novelty has NO join at all: first-seen = min(doc) " +
        "over the shingle partition and the per-doc re-aggregation " +
        "ride one shingle-keyed Exchange then one doc-keyed Exchange " +
        "— the inverted-index shape with zero pair space."),
    "q188_dup_spans" ->
      ("Exact duplicated-span detection is JOIN-FREE: frequency and " +
        "global keep-first ride ONE shingle-keyed window, the islands " +
        "merge one doc-keyed window — a duplicated substring of any " +
        "multiplicity costs linear rows, never pairs."),
    "q190_ivfadc" ->
      ("IVFADC: centroid probe and PQ codebook/distance tables all " +
        "BroadcastHashJoin; the probed-list candidate restriction is " +
        "a SORTLESS shuffle-hash semi-join (candidates are " +
        "~nProbe/nCentroids of the corpus — not broadcastable at " +
        "scale; a persisted index prunes cluster partitions instead)."),
    "q196_ivfadc_probe" ->
      ("The persisted IVFADC index delivers what q190's inline plan " +
        "cannot: the codes scan carries a literal-IN PartitionFilter " +
        "(nProbe of nCentroids cluster dirs read at planning time) and " +
        "a codes-only ReadSchema — no raw vector is stored in or read " +
        "from the index at all."),
    "q197_ann_join" ->
      ("Similarity search as a JOIN: per-query probed lists via one " +
        "window over a broadcast NL centroid ranking, the codes scan " +
        "union-pruned (literal IN + runtime dynamic pruning), and the " +
        "batch-shaped ADC distance table joined SORTLESS shuffle-hash " +
        "— linear in batch (DevAnnStress: 10× queries ⇒ ~10× " +
        "wall-clock), nothing corpus- or batch-sized on the driver."),
    "q199_text_ann" ->
      ("Raw text to ANN with no model: one token shuffle builds tf " +
        "AND df (co-partitioned), bucket sums are exact decimals, the " +
        "dense assembly is map-side per doc, and the cosine top-k is " +
        "a broadcast of the single query vector + " +
        "TakeOrderedAndProject — the corpus is scanned once."),
    "q216_winnow_fingerprints" ->
      ("Winnowing is MAP-ONLY: grams, hashes, and every window argmin " +
        "fold fuse into one scan projection, nothing shuffles before " +
        "the result. The hash array MUST materialize as a projected " +
        "column — referencing it from inside the fold lambda re-runs " +
        "the whole-doc md5 transform per (window, step), O(n²·w): " +
        "measured 147 s vs 1 s at sf0.1."),
    "q217_winnow_overlap" ->
      ("Winnow overlap: the fp self-join and both corpus-sized size " +
        "rejoins are SORTLESS shuffle-hash (a broadcast would ship " +
        "corpus-derived sizes everywhere; sort-merge would sort the " +
        "fingerprint relation three times); per-key expansion is " +
        "bounded by the hottest fingerprint, refused past the cap."),
    "q220_cms_heavyhitters" ->
      ("Count-min sketch: the (depth·width)-bounded sketch aggregate " +
        "partials map-side, estimates join the BROADCAST sketch, and " +
        "the exact top-k ground truth rides TakeOrderedAndProject — " +
        "never a global sort of the gram counts."),
    "q221_hll_audit" ->
      ("HyperLogLog: one m-bounded register aggregate (map-side " +
        "combine) + the exact-distinct ground truth; registers merge " +
        "by per-bucket MAX (law-proven shard-merge ≡ global), so the " +
        "8 KB register file is what ships between executors at scale, " +
        "never gram streams."),
    "q236_ann_delete_probe" ->
      ("Deletion propagation costs nothing at probe time: the literal " +
        "cluster IN-list still partition-prunes the codes scan THROUGH " +
        "the tombstone anti-join (a BroadcastHashJoin LeftAnti against " +
        "the bounded tombstone set), so a forget request never turns " +
        "the pruned probe into a corpus scan — PlanSpec pins both the " +
        "PartitionFilters and the broadcast."),
    "q242_hybrid_rrf" ->
      ("Hybrid RRF fusion: BOTH retriever lists end in " +
        "TakeOrderedAndProject (sort k rows per partition, merge k on " +
        "the driver — never a global Sort of the scored corpus), so " +
        "the rank windows and the full-outer fusion join run on ≤2N " +
        "bounded rows; the corpus is touched exactly twice, once per " +
        "retriever, and never reaches the fusion."),
    "q243_filtered_ann" ->
      ("Adaptive filtered search, selective path: the metadata " +
        "predicate semi-join and the one-row query frame both " +
        "broadcast onto the corpus scan (zero corpus shuffles), the " +
        "top-k is a TakeOrderedAndProject — recall 1.0 by " +
        "construction because the scan IS the filtered set; the " +
        "broad-predicate path swaps in the partition-pruned " +
        "ivfProbeWhere, whose width/recall trade DevFilteredRecall " +
        "measured (10% selectivity needs nProbe = nCentroids at " +
        "sf0.01 — exactly why selective predicates must not probe)."))

  def main(args: Array[String]): Unit = {
    val spark = engine.Sessions.tune(
      org.apache.spark.sql.SparkSession.builder().master("local[8]"),
      shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val sb = new StringBuilder
    sb.append("# PLANS — flagship physical plans (generated by graft.DevPlans)\n\n")
    sb.append("Formatted plans at sf0.001, one per scale invariant. PlanSpec\n")
    sb.append("asserts these shapes on every test run; this file is the\n")
    sb.append("readable record. Regenerate: `sbt \"runMain graft.DevPlans\"`.\n")
    for ((q, note) <- showcase) {
      val plan = SparkEntry.queries(q)(spark, dir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      // cap any plan line at ~1 KB: q93's plan embeds the serialized
      // bloom filter as a ~4 MB hex literal THREE times, which made the
      // dossier a 12.7 MB file no reviewer can open — the literal's
      // first kilobyte documents the shape just as well
      val capped = plan.linesIterator.map { l =>
        if (l.length <= 1024) l
        else l.take(1024) + s"…<${l.length - 1024} chars elided>"
      }.mkString("", "\n", "\n")
      sb.append(s"\n## $q\n\n$note\n\n```\n$capped```\n")
      spark.catalog.clearCache()
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println(s"[plans] wrote PLANS.md (${showcase.size} queries)")
    spark.stop()
  }
}
