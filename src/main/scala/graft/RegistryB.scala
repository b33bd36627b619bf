package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ops.{Clean, Guards, Ingest, Joins, Risk, Stats, Windows}
import graft.text.{Dedup, TextStats}
import graft.text.Curation.FixedBpeMerges
import graft.vector.Similarity
import graft.Fixtures._

/** Registry shard: Training-data pipeline: dedup / text analysis / curation.
  *
  * Split VERBATIM from SparkEntry's single 3,200-line map (round 13,
  * the OraclesA/B/C precedent): entries and their comments are
  * unchanged; [[SparkEntry.queries]] concatenates the four shards and
  * asserts key-disjointness, so the driver contract (keys, closures,
  * oracle pairing) is byte-identical to the pre-split registry.
  * 57 entries (q242–q247 retrieval family added post-split).
  */
private[graft] object RegistryB {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ── Training-data pipeline: dedup / text (north star) ───────────────
    "q29_grouping_sets" -> ((s, dir) => {
      // SQL front-end path: explicit GROUPING SETS (no Dataset API form)
      t(s, dir, "customer").createOrReplaceTempView("gs_customer")
      t(s, dir, "nation").createOrReplaceTempView("gs_nation")
      s.sql("""SELECT n_name, c_mktsegment, COUNT(*) AS n_customers
              |FROM gs_customer JOIN gs_nation ON c_nationkey = n_nationkey
              |GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
              |ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin)
    }),

    "q30_dedup_exact" -> ((s, dir) => {
      Dedup.exactGroups(t(s, dir, "documents"), "doc_id", "text").orderBy("text_hash")
    }),

    "q31_jaccard_pairs" -> ((s, dir) => {
      Dedup.jaccardPairs(t(s, dir, "documents"), "doc_id", "text", 5, 0.5)
        .orderBy("doc_a", "doc_b")
    }),

    "q32_minhash_lsh" -> ((s, dir) => {
      // the verify step makes LSH precision exact, so its output is a
      // deterministic subset of q31's exact pairs; on this corpus (min
      // qualifying jaccard 0.875 against 8 bands × 4 rows) recall is
      // total, so the exact-jaccard oracle applies verbatim — the gate
      // then asserts the banding loses nothing at these parameters
      Dedup.minhashLsh(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_a", "doc_b")
    }),

    "q33_simhash_pairs" -> ((s, dir) => {
      // oracle-gated since round 6: the token hash is md5-derived (first
      // 8 digest bytes), so DuckDB recomputes the ENTIRE simhash —
      // per-token bits, majority vote, hamming — independently
      Dedup.simhashPairs(t(s, dir, "documents"), "doc_id", "text")
        .withColumn("hamming", col("hamming").cast("long"))
        .orderBy("doc_a", "doc_b")
    }),

    "q34_lang_id" -> ((s, dir) => {
      // character-n-gram profile detector (round-9: replaced the 5-word
      // stopword dictionary, which measured at chance on real
      // multilingual text); the oracle's scoring SQL is GENERATED from
      // the same profile literal, so engine and oracle cannot desync
      TextStats.langIdNgram(t(s, dir, "documents"), "text")
        .select(col("doc_id") +: TextStats.LangProfiles.map { case (l, _) =>
          col(s"score_$l") } :+ col("pred_lang"): _*)
        .orderBy("doc_id")
    }),

    "q191_ivfadc_recall" -> ((s, dir) => {
      // the full-system ANN gate: recall@10 of IVFADC (coarse pruning +
      // trained-PQ ADC) against the exact cosine scan — reads 0.8 on
      // this corpus, equal to the unpruned q175 gate: at nProbe=4 the
      // pruning costs nothing against the TRUE neighbor set (the one
      // ADC neighbor it drops was a quantization artifact, not a real
      // neighbor). Oracle splices both components' own SQL. Round-10:
      // the approximate side reads the PERSISTED index (q196's probe —
      // bit-identical to the inline ivfAdcTopK it replaced, which
      // re-trained PQ per call); recall row unchanged.
      val emb = t(s, dir, "embeddings")
      // single-reference plan (q209 discipline): LEFT join + hit flag
      // folds overlap and reference counts into one agg — the exact
      // cosine scan derives once, not once per reference
      val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", 0L, 10)
        .select(col("vec_id"))
      val approx = Similarity.ivfAdcProbeById(s, ivfAdcIndexFor(s, dir),
          emb, "vec_id", "embedding", 0L, 10)
        .select(col("vec_id"), lit(1L).as("_hit"))
      exact.join(broadcast(approx), Seq("vec_id"), "left")
        .agg(count(lit(1)).as("_ne"),
          coalesce(sum(coalesce(col("_hit"), lit(0L))), lit(0L))
            .as("n_overlap"))
        .select(lit(10).as("k"), col("n_overlap"),
          when(col("_ne") === 0, lit(0.0))
            .otherwise(col("n_overlap") /
              least(lit(10).cast("long"), col("_ne"))).as("recall"))
    }),

    "q190_ivfadc" -> ((s, dir) => {
      // IVFADC (Jegou et al. SS3): coarse quantizer prunes to nProbe
      // inverted lists, trained-PQ ADC ranks the survivors — the q41
      // pruning composed with the q166 code scan; the oracle shares
      // q166's generated chain with only the scan source restricted.
      // Round-10: probes the PERSISTED index (per-call PQ retraining
      // was 2.4 s of re-derivation the build/probe split already paid
      // for) at a SECOND query point (vec_id 1; q196 covers query 0),
      // so the family gates two probe geometries instead of duplicating
      // one. ivfAdcTopK keeps its own inline-build spec coverage.
      Similarity.ivfAdcProbeById(s, ivfAdcIndexFor(s, dir),
        t(s, dir, "embeddings"), "vec_id", "embedding", 1L, 10)
    }),

    "q196_ivfadc_probe" -> ((s, dir) => {
      // the production IVFADC shape (q81's build/probe split applied to
      // PQ): index persisted ONCE — cluster-partitioned CODES, codebook,
      // centroids — probe partition-prunes and ranks from codes alone,
      // never touching raw vectors; must reproduce q190 exactly
      Similarity.ivfAdcProbeById(s, ivfAdcIndexFor(s, dir),
        t(s, dir, "embeddings"), "vec_id", "embedding", 0L, 10)
    }),

    "q236_ann_delete_probe" -> ((s, dir) => {
      // deletion propagation in the ANN tier: q196's probe against an
      // index where vec_id % 7 = 2 was tombstoned — deleted vectors
      // stop being rankable the moment the delete returns (anti-join
      // before ranking, no rewrite), the top-k refills from survivors,
      // and codebook/centroids stay frozen (trained artifacts; the
      // oracle trains on the FULL corpus and filters candidates only).
      Similarity.ivfAdcProbeById(s, deletedIvfAdcIndexFor(s, dir),
        t(s, dir, "embeddings"), "vec_id", "embedding", 0L, 10)
    }),

    "q210_rerank_join" -> ((s, dir) => {
      // the batch form of q208: every query's exact-cosine top-k over
      // its ADC shortlist in ONE plan — code probe winnows, raw
      // vectors load only for (batch × shortlist) rows, per-query
      // window ranks. Must equal three independent q208-style reranks
      // (oracle splices the single-query chains).
      val emb = t(s, dir, "embeddings")
      Similarity.ivfAdcProbeRerankJoin(s, ivfAdcIndexFor(s, dir), emb,
        emb.filter(col("vec_id") < 3), "vec_id", "embedding", 10,
        shortlist = 100, idName = "vec_id")
    }),

    "q211_dsir_weights" -> ((s, dir) => {
      // DSIR (Xie et al., NeurIPS 2023): per-doc importance
      // log-weight of the raw corpus against the English slice as
      // the target feature distribution — hashed unigram+bigram
      // features (dim=64, the q33 md5 bucket convention), add-1
      // smoothing both sides; one corpus shuffle to (doc, bucket)
      // counts + two dim-bounded broadcast joins.
      text.Curation.dsirLogWeights(t(s, dir, "documents"),
        "doc_id", "text", col("lang") === "en", 64)
    }),

    "q212_dsir_resample" -> ((s, dir) => {
      // DSIR §2.2's resampling step: Gumbel-top-k over the q211
      // log-weights — weighted sampling without replacement done
      // entirely in log space (exp(logW) never materializes), keys
      // from the reproducible q96 hash uniform, top-k is a
      // TakeOrderedAndProject. Oracle splices the q211 chain.
      text.Curation.gumbelTopK(
        text.Curation.dsirLogWeights(t(s, dir, "documents"),
          "doc_id", "text", col("lang") === "en", 64),
        "doc_id", col("log_weight"), 25)
    }),

    "q213_repetition_rules" -> ((s, dir) => {
      // Gopher's within-document repetition family (Rae et al. 2021
      // Table A1, the half q178 left out): dup-line, dup-line-chars,
      // top-bigram and dup-5gram char fractions as exact integer
      // verdicts — ZERO shuffles, every counter a fold over the doc's
      // own sorted line/shingle arrays
      text.Curation.repetitionRules(t(s, dir, "documents"),
        "doc_id", "text").orderBy("doc_id")
    }),

    "q214_lm_perplexity" -> ((s, dir) => {
      // CCNet-style quality scoring (Wenzek et al. 2020): add-1 bigram
      // LM trained on the English slice, per-doc average negative
      // log-likelihood — the conditional-fluency complement to q211's
      // DSIR distribution ratio
      text.Curation.lmPerplexity(t(s, dir, "documents"),
        "doc_id", "text", col("lang") === "en").orderBy("doc_id")
    }),

    "q215_line_dedup" -> ((s, dir) => {
      // C4's boilerplate rule at corpus scope (Raffel et al. 2020
      // §2.2): a line occurring >= 2 times anywhere in the corpus
      // survives only at its canonical first (doc_id, pos); blank
      // lines never participate. One line-keyed shuffle + one
      // reassembly shuffle — no pair space
      text.Curation.corpusLineDedup(t(s, dir, "documents"),
        "doc_id", "text").orderBy("doc_id")
    }),

    "q216_winnow_fingerprints" -> ((s, dir) => {
      // MOSS winnowing (Schleimer et al. 2003): rightmost-minimal
      // 3-gram hash per 4-window — the guaranteed-coverage fingerprint
      // subsample; map-only, selection folds fused into the scan
      text.TextStats.winnowFingerprints(t(s, dir, "documents"),
        "doc_id", "text", k = 3, w = 4)
        .orderBy("doc_id", "pos", "fp")
    }),

    "q217_winnow_overlap" -> ((s, dir) => {
      // MOSS match detection: doc pairs sharing >= 2 winnow
      // fingerprints, scored by containment — ONE fp-keyed self-join
      // guarded by the hottest fingerprint (GuardBounds
      // .HotFingerprintCap); sizes rejoin shuffle_hash, never broadcast
      text.TextStats.winnowOverlapPairs(t(s, dir, "documents"),
        "doc_id", "text", k = 3, w = 4, minShared = 2L)
        .orderBy("doc_a", "doc_b")
    }),

    "q208_adc_rerank" -> ((s, dir) => {
      // IVFADC + exact re-rank (Jégou et al. §III-C refinement): the
      // persisted-index code probe shortlists 100, raw vectors load
      // for the shortlist only, exact cosine ranks — the two-stage
      // shape production ANN deploys. Oracle = the spliced ADC chain
      // LIMIT 100 + the q40 cosine arithmetic over it.
      Similarity.ivfAdcProbeRerankById(s, ivfAdcIndexFor(s, dir),
        t(s, dir, "embeddings"), "vec_id", "embedding", 0L, 10,
        shortlist = 100)
    }),

    "q209_rerank_recall" -> ((s, dir) => {
      // the refit's recall gate: rerank(100)@10 vs the exact scan —
      // reads 1.0 at sf0.01 AND sf0.1 (ADC@10 alone reads 0.5; the
      // nProbe=4 pruning ceiling is 1.0, so the exact refit recovers
      // everything pruning kept).
      val emb = t(s, dir, "embeddings")
      // single-reference plan (round-10 verdict item): the old shape
      // referenced `exact` twice (overlap join + the _ne count), so
      // the full exact cosine scan was derived twice per execution —
      // a LEFT join with a hit flag folds both counts into one agg
      // over ONE exact scan. (An eager checkpoint was measured ~40%
      // slower here — k-row frames don't amortize it; round-8 lesson.)
      val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", 0L, 10)
        .select(col("vec_id"))
      val approx = Similarity.ivfAdcProbeRerankById(s,
          ivfAdcIndexFor(s, dir), emb, "vec_id", "embedding", 0L, 10,
          shortlist = 100)
        .select(col("vec_id"), lit(1L).as("_hit"))
      exact.join(broadcast(approx), Seq("vec_id"), "left")
        .agg(count(lit(1)).as("_ne"),
          coalesce(sum(coalesce(col("_hit"), lit(0L))), lit(0L))
            .as("n_overlap"))
        .select(lit(10).as("k"), col("n_overlap"),
          when(col("_ne") === 0, lit(0.0))
            .otherwise(col("n_overlap") /
              least(lit(10).cast("long"), col("_ne"))).as("recall"))
    }),

    "q206_rivfadc" -> ((s, dir) => {
      // RESIDUAL-encoded IVFADC (Jégou et al. §III, the paper's actual
      // form — q190's documented simplification closed, round-10):
      // vectors PQ-coded on v − centroid(v), one distance table per
      // probed list from the query's per-list residual. Oracle replays
      // residual subtraction, training, and per-list ADC bit-for-bit.
      // Measured finding (q207): on THIS isotropic corpus residuals
      // are larger than the originals (random centroids concentrate
      // nothing), so recall reads 0.3 vs raw 0.5 — the paper's lever
      // needs clustered data; q208's exact re-rank is the lever that
      // works on any geometry (1.0).
      Similarity.ivfRAdcTopK(t(s, dir, "embeddings"), "vec_id",
        "embedding", 0L, 10)
    }),

    "q226_rivfadc_clustered" -> ((s, dir) => {
      // the residual family's POSITIVE gate (round-10 verdict item 4):
      // on the CLUSTERED fixture (mixture of well-separated centers,
      // Similarity.ClusteredFixture — the geometry Jegou SIII assumes,
      // where residuals concentrate near zero) residual IVFADC must
      // beat the raw form at identical budget: measured residual 1.0
      // vs raw 0.8 — the inversion q207 measures on the isotropic
      // tables un-inverts here. Corpus regenerated closed-form in
      // BOTH engines from one constant set (noise scale chosen by a
      // DuckDB sweep over the exact oracle chain; see ClusteredFixture).
      val emb = Similarity.clusteredEmbeddings(s)
      def recallOf(family: String, approx: DataFrame): DataFrame = {
        val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", 0L, 10)
          .select(col("vec_id"))
        exact.join(broadcast(approx.select(col("vec_id"),
            lit(1L).as("_hit"))), Seq("vec_id"), "left")
          .agg(count(lit(1)).as("_ne"),
            coalesce(sum(coalesce(col("_hit"), lit(0L))), lit(0L))
              .as("n_overlap"))
          .select(lit(family).as("family"), lit(10).as("k"),
            col("n_overlap"),
            when(col("_ne") === 0, lit(0.0))
              .otherwise(col("n_overlap") /
                least(lit(10).cast("long"), col("_ne"))).as("recall"))
      }
      recallOf("raw",
          Similarity.ivfAdcTopK(emb, "vec_id", "embedding", 0L, 10))
        .unionByName(recallOf("residual",
          Similarity.ivfRAdcTopK(emb, "vec_id", "embedding", 0L, 10)))
        .orderBy("family")
    }),

    "q207_rivfadc_recall" -> ((s, dir) => {
      // the residual family's recall gate: recall@10 of q206 against
      // the exact cosine scan. Reads 0.3 at sf0.1 / 0.5 at sf0.01 —
      // BELOW the raw family, the documented isotropic-corpus
      // inversion (see q206): this gate exists to keep that comparison
      // measured, not to certify residuals as better here.
      val emb = t(s, dir, "embeddings")
      // single-reference plan (q209 discipline) — doubly important
      // here: the approx side is the honest self-contained residual
      // trainer, so a second exact-scan derivation was pure waste
      val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", 0L, 10)
        .select(col("vec_id"))
      val approx = Similarity.ivfRAdcTopK(emb, "vec_id", "embedding", 0L, 10)
        .select(col("vec_id"), lit(1L).as("_hit"))
      exact.join(broadcast(approx), Seq("vec_id"), "left")
        .agg(count(lit(1)).as("_ne"),
          coalesce(sum(coalesce(col("_hit"), lit(0L))), lit(0L))
            .as("n_overlap"))
        .select(lit(10).as("k"), col("n_overlap"),
          when(col("_ne") === 0, lit(0.0))
            .otherwise(col("n_overlap") /
              least(lit(10).cast("long"), col("_ne"))).as("recall"))
    }),

    "q225_bpe_train" -> ((s, dir) => {
      // BPE TRAINING oracle-gated at a bounded merge count (round-10
      // verdict item 3 — the family's last spec-only half closed):
      // 5 merges learned from the whitespace-word frequency table,
      // each round one explode+aggregate with only the winning pair
      // reaching the driver. The oracle unrolls the 5 rounds as
      // (pair-count agg → argmax with the engine's exact tiebreak →
      // recursive leftmost-replace with the pattern read from the
      // argmax row); see bpeTrainOracleSql for the left ≠ right
      // fold-equivalence caveat, verified on this corpus.
      text.Curation.trainBpe(t(s, dir, "documents"), "text", nMerges = 5)
        .orderBy("rank")
    }),

    "q205_bpe_apply" -> ((s, dir) => {
      // BPE SEGMENTATION with a fixed learned-artifact merge list (the
      // tokenizer-apply path, round-10: the last operator family with
      // zero oracle rows): every word replays the merges in rank order
      // as codegen'd left-to-right folds. The oracle replays each merge
      // as a recursive leftmost-replace fixpoint over a delimited
      // symbol string — provably equal to the single fold pass because
      // every rule has left ≠ right (no self-overlap, so a pass merges
      // every occurrence and merging never creates a new one); SQL is
      // GENERATED from the same FixedBpeMerges literal, so engine and
      // oracle cannot desync. trainBpe (the LEARNING half) remains
      // spec-gated — its per-round argmax is genuinely iterative.
      text.Curation.applyBpe(
          t(s, dir, "documents").select(col("doc_id"), col("text")),
          "text", FixedBpeMerges)
        .select(col("doc_id"), col("n_bpe_tokens"),
          concat_ws(" ", col("bpe_tokens")).as("bpe_text"))
        .orderBy("doc_id")
    }),

    "q234_quantile_drift" -> ((s, dir) => {
      // the drift family's DISTRIBUTION-SHAPE axis (q147 buckets, q148
      // vocab, q149 centroids): the event_id%10==0 slice's sketch
      // quantiles against the standing corpus's, per-prob EXACT
      // decimal shift — the batch twin quantileDriftSink runs verbatim
      // per micro-batch
      val ev = t(s, dir, "events")
      ops.Stats.quantileDrift(
          ev.filter(col("event_id") % 10 === 0),
          ev.filter(col("event_id") % 10 =!= 0),
          "event_type", "event_id", col("value"), k = 256)
        .withColumnRenamed("grp", "event_type")
        .orderBy("event_type")
    }),

    "q231_quantile_sketch" -> ((s, dir) => {
      // the quantile sketch's PRODUCTION self-deriving sweep: per-type
      // tick-value quantiles off the deterministic bottom-256 row
      // sample (md5 of event_id — uniform over ROWS) — one window +
      // a k-row-per-group aggregate; exact-percentile distinct-value
      // state never appears (the r11 missing-#1 axis)
      ops.Stats.quantileSketch(t(s, dir, "events"),
        "event_type", "event_id", col("value"), k = 256)
        .withColumnRenamed("grp", "event_type")
        .orderBy("event_type")
    }),

    "q232_quantile_audit" -> ((s, dir) => {
      // the q224-style audit row: sketch quantiles NEXT TO the exact
      // interpolated percentiles of the full group plus the EXACT
      // decimal |est − exact| — grades k=256 on this tick distribution
      // before the sweep replaces exact percentile at scale
      ops.Stats.quantileSketchAudit(t(s, dir, "events"),
        "event_type", "event_id", col("value"), k = 256)
        .withColumnRenamed("grp", "event_type")
        .orderBy("event_type")
    }),

    "q233_quantile_from_sketch" -> ((s, dir) => {
      // the lifecycle READ path: estimates from the PERSISTED ≤ k-row
      // sample alone — no corpus scan; the estimate frame is the q231
      // one fed the stored sample (its bottom-k window is a no-op
      // there), so the q231 oracle applies UNCHANGED: recomputing the
      // sketch from raw events must equal reading the sample file
      // (indexed ≡ inline, the q160-q162/q229 discipline)
      ops.Stats.quantileFromSketch(s, quantileSketchFor(s, dir))
        .withColumnRenamed("grp", "event_type")
        .orderBy("event_type")
    }),

    "q230_cms_lookup" -> ((s, dir) => {
      // the counting sketch's production READ path: point estimates
      // for a fixed watch list of grams from the PERSISTED
      // depth×width cell table — min over rows, absent cells read 0,
      // no corpus scan. The oracle recomputes the sketch from raw
      // documents and looks up the SAME generated probe list — the
      // persisted cells must equal a recompute (indexed ≡ inline).
      text.TextStats.cmsLookupFromSketch(s, cmsSketchFor(s, dir),
        text.TextStats.CmsProbeGrams).orderBy("gram")
    }),

    "q229_kmv_from_samples" -> ((s, dir) => {
      // the overlap family's production READ path: every slice-pair
      // union/intersection estimate from the PERSISTED k-row-per-slice
      // bottom-k samples — no corpus scan; the estimate frame is the
      // q227 one fed the samples (its bottom-k window is a no-op
      // there), so the q227 oracle applies UNCHANGED: recomputing the
      // sketch from raw documents must equal reading the sample file.
      text.TextStats.kmvOverlapFromSamples(s, kmvSamplesFor(s, dir))
        .orderBy("slice_a", "slice_b")
    }),

    "q228_hll_from_registers" -> ((s, dir) => {
      // the sketch family's production READ path: the global distinct-
      // trigram estimate from the PERSISTED per-source register files
      // alone — per-shard MAX merge on read (the law-proven combine),
      // full 1024-bucket grid, the q221 estimate arithmetic — no
      // corpus scan. Oracle = the q221 chain minus its exact columns,
      // UNCHANGED in the estimate arithmetic: recomputing from raw
      // documents must equal reading the register file (the indexed ≡
      // inline discipline, q160-q162 precedent).
      text.TextStats.hllEstimateFromRegisters(s, hllRegistersFor(s, dir))
    }),

    "q227_kmv_sweep" -> ((s, dir) => {
      // the PRODUCTION slice-overlap sweep: KMV estimates alone — the
      // q224 audit minus its exact inverted-index join (the audit's
      // dominant cost); same estimate frame by construction, so q224
      // certifies THESE numbers on its cadence
      text.TextStats.kmvOverlap(t(s, dir, "documents"),
        "source", "text", n = 3, k = 64)
        .orderBy("slice_a", "slice_b")
    }),

    "q224_kmv_overlap" -> ((s, dir) => {
      // KMV/theta bottom-64 slice-overlap audit: union and
      // INTERSECTION estimates (the set operation HLL cannot do) next
      // to exact ground truth — one (slice, hash) shuffle, slice²
      // pair grid broadcast onto 64-row samples, corpusOverlap guard
      text.TextStats.kmvOverlapAudit(t(s, dir, "documents"),
        "source", "text", n = 3, k = 64)
        .orderBy("slice_a", "slice_b")
    }),

    "q223_winnow_append" -> ((s, dir) => {
      // batch-proportional winnow-overlap APPEND: the pairs a full
      // recompute would add when the doc_id%10==0 batch lands on the
      // standing corpus — fps(batch) ⋈ fps(all), never corpus²; the
      // oracle is the q217 chain restricted to >= 1 batch side
      val docs = t(s, dir, "documents")
      text.TextStats.appendWinnowOverlapPairs(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0),
        "doc_id", "text", k = 3, w = 4, minShared = 2L)
        .orderBy("doc_a", "doc_b")
    }),

    "q222_hll_by_source" -> ((s, dir) => {
      // per-slice HLL register files off the SAME register math as
      // q221 — 8 KB per shard, merged by per-bucket MAX (law-proven
      // shard-merge ≡ global), each slice graded against its exact
      // distinct trigram count
      text.TextStats.hllBySource(t(s, dir, "documents"),
        "source", "text", n = 3, p = 10).orderBy("source")
    }),

    "q221_hll_audit" -> ((s, dir) => {
      // HLL vocabulary-size audit: 1024 registers (max leading-zero
      // rank per md5 bucket), the exact-integer register sum, and the
      // raw estimate next to exact distinct trigrams — fixed-memory
      // distinct counting, measured before it replaces a shuffle
      text.TextStats.hllDistinctAudit(t(s, dir, "documents"),
        "text", n = 3, p = 10)
    }),

    "q220_cms_heavyhitters" -> ((s, dir) => {
      // count-min-sketch audit: exact top-20 trigram counts next to
      // their 4×1024 CMS estimates — (depth·width)-bounded sketch
      // state with map-side combine, estimates join the broadcast
      // sketch; md5 double hashing replays bit-for-bit in the oracle
      text.TextStats.cmsHeavyHitters(t(s, dir, "documents"),
        "text", n = 3).orderBy(col("n_exact").desc, col("gram").asc)
    }),

    "q219_sq8_audit" -> ((s, dir) => {
      // SQ8 scalar-quantization audit: values fixed to the 1e-6 grid
      // (exact IEEE floor), per-dimension min/max broadcast back,
      // 0..255 linear codes + reconstruction error on the micro grid —
      // one explode, one d-bounded agg, one vec-keyed re-aggregation
      vector.Similarity.sq8Audit(t(s, dir, "embeddings"),
        "vec_id", "embedding").orderBy("vec_id")
    }),

    "q218_bpe_fertility" -> ((s, dir) => {
      // tokenizer-fit audit of the SAME fixed merge table: per-source
      // fertility (BPE tokens per word) and whole-word merge rate —
      // map-only folds into one slice-sized aggregate; oracle rides
      // the shared bpeWordCte chain, generated from FixedBpeMerges
      text.Curation.bpeFertility(t(s, dir, "documents"),
        "source", "text", FixedBpeMerges).orderBy("source")
    }),

    "q204_semantic_clusters" -> ((s, dir) => {
      // model-free semantic dup CLUSTERS: the q200 hashed-cosine pairs
      // walked into transitive components (the q63 discipline on the
      // embedding-pair graph) — (doc, cluster, keep) is the verdict a
      // pipeline consumes; pairs alone are not actionable
      val docs = t(s, dir, "documents")
      val pairs = Similarity.embedNearDup(
          TextStats.hashedTfidfEmbed(docs, "doc_id", "text", 64),
          "doc_id", "embedding", 0.95)
        .select(col("id_a").as("src"), col("id_b").as("dst"))
      val comp = graft.text.Clusters.connectedComponents(pairs, "src", "dst")
      docs.select(col("doc_id").cast("long").as("doc_id"))
        .join(comp.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("cluster_id"))
        .withColumn("is_canonical", col("doc_id") === col("cluster_id"))
        .orderBy("doc_id")
    }),

    "q203_embedding_covariance" -> ((s, dir) => {
      // the d²-sized second-moment statistic PCA whitening consumes:
      // upper-triangle dimension-pair covariance, exact-decimal sums,
      // unbiased denominator — pcaWhiten's eigendecomposition (Jacobi,
      // driver-side, corpus-independent) is spec-gated on top of this
      Similarity.embeddingCovariance(t(s, dir, "embeddings"),
          "vec_id", "embedding")
        .orderBy("i", "j")
    }),

    "q202_balanced_sample" -> ((s, dir) => {
      // diversity sampling: cluster the hash-embedded docs (stride
      // centroids + broadcast argmax) and keep a deterministic 5-doc
      // quota per cluster — even topic coverage instead of whatever
      // dominates the crawl; rank via the q96 hash mixer
      Similarity.clusterBalancedSample(
          TextStats.hashedTfidfEmbed(t(s, dir, "documents"),
            "doc_id", "text", 64),
          "doc_id", "embedding", 4, 5)
        .orderBy("cluster", "sample_rank")
    }),

    "q201_pq_reconstruction" -> ((s, dir) => {
      // storage-loss audit of the persisted IVFADC index: per-vector
      // MSE between source subvectors and what the stored codes decode
      // to — the gate that catches corrupted codes or a codebook/codes
      // desync; oracle replays the training and reconstruction in SQL
      Similarity.pqReconstructionError(s, ivfAdcIndexFor(s, dir),
          t(s, dir, "embeddings"), "vec_id", "embedding")
        .orderBy("vec_id").limit(50)
    }),

    "q197_ann_join" -> ((s, dir) => {
      // similarity search as a JOIN: every query vector's top-k corpus
      // neighbours from the persisted IVFADC index in ONE distributed
      // plan (per-query probed lists, union-pruned codes scan) — must
      // equal three independent q196 probes
      Similarity.ivfAdcProbeJoin(s, ivfAdcIndexFor(s, dir),
        t(s, dir, "embeddings").filter(col("vec_id") < 3),
        "vec_id", "embedding", 10, idName = "vec_id")
    }),

    "q187_langid_eval" -> ((s, dir) => {
      // the corpus where language-ID accuracy MEANS something: the
      // synthetic documents' lang labels are decorrelated from their
      // (English-token) text by construction (q179 proved it), so the
      // detector is gated on a constructed fixture of real sentences
      // with known languages — 15/15 against a 0.2 max-class prior
      // (LangIdSpec pins the same numbers engine-side)
      val fix = s.createDataFrame(TextStats.LangFixture)
        .toDF("fix_id", "lang", "text")
      TextStats.langIdNgram(fix, "text")
        .groupBy(col("lang").as("true_lang"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("pred_lang") === col("lang"), 1L).otherwise(0L))
            .as("n_correct"))
        .withColumn("accuracy", col("n_correct") / col("n"))
        .orderBy("true_lang")
    }),

    "q35_quality_score" -> ((s, dir) => {
      TextStats.qualityFeatures(t(s, dir, "documents"), "text")
        .select("doc_id", "n_chars", "n_tokens", "n_stopwords",
          "mean_token_len", "stopword_ratio")
        .orderBy("doc_id")
    }),

    "q36_token_totals" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("n_tokens", TextStats.tokenCount(col("text")).cast("long"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
        .orderBy("source")
    }),

    "q37_fingerprint" -> ((s, dir) => {
      // rolling-hash fingerprint: the hash value is engine-specific, so
      // the query presents the fingerprint's CONTRACT, which is oracle-
      // checkable — identical texts agree on their fingerprint
      // (dup_consistent) and distinct texts never collide on this corpus
      // (collision_free). Window counts instead of agg+join so the
      // fingerprint projection is computed exactly once below both
      import org.apache.spark.sql.expressions.Window
      t(s, dir, "documents")
        .select(col("doc_id"), md5(col("text")).as("_th"),
          TextStats.fingerprint(col("text")).as("_fp"))
        .withColumn("_fps",
          size(collect_set(col("_fp")).over(Window.partitionBy("_th"))))
        .withColumn("_ths",
          size(collect_set(col("_th")).over(Window.partitionBy("_fp"))))
        .select(col("doc_id"),
          (col("_fps") === 1).as("dup_consistent"),
          (col("_ths") === 1).as("collision_free"))
        .orderBy("doc_id")
    }),

    "q38_embed_neardup" -> ((s, dir) => {
      Similarity.embedNearDup(t(s, dir, "embeddings"), "vec_id", "embedding", 0.4)
        .orderBy("id_a", "id_b")
    }),

    "q39_embed_neardup_lsh" -> ((s, dir) => {
      // oracle-gated (q32/q41 pattern) with SCALE-PARAMETRIC banding
      // (round 13): nBands = -1 derives the band count from the corpus
      // size via lshBandsForRecall's worst-case collision bound. At
      // THIS threshold (0.4) the derived banding cannot prune — the
      // closed-form random-collision rate reads ~0.99, so the
      // operator's pruning-power switch routes to the exact verify
      // (identical output, recall structurally total, 2.7 s vs 6.3 s
      // warm at sf0.1 — see embedNearDupLsh's scaladoc for why no
      // (bits, bands) can prune at t = 0.4); the banding path runs at
      // high thresholds and stays law-tested (RetrievalSpec-adjacent
      // banding law in VectorStreamSpec)
      Similarity.embedNearDupLsh(t(s, dir, "embeddings"), "vec_id", "embedding", 0.4,
          nBands = -1)
        .orderBy("id_a", "id_b")
    }),

    "q242_hybrid_rrf" -> ((s, dir) => {
      // hybrid first-stage retrieval: the q168 BM25 probe fused with
      // the q40 dense query-by-example via reciprocal-rank fusion —
      // each side bounded to its top-10 by TakeOrderedAndProject
      // (perList = 10 so the oracle can splice the q40 block, whose
      // exact-twin SQL is itself a LIMIT 10) before the driver-scale
      // fusion join; one-sided ids (a doc the lexical side found that
      // carries no embedding, and vice versa) keep their single-list
      // score, which at sf0.1 (5,000 docs vs 2,000 vectors) is the
      // normal case the operator must handle
      graft.ops.Retrieval.hybridTopK(
        t(s, dir, "documents"), t(s, dir, "embeddings"),
        "doc_id", "text", "vec_id", "embedding",
        Seq("spark", "vector", "merge"), queryVecId = 0L, perList = 10)
    }),

    "q243_filtered_ann" -> ((s, dir) => {
      // filtered vector search: metadata predicate (label = 1) as an
      // id frame, adaptive strategy switch — SELECTIVE predicates
      // brute-force the semi-joined candidate set exactly (this
      // corpus: ≤10% of ≤2k vectors, so the gate runs that path and
      // the oracle is exact, corpus-unconditional); BROAD predicates
      // take the partition-pruned ivfProbeWhere over the persisted
      // q81 index, whose width/recall trade is law-tested in
      // RetrievalSpec (a 10%-selectivity filter on this isotropic
      // corpus needs nProbe = nCentroids for total recall at sf0.01 —
      // DevFilteredRecall — which is exactly why the selective case
      // must not probe)
      val emb = t(s, dir, "embeddings")
      Similarity.filteredTopK(s, ivfIndexFor(s, dir), emb,
        "vec_id", "embedding",
        emb.filter(col("label") === 1).select(col("vec_id").as("id")),
        0L, 10)
    }),

    "q244_retrieval_eval" -> ((s, dir) => {
      // graded retrieval metrics (precision@k, MRR, DCG/nDCG@k) of the
      // q40 dense ranking against label relevance — rank position
      // matters here, unlike the set-overlap recall gates (q175/q191);
      // IDCG runs to min(R, k) = k on every corpus (R ≥ 42 per label)
      val emb = t(s, dir, "embeddings")
      val qLabel = emb.filter(col("vec_id") === 0L)
        .select(col("label")).head().getInt(0)
      val rel = emb.filter(col("label") === qLabel && col("vec_id") =!= 0L)
        .select(col("vec_id").as("id"))
      graft.ops.Retrieval.retrievalEval(
        Similarity.cosineTopK(emb, "vec_id", "embedding", 0L, 10),
        "vec_id", "cos_sim", rel, rel.count(), 10)
    }),

    "q246_bm25_probe" -> ((s, dir) => {
      // the production lexical-retrieval shape: BM25 index built ONCE
      // (term-bucket-partitioned tf, SUM-mergeable df/totals partials),
      // probe partition-prunes to the query terms' buckets and pushes
      // the term filter into the scan — same oracle as q168 verbatim
      // (shared bm25Score: the split provably cannot drift from the
      // inline scorer), plan pinned in PlanSpec
      graft.text.TextStats.bm25Probe(s, bm25IndexFor(s, dir),
          Seq("spark", "vector", "merge"))
        .orderBy("doc_id")
    }),

    "q247_hybrid_probe" -> ((s, dir) => {
      // the production hybrid stack: q242's fusion where BOTH lists
      // come from persisted indexes — the bucket-pruned BM25 probe and
      // the partition-pruned IVF probe; equals the inline fusion on
      // corpora where the IVF probe's recall is total (the q81
      // premise, so the oracle is q242's verbatim and the gate is
      // measuredOn-pinned like q81)
      graft.ops.Retrieval.hybridProbeTopK(s, bm25IndexFor(s, dir),
        ivfIndexFor(s, dir), t(s, dir, "embeddings"), "vec_id", "embedding",
        Seq("spark", "vector", "merge"), queryVecId = 0L)
    }),

    "q252_bm25_probe_join" -> ((s, dir) => {
      // lexical retrieval as the production many-query shape: THREE
      // queries against the persisted q246 index in ONE plan — one
      // bucket-pruned tf scan over the union of the batch's terms,
      // broadcast-joined to the (query_id, term) pairs, scored through
      // the SAME pinned bm25 arithmetic grouped by (query_id, doc_id).
      // Query 0 repeats q246's exact terms, so its block of rows must
      // equal the single-query probe verbatim (the law RetrievalSpec
      // also pins); the oracle extends q168's SQL with a VALUES
      // query-term table
      import s.implicits._
      val qs = Seq((0L, Seq("spark", "vector", "merge")),
          (1L, Seq("hash", "join", "stream")),
          (2L, Seq("window", "sort")))
        .toDF("query_id", "terms")
      graft.text.TextStats.bm25ProbeJoin(s, bm25IndexFor(s, dir), qs)
        .orderBy("query_id", "doc_id")
    }),

    "q253_hybrid_probe_join" -> ((s, dir) => {
      // the streaming-serving shape of q247: a BATCH of three hybrid
      // queries fused in one plan — multi-query BM25 probe + multi-
      // query IVF probe + per-query RRF windows; the oracle splices
      // three per-query hybrid blocks over a VALUES query table. The
      // dense side runs at FULL probe width here (the q243 broad-full
      // discipline: the full-width probe ≡ the exact scan
      // STRUCTURALLY, so the oracle is corpus-unconditional) because
      // partial-width recall on the isotropic testdata is total only
      // for the measured q81 query — measured: at nProbe=4, queries
      // 1/2 read 5-9/10 overlap, and no id in 0..39 but 0 is total on
      // all three corpora. The production pruned path (nProbe=4) is
      // law-certified against the per-query probes in RetrievalSpec
      // and stays the serving default of hybridProbeSink.
      import s.implicits._
      val qs = Seq((0L, Seq("spark", "vector", "merge")),
          (1L, Seq("hash", "join", "stream")),
          (2L, Seq("window", "sort")))
        .toDF("query_id", "terms")
      graft.ops.Retrieval.hybridProbeJoin(s, bm25IndexFor(s, dir),
          ivfIndexFor(s, dir), t(s, dir, "embeddings"), "vec_id",
          "embedding", qs, nProbe = graft.ops.GuardBounds.DefaultIvfCentroids)
        .orderBy(col("query_id"), col("rrf").desc, col("id"))
    }),

    "q245_mmr_rerank" -> ((s, dir) => {
      // diversity rerank between retrieval and the context window:
      // greedy MMR over the bounded top-20 candidate list (λ = 0.7);
      // the sequential recurrence runs driver-side over ≤128
      // candidates BY CONTRACT (loud cap), while the candidate scan,
      // pair-sim matrix, and top-N cut stay distributed — the oracle
      // unrolls the 5 selection steps (the q225 BPE-train precedent)
      graft.ops.Retrieval.mmrRerank(t(s, dir, "embeddings"),
        "vec_id", "embedding", 0L, k = 5, nCandidates = 20, lambda = 0.7)
    }),
  )
}
