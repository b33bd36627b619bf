package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ops.{Clean, Guards, Ingest, Joins, Risk, Stats, Windows}
import graft.text.{Dedup, TextStats}
import graft.text.Curation.FixedBpeMerges
import graft.vector.Similarity
import graft.Fixtures._

/** Registry shard: Multimodal plumbing, engine/table operations, remaining composites.
  *
  * Split VERBATIM from SparkEntry's single 3,200-line map (round 13,
  * the OraclesA/B/C precedent): entries and their comments are
  * unchanged; [[SparkEntry.queries]] concatenates the four shards and
  * asserts key-disjointness, so the driver contract (keys, closures,
  * oracle pairing) is byte-identical to the pre-split registry.
  * 37 entries.
  */
private[graft] object RegistryD {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ── Multimodal plumbing (north star; stub codec → rows-only) ────────
    "q43_media_features" -> ((s, dir) => {
      // REAL image decode, oracle-gated end-to-end: one PNG per doc_id is
      // encoded executor-side with id-derived dimensions, and
      // extractFeatures reads the true dimensions back out of the PNG
      // headers via javax.imageio — the hash gate proves the decode is
      // real, since the dims are SQL-expressible from the ids alone
      import graft.multimodal.Media
      val media = Media.imageTable(s, t(s, dir, "documents"), "doc_id")
      Media.extractFeatures(s, media).toDF()
        .select(col("media_id"), col("format"), col("width"), col("height"),
          col("decoded"))
        .orderBy("media_id")
    }),

    "q44_approx_distinct" -> ((s, dir) => {
      // HLL sketch with an oracle-checkable presentation: the estimate
      // itself is engine-specific, so the query emits the exact distinct
      // count alongside a boolean asserting the sketch landed within 5×
      // its configured 2% rsd — the oracle expects TRUE, making sketch
      // accuracy itself part of the correctness gate
      t(s, dir, "events").groupBy(col("event_type"))
        .agg(count_distinct(col("user_id")).as("exact_users"),
          approx_count_distinct(col("user_id"), 0.02).as("_approx"))
        .select(col("event_type"), col("exact_users"),
          // all-NULL groups have 0 exact distinct (ANSI division would
          // throw) — both counts agree at 0, so the sketch is trivially ok
          when(col("exact_users") === 0, lit(true))
            .otherwise(abs(col("_approx") - col("exact_users")).cast("double") /
              col("exact_users") <= 0.1).as("sketch_ok"))
        .orderBy("event_type")
    }),

    "q46_percentiles" -> ((s, dir) => {
      // exact percentile below the per-key distinct-value guard; past
      // it the cut derivation degrades onto the bottom-k row-sample
      // quantiles (r12 — q46 was the second exact-percentile site the
      // r11 verdict named whose state grows on continuous ticks). At
      // gate scale the guard stays under, so the exact quantile_cont
      // oracle applies unchanged — the q119 wiring pattern
      ops.Stats.percentilesGuarded(t(s, dir, "events"), "event_type",
          col("value"), Seq(0.25, 0.5, 0.75), idCol = Some("event_id"))
        .orderBy("event_type")
    }),

    "q47_top_words" -> ((s, dir) => {
      // generator/explode path: flatten docs to words, corpus frequency.
      // native single-pass tokenizer (TokensExpr — byte-identical to the
      // split(trim(regexp_replace)) chain, minus two regex passes) +
      // explode stay inside whole-stage codegen; the groupBy is a
      // partial (map-side) + final hash agg on the word key
      t(s, dir, "documents")
        .select(explode(TextStats.tokens(lower(col("text")))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n"))
        .filter(col("n") >= 20)
        .orderBy("word")
    }),

    "q48_window_nav" -> ((s, dir) => {
      // navigation-function battery: first/last/nth over an explicit full
      // frame + rank-family percent_rank/cume_dist, deterministic order
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "events").select(
        col("event_id"), col("user_id"),
        first(col("value")).over(wf).as("first_val"),
        last(col("value")).over(wf).as("last_val"),
        nth_value(col("value"), 2).over(wf).as("second_val"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"))
        .orderBy("event_id")
    }),

    "q49_moment_stats" -> ((s, dir) => {
      // variance/stddev from exact decimal power sums (order-independent,
      // so distributed partial aggregation is bit-reproducible — built-in
      // stddev_samp streams doubles and is summation-order-dependent)
      val v = col("value").cast(DecimalType(18, 6))
      val s1d = col("s1").cast("double")
      val varExpr = (col("s2").cast("double") - s1d * s1d / col("n")) / (col("n") - 1)
      t(s, dir, "events").filter(col("value").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(v).as("s1"),
          sum((v * v).cast(DecimalType(38, 12))).as("s2"))
        .select(col("event_type"), col("n"),
          round(s1d / col("n"), 6).as("mean_val"),
          round(varExpr, 6).as("var_samp"),
          round(sqrt(varExpr), 6).as("stddev_samp"))
        .orderBy("event_type")
    }),

    "q50_array_funcs" -> ((s, dir) => {
      // array-function battery over the embedding column (all codegen'd
      // built-ins — no HOF lambdas in the hot path)
      val e = col("embedding")
      t(s, dir, "embeddings").select(
        col("vec_id"),
        size(e).cast("long").as("n_dims"),
        round(element_at(e, 1).cast("double"), 6).as("e1"),
        round(array_min(e).cast("double"), 6).as("min_e"),
        round(array_max(e).cast("double"), 6).as("max_e"),
        array_position(e, array_max(e)).cast("long").as("argmax_pos"),
        round(element_at(e, 1).cast("double") + element_at(e, 2).cast("double")
          + element_at(e, 3).cast("double"), 6).as("head3_sum"))
        .orderBy("vec_id")
    }),

    "q51_salted_join" -> ((s, dir) => {
      // skew-safe salted equi join (SURVEY §2.4 extension): oracle is the
      // PLAIN join — salting must be row-for-row invisible in the result
      val li = t(s, dir, "lineitem")
      val p = t(s, dir, "part").withColumnRenamed("p_partkey", "l_partkey")
      Joins.saltedJoin(li, p, Seq("l_partkey"), salts = 8)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double"), 2).as("total_price"))
        .orderBy("p_brand")
    }),

    "q52_decile_cutpoints" -> ((s, dir) => {
      // the scale path q45's comment promises: one approx-quantile sketch
      // pass → literal cut points → codegen'd map-side bucket expression.
      // No global sort, no single reducer. Cut points carry sketch error,
      // so the oracle-checkable surface is the invariant projection —
      // every bucket non-empty with lo <= hi, buckets ordered and
      // non-overlapping, ten buckets covering exactly the non-null rows;
      // exact per-bucket populations are pinned in OpsSpec
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, dir, "events")
      val stats = Stats.bucketStats(ev, "value", 10)
      val tot = ev.filter(col("value").isNotNull).agg(count(lit(1)).as("_tot"))
      val wOrd = Window.orderBy("bucket")
      val wAll = wOrd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      stats.crossJoin(broadcast(tot))
        .select(col("bucket"),
          (col("n") > 0 && col("lo") <= col("hi")).as("range_ok"),
          coalesce(lag(col("hi"), 1).over(wOrd) <= col("lo"), lit(true)).as("ordered_ok"),
          (sum(col("n")).over(wAll) === col("_tot")).as("covers_all"))
        .orderBy("bucket")
    }),

    "q53_train_split" -> ((s, dir) => {
      // deterministic train/val/test assignment by id-modulo — stable
      // across runs, partitionings, and cluster sizes (the reproducible-
      // split requirement of a training-data pipeline); pure map-side
      val bucket = pmod(col("doc_id"), lit(100))
      t(s, dir, "documents")
        .withColumn("split",
          when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
        .groupBy("source", "split")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
        .orderBy("source", "split")
    }),

    "q54_correlation" -> ((s, dir) => {
      // Pearson correlation from exact decimal power sums (like q49:
      // order-independent partials → bit-reproducible distributed agg;
      // built-in corr() streams doubles and is summation-order-dependent)
      val x = col("value").cast(DecimalType(18, 6))
      val y = get_json_object(col("props"), "$.k").cast("long").cast(DecimalType(18, 6))
      def d(c: String) = col(c).cast("double")
      val cov = col("n") * d("sxy") - d("sx") * d("sy")
      val vx = col("n") * d("sxx") - d("sx") * d("sx")
      val vy = col("n") * d("syy") - d("sy") * d("sy")
      t(s, dir, "events")
        .filter(col("value").isNotNull &&
          get_json_object(col("props"), "$.k").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(x).as("sx"), sum(y).as("sy"),
          sum((x * y).cast(DecimalType(38, 12))).as("sxy"),
          sum((x * x).cast(DecimalType(38, 12))).as("sxx"),
          sum((y * y).cast(DecimalType(38, 12))).as("syy"))
        .select(col("event_type"), col("n"),
          round(cov / (sqrt(vx) * sqrt(vy)), 6).as("corr_vk"))
        .orderBy("event_type")
    }),

    "q55_range_frame" -> ((s, dir) => {
      // RANGE-frame window: trailing 7-day (inclusive) revenue per order
      // date — value-based frame bounds, vs q16's row-count frame
      import org.apache.spark.sql.expressions.Window
      // exact decimal day totals feed the range frame; the final SELECT
      // presents rounded doubles (engine-independent canonical form)
      val daily = t(s, dir, "orders")
        .withColumn("d", to_date(col("o_orderdate")))
        .groupBy("d")
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DecimalType(38, 2)).as("day_total_dec"))
        .withColumn("d_epoch", datediff(col("d"), lit(java.sql.Date.valueOf("1970-01-01"))).cast("long"))
      val w = Window.orderBy(col("d_epoch")).rangeBetween(-6, 0)
      daily.select(col("d"),
        round(col("day_total_dec").cast("double"), 2).as("day_total"),
        round(sum(col("day_total_dec")).over(w).cast("double"), 2).as("trailing_7d"))
        .orderBy("d")
    }),

    "q56_union_evolve" -> ((s, dir) => {
      // schema-evolving union: unionByName with allowMissingColumns —
      // the batch-accumulation path when a source adds a column
      val ev = t(s, dir, "events")
      val withVal = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "value")
      val without = ev.filter(col("event_type") === "signup")
        .select("event_id", "user_id") // no value column
      withVal.unionByName(without, allowMissingColumns = true)
        .orderBy("event_id")
    }),

    "q57_map_funcs" -> ((s, dir) => {
      // JSON → MapType + map-function battery (from_json parses once;
      // q18's get_json_object re-parses per field — this is the shape for
      // many-key payloads)
      import org.apache.spark.sql.types.{MapType, StringType}
      val m = from_json(col("props"), MapType(StringType, StringType))
      t(s, dir, "events").select(
        col("event_id"),
        size(map_keys(m)).cast("long").as("n_keys"),
        array_join(sort_array(map_keys(m)), ",").as("keys_csv"),
        element_at(m, "k").cast("long").as("k_val"))
        .orderBy("event_id")
    }),

    "q58_hof_lambdas" -> ((s, dir) => {
      // higher-order-function lambdas over the embedding column (filter/
      // exists/transform). NOTE: HOF lambdas are interpreted, not
      // codegen'd — fine for a feature query like this; hot kernels use
      // the native expressions in graft.functions instead (ArrayDot)
      val e = transform(col("embedding"), _.cast("double"))
      t(s, dir, "embeddings").select(
        col("vec_id"),
        size(filter(e, _ > 0d)).cast("long").as("n_pos"),
        exists(e, _ > 1.5d).as("any_big"),
        round(element_at(sort_array(e, asc = false), 1), 6).as("max_e"))
        .orderBy("vec_id")
    }),

    "q59_ohlc_bars" -> ((s, dir) => {
      // canonical market-data tick→bar resample: per-(type, day) OHLC
      Stats.ohlcBars(t(s, dir, "events").filter(col("value").isNotNull),
        Seq("event_type"), to_date(col("ts")),
        Seq(col("ts"), col("event_id")), "value")
        .orderBy("event_type", "bar")
    }),

    "q60_token_packing" -> ((s, dir) => {
      // training-batch sequence packing STATS: the shared packing
      // implementation minus the concatenated artifact (q78 emits it) —
      // one per-source window shuffle, batch agg reuses its partitioning
      text.Curation.packedSequences(t(s, dir, "documents"),
          "doc_id", "text", "source", 4096L)
        .select("source", "batch_id", "n_docs", "batch_tokens")
        .orderBy("source", "batch_id")
    }),

    "q61_quality_audit" -> ((s, dir) => {
      // inter-stage data-quality expectations (engine.Quality): null rate,
      // key uniqueness, referential integrity, row predicates — one audit
      // row per check, violation counts computed executor-side
      import s.implicits._
      import graft.engine.Quality
      val ev = t(s, dir, "events")
      // both events checks share one scan + one aggregate (fusedAudit);
      // the referential checks need their second table, so they stay
      // separate anti-join jobs
      val evChecks = Quality.fusedAudit(ev, Seq(
        "events_user_ts_unique" -> Quality.duplicateCount(Seq("user_id", "ts")),
        "events_value_nulls" -> Quality.nullCount("value")))
      val docChecks = Quality.fusedAudit(t(s, dir, "documents"), Seq(
        "docs_nchars_match" -> Quality.failCount(col("n_chars") === length(col("text")))))
      (docChecks ++ evChecks ++ Seq(
        ("lineitem_order_orphans", Quality.referentialViolations(
          t(s, dir, "lineitem"), "l_orderkey", t(s, dir, "orders"), "o_orderkey")),
        ("orders_cust_orphans", Quality.referentialViolations(
          t(s, dir, "orders"), "o_custkey", t(s, dir, "customer"), "c_custkey"))))
        .toDF("check_name", "violations").orderBy("check_name")
    }),

    "q62_merge_upsert" -> ((s, dir) => {
      // K3 MERGE rewrite (whenMatchedUpdateAll + whenNotMatchedInsertAll
      // via anti-join + union) proven against the declarative SQL form:
      // target = events off the 3-grid, source = even events "updated"
      val ev = t(s, dir, "events")
      val target = ev.filter(col("event_id") % 3 =!= 0)
        .select("event_id", "user_id", "value")
      val source = ev.filter(col("event_id") % 2 === 0)
        .select(col("event_id"), col("user_id"),
          (col("value") + 1000.0).as("value"))
      graft.engine.Upsert.merge(target, source, Seq("event_id"))
        .orderBy("event_id")
    }),

    "q63_dup_clusters" -> ((s, dir) => {
      // transitive near-dup clustering: exact-dup ∪ jaccard pair edges →
      // connected components (large-star/small-star, O(log n) rounds),
      // cluster id = min doc id, is_canonical = the one doc a dedup keeps
      text.Clusters.dupClusters(t(s, dir, "documents"), "doc_id", "text", 5, 0.5)
        .orderBy("doc_id")
    }),

    "q64_token_chunks" -> ((s, dir) => {
      // context-window chunking: 64-token windows every 48 tokens
      // (16-token overlap), map-only explode fused into the scan
      text.Curation.tokenChunks(t(s, dir, "documents"), "doc_id", "text", 64, 48)
        .orderBy("doc_id", "chunk_idx")
    }),

    "q65_decontaminate" -> ((s, dir) => {
      // eval-set decontamination: shared-5-gram counts of every training
      // doc against the src0 "benchmark" slice, broadcast map-side join
      text.Curation.contamination(t(s, dir, "documents"), "doc_id", "text",
        col("source") === "src0", 5)
        .orderBy("doc_id")
    }),

    "q66_bigram_lm" -> ((s, dir) => {
      // corpus bigram LM stats: top-50 bigrams with p(w2|w1)
      text.Curation.bigramStats(t(s, dir, "documents"), "text", 50)
    }),

    "q67_tfidf" -> ((s, dir) => {
      // per-doc TF-IDF top-3 terms; doc-frequency join shuffles by term
      // (inverted-index shape), corpus total is a broadcast scalar
      text.Curation.tfIdf(t(s, dir, "documents"), "doc_id", "text", 3)
        .orderBy("doc_id", "rnk")
    }),

    "q68_curation_pipeline" -> ((s, dir) => {
      // the north-star end-to-end: quality gate → transitive dedup
      // (canonical docs only) → deterministic split → per-split stats
      text.Curation.curate(t(s, dir, "documents"), "doc_id", "text",
          minTokens = 25, maxStopwordRatio = 0.15)
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
        .orderBy("split", "lang")
    }),

    "q69_funnel" -> ((s, dir) => {
      // progressive view→click→purchase funnel: stage k counts users
      // whose first stage-k event strictly follows their stage-(k-1) time
      Stats.funnel(t(s, dir, "events"), "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
    }),

    "q70_cohort_retention" -> ((s, dir) => {
      // cohort = first-event date per user; cells count distinct users
      // active at day offsets 0..7
      Stats.cohortRetention(t(s, dir, "events"), "user_id", "ts", 7)
    }),

    "q71_label_centroids" -> ((s, dir) => {
      // per-label mean embedding, exact-decimal dimension sums
      Similarity.labelCentroids(t(s, dir, "embeddings"), "label", "embedding")
        .orderBy("label", "dim")
    }),

    "q72_repetition" -> ((s, dir) => {
      // 3-gram repetition ratio (Gopher-style quality signal): map-only,
      // both shingle forms fused into the scan projection
      text.Curation.repetitionRatio(t(s, dir, "documents"), "doc_id", "text", 3)
        .orderBy("doc_id")
    }),

    "q73_doc_logprob" -> ((s, dir) => {
      // corpus-LM fluency proxy: mean bigram ln p(w2|w1) per doc
      text.Curation.docLogProb(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    "q74_source_mixture" -> ((s, dir) => {
      // training-mix resampling: src0 × 2.5 epochs, src1 × 0.5, rest × 1
      // — deterministic id-modulo fractions, map-side explode
      text.Curation.mixtureSample(t(s, dir, "documents"), "doc_id", "source",
          Map("src0" -> 2.5, "src1" -> 0.5))
        .groupBy("source")
        .agg(count(lit(1)).as("n_rows"),
          count_distinct(col("doc_id")).as("n_docs"))
        .orderBy("source")
    }),

    "q75_knn_graph" -> ((s, dir) => {
      // bucketed exact k-NN graph (label = the bucket key, standing in
      // for an IVF cluster id): Σ bucket² pairs, per-node top-5
      Similarity.knnGraphBucketed(t(s, dir, "embeddings"),
          "vec_id", "embedding", "label", 5)
        .orderBy("src", "rnk")
    }),

    "q76_anomalies" -> ((s, dir) => {
      // market-surveillance z-score outliers per event type, moments
      // from exact decimal power sums broadcast back onto the stream
      Stats.zScoreAnomalies(t(s, dir, "events"), "event_type", "value",
          "event_id", 3.0)
        .orderBy("event_id")
    }),

    "q77_gap_fill" -> ((s, dir) => {
      // hourly resample + forward fill per event type — the classic
      // market-data gap-repair op; window runs over the bounded grid
      Windows.gapFillHourly(t(s, dir, "events"), "event_type", "ts", "value")
        .orderBy("event_type", "hour")
    }),

    "q78_packed_sequences" -> ((s, dir) => {
      // materialized training sequences: q60's batch assignment plus the
      // ordered text concatenation — the artifact a trainer consumes
      text.Curation.packedSequences(t(s, dir, "documents"),
          "doc_id", "text", "source", 4096L)
        .orderBy("source", "batch_id")
    }),

    "q80_source_quality" -> ((s, dir) => {
      // per-source quality dashboard: mean repetition ratio and mean
      // corpus-LM logprob per source — the table a curation run uses to
      // decide per-source mixture weights. Joins two per-doc signal
      // relations on doc_id (both already doc-partitioned) then one
      // small aggregation; means go through exact decimals
      val docs = t(s, dir, "documents")
      val rep = text.Curation.repetitionRatio(docs, "doc_id", "text", 3)
        .select(col("doc_id"), col("dup_ratio"))
      val lp = text.Curation.docLogProb(docs, "doc_id", "text")
        .select(col("doc_id"), col("avg_logprob"))
      docs.select(col("doc_id"), col("source"))
        .join(rep, "doc_id").join(lp, "doc_id")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          round(sum(col("dup_ratio").cast(DecimalType(18, 6))).cast("double") /
            count(lit(1)), 6).as("mean_dup_ratio"),
          round(sum(col("avg_logprob").cast(DecimalType(18, 6))).cast("double") /
            count(lit(1)), 6).as("mean_logprob"))
        .orderBy("source")
    }),

    "q79_dataset_card" -> ((s, dir) => {
      // one-row corpus summary (the "dataset card"): size, token total,
      // diversity, exact-dup rate, mean length — a single aggregation
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"),
          TextStats.tokenCount(col("text")).cast("long").as("_nt"),
          md5(col("text")).as("_h"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("_nt")).as("total_tokens"),
          count_distinct(col("lang")).as("n_langs"),
          count_distinct(col("source")).as("n_sources"),
          round(lit(1.0) - count_distinct(col("_h")) / count(lit(1)).cast("double"), 6)
            .as("exact_dup_rate"),
          round(sum(col("_nt")).cast("double") / count(lit(1)), 6).as("mean_tokens"))
    })
  )
}
