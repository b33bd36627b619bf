package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ops.{Clean, Guards, Ingest, Joins, Risk, Stats, Windows}
import graft.text.{Dedup, TextStats}
import graft.vector.Similarity

/** Driver contract (SURVEY §7.0): one registry entry per operator from
  * SURVEY §2 plus the north-star extensions, each with a DuckDB oracle
  * where SQL-expressible.
  *
  * Oracle-parity rules used throughout (SURVEY §7.4):
  *   - aggregates never sum raw doubles: per-row cast to decimal (exact,
  *     order-independent), then explicit cast of the result precision in
  *     BOTH engines;
  *   - averages are exact-decimal-sum / count (double division of
  *     identical inputs is IEEE-deterministic);
  *   - every window/sort has a deterministic total order via unique
  *     tiebreak columns;
  *   - integer aggregates are cast to BIGINT in DuckDB (its SUM(int)
  *     widens to HUGEINT);
  *   - UTC everywhere.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Build-once memo for q81's persisted IVF index: one index per sf dir
    * per JVM, so Verify/Bench pay the build a single time and every probe
    * exercises the pruned-scan path (the thing q81 exists to measure).
    */
  private val ivfIndexCache = scala.collection.concurrent.TrieMap.empty[String, String]
  private def ivfIndexFor(s: SparkSession, dir: String): String =
    ivfIndexCache.getOrElseUpdate(dir, {
      val path = java.nio.file.Files.createTempDirectory("graft_ivf").toString + "/index"
      graft.vector.Similarity.buildIvfIndex(
        Tables.load(s, dir, "embeddings"), "vec_id", "embedding", path)
      path
    })

  /** Build-once memo for the persisted IVFADC index (the q190→q196
    * build/probe split): codes + codebook + centroids on disk, probes
    * partition-prune the cluster dirs and scan CODES only.
    */
  private val ivfAdcIndexCache = scala.collection.concurrent.TrieMap.empty[String, String]
  private def ivfAdcIndexFor(s: SparkSession, dir: String): String =
    ivfAdcIndexCache.getOrElseUpdate(dir, {
      val path = java.nio.file.Files.createTempDirectory("graft_ivfadc").toString + "/index"
      graft.vector.Similarity.buildIvfAdcIndex(
        Tables.load(s, dir, "embeddings"), "vec_id", "embedding", path)
      path
    })

  /** Build-once memos for the persisted multimodal SIGNATURE index
    * (the q196 build/probe discipline applied to the manifest family,
    * round-10): shingle/md5/perceptual-hash relations on disk, derived
    * once per (sf dir, corpus scope) per JVM — consumers (q160 full
    * manifest, q161 text append, q162 multimodal append) read
    * signatures instead of re-tokenizing and re-decoding the corpus
    * per call. Two scopes: the FULL corpus (q160) and the standing
    * corpus EXCLUDING src0 (the append queries' precondition state).
    */
  private val sigIndexCache = scala.collection.concurrent.TrieMap.empty[(String, Boolean), String]
  private def signatureIndexFor(s: SparkSession, dir: String,
                                excludeSrc0: Boolean): String =
    sigIndexCache.getOrElseUpdate((dir, excludeSrc0), {
      val path = java.nio.file.Files.createTempDirectory("graft_sig").toString + "/index"
      val docs = Tables.load(s, dir, "documents")
      val corpus = if (excludeSrc0) docs.filter(col("source") =!= "src0") else docs
      multimodal.Curate.buildSignatureIndex(s, corpus, "doc_id", "text", path)
      path
    })

  /** Second build tier on the FULL-corpus signature index: persisted
    * modality-tagged edges (q160 reads these — per call it pays only
    * the component walk and manifest assembly).
    */
  private val edgeIndexCache = scala.collection.concurrent.TrieMap.empty[String, String]
  private def edgeIndexFor(s: SparkSession, dir: String): String =
    edgeIndexCache.getOrElseUpdate(dir, {
      val path = signatureIndexFor(s, dir, excludeSrc0 = false)
      multimodal.Curate.buildEdgeIndex(s, path)
      path
    })

  /** Build-once memo for the persisted k-NN edge table (the q41→q81
    * build/probe split applied to graphs): q89/q90's iterative passes
    * read materialized edges — the pair join runs once per sf dir per
    * JVM, not once per query. PlanSpec asserts the consumers' scans.
    */
  private val knnGraphCache = scala.collection.concurrent.TrieMap.empty[String, String]
  private[graft] def knnGraphFor(s: SparkSession, dir: String): String =
    knnGraphCache.getOrElseUpdate(dir, {
      val path = java.nio.file.Files.createTempDirectory("graft_knn").toString + "/edges"
      graft.vector.Similarity.buildKnnGraph(
        Tables.load(s, dir, "embeddings"), "vec_id", "embedding", "label", 5, path)
      path
    })

  /** Build-once memo for the persisted dup-cluster assignment (the
    * build/probe split applied to dedup): q109's dashboard and q116's
    * canonical selection read the materialized table — the jaccard+CC
    * build runs once per sf dir per JVM, not inside every consumer
    * (q63 keeps the inline build as the self-contained oracle of the
    * machinery itself).
    */
  private val clustersCache = scala.collection.concurrent.TrieMap.empty[String, String]
  private def clustersFor(s: SparkSession, dir: String): String =
    clustersCache.getOrElseUpdate(dir, {
      val path = java.nio.file.Files.createTempDirectory("graft_clusters")
        .toString + "/clusters"
      text.Clusters.dupClusters(Tables.load(s, dir, "documents"),
        "doc_id", "text", 5, 0.5).write.parquet(path)
      path
    })

  /** Build-once memo for q92's two-version snapshot table: v1/v2 are
    * deterministic splits of `customer`, committed through the REAL
    * version store so the change feed reads actual manifests.
    */
  private val cdcCache = scala.collection.concurrent.TrieMap.empty[String, String]
  private def cdcTableFor(s: SparkSession, dir: String): String =
    cdcCache.getOrElseUpdate(dir, {
      import org.apache.spark.sql.functions.{col, lit, when}
      val path = java.nio.file.Files.createTempDirectory("graft_cdc").toString + "/customer"
      val cust = Tables.load(s, dir, "customer")
      engine.Snapshots.writeVersioned(
        cust.filter(col("c_custkey") % 10 =!= 3), path, 1L)
      engine.Snapshots.writeVersioned(
        cust.filter(col("c_custkey") % 10 =!= 4)
          .withColumn("c_acctbal",
            when(col("c_custkey") % 7 === 0, col("c_acctbal") + lit(100.0))
              .otherwise(col("c_acctbal"))), path, 2L)
      path
    })

  /** Build-once memo for q87's ORC copy of the events columns it
    * aggregates — the roundtrip write happens once per sf dir per JVM.
    */
  private val orcCache = scala.collection.concurrent.TrieMap.empty[String, String]
  private def orcEventsFor(s: SparkSession, dir: String): String =
    orcCache.getOrElseUpdate(dir, {
      val path = java.nio.file.Files.createTempDirectory("graft_orc").toString + "/events"
      graft.engine.Layout.writeOrc(
        Tables.load(s, dir, "events").select("event_type", "value", "user_id"), path)
      path
    })

  private val csvCache = scala.collection.concurrent.TrieMap.empty[String, String]
  private def csvBarsFor(s: SparkSession, dir: String): String =
    csvCache.getOrElseUpdate(dir, {
      val path = java.nio.file.Files.createTempDirectory("graft_csv").toString + "/bars.csv"
      graft.engine.Layout.singleCsv(
        graft.ops.Stats.ohlcBars(
          Tables.load(s, dir, "events").filter(col("value").isNotNull),
          Seq("event_type"), to_date(col("ts")),
          Seq(col("ts"), col("event_id")), "value"), path)
      path
    })

  private val jsonlCache = scala.collection.concurrent.TrieMap.empty[String, String]
  private def jsonlEventsFor(s: SparkSession, dir: String): String =
    jsonlCache.getOrElseUpdate(dir, {
      val path = java.nio.file.Files.createTempDirectory("graft_jsonl").toString + "/events"
      graft.engine.Layout.writeJsonl(
        Tables.load(s, dir, "events").select("event_type", "value", "user_id"), path)
      path
    })

  /** Flagship: the full medallion pipeline (Bronze enrich → Silver dedup →
    * Gold per-day top-10 stats) over `events`. Driver smoke-checks rows>0
    * on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q09_pipeline_gold")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── Reference parity (SURVEY §2) ────────────────────────────────────
    "q01_gold_daily_stats" -> ((s, dir) => {
      // W2 rank + P5 filter + A1 agg + O1 sort (silver_to_gold_crypto_stats.py:52-111)
      val li = t(s, dir, "lineitem").withColumn("partition_date", to_date(col("l_shipdate")))
      Stats.dailyStats(
        Stats.topKPerDay(li.repartition(col("partition_date")), "partition_date",
          col("l_extendedprice") * col("l_quantity"), 10),
        "partition_date", "l_extendedprice", "l_quantity")
    }),

    "q02_dedup_latest" -> ((s, dir) => {
      // W1 keep-latest dedup (bronze_to_silver_crypto.py:76-84)
      Clean.dedupLatest(t(s, dir, "events"), Seq("user_id", "ts"), "event_id")
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .orderBy("event_id")
    }),

    "q03_bronze_enrich" -> ((s, dir) => {
      // P3 enrichment + P9 coalesce + partition-date derivation
      // (extract_crypto_data.py:183-192)
      t(s, dir, "events").select(
        col("event_id"), col("user_id"), col("event_type"),
        coalesce(col("value"), lit(0.0)).as("value_filled"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_str"),
        to_date(col("ts")).as("partition_date"))
        .orderBy("event_id")
    }),

    "q04_distinct_dates" -> ((s, dir) => {
      // P7/A3 touched-partition discovery (extract_crypto_data.py:226-229)
      Stats.distinctDates(
        t(s, dir, "lineitem").withColumn("partition_date", to_date(col("l_shipdate"))),
        "partition_date")
    }),

    "q05_top1_global" -> ((s, dir) => {
      // O2 global top-1 (fast_pipeline.py:43) with deterministic tiebreak
      Stats.top1(t(s, dir, "events"), col("value"), Seq(col("event_id")))
        .select("event_id", "user_id", "event_type", "value")
    }),

    "q06_cross_join" -> ((s, dir) => {
      // J1 broadcast cross join (data_generator.py:270-271)
      t(s, dir, "nation").crossJoin(broadcast(t(s, dir, "region")))
        .select(col("n_name"), col("r_name"))
        .orderBy("n_name", "r_name")
    }),

    "q07_silver_casts" -> ((s, dir) => {
      // P8 typed casts to Decimal(18,8)/(20,2) (bronze_to_silver_crypto.py:62-71).
      // The decimal cast IS the operator; the final projection presents a
      // canonical rounded-double view because decimal trailing-zero
      // rendering is engine-specific (hash-canonicalization)
      t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice").cast(DecimalType(18, 8)).cast("double"), 8).as("price_dec"),
        round(col("l_quantity").cast(DecimalType(20, 2)).cast("double"), 2).as("qty_dec"),
        col("l_returnflag"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q08_partition_counts" -> ((s, dir) => {
      // A1/A2 per-partition counts + exact decimal sums
      t(s, dir, "orders")
        .withColumn("partition_date", to_date(col("o_orderdate")))
        .groupBy(col("partition_date"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double"), 2).as("total_price"))
        .orderBy("partition_date")
    }),

    "q09_pipeline_gold" -> ((s, dir) => {
      // Full medallion: enrich → dedup (W1) → daily top-10 rank() stats (W2+A1)
      val bronze = t(s, dir, "events").withColumn("partition_date", to_date(col("ts")))
      val silver = Clean.dedupLatest(bronze, Seq("user_id", "ts"), "event_id")
      Stats.dailyStats(
        Stats.topKPerDay(silver.repartition(col("partition_date")), "partition_date",
          col("value"), 10),
        "partition_date", "value", "value")
    }),

    // ── Extended relational surface (SURVEY §7.2 step 6) ────────────────
    "q10_join_star" -> ((s, dir) => {
      Joins.starJoin(t(s, dir, "customer"), Seq(
        (t(s, dir, "nation"), "c_nationkey", "n_nationkey"),
        (t(s, dir, "region"), "n_regionkey", "r_regionkey")))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"),
          round(sum(col("c_acctbal").cast(DecimalType(18, 2))).cast("double"), 2).as("total_acctbal"))
        .orderBy("r_name", "n_name")
    }),

    "q11_join_fact" -> ((s, dir) => {
      t(s, dir, "orders").join(t(s, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          round(sum((col("l_extendedprice").cast(DecimalType(18, 2)) *
            (lit(1.0) - col("l_discount")).cast(DecimalType(4, 2)))
            .cast(DecimalType(18, 4))).cast("double"), 4).as("revenue"))
        .orderBy("o_orderpriority")
    }),

    "q12_semi_join" -> ((s, dir) => {
      t(s, dir, "customer").join(t(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }),

    "q13_anti_join" -> ((s, dir) => {
      t(s, dir, "customer").join(t(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }),

    "q14_rollup" -> ((s, dir) => {
      Joins.starJoin(t(s, dir, "customer"), Seq(
        (t(s, dir, "nation"), "c_nationkey", "n_nationkey"),
        (t(s, dir, "region"), "n_regionkey", "r_regionkey")))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
    }),

    "q15_window_lag" -> ((s, dir) => {
      Windows.lagLead(t(s, dir, "events"), Seq("user_id"), Seq("ts", "event_id"), "value")
        .select("event_id", "user_id", "value", "prev_value", "next_value")
        .orderBy("event_id")
    }),

    "q16_window_frame" -> ((s, dir) => {
      Windows.movingAgg(t(s, dir, "events"), Seq("user_id"), Seq("ts", "event_id"), "value", 2)
        .select("event_id", "user_id", "moving_sum", "pos_in_key")
        .orderBy("event_id")
    }),

    "q17_set_ops" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val purch = ev.filter(col("event_type") === "purchase").select("user_id")
      val err = ev.filter(col("event_type") === "error").select("user_id")
      purch.intersect(err).withColumn("tag", lit("both"))
        .unionByName(purch.except(err).withColumn("tag", lit("purchase_only")))
        .select("tag", "user_id").orderBy("tag", "user_id")
    }),

    "q18_json_extract" -> ((s, dir) => {
      t(s, dir, "events").select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy("event_id")
    }),

    "q19_string_funcs" -> ((s, dir) => {
      t(s, dir, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("upper_name"),
        lower(col("p_brand")).as("lower_brand"),
        length(col("p_name")).cast("long").as("name_len"),
        substring(col("p_name"), 1, 8).as("name_prefix"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), " ", "_").as("snake_name"),
        instr(col("p_type"), "a").cast("long").as("a_pos"),
        reverse(col("p_name")).as("rev_name"))
        .orderBy("p_partkey")
    }),

    "q20_date_funcs" -> ((s, dir) => {
      t(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(to_date(col("o_orderdate")), lit(java.sql.Date.valueOf("1995-01-01")))
          .cast("long").as("days_since"))
        .orderBy("o_orderkey")
    }),

    "q21_agg_funcs" -> ((s, dir) => {
      t(s, dir, "events").groupBy(col("event_type")).agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"),
        round(sum(col("value").cast(DecimalType(18, 2))).cast("double"), 2).as("total_value"))
        .orderBy("event_type")
    }),

    "q22_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
      val clicks = ev.filter(col("event_type") === "click")
        .select("user_id", "ts", "event_id", "value")
      Joins.asOfJoin(purchases, clicks, Seq("user_id"), "ts", "ts",
          Seq(("value", "last_click_value")),
          leftTiebreak = Some("event_id"), rightTiebreak = Some("event_id"))
        .select("event_id", "user_id", "value", "last_click_value")
        .orderBy("event_id")
    }),

    "q23_range_join" -> ((s, dir) => {
      val o = t(s, dir, "orders").select("o_orderkey", "o_orderdate", "o_orderstatus")
      val l = t(s, dir, "lineitem").select("l_orderkey", "l_shipdate")
      o.join(l, col("o_orderkey") === col("l_orderkey")
          && col("l_shipdate") >= col("o_orderdate")
          && col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n_shipped_90d"))
        .orderBy("o_orderstatus")
    }),

    "q24_histogram" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("bucket_lo", (floor(col("value") / 25) * 25).cast("long"))
        .groupBy("bucket_lo")
        .agg(count(lit(1)).as("n"),
          round(sum(col("value").cast(DecimalType(18, 2))).cast("double"), 2).as("total_value"))
        .orderBy("bucket_lo")
    }),

    "q25_sessionize" -> ((s, dir) => {
      Windows.sessionStats(
        Windows.sessionize(t(s, dir, "events"), Seq("user_id"), "ts", "event_id", 1800),
        Seq("user_id"), "ts")
    }),

    "q26_cube" -> ((s, dir) => {
      Joins.starJoin(t(s, dir, "customer"), Seq(
        (t(s, dir, "nation"), "c_nationkey", "n_nationkey"),
        (t(s, dir, "region"), "n_regionkey", "r_regionkey")))
        .cube(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
    }),

    "q27_pivot" -> ((s, dir) => {
      val types = Seq("click", "purchase", "view", "signup", "error")
      t(s, dir, "events").groupBy(col("user_id"))
        .pivot("event_type", types).agg(count(lit(1)))
        .select(col("user_id") +: types.map(ty => coalesce(col(ty), lit(0L)).as(ty)): _*)
        .orderBy("user_id")
    }),

    "q28_bpe_tokens" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextStats.bpeTokenCount(col("text")).cast("long").as("n_bpe_tokens"))
        .orderBy("doc_id")
    }),

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
      // oracle-gated since round 6 (q32/q41 pattern): at 24 bands × 4
      // sign bits the banding's measured recall on the GATE corpus
      // (sf0.01) is total (59/59 exact pairs; 43/59 at the 8-band
      // default) and the exact-cosine verify step makes precision
      // exact, so q38's all-pairs oracle applies verbatim there — the
      // gate asserts LSH loses nothing at these parameters. The
      // premise is corpus-specific (sf0.001 misses 3/66, sf0.1 misses
      // 8/920), so `oracleMeasuredOn` ties the oracle to sf0.01:
      // elsewhere the surface is the honest subset-with-exact-
      // precision semantics and Verify omits the equality claim
      Similarity.embedNearDupLsh(t(s, dir, "embeddings"), "vec_id", "embedding", 0.4,
          nBands = 24)
        .orderBy("id_a", "id_b")
    }),

    // ── Similarity search (north star) ──────────────────────────────────
    "q40_cosine_topk" -> ((s, dir) => {
      Similarity.cosineTopK(t(s, dir, "embeddings"), "vec_id", "embedding", 0L, 10)
    }),

    "q41_ivf_topk" -> ((s, dir) => {
      // IVF probe search; shares q40's exact oracle — on this corpus the
      // probe's recall is total, so the gate asserts pruning loses nothing
      Similarity.ivfTopK(t(s, dir, "embeddings"), "vec_id", "embedding", 0L, 10)
    }),

    "q81_ivf_probe" -> ((s, dir) => {
      // the production ANN shape: index built ONCE (cluster-partitioned
      // persisted assignments), probe partition-prunes to nProbe cluster
      // dirs — same oracle as q40/q41, pruning must lose nothing here
      Similarity.ivfProbeById(s, ivfIndexFor(s, dir),
        t(s, dir, "embeddings"), "vec_id", "embedding", 0L, 10)
    }),

    "q82_vwap" -> ((s, dir) => {
      // volume-weighted average price per (instrument, day): quantity
      // from the props JSON, exact decimal Σpq/Σq, NULL on zero volume
      val ev = t(s, dir, "events").filter(col("value").isNotNull)
        .withColumn("day", to_date(col("ts")))
        .withColumn("qty", get_json_object(col("props"), "$.k").cast("long"))
        .filter(col("qty").isNotNull)
      Stats.vwap(ev, Seq("event_type", "day"), col("value"), col("qty"))
        .orderBy("event_type", "day")
    }),

    "q83_rolling_volatility" -> ((s, dir) => {
      // trailing-20-tick rolling mean/stddev per instrument from exact
      // decimal power sums over the frame (order-independent — the
      // window twin of q49's moment computation)
      Stats.rollingStats(t(s, dir, "events").filter(col("value").isNotNull),
          "event_type", Seq(col("ts"), col("event_id")), col("value"), 20)
        .select(col("event_id"), col("event_type"), col("roll_n"),
          col("roll_mean"), col("roll_std"))
        .orderBy("event_id")
    }),

    "q84_max_drawdown" -> ((s, dir) => {
      // largest peak-to-trough decline per instrument: expanding-max
      // running peak, exact decimals end to end, one shuffle
      Stats.maxDrawdown(t(s, dir, "events").filter(col("value").isNotNull),
          "event_type", Seq(col("ts"), col("event_id")), col("value"))
        .orderBy("event_type")
    }),

    "q85_dup_shingles" -> ((s, dir) => {
      // cross-doc duplicated 5-gram fraction per doc (Lee et al. span-
      // duplication signal): inverted-index shape, no pair space
      text.Dedup.dupShingleFraction(t(s, dir, "documents"), "doc_id", "text", 5)
        .orderBy("doc_id")
    }),

    "q86_quantize_embeddings" -> ((s, dir) => {
      // int8 storage-compression audit: per-vector scale, dot-identity
      // MSE, worst per-element error — exact floor arithmetic, map-only
      Similarity.quantizeAudit(t(s, dir, "embeddings"), "vec_id", "embedding")
        .orderBy("vec_id")
    }),

    "q90_label_prop" -> ((s, dir) => {
      // semi-supervised label spreading: 10% of vectors seed their true
      // label, 3 synchronous iterations over the k-NN graph; integer
      // counts + smallest-label tiebreak → fully deterministic
      val edges = Similarity.readKnnGraph(s, knnGraphFor(s, dir))
        .select("src", "dst")
      val seeds = t(s, dir, "embeddings")
        .filter(col("vec_id") % 10 === 0)
        .select(col("vec_id"), col("label"))
      text.Clusters.labelPropagation(edges, "src", "dst",
          seeds, "vec_id", "label", 3)
        .select(col("node").as("vec_id"), col("label").as("pred_label"))
        .orderBy("vec_id")
    }),

    "q91_twap" -> ((s, dir) => {
      // time-weighted average price per (instrument, day): each tick
      // weighted by microseconds until the next tick; exact decimals
      val ev = t(s, dir, "events").filter(col("value").isNotNull)
        .withColumn("day", to_date(col("ts")))
      Stats.twap(ev, Seq("event_type", "day"), col("ts"), col("event_id"),
          col("value"))
        .orderBy("event_type", "day")
    }),

    "q92_change_capture" -> ((s, dir) => {
      // CDC diff between two REAL committed snapshot versions (the memo
      // commits v1/v2 once per JVM): Snapshots.changeFeed = one
      // full-outer join on the key over the two version scans, null-safe
      // struct compare — Delta CDF's table_changes surface. The oracle
      // diffs the same two states straight off the source table, so a
      // hash match also proves the version store loses nothing.
      engine.Snapshots.changeFeed(s, cdcTableFor(s, dir), 1L, 2L,
          Seq("c_custkey"))
        .orderBy("c_custkey")
    }),

    "q93_bloom_decontaminate" -> ((s, dir) => {
      // q65's exact decontamination behind a Bloom pre-filter: the eval
      // shingle sketch (one distributed aggregate, ~MiB) prunes the
      // corpus shingle stream map-side BEFORE any join; the exact join
      // then erases false positives, so the result is bit-identical
      text.Curation.contaminationBloom(t(s, dir, "documents"), "doc_id",
          "text", col("source") === "src0", 5)
        .orderBy("doc_id")
    }),

    "q94_rsi" -> ((s, dir) => {
      // 14-tick relative strength index per instrument: exact decimal
      // gain/loss frame sums (order-independent), double only at present
      Stats.rsi(t(s, dir, "events").filter(col("value").isNotNull),
          "event_type", Seq(col("ts"), col("event_id")), col("value"), 14)
        .select(col("event_id"), col("event_type"), col("n_deltas"), col("rsi"))
        .orderBy("event_id")
    }),

    "q95_fuzzy_match" -> ((s, dir) => {
      // Blocked entity resolution, the scale-correct way: collapse the n
      // records to DISTINCT names first (min-id representative + record
      // count — one shuffle, output bounded by the name VOCABULARY), then
      // fuzzy-match the distinct names and carry multiplicities. Measured
      // on this testdata: the old record-level first-token key had 8
      // blocks at EVERY sf (Σblock² = 501,570 pairs at sf0.01 →
      // 50,015,406 at sf0.1 — O(n²/8), 19.2 s), while distinct names
      // number 64 at both sfs, so the match cost here is O(V²/B) —
      // independent of record count. Blocker = last token (the noun):
      // close variants differ in the ADJECTIVE ("cold anvil" ~
      // "old anvil", d=1), which first-token blocking misses entirely.
      val names = t(s, dir, "part")
        .groupBy(col("p_name"))
        .agg(min(col("p_partkey")).as("rep_id"), count(lit(1)).as("n_recs"))
      val cnt = names.select(col("p_name").as("nm"), col("n_recs"))
      Joins.fuzzyPairs(names, "rep_id", "p_name",
          element_at(split(col("p_name"), " "), -1), 2)
        .join(broadcast(cnt), col("a_name") === col("nm"))
        .withColumnRenamed("n_recs", "a_recs").drop("nm")
        .join(broadcast(cnt), col("b_name") === col("nm"))
        .withColumnRenamed("n_recs", "b_recs").drop("nm")
        .select(col("a_id"), col("b_id"), col("a_name"), col("b_name"),
          col("edit_dist"), col("a_recs"), col("b_recs"))
        .orderBy("a_id", "b_id")
    }),

    "q96_hash_sample" -> ((s, dir) => {
      // reproducible per-source 5-doc sample: smallest multiplicative
      // id-hash wins — stable under reruns/repartitioning, unlike rand()
      text.Curation.hashSample(t(s, dir, "documents"), "source", "doc_id", 5)
        .select("source", "doc_id", "sample_rank")
        .orderBy("source", "sample_rank")
    }),

    "q97_ewma" -> ((s, dir) => {
      // exponentially weighted moving average per instrument: bounded
      // 20-tick frame folded oldest→newest in fixed order (deterministic
      // doubles), the smoothing twin of q83's rolling moments
      Stats.ewma(t(s, dir, "events").filter(col("value").isNotNull),
          "event_type", Seq(col("ts"), col("event_id")), col("value"),
          alpha = 0.25, window = 20)
        .select(col("event_id"), col("event_type"), col("ewma"))
        .orderBy("event_id")
    }),

    "q98_beta" -> ((s, dir) => {
      // per-instrument beta vs the hourly cross-instrument market mean:
      // q54's exact power-sum discipline over a joined two-series frame
      Stats.betaVsMarket(t(s, dir, "events").filter(col("value").isNotNull),
          "event_type", date_trunc("hour", col("ts")), col("value"))
        .orderBy("event_type")
    }),

    "q99_up_streaks" -> ((s, dir) => {
      // longest strictly-rising tick run per instrument: gaps-and-islands
      // via cumulative non-up count as the island id, exact decimal deltas
      Windows.longestUpStreak(t(s, dir, "events").filter(col("value").isNotNull),
          "event_type", Seq(col("ts"), col("event_id")), col("value"))
        .orderBy("event_type")
    }),

    "q101_split_assign" -> ((s, dir) => {
      // deterministic train/val/test assignment: multiplicative id-hash
      // bucket, map-only (fuses into the scan — no shuffle at any scale);
      // per-source proportions are statistically exact because the hash
      // is independent of source
      text.Curation.splitAssign(t(s, dir, "documents"), "doc_id",
          Seq(("train", 80), ("val", 10), ("test", 10)))
        .select("doc_id", "source", "split")
        .orderBy("doc_id")
    }),

    "q102_heavy_hitters" -> ((s, dir) => {
      // exact bigram heavy hitters via the two-pass Count-Min scheme:
      // sketch pass → codegen'd CmsEstimate candidate filter map-side →
      // exact count of survivors. CMS never under-counts, so candidates
      // ⊇ true heavy hitters and the final HAVING is exact — the shuffle
      // carries candidates, not the full vocabulary
      val docs = t(s, dir, "documents")
        .filter(size(text.TextStats.tokens(col("text"))) >= 2)
      text.TextStats.heavyHitters(docs,
          text.Dedup.shingles(lower(col("text")), 2), minCount = 30L)
        .select(col("token").as("bigram"), col("freq"))
        .orderBy("bigram")
    }),

    "q103_epoch_shuffle" -> ((s, dir) => {
      // reproducible epoch-3 permutation as a (shard, shard_pos) layout:
      // per-shard sorts, never a single-partition global window — the
      // epoch order a training job actually reads off disk
      text.Curation.epochShuffle(t(s, dir, "documents"), "doc_id",
          epoch = 3, shards = 8)
        .select("doc_id", "shard", "shard_pos")
        .orderBy("doc_id")
    }),

    "q104_length_quantiles" -> ((s, dir) => {
      // per-source token-count distribution audit: EXACT p50/p90/p99 —
      // exact percentile state is bounded by DISTINCT lengths, not rows,
      // so it stays cheap at any corpus size; one hash aggregation
      text.TextStats.lengthQuantiles(t(s, dir, "documents"), "source", "text")
        .orderBy("source")
    }),

    "q105_incremental_agg" -> ((s, dir) => {
      // materialized-view maintenance: the per-type rollup of the AFTER
      // state computed as base-aggregate + signed CDC delta (inserts at
      // event_id%10=3, value-doubling updates at %10=7) — never a rescan
      // of the after table. The oracle aggregates the after state
      // directly, so a hash match proves the delta algebra is exact.
      // All arithmetic is exact decimal; only the FINAL projection casts
      // to double (the result-surface convention every query follows —
      // a raw wide decimal in the dump compares rep-sensitively).
      val ev = t(s, dir, "events").filter(col("value").isNotNull)
        .select(col("event_id"), col("event_type"),
          col("value").cast("decimal(18,6)").as("value"))
      val before = ev.filter(pmod(col("event_id"), lit(10)) =!= 3)
      val after = ev.withColumn("value",
        when(pmod(col("event_id"), lit(10)) === 7, col("value") * 2)
          .otherwise(col("value")).cast("decimal(18,6)"))
      val feed = engine.Upsert.changeCaptureCdf(before, after, Seq("event_id"))
      val base = engine.Incremental.groupAgg(before, Seq("event_type"),
        Seq("total" -> col("value")))
      val delta = engine.Incremental.aggDelta(feed, Seq("event_type"),
        Seq("total" -> col("value")))
      engine.Incremental.applyDelta(base, delta, Seq("event_type"), Seq("total"))
        .select(col("event_type"), col("n"),
          col("total").cast("double").as("total"))
        .orderBy("event_type")
    }),

    "q106_corr_matrix" -> ((s, dir) => {
      // pairwise instrument correlation over hourly-aligned means: raw
      // ticks reduce to the bucket-mean frame once; the k(k-1)/2 pair
      // expansion broadcast-joins that aggregate-sized frame only
      Stats.corrMatrix(t(s, dir, "events").filter(col("value").isNotNull),
          "event_type", date_trunc("hour", col("ts")), col("value"))
        .orderBy("key_a", "key_b")
    }),

    "q107_skew_report" -> ((s, dir) => {
      // pre-join skew diagnostic: hottest user_ids with share and
      // imbalance factor (count / fair-share) — hot keys come off the
      // count table via TakeOrderedAndProject, never a global sort
      Joins.skewReport(t(s, dir, "events"), Seq("user_id"), topK = 20)
        .select("user_id", "cnt", "rank", "share", "imbalance")
        .orderBy("rank")
    }),

    "q108_underwater_spell" -> ((s, dir) => {
      // drawdown DURATION per instrument (q84 measures depth): longest
      // run of ticks strictly below the running peak — gaps-and-islands,
      // all-exact arithmetic, one hash Exchange end-to-end
      Windows.longestUnderwaterSpell(
          t(s, dir, "events").filter(col("value").isNotNull),
          "event_type", Seq(col("ts"), col("event_id")), col("value"))
        .orderBy("event_type")
    }),

    "q109_dedup_rate" -> ((s, dir) => {
      // curation dashboard: per-source duplicate share from the
      // transitive cluster assignment (q63's machinery aggregated) —
      // the number that tells you which ingest source is polluting the
      // corpus. dup_share is an unrounded quotient of exact integers
      // (bit-deterministic across engines). Reads the MATERIALIZED
      // cluster table (built once per JVM) — the dashboard never
      // re-runs the jaccard+CC build it reports on
      val docs = t(s, dir, "documents")
      val clusters = s.read.parquet(clustersFor(s, dir))
      docs.select(col("doc_id").cast("long").as("doc_id"), col("source"))
        .join(clusters, "doc_id")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("is_canonical"), 1L).otherwise(0L)).as("n_canonical"))
        .withColumn("dup_share",
          (col("n_docs") - col("n_canonical")).cast("double") / col("n_docs"))
        .orderBy("source")
    }),

    "q110_split_leakage" -> ((s, dir) => {
      // eval-hygiene audit: near-dup pairs that STRADDLE the
      // train/val/test boundary — each row is a leak where eval content
      // has a training near-duplicate (the contamination q65 catches
      // for external benchmarks, applied to the split itself)
      val docs = t(s, dir, "documents")
      val pairs = text.Dedup.jaccardPairs(docs, "doc_id", "text", 5, 0.5)
        .select(col("doc_a"), col("doc_b"))
      val sp = text.Curation.splitAssign(docs, "doc_id",
          Seq(("train", 80), ("val", 10), ("test", 10)))
        .select(col("doc_id").cast("long").as("doc_id"), col("split"))
      pairs
        .join(sp.select(col("doc_id").as("doc_a"), col("split").as("split_a")),
          "doc_a")
        .join(sp.select(col("doc_id").as("doc_b"), col("split").as("split_b")),
          "doc_b")
        .filter(col("split_a") =!= col("split_b"))
        .select("doc_a", "doc_b", "split_a", "split_b")
        .orderBy("doc_a", "doc_b")
    }),

    "q111_token_budget" -> ((s, dir) => {
      // the number every training run starts from: whitespace and
      // BPE-ish token totals per split — splitAssign (map-only) feeding
      // one aggregation, with docs-per-split for sanity
      val docs = text.Curation.splitAssign(t(s, dir, "documents"),
        "doc_id", Seq(("train", 80), ("val", 10), ("test", 10)))
      docs.groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum(text.TextStats.tokenCount(col("text")).cast("long"))
            .as("ws_tokens"),
          sum(text.TextStats.bpeTokenCount(col("text")).cast("long"))
            .as("bpe_tokens"))
        .orderBy("split")
    }),

    "q112_volume_concentration" -> ((s, dir) => {
      // daily volume concentration across instruments (Herfindahl
      // index): exact integer power sums, ONE final bit-deterministic
      // division — flags the days one instrument dominated the tape
      val ev = t(s, dir, "events")
        .withColumn("qty", get_json_object(col("props"), "$.k").cast("long"))
        .filter(col("qty").isNotNull)
        .withColumn("day", to_date(col("ts")))
      Stats.concentration(ev, Seq("day"), "event_type", col("qty"))
        .orderBy("day")
    }),

    "q113_bollinger" -> ((s, dir) => {
      // 20-tick Bollinger envelope + %B per instrument: derived map-side
      // from q83's exact rolling moments — same single shuffle, bands on
      // the rounded presentation values so both engines agree bit-for-bit
      Stats.bollinger(t(s, dir, "events").filter(col("value").isNotNull),
          "event_type", Seq(col("ts"), col("event_id")), col("value"),
          window = 20, k = 2.0)
        .select(col("event_id"), col("event_type"), col("bb_mid"),
          col("bb_upper"), col("bb_lower"), col("pct_b"))
        .orderBy("event_id")
    }),

    "q114_sharpe" -> ((s, dir) => {
      // per-instrument Sharpe over tick returns: returns fixed as rounded
      // decimals once (one map-side division), then exact power sums —
      // one window shuffle, aggregation clusters on the same key
      Stats.sharpe(t(s, dir, "events").filter(col("value").isNotNull),
          "event_type", Seq(col("ts"), col("event_id")), col("value"))
        .orderBy("event_type")
    }),

    "q115_return_autocorr" -> ((s, dir) => {
      // lag-1 autocorrelation of tick returns (momentum vs reversion):
      // q54's power-sum Pearson over (r_t, r_{t-1}) pairs; both window
      // passes and the aggregation ride one partition-by-key shuffle
      Stats.returnAutocorr(t(s, dir, "events").filter(col("value").isNotNull),
          "event_type", Seq(col("ts"), col("event_id")), col("value"))
        .orderBy("event_type")
    }),

    "q116_canonical_docs" -> ((s, dir) => {
      // dedup with a brain: q63's transitive clusters, but the kept doc
      // is the argmax-token-count member (min id on ties) — the drop
      // list IS the dedup delete set a curation pipeline applies.
      // Reads the MATERIALIZED cluster assignment (clustersFor — built
      // once per corpus, shared with q109): the CC walk runs once, and
      // this consumer is a key-join + two windows on one shuffle
      text.Clusters.canonicalFromClusters(t(s, dir, "documents"), "doc_id",
          s.read.parquet(clustersFor(s, dir)),
          size(text.TextStats.tokens(col("text"))).cast("long"))
        .orderBy("doc_id")
    }),

    "q117_inverted_index" -> ((s, dir) => {
      // corpus search structure: per-token document frequency + ordered
      // posting list, postings capped PRE-aggregation (row_number over
      // the token partition) so a stop-word's list can't OOM a buffer;
      // df still counts every doc and `truncated` marks capped tokens
      // result-surface convention: the driver comparer hashes scalar
      // columns only, so the posting list ships serialized (CSV) — same
      // information, hashable surface (oracle mirrors via array_to_string)
      text.TextStats.invertedIndex(t(s, dir, "documents"), "doc_id",
          "text", minDf = 10, maxPostings = 20)
        .withColumn("postings",
          array_join(col("postings").cast("array<string>"), ","))
        .orderBy("token")
    }),

    "q118_semantic_dedup" -> ((s, dir) => {
      // SemDeDup: stride centroids → broadcast argmax assignment →
      // within-cluster-only cosine pairs (Σ cluster², never n²) →
      // drop every doc with a smaller-id near-dup in its cluster
      Similarity.semanticDedup(t(s, dir, "embeddings"), "vec_id",
          "embedding", nCentroids = 8, threshold = 0.4)
        .orderBy("vec_id")
    }),

    "q119_winsorized_stats" -> ((s, dir) => {
      // outlier-robust per-instrument mean: clip at the key's own exact
      // [p05, p95] percentiles (cut points fixed as rounded decimals so
      // the clip compares exactly), winsorized sum stays an exact
      // decimal — the quality-pipeline answer to fat-fingered ticks
      Stats.winsorizedStats(t(s, dir, "events").filter(col("value").isNotNull),
          "event_type", col("value"), pLo = 0.05, pHi = 0.95)
        .orderBy("event_type")
    }),

    "q120_temperature_mixture" -> ((s, dir) => {
      // α-sampling weights per source (pₛ^α, α=0.5): the multilingual
      // mixture rule — token totals exact, pow() output fixed as a
      // rounded decimal BEFORE the normalizing sum so the denominator
      // is order-independent; rate feeds mixtureSample's weight map
      text.Curation.temperatureWeights(t(s, dir, "documents"),
          "source", "text", alpha = 0.5)
        .orderBy("source")
    }),

    "q121_realized_variance" -> ((s, dir) => {
      // daily realized variance/vol per instrument: Σr² over the day's
      // tick returns (overnight return counts toward the later day) —
      // exact decimal power sums, sqrt only at presentation
      Stats.realizedVariance(t(s, dir, "events").filter(col("value").isNotNull),
          "event_type", Seq(col("ts"), col("event_id")), col("value"),
          to_date(col("ts")))
        .orderBy("event_type", "bucket")
    }),

    "q122_cross_source_dups" -> ((s, dir) => {
      // provenance matrix: near-dup pair counts by unordered source
      // pair — which feeds mirror each other (q109's per-source rate,
      // resolved to the source×source cell level)
      text.Dedup.crossSourceDupMatrix(t(s, dir, "documents"), "doc_id",
          "text", "source", n = 5, threshold = 0.5)
        .orderBy("source_a", "source_b")
    }),

    "q124_audio_features" -> ((s, dir) => {
      // REAL audio decode, oracle-gated end-to-end (the q43 move for
      // sound): one WAV per doc_id is encoded executor-side — 1+id%256
      // samples of a seeded ramp — and extractAudioFeatures reads the
      // true sample count AND the PCM RMS back out via
      // javax.sound.sampled; both are SQL-expressible from the ids, so
      // the hash gate proves the decode (not just the header) is real
      import graft.multimodal.Media
      val media = Media.audioTable(s, t(s, dir, "documents"), "doc_id")
      Media.extractAudioFeatures(s, media).toDF()
        .select(col("media_id"), col("sample_rate"), col("channels"),
          col("n_samples"), col("rms"), col("decoded"))
        .orderBy("media_id")
    }),

    "q141_video_features" -> ((s, dir) => {
      // REAL RIFF/AVI container parse, oracle-gated end-to-end (the
      // q43/q124 move for video): one minimal-but-conforming AVI per
      // doc_id with id-derived geometry; the chunk walk reads the true
      // avih fields back out, and every field is SQL-expressible from
      // the ids, so the hash gate proves the container parse is real
      import graft.multimodal.Media
      val media = Media.videoTable(s, t(s, dir, "documents"), "doc_id")
      Media.extractVideoFeatures(s, media).toDF()
        .select(col("media_id"), col("n_bytes"), col("width"),
          col("height"), col("n_frames"), col("duration_ms"),
          col("decoded"))
        .orderBy("media_id")
    }),

    "q142_video_frames" -> ((s, dir) => {
      // REAL frame PIXEL decode, oracle-gated: BI_RGB AVIs with
      // id-derived frame colors; the decoder walks actual bottom-up
      // padded BGR rows (first stored pixel inverted — a header-only or
      // solid-color shortcut gets different sums), and every channel
      // sum is SQL-expressible from the ids
      import graft.multimodal.Media
      val media = Media.videoFrameTable(s, t(s, dir, "documents"), "doc_id")
      Media.extractVideoFrameFeatures(s, media).toDF()
        .select(col("media_id"), col("width"), col("height"),
          col("n_frames"), col("r_sum"), col("g_sum"), col("b_sum"),
          col("decoded"))
        .orderBy("media_id")
    }),

    "q152_phash_pairs" -> ((s, dir) => {
      // perceptual image dedup, exact twin: aHash the bit-grid PNG
      // fixture (hash == id by construction, across three scales — so
      // the oracle is popcount(xor) arithmetic and the gate proves the
      // decode → 8×8 block-average → threshold pipeline end to end)
      import graft.multimodal.Media
      Media.phashExactPairs(s,
          Media.imageHashTable(s, t(s, dir, "documents"), "doc_id"))
        .orderBy("id_a", "id_b")
    }),

    "q153_phash_banded" -> ((s, dir) => {
      // the 100 TB path: 4×16-bit chunk blocking — pigeonhole-total for
      // hamming <= 3 (a PROVABLE law, so unlike q39's LSH premise the
      // exact oracle applies on every corpus, no oracleMeasuredOn tie)
      import graft.multimodal.Media
      Media.phashBandedPairs(s,
          Media.imageHashTable(s, t(s, dir, "documents"), "doc_id"))
        .orderBy("id_a", "id_b")
    }),

    "q194_span_burden_by_source" -> ((s, dir) => {
      // provenance of span duplication: per source, the token mass the
      // exact-substring dedup (q189) would strip — the crawl-operator
      // view that says WHICH feed ships boilerplate (the q109 dedup-
      // rate question at span granularity). removed_fraction is an
      // unrounded exact-integer quotient (q107 discipline).
      val docs = t(s, dir, "documents")
      Dedup.stripDupSpans(docs, "doc_id", "text", 5)
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          sum(col("n_removed")).as("removed_tokens"))
        .withColumn("removed_fraction",
          col("removed_tokens").cast("double") / col("total_tokens"))
        .orderBy("source")
    }),

    "q193_decontaminate_spans" -> ((s, dir) => {
      // SURGICAL decontamination: q65 flags whole docs that share any
      // 5-gram with the src0 "benchmark" slice; this reports the exact
      // token spans to excise (stripSpans applies them) — quote-level
      // precision instead of document drops
      Dedup.contaminationSpans(t(s, dir, "documents"), "doc_id", "text",
          col("source") === "src0", 5)
        .orderBy("doc_id", "span_start")
    }),

    "q192_append_dup_spans" -> ((s, dir) => {
      // append-time exact-span dedup: spans in the arriving src0 batch
      // against the standing corpus + itself — batch-proportional
      // marking join over the one linear gram index; identical rows to
      // the symmetric q188 filtered to batch docs (law-proven), which
      // is exactly what the oracle computes
      val docs = t(s, dir, "documents")
      Dedup.incrementalDupSpans(
          docs.filter(col("source") =!= "src0"),
          docs.filter(col("source") === "src0"),
          "doc_id", "text", 5)
        .orderBy("doc_id", "span_start")
    }),

    "q188_dup_spans" -> ((s, dir) => {
      // exact duplicated-SPAN detection (Lee et al. ACL'22 ExactSubstr,
      // positional-n-gram formulation): every non-first occurrence of a
      // 5-token window marks its range; islands merge per doc. One
      // shuffle by shingle + one window by doc — no pair space.
      Dedup.dupSpans(t(s, dir, "documents"), "doc_id", "text", 5)
        .orderBy("doc_id", "span_start")
    }),

    "q195_top_dup_spans" -> ((s, dir) => {
      // boilerplate extraction: the distinct duplicated-span STRINGS
      // ranked by token burden — what exactly is being re-ingested
      // (license headers, chrome, quotes), before deciding to strip
      Dedup.topDupSpans(t(s, dir, "documents"), "doc_id", "text", 5, 20)
    }),

    "q198_hashed_tfidf" -> ((s, dir) => {
      // hashing-trick TF-IDF (Weinberger et al. 2009): model-free
      // document vectors in sparse (doc, bucket, weight) form —
      // deterministic md5 buckets, exact-decimal collision sums,
      // 12-dp-fixed smoothed idf
      TextStats.hashedTfidf(t(s, dir, "documents"), "doc_id", "text", 64)
        .filter(col("doc_id") < 10)
        .orderBy("doc_id", "bucket")
    }),

    "q200_text_semantic_dedup" -> ((s, dir) => {
      // model-free semantic near-dup, end to end: hashed TF-IDF
      // embeddings feed the exact cosine pair baseline — textual
      // near-dup PAIRS with no trained model anywhere in the loop
      // (the scale path swaps in embedNearDupLsh/semanticDedup over
      // the same embed step)
      Similarity.embedNearDup(
        TextStats.hashedTfidfEmbed(t(s, dir, "documents"),
          "doc_id", "text", 64),
        "doc_id", "embedding", 0.95)
        .orderBy("id_a", "id_b")
    }),

    "q199_text_ann" -> ((s, dir) => {
      // text→vector bridge, end to end: hash-embed every document
      // (dense assembly over q198's sparse rows) and rank doc 0's
      // nearest neighbours by cosine — similarity search over raw text
      // with NO trained model in the loop
      val emb = TextStats.hashedTfidfEmbed(
        t(s, dir, "documents"), "doc_id", "text", 64)
        .filter(Similarity.dot(col("embedding"), col("embedding")) > 0)
      Similarity.cosineTopK(emb, "doc_id", "embedding", 0L, 10)
    }),

    "q189_strip_dup_spans" -> ((s, dir) => {
      // exact-substring dedup applied: strip the q188 spans (first
      // occurrence kept corpus-wide), emit surviving text + counts
      Dedup.stripDupSpans(t(s, dir, "documents"), "doc_id", "text", 5)
        .orderBy("doc_id")
    }),

    "q186_guard_report" -> ((s, dir) => {
      // pre-flight guard headroom: every refusal guard's measured load
      // on this corpus in one table (the q107 discipline applied to the
      // guard family) — read BEFORE shipping a 100 TB job. The oracle
      // recomputes each linear pre-pass, with the perceptual-hash
      // chunk distribution replayed through the fixture's spread-bits
      // law in straight-line SQL.
      Guards.guardReport(s, t(s, dir, "documents"), t(s, dir, "embeddings"),
        t(s, dir, "events"), t(s, dir, "part"))
    }),

    "q185_dedup_funnel" -> ((s, dir) => {
      // the curation survivorship report: docs/tokens remaining under
      // the CUMULATIVE intersection of the three dedup stages (exact
      // hash keep → near-dup canonical keep → SemDeDup keep, each
      // computed corpus-wide as its own gate already proves) — ONE
      // corpus pass of conditional sums, stacked to stage rows; the
      // oracle splices all three component oracles (embeddings align
      // with documents by id in this corpus)
      val docs = t(s, dir, "documents")
      val base = docs.select(col("doc_id"),
        size(text.TextStats.tokens(col("text"))).cast("long").as("_nt"))
      val exactKeep = text.Dedup.exactGroups(docs, "doc_id", "text")
        .select(col("keep_id").as("doc_id"), lit(1).as("_ex"))
      val nearKeep = text.Clusters.canonicalFromClusters(docs, "doc_id",
          s.read.parquet(clustersFor(s, dir)),
          size(text.TextStats.tokens(col("text"))).cast("long"))
        .filter(col("keep"))
        .select(col("doc_id"), lit(1).as("_nd"))
      val semKeep = Similarity.semanticDedup(t(s, dir, "embeddings"),
          "vec_id", "embedding", nCentroids = 8, threshold = 0.4)
        .filter(col("keep"))
        .select(col("vec_id").as("doc_id"), lit(1).as("_sm"))
      val f = base.join(exactKeep, Seq("doc_id"), "left")
        .join(nearKeep, Seq("doc_id"), "left")
        .join(semKeep, Seq("doc_id"), "left")
      val ex = col("_ex").isNotNull
      val nd = ex && col("_nd").isNotNull
      val sm = nd && col("_sm").isNotNull
      def cnt(p: org.apache.spark.sql.Column) =
        sum(when(p, 1L).otherwise(0L))
      def tok(p: org.apache.spark.sql.Column) =
        coalesce(sum(when(p, col("_nt"))), lit(0L))
      f.agg(count(lit(1)).as("d0"), coalesce(sum(col("_nt")), lit(0L)).as("t0"),
          cnt(ex).as("d1"), tok(ex).as("t1"),
          cnt(nd).as("d2"), tok(nd).as("t2"),
          cnt(sm).as("d3"), tok(sm).as("t3"))
        .select(expr("stack(4, '0_all', d0, t0, '1_exact', d1, t1, " +
          "'2_near_dup', d2, t2, '3_semantic', d3, t3) " +
          "AS (stage, docs_kept, tokens_kept)"))
        .orderBy("stage")
    }),

    "q184_weighted_sample" -> ((s, dir) => {
      // length-weighted corpus sample (Efraimidis–Spirakis exponential
      // keys on the reproducible id-hash): top-100 by ln(u)/w,
      // TakeOrdered — never a global sort
      text.Curation.weightedSample(t(s, dir, "documents"), "doc_id",
        col("n_chars"), 100)
    }),

    "q183_interval_union" -> ((s, dir) => {
      // gaps-and-islands interval merge: each tick opens a window of
      // `value` seconds; overlapping/touching windows coalesce per
      // (instrument, day) — exact long microseconds end to end
      val ev = t(s, dir, "events").filter(col("value").isNotNull)
        .withColumn("day", to_date(col("ts")))
        .withColumn("_su", unix_micros(col("ts")))
        .withColumn("_eu", col("_su") +
          (col("value").cast(DecimalType(18, 6)) * 1000000).cast("long"))
      Windows.mergeIntervals(ev, Seq("event_type", "day"),
          col("_su"), col("_eu"), col("event_id"))
        .orderBy("event_type", "day")
    }),

    "q182_asof_forward" -> ((s, dir) => {
      // q22's as-of completed to the merge_asof surface: FORWARD
      // direction with a 1-hour tolerance — for each purchase the next
      // click within the hour, same one-shuffle union-window shape
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
      val clicks = ev.filter(col("event_type") === "click")
        .select("user_id", "ts", "event_id", "value")
      Joins.asOfJoin(purchases, clicks, Seq("user_id"), "ts", "ts",
          Seq(("value", "next_click_value")),
          leftTiebreak = Some("event_id"), rightTiebreak = Some("event_id"),
          direction = "forward", tolerance = Some(3600.0))
        .select("event_id", "user_id", "value", "next_click_value")
        .orderBy("event_id")
    }),

    "q180_unpivot" -> ((s, dir) => {
      // wide→long melt (the inverse of q27's pivot): four lineitem
      // measures unpivot into (measure, value) rows — a map-only
      // Expand, no shuffle before the aggregate
      t(s, dir, "lineitem")
        .unpivot(Array(col("l_orderkey")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "measure", "value")
        .groupBy("measure")
        .agg(count(col("value")).as("n"),
          round(sum(col("value").cast(DecimalType(18, 6))).cast("double"), 6)
            .as("total"))
        .orderBy("measure")
    }),

    "q181_null_semantics" -> ((s, dir) => {
      // null-handling semantics pinned: null-safe equality (<=>) vs
      // plain = over adjacent tick pairs — the three-valued-logic
      // corner every SQL engine must agree on
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("_pv", lag(col("value"), 1).over(w))
        .withColumn("_has", lag(lit(1), 1).over(w))
        .filter(col("_has").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("value") <=> col("_pv"), 1L).otherwise(0L))
            .as("n_nullsafe_eq"),
          sum(when(col("value") === col("_pv"), 1L).otherwise(0L))
            .as("n_plain_eq"),
          sum(when(col("value").isNull && col("_pv").isNull, 1L)
            .otherwise(0L)).as("n_both_null"))
        .orderBy("event_type")
    }),

    "q179_langid_accuracy" -> ((s, dir) => {
      // curation QA meta-gate: confusion matrix of the n-gram language
      // identifier (q34) against the corpus's ground-truth lang column
      // — the accuracy a pipeline operator reads before trusting
      // lang-routed filtering; oracle splices q34's own SQL. On this
      // corpus the matrix shows the labels are DECORRELATED from the
      // (English-function-word) text — every lang row predicts en or
      // unknown — which is the verdict this gate exists to surface:
      // don't route on these labels
      val docs = t(s, dir, "documents")
      docs.select(col("doc_id"), col("lang").as("true_lang"))
        .join(text.TextStats.langIdNgram(docs, "text")
          .select(col("doc_id"), col("pred_lang")), Seq("doc_id"))
        .groupBy("true_lang", "pred_lang")
        .agg(count(lit(1)).as("n"))
        .orderBy("true_lang", "pred_lang")
    }),

    "q178_gopher_rules" -> ((s, dir) => {
      // the standard named-threshold quality gate (Gopher rule family):
      // per-doc verdicts in exact integer arithmetic, map-only
      text.Curation.gopherFilter(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    "q177_csv_roundtrip" -> ((s, dir) => {
      // K4 export fidelity gate: the q59 bar frame through the REAL
      // single-file CSV export (coalesce + rename) and the PERMISSIVE
      // explicit-schema reader, then re-aggregated — the oracle
      // recomputes from parquet, so a hash match proves the CSV text
      // round-trips doubles/dates losslessly; n_corrupt pins a clean
      // parse through the quarantine column
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("event_type", StringType), StructField("bar", DateType),
        StructField("open", DoubleType), StructField("high", DoubleType),
        StructField("low", DoubleType), StructField("close", DoubleType),
        StructField("volume", DoubleType), StructField("n_ticks", LongType)))
      Ingest.fromCsv(s, csvBarsFor(s, dir), schema)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_bars"),
          round(sum(col("volume").cast(DecimalType(18, 2))).cast("double"), 2)
            .as("total_volume"),
          round(max(col("high")), 6).as("max_high"),
          round(min(col("low")), 6).as("min_low"),
          sum(col("n_ticks")).as("sum_ticks"),
          count(col("_corrupt_record")).as("n_corrupt"))
        .orderBy("event_type")
    }),

    "q176_corwin_schultz" -> ((s, dir) => {
      // quote-free bid-ask spread from daily ranges (Corwin–Schultz):
      // consecutive-bar pairs over the q59 bars, negative-to-zero
      // correction, neg_pairs as the paper's diagnostic
      Risk.corwinSchultz(t(s, dir, "events").filter(col("value").isNotNull),
          "event_type", to_date(col("ts")), Seq(col("ts"), col("event_id")),
          "value")
        .orderBy("event_type")
    }),

    "q175_ann_recall" -> ((s, dir) => {
      // index-quality gate: recall@10 of the PQ/ADC scan vs the exact
      // cosine scan for the probe vector — the oracle splices both
      // component queries' own SQL (the q172 composition discipline).
      // Round 8 this read 0.1 (sample-init 4x16 PQ — isotropic
      // synthetic embeddings are PQ's worst case at that budget); the
      // Lloyd-trained 16x64 codebook lifts it to 0.8, and the gate
      // still exists to surface any future drift before an index
      // ships.
      Similarity.annRecall(t(s, dir, "embeddings"), "vec_id", "embedding",
        0L, 10, nSub = 16, nCodes = 64, trainIters = 1)
    }),

    "q174_token_pmi" -> ((s, dir) => {
      // collocation mining: top-50 doc-level PMI pairs over the top-50
      // vocabulary, pairs with >= 5 co-occurring docs — vocab broadcast,
      // doc-keyed pair join, TakeOrdered final
      text.TextStats.tokenPmi(t(s, dir, "documents"), "doc_id", "text",
        vocabSize = 50, minPairDocs = 5L, topK = 50)
    }),

    "q173_jsonl_roundtrip" -> ((s, dir) => {
      // interchange-format fidelity gate: parquet → JSON-lines (once
      // per JVM) → inferred-schema scan → aggregate; the oracle
      // aggregates the parquet original, so a hash match proves the
      // jsonl write+infer+scan loses nothing — including null-field
      // omission (n_priced counts the survivors)
      Ingest.fromJsonDir(s, jsonlEventsFor(s, dir))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          round(sum(col("value").cast(DecimalType(18, 6))).cast("double"), 6)
            .as("total_value"),
          count_distinct(col("user_id")).as("n_users"),
          count(col("value")).as("n_priced"))
        .orderBy("event_type")
    }),

    "q172_instrument_profile" -> ((s, dir) => {
      // the desk's one-table instrument screen: sharpe, range vols,
      // hurst, Ljung–Box Q, max drawdown — five verified operators
      // joined on the key; the oracle splices their own SQL blocks
      Risk.instrumentProfile(t(s, dir, "events"), "event_type",
          Seq(col("ts"), col("event_id")), "value", to_date(col("ts")))
        .orderBy("event_type")
    }),

    "q171_rolling_beta" -> ((s, dir) => {
      // time-varying market exposure: q98's beta re-estimated over a
      // trailing 10-day frame per instrument — ticks reduce once to
      // bucket means, five exact-decimal sums on one window pass
      Stats.rollingBeta(t(s, dir, "events").filter(col("value").isNotNull),
          "event_type", to_date(col("ts")), col("value"), 10)
        .orderBy("event_type", "bucket")
    }),

    "q168_bm25" -> ((s, dir) => {
      // lexical retrieval scorer: Okapi BM25 (Lucene +1 idf form) of
      // every doc against a fixed topic probe — one token explode, the
      // match side filtered at the scan, constants broadcast
      text.TextStats.bm25(t(s, dir, "documents"), "doc_id", "text",
          Seq("spark", "vector", "merge"))
        .orderBy("doc_id")
    }),

    "q169_novelty" -> ((s, dir) => {
      // marginal-novelty curve: fraction of each doc's shingles first
      // seen at that doc (ingestion order = doc id) — one shingle-keyed
      // Exchange serves the first-seen window and the re-aggregation
      text.Dedup.noveltyFraction(t(s, dir, "documents"), "doc_id",
          "text", 5)
        .orderBy("doc_id")
    }),

    "q170_ljung_box" -> ((s, dir) => {
      // white-noise portmanteau test: Ljung–Box Q over the first 5
      // return autocorrelations per instrument — h extra lag exprs on
      // the one key-partitioned window pass, exact power sums
      Stats.ljungBox(t(s, dir, "events").filter(col("value").isNotNull),
          "event_type", Seq(col("ts"), col("event_id")), col("value"))
        .orderBy("event_type")
    }),

    "q167_corpus_overlap" -> ((s, dir) => {
      // slice-level vocabulary overlap: Jaccard of distinct 5-gram
      // sets per source pair — inverted-index self-join (pair fanout
      // bounded by slices-per-shingle, never doc count)
      text.Dedup.corpusOverlap(t(s, dir, "documents"), "source", "text", 5)
        .orderBy("slice_a", "slice_b")
    }),

    "q166_pq_adc" -> ((s, dir) => {
      // PQ/ADC approximate search (Jégou et al. 2011): 16 subspaces of
      // 4 dims, 64 trained codewords, query kept exact. Round-10: reads
      // the PERSISTED index with nProbe = every list — probing all 16
      // clusters IS the unpruned ADC scan, so the result (and the
      // oracle, which recomputes codebook TRAINING, assignment, and
      // ranking end to end) is unchanged while the per-call Lloyd
      // retraining moves to the once-per-JVM index build (q196
      // precedent: probe 0.63 s vs 2.24 s inline). q175 keeps the
      // self-contained inline-training member of the gate family.
      Similarity.ivfAdcProbeById(s, ivfAdcIndexFor(s, dir),
        t(s, dir, "embeddings"), "vec_id", "embedding", 0L, 10,
        nProbe = 16)
    }),

    "q165_neyman_sample" -> ((s, dir) => {
      // budgeted eval-set construction: 100 docs across source strata,
      // allocated ∝ n_s·σ(n_chars) (Neyman), integerized by
      // largest-remainder; within-stratum pick = multiplicative-hash
      // rank (the q96 sampler), so the sample is rerun-stable
      text.Curation.neymanSample(t(s, dir, "documents"), "source",
          "doc_id", col("n_chars"), 100)
        .orderBy("source", "sample_rank")
    }),

    "q163_range_volatility" -> ((s, dir) => {
      // range-based variance estimators (Parkinson / Garman–Klass /
      // Rogers–Satchell) over the q59 OHLC bars: the tick→bar reduction
      // happens once, estimators are map-only over bars, means are
      // exact 12-dp decimal sums
      Risk.rangeVolatility(t(s, dir, "events").filter(col("value").isNotNull),
          "event_type", to_date(col("ts")), Seq(col("ts"), col("event_id")),
          "value")
        .orderBy("event_type")
    }),

    "q164_hurst" -> ((s, dir) => {
      // long-memory diagnostic: Hurst exponent per instrument from the
      // aggregated-variance plot over block sizes 1,2,4,8,16 — the
      // tick-return explosion collapses in map-side partials, the
      // regression runs on ≤5 exact-decimal points per key
      Risk.hurstExponent(t(s, dir, "events").filter(col("value").isNotNull),
          "event_type", Seq(col("ts"), col("event_id")), col("value"))
        .orderBy("event_type")
    }),

    "q162_multimodal_append" -> ((s, dir) => {
      // q161's append verdicts extended to every modality: a src0 batch
      // doc is a duplicate if its text, image, OR audio near-duplicates
      // the standing corpus or another batch doc — all three edge
      // families run their asymmetric (batch-proportional) candidate
      // joins, one component walk decides, and the flags carry the
      // modality provenance. The oracle recomputes all three families
      // symmetrically and filters to new-side pairs. Round-10: the
      // standing corpus contributes its PERSISTED signature index
      // (built once per JVM) — the append tokenizes/hashes/decodes the
      // BATCH only; verdicts identical (law-tested), oracle unchanged.
      val docs = t(s, dir, "documents")
      multimodal.Curate.appendManifestIndexed(s,
          signatureIndexFor(s, dir, excludeSrc0 = true),
          docs.filter(col("source") === "src0"),
          "doc_id", "text")
        .orderBy("doc_id")
    }),

    "q161_append_dedup" -> ((s, dir) => {
      // incremental corpus-append dedup: src0 arrives as the new batch
      // against the already-ingested rest — near-dup candidates come
      // from prefix(new) ⋈ prefix(all), so the pair join scales with
      // the BATCH, never corpus² (the append-time question at 100 TB).
      // The oracle recomputes the full pair graph and filters to >=1
      // new side, proving the asymmetric candidate scheme loses nothing.
      // Round-10: corpus shingle/md5 signatures come from the persisted
      // index — only the batch is tokenized; verdicts identical.
      val docs = t(s, dir, "documents")
      text.Clusters.appendDedupIndexed(s,
          signatureIndexFor(s, dir, excludeSrc0 = true),
          docs.filter(col("source") === "src0"),
          "doc_id", "text")
        .orderBy("doc_id")
    }),

    "q160_multimodal_manifest" -> ((s, dir) => {
      // the unified multimodal curation surface: text exact+Jaccard,
      // image aHash, and audio energy-hash near-dup edges union into ONE
      // component walk, and keep/split both act on the unified cluster —
      // so no modality's near-dup pair can straddle a split (the q110
      // leakage audit reads zero per modality BY CONSTRUCTION; spec'd).
      // The oracle recomputes all three edge families in SQL (shared
      // shingle/jaccard CTEs + the popcount fixture law) and walks the
      // same union graph, so a hash match certifies the composition,
      // not just the parts. Round-10: reads the persisted EDGE index
      // (signatures → edges, both built once per JVM) — per call the
      // manifest pays the component walk and assembly only, the shape
      // a production pipeline has when it re-cuts splits from a
      // committed corpus version; output identical (law-tested).
      multimodal.Curate.manifestFromEdgeIndex(s, edgeIndexFor(s, dir),
          Seq(("train", 80), ("val", 10), ("test", 10)))
        .orderBy("doc_id")
    }),

    "q159_time_travel_ts" -> ((s, dir) => {
      // timestamp-based time travel (Delta's timestampAsOf) over REAL
      // commits: resolve v1's commit instant from the manifest history
      // and read through Snapshots.readTimestamp — the oracle recomputes
      // v1's contents straight off the source table (the q92 memo
      // commits v1/v2), so a hash match proves timestamp→version
      // resolution returns exactly the version that was live then.
      // (v1/v2 commit instants differ by construction: each commit is a
      // full Spark parquet write, far above millisecond resolution.)
      val path = cdcTableFor(s, dir)
      val ts1 = engine.Snapshots.commits(s, path)
        .find(_.version == 1L).get.committedAt
      engine.Snapshots.readTimestamp(s, path, ts1).orderBy("c_custkey")
    }),

    "q158_phash_canonical" -> ((s, dir) => {
      // the actionable end of image dedup: per perceptual cluster keep
      // the HIGHEST-RESOLUTION member (header-only dims probe, argmax
      // pixels, min id on ties) — near-dup groups are the same picture
      // at different sizes and the drop list IS the delete set; pixel
      // counts are id arithmetic (the fixture's 8s×8s geometry)
      import graft.multimodal.Media
      Media.phashCanonicalByPixels(s,
          Media.imageHashTable(s, t(s, dir, "documents"), "doc_id"))
        .orderBy("media_id")
    }),

    "q157_cluster_safe_splits" -> ((s, dir) => {
      // leakage-safe splits: hash the dup CLUSTER id, not the doc id —
      // every transitive near-dup group lands whole in one split, so
      // the q110 leak list is empty by construction (spec'd); the same
      // multiplicative-hash arithmetic as q101 keeps the oracle exact
      text.Clusters.clusterSafeSplits(t(s, dir, "documents"), "doc_id",
          "text", Seq(("train", 80), ("val", 10), ("test", 10)))
        .orderBy("doc_id")
    }),

    "q156_phash_clusters" -> ((s, dir) => {
      // perceptual dup pairs collapsed to the actionable keep-list:
      // hamming-banded pairs → connected components, min id canonical —
      // the q63 clustering convention on the image column, gated by a
      // recursive-CTE walk over the same popcount(xor) edge arithmetic
      import graft.multimodal.Media
      Media.phashClusters(s,
          Media.imageHashTable(s, t(s, dir, "documents"), "doc_id"))
        .orderBy("media_id")
    }),

    "q154_audiohash_pairs" -> ((s, dir) => {
      // perceptual audio dedup, exact twin: energy-hash the bit-pattern
      // WAV fixture (hash == π(id), the image fixture's permutation, so
      // the q152 popcount oracle applies verbatim and the gate proves
      // the PCM decode → 64-window energy → threshold pipeline)
      import graft.multimodal.Media
      Media.audioHashExactPairs(s,
          Media.audioHashTable(s, t(s, dir, "documents"), "doc_id"))
        .orderBy("id_a", "id_b")
    }),

    "q155_audiohash_banded" -> ((s, dir) => {
      // the scale path: same 4×16 pigeonhole blocking as q153 — the
      // exact oracle applies on every corpus, plus the hot-chunk guard
      import graft.multimodal.Media
      Media.audioHashBandedPairs(s,
          Media.audioHashTable(s, t(s, dir, "documents"), "doc_id"))
        .orderBy("id_a", "id_b")
    }),

    "q151_pii_extended" -> ((s, dir) => {
      // checksum-validated PII classes, oracle-gated in the q143 style:
      // id-derived VALID IBANs (mod-97 check digits computed in-query)
      // and Luhn cards (check digit from the closed form for a
      // repeated-digit body) are planted next to INVALID one-digit-off
      // twins — the redactor must scrub every valid item and leave
      // every invalid twin VERBATIM, so counts and redacted length are
      // id arithmetic and a checksum-less detector fails the gate in
      // both directions
      import org.apache.spark.sql.functions.{length => strlen}
      val bban = lpad((col("doc_id") % 1000000000L).cast("string"), 10, "0")
      val check = lpad((lit(98) -
          (bban.cast("long") * 1000000L + 131400L) % 97).cast("string"),
        2, "0")
      val iban = concat(lit("DE"), check, bban)
      // same check digits over a last-digit-bumped BBAN: mod-97 residue
      // shifts by ±10^k mod 97 ≠ 0, so the twin can never validate
      val ibanBad = concat(lit("DE"), check, substring(bban, 1, 9),
        ((substring(bban, 10, 1).cast("int") + 1) % 10).cast("string"))
      val d = (col("doc_id") % 10).cast("int")
      val f2 = when(d >= 5, d * 2 - 9).otherwise(d * 2) // doubled-digit fold
      val luhn = (lit(10) - (d * 7 + f2 * 8) % 10) % 10
      val card = concat(repeat(d.cast("string"), 15), luhn.cast("string"))
      val cardBad = concat(repeat(d.cast("string"), 15),
        ((luhn + 5) % 10).cast("string"))
      val ip6 = concat(lit("2001:db8::"), lower(hex(col("doc_id") % 256)))
      val planted = t(s, dir, "documents").select(col("doc_id"), concat(
        col("text"),
        repeat(concat(lit(" acct "), iban), (col("doc_id") % 2).cast("int")),
        repeat(concat(lit(" acct "), ibanBad),
          when(col("doc_id") % 3 === 0, 1).otherwise(0)),
        repeat(concat(lit(" card "), card),
          ((col("doc_id") + 1) % 2).cast("int")),
        repeat(concat(lit(" card "), cardBad),
          when(col("doc_id") % 3 === 1, 1).otherwise(0)),
        repeat(concat(lit(" node "), ip6),
          ((col("doc_id") + 2) % 3).cast("int"))).as("text"))
      text.Curation.redactPiiExtended(planted, "text")
        .select(col("doc_id"), col("n_iban"), col("n_card"), col("n_ip6"),
          col("n_redactions"),
          strlen(col("text")).cast("long").as("redacted_len"))
        .orderBy("doc_id")
    }),

    "q150_mjpeg_frames" -> ((s, dir) => {
      // REAL per-frame JPEG decode, oracle-gated: MJPEG AVIs whose
      // frames are gray fills with a distinct gray 8×8 patch — the
      // block-aligned grayscale fixture is EXACT through JPEG at
      // all-ones quant tables (pinned in MediaSpec), so channel sums
      // are id-arithmetic (Σ_f 64·u + (w·h−64)·v) and a header-only or
      // solid-color shortcut gets different numbers
      import graft.multimodal.Media
      val media = Media.videoMjpegTable(s, t(s, dir, "documents"), "doc_id")
      Media.extractVideoFrameFeatures(s, media).toDF()
        .select(col("media_id"), col("width"), col("height"),
          col("n_frames"), col("r_sum"), col("g_sum"), col("b_sum"),
          col("decoded"))
        .orderBy("media_id")
    }),

    "q148_vocab_churn" -> ((s, dir) => {
      // feature-level drift: top-20 vocabularies of the two corpus
      // versions (even/odd ids), overlap and Jaccard in one row
      val d = t(s, dir, "documents")
      text.TextStats.vocabChurn(
          d.filter(col("doc_id") % 2 === 0),
          d.filter(col("doc_id") % 2 === 1),
          "text", vocabSize = 20)
    }),

    "q149_embedding_drift" -> ((s, dir) => {
      // embedding-space drift: cosine between the two versions'
      // per-dimension mean vectors (even/odd vec_ids)
      val e = t(s, dir, "embeddings")
      Similarity.centroidDrift(
          e.filter(col("vec_id") % 2 === 0),
          e.filter(col("vec_id") % 2 === 1),
          "embedding")
    }),

    "q147_corpus_drift" -> ((s, dir) => {
      // corpus-version drift monitor: even vs odd doc_ids stand in for
      // two crawl versions; 50-char length buckets, add-one-smoothed
      // shares, per-bucket KL contribution + total — the gate hashes
      // the whole drift report
      val d = t(s, dir, "documents")
      text.TextStats.distributionDrift(
          d.filter(col("doc_id") % 2 === 0),
          d.filter(col("doc_id") % 2 === 1),
          floor(length(col("text")) / 50))
        .orderBy("bucket")
    }),

    "q146_image_pixels" -> ((s, dir) => {
      // REAL image pixel decode (JDK PNG inflate end-to-end), gated
      // like q142/q124: solid-fill PNGs with inverted top-left pixel,
      // channel sums recomputable from id arithmetic alone — pixel
      // truth now gates all three modalities (image/audio/video)
      import graft.multimodal.Media
      val media = Media.imagePixelTable(s, t(s, dir, "documents"), "doc_id")
      Media.extractImagePixels(s, media).toDF()
        .select(col("media_id"), col("width"), col("height"),
          col("r_sum"), col("g_sum"), col("b_sum"), col("decoded"))
        .orderBy("media_id")
    }),

    "q145_vocab_coverage" -> ((s, dir) => {
      // tokenizer/vocab fitness: fix the top-20 corpus vocabulary
      // (deterministic freq-then-token cut) and score every doc's OOV
      // rate — one explode feeds both the freq agg (top-V via
      // TakeOrderedAndProject) and the broadcast membership join
      text.TextStats.vocabCoverage(t(s, dir, "documents"), "doc_id",
          "text", vocabSize = 20)
        .orderBy("doc_id")
    }),

    "q144_leadlag_corr" -> ((s, dir) => {
      // which instrument moves first: per-pair best lead-lag over
      // hourly bucket returns (±3 observed buckets); ticks reduce to
      // the bucket-mean frame once, the lag stack rides one window
      // pass, and the pair expansion broadcast-joins aggregate frames
      Risk.leadLagCorr(t(s, dir, "events").filter(col("value").isNotNull),
          "event_type", date_trunc("hour", col("ts")), col("value"),
          maxLag = 3)
        .withColumn("best_lag", col("best_lag").cast("int"))
        .orderBy("key_a", "key_b")
    }),

    "q143_pii_redact" -> ((s, dir) => {
      // PII redaction graduated to a full oracle gate (the q142 move):
      // id-derived emails / phones / IPv4s are appended to the real
      // (verified PII-free) corpus text, redactPii scans with the REAL
      // Java-regex detectors, and both the redaction count and the
      // redacted LENGTH are recomputable from id arithmetic alone —
      // each PII type has distinct match/tag lengths, so the length
      // check catches a detector that misses or over-matches any type
      import org.apache.spark.sql.functions.{length => strlen}
      val pii = t(s, dir, "documents").select(col("doc_id"), concat(
        col("text"),
        expr("repeat(concat(' contact user', CAST(doc_id AS STRING), " +
          "'@example.com'), CAST(doc_id % 3 AS INT))"),
        expr("repeat(concat(' call +1-555-', " +
          "lpad(CAST(doc_id % 1000 AS STRING), 3, '0'), '-', " +
          "lpad(CAST(doc_id % 10000 AS STRING), 4, '0')), " +
          "CAST((doc_id + 1) % 3 AS INT))"),
        expr("repeat(concat(' host 10.0.', CAST(doc_id % 256 AS STRING), " +
          "'.7'), CAST((doc_id + 2) % 3 AS INT))")).as("text"))
      text.Curation.redactPii(pii, "text")
        .select(col("doc_id"), col("n_redactions"),
          strlen(col("text")).cast("long").as("redacted_len"))
        .orderBy("doc_id")
    }),

    "q140_portfolio_nav" -> ((s, dir) => {
      // the cross-section rolled up to a book: equal-weight mean of
      // per-instrument daily returns, compounded as exp(Σ ln(1+r̄)) —
      // the exact-sum form of a running product; the cumulative window
      // runs over the calendar-bounded day frame, never ticks
      Risk.portfolioNav(t(s, dir, "events").filter(col("value").isNotNull),
          "event_type", Seq(col("ts"), col("event_id")), col("value"),
          to_date(col("ts")))
        .orderBy("bucket")
    }),

    "q139_event_study" -> ((s, dir) => {
      // signal scoring: after a >2% up-tick, what do the next 1 and 5
      // ticks return, and how often are they positive? — the momentum
      // backtest over the same return primitive the alert queries use.
      // Threshold compared DECIMAL-to-DECIMAL (not r > 0.02 as a double
      // literal): the return is DECIMAL(16,9), and a return landing on
      // the 0.02 grid point would classify differently between engines
      // through DuckDB's not-correctly-rounded decimal→double cast
      Risk.eventStudy(t(s, dir, "events").filter(col("value").isNotNull),
          "event_type", Seq(col("ts"), col("event_id")), col("value"),
          horizons = Seq(1, 5),
          signal = r => r > lit("0.02").cast("decimal(16,9)"))
        .orderBy("event_type", "horizon")
    }),

    "q137_token_entropy" -> ((s, dir) => {
      // information density per source: unigram Shannon entropy via the
      // rearranged ln(N) − Σ f·ln(f)/N — ln once per DISTINCT token,
      // fixed as a decimal so the sum is order-independent; plus
      // H/ln(V) so different vocabulary sizes compare
      text.TextStats.tokenEntropy(t(s, dir, "documents"), "source", "text")
        .orderBy("source")
    }),

    "q138_variance_ratio" -> ((s, dir) => {
      // random-walk diagnostic: Var(5-day-ish overlapping q-period
      // returns) over 5·Var(tick returns) — VR>1 trends, VR<1 reverts;
      // both variances from ONE aggregation of exact power sums
      Risk.varianceRatio(t(s, dir, "events").filter(col("value").isNotNull),
          "event_type", Seq(col("ts"), col("event_id")), col("value"), q = 5)
        .orderBy("event_type")
    }),

    "q135_kyle_lambda" -> ((s, dir) => {
      // price-impact slope: Δp regressed on tick-rule signed volume —
      // what a parent order pays per unit of size; exact power sums
      // over (16,6)-capped inputs, one Exchange
      val ev = t(s, dir, "events").filter(col("value").isNotNull)
      Risk.kyleLambda(ev, "event_type", Seq(col("ts"), col("event_id")),
          col("value"), get_json_object(col("props"), "$.k").cast("long"))
        .orderBy("event_type")
    }),

    "q136_roll_spread" -> ((s, dir) => {
      // bid-ask bounce estimator: 2·√(−cov₁(Δp)) from trade prices
      // alone; positive autocovariance (trending tape) → NULL spread,
      // autocovariance still reported
      Risk.rollSpread(t(s, dir, "events").filter(col("value").isNotNull),
          "event_type", Seq(col("ts"), col("event_id")), col("value"))
        .orderBy("event_type")
    }),

    "q133_pair_spread" -> ((s, dir) => {
      // pairs-trading monitor: OLS hedge per instrument pair over
      // day-aligned means, then the latest day's residual z vs the
      // fit's σ — one tick-level agg, everything else on the
      // buckets × k frame; all pair stats (power sums + latest values
      // via tie-free max_by) from ONE grouped aggregation
      Risk.pairSpread(t(s, dir, "events").filter(col("value").isNotNull),
          "event_type", to_date(col("ts")), col("value"), zThreshold = 2.0)
        .orderBy("key_a", "key_b")
    }),

    "q134_vol_cone" -> ((s, dir) => {
      // vol term-structure envelope: min/mean/max of √(ΣRV/h) over all
      // complete h-day rolling windows, h ∈ {5,10,21} — the rich/cheap
      // context for q121's daily number; rolls over the DAY frame only
      val rv = Stats.realizedVariance(
        t(s, dir, "events").filter(col("value").isNotNull),
        "event_type", Seq(col("ts"), col("event_id")), col("value"),
        to_date(col("ts")))
      Risk.volCone(rv, "event_type", "bucket", "realized_variance",
          horizons = Seq(5, 10, 21))
        .orderBy("event_type", "horizon")
    }),

    "q131_containment_dups" -> ((s, dir) => {
      // asymmetric dup detection: shared/min(|A|,|B|) finds a small doc
      // copied inside a big one where Jaccard stays low (Broder's
      // containment); prefix-filter on the provably-smaller side joined
      // against the full shingle relation — never all-pairs
      text.Dedup.containmentPairs(t(s, dir, "documents"), "doc_id",
          "text", n = 5, threshold = 0.8)
        .orderBy("doc_a", "doc_b")
    }),

    "q132_zipf_slope" -> ((s, dir) => {
      // corpus-level quality: ln(freq)~ln(rank) slope over each source's
      // top-100 tokens — natural text sits near −1; templated or
      // machine-generated sources drift off (decimal-fixed ln values,
      // exact regression power sums)
      text.TextStats.zipfSlope(t(s, dir, "documents"), "source", "text",
          topK = 100)
        .orderBy("source")
    }),

    "q125_var_cvar" -> ((s, dir) => {
      // tail risk per instrument: historical VaR + expected shortfall at
      // α=0.05 by ORDER STATISTIC (k-th smallest return, exact decimal
      // tail mean) — multiset-deterministic, no interpolation to
      // diverge between engines; reported in return space (no −0.0
      // manufactured by a loss negation)
      Risk.varCvar(t(s, dir, "events").filter(col("value").isNotNull),
          "event_type", Seq(col("ts"), col("event_id")), col("value"),
          alpha = 0.05)
        .orderBy("event_type")
    }),

    "q126_sortino" -> ((s, dir) => {
      // downside-only risk adjustment: mean(r) over √(Σ min(r,0)²/n) —
      // the Sharpe variant that doesn't punish upside; same one-
      // aggregation exact-power-sum shape as q114
      Risk.sortino(t(s, dir, "events").filter(col("value").isNotNull),
          "event_type", Seq(col("ts"), col("event_id")), col("value"))
        .orderBy("event_type")
    }),

    "q127_flow_imbalance" -> ((s, dir) => {
      // tick-rule order flow: sign each tick by its price change (zero
      // ticks inherit the last non-zero sign), then Σ(sign·qty)/Σqty
      // per instrument-day — buy/sell pressure without a side flag
      val ev = t(s, dir, "events").filter(col("value").isNotNull)
      Risk.flowImbalance(ev, "event_type",
          Seq(col("ts"), col("event_id")), col("value"),
          get_json_object(col("props"), "$.k").cast("long"),
          to_date(col("ts")))
        .orderBy("event_type", "bucket")
    }),

    "q128_atr_channels" -> ((s, dir) => {
      // volatility channels over q59's daily OHLC bars: Wilder true
      // range, 14-bar ATR (NULL until a full window), and Donchian
      // breakout flags vs the PRIOR 14 bars' extremes — a bar-frame
      // window pass, no tick-stream shuffle
      val bars = Stats.ohlcBars(
        t(s, dir, "events").filter(col("value").isNotNull),
        Seq("event_type"), to_date(col("ts")),
        Seq(col("ts"), col("event_id")), "value")
      Risk.atrChannels(bars, "event_type", col("bar"), nBars = 14)
        .orderBy("event_type", "bar")
    }),

    "q129_momentum_rank" -> ((s, dir) => {
      // nightly winners/losers sort: per-day close-over-open return per
      // instrument, ranked cross-sectionally within the day (integer
      // decile arithmetic, no ntile tie lottery) — the portfolio-
      // formation transpose: key-clustered bars, then a bucket-
      // clustered rank over one row per (key, day)
      Risk.momentumRank(t(s, dir, "events").filter(col("value").isNotNull),
          "event_type", Seq(col("ts"), col("event_id")), col("value"),
          to_date(col("ts")))
        .orderBy("bucket", "event_type")
    }),

    "q130_intraday_profile" -> ((s, dir) => {
      // hour-of-day seasonality: tick count, mean |return|, and share
      // of the instrument's traded quantity per hour — the U-shape
      // diagnostic; share divides by a window total over the already-
      // aggregated (key × 24)-row frame
      Risk.intradayProfile(t(s, dir, "events").filter(col("value").isNotNull),
          "event_type", Seq(col("ts"), col("event_id")), col("ts"),
          col("value"), get_json_object(col("props"), "$.k").cast("long"))
        .orderBy("event_type", "hour_of_day")
    }),

    "q123_amihud" -> ((s, dir) => {
      // Amihud illiquidity per (instrument, day): mean |return| per unit
      // traded value — the price-impact proxy; exact decimal mean, one
      // Exchange (the q121 shape with a per-row liquidity quotient)
      val ev = t(s, dir, "events").filter(col("value").isNotNull)
        .withColumn("qty", get_json_object(col("props"), "$.k").cast("long"))
        .filter(col("qty").isNotNull)
      Stats.amihudIlliquidity(ev, "event_type",
          Seq(col("ts"), col("event_id")), col("value"), col("qty"),
          to_date(col("ts")))
        .orderBy("event_type", "bucket")
    }),

    "q100_level_alerts" -> ((s, dir) => {
      // live-tick scoring against static per-instrument levels (session
      // VWAP, latest EWMA, latest RSI regime, σ): the batch face of the
      // streaming market scorer — the identical scoreAgainstLevels code
      // runs on EventStream via the broadcast join (batch-equivalence
      // spec'd in VectorStreamSpec)
      val ev = t(s, dir, "events").filter(col("value").isNotNull)
        .withColumn("qty", get_json_object(col("props"), "$.k").cast("long"))
        .filter(col("qty").isNotNull)
      val levels = Stats.keyLevels(ev, "event_type",
        Seq(col("ts"), col("event_id")), "value", col("qty"))
      Stats.scoreAgainstLevels(ev, levels, "event_type", "value",
          "event_id", zThreshold = 1.5, vwapDevPct = 3.0)
        .orderBy("event_id")
    }),

    "q89_pagerank" -> ((s, dir) => {
      // document-centrality pass over the k-NN similarity graph: 3
      // PageRank iterations, per-row decimal-cast contribution sums so
      // ranks are order-independent (and oracle-reproducible bit-exact)
      val edges = Similarity.readKnnGraph(s, knnGraphFor(s, dir))
        .select("src", "dst")
      text.Clusters.pageRank(edges, "src", "dst", iters = 3)
        .select(col("node").as("vec_id"), round(col("pagerank"), 10).as("pagerank"))
        .orderBy("vec_id")
    }),

    "q88_boilerplate" -> ((s, dir) => {
      // CCNet-style line scrub: lines shared by >1 distinct docs are
      // boilerplate; docs reassemble from surviving lines in order
      text.Curation.stripBoilerplate(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    "q87_orc_roundtrip" -> ((s, dir) => {
      // format-fidelity gate: parquet → ORC (once per JVM) → aggregate;
      // the oracle aggregates the parquet table directly, so a hash
      // match proves the ORC write+scan loses nothing
      Ingest.fromOrc(s, orcEventsFor(s, dir))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          round(sum(col("value").cast(DecimalType(18, 6))).cast("double"), 6)
            .as("total_value"),
          count_distinct(col("user_id")).as("n_users"))
        .orderBy("event_type")
    }),

    "q42_embedding_norms" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .withColumn("l2_norm", round(Similarity.l2Norm(col("embedding")), 6))
        .groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
          round(sum(col("l2_norm").cast(DecimalType(18, 6))).cast("double"), 6).as("total_norm"))
        .orderBy("label")
    }),

    "q45_decile_stats" -> ((s, dir) => {
      // ntile distribution analysis with a deterministic total order.
      // An unpartitioned ntile is a single-reducer sort: every row flows
      // through ONE task. This query exists to pin exact ntile semantics
      // as the oracle-verifiable baseline; q52 (sketch cut points + map-
      // side bucketing) is the corpus-scale path. Guarded so the query
      // refuses to serialize a large input instead of silently stalling.
      val events = t(s, dir, "events")
      // bounded probe, not a full count: CollectLimit stops reading
      // once the cap is exceeded, so the guard never adds a full scan
      val cap = 10000000L
      require(events.limit((cap + 1).toInt).count() <= cap,
        s"q45's global ntile is single-reducer (> $cap rows); use " +
          "q52's sketch-cutpoint deciles at this scale")
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("value").asc, col("event_id").asc)
      events
        .withColumn("decile", ntile(10).over(w).cast("long"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n"),
          min(col("value")).as("lo"), max(col("value")).as("hi"),
          round(sum(col("value").cast(DecimalType(18, 2))).cast("double"), 2).as("total"))
        .orderBy("decile")
    }),

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
      // exact percentile (sort-based, one pass per group); at corpus scale
      // swap for approx_percentile — q44 pins the sketch-family plumbing
      t(s, dir, "events").groupBy(col("event_type"))
        .agg(expr("percentile(value, array(0.25, 0.5, 0.75))").as("ps"))
        .select(col("event_type"),
          round(element_at(col("ps"), 1), 6).as("p25"),
          round(element_at(col("ps"), 2), 6).as("p50"),
          round(element_at(col("ps"), 3), 6).as("p75"))
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
    }))

  /** Exact n-gram Jaccard pairs (q31's oracle). q32 (MinHash+LSH with
    * exact verification) shares it verbatim: precision is exact by
    * construction, and on this fixed corpus + fixed hash seeds the
    * banding recall is total (min qualifying jaccard 0.875), so the
    * deterministic outputs coincide — asserted, not assumed.
    */
  /** Shared DuckDB CTE fragment: whitespace tokens + distinct 5-gram
    * shingle sets per doc, with the short-doc whole-text fallback —
    * mirrors TokensExpr/ShinglesExpr exactly (same fragment the q31
    * oracle inlines). Used by the q63/q65 oracles.
    */
  /** Positional 5-gram duplicated-span CTE chain (q188/q189): grams
    * with 0-based positions and doc token counts, keep-first marking,
    * and the gaps-and-islands merge — shared verbatim by both oracles
    * so the span law cannot desync from the strip law.
    */
  private val posGramCte: String =
    """toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS w
      |  FROM documents),
      |words AS (
      |  SELECT doc_id, unnest(w) AS word, generate_subscripts(w, 1) AS i FROM toks),
      |grams AS (
      |  SELECT a.doc_id, CAST(a.i - 1 AS BIGINT) AS pos,
      |    a.word || ' ' || b.word || ' ' || c.word || ' ' || d.word || ' ' || e.word AS g,
      |    CAST(len(tk.w) AS BIGINT) AS ntok
      |  FROM words a
      |  JOIN words b ON b.doc_id = a.doc_id AND b.i = a.i + 1
      |  JOIN words c ON c.doc_id = a.doc_id AND c.i = a.i + 2
      |  JOIN words d ON d.doc_id = a.doc_id AND d.i = a.i + 3
      |  JOIN words e ON e.doc_id = a.doc_id AND e.i = a.i + 4
      |  JOIN toks tk ON tk.doc_id = a.doc_id
      |  UNION ALL
      |  SELECT doc_id, 0, array_to_string(w, ' '), CAST(len(w) AS BIGINT)
      |  FROM toks WHERE len(w) < 5)""".stripMargin

  /** Gaps-and-islands merge from a `rem(doc_id, s, e)` relation to
    * `spans` — ONE text shared by every span family (dup spans,
    * append spans, decontamination spans) so the merge law cannot
    * desync across oracles.
    */
  private val spanIslandCtes: String =
    """isl AS (
      |  SELECT doc_id, s, e,
      |    CASE WHEN MAX(e) OVER (PARTITION BY doc_id ORDER BY s ASC, e ASC
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
      |      OR s > MAX(e) OVER (PARTITION BY doc_id ORDER BY s ASC, e ASC
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
      |      THEN 1 ELSE 0 END AS brk
      |  FROM rem),
      |isl2 AS (
      |  SELECT doc_id, s, e,
      |    SUM(brk) OVER (PARTITION BY doc_id ORDER BY s ASC, e ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
      |  FROM isl),
      |spans AS (
      |  SELECT doc_id, MIN(s) AS span_start, MAX(e) AS span_end
      |  FROM isl2 GROUP BY doc_id, isl)""".stripMargin

  /** The hashing-trick TF-IDF chain (q198/q199): whitespace tokens →
    * tf → smoothed idf on the 12-dp grid → md5-bucket collision sums in
    * exact decimals, presented as doubles. Shared so the dense-vector
    * gate provably consumes the sparse gate's own weights.
    */
  private def hashedTfidfCte(dim: Int): String =
    s"""toksh AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(
      |    trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) AS token
      |  FROM documents),
      |tnz AS (SELECT doc_id, token FROM toksh WHERE token <> ''),
      |tfh AS (SELECT doc_id, token, COUNT(*) AS tf FROM tnz GROUP BY 1, 2),
      |dfh AS (SELECT token, COUNT(*) AS df FROM tfh GROUP BY 1),
      |ndh AS (SELECT COUNT(*) AS n FROM documents),
      |idfh AS (
      |  SELECT token,
      |    CAST(round(ln((CAST(n AS DOUBLE) + 1.0) / (CAST(df AS DOUBLE) + 1.0))
      |      + 1.0, 12) AS DECIMAL(16,12)) AS idf
      |  FROM dfh, ndh),
      |wts AS (
      |  SELECT doc_id,
      |    CAST('0x' || substr(md5(token), 1, 8) AS BIGINT) % $dim AS bucket,
      |    COUNT(*) AS n_terms,
      |    CAST(SUM(CAST(tf AS DECIMAL(7,0)) * idf) AS DOUBLE) AS weight
      |  FROM tfh JOIN idfh USING (token) GROUP BY 1, 2)""".stripMargin

  /** DSIR chain (q211/q212): hashed unigram+bigram features (the q73
    * bigram CTE shape incl. the short-doc fallback), dim-bucket raw
    * and target (lang='en') distributions with add-1 smoothing, each
    * ln fixed to the 12-dp grid SEPARATELY, llr and the weighted sum
    * exact decimals — replays [[graft.text.Curation.dsirLogWeights]]
    * bit-for-bit. Ends with a `dsir(doc_id, n_feats, log_weight)`
    * block for consumers to select from or splice onto.
    */
  private def dsirCte(dim: Int): String =
    s"""toks AS (
      |  SELECT doc_id, lang, regexp_split_to_array(
      |    trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS w
      |  FROM documents),
      |words AS (
      |  SELECT doc_id, lang, unnest(w) AS word,
      |    generate_subscripts(w, 1) AS i FROM toks),
      |feats AS (
      |  SELECT doc_id, lang, word AS feat FROM words WHERE word <> ''
      |  UNION ALL
      |  SELECT a.doc_id, a.lang, a.word || ' ' || b.word
      |  FROM words a JOIN words b ON b.doc_id = a.doc_id AND b.i = a.i + 1
      |  UNION ALL
      |  SELECT doc_id, lang, array_to_string(w, ' ')
      |  FROM toks WHERE len(w) < 2 AND array_to_string(w, ' ') <> ''),
      |fb AS (
      |  SELECT doc_id, lang,
      |    CAST('0x' || substr(md5(feat), 1, 8) AS BIGINT) % $dim AS bucket
      |  FROM feats),
      |perdoc AS (SELECT doc_id, bucket, COUNT(*) AS c FROM fb GROUP BY 1, 2),
      |dist AS (
      |  SELECT bucket, COUNT(*) AS c_raw,
      |    SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS c_tgt
      |  FROM fb GROUP BY 1),
      |tot AS (SELECT SUM(c_raw) AS t_raw, SUM(c_tgt) AS t_tgt FROM dist),
      |llr AS (
      |  SELECT bucket,
      |    CAST(ROUND(ln((c_tgt + 1) / CAST(t_tgt + $dim AS DOUBLE)), 12)
      |        AS DECIMAL(16,12))
      |      - CAST(ROUND(ln((c_raw + 1) / CAST(t_raw + $dim AS DOUBLE)), 12)
      |        AS DECIMAL(16,12)) AS llr
      |  FROM dist, tot),
      |dsir AS (
      |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_feats,
      |    ROUND(CAST(SUM(CAST(c AS DECIMAL(7,0)) * llr) AS DOUBLE), 6)
      |      AS log_weight
      |  FROM perdoc JOIN llr USING (bucket) GROUP BY doc_id)""".stripMargin

  private def dupSpanCte: String =
    s"""$posGramCte,
      |marked AS (
      |  SELECT doc_id, pos, least(pos + 4, ntok - 1) AS e,
      |    COUNT(*) OVER (PARTITION BY g) AS freq,
      |    row_number() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn
      |  FROM grams),
      |rem AS (SELECT doc_id, pos AS s, e FROM marked WHERE freq >= 2 AND rn > 1),
      |$spanIslandCtes""".stripMargin

  /** Span-level decontamination chain (q193): train grams marked by
    * membership in the eval corpus's distinct gram set — every eval
    * occurrence marks, no keep-first.
    */
  private def contamSpanCte: String =
    s"""$posGramCte,
      |evals AS (SELECT doc_id FROM documents WHERE source = 'src0'),
      |evsh AS (SELECT DISTINCT g FROM grams JOIN evals USING (doc_id)),
      |rem AS (
      |  SELECT gr.doc_id, gr.pos AS s, least(gr.pos + 4, gr.ntok - 1) AS e
      |  FROM grams gr
      |  WHERE gr.doc_id NOT IN (SELECT doc_id FROM evals)
      |    AND gr.g IN (SELECT g FROM evsh)),
      |$spanIslandCtes""".stripMargin

  /** Winnow-fingerprint CTE chain (k=3, w=4, the engine defaults) over
    * `documents`, shared VERBATIM by the q216 fingerprint dump, the
    * q217 overlap join, and the q186 hot_fingerprint guard row so the
    * three cannot desync (the shingleCte discipline). Ends in
    * `wfp(doc_id, pos, fp)` — the DISTINCT rightmost-minimal
    * selections, mirroring TextStats.winnowFingerprints exactly:
    * positional 3-gram md5-prefix hashes, window starts 0..n-4 (one
    * whole-doc window when shorter), rightmost minimum via
    * (h ASC, pos DESC) rank.
    */
  private val winnowCte: String =
    """wtk AS (
      |  SELECT doc_id,
      |    regexp_split_to_array(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS w
      |  FROM documents),
      |ww AS (
      |  SELECT doc_id, unnest(w) AS word, generate_subscripts(w, 1) AS i FROM wtk),
      |wg3 AS (
      |  SELECT a.doc_id, CAST(a.i - 1 AS BIGINT) AS pos,
      |    a.word || ' ' || b.word || ' ' || c.word AS g
      |  FROM ww a
      |  JOIN ww b ON b.doc_id = a.doc_id AND b.i = a.i + 1
      |  JOIN ww c ON c.doc_id = a.doc_id AND c.i = a.i + 2
      |  UNION ALL
      |  SELECT doc_id, 0, array_to_string(w, ' ') FROM wtk WHERE len(w) < 3),
      |wh3 AS (
      |  SELECT doc_id, pos, CAST('0x' || substr(md5(g), 1, 8) AS BIGINT) AS h
      |  FROM wg3),
      |wn3 AS (SELECT doc_id, MAX(pos) + 1 AS n FROM wh3 GROUP BY 1),
      |wwins AS (
      |  SELECT h.doc_id, h.pos AS ws FROM wh3 h JOIN wn3 USING (doc_id)
      |  WHERE h.pos <= n - 4 OR (n <= 4 AND h.pos = 0)),
      |wcand AS (
      |  SELECT wi.doc_id, wi.ws, h.pos, h.h FROM wwins wi
      |  JOIN wh3 h ON h.doc_id = wi.doc_id
      |    AND h.pos BETWEEN wi.ws AND wi.ws + 3),
      |wsel AS (
      |  SELECT doc_id, ws, pos, h FROM wcand
      |  QUALIFY row_number() OVER (PARTITION BY doc_id, ws
      |    ORDER BY h ASC, pos DESC) = 1),
      |wfp AS (SELECT DISTINCT doc_id, pos, h AS fp FROM wsel)""".stripMargin

  /** Trigram-OCCURRENCE CTE chain over `documents` (short docs fall
    * back to the whole-text gram, empty grams filtered) — ONE
    * generator shared by the q220 CMS, q221 HLL, and q222 per-source
    * HLL oracles so all three count the SAME gram stream the Spark
    * operators explode. Ends in `grams(gram[, source])`.
    */
  private def gram3Chain(withSrc: Boolean): String = {
    val sc = if (withSrc) ", source" else ""
    val scA = if (withSrc) ", a.source" else ""
    s"""tk AS (
      |  SELECT doc_id$sc,
      |    regexp_split_to_array(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS w
      |  FROM documents),
      |wd AS (
      |  SELECT doc_id$sc, unnest(w) AS word, generate_subscripts(w, 1) AS i FROM tk),
      |g AS (
      |  SELECT a.word || ' ' || b.word || ' ' || c.word AS gram$scA
      |  FROM wd a
      |  JOIN wd b ON b.doc_id = a.doc_id AND b.i = a.i + 1
      |  JOIN wd c ON c.doc_id = a.doc_id AND c.i = a.i + 2
      |  UNION ALL
      |  SELECT array_to_string(w, ' ') AS gram$sc FROM tk WHERE len(w) < 3),
      |grams AS (SELECT gram$sc FROM g WHERE gram <> '')""".stripMargin
  }

  private val gram3Cte: String = gram3Chain(withSrc = false)

  /** GENERATED q224 oracle: the bottom-k sketch, the merged pair
    * sample with θ and the membership flags, both estimates in the
    * engine's exact operation order, and the exact hash-set ground
    * truth — all off the source-carrying gram chain.
    */
  private def kmvOracleSql(k: Int): String = {
    // mirrors the engine's exact regime: a non-full merged sample
    // (k_eff < k) IS the union in hash space, so union_est = k_eff
    val uEst = s"CASE WHEN e.k_eff < $k THEN CAST(e.k_eff AS DOUBLE) " +
      s"WHEN e.theta > 0 " +
      s"THEN CAST((e.k_eff - 1) * 4294967296 AS DOUBLE) / e.theta END"
    s"""WITH ${gram3Chain(withSrc = true)},
      |hs AS (
      |  SELECT DISTINCT source AS slice,
      |    CAST('0x' || substr(md5(gram), 1, 8) AS BIGINT) AS h
      |  FROM grams),
      |bk AS (
      |  SELECT slice, h FROM hs
      |  QUALIFY row_number() OVER (PARTITION BY slice ORDER BY h) <= $k),
      |sl AS (SELECT DISTINCT slice FROM hs),
      |prs AS (
      |  SELECT a.slice AS slice_a, b.slice AS slice_b
      |  FROM sl a, sl b WHERE a.slice < b.slice),
      |hu AS (
      |  SELECT p.slice_a, p.slice_b, bk.h,
      |    MAX(CASE WHEN bk.slice = p.slice_a THEN 1 ELSE 0 END) AS ia,
      |    MAX(CASE WHEN bk.slice = p.slice_b THEN 1 ELSE 0 END) AS ib
      |  FROM prs p JOIN bk ON bk.slice IN (p.slice_a, p.slice_b)
      |  GROUP BY 1, 2, 3),
      |samp AS (
      |  SELECT * FROM hu
      |  QUALIFY row_number() OVER (PARTITION BY slice_a, slice_b
      |    ORDER BY h) <= $k),
      |est AS (
      |  SELECT slice_a, slice_b, CAST(COUNT(*) AS BIGINT) AS k_eff,
      |    MAX(h) AS theta,
      |    CAST(SUM(CASE WHEN ia = 1 AND ib = 1 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS c_inter
      |  FROM samp GROUP BY 1, 2),
      |ex AS (
      |  SELECT a.slice AS slice_a, b.slice AS slice_b,
      |    CAST(COUNT(*) AS BIGINT) AS n_inter
      |  FROM hs a JOIN hs b ON a.h = b.h AND a.slice < b.slice
      |  GROUP BY 1, 2),
      |sz AS (SELECT slice, CAST(COUNT(*) AS BIGINT) AS n_h
      |       FROM hs GROUP BY 1)
      |SELECT e.slice_a, e.slice_b, e.k_eff, e.theta, e.c_inter,
      |  $uEst AS union_est,
      |  (e.c_inter * ($uEst)) / e.k_eff AS inter_est,
      |  COALESCE(x.n_inter, CAST(0 AS BIGINT)) AS n_inter,
      |  sa.n_h + sb.n_h - COALESCE(x.n_inter, 0) AS n_union
      |FROM est e
      |LEFT JOIN ex x USING (slice_a, slice_b)
      |JOIN sz sa ON sa.slice = e.slice_a
      |JOIN sz sb ON sb.slice = e.slice_b
      |ORDER BY slice_a, slice_b""".stripMargin
  }

  /** The q217 winnow-pair oracle chain, parameterized by an extra
    * pair predicate — ONE generator for the full join (q217, empty
    * predicate) and the append restriction (q223), so the two cannot
    * drift.
    */
  private def winnowPairsOracleSql(extraWhere: String): String =
    s"""WITH $winnowCte,
      |dfp AS (SELECT DISTINCT doc_id, fp FROM wfp),
      |sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fp
      |       FROM dfp GROUP BY 1),
      |pr AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    CAST(COUNT(*) AS BIGINT) AS n_shared
      |  FROM dfp a JOIN dfp b
      |    ON a.fp = b.fp AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT p.doc_a, p.doc_b, sa.n_fp AS n_a, sb.n_fp AS n_b,
      |  p.n_shared,
      |  CAST(p.n_shared AS DOUBLE) / least(sa.n_fp, sb.n_fp)
      |    AS containment
      |FROM pr p
      |JOIN sz sa ON sa.doc_id = p.doc_a
      |JOIN sz sb ON sb.doc_id = p.doc_b
      |WHERE p.n_shared >= 2$extraWhere
      |ORDER BY doc_a, doc_b""".stripMargin

  /** GENERATED q221 oracle: the HLL register file and raw estimate
    * replayed exactly — md5 bucket/rank hashing, the exact integer
    * register sum Σ 2^(33−R), and the single IEEE division with the
    * SAME numerator constant ([[graft.text.TextStats.hllEstimateConst]],
    * embedded via Double.toString which round-trips bit-exactly).
    */
  private def hllOracleSql(p: Int): String = {
    val m = 1 << p
    val c = graft.text.TextStats.hllEstimateConst(p)
    s"""WITH $gram3Cte,
      |rk AS (
      |  SELECT CAST('0x' || substr(md5(gram), 1, 8) AS BIGINT) % $m AS bucket,
      |    CAST('0x' || substr(md5(gram), 9, 8) AS BIGINT) AS h2
      |  FROM grams),
      |rr AS (
      |  SELECT bucket,
      |    CASE WHEN h2 = 0 THEN 33 ELSE 33 - length(bin(h2)) END AS r
      |  FROM rk),
      |regs AS (SELECT bucket, MAX(r) AS r FROM rr GROUP BY 1),
      |fullr AS (
      |  SELECT COALESCE(g2.r, 0) AS r
      |  FROM (SELECT unnest(range(0, $m)) AS bucket) b
      |  LEFT JOIN regs g2 USING (bucket)),
      |s AS (
      |  SELECT CAST(SUM(CAST(1 AS BIGINT) << (33 - r)) AS BIGINT) AS s_scaled,
      |    CAST(SUM(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_zero
      |  FROM fullr),
      |x AS (SELECT CAST(COUNT(DISTINCT gram) AS BIGINT) AS n_exact FROM grams)
      |SELECT CAST($m AS BIGINT) AS m, v_zero, s_scaled, n_exact,
      |  CASE WHEN v_zero < $m THEN $c / s_scaled END AS raw_est,
      |  CASE WHEN v_zero < $m AND n_exact > 0
      |    THEN $c / s_scaled / n_exact END AS err_ratio
      |FROM s, x""".stripMargin
  }

  /** GENERATED q222 oracle: per-source HLL register files replayed
    * exactly off the source-carrying gram chain — same register math
    * as q221, grouped; all-empty slices read v_zero = m and NULL
    * estimates.
    */
  private def hllBySourceOracleSql(p: Int): String = {
    val m = 1 << p
    val c = graft.text.TextStats.hllEstimateConst(p)
    s"""WITH ${gram3Chain(withSrc = true)},
      |rk AS (
      |  SELECT source,
      |    CAST('0x' || substr(md5(gram), 1, 8) AS BIGINT) % $m AS bucket,
      |    CAST('0x' || substr(md5(gram), 9, 8) AS BIGINT) AS h2
      |  FROM grams),
      |rr AS (
      |  SELECT source, bucket,
      |    CASE WHEN h2 = 0 THEN 33 ELSE 33 - length(bin(h2)) END AS r
      |  FROM rk),
      |regs AS (SELECT source, bucket, MAX(r) AS r FROM rr GROUP BY 1, 2),
      |grid AS (
      |  SELECT s.source, b.bucket
      |  FROM (SELECT DISTINCT source FROM documents) s
      |  CROSS JOIN (SELECT unnest(range(0, $m)) AS bucket) b),
      |fullr AS (
      |  SELECT g2.source, COALESCE(r2.r, 0) AS r
      |  FROM grid g2 LEFT JOIN regs r2 USING (source, bucket)),
      |s AS (
      |  SELECT source,
      |    CAST(SUM(CAST(1 AS BIGINT) << (33 - r)) AS BIGINT) AS s_scaled,
      |    CAST(SUM(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_zero
      |  FROM fullr GROUP BY 1),
      |x AS (
      |  SELECT source, CAST(COUNT(DISTINCT gram) AS BIGINT) AS n_exact
      |  FROM grams GROUP BY 1)
      |SELECT s.source, s.v_zero, s.s_scaled,
      |  COALESCE(x.n_exact, CAST(0 AS BIGINT)) AS n_exact,
      |  CASE WHEN s.v_zero < $m THEN $c / s.s_scaled END AS raw_est,
      |  CASE WHEN s.v_zero < $m AND COALESCE(x.n_exact, 0) > 0
      |    THEN $c / s.s_scaled / x.n_exact END AS err_ratio
      |FROM s LEFT JOIN x USING (source)
      |ORDER BY source""".stripMargin
  }

  private val shingleCte: String =
    """toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS w
      |  FROM documents),
      |words AS (
      |  SELECT doc_id, unnest(w) AS word, generate_subscripts(w, 1) AS i FROM toks),
      |sh AS (
      |  SELECT DISTINCT a.doc_id,
      |    a.word || ' ' || b.word || ' ' || c.word || ' ' || d.word || ' ' || e.word AS shingle
      |  FROM words a
      |  JOIN words b ON b.doc_id = a.doc_id AND b.i = a.i + 1
      |  JOIN words c ON c.doc_id = a.doc_id AND c.i = a.i + 2
      |  JOIN words d ON d.doc_id = a.doc_id AND d.i = a.i + 3
      |  JOIN words e ON e.doc_id = a.doc_id AND e.i = a.i + 4
      |  UNION
      |  SELECT doc_id, array_to_string(w, ' ') AS shingle
      |  FROM toks WHERE len(w) < 5)""".stripMargin

  /** Near-dup pair CTE over `sh` (the [[shingleCte]] output): exact
    * 5-gram Jaccard at threshold 0.5 — ONE definition shared by the
    * q63/q109/q110 oracles so a threshold or formula change cannot
    * desync the parity proofs.
    */
  private val jacPairsCte: String =
    """sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
      |shared AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |jac AS (
      |  SELECT doc_a, doc_b FROM shared
      |  JOIN sizes sa ON sa.doc_id = doc_a
      |  JOIN sizes sb ON sb.doc_id = doc_b
      |  WHERE CAST(shared AS DOUBLE) / (sa.n_sh + sb.n_sh - shared) >= 0.5)""".stripMargin

  /** Exact-dup edges + the recursive min-label component walk over
    * `jac` — the CC oracle shared by q63/q109.
    */
  private val ccWalkCte: String =
    """exact AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM documents a
      |  JOIN documents b ON md5(a.text) = md5(b.text) AND a.doc_id < b.doc_id),
      |edges AS (
      |  SELECT doc_a AS u, doc_b AS v FROM jac
      |  UNION SELECT doc_b, doc_a FROM jac
      |  UNION SELECT doc_a, doc_b FROM exact
      |  UNION SELECT doc_b, doc_a FROM exact),
      |walk(node, comp) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT e.v, w.comp FROM walk w
      |  JOIN edges e ON e.u = w.node WHERE w.comp < e.v)""".stripMargin

  /** Exact near-dup pairs by id popcount — the shared oracle of the
    * perceptual family (q152/q153 image, q154/q155 audio): both
    * fixtures hash to the same bit permutation of the id, and a bit
    * permutation commutes with xor.
    */
  private val hammingPairsOracle: String =
    """SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(bit_count(xor(a.doc_id, b.doc_id)) AS INT) AS hamming
      |FROM documents a JOIN documents b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.doc_id, b.doc_id)) <= 3
      |ORDER BY id_a, id_b""".stripMargin

  /** Popcount edges + the recursive min-label walk over them — the
    * cluster CTE shared by the q156/q158 oracles (the [[ccWalkCte]]
    * shape on the perceptual edge arithmetic).
    */
  private val phashWalkCte: String =
    """edges AS (
      |  SELECT a.doc_id AS u, b.doc_id AS v
      |  FROM documents a JOIN documents b
      |    ON a.doc_id <> b.doc_id
      |   AND bit_count(xor(a.doc_id, b.doc_id)) <= 3),
      |walk(node, comp) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT e.v, w.comp FROM walk w
      |  JOIN edges e ON e.u = w.node WHERE w.comp < e.v),
      |cl AS (
      |  SELECT node AS media_id, MIN(comp) AS cluster_id
      |  FROM walk GROUP BY node)""".stripMargin

  /** Exact brute-force cosine top-10 for vec_id 0 (q40's oracle). q41
    * (IVF probe search) shares it verbatim: with ivfTopK's DEFAULT
    * stride-initialized centroids and the configured probe width,
    * recall on this corpus is total — the driver gate asserts the
    * pruning loses nothing (verified equal at sf0.001 and sf0.01).
    * (k-means refinement is opt-in and on this isotropic testdata
    * REDUCES probe recall — see Similarity.kmeansCentroids doc.)
    */
  private val cosineTopKOracle: String =
    """WITH q AS (
      |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
      |  FROM embeddings WHERE vec_id = 0),
      |c AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings WHERE vec_id <> 0)
      |SELECT vec_id,
      |  round(list_dot_product(v, qv) /
      |    (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS cos_sim
      |FROM c, q
      |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin

  // exact all-pairs cosine near-dup — shared by q38 (exact operator) and
  // q39 (hyperplane LSH at nBands=24, where recall on this corpus is
  // total and precision is exact by the verify step, so the banding must
  // lose nothing — same gate shape as q32/q41)
  private val embedNearDupOracle: String =
    """WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings
      |  WHERE list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
      |    list_transform(embedding, x -> CAST(x AS DOUBLE))) > 0),
      |pairs AS (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |    round(list_dot_product(a.v, b.v) /
      |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cos_sim
      |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
      |SELECT id_a, id_b, cos_sim FROM pairs
      |WHERE cos_sim >= 0.4 ORDER BY id_a, id_b""".stripMargin

  private val jaccardPairsOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS w
      |  FROM documents),
      |words AS (
      |  SELECT doc_id, unnest(w) AS word, generate_subscripts(w, 1) AS i FROM toks),
      |sh AS (
      |  SELECT DISTINCT a.doc_id,
      |    a.word || ' ' || b.word || ' ' || c.word || ' ' || d.word || ' ' || e.word AS shingle
      |  FROM words a
      |  JOIN words b ON b.doc_id = a.doc_id AND b.i = a.i + 1
      |  JOIN words c ON c.doc_id = a.doc_id AND c.i = a.i + 2
      |  JOIN words d ON d.doc_id = a.doc_id AND d.i = a.i + 3
      |  JOIN words e ON e.doc_id = a.doc_id AND e.i = a.i + 4
      |  UNION
      |  -- short-doc fallback: docs under n tokens contribute one
      |  -- whole-document shingle (mirrors ShinglesExpr)
      |  SELECT doc_id, array_to_string(w, ' ') AS shingle
      |  FROM toks WHERE len(w) < 5),
      |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
      |shared AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT doc_a, doc_b, jaccard FROM (
      |  SELECT doc_a, doc_b,
      |    CAST(shared AS DOUBLE) / (sa.n_sh + sb.n_sh - shared) AS jaccard
      |  FROM shared
      |  JOIN sizes sa ON sa.doc_id = doc_a
      |  JOIN sizes sb ON sb.doc_id = doc_b)
      |WHERE jaccard >= 0.5 ORDER BY doc_a, doc_b""".stripMargin

  /** Corpora (sf-dir basenames) on which each approximate operator's
    * exact-twin oracle premise is MEASURED to hold. The q31/q32,
    * q38/q39, q40/q41/q81 gates assert approximate == exact verbatim —
    * an equality that is a measured fact of (corpus, seed, parameters),
    * not a law: 24-band hyperplane LSH loses nothing at sf0.01 (59/59)
    * but misses 3/66 pairs at sf0.001 and 8/920 at sf0.1, while the
    * minhash banding (min qualifying jaccard 0.875) and the IVF probe
    * are measured total on all three testdata corpora. Verify emits
    * these oracles only when its sf dir is in the query's measured set
    * and omits them elsewhere, so pointing the gate at an unmeasured
    * corpus records the honest weaker rows-check instead of converting
    * a probabilistic recall property into a spurious hash failure
    * (round-6 ADVICE). Queries absent from this map are
    * corpus-unconditional.
    */
  val oracleMeasuredOn: Map[String, Set[String]] = Map(
    "q32_minhash_lsh" -> Set("sf0.001", "sf0.01", "sf0.1"),
    "q190_ivfadc" -> Set("sf0.001", "sf0.01", "sf0.1"),
    "q196_ivfadc_probe" -> Set("sf0.001", "sf0.01", "sf0.1"),
    "q197_ann_join" -> Set("sf0.001", "sf0.01", "sf0.1"),
    "q201_pq_reconstruction" -> Set("sf0.001", "sf0.01", "sf0.1"),
    "q191_ivfadc_recall" -> Set("sf0.001", "sf0.01", "sf0.1"),
    "q39_embed_neardup_lsh" -> Set("sf0.01"),
    "q41_ivf_topk" -> Set("sf0.001", "sf0.01", "sf0.1"),
    "q81_ivf_probe" -> Set("sf0.001", "sf0.01", "sf0.1"))

  /** The q172 composite joins five per-instrument oracle blocks — each
    * spliced VERBATIM from the map entry of the operator it reuses
    * (nested-WITH subqueries), so the composite cannot drift from the
    * parts it claims to compose.
    */
  def oracleSql: Map[String, String] = {
    val base = oracleSqlBase
    def block(q: String) = s"(SELECT * FROM (\n${base(q)}\n))"
    base + ("q172_instrument_profile" ->
      s"""WITH sh AS ${block("q114_sharpe")},
        |rv AS ${block("q163_range_volatility")},
        |hu AS ${block("q164_hurst")},
        |lb AS ${block("q170_ljung_box")},
        |dd AS ${block("q84_max_drawdown")}
        |SELECT event_type, n_ticks, sh.n_returns AS n_returns, mean_return,
        |  sharpe, n_bars, parkinson, garman_klass, rogers_satchell, hurst,
        |  q_stat, max_drawdown
        |FROM sh JOIN rv USING (event_type) JOIN hu USING (event_type)
        |JOIN lb USING (event_type) JOIN dd USING (event_type)
        |ORDER BY event_type""".stripMargin) +
    ("q175_ann_recall" ->
      s"""WITH ex AS ${block("q40_cosine_topk")},
        |ap AS ${block("q166_pq_adc")}
        |SELECT 10 AS k, CAST(COUNT(*) AS BIGINT) AS n_overlap,
        |  CASE WHEN (SELECT COUNT(*) FROM ex) = 0 THEN CAST(0 AS DOUBLE)
        |    ELSE CAST(COUNT(*) AS DOUBLE)
        |      / least(10, (SELECT COUNT(*) FROM ex)) END AS recall
        |FROM ex JOIN ap USING (vec_id)""".stripMargin) +
    ("q194_span_burden_by_source" ->
      s"""WITH f AS ${block("q189_strip_dup_spans")}
        |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(f.n_tokens) AS BIGINT) AS total_tokens,
        |  CAST(SUM(f.n_removed) AS BIGINT) AS removed_tokens,
        |  CAST(SUM(f.n_removed) AS DOUBLE) / SUM(f.n_tokens)
        |    AS removed_fraction
        |FROM f JOIN documents d USING (doc_id)
        |GROUP BY d.source ORDER BY d.source""".stripMargin) +
    ("q191_ivfadc_recall" ->
      s"""WITH ex AS ${block("q40_cosine_topk")},
        |ap AS ${block("q196_ivfadc_probe")}
        |SELECT 10 AS k, CAST(COUNT(*) AS BIGINT) AS n_overlap,
        |  CASE WHEN (SELECT COUNT(*) FROM ex) = 0 THEN CAST(0 AS DOUBLE)
        |    ELSE CAST(COUNT(*) AS DOUBLE)
        |      / least(10, (SELECT COUNT(*) FROM ex)) END AS recall
        |FROM ex JOIN ap USING (vec_id)""".stripMargin) +
    ("q207_rivfadc_recall" ->
      s"""WITH ex AS ${block("q40_cosine_topk")},
        |ap AS ${block("q206_rivfadc")}
        |SELECT 10 AS k, CAST(COUNT(*) AS BIGINT) AS n_overlap,
        |  CASE WHEN (SELECT COUNT(*) FROM ex) = 0 THEN CAST(0 AS DOUBLE)
        |    ELSE CAST(COUNT(*) AS DOUBLE)
        |      / least(10, (SELECT COUNT(*) FROM ex)) END AS recall
        |FROM ex JOIN ap USING (vec_id)""".stripMargin) +
    // q226: the outer CTE `embeddings` SHADOWS the parquet table for
    // every nested component chain (standard CTE scoping, verified in
    // DuckDB) — the exact/raw/residual oracles replay unchanged over
    // the regenerated clustered corpus
    ("q226_rivfadc_clustered" ->
      s"""WITH embeddings AS (
        |$clusteredFixtureSql),
        |ex AS (SELECT * FROM (
        |$cosineTopKOracle
        |)),
        |rw AS (SELECT * FROM (
        |${pqAdcOracleSql(restricted = true, queryId = 0L)}
        |)),
        |rs AS (SELECT * FROM (
        |${rAdcOracleSql(0L)}
        |))
        |SELECT * FROM (
        |  SELECT 'raw' AS family, 10 AS k,
        |    CAST((SELECT COUNT(*) FROM ex JOIN rw USING (vec_id)) AS BIGINT)
        |      AS n_overlap,
        |    CASE WHEN (SELECT COUNT(*) FROM ex) = 0 THEN CAST(0 AS DOUBLE)
        |      ELSE CAST((SELECT COUNT(*) FROM ex JOIN rw USING (vec_id)) AS DOUBLE)
        |        / least(10, (SELECT COUNT(*) FROM ex)) END AS recall
        |  UNION ALL
        |  SELECT 'residual', 10,
        |    CAST((SELECT COUNT(*) FROM ex JOIN rs USING (vec_id)) AS BIGINT),
        |    CASE WHEN (SELECT COUNT(*) FROM ex) = 0 THEN CAST(0 AS DOUBLE)
        |      ELSE CAST((SELECT COUNT(*) FROM ex JOIN rs USING (vec_id)) AS DOUBLE)
        |        / least(10, (SELECT COUNT(*) FROM ex)) END)
        |ORDER BY family""".stripMargin) +
    ("q209_rerank_recall" ->
      s"""WITH ex AS ${block("q40_cosine_topk")},
        |ap AS ${block("q208_adc_rerank")}
        |SELECT 10 AS k, CAST(COUNT(*) AS BIGINT) AS n_overlap,
        |  CASE WHEN (SELECT COUNT(*) FROM ex) = 0 THEN CAST(0 AS DOUBLE)
        |    ELSE CAST(COUNT(*) AS DOUBLE)
        |      / least(10, (SELECT COUNT(*) FROM ex)) END AS recall
        |FROM ex JOIN ap USING (vec_id)""".stripMargin) +
    ("q179_langid_accuracy" ->
      s"""WITH p AS ${block("q34_lang_id")}
        |SELECT d.lang AS true_lang, p.pred_lang, COUNT(*) AS n
        |FROM documents d JOIN p USING (doc_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) +
    ("q185_dedup_funnel" ->
      s"""WITH ex AS ${block("q30_dedup_exact")},
        |nd AS ${block("q116_canonical_docs")},
        |sm AS ${block("q118_semantic_dedup")},
        |tok AS (
        |  SELECT doc_id, CAST(len(regexp_split_to_array(
        |    trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) AS BIGINT)
        |    AS nt
        |  FROM documents),
        |f AS (
        |  SELECT t.doc_id, t.nt,
        |    t.doc_id IN (SELECT keep_id FROM ex) AS ke,
        |    COALESCE(nd.keep, FALSE) AS kn,
        |    COALESCE(sm.keep, FALSE) AS ks
        |  FROM tok t
        |  LEFT JOIN nd ON nd.doc_id = t.doc_id
        |  LEFT JOIN sm ON sm.vec_id = t.doc_id)
        |SELECT stage, CAST(docs_kept AS BIGINT) AS docs_kept,
        |  CAST(tokens_kept AS BIGINT) AS tokens_kept FROM (
        |  SELECT '0_all' AS stage, COUNT(*) AS docs_kept,
        |    COALESCE(SUM(nt), 0) AS tokens_kept FROM f
        |  UNION ALL
        |  SELECT '1_exact', COUNT(*) FILTER (WHERE ke),
        |    COALESCE(SUM(nt) FILTER (WHERE ke), 0) FROM f
        |  UNION ALL
        |  SELECT '2_near_dup', COUNT(*) FILTER (WHERE ke AND kn),
        |    COALESCE(SUM(nt) FILTER (WHERE ke AND kn), 0) FROM f
        |  UNION ALL
        |  SELECT '3_semantic', COUNT(*) FILTER (WHERE ke AND kn AND ks),
        |    COALESCE(SUM(nt) FILTER (WHERE ke AND kn AND ks), 0) FROM f)
        |ORDER BY stage""".stripMargin)
  }

  /** Language-ID oracle fragments GENERATED from the engine's own
    * profile/fixture literals ([[graft.text.TextStats.LangProfiles]],
    * `LangFixture`) — the jacPairsCte discipline: one source of truth,
    * the oracle cannot drift from the operator. The per-term
    * occurrence count uses the exact replace-length identity; every
    * term casts to BIGINT before the sum (mirroring the engine's
    * per-term `.cast("long")`).
    */
  private def langScoreSelectSql: String =
    graft.text.TextStats.LangProfiles.map { case (lang, profile) =>
      val terms = profile.map { case (g, w) =>
        val gq = g.replace("'", "''")
        s"CAST((length(t) - length(replace(t, '$gq', ''))) / ${g.length} * $w AS BIGINT)"
      }.mkString("\n      + ")
      s"    $terms AS score_$lang"
    }.mkString(",\n")

  private def langScoreCols: String =
    graft.text.TextStats.LangProfiles.map("score_" + _._1).mkString(", ")

  private def langPredCaseSql: String = {
    val langs = graft.text.TextStats.LangProfiles.map(_._1)
    val g = langs.map("score_" + _).mkString("greatest(", ", ", ")")
    val whens = langs.init
      .map(l => s"WHEN score_$l = $g THEN '$l'").mkString(" ")
    s"CASE WHEN $g = 0 THEN 'unknown' $whens ELSE '${langs.last}' END"
  }

  /** Media's fixture bit permutation (spreadBits: bit k → bit (5k & 63))
    * as straight-line SQL — 64 masked terms summed in two's complement
    * (the bit-63 place value is BIGINT min, written overflow-free).
    * Generated so the oracle's chunk-distribution replay cannot drift
    * from the Scala fixture law.
    */
  private def spreadBitsSql(x: String): String =
    (0 until 64).map { k =>
      val shift = (5 * k) & 63
      val c = if (shift == 63) "(-9223372036854775807 - 1)"
        else (1L << shift).toString
      s"((($x >> $k) & 1) * $c)"
    }.grouped(4).map(_.mkString(" + ")).mkString("\n        + ")

  private def guardRowSql(guard: String, op: String, measured: String): String = {
    val bound = graft.ops.Guards.DefaultBounds(guard)
    s"""SELECT '$guard' AS guard, '$op' AS operator,
       |  CAST($bound AS BIGINT) AS bound,
       |  CAST(($measured) AS BIGINT) AS measured""".stripMargin
  }

  /** The q166 trained-PQ/ADC oracle, parameterized by the IVFADC
    * restriction (q190): ONE chain for both entries so the composition
    * provably shares the unpruned scan's codebook, training, and
    * distance arithmetic — only the scan source differs.
    */
  /** The PQ training + assignment CTE chain through `base`, `cb`, and
    * `asg` — shared by the ADC search oracles (q166/q190/q196/q197)
    * and the reconstruction-error gate (q201), so every consumer
    * provably replays the SAME training.
    */
  private def pqTrainCtes(restricted: Boolean,
                          queryId: Long = 0L): String = {
    val dv = "x -> CAST(x AS DOUBLE)"
    val ivfCtes = if (!restricted) "" else s"""
      |cents AS (
      |  SELECT vec_id AS cid,
      |    list_transform(embedding, $dv) AS cv
      |  FROM embeddings
      |  WHERE sqrt(list_dot_product(list_transform(embedding, $dv),
      |      list_transform(embedding, $dv))) > 0
      |    AND vec_id % 31 = 0
      |  ORDER BY vec_id ASC LIMIT 16),
      |qv2 AS (
      |  SELECT list_transform(embedding, $dv) AS qv2
      |  FROM embeddings WHERE vec_id = $queryId),
      |probed AS (
      |  SELECT cid AS cluster FROM (
      |    SELECT c.cid,
      |      list_dot_product(cv, qv2) / (sqrt(list_dot_product(cv, cv))
      |        * sqrt(list_dot_product(qv2, qv2))) AS cs2
      |    FROM cents c, qv2)
      |  ORDER BY cs2 DESC, cluster ASC LIMIT 4),
      |iasg AS (
      |  SELECT vec_id, cid AS cluster FROM (
      |    SELECT e.vec_id, c.cid,
      |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |        (list_dot_product(ev, cv) / (sqrt(list_dot_product(ev, ev))
      |          * sqrt(list_dot_product(cv, cv)))) DESC, c.cid DESC) AS rn
      |    FROM (SELECT vec_id, list_transform(embedding, $dv) AS ev
      |          FROM embeddings) e
      |    CROSS JOIN cents c) WHERE rn = 1),
      |cands AS (SELECT vec_id FROM iasg JOIN probed USING (cluster)),""".stripMargin
    val scanJoin = if (restricted) "JOIN cands USING (vec_id) " else ""
    s"""WITH sub AS (SELECT unnest(range(0, 16)) AS s),$ivfCtes
      |base AS (
      |  SELECT vec_id, s,
      |    list_transform(list_slice(embedding, s*4+1, s*4+4),
      |      $dv) AS sv
      |  FROM embeddings CROSS JOIN sub),
      |cbids AS (SELECT vec_id FROM embeddings ORDER BY vec_id ASC LIMIT 64),
      |cb0 AS (
      |  SELECT s AS cs, b.vec_id AS code, sv AS cw
      |  FROM base b JOIN cbids USING (vec_id)),
      |asg0 AS (
      |  SELECT vec_id, s, sv, code FROM (
      |    SELECT b.vec_id, b.s, b.sv, c.code,
      |      row_number() OVER (PARTITION BY b.vec_id, b.s ORDER BY
      |        (list_dot_product(sv, sv)
      |          - CAST(2 AS DOUBLE) * list_dot_product(sv, cw)
      |          + list_dot_product(cw, cw)) ASC, c.code ASC) AS rn
      |    FROM base b JOIN cb0 c ON c.cs = b.s) WHERE rn = 1),
      |mexp AS (
      |  SELECT s, code, generate_subscripts(sv, 1) AS pos,
      |    unnest(sv) AS e
      |  FROM asg0),
      |means AS (
      |  SELECT s AS ms, code AS mcode, list(m ORDER BY pos ASC) AS cw2
      |  FROM (
      |    SELECT s, code, pos,
      |      round(CAST(SUM(CAST(e AS DECIMAL(27,10))) AS DOUBLE)
      |        / COUNT(*), 6) AS m
      |    FROM mexp GROUP BY s, code, pos)
      |  GROUP BY s, code),
      |cb AS (
      |  SELECT cs, code, COALESCE(cw2, cw) AS cw
      |  FROM cb0 LEFT JOIN means ON ms = cs AND mcode = code),
      |asg AS (
      |  SELECT vec_id, s, code FROM (
      |    SELECT b.vec_id, b.s, c.code,
      |      row_number() OVER (PARTITION BY b.vec_id, b.s ORDER BY
      |        (list_dot_product(sv, sv)
      |          - CAST(2 AS DOUBLE) * list_dot_product(sv, cw)
      |          + list_dot_product(cw, cw)) ASC, c.code ASC) AS rn
      |    FROM base b ${scanJoin}JOIN cb c ON c.cs = b.s) WHERE rn = 1),
      |q AS (SELECT s AS qs, sv AS qv FROM base WHERE vec_id = $queryId)""".stripMargin
  }

  /** q205's FIXED merge table — a stand-in for a shipped tokenizer
    * artifact ([[graft.text.Curation.trainBpe]] learns such tables;
    * applying one is the production-side operation). Rules chain
    * (rule 3 consumes rule 1+2's outputs, rule 7 consumes 4+6's) so
    * the gate exercises merge-on-merged composition, and every rule
    * has left ≠ right — the condition under which the oracle's
    * replace-fixpoint provably equals the engine's single fold pass
    * (see bpeApplyOracleSql).
    */
  private val FixedBpeMerges: Seq[(String, String)] = Seq(
    ("e", "</w>"), ("t", "h"), ("th", "e</w>"), ("a", "n"), ("i", "n"),
    ("d", "</w>"), ("an", "d</w>"), ("o", "u"), ("e", "r"), ("in", "g"))

  /** GENERATED q205 oracle (the langScoreSelectSql discipline): replay
    * [[FixedBpeMerges]] in rank order. Symbol sequences ride as
    * chr(1)-delimited strings (`\1sym\1sym\1…\1`; the corpus is clean
    * ASCII — asserted impossible to collide) and one merge rule is the
    * FIXPOINT of `replace(s, \1l\1r\1 → \1lr\1)`: plain replace is
    * leftmost non-overlapping but consumes the trailing delimiter the
    * next occurrence needs, so a single pass can miss adjacent
    * occurrences — iterating to fixpoint recovers exactly the fold's
    * result because with left ≠ right (a) occurrences never self-
    * overlap, so the fold's one pass merges ALL of them, and (b) a
    * merged symbol `lr` can never equal `l` or `r`, so merging creates
    * no new occurrence. Each rule's fixpoint is one recursive CTE
    * (strictly length-decreasing ⇒ terminating, no duplicate rows).
    */
  /** The shared w0 → merge-stage → per_word CTE chain (symbols as
    * chr(1)-delimited strings, one recursive leftmost-replace fixpoint
    * per rule) — ONE generator feeding both the q205 segmentation
    * oracle and the q218 fertility oracle, so the two replay the SAME
    * merge semantics by construction. Ends in
    * `per_word(doc_id, idx, toks)`. Callers prepend `WITH RECURSIVE`.
    */
  private def bpeWordCte(merges: Seq[(String, String)]): String = {
    def q(s: String) = "'" + s.replace("'", "''") + "'"
    val stages = merges.zipWithIndex.map { case ((l, r), i) =>
      val prev = if (i == 0) "w0" else s"f$i"
      val pat = s"chr(1) || ${q(l)} || chr(1) || ${q(r)} || chr(1)"
      val rep = s"chr(1) || ${q(l + r)} || chr(1)"
      s"""r${i + 1}(doc_id, idx, s) AS (
         |  SELECT doc_id, idx, s FROM $prev
         |  UNION ALL
         |  SELECT doc_id, idx, replace(s, $pat, $rep) FROM r${i + 1}
         |  WHERE replace(s, $pat, $rep) <> s),
         |f${i + 1} AS (
         |  SELECT doc_id, idx, s FROM r${i + 1}
         |  WHERE replace(s, $pat, $rep) = s)""".stripMargin
    }
    s"""w0 AS (
      |  SELECT doc_id, idx,
      |    chr(1) || array_to_string(list_append(
      |      list_transform(range(1, length(w) + 1), i -> substr(w, i, 1)),
      |      '</w>'), chr(1)) || chr(1) AS s
      |  FROM (
      |    SELECT doc_id,
      |      unnest(regexp_split_to_array(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) AS w,
      |      generate_subscripts(regexp_split_to_array(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' '), 1) AS idx
      |    FROM documents)
      |  WHERE w <> ''),
      |${stages.mkString(",\n")},
      |per_word AS (
      |  SELECT doc_id, idx,
      |    list_filter(string_split(s, chr(1)), x -> x <> '') AS toks
      |  FROM f${merges.size})""".stripMargin
  }

  /** GENERATED q225 oracle: BPE TRAINING replayed for a bounded merge
    * count — the round-10 verdict's last zero-oracle family closed.
    * Each unrolled stage is (pair-count aggregate over the distinct-
    * word frequency table) → (argmax with the engine's exact tiebreak:
    * count desc, left asc, right asc) → (the q205 recursive
    * replace-to-fixpoint merge pass, with the pattern READ FROM the
    * stage's argmax row instead of a literal — training's rules are
    * data-derived). Same fold-equivalence caveat as q205: the
    * replace-fixpoint equals the engine's leftmost fold iff every
    * LEARNED rule has left ≠ right — verified on this corpus (top-6
    * merges at sf0.001/sf0.01 are er, e</w>, n</w>, or/er</w>, ow —
    * no self-pair), and a self-pair reaching a top-5 rank would need
    * doubled-letter dominance no natural-language corpus exhibits.
    * No early-stop modeling: every stage's argmax count is in the
    * thousands here, far above the engine's minPairCount=2.
    */
  private def bpeTrainOracleSql(nMerges: Int): String = {
    val stages = (1 to nMerges).map { i =>
      val prev = if (i == 1) "s0" else s"s${i - 1}"
      val pat = s"(SELECT p FROM pat$i)"
      val rep = s"(SELECT q FROM pat$i)"
      s"""px$i AS (
         |  SELECT n, unnest(range(1, len(syms))) AS j, syms
         |  FROM (SELECT n, list_filter(string_split(s, chr(1)), x -> x <> '') AS syms
         |        FROM $prev)),
         |pc$i AS (
         |  SELECT syms[j] AS l, syms[j + 1] AS r, CAST(SUM(n) AS BIGINT) AS c
         |  FROM px$i GROUP BY 1, 2),
         |top$i AS (SELECT l, r, c FROM pc$i ORDER BY c DESC, l ASC, r ASC LIMIT 1),
         |pat$i AS (
         |  SELECT chr(1) || l || chr(1) || r || chr(1) AS p,
         |         chr(1) || l || r || chr(1) AS q
         |  FROM top$i),
         |r$i(n, s) AS (
         |  SELECT n, s FROM $prev
         |  UNION ALL
         |  SELECT n, replace(s, $pat, $rep) FROM r$i
         |  WHERE replace(s, $pat, $rep) <> s),
         |s$i AS (
         |  SELECT n, s FROM r$i
         |  WHERE replace(s, $pat, $rep) = s)""".stripMargin
    }
    val rows = (1 to nMerges).map { i =>
      if (i == 1)
        s"""SELECT CAST(0 AS BIGINT) AS "rank", l AS "left", r AS "right",
           |    l || r AS merged, c AS pair_count FROM top1""".stripMargin
      else s"  UNION ALL SELECT CAST(${i - 1} AS BIGINT), l, r, l || r, c FROM top$i"
    }
    s"""WITH RECURSIVE
      |wf AS (
      |  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM (
      |    SELECT unnest(regexp_split_to_array(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) AS w
      |    FROM documents)
      |  WHERE w <> ''
      |  GROUP BY 1),
      |s0 AS (
      |  SELECT n,
      |    chr(1) || array_to_string(list_append(
      |      list_transform(range(1, length(word) + 1), i -> substr(word, i, 1)),
      |      '</w>'), chr(1)) || chr(1) AS s
      |  FROM wf),
      |${stages.mkString(",\n")}
      |${rows.mkString("\n")}
      |ORDER BY "rank"""".stripMargin
  }

  private def bpeApplyOracleSql(merges: Seq[(String, String)]): String = {
    s"""WITH RECURSIVE
      |${bpeWordCte(merges)},
      |per_doc AS (
      |  SELECT doc_id,
      |    CAST(SUM(len(toks)) AS BIGINT) AS n_bpe_tokens,
      |    string_agg(array_to_string(toks, ' '), ' ' ORDER BY idx) AS bpe_text
      |  FROM per_word GROUP BY doc_id)
      |SELECT d.doc_id,
      |  COALESCE(p.n_bpe_tokens, CAST(0 AS BIGINT)) AS n_bpe_tokens,
      |  COALESCE(p.bpe_text, '') AS bpe_text
      |FROM documents d LEFT JOIN per_doc p USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin
  }

  /** GENERATED q218 oracle off the SAME [[bpeWordCte]] chain as q205:
    * per-source word totals, BPE token totals, whole-word merges, and
    * the unrounded fertility / whole-word-rate quotients.
    */
  private def bpeFertilityOracleSql(merges: Seq[(String, String)]): String =
    s"""WITH RECURSIVE
      |${bpeWordCte(merges)},
      |pw AS (SELECT doc_id, len(toks) AS nt FROM per_word),
      |pd AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nw,
      |    CAST(SUM(nt) AS BIGINT) AS nt,
      |    CAST(SUM(CASE WHEN nt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS ns
      |  FROM pw GROUP BY 1),
      |bysrc AS (
      |  SELECT d.source,
      |    CAST(COALESCE(SUM(p.nw), 0) AS BIGINT) AS n_words,
      |    CAST(COALESCE(SUM(p.nt), 0) AS BIGINT) AS n_bpe_tokens,
      |    CAST(COALESCE(SUM(p.ns), 0) AS BIGINT) AS n_whole
      |  FROM documents d LEFT JOIN pd p USING (doc_id)
      |  GROUP BY 1)
      |SELECT source, n_words, n_bpe_tokens, n_whole,
      |  CASE WHEN n_words > 0
      |    THEN CAST(n_bpe_tokens AS DOUBLE) / n_words END AS fertility,
      |  CASE WHEN n_words > 0
      |    THEN CAST(n_whole AS DOUBLE) / n_words END AS whole_word_rate
      |FROM bysrc ORDER BY source""".stripMargin

  /** GENERATED q206 oracle: residual-encoded IVFADC replayed end to
    * end — coarse centroids/assignment (the q190 chain), residuals as
    * elementwise double subtractions, the SAME Lloyd training CTEs
    * over residual subvectors, and per-PROBED-LIST distance tables
    * from the query's per-list residual. Hardcodes the q206 geometry
    * (nSub=16, w=4, nCodes=64, nProbe=4) like the raw chain does.
    */
  /** GENERATED clustered-fixture corpus (q226): regenerates
    * [[graft.vector.Similarity.clusteredEmbeddings]] bit-for-bit —
    * exact integer center/noise arithmetic, one IEEE division, same
    * operation order — from the SAME constant set.
    */
  private def clusteredFixtureSql: String = {
    import graft.vector.Similarity.ClusteredFixture._
    s"""SELECT vec_id,
      |    list_transform(range(0, $Dim), j ->
      |      CAST((((vec_id % $K) * $Dim + j) * $CenterMul) % $CenterMod
      |        - $CenterShift AS DOUBLE)
      |      + CAST(((vec_id * $Dim + j) * $NoiseMul + $NoiseAdd)
      |          % $NoiseMod - $NoiseShift AS DOUBLE) / $NoiseScale)
      |      AS embedding
      |  FROM (SELECT unnest(range(0, $N)) AS vec_id)""".stripMargin
  }

  private def rAdcOracleSql(queryId: Long, k: Int = 10): String = {
    val dv = "x -> CAST(x AS DOUBLE)"
    s"""WITH sub AS (SELECT unnest(range(0, 16)) AS s),
      |cents AS (
      |  SELECT vec_id AS cid,
      |    list_transform(embedding, $dv) AS cv
      |  FROM embeddings
      |  WHERE sqrt(list_dot_product(list_transform(embedding, $dv),
      |      list_transform(embedding, $dv))) > 0
      |    AND vec_id % 31 = 0
      |  ORDER BY vec_id ASC LIMIT 16),
      |qv2 AS (
      |  SELECT list_transform(embedding, $dv) AS qv2
      |  FROM embeddings WHERE vec_id = $queryId),
      |probed AS (
      |  SELECT cid AS cluster FROM (
      |    SELECT c.cid,
      |      list_dot_product(cv, qv2) / (sqrt(list_dot_product(cv, cv))
      |        * sqrt(list_dot_product(qv2, qv2))) AS cs2
      |    FROM cents c, qv2)
      |  ORDER BY cs2 DESC, cluster ASC LIMIT 4),
      |iasg AS (
      |  SELECT vec_id, cid AS cluster FROM (
      |    SELECT e.vec_id, c.cid,
      |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |        (list_dot_product(ev, cv) / (sqrt(list_dot_product(ev, ev))
      |          * sqrt(list_dot_product(cv, cv)))) DESC, c.cid DESC) AS rn
      |    FROM (SELECT vec_id, list_transform(embedding, $dv) AS ev
      |          FROM embeddings) e
      |    CROSS JOIN cents c) WHERE rn = 1),
      |rv AS (
      |  SELECT e.vec_id, a.cluster,
      |    list_transform(range(1, len(ev) + 1), i -> ev[i] - cv[i]) AS rlist
      |  FROM (SELECT vec_id, list_transform(embedding, $dv) AS ev
      |        FROM embeddings) e
      |  JOIN iasg a ON a.vec_id = e.vec_id
      |  JOIN cents c ON c.cid = a.cluster),
      |base AS (
      |  SELECT vec_id, s, list_slice(rlist, s*4+1, s*4+4) AS sv
      |  FROM rv CROSS JOIN sub),
      |cbids AS (SELECT vec_id FROM embeddings ORDER BY vec_id ASC LIMIT 64),
      |cb0 AS (
      |  SELECT s AS cs, b.vec_id AS code, sv AS cw
      |  FROM base b JOIN cbids USING (vec_id)),
      |asg0 AS (
      |  SELECT vec_id, s, sv, code FROM (
      |    SELECT b.vec_id, b.s, b.sv, c.code,
      |      row_number() OVER (PARTITION BY b.vec_id, b.s ORDER BY
      |        (list_dot_product(sv, sv)
      |          - CAST(2 AS DOUBLE) * list_dot_product(sv, cw)
      |          + list_dot_product(cw, cw)) ASC, c.code ASC) AS rn
      |    FROM base b JOIN cb0 c ON c.cs = b.s) WHERE rn = 1),
      |mexp AS (
      |  SELECT s, code, generate_subscripts(sv, 1) AS pos,
      |    unnest(sv) AS e
      |  FROM asg0),
      |means AS (
      |  SELECT s AS ms, code AS mcode, list(m ORDER BY pos ASC) AS cw2
      |  FROM (
      |    SELECT s, code, pos,
      |      round(CAST(SUM(CAST(e AS DECIMAL(27,10))) AS DOUBLE)
      |        / COUNT(*), 6) AS m
      |    FROM mexp GROUP BY s, code, pos)
      |  GROUP BY s, code),
      |cb AS (
      |  SELECT cs, code, COALESCE(cw2, cw) AS cw
      |  FROM cb0 LEFT JOIN means ON ms = cs AND mcode = code),
      |cand AS (SELECT vec_id, cluster FROM iasg JOIN probed USING (cluster)),
      |asg AS (
      |  SELECT vec_id, s, code FROM (
      |    SELECT b.vec_id, b.s, c.code,
      |      row_number() OVER (PARTITION BY b.vec_id, b.s ORDER BY
      |        (list_dot_product(sv, sv)
      |          - CAST(2 AS DOUBLE) * list_dot_product(sv, cw)
      |          + list_dot_product(cw, cw)) ASC, c.code ASC) AS rn
      |    FROM base b JOIN cand USING (vec_id) JOIN cb c ON c.cs = b.s)
      |  WHERE rn = 1),
      |qres AS (
      |  SELECT p.cluster,
      |    list_transform(range(1, len(qv2) + 1), i -> qv2[i] - cv[i]) AS qrl
      |  FROM probed p JOIN cents c ON c.cid = p.cluster, qv2),
      |qsub AS (
      |  SELECT cluster, s, list_slice(qrl, s*4+1, s*4+4) AS qv
      |  FROM qres CROSS JOIN sub),
      |qd AS (
      |  SELECT q.cluster AS dcluster, cs AS ds, code AS dcode,
      |    CAST(round(list_dot_product(qv, qv)
      |      - CAST(2 AS DOUBLE) * list_dot_product(qv, cw)
      |      + list_dot_product(cw, cw), 12) AS DECIMAL(28,12)) AS qdist
      |  FROM cb JOIN qsub q ON cs = q.s),
      |adc AS (
      |  SELECT a.vec_id, SUM(qdist) AS adc
      |  FROM asg a JOIN cand cd ON cd.vec_id = a.vec_id
      |    JOIN qd ON qd.dcluster = cd.cluster
      |      AND qd.ds = a.s AND qd.dcode = a.code
      |  WHERE a.vec_id <> $queryId GROUP BY a.vec_id)
      |SELECT vec_id, round(CAST(adc AS DOUBLE), 6) AS adc_dist
      |FROM adc ORDER BY adc ASC, vec_id ASC LIMIT $k""".stripMargin
  }

  private def pqAdcOracleSql(restricted: Boolean,
                             queryId: Long = 0L, k: Int = 10): String =
    s"""${pqTrainCtes(restricted, queryId)},
      |qd AS (
      |  SELECT cs AS ds, code AS dcode,
      |    CAST(round(list_dot_product(qv, qv)
      |      - CAST(2 AS DOUBLE) * list_dot_product(qv, cw)
      |      + list_dot_product(cw, cw), 12) AS DECIMAL(28,12)) AS qdist
      |  FROM cb JOIN q ON qs = cs),
      |adc AS (
      |  SELECT a.vec_id, SUM(qdist) AS adc
      |  FROM asg a JOIN qd ON qd.ds = a.s AND qd.dcode = a.code
      |  WHERE a.vec_id <> $queryId GROUP BY a.vec_id)
      |SELECT vec_id, round(CAST(adc AS DOUBLE), 6) AS adc_dist
      |FROM adc ORDER BY adc ASC, vec_id ASC LIMIT $k""".stripMargin

  /** GENERATED q208 oracle: the ADC chain shortlists (LIMIT
    * `shortlist`), plain exact cosine (the q40 arithmetic verbatim)
    * ranks the shortlist — certifying the two-stage composition.
    */
  private def adcRerankOracleSql(queryId: Long, k: Int,
                                 shortlist: Int): String =
    s"""WITH short AS (SELECT * FROM (
      |${pqAdcOracleSql(restricted = true, queryId = queryId, k = shortlist)}
      |)),
      |rq AS (
      |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
      |  FROM embeddings WHERE vec_id = $queryId),
      |rc AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings
      |  WHERE vec_id <> $queryId AND vec_id IN (SELECT vec_id FROM short))
      |SELECT vec_id,
      |  round(list_dot_product(v, qv) /
      |    (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS cos_sim
      |FROM rc, rq
      |ORDER BY cos_sim DESC, vec_id LIMIT $k""".stripMargin

  private def langFixtureValuesSql: String =
    graft.text.TextStats.LangFixture.map { case (id, lang, txt) =>
      s"  ($id, '$lang', '${txt.replace("'", "''")}')"
    }.mkString(",\n")

  private def oracleSqlBase: Map[String, String] = Map(
    "q32_minhash_lsh" -> jaccardPairsOracle,

    // full independent simhash recomputation: same tokenization as the
    // Spark side (whitespace collapse), token hash = first 16 hex chars
    // of md5 (== first 8 digest bytes big-endian, the exact value
    // SimHashExpr.tokenHash computes), per-bit majority vote over the
    // token STREAM (duplicates counted), pairwise hamming over the 64
    // signature bits, threshold <= 3 — mirrors Dedup.simhashPairs
    "q33_simhash_pairs" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(
        |    trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) AS token
        |  FROM documents),
        |th AS (
        |  SELECT doc_id,
        |    CAST('0x' || substr(md5(token), 1, 8) AS BIGINT) AS hi,
        |    CAST('0x' || substr(md5(token), 9, 8) AS BIGINT) AS lo
        |  FROM toks),
        |bits AS (
        |  SELECT doc_id, r.i,
        |    CASE WHEN r.i < 32 THEN (lo >> CAST(r.i AS INT)) & 1
        |         ELSE (hi >> CAST(r.i - 32 AS INT)) & 1 END AS b
        |  FROM th, range(64) r(i)),
        |sig AS (
        |  SELECT doc_id, i,
        |    CASE WHEN 2 * SUM(b) > COUNT(*) THEN 1 ELSE 0 END AS s
        |  FROM bits GROUP BY doc_id, i),
        |ham AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    SUM(CASE WHEN a.s <> b.s THEN 1 ELSE 0 END) AS hamming
        |  FROM sig a JOIN sig b ON a.i = b.i AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, CAST(hamming AS BIGINT) AS hamming
        |FROM ham WHERE hamming <= 3 ORDER BY doc_a, doc_b""".stripMargin,

    "q37_fingerprint" ->
      """SELECT doc_id, TRUE AS dup_consistent, TRUE AS collision_free
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q01_gold_daily_stats" ->
      """WITH ranked AS (
        |  SELECT CAST(l_shipdate AS DATE) AS partition_date, l_extendedprice, l_quantity,
        |         rank() OVER (PARTITION BY CAST(l_shipdate AS DATE)
        |                      ORDER BY l_extendedprice * l_quantity DESC) AS r
        |  FROM lineitem)
        |SELECT partition_date,
        |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_market_cap,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  COUNT(*) AS n_rows
        |FROM ranked WHERE r <= 10
        |GROUP BY partition_date ORDER BY partition_date""".stripMargin,

    "q02_dedup_latest" ->
      """SELECT event_id, ts, user_id, event_type, value, props FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "q03_bronze_enrich" ->
      """SELECT event_id, user_id, event_type,
        |  COALESCE(value, 0.0) AS value_filled,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
        |  CAST(ts AS DATE) AS partition_date
        |FROM events ORDER BY event_id""".stripMargin,

    "q04_distinct_dates" ->
      "SELECT DISTINCT CAST(l_shipdate AS DATE) AS partition_date FROM lineitem ORDER BY partition_date",

    "q05_top1_global" ->
      "SELECT event_id, user_id, event_type, value FROM events ORDER BY value DESC, event_id LIMIT 1",

    "q06_cross_join" ->
      "SELECT n_name, r_name FROM nation CROSS JOIN region ORDER BY n_name, r_name",

    "q07_silver_casts" ->
      """SELECT l_orderkey, l_linenumber,
        |  ROUND(CAST(CAST(l_extendedprice AS DECIMAL(18,8)) AS DOUBLE), 8) AS price_dec,
        |  ROUND(CAST(CAST(l_quantity AS DECIMAL(20,2)) AS DOUBLE), 2) AS qty_dec,
        |  l_returnflag
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q08_partition_counts" ->
      """SELECT CAST(o_orderdate AS DATE) AS partition_date,
        |  COUNT(*) AS n_orders,
        |  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q09_pipeline_gold" ->
      """WITH silver AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |    FROM events) WHERE rn = 1),
        |ranked AS (
        |  SELECT CAST(ts AS DATE) AS partition_date, value,
        |         rank() OVER (PARTITION BY CAST(ts AS DATE) ORDER BY value DESC) AS r
        |  FROM silver)
        |SELECT partition_date,
        |  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_market_cap,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  COUNT(*) AS n_rows
        |FROM ranked WHERE r <= 10
        |GROUP BY partition_date ORDER BY partition_date""".stripMargin,

    "q10_join_star" ->
      """SELECT r_name, n_name, COUNT(*) AS n_customers,
        |  ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "q11_join_fact" ->
      """SELECT o_orderpriority, COUNT(*) AS n_items,
        |  ROUND(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |       CAST(1.0 - l_discount AS DECIMAL(4,2)) AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q12_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q13_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q14_rollup" ->
      """SELECT r_name, n_name, COUNT(*) AS n_customers
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,

    "q15_window_lag" ->
      """SELECT event_id, user_id, value,
        |  lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
        |  lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value
        |FROM events ORDER BY event_id""".stripMargin,

    "q16_window_frame" ->
      """SELECT event_id, user_id,
        |  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS moving_sum,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pos_in_key
        |FROM events ORDER BY event_id""".stripMargin,

    "q17_set_ops" ->
      """SELECT 'both' AS tag, user_id FROM (
        |  SELECT user_id FROM events WHERE event_type = 'purchase'
        |  INTERSECT
        |  SELECT user_id FROM events WHERE event_type = 'error')
        |UNION ALL
        |SELECT 'purchase_only' AS tag, user_id FROM (
        |  SELECT user_id FROM events WHERE event_type = 'purchase'
        |  EXCEPT
        |  SELECT user_id FROM events WHERE event_type = 'error')
        |ORDER BY tag, user_id""".stripMargin,

    "q18_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "q19_string_funcs" ->
      """SELECT p_partkey,
        |  upper(p_name) AS upper_name,
        |  lower(p_brand) AS lower_brand,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  substr(p_name, 1, 8) AS name_prefix,
        |  concat_ws('-', p_brand, p_type) AS brand_type,
        |  replace(p_name, ' ', '_') AS snake_name,
        |  CAST(strpos(p_type, 'a') AS BIGINT) AS a_pos,
        |  reverse(p_name) AS rev_name
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q20_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(month(o_orderdate) AS BIGINT) AS mo,
        |  CAST(day(o_orderdate) AS BIGINT) AS dom,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q21_agg_funcs" ->
      """SELECT event_type,
        |  COUNT(*) AS n,
        |  COUNT(DISTINCT user_id) AS n_users,
        |  MIN(value) AS min_value,
        |  MAX(value) AS max_value,
        |  MIN(ts) AS first_ts,
        |  MAX(ts) AS last_ts,
        |  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q22_asof_join" ->
      """SELECT p.event_id, p.user_id, p.value,
        |  (SELECT c.value FROM events c
        |   WHERE c.event_type = 'click' AND c.user_id = p.user_id AND c.ts <= p.ts
        |   ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS last_click_value
        |FROM events p WHERE p.event_type = 'purchase' ORDER BY p.event_id""".stripMargin,

    "q23_range_join" ->
      """SELECT o_orderstatus, COUNT(*) AS n_shipped_90d
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  AND l_shipdate >= o_orderdate
        |  AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q24_histogram" ->
      """SELECT CAST(FLOOR(value / 25) * 25 AS BIGINT) AS bucket_lo,
        |  COUNT(*) AS n,
        |  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q25_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR date_diff('second', lag(ts) OVER w, ts) > 1800
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT user_id, ts,
        |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |  CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) AS duration_sec
        |FROM sessions GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "q26_cube" ->
      """SELECT r_name, n_name, COUNT(*) AS n_customers
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY CUBE(r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,

    "q28_bpe_tokens" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q38_embed_neardup" -> embedNearDupOracle,
    "q39_embed_neardup_lsh" -> embedNearDupOracle,

    "q27_pivot" ->
      """SELECT user_id,
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS "view",
        |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS "error"
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q29_grouping_sets" ->
      """SELECT n_name, c_mktsegment, COUNT(*) AS n_customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
        |ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin,

    "q30_dedup_exact" ->
      """SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "q31_jaccard_pairs" -> jaccardPairsOracle,

    "q34_lang_id" ->
      // scoring SQL generated from TextStats.LangProfiles — the same
      // literal the engine scores with (see langOracle helpers below)
      s"""WITH t AS (
        |  SELECT doc_id, ' ' || lower(text) || ' ' AS t FROM documents),
        |sc AS (
        |  SELECT doc_id,
        |$langScoreSelectSql
        |  FROM t)
        |SELECT doc_id, $langScoreCols,
        |  $langPredCaseSql AS pred_lang
        |FROM sc ORDER BY doc_id""".stripMargin,

    "q187_langid_eval" ->
      s"""WITH fx(fix_id, lang, text) AS (VALUES
        |$langFixtureValuesSql),
        |t AS (SELECT lang, ' ' || lower(text) || ' ' AS t FROM fx),
        |sc AS (
        |  SELECT lang,
        |$langScoreSelectSql
        |  FROM t),
        |p AS (SELECT lang, $langPredCaseSql AS pred_lang FROM sc)
        |SELECT lang AS true_lang, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN pred_lang = lang THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_correct,
        |  CAST(SUM(CASE WHEN pred_lang = lang THEN 1 ELSE 0 END) AS DOUBLE)
        |    / COUNT(*) AS accuracy
        |FROM p GROUP BY lang ORDER BY lang""".stripMargin,

    "q186_guard_report" ->
      s"""WITH $shingleCte,
        |spread AS (
        |  SELECT doc_id,
        |    ${spreadBitsSql("doc_id")} AS h
        |  FROM documents),
        |chunks AS (
        |  SELECT cj.j AS chunk, (h >> (16 * cj.j)) & 65535 AS ck
        |  FROM spread CROSS JOIN (SELECT unnest([0,1,2,3]) AS j) cj),
        |m AS (
        |${guardRowSql("hot_shingle", "jaccardPairs",
             "SELECT COALESCE(MAX(c), 0) FROM (SELECT COUNT(*) AS c FROM sh GROUP BY shingle)")}
        |UNION ALL
        |${guardRowSql("hot_chunk_image", "phashBandedPairs",
             "SELECT COALESCE(MAX(c), 0) FROM (SELECT COUNT(*) AS c FROM chunks GROUP BY chunk, ck)")}
        |UNION ALL
        |${guardRowSql("hot_chunk_audio", "audioHashBandedPairs",
             "SELECT COALESCE(MAX(c), 0) FROM (SELECT COUNT(*) AS c FROM chunks GROUP BY chunk, ck)")}
        |UNION ALL
        |${guardRowSql("exact_pairs", "embedNearDup",
             "SELECT COUNT(*) FROM embeddings")}
        |UNION ALL
        |${guardRowSql("knn_bucket", "knnGraphBucketed",
             "SELECT COALESCE(MAX(c), 0) FROM (SELECT COUNT(*) AS c FROM embeddings GROUP BY label)")}
        |UNION ALL
        |${guardRowSql("instruments", "corrMatrix",
             "SELECT COUNT(DISTINCT event_type) FROM events")}
        |UNION ALL
        |${guardRowSql("corpus_slices", "corpusOverlap",
             "SELECT COUNT(DISTINCT source) FROM documents")}
        |UNION ALL
        |${guardRowSql("fuzzy_block", "fuzzyPairs",
             "SELECT COALESCE(MAX(c), 0) FROM (SELECT COUNT(*) AS c FROM (" +
               "SELECT list_extract(regexp_split_to_array(p_name, ' '), -1) AS blk " +
               "FROM (SELECT p_name FROM part GROUP BY p_name)) GROUP BY blk)")}
        |UNION ALL
        |${guardRowSql("hot_fingerprint", "winnowOverlapPairs",
             "SELECT COALESCE(MAX(c), 0) FROM (WITH " + winnowCte +
               " SELECT COUNT(*) AS c FROM " +
               "(SELECT DISTINCT doc_id, fp FROM wfp) GROUP BY fp)")}
        |UNION ALL
        |${guardRowSql("eval_shingles", "contamination",
             "SELECT COUNT(DISTINCT shingle) FROM sh WHERE doc_id IN " +
               "(SELECT doc_id FROM documents WHERE source = 'src0')")}
        |UNION ALL
        |${guardRowSql("hot_ivf_list", "ivfAdcProbeJoin",
             """SELECT COALESCE(MAX(c), 0) FROM (
               |  SELECT COUNT(*) AS c FROM (
               |    SELECT e.vec_id, c2.cid,
               |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
               |        (list_dot_product(ev, cv) /
               |          (sqrt(list_dot_product(ev, ev))
               |            * sqrt(list_dot_product(cv, cv)))) DESC,
               |        c2.cid DESC) AS rn
               |    FROM (SELECT vec_id,
               |            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
               |          FROM embeddings) e
               |    CROSS JOIN (
               |      SELECT vec_id AS cid,
               |        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
               |      FROM embeddings
               |      WHERE sqrt(list_dot_product(
               |          list_transform(embedding, x -> CAST(x AS DOUBLE)),
               |          list_transform(embedding, x -> CAST(x AS DOUBLE)))) > 0
               |        AND vec_id % 31 = 0
               |      ORDER BY vec_id ASC LIMIT 16) c2)
               |  WHERE rn = 1 GROUP BY cid)""".stripMargin)})
        |SELECT guard, operator, bound, measured,
        |  CAST(measured AS DOUBLE) / bound AS load_ratio,
        |  measured > bound AS would_refuse
        |FROM m ORDER BY guard""".stripMargin,

    "q188_dup_spans" ->
      s"""WITH $dupSpanCte
        |SELECT doc_id, span_start, span_end,
        |  span_end - span_start + 1 AS span_tokens
        |FROM spans ORDER BY doc_id, span_start""".stripMargin,

    "q198_hashed_tfidf" ->
      s"""WITH ${hashedTfidfCte(64)}
        |SELECT doc_id, bucket, CAST(n_terms AS BIGINT) AS n_terms, weight
        |FROM wts WHERE doc_id < 10 ORDER BY doc_id, bucket""".stripMargin,

    "q199_text_ann" ->
      s"""WITH ${hashedTfidfCte(64)},
        |grid AS (SELECT d.doc_id, r.i FROM documents d, range(64) r(i)),
        |vecs AS (
        |  SELECT g.doc_id, list(COALESCE(w.weight, 0.0) ORDER BY g.i) AS v
        |  FROM grid g LEFT JOIN wts w
        |    ON w.doc_id = g.doc_id AND w.bucket = g.i
        |  GROUP BY g.doc_id),
        |nz AS (SELECT doc_id, v FROM vecs WHERE list_dot_product(v, v) > 0),
        |qh AS (SELECT v AS qv FROM nz WHERE doc_id = 0)
        |SELECT c.doc_id,
        |  round(list_dot_product(c.v, qv) /
        |    (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(qv, qv))),
        |    6) AS cos_sim
        |FROM nz c, qh WHERE c.doc_id <> 0
        |ORDER BY cos_sim DESC, doc_id LIMIT 10""".stripMargin,

    "q200_text_semantic_dedup" ->
      s"""WITH ${hashedTfidfCte(64)},
        |grid AS (SELECT d.doc_id, r.i FROM documents d, range(64) r(i)),
        |vecs AS (
        |  SELECT g.doc_id, list(COALESCE(w.weight, 0.0) ORDER BY g.i) AS v
        |  FROM grid g LEFT JOIN wts w
        |    ON w.doc_id = g.doc_id AND w.bucket = g.i
        |  GROUP BY g.doc_id),
        |nz AS (SELECT doc_id, v FROM vecs WHERE list_dot_product(v, v) > 0),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    round(list_dot_product(a.v, b.v) /
        |      (sqrt(list_dot_product(a.v, a.v))
        |        * sqrt(list_dot_product(b.v, b.v))), 6) AS cos_sim
        |  FROM nz a JOIN nz b ON a.doc_id < b.doc_id)
        |SELECT id_a, id_b, cos_sim FROM pairs
        |WHERE cos_sim >= 0.95 ORDER BY id_a, id_b""".stripMargin,

    "q195_top_dup_spans" ->
      s"""WITH $dupSpanCte,
        |st AS (
        |  SELECT s.doc_id,
        |    array_to_string(list_slice(t.w, CAST(s.span_start + 1 AS INT),
        |      CAST(s.span_end + 1 AS INT)), ' ') AS span_text,
        |    s.span_end - s.span_start + 1 AS span_tokens
        |  FROM spans s JOIN toks t USING (doc_id))
        |SELECT span_text, COUNT(*) AS n_occurrences,
        |  COUNT(DISTINCT doc_id) AS n_docs,
        |  CAST(SUM(span_tokens) AS BIGINT) AS dup_tokens
        |FROM st GROUP BY span_text
        |ORDER BY dup_tokens DESC, span_text ASC LIMIT 20""".stripMargin,

    "q192_append_dup_spans" ->
      s"""WITH $dupSpanCte
        |SELECT doc_id, span_start, span_end,
        |  span_end - span_start + 1 AS span_tokens
        |FROM spans
        |WHERE doc_id IN (SELECT doc_id FROM documents WHERE source = 'src0')
        |ORDER BY doc_id, span_start""".stripMargin,

    "q193_decontaminate_spans" ->
      s"""WITH $contamSpanCte
        |SELECT doc_id, span_start, span_end,
        |  span_end - span_start + 1 AS span_tokens
        |FROM spans ORDER BY doc_id, span_start""".stripMargin,

    "q189_strip_dup_spans" ->
      s"""WITH $dupSpanCte,
        |wkept AS (
        |  SELECT w.doc_id, CAST(w.i - 1 AS BIGINT) AS pos, w.word
        |  FROM words w
        |  WHERE NOT EXISTS (SELECT 1 FROM spans s
        |    WHERE s.doc_id = w.doc_id
        |      AND w.i - 1 BETWEEN s.span_start AND s.span_end)),
        |ag AS (
        |  SELECT doc_id, COUNT(*) AS kept,
        |    string_agg(word, ' ' ORDER BY pos ASC) AS clean_text
        |  FROM wkept GROUP BY doc_id)
        |SELECT t.doc_id, CAST(len(t.w) AS BIGINT) AS n_tokens,
        |  CAST(len(t.w) - COALESCE(ag.kept, 0) AS BIGINT) AS n_removed,
        |  COALESCE(ag.clean_text, '') AS clean_text
        |FROM toks t LEFT JOIN ag USING (doc_id) ORDER BY t.doc_id""".stripMargin,

    "q35_quality_score" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    CAST(length(text) AS BIGINT) AS n_chars,
        |    CAST(len(regexp_split_to_array(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) AS BIGINT) AS n_tokens,
        |    CAST(len(list_filter(
        |      regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
        |      t -> t IN ('the','a','and','of','to','in','is','on'))) AS BIGINT) AS n_stopwords
        |  FROM documents)
        |SELECT doc_id, n_chars, n_tokens, n_stopwords,
        |  CAST(n_chars - (n_tokens - 1) AS DOUBLE) / n_tokens AS mean_token_len,
        |  CAST(n_stopwords AS DOUBLE) / n_tokens AS stopword_ratio
        |FROM base ORDER BY doc_id""".stripMargin,

    "q36_token_totals" ->
      """SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(len(regexp_split_to_array(trim(regexp_replace(text, '\s+', ' ', 'g')), ' '))) AS BIGINT) AS total_tokens
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "q45_decile_stats" ->
      """SELECT decile, COUNT(*) AS n, MIN(value) AS lo, MAX(value) AS hi,
        |  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
        |FROM (
        |  SELECT value,
        |    CAST(ntile(10) OVER (ORDER BY value ASC, event_id ASC) AS BIGINT) AS decile
        |  FROM events)
        |GROUP BY decile ORDER BY decile""".stripMargin,

    "q40_cosine_topk" -> cosineTopKOracle,

    // the IVF probe's recall is total on this corpus at ivfTopK's
    // default parameters (stride-init centroids, configured nProbe), so
    // the exact brute-force oracle applies verbatim — the gate asserts
    // the probe pruning loses nothing, the q32/q31 precedent
    "q41_ivf_topk" -> cosineTopKOracle,

    // persisted-index probe: same search semantics as q41 (identical
    // centroids + probe width, different physical path), so the same
    // exact oracle applies — the gate additionally proves the
    // partition-pruned index scan returns the very rows the full scan does
    "q81_ivf_probe" -> cosineTopKOracle,

    "q82_vwap" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, value,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS qty
        |  FROM events
        |  WHERE value IS NOT NULL
        |    AND json_extract_string(props, '$.k') IS NOT NULL)
        |SELECT event_type, day, COUNT(*) AS n_trades,
        |  round(CAST(SUM(CAST(qty AS DECIMAL(18,6))) AS DOUBLE), 6) AS total_qty,
        |  CASE WHEN SUM(CAST(qty AS DECIMAL(18,6))) <> 0 THEN
        |    round(CAST(SUM(CAST(CAST(value AS DECIMAL(18,6)) * CAST(qty AS DECIMAL(18,6)) AS DECIMAL(38,12))) AS DOUBLE)
        |      / CAST(SUM(CAST(qty AS DECIMAL(18,6))) AS DOUBLE), 6) END AS vwap
        |FROM ev GROUP BY event_type, day ORDER BY event_type, day""".stripMargin,

    "q83_rolling_volatility" ->
      """WITH w AS (
        |  SELECT event_id, event_type,
        |    COUNT(*) OVER fr AS n,
        |    SUM(CAST(value AS DECIMAL(18,6))) OVER fr AS s1,
        |    SUM(CAST(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)) AS DECIMAL(38,12))) OVER fr AS s2
        |  FROM events WHERE value IS NOT NULL
        |  WINDOW fr AS (PARTITION BY event_type ORDER BY ts ASC, event_id ASC
        |    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
        |SELECT event_id, event_type, CAST(n AS BIGINT) AS roll_n,
        |  round(CAST(s1 AS DOUBLE) / n, 6) AS roll_mean,
        |  CASE WHEN n > 1 THEN
        |    round(sqrt(greatest(0.0,
        |      (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (n - 1))), 6) END AS roll_std
        |FROM w ORDER BY event_id""".stripMargin,

    "q84_max_drawdown" ->
      """WITH p AS (
        |  SELECT event_type, CAST(value AS DECIMAL(18,6)) AS v,
        |    MAX(CAST(value AS DECIMAL(18,6))) OVER (PARTITION BY event_type
        |      ORDER BY ts ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pk
        |  FROM events WHERE value IS NOT NULL)
        |SELECT event_type,
        |  round(CAST(MAX(pk - v) AS DOUBLE), 6) AS max_drawdown,
        |  round(CAST(MAX(pk) AS DOUBLE), 6) AS peak,
        |  COUNT(*) AS n_ticks
        |FROM p GROUP BY event_type ORDER BY event_type""".stripMargin,

    // mse via the dot-product identity dot(x,x) - 2s·dot(x,q) + s²·dot(q,q)
    // in BOTH engines, with floor(v/s + 0.5) quantization (exact in
    // doubles — no round-half-mode divergence), so doubles agree bitwise
    "q86_quantize_embeddings" ->
      """WITH x AS (
        |  SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS xd
        |  FROM embeddings),
        |s AS (
        |  SELECT vec_id, xd,
        |    list_max(list_transform(xd, v -> abs(v))) AS am
        |  FROM x),
        |q AS (
        |  SELECT vec_id, xd, am / 127.0 AS sc,
        |    list_transform(xd, v -> floor(v / (am / 127.0) + 0.5)) AS qd
        |  FROM s WHERE am > 0)
        |SELECT vec_id,
        |  CAST(len(qd) AS BIGINT) AS n_dims,
        |  round(sc, 9) AS scale,
        |  round((list_dot_product(xd, xd) - 2.0 * sc * list_dot_product(xd, qd)
        |    + sc * sc * list_dot_product(qd, qd)) / len(qd), 12) AS mse,
        |  round(list_max(list_transform(xd,
        |    v -> abs(v - sc * floor(v / sc + 0.5)))), 9) AS max_abs_err
        |FROM q ORDER BY vec_id""".stripMargin,

    // edge CTE + symmetrize + three unrolled label-propagation rounds;
    // counts are integers and the tiebreak is total, so no float concerns
    "q90_label_prop" ->
      """WITH em AS (
        |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings
        |  WHERE list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |    list_transform(embedding, x -> CAST(x AS DOUBLE))) > 0),
        |pairs AS (
        |  SELECT a.vec_id AS src, b.vec_id AS dst,
        |    round(list_dot_product(a.v, b.v) /
        |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cos_sim
        |  FROM em a JOIN em b ON a.label = b.label AND a.vec_id <> b.vec_id),
        |knn AS (
        |  SELECT src, dst FROM (
        |    SELECT src, dst, row_number() OVER (
        |      PARTITION BY src ORDER BY cos_sim DESC, dst) AS rnk
        |    FROM pairs) WHERE rnk <= 5),
        |eds AS (SELECT src, dst FROM knn UNION SELECT dst, src FROM knn),
        |nodes AS (SELECT DISTINCT src AS node FROM eds),
        |seeds AS (
        |  SELECT vec_id AS node, CAST(label AS BIGINT) AS seed_label
        |  FROM embeddings WHERE vec_id % 10 = 0),
        |l0 AS (
        |  SELECT n.node, s.seed_label AS label
        |  FROM nodes n LEFT JOIN seeds s ON s.node = n.node),
        |l1 AS (
        |  SELECT n.node, COALESCE(s.seed_label, b.nl) AS label
        |  FROM nodes n LEFT JOIN seeds s ON s.node = n.node
        |  LEFT JOIN (
        |    SELECT src AS node, nl FROM (
        |      SELECT src, nl, row_number() OVER (
        |        PARTITION BY src ORDER BY c DESC, nl ASC) AS r
        |      FROM (SELECT e.src, l.label AS nl, COUNT(*) AS c
        |            FROM eds e JOIN l0 l ON l.node = e.dst
        |            WHERE l.label IS NOT NULL GROUP BY e.src, l.label))
        |    WHERE r = 1) b ON b.node = n.node),
        |l2 AS (
        |  SELECT n.node, COALESCE(s.seed_label, b.nl) AS label
        |  FROM nodes n LEFT JOIN seeds s ON s.node = n.node
        |  LEFT JOIN (
        |    SELECT src AS node, nl FROM (
        |      SELECT src, nl, row_number() OVER (
        |        PARTITION BY src ORDER BY c DESC, nl ASC) AS r
        |      FROM (SELECT e.src, l.label AS nl, COUNT(*) AS c
        |            FROM eds e JOIN l1 l ON l.node = e.dst
        |            WHERE l.label IS NOT NULL GROUP BY e.src, l.label))
        |    WHERE r = 1) b ON b.node = n.node),
        |l3 AS (
        |  SELECT n.node, COALESCE(s.seed_label, b.nl) AS label
        |  FROM nodes n LEFT JOIN seeds s ON s.node = n.node
        |  LEFT JOIN (
        |    SELECT src AS node, nl FROM (
        |      SELECT src, nl, row_number() OVER (
        |        PARTITION BY src ORDER BY c DESC, nl ASC) AS r
        |      FROM (SELECT e.src, l.label AS nl, COUNT(*) AS c
        |            FROM eds e JOIN l2 l ON l.node = e.dst
        |            WHERE l.label IS NOT NULL GROUP BY e.src, l.label))
        |    WHERE r = 1) b ON b.node = n.node)
        |SELECT node AS vec_id, label AS pred_label
        |FROM l3 ORDER BY vec_id""".stripMargin,

    "q91_twap" ->
      """WITH t AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, value,
        |    epoch_us(ts) AS tu,
        |    lead(epoch_us(ts)) OVER (PARTITION BY event_type, CAST(ts AS DATE)
        |      ORDER BY ts ASC, event_id ASC) AS nxt
        |  FROM events WHERE value IS NOT NULL)
        |SELECT event_type, day,
        |  COUNT(*) AS n_intervals,
        |  round(CAST(SUM(CAST(CAST(value AS DECIMAL(18,6)) * (nxt - tu) AS DECIMAL(38,6))) AS DOUBLE)
        |    / CAST(SUM(nxt - tu) AS DOUBLE), 6) AS twap
        |FROM t WHERE nxt IS NOT NULL
        |GROUP BY event_type, day HAVING SUM(nxt - tu) > 0
        |ORDER BY event_type, day""".stripMargin,

    "q92_change_capture" ->
      """WITH b AS (SELECT * FROM customer WHERE c_custkey % 10 <> 3),
        |a AS (
        |  SELECT c_custkey, c_name, c_nationkey,
        |    CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0
        |         ELSE c_acctbal END AS c_acctbal,
        |    c_mktsegment
        |  FROM customer WHERE c_custkey % 10 <> 4)
        |SELECT COALESCE(a.c_custkey, b.c_custkey) AS c_custkey,
        |  CASE WHEN b.c_custkey IS NULL THEN 'insert'
        |       WHEN a.c_custkey IS NULL THEN 'delete'
        |       ELSE 'update' END AS change_type,
        |  -- whole-side selection (deletes report before, others after),
        |  -- NOT per-column COALESCE: an update that nulls a field must
        |  -- surface the NULL, exactly as changeCapture's struct pick does
        |  CASE WHEN a.c_custkey IS NULL THEN b.c_name ELSE a.c_name END AS c_name,
        |  CASE WHEN a.c_custkey IS NULL THEN b.c_nationkey ELSE a.c_nationkey END AS c_nationkey,
        |  CASE WHEN a.c_custkey IS NULL THEN b.c_acctbal ELSE a.c_acctbal END AS c_acctbal,
        |  CASE WHEN a.c_custkey IS NULL THEN b.c_mktsegment ELSE a.c_mktsegment END AS c_mktsegment
        |FROM b FULL OUTER JOIN a ON a.c_custkey = b.c_custkey
        |WHERE b.c_custkey IS NULL OR a.c_custkey IS NULL
        |   OR (a.c_name, a.c_nationkey, a.c_acctbal, a.c_mktsegment)
        |      IS DISTINCT FROM
        |      (b.c_name, b.c_nationkey, b.c_acctbal, b.c_mktsegment)
        |ORDER BY c_custkey""".stripMargin,

    "q94_rsi" ->
      """WITH d AS (
        |  SELECT event_id, event_type, ts,
        |    CAST(value AS DECIMAL(18,6))
        |      - lag(CAST(value AS DECIMAL(18,6))) OVER w AS delta
        |  FROM events WHERE value IS NOT NULL
        |  WINDOW w AS (PARTITION BY event_type ORDER BY ts ASC, event_id ASC)),
        |f AS (
        |  SELECT event_id, event_type,
        |    SUM(CASE WHEN delta > 0 THEN delta WHEN delta <= 0 THEN 0 END) OVER fr AS g,
        |    SUM(CASE WHEN delta < 0 THEN -delta WHEN delta >= 0 THEN 0 END) OVER fr AS l,
        |    COUNT(delta) OVER fr AS n_deltas
        |  FROM d
        |  WINDOW fr AS (PARTITION BY event_type ORDER BY ts ASC, event_id ASC
        |    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
        |SELECT event_id, event_type, n_deltas,
        |  CASE WHEN g + l > 0
        |       THEN round(100.0 * CAST(g AS DOUBLE) / CAST(g + l AS DOUBLE), 6)
        |  END AS rsi
        |FROM f ORDER BY event_id""".stripMargin,

    "q95_fuzzy_match" ->
      """WITH nm AS (
        |  SELECT p_name, min(p_partkey) AS rep_id, count(*) AS n_recs
        |  FROM part GROUP BY 1),
        |side AS (
        |  SELECT rep_id AS id, p_name AS name,
        |    string_split(p_name, ' ')[-1] AS blk, n_recs
        |  FROM nm)
        |SELECT a.id AS a_id, b.id AS b_id, a.name AS a_name, b.name AS b_name,
        |  CAST(levenshtein(a.name, b.name) AS INT) AS edit_dist,
        |  a.n_recs AS a_recs, b.n_recs AS b_recs
        |FROM side a JOIN side b ON b.blk = a.blk AND a.id < b.id
        |WHERE abs(length(a.name) - length(b.name)) <= 2
        |  AND levenshtein(a.name, b.name) <= 2
        |ORDER BY a_id, b_id""".stripMargin,

    "q96_hash_sample" ->
      """WITH h AS (
        |  SELECT source, doc_id,
        |    ((doc_id % 1000000007) * 2654435761) % 1000000007 AS hh
        |  FROM documents),
        |r AS (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source ORDER BY hh ASC, doc_id ASC)
        |      AS sample_rank
        |  FROM h)
        |SELECT source, doc_id, sample_rank FROM r
        |WHERE sample_rank <= 5 ORDER BY source, sample_rank""".stripMargin,

    "q97_ewma" ->
      """WITH l AS (
        |  SELECT event_id, event_type,
        |    list(CAST(value AS DOUBLE)) OVER (
        |      PARTITION BY event_type ORDER BY ts ASC, event_id ASC
        |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS lst
        |  FROM events WHERE value IS NOT NULL)
        |SELECT event_id, event_type,
        |  round(list_reduce(lst, (acc, x) -> acc * 0.75 + 0.25 * x), 6) AS ewma
        |FROM l ORDER BY event_id""".stripMargin,

    "q98_beta" ->
      """WITH base AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |    CAST(value AS DECIMAL(18,6)) AS v
        |  FROM events WHERE value IS NOT NULL),
        |market AS (
        |  SELECT bucket,
        |    CAST(round(CAST(SUM(v) AS DOUBLE) / COUNT(*), 9) AS DECIMAL(21,9)) AS m
        |  FROM base GROUP BY bucket),
        |perkey AS (
        |  SELECT event_type, bucket,
        |    CAST(round(CAST(SUM(v) AS DOUBLE) / COUNT(*), 9) AS DECIMAL(21,9)) AS x
        |  FROM base GROUP BY event_type, bucket),
        |s AS (
        |  SELECT p.event_type, COUNT(*) AS n,
        |    SUM(p.x) AS sx, SUM(m.m) AS sm,
        |    SUM(CAST(p.x * m.m AS DECIMAL(38,18))) AS sxm,
        |    SUM(CAST(m.m * m.m AS DECIMAL(38,18))) AS smm
        |  FROM perkey p JOIN market m USING (bucket) GROUP BY p.event_type)
        |SELECT event_type, n,
        |  CASE WHEN n * CAST(smm AS DOUBLE) - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE) > 0
        |    THEN round((n * CAST(sxm AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sm AS DOUBLE)) /
        |      (n * CAST(smm AS DOUBLE) - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE)), 6)
        |  END AS beta
        |FROM s ORDER BY event_type""".stripMargin,

    "q99_up_streaks" ->
      """WITH d AS (
        |  SELECT event_type, ts, event_id,
        |    CAST(value AS DECIMAL(18,6)) - lag(CAST(value AS DECIMAL(18,6)))
        |      OVER (PARTITION BY event_type ORDER BY ts ASC, event_id ASC) AS delta
        |  FROM events WHERE value IS NOT NULL),
        |i AS (
        |  SELECT event_type, delta > 0 AS up,
        |    SUM(CASE WHEN delta > 0 THEN 0 ELSE 1 END)
        |      OVER (PARTITION BY event_type ORDER BY ts ASC, event_id ASC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
        |  FROM d),
        |st AS (SELECT event_type, isl, COUNT(*) AS len FROM i WHERE up GROUP BY 1, 2),
        |m AS (SELECT event_type, MAX(len) AS max_streak FROM st GROUP BY 1)
        |SELECT e.event_type, CAST(COALESCE(m.max_streak, 0) AS BIGINT) AS max_streak
        |FROM (SELECT DISTINCT event_type FROM events WHERE value IS NOT NULL) e
        |LEFT JOIN m USING (event_type)
        |ORDER BY event_type""".stripMargin,

    // levels mirror q97 (ewma fold), q94 (RSI frame), q82 (decimal
    // VWAP), q76 (power-sum moments) shape-for-shape, each reduced to
    // its latest row per key, then the scoring projection — so every
    // double agrees bitwise with the Spark side
    "q101_split_assign" ->
      """SELECT doc_id, source,
        |  CASE WHEN ((doc_id % 1000000007) * 2654435761) % 1000000007 % 100 < 80
        |         THEN 'train'
        |       WHEN ((doc_id % 1000000007) * 2654435761) % 1000000007 % 100 < 90
        |         THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q102_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT regexp_split_to_array(
        |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
        |  FROM documents
        |  WHERE len(regexp_split_to_array(
        |    trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) >= 2),
        |bg AS (
        |  SELECT ts[i] || ' ' || ts[i + 1] AS bigram
        |  FROM toks, unnest(range(1, len(ts))) AS t(i))
        |SELECT bigram, count(*) AS freq FROM bg
        |GROUP BY 1 HAVING count(*) >= 30 ORDER BY bigram""".stripMargin,

    "q103_epoch_shuffle" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    ((doc_id % 1000000007) * 2654435761 + 3 * 976369)
        |      % 1000000007 AS hh
        |  FROM documents)
        |SELECT doc_id, hh % 8 AS shard,
        |  row_number() OVER (PARTITION BY hh % 8 ORDER BY hh ASC, doc_id ASC)
        |    AS shard_pos
        |FROM h ORDER BY doc_id""".stripMargin,

    "q104_length_quantiles" ->
      """WITH t AS (
        |  SELECT source,
        |    CAST(len(regexp_split_to_array(
        |      trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) AS BIGINT)
        |      AS n_tokens
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  round(quantile_cont(n_tokens, 0.5), 6) AS p50,
        |  round(quantile_cont(n_tokens, 0.9), 6) AS p90,
        |  round(quantile_cont(n_tokens, 0.99), 6) AS p99
        |FROM t GROUP BY source ORDER BY source""".stripMargin,

    "q105_incremental_agg" ->
      """WITH ev AS (
        |  SELECT event_id, event_type, CAST(value AS DECIMAL(18,6)) AS value
        |  FROM events WHERE value IS NOT NULL),
        |af AS (
        |  SELECT event_type,
        |    CASE WHEN event_id % 10 = 7
        |         THEN CAST(value * 2 AS DECIMAL(18,6)) ELSE value END AS value
        |  FROM ev)
        |SELECT event_type, count(*) AS n,
        |  CAST(SUM(value) AS DOUBLE) AS total
        |FROM af GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q106_corr_matrix" ->
      """WITH base AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |    CAST(value AS DECIMAL(18,6)) AS v
        |  FROM events WHERE value IS NOT NULL),
        |perkey AS (
        |  SELECT event_type, bucket,
        |    CAST(round(CAST(SUM(v) AS DOUBLE) / COUNT(*), 9) AS DECIMAL(21,9)) AS x
        |  FROM base GROUP BY event_type, bucket),
        |p AS (
        |  SELECT a.event_type AS key_a, b.event_type AS key_b,
        |    a.x AS xa, b.x AS xb
        |  FROM perkey a JOIN perkey b USING (bucket)
        |  WHERE a.event_type < b.event_type),
        |s AS (
        |  SELECT key_a, key_b, COUNT(*) AS n,
        |    SUM(xa) AS sa, SUM(xb) AS sb,
        |    SUM(CAST(xa * xb AS DECIMAL(38,18))) AS sab,
        |    SUM(CAST(xa * xa AS DECIMAL(38,18))) AS saa,
        |    SUM(CAST(xb * xb AS DECIMAL(38,18))) AS sbb
        |  FROM p GROUP BY key_a, key_b)
        |SELECT key_a, key_b, n,
        |  CASE WHEN n * CAST(CAST(saa AS VARCHAR) AS DOUBLE) - CAST(CAST(sa AS VARCHAR) AS DOUBLE) * CAST(CAST(sa AS VARCHAR) AS DOUBLE) > 0
        |        AND n * CAST(CAST(sbb AS VARCHAR) AS DOUBLE) - CAST(CAST(sb AS VARCHAR) AS DOUBLE) * CAST(CAST(sb AS VARCHAR) AS DOUBLE) > 0
        |    THEN round((n * CAST(CAST(sab AS VARCHAR) AS DOUBLE) - CAST(CAST(sa AS VARCHAR) AS DOUBLE) * CAST(CAST(sb AS VARCHAR) AS DOUBLE)) /
        |      sqrt((n * CAST(CAST(saa AS VARCHAR) AS DOUBLE) - CAST(CAST(sa AS VARCHAR) AS DOUBLE) * CAST(CAST(sa AS VARCHAR) AS DOUBLE)) *
        |           (n * CAST(CAST(sbb AS VARCHAR) AS DOUBLE) - CAST(CAST(sb AS VARCHAR) AS DOUBLE) * CAST(CAST(sb AS VARCHAR) AS DOUBLE))), 6)
        |  END AS corr
        |FROM s ORDER BY key_a, key_b""".stripMargin,

    "q107_skew_report" ->
      """WITH c AS (
        |  SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id),
        |t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total,
        |             CAST(COUNT(*) AS BIGINT) AS nkeys FROM c),
        |r AS (
        |  SELECT user_id, cnt,
        |    row_number() OVER (ORDER BY cnt DESC, user_id ASC) AS rank
        |  FROM c)
        |SELECT user_id, cnt, rank,
        |  CAST(cnt AS DOUBLE) / total AS share,
        |  CAST(cnt AS DOUBLE) * nkeys / total AS imbalance
        |FROM r, t WHERE rank <= 20 ORDER BY rank""".stripMargin,

    "q108_underwater_spell" ->
      """WITH ev AS (
        |  SELECT event_type, ts, event_id, CAST(value AS DECIMAL(18,6)) AS v
        |  FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT event_type, ts, event_id, v, max(v) OVER w AS rm
        |  FROM ev
        |  WINDOW w AS (PARTITION BY event_type ORDER BY ts ASC, event_id ASC)),
        |f AS (
        |  SELECT event_type,
        |    CASE WHEN v < rm THEN 1 ELSE 0 END AS uw,
        |    SUM(CASE WHEN v < rm THEN 0 ELSE 1 END) OVER w2 AS isl
        |  FROM r
        |  WINDOW w2 AS (PARTITION BY event_type ORDER BY ts ASC, event_id ASC)),
        |g AS (
        |  SELECT event_type, isl, CAST(SUM(uw) AS BIGINT) AS len
        |  FROM f GROUP BY event_type, isl)
        |SELECT event_type, CAST(MAX(len) AS BIGINT) AS max_underwater_ticks
        |FROM g GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q109_dedup_rate" ->
      s"""WITH RECURSIVE $shingleCte,
        |$jacPairsCte,
        |$ccWalkCte,
        |cl AS (
        |  SELECT node AS doc_id, node = MIN(comp) AS is_canonical
        |  FROM walk GROUP BY node)
        |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN cl.is_canonical THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_canonical,
        |  CAST(COUNT(*) - SUM(CASE WHEN cl.is_canonical THEN 1 ELSE 0 END)
        |    AS DOUBLE) / COUNT(*) AS dup_share
        |FROM cl JOIN documents d USING (doc_id)
        |GROUP BY d.source ORDER BY d.source""".stripMargin,

    "q110_split_leakage" ->
      s"""WITH $shingleCte,
        |$jacPairsCte,
        |sp AS (
        |  SELECT doc_id,
        |    CASE WHEN ((doc_id % 1000000007) * 2654435761) % 1000000007 % 100 < 80
        |           THEN 'train'
        |         WHEN ((doc_id % 1000000007) * 2654435761) % 1000000007 % 100 < 90
        |           THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents)
        |SELECT j.doc_a, j.doc_b, sa.split AS split_a, sb.split AS split_b
        |FROM jac j
        |JOIN sp sa ON sa.doc_id = j.doc_a
        |JOIN sp sb ON sb.doc_id = j.doc_b
        |WHERE sa.split <> sb.split
        |ORDER BY j.doc_a, j.doc_b""".stripMargin,

    "q111_token_budget" ->
      """WITH sp AS (
        |  SELECT text,
        |    CASE WHEN ((doc_id % 1000000007) * 2654435761) % 1000000007 % 100 < 80
        |           THEN 'train'
        |         WHEN ((doc_id % 1000000007) * 2654435761) % 1000000007 % 100 < 90
        |           THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents)
        |SELECT split, count(*) AS n_docs,
        |  CAST(SUM(len(regexp_split_to_array(
        |    trim(regexp_replace(text, '\s+', ' ', 'g')), ' '))) AS BIGINT)
        |    AS ws_tokens,
        |  CAST(SUM(len(regexp_extract_all(text,
        |    '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS bpe_tokens
        |FROM sp GROUP BY split ORDER BY split""".stripMargin,

    "q112_volume_concentration" ->
      """WITH ev AS (
        |  SELECT CAST(ts AS DATE) AS day, event_type,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS qty
        |  FROM events
        |  WHERE json_extract_string(props, '$.k') IS NOT NULL),
        |bk AS (
        |  SELECT day, event_type, CAST(SUM(qty) AS BIGINT) AS w
        |  FROM ev GROUP BY day, event_type)
        |SELECT day, count(*) AS n_members,
        |  CAST(SUM(w) AS BIGINT) AS total_weight,
        |  CASE WHEN SUM(w) <> 0 THEN
        |    CAST(SUM(CAST(CAST(w AS DECIMAL(19,0)) * CAST(w AS DECIMAL(19,0))
        |        AS DECIMAL(38,0))) AS DOUBLE)
        |      / (CAST(SUM(w) AS DOUBLE) * CAST(SUM(w) AS DOUBLE))
        |  END AS hhi
        |FROM bk GROUP BY day ORDER BY day""".stripMargin,

    "q113_bollinger" ->
      """WITH w AS (
        |  SELECT event_id, event_type, CAST(value AS DECIMAL(18,6)) AS v,
        |    COUNT(*) OVER fr AS n,
        |    SUM(CAST(value AS DECIMAL(18,6))) OVER fr AS s1,
        |    SUM(CAST(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)) AS DECIMAL(38,12))) OVER fr AS s2
        |  FROM events WHERE value IS NOT NULL
        |  WINDOW fr AS (PARTITION BY event_type ORDER BY ts ASC, event_id ASC
        |    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
        |m AS (
        |  SELECT event_id, event_type, v,
        |    round(CAST(s1 AS DOUBLE) / n, 6) AS mean,
        |    CASE WHEN n > 1 THEN
        |      round(sqrt(greatest(0.0,
        |        (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (n - 1))), 6) END AS std
        |  FROM w),
        |b AS (
        |  SELECT event_id, event_type, v, mean,
        |    CASE WHEN std IS NOT NULL THEN round(mean + 2.0 * std, 6) END AS up,
        |    CASE WHEN std IS NOT NULL THEN round(mean - 2.0 * std, 6) END AS lo,
        |    std
        |  FROM m)
        |SELECT event_id, event_type, mean AS bb_mid, up AS bb_upper,
        |  lo AS bb_lower,
        |  CASE WHEN up > lo THEN
        |    round((CAST(v AS DOUBLE) - lo) / (up - lo), 6) END AS pct_b
        |FROM b ORDER BY event_id""".stripMargin,

    "q114_sharpe" ->
      """WITH b AS (
        |  SELECT event_type, CAST(value AS DECIMAL(18,6)) AS v,
        |    lag(CAST(value AS DECIMAL(18,6))) OVER (
        |      PARTITION BY event_type ORDER BY ts ASC, event_id ASC) AS pv
        |  FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT event_type,
        |    CASE WHEN pv > 0 THEN CAST(round(
        |      CAST(v - pv AS DOUBLE) / CAST(pv AS DOUBLE), 9) AS DECIMAL(16,9))
        |    END AS r
        |  FROM b),
        |s AS (
        |  SELECT event_type, COUNT(*) AS n_returns, SUM(r) AS s1,
        |    SUM(CAST(r * r AS DECIMAL(38,18))) AS s2
        |  FROM r WHERE r IS NOT NULL GROUP BY event_type)
        |SELECT event_type, n_returns,
        |  round(CAST(s1 AS DOUBLE) / n_returns, 9) AS mean_return,
        |  CASE WHEN n_returns > 1 AND greatest(0.0,
        |      (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n_returns)
        |        / (n_returns - 1)) > 0
        |    THEN round((CAST(s1 AS DOUBLE) / n_returns) / sqrt(greatest(0.0,
        |      (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n_returns)
        |        / (n_returns - 1))), 6) END AS sharpe
        |FROM s ORDER BY event_type""".stripMargin,

    "q115_return_autocorr" ->
      """WITH b AS (
        |  SELECT event_type, ts, event_id, CAST(value AS DECIMAL(18,6)) AS v,
        |    lag(CAST(value AS DECIMAL(18,6))) OVER (
        |      PARTITION BY event_type ORDER BY ts ASC, event_id ASC) AS pv
        |  FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT event_type, ts, event_id,
        |    CASE WHEN pv > 0 THEN CAST(round(
        |      CAST(v - pv AS DOUBLE) / CAST(pv AS DOUBLE), 9) AS DECIMAL(16,9))
        |    END AS r
        |  FROM b),
        |p AS (
        |  SELECT event_type, r, lag(r) OVER (
        |    PARTITION BY event_type ORDER BY ts ASC, event_id ASC) AS rp
        |  FROM r),
        |f AS (SELECT event_type, r, rp FROM p
        |      WHERE r IS NOT NULL AND rp IS NOT NULL),
        |s AS (
        |  SELECT event_type, COUNT(*) AS n_pairs,
        |    SUM(r) AS sx, SUM(rp) AS sy,
        |    SUM(CAST(r * rp AS DECIMAL(38,18))) AS sxy,
        |    SUM(CAST(r * r AS DECIMAL(38,18))) AS sxx,
        |    SUM(CAST(rp * rp AS DECIMAL(38,18))) AS syy
        |  FROM f GROUP BY event_type)
        |SELECT event_type, n_pairs,
        |  CASE WHEN n_pairs * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
        |        AND n_pairs * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
        |    THEN round((n_pairs * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |      sqrt((n_pairs * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |           (n_pairs * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
        |  END AS autocorr
        |FROM s ORDER BY event_type""".stripMargin,

    "q116_canonical_docs" ->
      s"""WITH RECURSIVE $shingleCte,
        |$jacPairsCte,
        |$ccWalkCte,
        |cl AS (SELECT node AS doc_id, MIN(comp) AS cluster_id
        |       FROM walk GROUP BY node),
        |q AS (SELECT doc_id,
        |        CAST(len(regexp_split_to_array(
        |          trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) AS BIGINT)
        |          AS quality
        |      FROM documents),
        |r AS (
        |  SELECT cl.doc_id, cl.cluster_id, q.quality,
        |    COUNT(*) OVER (PARTITION BY cl.cluster_id) AS cluster_size,
        |    row_number() OVER (PARTITION BY cl.cluster_id
        |      ORDER BY q.quality DESC, cl.doc_id ASC) AS rn
        |  FROM cl JOIN q USING (doc_id))
        |SELECT doc_id, cluster_id, CAST(cluster_size AS BIGINT) AS cluster_size,
        |  quality, rn = 1 AS keep
        |FROM r ORDER BY doc_id""".stripMargin,

    "q117_inverted_index" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(
        |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
        |  FROM documents),
        |dt AS (SELECT DISTINCT doc_id, unnest(w) AS token FROM toks),
        |g AS (
        |  SELECT token, COUNT(*) AS df,
        |    list_slice(list(doc_id ORDER BY doc_id ASC), 1, 20) AS postings
        |  FROM dt GROUP BY token)
        |SELECT token, CAST(df AS BIGINT) AS df, df > 20 AS truncated,
        |  array_to_string(postings, ',') AS postings
        |FROM g WHERE df >= 10 ORDER BY token""".stripMargin,

    "q118_semantic_dedup" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nn FROM e),
        |u AS (SELECT * FROM n WHERE nn > 0),
        |cents AS (
        |  SELECT vec_id AS cid, v AS cv, nn AS cn FROM u
        |  WHERE vec_id % 31 = 0 ORDER BY vec_id LIMIT 8),
        |scored AS (
        |  SELECT u.vec_id, u.v, u.nn, c.cid,
        |    list_dot_product(u.v, c.cv) / (u.nn * c.cn) AS cs
        |  FROM u, cents c),
        |asg AS (
        |  SELECT vec_id, v, nn, cid AS cluster FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY vec_id ORDER BY cs DESC, cid DESC) AS rn
        |    FROM scored) WHERE rn = 1),
        |drp AS (
        |  SELECT DISTINCT b.vec_id FROM asg a
        |  JOIN asg b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        |  WHERE round(list_dot_product(a.v, b.v) / (a.nn * b.nn), 6) >= 0.4)
        |SELECT e.vec_id, asg.cluster,
        |  drp.vec_id IS NULL AS keep
        |FROM e
        |LEFT JOIN asg ON asg.vec_id = e.vec_id
        |LEFT JOIN drp ON drp.vec_id = e.vec_id
        |ORDER BY e.vec_id""".stripMargin,

    "q119_winsorized_stats" ->
      """WITH b AS (
        |  SELECT event_type, CAST(value AS DECIMAL(18,6)) AS v
        |  FROM events WHERE value IS NOT NULL),
        |c AS (
        |  -- interpolate in DOUBLE (quantile_cont over a DECIMAL column
        |  -- returns DECIMAL and truncates at its scale; Spark's
        |  -- percentile interpolates in double) and snap to the 8dp grid
        |  SELECT event_type,
        |    CAST(quantile_cont(CAST(v AS DOUBLE), 0.05) AS DECIMAL(18,8)) AS lo_cut,
        |    CAST(quantile_cont(CAST(v AS DOUBLE), 0.95) AS DECIMAL(18,8)) AS hi_cut
        |  FROM b GROUP BY event_type),
        |j AS (
        |  SELECT b.event_type, b.v, c.lo_cut, c.hi_cut,
        |    least(greatest(b.v, c.lo_cut), c.hi_cut) AS w
        |  FROM b JOIN c USING (event_type))
        |SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN v < lo_cut THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_lo,
        |  CAST(SUM(CASE WHEN v > hi_cut THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_hi,
        |  CAST(MIN(lo_cut) AS DOUBLE) AS lo_cut,
        |  CAST(MIN(hi_cut) AS DOUBLE) AS hi_cut,
        |  round(CAST(SUM(w) AS DOUBLE) / COUNT(*), 6) AS winsorized_mean
        |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q120_temperature_mixture" ->
      """WITH s AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |    CAST(SUM(len(regexp_split_to_array(
        |      trim(regexp_replace(text, '\s+', ' ', 'g')), ' '))) AS BIGINT)
        |      AS n_tokens
        |  FROM documents GROUP BY source),
        |t AS (SELECT *,
        |    CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER () AS nat FROM s),
        |u AS (SELECT *,
        |    CAST(round(pow(nat, 0.5), 12) AS DECIMAL(28,12)) AS q FROM t)
        |SELECT source, n_docs, n_tokens,
        |  round(nat, 9) AS natural_share,
        |  round(CAST(q AS DOUBLE) / CAST(SUM(q) OVER () AS DOUBLE), 9)
        |    AS target_share,
        |  round(round(CAST(q AS DOUBLE) / CAST(SUM(q) OVER () AS DOUBLE), 9)
        |    / nat, 6) AS rate
        |FROM u ORDER BY source""".stripMargin,

    "q121_realized_variance" ->
      """WITH b AS (
        |  SELECT event_type, ts, event_id, CAST(value AS DECIMAL(18,6)) AS v,
        |    lag(CAST(value AS DECIMAL(18,6))) OVER (
        |      PARTITION BY event_type ORDER BY ts ASC, event_id ASC) AS pv
        |  FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT event_type, CAST(ts AS DATE) AS bucket,
        |    CASE WHEN pv > 0 THEN CAST(round(
        |      CAST(v - pv AS DOUBLE) / CAST(pv AS DOUBLE), 9) AS DECIMAL(16,9))
        |    END AS r
        |  FROM b),
        |s AS (
        |  SELECT event_type, bucket, COUNT(*) AS n_returns,
        |    SUM(CAST(r * r AS DECIMAL(38,18))) AS rv
        |  FROM r WHERE r IS NOT NULL GROUP BY event_type, bucket)
        |-- decimal->double through VARCHAR: DuckDB's direct DECIMAL(38,18)
        |-- cast multiplies by 1e-18 in floating point (not correctly
        |-- rounded — 37/150 rows differ by one ulp on this data), while
        |-- strtod and Spark's BigDecimal.doubleValue both round correctly
        |SELECT event_type, bucket, n_returns,
        |  CAST(CAST(rv AS VARCHAR) AS DOUBLE) AS realized_variance,
        |  round(sqrt(CAST(CAST(rv AS VARCHAR) AS DOUBLE)), 9) AS realized_vol
        |FROM s ORDER BY event_type, bucket""".stripMargin,

    "q124_audio_features" ->
      """WITH s AS (
        |  SELECT doc_id, 1 + doc_id % 256 AS n,
        |    unnest(range(0, CAST(1 + doc_id % 256 AS BIGINT))) AS i
        |  FROM documents),
        |amp AS (
        |  SELECT doc_id, n, ((doc_id + i) % 17 - 8) * 1000 AS a FROM s)
        |SELECT doc_id AS media_id, 8000 AS sample_rate, 1 AS channels,
        |  CAST(MIN(n) AS BIGINT) AS n_samples,
        |  round(sqrt(CAST(SUM(a * a) AS DOUBLE) / MIN(n)), 6) AS rms,
        |  TRUE AS decoded
        |FROM amp GROUP BY doc_id ORDER BY media_id""".stripMargin,

    "q141_video_features" ->
      """SELECT doc_id AS media_id, CAST(100 AS BIGINT) AS n_bytes,
        |  CAST(160 + doc_id % 160 AS INT) AS width,
        |  CAST(90 + doc_id % 90 AS INT) AS height,
        |  CAST(1 + doc_id % 250 AS BIGINT) AS n_frames,
        |  CAST((1 + doc_id % 250) * 40 AS BIGINT) AS duration_ms,
        |  TRUE AS decoded
        |FROM documents ORDER BY media_id""".stripMargin,

    // independent recomputation of the frame-pixel channel sums from id
    // arithmetic: frame f of doc d is a solid (7d+13f, 11d+17f, 3d+19f)
    // mod 256 fill over (8+d%8)×(6+d%6) pixels with the FIRST STORED
    // pixel inverted, so Σchannel = c·w·h + 255 − 2c per frame
    "q142_video_frames" ->
      """WITH g AS (
        |  SELECT doc_id, 8 + doc_id % 8 AS w, 6 + doc_id % 6 AS h,
        |    1 + doc_id % 4 AS nf
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, w, h, nf,
        |    (7 * doc_id + 13 * r.i) % 256 AS cr,
        |    (11 * doc_id + 17 * r.i) % 256 AS cg,
        |    (3 * doc_id + 19 * r.i) % 256 AS cb
        |  FROM g, range(4) r(i) WHERE r.i < nf),
        |s AS (
        |  SELECT doc_id, MIN(w) AS w, MIN(h) AS h, MIN(nf) AS nf,
        |    SUM(cr * (w * h) + 255 - 2 * cr) AS rs,
        |    SUM(cg * (w * h) + 255 - 2 * cg) AS gs,
        |    SUM(cb * (w * h) + 255 - 2 * cb) AS bs
        |  FROM f GROUP BY doc_id)
        |SELECT doc_id AS media_id, CAST(w AS INT) AS width,
        |  CAST(h AS INT) AS height, CAST(nf AS BIGINT) AS n_frames,
        |  CAST(rs AS BIGINT) AS r_sum, CAST(gs AS BIGINT) AS g_sum,
        |  CAST(bs AS BIGINT) AS b_sum, TRUE AS decoded
        |FROM s ORDER BY media_id""".stripMargin,

    // ONE oracle for the whole perceptual-pair family (the
    // cosineTopKOracle convention): the bit-grid/bit-pattern fixtures
    // hash to the SAME bit permutation of the id (which commutes with
    // xor), so image and audio near-dups alike are exactly the id
    // pairs with popcount(xor) <= 3, and the banded variants share it
    // by pigeonhole (4 chunks > 3 differing bits ⇒ some chunk
    // matches), corpus-independent
    "q152_phash_pairs" -> hammingPairsOracle,

    "q153_phash_banded" -> hammingPairsOracle,

    // identical hash→uniform→ln(u)/w chain; the top-k subquery then
    // ranks the already-cut rows
    "q184_weighted_sample" ->
      """WITH h AS (
        |  SELECT doc_id, n_chars,
        |    (((doc_id % 1000000007) * 2654435761) % 1000000007 + 1)
        |      / CAST(1000000008 AS DOUBLE) AS u
        |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
        |top AS (
        |  SELECT doc_id, CAST(n_chars AS DOUBLE) AS weight,
        |    round(ln(u) / CAST(n_chars AS DOUBLE), 12) AS es_key
        |  FROM h ORDER BY es_key DESC, doc_id ASC LIMIT 100)
        |SELECT doc_id, weight, es_key,
        |  CAST(row_number() OVER (ORDER BY es_key DESC, doc_id ASC) AS INT)
        |    AS sample_rank
        |FROM top ORDER BY sample_rank""".stripMargin,

    // same islands walk: running max-end decides breaks, cumulative
    // breaks label islands, exact integer microseconds throughout
    "q183_interval_union" ->
      """WITH iv AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, event_id,
        |    epoch_us(ts) AS s,
        |    epoch_us(ts) + CAST(CAST(value AS DECIMAL(18,6)) * 1000000
        |      AS BIGINT) AS e
        |  FROM events WHERE value IS NOT NULL),
        |m AS (
        |  SELECT event_type, day, event_id, s, e,
        |    max(e) OVER (PARTITION BY event_type, day
        |      ORDER BY s ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
        |  FROM iv WHERE s <= e),
        |i AS (
        |  SELECT event_type, day, s, e,
        |    SUM(CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY event_type, day
        |        ORDER BY s ASC, event_id ASC
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
        |  FROM m),
        |g AS (
        |  SELECT event_type, day, isl, COUNT(*) AS n,
        |    MIN(s) AS i_s, MAX(e) AS i_e
        |  FROM i GROUP BY 1, 2, 3)
        |SELECT event_type, day, CAST(SUM(n) AS BIGINT) AS n_intervals,
        |  COUNT(*) AS n_islands, CAST(SUM(i_e - i_s) AS BIGINT) AS covered_us
        |FROM g GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // forward pick = earliest qualifying click; the tolerance filters
    // candidates, which equals the operator's pick-then-cut because
    // distance grows monotonically past the nearest row
    "q182_asof_forward" ->
      """SELECT p.event_id, p.user_id, p.value,
        |  (SELECT c.value FROM events c
        |   WHERE c.event_type = 'click' AND c.user_id = p.user_id
        |     AND c.ts >= p.ts AND c.ts <= p.ts + INTERVAL 1 HOUR
        |   ORDER BY c.ts ASC, c.event_id ASC LIMIT 1) AS next_click_value
        |FROM events p WHERE p.event_type = 'purchase'
        |ORDER BY p.event_id""".stripMargin,

    // the melt recomputed as an explicit UNION ALL — proves Spark's
    // unpivot Expand emits exactly those rows
    "q180_unpivot" ->
      """WITH m AS (
        |  SELECT 'l_quantity' AS measure, l_quantity AS value FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL
        |  SELECT 'l_discount', l_discount FROM lineitem
        |  UNION ALL
        |  SELECT 'l_tax', l_tax FROM lineitem)
        |SELECT measure, COUNT(value) AS n,
        |  round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
        |    AS total
        |FROM m GROUP BY measure ORDER BY measure""".stripMargin,

    // <=> mirrors as IS NOT DISTINCT FROM; the plain = counts rely on
    // CASE treating a NULL comparison as not-matched in both engines
    "q181_null_semantics" ->
      """WITH p AS (
        |  SELECT event_type, value,
        |    lag(value) OVER w AS pv, lag(1) OVER w AS has
        |  FROM events
        |  WINDOW w AS (PARTITION BY event_type ORDER BY ts ASC, event_id ASC))
        |SELECT event_type, COUNT(*) AS n_pairs,
        |  CAST(SUM(CASE WHEN value IS NOT DISTINCT FROM pv THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_nullsafe_eq,
        |  CAST(SUM(CASE WHEN value = pv THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_plain_eq,
        |  CAST(SUM(CASE WHEN value IS NULL AND pv IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_both_null
        |FROM p WHERE has IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // every ratio rule recomputed as the SAME exact integer
    // inequality (3n <= sumlen <= 10n etc.) — no float thresholds
    "q178_gopher_rules" ->
      """WITH tw AS (
        |  SELECT doc_id, text,
        |    list_filter(regexp_split_to_array(
        |      trim(regexp_replace(text, '\s+', ' ', 'g')), ' '),
        |      t -> t <> '') AS w
        |  FROM documents),
        |st AS (
        |  SELECT doc_id,
        |    CAST(len(w) AS BIGINT) AS n_words,
        |    CAST(COALESCE(list_sum(list_transform(w,
        |      t -> CAST(length(t) AS BIGINT))), 0) AS BIGINT) AS sum_len,
        |    CAST(len(list_filter(w,
        |      t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
        |    CAST(len(list_filter(w,
        |      t -> t IN ('#', '...', '…'))) AS BIGINT) AS n_sym,
        |    CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
        |    CAST(len(list_filter(string_split(text, chr(10)),
        |      l -> l LIKE '- %' OR l LIKE '* %' OR l LIKE '• %'))
        |      AS BIGINT) AS n_bullet,
        |    CAST(len(list_filter(string_split(text, chr(10)),
        |      l -> l LIKE '%...' OR l LIKE '%…')) AS BIGINT) AS n_ell,
        |    CAST(len(list_intersect(list_distinct(w),
        |      ['the','be','to','of','and','that','have','with','a','in']))
        |      AS BIGINT) AS n_stop
        |  FROM tw),
        |r AS (
        |  SELECT doc_id, n_words,
        |    n_words >= 50 AND n_words <= 100000 AS len_ok,
        |    n_words > 0 AND 3 * n_words <= sum_len
        |      AND sum_len <= 10 * n_words AS word_len_ok,
        |    10 * n_sym <= n_words AS symbol_ok,
        |    5 * n_alpha >= 4 * n_words AS alpha_ok,
        |    10 * n_bullet <= 9 * n_lines AS bullet_ok,
        |    10 * n_ell <= 3 * n_lines AS ellipsis_ok,
        |    n_stop >= 2 AS stopword_ok
        |  FROM st)
        |SELECT doc_id, n_words, len_ok, word_len_ok, symbol_ok, alpha_ok,
        |  bullet_ok, ellipsis_ok, stopword_ok,
        |  len_ok AND word_len_ok AND symbol_ok AND alpha_ok AND bullet_ok
        |    AND ellipsis_ok AND stopword_ok AS keep
        |FROM r ORDER BY doc_id""".stripMargin,

    // aggregates the q59 bar construction DIRECTLY from parquet; a
    // hash match proves the CSV export+parse chain loses nothing
    "q177_csv_roundtrip" ->
      """WITH ticks AS (
        |  SELECT event_type, CAST(ts AS DATE) AS bar, value,
        |    row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
        |      ORDER BY ts ASC, event_id ASC) AS rn_first,
        |    row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
        |      ORDER BY ts DESC, event_id DESC) AS rn_last
        |  FROM events WHERE value IS NOT NULL),
        |bars AS (
        |  SELECT event_type, bar,
        |    MAX(value) AS high, MIN(value) AS low,
        |    ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
        |      AS volume,
        |    COUNT(*) AS n_ticks
        |  FROM ticks GROUP BY event_type, bar)
        |SELECT event_type, COUNT(*) AS n_bars,
        |  round(CAST(SUM(CAST(volume AS DECIMAL(18,2))) AS DOUBLE), 2)
        |    AS total_volume,
        |  round(MAX(high), 6) AS max_high,
        |  round(MIN(low), 6) AS min_low,
        |  CAST(SUM(n_ticks) AS BIGINT) AS sum_ticks,
        |  CAST(0 AS BIGINT) AS n_corrupt
        |FROM bars GROUP BY event_type ORDER BY event_type""".stripMargin,

    // q59's bar construction, then the Corwin–Schultz chain in the
    // Scala operation order: per-pair raw spread fixed at 12 dp
    // (post-correction), exact decimal mean
    "q176_corwin_schultz" ->
      """WITH ticks AS (
        |  SELECT event_type, CAST(ts AS DATE) AS bar, value
        |  FROM events WHERE value IS NOT NULL),
        |bars AS (
        |  SELECT event_type, bar, MAX(value) AS high, MIN(value) AS low
        |  FROM ticks GROUP BY event_type, bar),
        |p AS (
        |  SELECT event_type, high, low,
        |    lag(high) OVER w AS ph, lag(low) OVER w AS pl
        |  FROM bars WHERE low > 0
        |  WINDOW w AS (PARTITION BY event_type ORDER BY bar ASC)),
        |q AS (
        |  SELECT event_type,
        |    ln(ph/pl) AS x1, ln(high/low) AS x0,
        |    ln(greatest(ph, high) / least(pl, low)) AS gg
        |  FROM p WHERE ph IS NOT NULL),
        |a AS (
        |  SELECT event_type,
        |    (sqrt(2.0*(x1*x1 + x0*x0)) - sqrt(x1*x1 + x0*x0))
        |      / (3.0 - 2.0*sqrt(2.0))
        |      - sqrt((gg*gg) / (3.0 - 2.0*sqrt(2.0))) AS al
        |  FROM q),
        |e AS (
        |  SELECT event_type,
        |    2.0*(exp(al)-1.0)/(1.0+exp(al)) AS sraw
        |  FROM a),
        |f AS (
        |  SELECT event_type,
        |    CAST(round(greatest(sraw, 0.0), 12) AS DECIMAL(28,12)) AS s,
        |    CASE WHEN sraw < 0 THEN 1 ELSE 0 END AS neg
        |  FROM e)
        |SELECT event_type, COUNT(*) AS n_pairs,
        |  round(CAST(SUM(s) AS DOUBLE) / COUNT(*), 6) AS cs_spread,
        |  CAST(SUM(neg) AS BIGINT) AS neg_pairs
        |FROM f GROUP BY event_type ORDER BY event_type""".stripMargin,

    // PMI over distinct-doc counts with the same vocab cut (freq desc,
    // token asc) and the Scala division order; deterministic tie-broken
    // top-k on the rounded pmi
    "q174_token_pmi" ->
      """WITH toks0 AS (
        |  SELECT doc_id, regexp_split_to_array(
        |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, token FROM (
        |    SELECT doc_id, unnest(w) AS token FROM toks0)
        |  WHERE token <> ''),
        |vocab AS (
        |  SELECT token FROM (
        |    SELECT token, COUNT(*) AS f FROM tok GROUP BY token)
        |  ORDER BY f DESC, token ASC LIMIT 50),
        |dt AS (SELECT DISTINCT doc_id, token FROM tok JOIN vocab USING (token)),
        |nd AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM dt),
        |ct AS (SELECT token, COUNT(*) AS c FROM dt GROUP BY token),
        |pr AS (
        |  SELECT a.token AS token_a, b.token AS token_b, COUNT(*) AS c_ab
        |  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.token < b.token
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 5)
        |SELECT token_a, token_b, CAST(c_ab AS BIGINT) AS c_ab,
        |  CAST(ca.c AS BIGINT) AS c_a, CAST(cb.c AS BIGINT) AS c_b,
        |  round(ln((CAST(n_docs AS DOUBLE) * c_ab)
        |    / (CAST(ca.c AS DOUBLE) * cb.c)), 6) AS pmi
        |FROM pr JOIN ct ca ON ca.token = token_a
        |JOIN ct cb ON cb.token = token_b
        |CROSS JOIN nd
        |ORDER BY pmi DESC, token_a ASC, token_b ASC LIMIT 50""".stripMargin,

    // the oracle aggregates the parquet table DIRECTLY (q87 pattern) —
    // a hash match proves the jsonl write+infer+scan loses nothing
    "q173_jsonl_roundtrip" ->
      """SELECT event_type, COUNT(*) AS n,
        |  round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
        |    AS total_value,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(COUNT(value) AS BIGINT) AS n_priced
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // the q98 beta arithmetic inside a 10-row trailing window: same
    // 9-dp bucket means, same power-sum quotient, warm-up rows NULL
    "q171_rolling_beta" ->
      """WITH base AS (
        |  SELECT event_type AS k, CAST(ts AS DATE) AS bucket,
        |    CAST(value AS DECIMAL(18,6)) AS v
        |  FROM events WHERE value IS NOT NULL),
        |m AS (
        |  SELECT bucket, CAST(round(CAST(SUM(v) AS DOUBLE) / COUNT(*), 9)
        |    AS DECIMAL(21,9)) AS m
        |  FROM base GROUP BY bucket),
        |x AS (
        |  SELECT k, bucket, CAST(round(CAST(SUM(v) AS DOUBLE) / COUNT(*), 9)
        |    AS DECIMAL(21,9)) AS x
        |  FROM base GROUP BY k, bucket),
        |wnd AS (
        |  SELECT k, x.bucket,
        |    COUNT(*) OVER w AS n,
        |    SUM(x) OVER w AS sx, SUM(m) OVER w AS sm,
        |    SUM(CAST(x*m AS DECIMAL(38,18))) OVER w AS sxm,
        |    SUM(CAST(m*m AS DECIMAL(38,18))) OVER w AS smm
        |  FROM x JOIN m USING (bucket)
        |  WINDOW w AS (PARTITION BY k ORDER BY x.bucket ASC
        |    ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
        |SELECT k AS event_type, bucket, CAST(n AS BIGINT) AS n_window,
        |  CASE WHEN n = 10 AND n * CAST(smm AS DOUBLE)
        |      - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE) > 0
        |    THEN round((n * CAST(sxm AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sm AS DOUBLE))
        |      / (n * CAST(smm AS DOUBLE)
        |        - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE)), 6) END
        |    AS rolling_beta
        |FROM wnd ORDER BY event_type, bucket""".stripMargin,

    // BM25 recomputed end to end on the q117 tokenization: idf and the
    // tf saturation term in the Scala operation order, each (doc,term)
    // score fixed at 12 dp before the exact decimal per-doc sum
    "q168_bm25" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(
        |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, token FROM (
        |    SELECT doc_id, unnest(w) AS token FROM toks)
        |  WHERE token <> ''),
        |dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
        |tot AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl),
        |tf AS (
        |  SELECT doc_id, token, COUNT(*) AS tf FROM tok
        |  WHERE token IN ('spark', 'vector', 'merge') GROUP BY 1, 2),
        |dft AS (SELECT token, COUNT(*) AS dft FROM tf GROUP BY token),
        |sc AS (
        |  SELECT t.doc_id,
        |    CAST(round(
        |      ln((CAST(n_docs AS DOUBLE) - dft + 0.5)
        |          / (CAST(dft AS DOUBLE) + 0.5) + 1.0)
        |      * (CAST(tf AS DOUBLE) / (CAST(tf AS DOUBLE)
        |          + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE)
        |            / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))),
        |      12) AS DECIMAL(28,12)) AS ts
        |  FROM tf t JOIN dft USING (token) JOIN dl USING (doc_id)
        |  CROSS JOIN tot)
        |SELECT doc_id, COUNT(*) AS n_matched,
        |  round(CAST(SUM(ts) AS DOUBLE), 6) AS bm25
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // first-seen = MIN doc over the shared shingle CTE; novelty is the
    // unrounded exact-integer quotient (q107 discipline)
    "q169_novelty" ->
      s"""WITH $shingleCte,
        |f AS (SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY shingle)
        |SELECT s.doc_id, COUNT(*) AS n_shingles,
        |  CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_novel,
        |  CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
        |    AS DOUBLE) / COUNT(*) AS novelty
        |FROM sh s JOIN f USING (shingle)
        |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,

    // Ljung–Box recomputed from the same exact decimal power sums:
    // tickReturn's rounded-division returns, per-lag conditional sums,
    // rho and Q-terms fixed at 12 dp in the Scala operation order
    "q170_ljung_box" ->
      """WITH t AS (
        |  SELECT event_type, ts, event_id, CAST(value AS DECIMAL(18,6)) AS v
        |  FROM events WHERE value IS NOT NULL),
        |r0 AS (
        |  SELECT event_type, ts, event_id, v,
        |    lag(v) OVER (PARTITION BY event_type
        |      ORDER BY ts ASC, event_id ASC) AS pv
        |  FROM t),
        |r AS (
        |  SELECT event_type, ts, event_id,
        |    CAST(round(CAST(v - pv AS DOUBLE) / CAST(pv AS DOUBLE), 9)
        |      AS DECIMAL(16,9)) AS rr
        |  FROM r0 WHERE pv > 0),
        |l AS (
        |  SELECT event_type, rr,
        |    lag(rr, 1) OVER w AS l1, lag(rr, 2) OVER w AS l2,
        |    lag(rr, 3) OVER w AS l3, lag(rr, 4) OVER w AS l4,
        |    lag(rr, 5) OVER w AS l5
        |  FROM r WINDOW w AS (PARTITION BY event_type
        |    ORDER BY ts ASC, event_id ASC)),
        |s AS (
        |  SELECT event_type, COUNT(*) AS n, SUM(rr) AS s1,
        |    SUM(CAST(rr*rr AS DECIMAL(38,18))) AS s2,
        |    COUNT(l1) AS cnt1, SUM(CASE WHEN l1 IS NOT NULL
        |      THEN CAST(rr*l1 AS DECIMAL(38,18)) END) AS p1,
        |    SUM(CASE WHEN l1 IS NOT NULL THEN rr END) AS a1, SUM(l1) AS b1,
        |    COUNT(l2) AS cnt2, SUM(CASE WHEN l2 IS NOT NULL
        |      THEN CAST(rr*l2 AS DECIMAL(38,18)) END) AS p2,
        |    SUM(CASE WHEN l2 IS NOT NULL THEN rr END) AS a2, SUM(l2) AS b2,
        |    COUNT(l3) AS cnt3, SUM(CASE WHEN l3 IS NOT NULL
        |      THEN CAST(rr*l3 AS DECIMAL(38,18)) END) AS p3,
        |    SUM(CASE WHEN l3 IS NOT NULL THEN rr END) AS a3, SUM(l3) AS b3,
        |    COUNT(l4) AS cnt4, SUM(CASE WHEN l4 IS NOT NULL
        |      THEN CAST(rr*l4 AS DECIMAL(38,18)) END) AS p4,
        |    SUM(CASE WHEN l4 IS NOT NULL THEN rr END) AS a4, SUM(l4) AS b4,
        |    COUNT(l5) AS cnt5, SUM(CASE WHEN l5 IS NOT NULL
        |      THEN CAST(rr*l5 AS DECIMAL(38,18)) END) AS p5,
        |    SUM(CASE WHEN l5 IS NOT NULL THEN rr END) AS a5, SUM(l5) AS b5
        |  FROM l GROUP BY event_type),
        |c1 AS (SELECT *, CAST(s1 AS DOUBLE) / n AS rbar FROM s),
        |c2 AS (SELECT *,
        |  CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * rbar AS c0n FROM c1),
        |rho AS (
        |  SELECT *,
        |    round((CAST(p1 AS DOUBLE) - rbar * (CAST(a1 AS DOUBLE)
        |      + CAST(b1 AS DOUBLE)) + cnt1 * (rbar * rbar)) / c0n, 12) AS rho1,
        |    round((CAST(p2 AS DOUBLE) - rbar * (CAST(a2 AS DOUBLE)
        |      + CAST(b2 AS DOUBLE)) + cnt2 * (rbar * rbar)) / c0n, 12) AS rho2,
        |    round((CAST(p3 AS DOUBLE) - rbar * (CAST(a3 AS DOUBLE)
        |      + CAST(b3 AS DOUBLE)) + cnt3 * (rbar * rbar)) / c0n, 12) AS rho3,
        |    round((CAST(p4 AS DOUBLE) - rbar * (CAST(a4 AS DOUBLE)
        |      + CAST(b4 AS DOUBLE)) + cnt4 * (rbar * rbar)) / c0n, 12) AS rho4,
        |    round((CAST(p5 AS DOUBLE) - rbar * (CAST(a5 AS DOUBLE)
        |      + CAST(b5 AS DOUBLE)) + cnt5 * (rbar * rbar)) / c0n, 12) AS rho5
        |  FROM c2)
        |SELECT event_type, CAST(n AS BIGINT) AS n_returns, 5 AS n_lags,
        |  CASE WHEN n > 5 AND c0n > 0 THEN
        |    round(n * (n + 2) * (round(rho1*rho1 / (n-1), 12)
        |      + round(rho2*rho2 / (n-2), 12) + round(rho3*rho3 / (n-3), 12)
        |      + round(rho4*rho4 / (n-4), 12) + round(rho5*rho5 / (n-5), 12)),
        |      6) END AS q_stat
        |FROM rho ORDER BY event_type""".stripMargin,

    // per-source distinct shingle vocabularies off the shared shingle
    // CTE; jaccard emits the UNROUNDED exact-integer quotient (q107
    // rounding-tie discipline)
    "q167_corpus_overlap" ->
      s"""WITH $shingleCte,
        |srcsh AS (
        |  SELECT DISTINCT d.source, s.shingle
        |  FROM sh s JOIN documents d USING (doc_id)),
        |sizes AS (SELECT source, COUNT(*) AS n_sh FROM srcsh GROUP BY source),
        |inter AS (
        |  SELECT a.source AS slice_a, b.source AS slice_b, COUNT(*) AS n_inter
        |  FROM srcsh a JOIN srcsh b
        |    ON a.shingle = b.shingle AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT slice_a, slice_b,
        |  CAST(sa.n_sh AS BIGINT) AS n_a, CAST(sb.n_sh AS BIGINT) AS n_b,
        |  CAST(n_inter AS BIGINT) AS n_inter,
        |  CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.source = slice_a
        |JOIN sizes sb ON sb.source = slice_b
        |ORDER BY slice_a, slice_b""".stripMargin,

    // full PQ recompute: sample-init codebook (16 smallest ids),
    // argmin assignment and ADC distances via list_dot_product (the
    // bit-equal twin of the Scala dot kernel, q42 precedent), exact
    // decimal ADC sums
    "q166_pq_adc" -> pqAdcOracleSql(restricted = false),

    // the IVFADC composition: same trained-PQ chain, ADC scan
    // restricted to the nProbe probed inverted lists (stride-init
    // centroids, argmax-cosine assignment with the engine's
    // largest-id tiebreak, probe by centroid-query cosine)
    "q190_ivfadc" -> pqAdcOracleSql(restricted = true, queryId = 1L),
    // the persisted-index probe must reproduce the self-contained
    // IVFADC computation exactly — SAME oracle, different plumbing
    "q196_ivfadc_probe" -> pqAdcOracleSql(restricted = true),
    "q205_bpe_apply" -> bpeApplyOracleSql(FixedBpeMerges),
    "q218_bpe_fertility" -> bpeFertilityOracleSql(FixedBpeMerges),
    "q225_bpe_train" -> bpeTrainOracleSql(5),

    "q221_hll_audit" -> hllOracleSql(10),
    "q222_hll_by_source" -> hllBySourceOracleSql(10),
    "q224_kmv_overlap" -> kmvOracleSql(64),

    // mirrors TextStats.cmsHeavyHitters: every trigram OCCURRENCE
    // (short docs fall back to the whole-text gram) counts into the
    // 4×1024 sketch via (h1 + r·h2) mod 1024 double hashing; the exact
    // top-20 is a deterministic total order (count desc, gram asc)
    "q220_cms_heavyhitters" ->
      s"""WITH $gram3Cte,
        |pr AS (
        |  SELECT (CAST('0x' || substr(md5(gram), 1, 8) AS BIGINT)
        |          + rr.r * CAST('0x' || substr(md5(gram), 9, 8) AS BIGINT))
        |         % 1024 AS bucket, rr.r
        |  FROM grams CROSS JOIN (SELECT unnest(range(0, 4)) AS r) rr),
        |cms AS (
        |  SELECT r, bucket, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM pr GROUP BY 1, 2),
        |exact AS (
        |  SELECT gram, CAST(COUNT(*) AS BIGINT) AS n_exact
        |  FROM grams GROUP BY 1
        |  ORDER BY n_exact DESC, gram ASC LIMIT 20),
        |est AS (
        |  SELECT e.gram, MIN(cms.c) AS n_cms
        |  FROM (SELECT gram,
        |          CAST('0x' || substr(md5(gram), 1, 8) AS BIGINT) AS h1,
        |          CAST('0x' || substr(md5(gram), 9, 8) AS BIGINT) AS h2
        |        FROM exact) e
        |  CROSS JOIN (SELECT unnest(range(0, 4)) AS r) rr
        |  JOIN cms ON cms.r = rr.r
        |    AND cms.bucket = (e.h1 + rr.r * e.h2) % 1024
        |  GROUP BY 1)
        |SELECT e.gram, e.n_exact, s.n_cms,
        |  s.n_cms - e.n_exact AS overestimate
        |FROM exact e JOIN est s USING (gram)
        |ORDER BY n_exact DESC, gram ASC""".stripMargin,

    // mirrors Similarity.sq8Audit: identical 1e-6 floor grid, integer
    // range arithmetic, and the two correctly-rounded IEEE quotients
    "q219_sq8_audit" ->
      """WITH v AS (
        |  SELECT vec_id, d,
        |    CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS vi
        |  FROM (SELECT vec_id, unnest(embedding) AS x,
        |          generate_subscripts(embedding, 1) AS d
        |        FROM embeddings)),
        |st AS (SELECT d, MIN(vi) AS mn, MAX(vi) AS mx FROM v GROUP BY 1),
        |c AS (
        |  SELECT vec_id, vi, mn, mx,
        |    CASE WHEN mx > mn THEN
        |      CAST(floor(CAST((vi - mn) * 255 AS DOUBLE) / (mx - mn)) AS BIGINT)
        |    ELSE 0 END AS code
        |  FROM v JOIN st USING (d)),
        |r AS (
        |  SELECT vec_id, code,
        |    abs(vi - (mn + CASE WHEN mx > mn THEN
        |      CAST(floor(CAST(code * (mx - mn) AS DOUBLE) / 255) AS BIGINT)
        |    ELSE 0 END)) AS err
        |  FROM c)
        |SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_dims,
        |  CAST(SUM(code) AS BIGINT) AS code_sum,
        |  CAST(SUM(err) AS BIGINT) AS err_micro
        |FROM r GROUP BY 1 ORDER BY vec_id""".stripMargin,

    "q206_rivfadc" -> rAdcOracleSql(queryId = 0L),

    "q208_adc_rerank" -> adcRerankOracleSql(queryId = 0L, k = 10,
      shortlist = 100),

    "q210_rerank_join" ->
      (0L to 2L).map(qid =>
          s"SELECT $qid AS query_id, vec_id, cos_sim FROM (\n" +
            s"${adcRerankOracleSql(queryId = qid, k = 10, shortlist = 100)}\n)")
        .mkString("", "\nUNION ALL\n",
          "\nORDER BY query_id, cos_sim DESC, vec_id"),

    "q211_dsir_weights" ->
      s"""WITH ${dsirCte(64)}
        |SELECT doc_id, n_feats, log_weight FROM dsir
        |ORDER BY doc_id""".stripMargin,

    // mirrors Curation.repetitionRules: dup counting = occurrences
    // beyond first per (doc, line/gram) group; top bigram resolves
    // count ties to the lexicographically smallest gram; verdicts are
    // the same exact integer inequalities
    "q213_repetition_rules" ->
      """WITH tk AS (
        |  SELECT doc_id, CAST(length(text) AS BIGINT) AS total_chars,
        |    regexp_split_to_array(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS w
        |  FROM documents),
        |lines AS (
        |  SELECT doc_id, x AS line FROM (
        |    SELECT doc_id, unnest(string_split(text, chr(10))) AS x
        |    FROM documents) WHERE x <> ''),
        |nl AS (SELECT doc_id, COUNT(*) AS n_lines FROM lines GROUP BY 1),
        |lcounts AS (SELECT doc_id, line, COUNT(*) AS c FROM lines GROUP BY 1, 2),
        |ld AS (
        |  SELECT doc_id, CAST(SUM(c - 1) AS BIGINT) AS dup_lines,
        |    CAST(SUM((c - 1) * length(line)) AS BIGINT) AS dup_line_chars
        |  FROM lcounts GROUP BY 1),
        |words AS (
        |  SELECT doc_id, unnest(w) AS word, generate_subscripts(w, 1) AS i FROM tk),
        |g2 AS (
        |  SELECT a.doc_id, a.word || ' ' || b.word AS g
        |  FROM words a JOIN words b ON b.doc_id = a.doc_id AND b.i = a.i + 1
        |  UNION ALL
        |  SELECT doc_id, array_to_string(w, ' ') FROM tk WHERE len(w) < 2),
        |g2c AS (SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY 1, 2),
        |top2 AS (
        |  SELECT doc_id, g AS top_bigram, CAST(c AS BIGINT) AS top_bigram_n,
        |    CAST(c * length(g) AS BIGINT) AS top_bigram_chars
        |  FROM g2c
        |  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g ASC) = 1),
        |g5 AS (
        |  SELECT a.doc_id,
        |    a.word || ' ' || b.word || ' ' || c.word || ' ' || d.word || ' ' || e.word AS g
        |  FROM words a
        |  JOIN words b ON b.doc_id = a.doc_id AND b.i = a.i + 1
        |  JOIN words c ON c.doc_id = a.doc_id AND c.i = a.i + 2
        |  JOIN words d ON d.doc_id = a.doc_id AND d.i = a.i + 3
        |  JOIN words e ON e.doc_id = a.doc_id AND e.i = a.i + 4
        |  UNION ALL
        |  SELECT doc_id, array_to_string(w, ' ') FROM tk WHERE len(w) < 5),
        |g5c AS (SELECT doc_id, g, COUNT(*) AS c FROM g5 GROUP BY 1, 2),
        |g5d AS (
        |  SELECT doc_id, CAST(SUM((c - 1) * length(g)) AS BIGINT) AS dup_5gram_chars
        |  FROM g5c GROUP BY 1),
        |rep AS (
        |  SELECT t.doc_id, t.total_chars,
        |    COALESCE(nl.n_lines, 0) AS n_lines,
        |    COALESCE(ld.dup_lines, 0) AS dup_lines,
        |    COALESCE(ld.dup_line_chars, 0) AS dup_line_chars,
        |    top2.top_bigram, top2.top_bigram_n, top2.top_bigram_chars,
        |    COALESCE(g5d.dup_5gram_chars, 0) AS dup_5gram_chars
        |  FROM tk t
        |  LEFT JOIN nl ON nl.doc_id = t.doc_id
        |  LEFT JOIN ld ON ld.doc_id = t.doc_id
        |  LEFT JOIN top2 ON top2.doc_id = t.doc_id
        |  LEFT JOIN g5d ON g5d.doc_id = t.doc_id)
        |SELECT doc_id, total_chars, n_lines, dup_lines, dup_line_chars,
        |  top_bigram, top_bigram_n, top_bigram_chars, dup_5gram_chars,
        |  10 * dup_lines <= 3 * n_lines AS dup_line_ok,
        |  5 * dup_line_chars <= total_chars AS dup_line_char_ok,
        |  5 * top_bigram_chars <= total_chars AS top_bigram_ok,
        |  20 * dup_5gram_chars <= 3 * total_chars AS dup_5gram_ok,
        |  (10 * dup_lines <= 3 * n_lines) AND (5 * dup_line_chars <= total_chars)
        |    AND (5 * top_bigram_chars <= total_chars)
        |    AND (20 * dup_5gram_chars <= 3 * total_chars) AS keep
        |FROM rep ORDER BY doc_id""".stripMargin,

    // mirrors Curation.corpusLineDedup: df + canonical-first keeper from
    // the same line grouping, blank lines always kept, reassembly in
    // position order (string_agg FILTER drops removed lines with no
    // separator residue, exactly like the array_join of kept structs)
    "q215_line_dedup" ->
      """WITH lns AS (
        |  SELECT doc_id, i - 1 AS pos, line FROM (
        |    SELECT doc_id, unnest(string_split(text, chr(10))) AS line,
        |      generate_subscripts(string_split(text, chr(10)), 1) AS i
        |    FROM documents)),
        |active AS (SELECT * FROM lns WHERE trim(line) <> ''),
        |cnt AS (SELECT line, COUNT(*) AS df FROM active GROUP BY 1),
        |keeper AS (
        |  SELECT line, doc_id AS kdoc, pos AS kpos FROM active
        |  QUALIFY row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) = 1),
        |judged AS (
        |  SELECT a.doc_id, a.pos, a.line,
        |    (c.df < 2 OR (k.kdoc = a.doc_id AND k.kpos = a.pos)) AS keep
        |  FROM active a JOIN cnt c USING (line) JOIN keeper k USING (line)),
        |allv AS (
        |  SELECT doc_id, pos, line, keep FROM judged
        |  UNION ALL
        |  SELECT doc_id, pos, line, TRUE FROM lns WHERE trim(line) = '')
        |SELECT doc_id,
        |  COALESCE(string_agg(line, chr(10) ORDER BY pos)
        |    FILTER (WHERE keep), '') AS text_clean,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines,
        |  CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed
        |FROM allv GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // mirrors TextStats.winnowFingerprints via the shared winnowCte
    "q216_winnow_fingerprints" ->
      s"""WITH $winnowCte
        |SELECT doc_id, pos, fp FROM wfp
        |ORDER BY doc_id, pos, fp""".stripMargin,

    // mirrors TextStats.winnowOverlapPairs off the SAME winnowCte:
    // distinct (doc, fp), fp-keyed self-join, pair counts >= 2,
    // containment as the unrounded exact-integer quotient
    "q217_winnow_overlap" -> winnowPairsOracleSql(""),

    // mirrors TextStats.appendWinnowOverlapPairs: the SAME full-pair
    // chain restricted to pairs with >= 1 batch (doc_id%10==0) side —
    // append ≡ full-minus-old is the law, so the oracle IS the
    // restriction of the full oracle
    "q223_winnow_append" -> winnowPairsOracleSql(
      "\n  AND (p.doc_a % 10 = 0 OR p.doc_b % 10 = 0)"),

    // mirrors Curation.lmPerplexity: add-1 bigram LM on the en slice,
    // V = distinct en unigrams + 1, each ln fixed to the 12-dp grid,
    // exact decimal weighted sum, negate/divide/round at presentation
    "q214_lm_perplexity" ->
      """WITH tk AS (
        |  SELECT doc_id, lang,
        |    regexp_split_to_array(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS w
        |  FROM documents),
        |words AS (
        |  SELECT doc_id, lang, unnest(w) AS word,
        |    generate_subscripts(w, 1) AS i FROM tk),
        |vocab AS (
        |  SELECT COUNT(DISTINCT word) + 1 AS v FROM words
        |  WHERE lang = 'en' AND word <> ''),
        |bi AS (
        |  SELECT a.doc_id, a.lang, a.word AS p, a.word || ' ' || b.word AS g
        |  FROM words a JOIN words b ON b.doc_id = a.doc_id AND b.i = a.i + 1),
        |lm AS (SELECT g, COUNT(*) AS c_pw FROM bi WHERE lang = 'en' GROUP BY 1),
        |pcnt AS (SELECT p, COUNT(*) AS c_p FROM bi WHERE lang = 'en' GROUP BY 1),
        |pd AS (SELECT doc_id, p, g, COUNT(*) AS c FROM bi GROUP BY 1, 2, 3),
        |sc AS (
        |  SELECT pd.doc_id, pd.c,
        |    CAST(ROUND(ln((COALESCE(lm.c_pw, 0) + 1)
        |        / CAST(COALESCE(pcnt.c_p, 0) + vc.v AS DOUBLE)), 12)
        |      AS DECIMAL(16,12)) AS lnp
        |  FROM pd LEFT JOIN lm USING (g) LEFT JOIN pcnt USING (p)
        |  CROSS JOIN vocab vc)
        |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
        |  ROUND(-CAST(SUM(CAST(c AS DECIMAL(7,0)) * lnp) AS DOUBLE) / SUM(c), 6)
        |    AS avg_nll
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // q184's hash→uniform chain with the Gumbel-key ranking on top of
    // the spliced q211 weights
    "q212_dsir_resample" ->
      s"""WITH ${dsirCte(64)},
        |keyed AS (
        |  SELECT doc_id, log_weight,
        |    ROUND(log_weight - ln(-ln(
        |      (((doc_id % 1000000007) * 2654435761) % 1000000007 + 1)
        |        / CAST(1000000008 AS DOUBLE))), 12) AS gumbel_key
        |  FROM dsir),
        |top AS (
        |  SELECT doc_id, log_weight, gumbel_key
        |  FROM keyed ORDER BY gumbel_key DESC, doc_id ASC LIMIT 25)
        |SELECT doc_id, log_weight, gumbel_key,
        |  CAST(row_number() OVER (ORDER BY gumbel_key DESC, doc_id ASC)
        |    AS INT) AS sample_rank
        |FROM top ORDER BY sample_rank""".stripMargin,

    "q204_semantic_clusters" ->
      s"""WITH RECURSIVE ${hashedTfidfCte(64)},
        |grid AS (SELECT d.doc_id, r.i FROM documents d, range(64) r(i)),
        |vecs AS (
        |  SELECT g.doc_id, list(COALESCE(w.weight, 0.0) ORDER BY g.i) AS v
        |  FROM grid g LEFT JOIN wts w
        |    ON w.doc_id = g.doc_id AND w.bucket = g.i
        |  GROUP BY g.doc_id),
        |nz AS (SELECT doc_id, v FROM vecs WHERE list_dot_product(v, v) > 0),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM nz a JOIN nz b ON a.doc_id < b.doc_id
        |  WHERE round(list_dot_product(a.v, b.v) /
        |      (sqrt(list_dot_product(a.v, a.v))
        |        * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.95),
        |edges AS (
        |  SELECT id_a AS u, id_b AS v FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |walk(node, comp) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.v, w.comp FROM walk w
        |  JOIN edges e ON e.u = w.node WHERE w.comp < e.v)
        |SELECT node AS doc_id, MIN(comp) AS cluster_id,
        |  node = MIN(comp) AS is_canonical
        |FROM walk GROUP BY node ORDER BY doc_id""".stripMargin,

    "q203_embedding_covariance" ->
      """WITH e AS (
        |  SELECT vec_id AS id, ix.i AS i,
        |    CAST(round(CAST(embedding[ix.i + 1] AS DOUBLE), 9)
        |      AS DECIMAL(12,9)) AS x
        |  FROM embeddings, range(64) ix(i)),
        |p AS (
        |  SELECT a.i, b.i AS j, COUNT(*) AS n,
        |    SUM(CAST(a.x * b.x AS DECIMAL(38,18))) AS sxy,
        |    SUM(CAST(a.x AS DECIMAL(38,18))) AS sx,
        |    SUM(CAST(b.x AS DECIMAL(38,18))) AS sy
        |  FROM e a JOIN e b ON a.id = b.id AND b.i >= a.i
        |  GROUP BY 1, 2)
        |SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
        |  CAST(n AS BIGINT) AS n,
        |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)), 9) AS cov
        |FROM p ORDER BY i, j""".stripMargin,

    "q202_balanced_sample" ->
      s"""WITH ${hashedTfidfCte(64)},
        |grid AS (SELECT d.doc_id, r.i FROM documents d, range(64) r(i)),
        |vecs AS (
        |  SELECT g.doc_id, list(COALESCE(w.weight, 0.0) ORDER BY g.i) AS v
        |  FROM grid g LEFT JOIN wts w
        |    ON w.doc_id = g.doc_id AND w.bucket = g.i
        |  GROUP BY g.doc_id),
        |nz AS (SELECT doc_id, v FROM vecs WHERE list_dot_product(v, v) > 0),
        |cents AS (
        |  SELECT doc_id AS cid, v AS cv FROM nz
        |  WHERE doc_id % 31 = 0 ORDER BY doc_id ASC LIMIT 4),
        |iasg AS (
        |  SELECT doc_id, cid AS cluster FROM (
        |    SELECT e.doc_id, c.cid,
        |      row_number() OVER (PARTITION BY e.doc_id ORDER BY
        |        (list_dot_product(e.v, c.cv) /
        |          (sqrt(list_dot_product(e.v, e.v))
        |            * sqrt(list_dot_product(c.cv, c.cv)))) DESC,
        |        c.cid DESC) AS rn
        |    FROM nz e CROSS JOIN cents c) WHERE rn = 1),
        |rk AS (
        |  SELECT doc_id, cluster,
        |    row_number() OVER (PARTITION BY cluster ORDER BY
        |      ((doc_id % 1000000007) * 2654435761) % 1000000007 ASC,
        |      doc_id ASC) AS sample_rank
        |  FROM iasg)
        |SELECT doc_id, cluster, CAST(sample_rank AS BIGINT) AS sample_rank
        |FROM rk WHERE sample_rank <= 5
        |ORDER BY cluster, sample_rank""".stripMargin,

    // the reconstruction audit replays the SAME training chain and
    // decodes each vector's assigned codewords in SQL
    "q201_pq_reconstruction" ->
      s"""${pqTrainCtes(restricted = false)},
        |recon AS (
        |  SELECT b.vec_id,
        |    CAST(round(list_dot_product(b.sv, b.sv)
        |      - CAST(2 AS DOUBLE) * list_dot_product(b.sv, c.cw)
        |      + list_dot_product(c.cw, c.cw), 12) AS DECIMAL(28,12)) AS d
        |  FROM base b
        |  JOIN asg a ON a.vec_id = b.vec_id AND a.s = b.s
        |  JOIN cb c ON c.cs = a.s AND c.code = a.code)
        |SELECT vec_id, round(CAST(SUM(d) AS DOUBLE) / 64.0, 12) AS mse
        |FROM recon GROUP BY vec_id ORDER BY vec_id LIMIT 50""".stripMargin,

    // the batched ANN JOIN must equal three independent single-query
    // probes — the oracle is literally three spliced q190 chains, each
    // with its own query id and per-query probed lists
    "q197_ann_join" ->
      (0L to 2L).map(qid =>
          s"SELECT $qid AS query_id, vec_id, adc_dist FROM (\n" +
            s"${pqAdcOracleSql(restricted = true, queryId = qid)}\n)")
        .mkString("", "\nUNION ALL\n", "\nORDER BY query_id, adc_dist, vec_id"),

    // Neyman allocation recomputed end to end: exact decimal power
    // sums → 9-dp σ grid → largest-remainder apportionment → the q96
    // multiplicative-hash within-stratum rank
    "q165_neyman_sample" ->
      """WITH s AS (
        |  SELECT source, COUNT(*) AS n_rows,
        |    round(sqrt(greatest(
        |      (CAST(SUM(CAST(v*v AS DECIMAL(38,12))) AS DOUBLE)
        |        - CAST(SUM(v) AS DOUBLE) * CAST(SUM(v) AS DOUBLE) / COUNT(*))
        |        / COUNT(*), 0.0)), 9) AS sd
        |  FROM (SELECT source, CAST(n_chars AS DECIMAL(18,6)) AS v
        |        FROM documents)
        |  GROUP BY source),
        |w AS (
        |  SELECT source, n_rows,
        |    CAST(round(n_rows * sd, 6) AS DECIMAL(28,6)) AS wt
        |  FROM s),
        |tot AS (SELECT SUM(wt) AS tw, SUM(n_rows) AS tn FROM w),
        |b AS (
        |  SELECT source, n_rows,
        |    CASE WHEN CAST(tw AS DOUBLE) > 0
        |      THEN round(CAST(100 AS DOUBLE) * CAST(wt AS DOUBLE)
        |        / CAST(tw AS DOUBLE), 9)
        |      ELSE round(CAST(100 AS DOUBLE) * n_rows / tn, 9) END AS ideal
        |  FROM w CROSS JOIN tot),
        |b2 AS (
        |  SELECT source, n_rows, CAST(floor(ideal) AS BIGINT) AS base,
        |    round(ideal - CAST(floor(ideal) AS BIGINT), 9) AS rem
        |  FROM b),
        |bt AS (SELECT SUM(base) AS base_sum FROM b2),
        |q AS (
        |  SELECT source,
        |    CAST(least(base + CASE WHEN
        |        row_number() OVER (ORDER BY rem DESC, source ASC)
        |        <= greatest(100 - base_sum, 0) THEN 1 ELSE 0 END,
        |      n_rows) AS BIGINT) AS quota
        |  FROM b2 CROSS JOIN bt),
        |r AS (
        |  SELECT d.source, d.doc_id, q.quota,
        |    row_number() OVER (PARTITION BY d.source
        |      ORDER BY ((d.doc_id % 1000000007) * 2654435761) % 1000000007
        |        ASC, d.doc_id ASC) AS sample_rank
        |  FROM documents d JOIN q USING (source))
        |SELECT source, doc_id, sample_rank, quota FROM r
        |WHERE sample_rank <= quota ORDER BY source, sample_rank""".stripMargin,

    // shares q59's bar construction verbatim; each per-bar estimator
    // fixes to the 12-dp grid before the exact decimal mean, mirroring
    // the Scala operation order token-for-token so the doubles agree
    "q163_range_volatility" ->
      """WITH ticks AS (
        |  SELECT event_type, CAST(ts AS DATE) AS bar, value,
        |    row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
        |      ORDER BY ts ASC, event_id ASC) AS rn_first,
        |    row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
        |      ORDER BY ts DESC, event_id DESC) AS rn_last
        |  FROM events WHERE value IS NOT NULL),
        |bars AS (
        |  SELECT event_type, bar,
        |    MAX(CASE WHEN rn_first = 1 THEN value END) AS open,
        |    MAX(value) AS high, MIN(value) AS low,
        |    MAX(CASE WHEN rn_last = 1 THEN value END) AS close
        |  FROM ticks GROUP BY event_type, bar),
        |est AS (
        |  SELECT event_type,
        |    CAST(round(ln(high/low)*ln(high/low) / (4.0*ln(2.0)), 12)
        |      AS DECIMAL(28,12)) AS p,
        |    CAST(round(ln(high/low)*ln(high/low)*0.5
        |      - (2.0*ln(2.0)-1.0)*(ln(close/open)*ln(close/open)), 12)
        |      AS DECIMAL(28,12)) AS g,
        |    CAST(round(ln(high/close)*ln(high/open)
        |      + ln(low/close)*ln(low/open), 12) AS DECIMAL(28,12)) AS r
        |  FROM bars WHERE low > 0)
        |SELECT event_type, COUNT(*) AS n_bars,
        |  round(CAST(SUM(p) AS DOUBLE) / COUNT(*), 6) AS parkinson,
        |  round(CAST(SUM(g) AS DOUBLE) / COUNT(*), 6) AS garman_klass,
        |  round(CAST(SUM(r) AS DOUBLE) / COUNT(*), 6) AS rogers_satchell
        |FROM est GROUP BY event_type ORDER BY event_type""".stripMargin,

    // aggregated-variance Hurst: exact decimal block sums and
    // regression sums; doubles only at ln() (12-dp-fixed) and the two
    // final quotients — the Scala side computes the identical chain
    "q164_hurst" ->
      """WITH ticks AS (
        |  SELECT event_type, ts, event_id, CAST(value AS DECIMAL(18,6)) AS v
        |  FROM events WHERE value IS NOT NULL),
        |rets AS (
        |  SELECT event_type, ts, event_id,
        |    v - lag(v) OVER (PARTITION BY event_type
        |      ORDER BY ts ASC, event_id ASC) AS ret
        |  FROM ticks),
        |idx AS (
        |  SELECT event_type, ret,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY ts ASC, event_id ASC) - 1 AS j
        |  FROM rets WHERE ret IS NOT NULL),
        |blk AS (
        |  SELECT event_type, m, CAST(floor(j / m) AS BIGINT) AS b,
        |    CAST(SUM(ret) AS DECIMAL(18,6)) AS s, COUNT(*) AS cnt
        |  FROM idx CROSS JOIN (SELECT unnest([1,2,4,8,16]) AS m) ms
        |  GROUP BY event_type, m, CAST(floor(j / m) AS BIGINT)),
        |vars AS (
        |  SELECT event_type, m,
        |    (CAST(SUM(CAST(s*s AS DECIMAL(38,12))) AS DOUBLE)
        |      - CAST(SUM(s) AS DOUBLE) * CAST(SUM(s) AS DOUBLE) / COUNT(*))
        |      / COUNT(*) AS var_m
        |  FROM blk WHERE cnt = m GROUP BY event_type, m),
        |pts AS (
        |  SELECT event_type,
        |    CAST(round(ln(CAST(m AS DOUBLE)), 12) AS DECIMAL(14,12)) AS x,
        |    CAST(round(ln(var_m), 12) AS DECIMAL(14,12)) AS y
        |  FROM vars WHERE var_m > 0),
        |reg AS (
        |  SELECT event_type, COUNT(*) AS k,
        |    CAST(SUM(CAST(x*x AS DECIMAL(38,24))) AS DOUBLE)
        |      - CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE) / COUNT(*) AS sxx,
        |    CAST(SUM(CAST(x*y AS DECIMAL(38,24))) AS DOUBLE)
        |      - CAST(SUM(x) AS DOUBLE) * CAST(SUM(y) AS DOUBLE) / COUNT(*) AS sxy
        |  FROM pts GROUP BY event_type)
        |SELECT event_type, k AS n_scales,
        |  CASE WHEN k >= 2 AND sxx > 0
        |    THEN round(sxy / sxx / 2.0, 6) END AS hurst
        |FROM reg ORDER BY event_type""".stripMargin,

    // the q161 verdict arithmetic over the UNION of all three modality
    // edge families, each filtered to >=1 src0 side; flags = incidence
    // in the per-family incremental edge sets
    "q162_multimodal_append" ->
      s"""WITH RECURSIVE $shingleCte,
        |$jacPairsCte,
        |newdoc AS (SELECT doc_id FROM documents WHERE source = 'src0'),
        |exact AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM documents a
        |  JOIN documents b ON md5(a.text) = md5(b.text) AND a.doc_id < b.doc_id),
        |media AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM documents a JOIN documents b
        |    ON a.doc_id < b.doc_id
        |   AND bit_count(xor(a.doc_id, b.doc_id)) <= 3),
        |tinc AS (SELECT DISTINCT doc_a, doc_b FROM (
        |  SELECT doc_a, doc_b FROM jac
        |  UNION ALL SELECT doc_a, doc_b FROM exact)
        |  WHERE doc_a IN (SELECT doc_id FROM newdoc)
        |     OR doc_b IN (SELECT doc_id FROM newdoc)),
        |minc AS (SELECT DISTINCT doc_a, doc_b FROM media
        |  WHERE doc_a IN (SELECT doc_id FROM newdoc)
        |     OR doc_b IN (SELECT doc_id FROM newdoc)),
        |inc AS (SELECT DISTINCT doc_a, doc_b FROM (
        |  SELECT doc_a, doc_b FROM tinc
        |  UNION ALL SELECT doc_a, doc_b FROM minc)),
        |edges AS (
        |  SELECT doc_a AS u, doc_b AS v FROM inc
        |  UNION ALL SELECT doc_b, doc_a FROM inc),
        |walk(node, comp) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.v, w.comp FROM walk w
        |  JOIN edges e ON e.u = w.node WHERE w.comp < e.v),
        |cl AS (
        |  SELECT node AS doc_id, MIN(comp) AS cluster_id
        |  FROM walk GROUP BY node),
        |bt AS (SELECT cl.doc_id, cl.cluster_id
        |       FROM cl JOIN newdoc USING (doc_id)),
        |cmin AS (
        |  SELECT cluster_id, MIN(doc_id) AS dup_of FROM cl
        |  WHERE doc_id NOT IN (SELECT doc_id FROM newdoc)
        |  GROUP BY cluster_id),
        |bmin AS (
        |  SELECT cluster_id, MIN(doc_id) AS _bmin FROM bt GROUP BY cluster_id),
        |td AS (SELECT DISTINCT doc_id FROM (
        |  SELECT doc_a AS doc_id FROM tinc
        |  UNION ALL SELECT doc_b FROM tinc)),
        |md AS (SELECT DISTINCT doc_id FROM (
        |  SELECT doc_a AS doc_id FROM minc
        |  UNION ALL SELECT doc_b FROM minc))
        |SELECT bt.doc_id, cmin.dup_of,
        |  (cmin.dup_of IS NULL AND bt.doc_id = bmin._bmin) AS keep,
        |  td.doc_id IS NOT NULL AS text_dup,
        |  md.doc_id IS NOT NULL AS image_dup,
        |  md.doc_id IS NOT NULL AS audio_dup
        |FROM bt LEFT JOIN cmin USING (cluster_id)
        |JOIN bmin USING (cluster_id)
        |LEFT JOIN td ON td.doc_id = bt.doc_id
        |LEFT JOIN md ON md.doc_id = bt.doc_id
        |ORDER BY bt.doc_id""".stripMargin,

    // the full jaccard+exact pair graph filtered to pairs touching the
    // src0 batch, walked to components; dup_of = min corpus member,
    // keep = corpus-clean AND min batch member of the component
    "q161_append_dedup" ->
      s"""WITH RECURSIVE $shingleCte,
        |$jacPairsCte,
        |newdoc AS (SELECT doc_id FROM documents WHERE source = 'src0'),
        |exact AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM documents a
        |  JOIN documents b ON md5(a.text) = md5(b.text) AND a.doc_id < b.doc_id),
        |inc AS (SELECT DISTINCT doc_a, doc_b FROM (
        |  SELECT doc_a, doc_b FROM jac
        |  UNION ALL SELECT doc_a, doc_b FROM exact)
        |  WHERE doc_a IN (SELECT doc_id FROM newdoc)
        |     OR doc_b IN (SELECT doc_id FROM newdoc)),
        |edges AS (
        |  SELECT doc_a AS u, doc_b AS v FROM inc
        |  UNION ALL SELECT doc_b, doc_a FROM inc),
        |walk(node, comp) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.v, w.comp FROM walk w
        |  JOIN edges e ON e.u = w.node WHERE w.comp < e.v),
        |cl AS (
        |  SELECT node AS doc_id, MIN(comp) AS cluster_id
        |  FROM walk GROUP BY node),
        |bt AS (SELECT cl.doc_id, cl.cluster_id
        |       FROM cl JOIN newdoc USING (doc_id)),
        |cmin AS (
        |  SELECT cluster_id, MIN(doc_id) AS dup_of FROM cl
        |  WHERE doc_id NOT IN (SELECT doc_id FROM newdoc)
        |  GROUP BY cluster_id),
        |bmin AS (
        |  SELECT cluster_id, MIN(doc_id) AS _bmin FROM bt GROUP BY cluster_id)
        |SELECT bt.doc_id, cmin.dup_of,
        |  (cmin.dup_of IS NULL AND bt.doc_id = bmin._bmin) AS keep
        |FROM bt LEFT JOIN cmin USING (cluster_id)
        |JOIN bmin USING (cluster_id)
        |ORDER BY bt.doc_id""".stripMargin,

    // the union graph of all three modality edge families, walked with
    // the shared recursive-CTE shape; split/keep arithmetic is q157's,
    // applied to the UNIFIED cluster id
    "q160_multimodal_manifest" ->
      s"""WITH RECURSIVE $shingleCte,
        |$jacPairsCte,
        |exact AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM documents a
        |  JOIN documents b ON md5(a.text) = md5(b.text) AND a.doc_id < b.doc_id),
        |media AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM documents a JOIN documents b
        |    ON a.doc_id < b.doc_id
        |   AND bit_count(xor(a.doc_id, b.doc_id)) <= 3),
        |tedge AS (
        |  SELECT doc_a, doc_b FROM jac
        |  UNION SELECT doc_a, doc_b FROM exact),
        |edges AS (
        |  SELECT doc_a AS u, doc_b AS v FROM tedge
        |  UNION SELECT doc_b, doc_a FROM tedge
        |  UNION SELECT doc_a, doc_b FROM media
        |  UNION SELECT doc_b, doc_a FROM media),
        |walk(node, comp) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.v, w.comp FROM walk w
        |  JOIN edges e ON e.u = w.node WHERE w.comp < e.v),
        |cl AS (
        |  SELECT node AS doc_id, MIN(comp) AS cluster_id
        |  FROM walk GROUP BY node),
        |-- NOTE: under WITH RECURSIVE, DuckDB does NOT dedup a CTE's
        |-- top-level UNION (it parses as the recursive-union form), so
        |-- the incidence sets dedup explicitly
        |td AS (SELECT DISTINCT doc_id FROM (
        |  SELECT doc_a AS doc_id FROM tedge
        |  UNION ALL SELECT doc_b FROM tedge)),
        |md AS (SELECT DISTINCT doc_id FROM (
        |  SELECT doc_a AS doc_id FROM media
        |  UNION ALL SELECT doc_b FROM media))
        |SELECT cl.doc_id, cl.cluster_id,
        |  cl.doc_id = cl.cluster_id AS keep,
        |  CASE WHEN ((cluster_id % 1000000007) * 2654435761) % 1000000007 % 100 < 80
        |         THEN 'train'
        |       WHEN ((cluster_id % 1000000007) * 2654435761) % 1000000007 % 100 < 90
        |         THEN 'val'
        |       ELSE 'test' END AS split,
        |  td.doc_id IS NOT NULL AS text_dup,
        |  md.doc_id IS NOT NULL AS image_dup,
        |  md.doc_id IS NOT NULL AS audio_dup
        |FROM cl LEFT JOIN td ON td.doc_id = cl.doc_id
        |LEFT JOIN md ON md.doc_id = cl.doc_id
        |ORDER BY cl.doc_id""".stripMargin,

    // v1 of the q92 memo table, recomputed off the source: what the
    // store held at v1's commit instant IS this filter of customer
    "q159_time_travel_ts" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer WHERE c_custkey % 10 <> 3
        |ORDER BY c_custkey""".stripMargin,

    // the q156 walk + the fixture's 8s×8s geometry (s = 1 + id%3 ⇒
    // 64s² pixels): per cluster the argmax-pixel member keeps
    "q158_phash_canonical" ->
      s"""WITH RECURSIVE $phashWalkCte,
        |px AS (
        |  SELECT media_id, cluster_id,
        |    64 * (1 + media_id % 3) * (1 + media_id % 3) AS n_pixels
        |  FROM cl),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY cluster_id
        |    ORDER BY n_pixels DESC, media_id ASC) AS rk
        |  FROM px)
        |SELECT media_id, cluster_id, CAST(n_pixels AS BIGINT) AS n_pixels,
        |  rk = 1 AS keep
        |FROM r ORDER BY media_id""".stripMargin,

    // the q63 cluster walk feeding the q101 split hash, applied to the
    // CLUSTER id — the composition is exactly what the operator does
    "q157_cluster_safe_splits" ->
      s"""WITH RECURSIVE $shingleCte,
        |$jacPairsCte,
        |$ccWalkCte,
        |cl AS (
        |  SELECT node AS doc_id, MIN(comp) AS cluster_id
        |  FROM walk GROUP BY node)
        |SELECT doc_id, cluster_id,
        |  CASE WHEN ((cluster_id % 1000000007) * 2654435761) % 1000000007 % 100 < 80
        |         THEN 'train'
        |       WHEN ((cluster_id % 1000000007) * 2654435761) % 1000000007 % 100 < 90
        |         THEN 'val'
        |       ELSE 'test' END AS split
        |FROM cl ORDER BY doc_id""".stripMargin,

    // the q63 CC-walk shape over the q152 popcount edges: cluster id =
    // min reachable id, canonical = the member equal to it
    "q156_phash_clusters" ->
      s"""WITH RECURSIVE $phashWalkCte
        |SELECT media_id, cluster_id,
        |  media_id = cluster_id AS is_canonical
        |FROM cl ORDER BY media_id""".stripMargin,

    "q154_audiohash_pairs" -> hammingPairsOracle,

    "q155_audiohash_banded" -> hammingPairsOracle,

    // independent recomputation from id arithmetic: per valid item the
    // planted ' acct '+IBAN(14) → ' acct '+'<IBAN>' nets 12 chars
    // (card 22→12, ipv6 16+hexlen→11); invalid twins keep their full
    // planted length (IBAN 20, card 22). Base regex classes find
    // nothing, so n_redactions is the ext counts' sum.
    "q151_pii_extended" ->
      """WITH p AS (
        |  SELECT doc_id, length(text) AS nc,
        |    doc_id % 2 AS ni, (doc_id + 1) % 2 AS ncd, (doc_id + 2) % 3 AS n6,
        |    CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS bi,
        |    CASE WHEN doc_id % 3 = 1 THEN 1 ELSE 0 END AS bc
        |  FROM documents)
        |SELECT doc_id, CAST(ni AS BIGINT) AS n_iban,
        |  CAST(ncd AS BIGINT) AS n_card, CAST(n6 AS BIGINT) AS n_ip6,
        |  CAST(ni + ncd + n6 AS BIGINT) AS n_redactions,
        |  CAST(nc + 12 * ni + 12 * ncd + 11 * n6 + 20 * bi + 22 * bc
        |    AS BIGINT) AS redacted_len
        |FROM p ORDER BY doc_id""".stripMargin,

    // the q142 arithmetic for the MJPEG path: frame f of media id is a
    // gray v=(11·id+5f)%256 fill with a gray u=(7·id+13f)%256 8×8
    // patch, so each channel sums to 64·u + (w·h−64)·v per frame —
    // exact because the block-aligned grayscale fixture survives JPEG
    // bit-for-bit at all-ones quant tables (MediaSpec pins it)
    "q150_mjpeg_frames" ->
      """WITH g AS (
        |  SELECT doc_id, 16 + 8 * (doc_id % 3) AS w,
        |    8 + 8 * (doc_id % 2) AS h, 1 + doc_id % 3 AS nf
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, w, h, nf,
        |    (7 * doc_id + 13 * r.i) % 256 AS u,
        |    (11 * doc_id + 5 * r.i) % 256 AS v
        |  FROM g, range(3) r(i) WHERE r.i < nf),
        |s AS (
        |  SELECT doc_id, MIN(w) AS w, MIN(h) AS h, MIN(nf) AS nf,
        |    SUM(64 * u + (w * h - 64) * v) AS cs
        |  FROM f GROUP BY doc_id)
        |SELECT doc_id AS media_id, CAST(w AS INT) AS width,
        |  CAST(h AS INT) AS height, CAST(nf AS BIGINT) AS n_frames,
        |  CAST(cs AS BIGINT) AS r_sum, CAST(cs AS BIGINT) AS g_sum,
        |  CAST(cs AS BIGINT) AS b_sum, TRUE AS decoded
        |FROM s ORDER BY media_id""".stripMargin,

    "q148_vocab_churn" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(
        |    trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) AS token
        |  FROM documents),
        |t2 AS (SELECT doc_id, token FROM toks WHERE token <> ''),
        |va AS (
        |  SELECT token FROM t2 WHERE doc_id % 2 = 0
        |  GROUP BY token ORDER BY COUNT(*) DESC, token ASC LIMIT 20),
        |vb AS (
        |  SELECT token FROM t2 WHERE doc_id % 2 = 1
        |  GROUP BY token ORDER BY COUNT(*) DESC, token ASC LIMIT 20),
        |j AS (
        |  SELECT va.token AS ta, vb.token AS tb
        |  FROM va FULL OUTER JOIN vb ON va.token = vb.token)
        |SELECT CAST(COUNT(ta) AS BIGINT) AS n_vocab_a,
        |  CAST(COUNT(tb) AS BIGINT) AS n_vocab_b,
        |  CAST(COUNT(CASE WHEN ta IS NOT NULL AND tb IS NOT NULL THEN 1 END) AS BIGINT) AS n_shared,
        |  round(CAST(COUNT(CASE WHEN ta IS NOT NULL AND tb IS NOT NULL THEN 1 END) AS DOUBLE)
        |    / (COUNT(ta) + COUNT(tb)
        |       - COUNT(CASE WHEN ta IS NOT NULL AND tb IS NOT NULL THEN 1 END)), 6) AS jaccard
        |FROM j""".stripMargin,

    // per-dim means fixed at round-9 decimals (components are exact in
    // double; round-then-cast), products exact (25,18), cosine the one
    // double; mirrors Similarity.centroidDrift
    "q149_embedding_drift" ->
      """WITH ex AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
        |    CAST(round(CAST(unnest(embedding) AS DOUBLE), 9) AS DECIMAL(21,9)) AS v
        |  FROM embeddings),
        |ma AS (
        |  SELECT dim, CAST(round(CAST(SUM(v) AS DOUBLE) / COUNT(*), 9)
        |    AS DECIMAL(12,9)) AS m
        |  FROM ex WHERE vec_id % 2 = 0 GROUP BY dim),
        |mb AS (
        |  SELECT dim, CAST(round(CAST(SUM(v) AS DOUBLE) / COUNT(*), 9)
        |    AS DECIMAL(12,9)) AS m
        |  FROM ex WHERE vec_id % 2 = 1 GROUP BY dim),
        |s AS (
        |  SELECT COUNT(*) AS n_dims,
        |    SUM(CAST(ma.m * mb.m AS DECIMAL(38,18))) AS ab,
        |    SUM(CAST(ma.m * ma.m AS DECIMAL(38,18))) AS aa,
        |    SUM(CAST(mb.m * mb.m AS DECIMAL(38,18))) AS bb
        |  FROM ma JOIN mb USING (dim))
        |SELECT CAST(n_dims AS BIGINT) AS n_dims,
        |  CASE WHEN aa > 0 AND bb > 0 THEN
        |    round(CAST(CAST(ab AS VARCHAR) AS DOUBLE) /
        |      (sqrt(CAST(CAST(aa AS VARCHAR) AS DOUBLE)) *
        |       sqrt(CAST(CAST(bb AS VARCHAR) AS DOUBLE))), 6)
        |  END AS centroid_cosine,
        |  round(sqrt(CAST(CAST(aa AS VARCHAR) AS DOUBLE)), 9) AS norm_a,
        |  round(sqrt(CAST(CAST(bb AS VARCHAR) AS DOUBLE)), 9) AS norm_b
        |FROM s""".stripMargin,

    // full drift-report mirror: histograms, add-one shares, ln of the
    // raw ratio at 12 dp (zipfSlope's transcendental rule), exact
    // decimal contributions; decimal→double casts route through
    // VARCHAR (the measured DuckDB cast-rounding hazard)
    "q147_corpus_drift" ->
      """WITH ca AS (
        |  SELECT CAST(floor(length(text) / 50) AS BIGINT) AS bucket,
        |    COUNT(*) AS n_a
        |  FROM documents WHERE doc_id % 2 = 0 GROUP BY 1),
        |cb AS (
        |  SELECT CAST(floor(length(text) / 50) AS BIGINT) AS bucket,
        |    COUNT(*) AS n_b
        |  FROM documents WHERE doc_id % 2 = 1 GROUP BY 1),
        |j AS (
        |  SELECT COALESCE(ca.bucket, cb.bucket) AS bucket,
        |    COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b
        |  FROM ca FULL OUTER JOIN cb ON ca.bucket = cb.bucket),
        |t AS (
        |  SELECT bucket, n_a, n_b,
        |    SUM(n_a) OVER () AS ta, SUM(n_b) OVER () AS tb,
        |    COUNT(*) OVER () AS k
        |  FROM j),
        |s AS (
        |  SELECT bucket, n_a, n_b,
        |    CAST(round(CAST(n_a + 1 AS DOUBLE) / (ta + k), 9) AS DECIMAL(10,9)) AS p_a,
        |    CAST(round(CAST(n_b + 1 AS DOUBLE) / (tb + k), 9) AS DECIMAL(10,9)) AS p_b,
        |    CAST(round(ln((CAST(n_a + 1 AS DOUBLE) / (ta + k)) /
        |      (CAST(n_b + 1 AS DOUBLE) / (tb + k))), 12) AS DECIMAL(14,12)) AS lnr
        |  FROM t),
        |c AS (
        |  SELECT bucket, n_a, n_b, p_a, p_b,
        |    CAST(p_a * lnr AS DECIMAL(26,21)) AS contrib
        |  FROM s)
        |SELECT bucket, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        |  CAST(CAST(p_a AS VARCHAR) AS DOUBLE) AS p_a,
        |  CAST(CAST(p_b AS VARCHAR) AS DOUBLE) AS p_b,
        |  round(CAST(CAST(contrib AS VARCHAR) AS DOUBLE), 12) AS kl_contrib,
        |  round(CAST(CAST(SUM(contrib) OVER () AS VARCHAR) AS DOUBLE), 9) AS kl_total
        |FROM c ORDER BY bucket""".stripMargin,

    // Σchannel = c·w·h + 255 − 2c (solid fill, inverted top-left) —
    // the q142 arithmetic with a single frame and its own color rule
    "q146_image_pixels" ->
      """WITH g AS (
        |  SELECT doc_id, 8 + doc_id % 8 AS w, 6 + doc_id % 6 AS h,
        |    (5 * doc_id + 11) % 256 AS cr,
        |    (7 * doc_id + 3) % 256 AS cg,
        |    (11 * doc_id + 7) % 256 AS cb
        |  FROM documents)
        |SELECT doc_id AS media_id, CAST(w AS INT) AS width,
        |  CAST(h AS INT) AS height,
        |  CAST(cr * (w * h) + 255 - 2 * cr AS BIGINT) AS r_sum,
        |  CAST(cg * (w * h) + 255 - 2 * cg AS BIGINT) AS g_sum,
        |  CAST(cb * (w * h) + 255 - 2 * cb AS BIGINT) AS b_sum,
        |  TRUE AS decoded
        |FROM g ORDER BY media_id""".stripMargin,

    "q145_vocab_coverage" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(
        |    trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) AS token
        |  FROM documents),
        |t2 AS (SELECT doc_id, token FROM toks WHERE token <> ''),
        |freq AS (SELECT token, COUNT(*) AS f FROM t2 GROUP BY token),
        |vocab AS (SELECT token FROM freq ORDER BY f DESC, token ASC LIMIT 20),
        |scored AS (
        |  SELECT d.doc_id, COUNT(*) AS n_tokens,
        |    SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS n_oov
        |  FROM t2 d LEFT JOIN vocab v USING (token)
        |  GROUP BY d.doc_id)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(n_oov AS BIGINT) AS n_oov,
        |  round(CAST(n_oov AS DOUBLE) / n_tokens, 6) AS oov_rate
        |FROM scored ORDER BY doc_id""".stripMargin,

    // full mirror of the lead-lag pipeline: bucket means → exact
    // decimal return differences → lagged leader values via an
    // observation-index self-join (≡ Spark's lag(r, ℓ) window) →
    // per-(pair, lag) Pearson from exact sums → deterministic argmax
    "q144_leadlag_corr" ->
      """WITH base AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |    CAST(value AS DECIMAL(18,6)) AS v
        |  FROM events WHERE value IS NOT NULL),
        |perkey AS (
        |  SELECT event_type, bucket,
        |    CAST(round(CAST(SUM(v) AS DOUBLE) / COUNT(*), 9) AS DECIMAL(21,9)) AS x
        |  FROM base GROUP BY event_type, bucket),
        |rx AS (
        |  SELECT event_type, bucket,
        |    CAST(round(x - lag(x) OVER (PARTITION BY event_type ORDER BY bucket),
        |      6) AS DECIMAL(18,6)) AS r
        |  FROM perkey),
        |rr AS (
        |  SELECT event_type, bucket, r,
        |    row_number() OVER (PARTITION BY event_type ORDER BY bucket) AS rn
        |  FROM rx WHERE r IS NOT NULL),
        |lagged AS (
        |  SELECT cur.event_type AS key_b, cur.bucket, g.i AS l, prev.r AS rb
        |  FROM rr cur
        |  CROSS JOIN range(4) g(i)
        |  JOIN rr prev ON prev.event_type = cur.event_type
        |    AND prev.rn = cur.rn - g.i),
        |cells AS (
        |  SELECT a.event_type AS key_a, b.key_b, b.l, COUNT(*) AS n,
        |    SUM(a.r) AS sa, SUM(b.rb) AS sb,
        |    SUM(CAST(a.r * b.rb AS DECIMAL(38,12))) AS sab,
        |    SUM(CAST(a.r * a.r AS DECIMAL(38,12))) AS saa,
        |    SUM(CAST(b.rb * b.rb AS DECIMAL(38,12))) AS sbb
        |  FROM rr a JOIN lagged b USING (bucket)
        |  WHERE a.event_type <> b.key_b AND (b.l > 0 OR a.event_type < b.key_b)
        |  GROUP BY 1, 2, 3),
        |scored AS (
        |  SELECT least(key_a, key_b) AS ka, greatest(key_a, key_b) AS kb,
        |    CASE WHEN key_a < key_b THEN l ELSE -l END AS lag, n,
        |    CASE WHEN n >= 3
        |          AND n * CAST(CAST(saa AS VARCHAR) AS DOUBLE) - CAST(CAST(sa AS VARCHAR) AS DOUBLE) * CAST(CAST(sa AS VARCHAR) AS DOUBLE) > 0
        |          AND n * CAST(CAST(sbb AS VARCHAR) AS DOUBLE) - CAST(CAST(sb AS VARCHAR) AS DOUBLE) * CAST(CAST(sb AS VARCHAR) AS DOUBLE) > 0
        |      THEN round((n * CAST(CAST(sab AS VARCHAR) AS DOUBLE) - CAST(CAST(sa AS VARCHAR) AS DOUBLE) * CAST(CAST(sb AS VARCHAR) AS DOUBLE)) /
        |        sqrt((n * CAST(CAST(saa AS VARCHAR) AS DOUBLE) - CAST(CAST(sa AS VARCHAR) AS DOUBLE) * CAST(CAST(sa AS VARCHAR) AS DOUBLE)) *
        |             (n * CAST(CAST(sbb AS VARCHAR) AS DOUBLE) - CAST(CAST(sb AS VARCHAR) AS DOUBLE) * CAST(CAST(sb AS VARCHAR) AS DOUBLE))), 6)
        |    END AS corr
        |  FROM cells),
        |best AS (
        |  SELECT ka AS key_a, kb AS key_b, CAST(lag AS INT) AS best_lag,
        |    n AS n_obs, corr,
        |    row_number() OVER (PARTITION BY ka, kb
        |      ORDER BY abs(corr) DESC, abs(lag) ASC, lag ASC) AS rn
        |  FROM scored WHERE corr IS NOT NULL)
        |SELECT key_a, key_b, best_lag, n_obs, corr
        |FROM best WHERE rn = 1 ORDER BY key_a, key_b""".stripMargin,

    // independent recomputation from id arithmetic: nE=id%3 emails of
    // match length 16+digits(id) (+9 for ' contact '), nP=(id+1)%3
    // phones of match length 15 (+6), nI=(id+2)%3 IPs of match length
    // 7+digits(id%256) (+6); tags <EMAIL>/<PHONE>=7 chars, <IP>=4
    "q143_pii_redact" ->
      """WITH p AS (
        |  SELECT doc_id, length(text) AS nc,
        |    doc_id % 3 AS ne, (doc_id + 1) % 3 AS np, (doc_id + 2) % 3 AS ni,
        |    length(CAST(doc_id AS VARCHAR)) AS de,
        |    length(CAST(doc_id % 256 AS VARCHAR)) AS di
        |  FROM documents)
        |SELECT doc_id, CAST(ne + np + ni AS BIGINT) AS n_redactions,
        |  CAST(nc + ne * (25 + de) + np * 21 + ni * (13 + di)
        |    - ne * (16 + de) + ne * 7 - np * 15 + np * 7
        |    - ni * (7 + di) + ni * 4 AS BIGINT) AS redacted_len
        |FROM p ORDER BY doc_id""".stripMargin,

    "q140_portfolio_nav" ->
      """WITH ticks AS (
        |  SELECT event_type, CAST(ts AS DATE) AS bucket,
        |    CAST(value AS DECIMAL(18,6)) AS v,
        |    row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
        |      ORDER BY ts ASC, event_id ASC) AS rf,
        |    row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
        |      ORDER BY ts DESC, event_id DESC) AS rl
        |  FROM events WHERE value IS NOT NULL),
        |bars AS (
        |  SELECT event_type, bucket,
        |    MAX(CASE WHEN rf = 1 THEN v END) AS o,
        |    MAX(CASE WHEN rl = 1 THEN v END) AS c
        |  FROM ticks GROUP BY event_type, bucket),
        |r AS (
        |  SELECT event_type, bucket,
        |    CAST(round(CAST(c - o AS DOUBLE) / CAST(o AS DOUBLE), 9)
        |      AS DECIMAL(16,9)) AS ret
        |  FROM bars WHERE o > 0),
        |daily AS (
        |  SELECT bucket, COUNT(*) AS n_keys,
        |    CAST(round(CAST(CAST(SUM(ret) AS VARCHAR) AS DOUBLE) / COUNT(*), 9)
        |      AS DECIMAL(16,9)) AS pr
        |  FROM r GROUP BY bucket),
        |l AS (
        |  SELECT bucket, n_keys, pr,
        |    CASE WHEN pr > -1 THEN CAST(round(
        |      ln(1.0 + CAST(CAST(pr AS VARCHAR) AS DOUBLE)), 12)
        |      AS DECIMAL(16,12)) END AS lnr
        |  FROM daily),
        |c AS (
        |  SELECT bucket, n_keys, pr,
        |    MAX(CASE WHEN lnr IS NULL THEN 1 ELSE 0 END) OVER cw AS hasnull,
        |    SUM(lnr) OVER cw AS cln
        |  FROM l WINDOW cw AS (ORDER BY bucket ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT bucket, n_keys,
        |  CAST(CAST(pr AS VARCHAR) AS DOUBLE) AS port_return,
        |  CASE WHEN hasnull = 0 THEN
        |    round(exp(CAST(CAST(cln AS VARCHAR) AS DOUBLE)), 6) END AS nav
        |FROM c ORDER BY bucket""".stripMargin,

    "q139_event_study" ->
      """WITH b AS (
        |  SELECT event_type, CAST(value AS DECIMAL(18,6)) AS v,
        |    lag(CAST(value AS DECIMAL(18,6))) OVER w AS pv,
        |    lead(CAST(value AS DECIMAL(18,6)), 1) OVER w AS f1,
        |    lead(CAST(value AS DECIMAL(18,6)), 5) OVER w AS f5
        |  FROM events WHERE value IS NOT NULL
        |  WINDOW w AS (PARTITION BY event_type ORDER BY ts ASC, event_id ASC)),
        |r AS (
        |  SELECT event_type,
        |    CASE WHEN pv > 0 THEN CAST(round(
        |      CAST(v - pv AS DOUBLE) / CAST(pv AS DOUBLE), 9) AS DECIMAL(16,9))
        |    END AS r,
        |    CASE WHEN f1 IS NOT NULL AND v > 0 THEN CAST(round(
        |      CAST(f1 - v AS DOUBLE) / CAST(v AS DOUBLE), 9) AS DECIMAL(16,9))
        |    END AS fwd1,
        |    CASE WHEN f5 IS NOT NULL AND v > 0 THEN CAST(round(
        |      CAST(f5 - v AS DOUBLE) / CAST(v AS DOUBLE), 9) AS DECIMAL(16,9))
        |    END AS fwd5
        |  FROM b),
        |e AS (SELECT * FROM r WHERE r > CAST(0.02 AS DECIMAL(16,9))),
        |u AS (
        |  SELECT event_type, 1 AS horizon, fwd1 AS fwd FROM e
        |  UNION ALL
        |  SELECT event_type, 5 AS horizon, fwd5 AS fwd FROM e),
        |s AS (
        |  SELECT event_type, horizon, COUNT(*) AS n_events,
        |    SUM(fwd) AS sf, COUNT(CASE WHEN fwd > 0 THEN 1 END) AS hits
        |  FROM u WHERE fwd IS NOT NULL GROUP BY event_type, horizon)
        |SELECT event_type, horizon, n_events,
        |  round(CAST(CAST(sf AS VARCHAR) AS DOUBLE) / n_events, 9) AS mean_fwd_return,
        |  round(CAST(hits AS DOUBLE) / n_events, 6) AS hit_rate
        |FROM s ORDER BY event_type, horizon""".stripMargin,

    "q137_token_entropy" ->
      """WITH tf AS (
        |  SELECT source,
        |    unnest(regexp_split_to_array(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) AS token
        |  FROM documents),
        |f AS (SELECT source, token, COUNT(*) AS freq FROM tf
        |      WHERE token <> '' GROUP BY 1, 2),
        |s AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS vocab_size,
        |    CAST(SUM(freq) AS BIGINT) AS total_tokens,
        |    SUM(CAST(CAST(freq AS DECIMAL(18,0)) *
        |      CAST(round(ln(freq), 12) AS DECIMAL(14,12)) AS DECIMAL(33,12))) AS sfl
        |  FROM f GROUP BY source)
        |SELECT source, vocab_size, total_tokens,
        |  round(ln(total_tokens) -
        |    CAST(CAST(sfl AS VARCHAR) AS DOUBLE) / total_tokens, 6) AS entropy,
        |  CASE WHEN vocab_size > 1 THEN
        |    round((ln(total_tokens) -
        |      CAST(CAST(sfl AS VARCHAR) AS DOUBLE) / total_tokens) /
        |      ln(vocab_size), 6)
        |  END AS efficiency
        |FROM s ORDER BY source""".stripMargin,

    "q138_variance_ratio" ->
      """WITH b AS (
        |  SELECT event_type, ts, event_id, CAST(value AS DECIMAL(18,6)) AS v,
        |    lag(CAST(value AS DECIMAL(18,6))) OVER (
        |      PARTITION BY event_type ORDER BY ts ASC, event_id ASC) AS pv
        |  FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT event_type, ts, event_id,
        |    CASE WHEN pv > 0 THEN CAST(round(
        |      CAST(v - pv AS DOUBLE) / CAST(pv AS DOUBLE), 9) AS DECIMAL(16,9))
        |    END AS r
        |  FROM b),
        |rq AS (
        |  SELECT event_type, r,
        |    CASE WHEN COUNT(r) OVER wq = 5 THEN
        |      CAST(SUM(r) OVER wq AS DECIMAL(18,9)) END AS rq
        |  FROM r WHERE r IS NOT NULL
        |  WINDOW wq AS (PARTITION BY event_type ORDER BY ts ASC, event_id ASC
        |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)),
        |s AS (
        |  SELECT event_type, COUNT(*) AS n_returns,
        |    SUM(r) AS s1, SUM(CAST(r * r AS DECIMAL(38,18))) AS s2,
        |    COUNT(rq) AS n_q,
        |    SUM(rq) AS t1, SUM(CAST(rq * rq AS DECIMAL(38,18))) AS t2
        |  FROM rq GROUP BY event_type),
        |d AS (
        |  SELECT event_type, n_returns, n_q,
        |    CAST(CAST(s1 AS VARCHAR) AS DOUBLE) AS ds1,
        |    CAST(CAST(s2 AS VARCHAR) AS DOUBLE) AS ds2,
        |    CAST(CAST(t1 AS VARCHAR) AS DOUBLE) AS dt1,
        |    CAST(CAST(t2 AS VARCHAR) AS DOUBLE) AS dt2
        |  FROM s)
        |SELECT event_type, n_returns, n_q,
        |  CASE WHEN n_q >= 2 AND
        |    ds2 / n_returns - (ds1 / n_returns) * (ds1 / n_returns) > 0 THEN
        |    round((dt2 / n_q - (dt1 / n_q) * (dt1 / n_q)) /
        |      (5 * (ds2 / n_returns - (ds1 / n_returns) * (ds1 / n_returns))), 6)
        |  END AS variance_ratio
        |FROM d ORDER BY event_type""".stripMargin,

    "q135_kyle_lambda" ->
      """WITH b AS (
        |  SELECT event_type, ts, event_id, CAST(value AS DECIMAL(18,6)) AS v,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS qty,
        |    lag(CAST(value AS DECIMAL(18,6))) OVER (
        |      PARTITION BY event_type ORDER BY ts ASC, event_id ASC) AS pv
        |  FROM events WHERE value IS NOT NULL),
        |sg AS (
        |  SELECT event_type, qty, CAST(v - pv AS DECIMAL(16,6)) AS dp,
        |    last_value(CASE WHEN v - pv > 0 THEN 1
        |                    WHEN v - pv < 0 THEN -1 END IGNORE NULLS)
        |      OVER (PARTITION BY event_type ORDER BY ts ASC, event_id ASC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sgn
        |  FROM b),
        |f AS (
        |  SELECT event_type, dp,
        |    CASE WHEN sgn = 1 THEN CAST(qty AS DECIMAL(16,6))
        |         ELSE -CAST(qty AS DECIMAL(16,6)) END AS x
        |  FROM sg WHERE dp IS NOT NULL AND sgn IS NOT NULL AND qty IS NOT NULL),
        |s AS (
        |  SELECT event_type, COUNT(*) AS n_ticks,
        |    SUM(dp) AS sy, SUM(x) AS sx,
        |    SUM(CAST(x * dp AS DECIMAL(38,12))) AS sxy,
        |    SUM(CAST(x * x AS DECIMAL(38,12))) AS sxx
        |  FROM f GROUP BY event_type),
        |d AS (
        |  SELECT event_type, n_ticks,
        |    CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS dsy,
        |    CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS dsx,
        |    CAST(CAST(sxy AS VARCHAR) AS DOUBLE) AS dsxy,
        |    CAST(CAST(sxx AS VARCHAR) AS DOUBLE) AS dsxx
        |  FROM s)
        |SELECT event_type, n_ticks,
        |  CASE WHEN n_ticks >= 2 AND n_ticks * dsxx - dsx * dsx > 0 THEN
        |    round((n_ticks * dsxy - dsx * dsy) / (n_ticks * dsxx - dsx * dsx), 9)
        |  END AS kyle_lambda
        |FROM d ORDER BY event_type""".stripMargin,

    "q136_roll_spread" ->
      """WITH b AS (
        |  SELECT event_type, ts, event_id, CAST(value AS DECIMAL(18,6)) AS v,
        |    lag(CAST(value AS DECIMAL(18,6))) OVER (
        |      PARTITION BY event_type ORDER BY ts ASC, event_id ASC) AS pv
        |  FROM events WHERE value IS NOT NULL),
        |dp AS (
        |  SELECT event_type, CAST(v - pv AS DECIMAL(16,6)) AS d1,
        |    lag(CAST(v - pv AS DECIMAL(16,6))) OVER (
        |      PARTITION BY event_type ORDER BY ts ASC, event_id ASC) AS d0
        |  FROM b),
        |s AS (
        |  SELECT event_type, COUNT(*) AS n_pairs,
        |    SUM(d1) AS sa, SUM(d0) AS sb,
        |    SUM(CAST(d1 * d0 AS DECIMAL(38,12))) AS sab
        |  FROM dp WHERE d1 IS NOT NULL AND d0 IS NOT NULL
        |  GROUP BY event_type),
        |d AS (
        |  SELECT event_type, n_pairs,
        |    (CAST(CAST(sab AS VARCHAR) AS DOUBLE) -
        |     CAST(CAST(sa AS VARCHAR) AS DOUBLE) *
        |     CAST(CAST(sb AS VARCHAR) AS DOUBLE) / n_pairs) / n_pairs AS cov
        |  FROM s)
        |SELECT event_type, n_pairs, round(cov, 9) AS dp_autocov,
        |  CASE WHEN cov < 0 THEN round(2.0 * sqrt(-cov), 6) END AS roll_spread
        |FROM d ORDER BY event_type""".stripMargin,

    "q133_pair_spread" ->
      """WITH base AS (
        |  SELECT event_type, CAST(ts AS DATE) AS bucket,
        |    CAST(value AS DECIMAL(18,6)) AS v
        |  FROM events WHERE value IS NOT NULL),
        |perkey AS (
        |  SELECT event_type, bucket,
        |    CAST(round(CAST(SUM(v) AS DOUBLE) / COUNT(*), 9) AS DECIMAL(21,9)) AS x
        |  FROM base GROUP BY event_type, bucket),
        |p AS (
        |  SELECT a.event_type AS key_a, b.event_type AS key_b, bucket,
        |    a.x AS xa, b.x AS xb
        |  FROM perkey a JOIN perkey b USING (bucket)
        |  WHERE a.event_type < b.event_type),
        |s AS (
        |  SELECT key_a, key_b, COUNT(*) AS n_buckets,
        |    SUM(xa) AS sa, SUM(xb) AS sb,
        |    SUM(CAST(xa * xb AS DECIMAL(38,18))) AS sab,
        |    SUM(CAST(xa * xa AS DECIMAL(38,18))) AS saa,
        |    SUM(CAST(xb * xb AS DECIMAL(38,18))) AS sbb,
        |    MAX(bucket) AS last_bucket,
        |    max_by(xa, bucket) AS la, max_by(xb, bucket) AS lb
        |  FROM p GROUP BY key_a, key_b),
        |d AS (
        |  SELECT key_a, key_b, n_buckets, last_bucket,
        |    CAST(n_buckets AS DOUBLE) AS n,
        |    CAST(CAST(sa AS VARCHAR) AS DOUBLE) AS dsa, CAST(CAST(sb AS VARCHAR) AS DOUBLE) AS dsb,
        |    CAST(CAST(sab AS VARCHAR) AS DOUBLE) AS dsab, CAST(CAST(saa AS VARCHAR) AS DOUBLE) AS dsaa,
        |    CAST(CAST(sbb AS VARCHAR) AS DOUBLE) AS dsbb,
        |    CAST(CAST(la AS VARCHAR) AS DOUBLE) AS dla,
        |    CAST(CAST(lb AS VARCHAR) AS DOUBLE) AS dlb
        |  FROM s),
        |f AS (
        |  SELECT key_a, key_b, n_buckets, last_bucket, dla, dlb, n, dsa,
        |    dsbb - dsb * dsb / n AS sbbc,
        |    dsab - dsa * dsb / n AS sabc,
        |    dsaa - dsa * dsa / n AS saac,
        |    dsb
        |  FROM d),
        |g AS (
        |  SELECT *, sabc / sbbc AS beta,
        |    (dsa - (sabc / sbbc) * dsb) / n AS alpha,
        |    saac - (sabc / sbbc) * sabc AS rss
        |  FROM f)
        |SELECT key_a, key_b, n_buckets, last_bucket,
        |  CASE WHEN n_buckets >= 3 AND sbbc > 0 THEN round(beta, 6) END AS beta,
        |  CASE WHEN n_buckets >= 3 AND sbbc > 0 THEN round(alpha, 6) END AS alpha,
        |  CASE WHEN n_buckets >= 3 AND sbbc > 0 AND rss > 0 THEN
        |    round((dla - alpha - beta * dlb) / sqrt(rss / (n_buckets - 2)), 6)
        |  END AS last_z,
        |  CASE WHEN n_buckets >= 3 AND sbbc > 0 AND rss > 0 THEN
        |    CAST(abs((dla - alpha - beta * dlb) / sqrt(rss / (n_buckets - 2)))
        |      >= 2.0 AS INT)
        |  END AS diverged
        |FROM g ORDER BY key_a, key_b""".stripMargin,

    "q134_vol_cone" ->
      """WITH b AS (
        |  SELECT event_type, ts, event_id, CAST(value AS DECIMAL(18,6)) AS v,
        |    lag(CAST(value AS DECIMAL(18,6))) OVER (
        |      PARTITION BY event_type ORDER BY ts ASC, event_id ASC) AS pv
        |  FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT event_type, CAST(ts AS DATE) AS bucket,
        |    CASE WHEN pv > 0 THEN CAST(round(
        |      CAST(v - pv AS DOUBLE) / CAST(pv AS DOUBLE), 9) AS DECIMAL(16,9))
        |    END AS r
        |  FROM b),
        |rv AS (
        |  SELECT event_type, bucket,
        |    CAST(round(CAST(CAST(SUM(CAST(r * r AS DECIMAL(38,18))) AS VARCHAR)
        |      AS DOUBLE), 12) AS DECIMAL(30,12)) AS rvd
        |  FROM r WHERE r IS NOT NULL GROUP BY event_type, bucket),
        |roll AS (
        |  SELECT event_type, h, cnt, rsum FROM (
        |    SELECT event_type, 5 AS h,
        |      COUNT(rvd) OVER w5 AS cnt, SUM(rvd) OVER w5 AS rsum
        |    FROM rv WINDOW w5 AS (PARTITION BY event_type ORDER BY bucket ASC
        |      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |    UNION ALL
        |    SELECT event_type, 10 AS h,
        |      COUNT(rvd) OVER w10 AS cnt, SUM(rvd) OVER w10 AS rsum
        |    FROM rv WINDOW w10 AS (PARTITION BY event_type ORDER BY bucket ASC
        |      ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
        |    UNION ALL
        |    SELECT event_type, 21 AS h,
        |      COUNT(rvd) OVER w21 AS cnt, SUM(rvd) OVER w21 AS rsum
        |    FROM rv WINDOW w21 AS (PARTITION BY event_type ORDER BY bucket ASC
        |      ROWS BETWEEN 20 PRECEDING AND CURRENT ROW))
        |  WHERE cnt = h),
        |vols AS (
        |  SELECT event_type, h,
        |    CAST(round(sqrt(CAST(CAST(rsum AS VARCHAR) AS DOUBLE) / h), 9)
        |      AS DECIMAL(16,9)) AS vol
        |  FROM roll),
        |agg AS (
        |  SELECT event_type, h AS horizon, COUNT(*) AS n_windows,
        |    MIN(vol) AS mn, MAX(vol) AS mx, SUM(vol) AS sm
        |  FROM vols GROUP BY event_type, h)
        |SELECT event_type, horizon, n_windows,
        |  CAST(CAST(mn AS VARCHAR) AS DOUBLE) AS min_vol,
        |  round(CAST(CAST(sm AS VARCHAR) AS DOUBLE) / n_windows, 9) AS mean_vol,
        |  CAST(CAST(mx AS VARCHAR) AS DOUBLE) AS max_vol
        |FROM agg ORDER BY event_type, horizon""".stripMargin,

    "q131_containment_dups" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS w
        |  FROM documents),
        |words AS (
        |  SELECT doc_id, unnest(w) AS word, generate_subscripts(w, 1) AS i FROM toks),
        |sh AS (
        |  SELECT DISTINCT a.doc_id,
        |    a.word || ' ' || b.word || ' ' || c.word || ' ' || d.word || ' ' || e.word AS shingle
        |  FROM words a
        |  JOIN words b ON b.doc_id = a.doc_id AND b.i = a.i + 1
        |  JOIN words c ON c.doc_id = a.doc_id AND c.i = a.i + 2
        |  JOIN words d ON d.doc_id = a.doc_id AND d.i = a.i + 3
        |  JOIN words e ON e.doc_id = a.doc_id AND e.i = a.i + 4
        |  UNION
        |  SELECT doc_id, array_to_string(w, ' ') AS shingle
        |  FROM toks WHERE len(w) < 5),
        |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        |shared AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, n_a, n_b, containment, jaccard FROM (
        |  SELECT doc_a, doc_b, sa.n_sh AS n_a, sb.n_sh AS n_b,
        |    CAST(shared AS DOUBLE) / least(sa.n_sh, sb.n_sh) AS containment,
        |    CAST(shared AS DOUBLE) / (sa.n_sh + sb.n_sh - shared) AS jaccard
        |  FROM shared
        |  JOIN sizes sa ON sa.doc_id = doc_a
        |  JOIN sizes sb ON sb.doc_id = doc_b)
        |WHERE containment >= 0.8 ORDER BY doc_a, doc_b""".stripMargin,

    "q132_zipf_slope" ->
      """WITH tf AS (
        |  SELECT source,
        |    unnest(regexp_split_to_array(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) AS token
        |  FROM documents),
        |f AS (SELECT source, token, COUNT(*) AS freq FROM tf
        |      WHERE token <> '' GROUP BY 1, 2),
        |rk AS (
        |  SELECT source, freq,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY freq DESC, token ASC) AS r
        |  FROM f),
        |l AS (
        |  SELECT source,
        |    CAST(round(ln(r), 12) AS DECIMAL(14,12)) AS x,
        |    CAST(round(ln(freq), 12) AS DECIMAL(14,12)) AS y
        |  FROM rk WHERE r <= 100),
        |s AS (
        |  SELECT source, COUNT(*) AS n_ranks,
        |    SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(CAST(x * y AS DECIMAL(38,24))) AS sxy,
        |    SUM(CAST(x * x AS DECIMAL(38,24))) AS sxx
        |  FROM l GROUP BY source)
        |SELECT source, n_ranks,
        |  CASE WHEN n_ranks >= 2 THEN
        |    round((n_ranks * CAST(CAST(sxy AS VARCHAR) AS DOUBLE) -
        |           CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE)) /
        |          (n_ranks * CAST(CAST(sxx AS VARCHAR) AS DOUBLE) -
        |           CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sx AS VARCHAR) AS DOUBLE)), 6)
        |  END AS zipf_slope
        |FROM s ORDER BY source""".stripMargin,

    "q125_var_cvar" ->
      """WITH b AS (
        |  SELECT event_type, ts, event_id, CAST(value AS DECIMAL(18,6)) AS v,
        |    lag(CAST(value AS DECIMAL(18,6))) OVER (
        |      PARTITION BY event_type ORDER BY ts ASC, event_id ASC) AS pv
        |  FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT event_type,
        |    CASE WHEN pv > 0 THEN CAST(round(
        |      CAST(v - pv AS DOUBLE) / CAST(pv AS DOUBLE), 9) AS DECIMAL(16,9))
        |    END AS r
        |  FROM b),
        |k AS (
        |  SELECT event_type, r,
        |    row_number() OVER (PARTITION BY event_type ORDER BY r ASC) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM r WHERE r IS NOT NULL),
        |-- k = ceil(alpha*n) from an EXACT decimal alpha: a double 0.05*n
        |-- can land one ulp above the integer and ceil past it
        |t AS (
        |  SELECT event_type, r, rn, n,
        |    CAST(ceil(CAST(0.05 AS DECIMAL(10,6)) * n) AS BIGINT) AS kk
        |  FROM k)
        |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_returns,
        |  round(CAST(CAST(MAX(r) AS VARCHAR) AS DOUBLE), 9) AS var_return,
        |  round(CAST(CAST(SUM(r) AS VARCHAR) AS DOUBLE) / MAX(kk), 9) AS es_return
        |FROM t WHERE rn <= kk GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q126_sortino" ->
      """WITH b AS (
        |  SELECT event_type, ts, event_id, CAST(value AS DECIMAL(18,6)) AS v,
        |    lag(CAST(value AS DECIMAL(18,6))) OVER (
        |      PARTITION BY event_type ORDER BY ts ASC, event_id ASC) AS pv
        |  FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT event_type,
        |    CASE WHEN pv > 0 THEN CAST(round(
        |      CAST(v - pv AS DOUBLE) / CAST(pv AS DOUBLE), 9) AS DECIMAL(16,9))
        |    END AS r
        |  FROM b),
        |s AS (
        |  SELECT event_type, COUNT(*) AS n_returns, SUM(r) AS s1,
        |    SUM(CAST(CASE WHEN r < 0 THEN r * r
        |      ELSE CAST(0 AS DECIMAL(32,18)) END AS DECIMAL(38,18))) AS sd2
        |  FROM r WHERE r IS NOT NULL GROUP BY event_type)
        |SELECT event_type, n_returns,
        |  round(CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / n_returns, 9) AS mean_return,
        |  round(sqrt(CAST(CAST(sd2 AS VARCHAR) AS DOUBLE) / n_returns), 9) AS downside_dev,
        |  CASE WHEN sd2 > 0 THEN
        |    round((CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / n_returns) /
        |      sqrt(CAST(CAST(sd2 AS VARCHAR) AS DOUBLE) / n_returns), 6)
        |  END AS sortino
        |FROM s ORDER BY event_type""".stripMargin,

    "q127_flow_imbalance" ->
      """WITH b AS (
        |  SELECT event_type, ts, event_id, CAST(value AS DECIMAL(18,6)) AS v,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS qty,
        |    lag(CAST(value AS DECIMAL(18,6))) OVER (
        |      PARTITION BY event_type ORDER BY ts ASC, event_id ASC) AS pv
        |  FROM events WHERE value IS NOT NULL),
        |sg AS (
        |  SELECT event_type, ts, qty,
        |    last_value(CASE WHEN v - pv > 0 THEN 1
        |                    WHEN v - pv < 0 THEN -1 END IGNORE NULLS)
        |      OVER (PARTITION BY event_type ORDER BY ts ASC, event_id ASC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sgn
        |  FROM b),
        |f AS (
        |  SELECT event_type, CAST(ts AS DATE) AS bucket, sgn,
        |    CAST(qty AS DECIMAL(28,6)) AS q
        |  FROM sg WHERE sgn IS NOT NULL AND qty IS NOT NULL),
        |s AS (
        |  SELECT event_type, bucket, COUNT(*) AS n_ticks,
        |    SUM(CASE WHEN sgn = 1 THEN q ELSE -q END) AS sq, SUM(q) AS tq
        |  FROM f GROUP BY event_type, bucket)
        |SELECT event_type, bucket, n_ticks,
        |  round(CAST(CAST(sq AS VARCHAR) AS DOUBLE), 6) AS signed_qty,
        |  round(CAST(CAST(tq AS VARCHAR) AS DOUBLE), 6) AS total_qty,
        |  CASE WHEN tq > 0 THEN round(CAST(CAST(sq AS VARCHAR) AS DOUBLE) /
        |    CAST(CAST(tq AS VARCHAR) AS DOUBLE), 6) END AS ofi
        |FROM s ORDER BY event_type, bucket""".stripMargin,

    "q128_atr_channels" ->
      """WITH ticks AS (
        |  SELECT event_type, CAST(ts AS DATE) AS bar, value,
        |    row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
        |      ORDER BY ts DESC, event_id DESC) AS rn_last
        |  FROM events WHERE value IS NOT NULL),
        |bars AS (
        |  SELECT event_type, bar,
        |    CAST(MAX(value) AS DECIMAL(18,6)) AS high,
        |    CAST(MIN(value) AS DECIMAL(18,6)) AS low,
        |    CAST(MAX(CASE WHEN rn_last = 1 THEN value END) AS DECIMAL(18,6)) AS close
        |  FROM ticks GROUP BY event_type, bar),
        |trv AS (
        |  SELECT event_type, bar, high, low, close,
        |    CAST(CASE WHEN pc IS NULL THEN high - low
        |      ELSE greatest(high - low, abs(high - pc), abs(low - pc))
        |    END AS DECIMAL(20,6)) AS tr
        |  FROM (SELECT *, lag(close) OVER
        |    (PARTITION BY event_type ORDER BY bar ASC) AS pc FROM bars)),
        |ch AS (
        |  SELECT event_type, bar, high, low, close,
        |    COUNT(tr) OVER wt AS trn, SUM(tr) OVER wt AS trs,
        |    MAX(high) OVER wp AS dh, MIN(low) OVER wp AS dl
        |  FROM trv
        |  WINDOW wt AS (PARTITION BY event_type ORDER BY bar ASC
        |    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW),
        |  wp AS (PARTITION BY event_type ORDER BY bar ASC
        |    ROWS BETWEEN 14 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, bar,
        |  CAST(CAST(high AS VARCHAR) AS DOUBLE) AS high,
        |  CAST(CAST(low AS VARCHAR) AS DOUBLE) AS low,
        |  CAST(CAST(close AS VARCHAR) AS DOUBLE) AS close,
        |  CASE WHEN trn = 14 THEN
        |    round(CAST(CAST(trs AS VARCHAR) AS DOUBLE) / 14, 6) END AS atr,
        |  CAST(CAST(dh AS VARCHAR) AS DOUBLE) AS donchian_high,
        |  CAST(CAST(dl AS VARCHAR) AS DOUBLE) AS donchian_low,
        |  CASE WHEN dh IS NOT NULL THEN CAST(close > dh AS INT) END AS breakout_up,
        |  CASE WHEN dl IS NOT NULL THEN CAST(close < dl AS INT) END AS breakout_down
        |FROM ch ORDER BY event_type, bar""".stripMargin,

    "q129_momentum_rank" ->
      """WITH ticks AS (
        |  SELECT event_type, CAST(ts AS DATE) AS bucket,
        |    CAST(value AS DECIMAL(18,6)) AS v,
        |    row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
        |      ORDER BY ts ASC, event_id ASC) AS rf,
        |    row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
        |      ORDER BY ts DESC, event_id DESC) AS rl
        |  FROM events WHERE value IS NOT NULL),
        |bars AS (
        |  SELECT event_type, bucket,
        |    MAX(CASE WHEN rf = 1 THEN v END) AS o,
        |    MAX(CASE WHEN rl = 1 THEN v END) AS c
        |  FROM ticks GROUP BY event_type, bucket),
        |r AS (
        |  SELECT event_type, bucket,
        |    CAST(round(CAST(c - o AS DOUBLE) / CAST(o AS DOUBLE), 9)
        |      AS DECIMAL(16,9)) AS ret
        |  FROM bars WHERE o > 0),
        |x AS (
        |  SELECT bucket, event_type, ret,
        |    row_number() OVER (PARTITION BY bucket
        |      ORDER BY ret DESC, event_type ASC) AS rank_in_bucket,
        |    COUNT(*) OVER (PARTITION BY bucket) AS n_keys
        |  FROM r)
        |-- floor, not a bare int cast of the quotient: engines disagree on
        |-- double->int cast rounding (Spark truncates, DuckDB rounds)
        |SELECT bucket, event_type,
        |  CAST(CAST(ret AS VARCHAR) AS DOUBLE) AS bucket_return,
        |  rank_in_bucket, n_keys,
        |  CAST(floor(((rank_in_bucket - 1) * 10) / n_keys) + 1 AS INT) AS decile
        |FROM x ORDER BY bucket, event_type""".stripMargin,

    "q130_intraday_profile" ->
      """WITH b AS (
        |  SELECT event_type, ts, event_id, CAST(value AS DECIMAL(18,6)) AS v,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS qty,
        |    lag(CAST(value AS DECIMAL(18,6))) OVER (
        |      PARTITION BY event_type ORDER BY ts ASC, event_id ASC) AS pv
        |  FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT event_type, CAST(hour(ts) AS INT) AS hour_of_day,
        |    CASE WHEN pv > 0 THEN CAST(round(
        |      CAST(v - pv AS DOUBLE) / CAST(pv AS DOUBLE), 9) AS DECIMAL(16,9))
        |    END AS r,
        |    CAST(qty AS DECIMAL(28,6)) AS q
        |  FROM b),
        |s AS (
        |  SELECT event_type, hour_of_day, COUNT(*) AS n_ticks,
        |    COUNT(r) AS nr, SUM(abs(r)) AS sar, SUM(q) AS sq
        |  FROM r GROUP BY event_type, hour_of_day),
        |t AS (
        |  SELECT *, SUM(sq) OVER (PARTITION BY event_type) AS tq FROM s)
        |SELECT event_type, hour_of_day, n_ticks,
        |  CASE WHEN nr > 0 THEN
        |    round(CAST(CAST(sar AS VARCHAR) AS DOUBLE) / nr, 9) END AS mean_abs_return,
        |  CASE WHEN tq > 0 THEN
        |    round(CAST(CAST(sq AS VARCHAR) AS DOUBLE) /
        |      CAST(CAST(tq AS VARCHAR) AS DOUBLE), 6) END AS qty_share
        |FROM t ORDER BY event_type, hour_of_day""".stripMargin,

    "q123_amihud" ->
      """WITH b AS (
        |  SELECT event_type, ts, event_id, CAST(value AS DECIMAL(18,6)) AS v,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS qty,
        |    lag(CAST(value AS DECIMAL(18,6))) OVER (
        |      PARTITION BY event_type ORDER BY ts ASC, event_id ASC) AS pv
        |  FROM events
        |  WHERE value IS NOT NULL
        |    AND json_extract_string(props, '$.k') IS NOT NULL),
        |r AS (
        |  SELECT event_type, CAST(ts AS DATE) AS bucket,
        |    CASE WHEN pv > 0 THEN CAST(round(
        |      CAST(v - pv AS DOUBLE) / CAST(pv AS DOUBLE), 9) AS DECIMAL(16,9))
        |    END AS r,
        |    CAST(v * CAST(qty AS DECIMAL(18,6)) AS DECIMAL(38,12)) AS dv
        |  FROM b),
        |-- every decimal->double goes through VARCHAR/strtod: DuckDB's
        |-- direct cast is not correctly rounded (see q121)
        |il AS (
        |  SELECT event_type, bucket,
        |    CAST(round(CAST(CAST(abs(r) AS VARCHAR) AS DOUBLE) /
        |      CAST(CAST(dv AS VARCHAR) AS DOUBLE), 12) AS DECIMAL(32,12)) AS il
        |  FROM r WHERE r IS NOT NULL AND dv > 0),
        |s AS (
        |  SELECT event_type, bucket, COUNT(*) AS n_ticks, SUM(il) AS ils
        |  FROM il GROUP BY event_type, bucket)
        |SELECT event_type, bucket, n_ticks,
        |  round(CAST(CAST(ils AS VARCHAR) AS DOUBLE) / n_ticks, 12) AS illiq
        |FROM s ORDER BY event_type, bucket""".stripMargin,

    "q122_cross_source_dups" ->
      s"""WITH $shingleCte,
        |$jacPairsCte,
        |ds AS (SELECT doc_id, source FROM documents)
        |SELECT least(a.source, b.source) AS source_a,
        |  greatest(a.source, b.source) AS source_b,
        |  COUNT(*) AS n_dup_pairs
        |FROM jac p
        |JOIN ds a ON a.doc_id = p.doc_a
        |JOIN ds b ON b.doc_id = p.doc_b
        |GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin,

    "q100_level_alerts" ->
      """WITH ev AS (
        |  SELECT event_id, event_type, ts, value,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS qty
        |  FROM events
        |  WHERE value IS NOT NULL
        |    AND json_extract_string(props, '$.k') IS NOT NULL),
        |ew AS (
        |  SELECT event_type,
        |    round(list_reduce(lst, (acc, x) -> acc * 0.75 + 0.25 * x), 6) AS ewma_ref
        |  FROM (
        |    SELECT event_type,
        |      list(CAST(value AS DOUBLE)) OVER (
        |        PARTITION BY event_type ORDER BY ts ASC, event_id ASC
        |        ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS lst,
        |      row_number() OVER (
        |        PARTITION BY event_type ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM ev) WHERE rn = 1),
        |d AS (
        |  SELECT event_id, event_type, ts,
        |    CAST(value AS DECIMAL(18,6))
        |      - lag(CAST(value AS DECIMAL(18,6))) OVER w AS delta
        |  FROM ev
        |  WINDOW w AS (PARTITION BY event_type ORDER BY ts ASC, event_id ASC)),
        |rs AS (
        |  SELECT event_type,
        |    CASE WHEN g + l > 0
        |         THEN round(100.0 * CAST(g AS DOUBLE) / CAST(g + l AS DOUBLE), 6)
        |    END AS rsi_ref
        |  FROM (
        |    SELECT event_type,
        |      SUM(CASE WHEN delta > 0 THEN delta WHEN delta <= 0 THEN 0 END) OVER fr AS g,
        |      SUM(CASE WHEN delta < 0 THEN -delta WHEN delta >= 0 THEN 0 END) OVER fr AS l,
        |      row_number() OVER (
        |        PARTITION BY event_type ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM d
        |    WINDOW fr AS (PARTITION BY event_type ORDER BY ts ASC, event_id ASC
        |      ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)) WHERE rn = 1),
        |vw AS (
        |  SELECT event_type,
        |    round(CAST(SUM(CAST(CAST(value AS DECIMAL(18,6)) * CAST(qty AS DECIMAL(18,6)) AS DECIMAL(38,12))) AS DOUBLE)
        |      / CAST(SUM(CAST(qty AS DECIMAL(18,6))) AS DOUBLE), 6) AS vwap_ref
        |  FROM ev GROUP BY event_type
        |  HAVING SUM(CAST(qty AS DECIMAL(18,6))) <> 0),
        |sums AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    SUM(CAST(value AS DECIMAL(18,6))) AS s1,
        |    SUM(CAST(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)) AS DECIMAL(38,12))) AS s2
        |  FROM ev GROUP BY event_type),
        |m AS (
        |  SELECT event_type,
        |    sqrt(greatest(0.0, (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (n - 1))) AS std_v
        |  FROM sums WHERE n > 1)
        |SELECT e.event_id, e.event_type, e.value,
        |  round((e.value - ew.ewma_ref) / m.std_v, 4) AS z_vs_ewma,
        |  round((e.value - vw.vwap_ref) / vw.vwap_ref * 100, 4) AS vwap_dev_pct,
        |  CASE WHEN rs.rsi_ref >= 70 THEN 'overbought'
        |       WHEN rs.rsi_ref <= 30 THEN 'oversold'
        |       ELSE 'neutral' END AS regime
        |FROM ev e
        |JOIN m USING (event_type) JOIN ew USING (event_type)
        |JOIN rs USING (event_type) JOIN vw USING (event_type)
        |WHERE m.std_v > 0 AND vw.vwap_ref IS NOT NULL AND vw.vwap_ref <> 0
        |  AND (abs(round((e.value - ew.ewma_ref) / m.std_v, 4)) >= 1.5
        |       OR abs(round((e.value - vw.vwap_ref) / vw.vwap_ref * 100, 4)) >= 3.0)
        |ORDER BY event_id""".stripMargin,

    // the q75 edge CTE + three unrolled PageRank iterations; every
    // formula mirrors the Spark side shape-for-shape (double ops, per-
    // row DECIMAL(28,14) contribution casts, round 14 per iteration)
    // so the doubles agree bitwise
    "q89_pagerank" ->
      """WITH em AS (
        |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings
        |  WHERE list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |    list_transform(embedding, x -> CAST(x AS DOUBLE))) > 0),
        |pairs AS (
        |  SELECT a.vec_id AS src, b.vec_id AS dst,
        |    round(list_dot_product(a.v, b.v) /
        |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cos_sim
        |  FROM em a JOIN em b ON a.label = b.label AND a.vec_id <> b.vec_id),
        |edges AS (
        |  SELECT src, dst FROM (
        |    SELECT src, dst, row_number() OVER (
        |      PARTITION BY src ORDER BY cos_sim DESC, dst) AS rnk
        |    FROM pairs) WHERE rnk <= 5),
        |outd AS (SELECT src, COUNT(*) AS od FROM edges GROUP BY src),
        |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
        |nn AS (SELECT COUNT(*) AS n FROM nodes),
        |p0 AS (SELECT node, CAST(1.0 AS DOUBLE) / nn.n AS p FROM nodes, nn),
        |i1 AS (
        |  SELECT nodes.node,
        |    round((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
        |      + COALESCE(CAST(s.c AS DOUBLE), CAST(0.0 AS DOUBLE)), 14) AS p
        |  FROM nodes CROSS JOIN nn
        |  LEFT JOIN (
        |    SELECT e.dst AS node,
        |      SUM(CAST(p.p / o.od * CAST(0.85 AS DOUBLE) AS DECIMAL(28,14))) AS c
        |    FROM edges e JOIN p0 p ON p.node = e.src JOIN outd o ON o.src = e.src
        |    GROUP BY e.dst) s ON s.node = nodes.node),
        |i2 AS (
        |  SELECT nodes.node,
        |    round((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
        |      + COALESCE(CAST(s.c AS DOUBLE), CAST(0.0 AS DOUBLE)), 14) AS p
        |  FROM nodes CROSS JOIN nn
        |  LEFT JOIN (
        |    SELECT e.dst AS node,
        |      SUM(CAST(p.p / o.od * CAST(0.85 AS DOUBLE) AS DECIMAL(28,14))) AS c
        |    FROM edges e JOIN i1 p ON p.node = e.src JOIN outd o ON o.src = e.src
        |    GROUP BY e.dst) s ON s.node = nodes.node),
        |i3 AS (
        |  SELECT nodes.node,
        |    round((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
        |      + COALESCE(CAST(s.c AS DOUBLE), CAST(0.0 AS DOUBLE)), 14) AS p
        |  FROM nodes CROSS JOIN nn
        |  LEFT JOIN (
        |    SELECT e.dst AS node,
        |      SUM(CAST(p.p / o.od * CAST(0.85 AS DOUBLE) AS DECIMAL(28,14))) AS c
        |    FROM edges e JOIN i2 p ON p.node = e.src JOIN outd o ON o.src = e.src
        |    GROUP BY e.dst) s ON s.node = nodes.node)
        |SELECT node AS vec_id, round(p, 10) AS pagerank
        |FROM i3 ORDER BY vec_id""".stripMargin,

    "q88_boilerplate" ->
      """WITH lines AS (
        |  SELECT doc_id, generate_subscripts(l, 1) AS i, unnest(l) AS line
        |  FROM (SELECT doc_id, string_split(text, chr(10)) AS l FROM documents)),
        |freq AS (SELECT line, COUNT(DISTINCT doc_id) AS ldf FROM lines GROUP BY line),
        |kept AS (
        |  SELECT doc_id, i, line FROM lines JOIN freq USING (line) WHERE ldf <= 1)
        |SELECT doc_id,
        |  string_agg(line, chr(10) ORDER BY i) AS clean_text,
        |  COUNT(*) AS n_lines_kept
        |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // the oracle aggregates the parquet table DIRECTLY — matching hashes
    // prove the Spark-side parquet→ORC→scan roundtrip loses nothing
    "q87_orc_roundtrip" ->
      """SELECT event_type, COUNT(*) AS n,
        |  round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS total_value,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // same shingle construction (incl. the short-doc whole-text
    // fallback) as the jaccard oracle, then doc-frequency >= 2 counts
    "q85_dup_shingles" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS w
        |  FROM documents),
        |words AS (
        |  SELECT doc_id, unnest(w) AS word, generate_subscripts(w, 1) AS i FROM toks),
        |sh AS (
        |  SELECT DISTINCT a.doc_id,
        |    a.word || ' ' || b.word || ' ' || c.word || ' ' || d.word || ' ' || e.word AS shingle
        |  FROM words a
        |  JOIN words b ON b.doc_id = a.doc_id AND b.i = a.i + 1
        |  JOIN words c ON c.doc_id = a.doc_id AND c.i = a.i + 2
        |  JOIN words d ON d.doc_id = a.doc_id AND d.i = a.i + 3
        |  JOIN words e ON e.doc_id = a.doc_id AND e.i = a.i + 4
        |  UNION
        |  SELECT doc_id, array_to_string(w, ' ') AS shingle
        |  FROM toks WHERE len(w) < 5),
        |freq AS (SELECT shingle, COUNT(*) AS sdf FROM sh GROUP BY shingle)
        |SELECT doc_id, COUNT(*) AS n_shingles,
        |  CAST(SUM(CASE WHEN f.sdf >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
        |  round(CAST(SUM(CASE WHEN f.sdf >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS dup_fraction
        |FROM sh JOIN freq f USING (shingle)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q42_embedding_norms" ->
      """WITH n AS (
        |  SELECT label,
        |    round(sqrt(list_dot_product(
        |      list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |      list_transform(embedding, x -> CAST(x AS DOUBLE)))), 6) AS l2_norm
        |  FROM embeddings)
        |SELECT label, COUNT(*) AS n_vecs,
        |  ROUND(CAST(SUM(CAST(l2_norm AS DECIMAL(18,6))) AS DOUBLE), 6) AS total_norm
        |FROM n GROUP BY label ORDER BY label""".stripMargin,

    // the PNG dims Spark reads back out of the encoded headers are pure
    // functions of doc_id, so the oracle recomputes them arithmetically —
    // a hash match proves the javax.imageio roundtrip decoded for real
    // (decoded=TRUE for every row: the JDK PNG reader must claim each one)
    "q43_media_features" ->
      """SELECT doc_id AS media_id, 'png' AS format,
        |  CAST(1 + doc_id % 64 AS INT) AS width,
        |  CAST(1 + doc_id % 48 AS INT) AS height,
        |  TRUE AS decoded
        |FROM documents ORDER BY media_id""".stripMargin,

    "q44_approx_distinct" ->
      """SELECT event_type,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  TRUE AS sketch_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q52_decile_cutpoints" ->
      """SELECT CAST(range + 1 AS BIGINT) AS bucket,
        |  TRUE AS range_ok, TRUE AS ordered_ok, TRUE AS covers_all
        |FROM range(10) ORDER BY bucket""".stripMargin,

    "q46_percentiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.25), 6) AS p25,
        |  round(quantile_cont(value, 0.50), 6) AS p50,
        |  round(quantile_cont(value, 0.75), 6) AS p75
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q47_top_words" ->
      """SELECT word, COUNT(*) AS n FROM (
        |  SELECT unnest(regexp_split_to_array(
        |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS word
        |  FROM documents)
        |GROUP BY word HAVING COUNT(*) >= 20 ORDER BY word""".stripMargin,

    "q48_window_nav" ->
      """SELECT event_id, user_id,
        |  first_value(value) OVER wf AS first_val,
        |  last_value(value) OVER wf AS last_val,
        |  nth_value(value, 2) OVER wf AS second_val,
        |  round(percent_rank() OVER w, 6) AS pr,
        |  round(cume_dist() OVER w, 6) AS cd
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
        |  wf AS (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY event_id""".stripMargin,

    "q49_moment_stats" ->
      """WITH sums AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    SUM(CAST(value AS DECIMAL(18,6))) AS s1,
        |    SUM(CAST(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)) AS DECIMAL(38,12))) AS s2
        |  FROM events WHERE value IS NOT NULL GROUP BY event_type)
        |SELECT event_type, n,
        |  round(CAST(s1 AS DOUBLE) / n, 6) AS mean_val,
        |  round((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (n - 1), 6) AS var_samp,
        |  round(sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (n - 1)), 6) AS stddev_samp
        |FROM sums ORDER BY event_type""".stripMargin,

    "q50_array_funcs" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS BIGINT) AS n_dims,
        |  round(CAST(embedding[1] AS DOUBLE), 6) AS e1,
        |  round(CAST(list_min(embedding) AS DOUBLE), 6) AS min_e,
        |  round(CAST(list_max(embedding) AS DOUBLE), 6) AS max_e,
        |  CAST(list_position(embedding, list_max(embedding)) AS BIGINT) AS argmax_pos,
        |  round(CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE)
        |    + CAST(embedding[3] AS DOUBLE), 6) AS head3_sum
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q51_salted_join" ->
      """SELECT p_brand, COUNT(*) AS n_items,
        |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_price
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q53_train_split" ->
      """SELECT source,
        |  CASE WHEN doc_id % 100 < 80 THEN 'train'
        |       WHEN doc_id % 100 < 90 THEN 'val'
        |       ELSE 'test' END AS split,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q54_correlation" ->
      """WITH base AS (
        |  SELECT event_type,
        |    CAST(value AS DECIMAL(18,6)) AS x,
        |    CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) AS DECIMAL(18,6)) AS y
        |  FROM events
        |  WHERE value IS NOT NULL AND json_extract_string(props, '$.k') IS NOT NULL),
        |sums AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(CAST(x * y AS DECIMAL(38,12))) AS sxy,
        |    SUM(CAST(x * x AS DECIMAL(38,12))) AS sxx,
        |    SUM(CAST(y * y AS DECIMAL(38,12))) AS syy
        |  FROM base GROUP BY event_type)
        |SELECT event_type, n,
        |  round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |    (sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |     sqrt(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS corr_vk
        |FROM sums ORDER BY event_type""".stripMargin,

    "q55_range_frame" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS day_total_dec,
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d_epoch
        |  FROM orders GROUP BY 1, 3)
        |SELECT d,
        |  ROUND(CAST(day_total_dec AS DOUBLE), 2) AS day_total,
        |  ROUND(CAST(SUM(day_total_dec) OVER (ORDER BY d_epoch
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS trailing_7d
        |FROM daily ORDER BY d""".stripMargin,

    "q56_union_evolve" ->
      """SELECT event_id, user_id, value FROM events WHERE event_type = 'purchase'
        |UNION ALL
        |SELECT event_id, user_id, NULL AS value FROM events WHERE event_type = 'signup'
        |ORDER BY event_id""".stripMargin,

    "q57_map_funcs" ->
      """SELECT event_id,
        |  CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
        |  array_to_string(list_sort(json_keys(props)), ',') AS keys_csv,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        |FROM events ORDER BY event_id""".stripMargin,

    "q58_hof_lambdas" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings)
        |SELECT vec_id,
        |  CAST(len(list_filter(v, x -> x > 0)) AS BIGINT) AS n_pos,
        |  len(list_filter(v, x -> x > 1.5)) > 0 AS any_big,
        |  round(list_sort(v, 'DESC')[1], 6) AS max_e
        |FROM e ORDER BY vec_id""".stripMargin,

    "q59_ohlc_bars" ->
      """WITH ticks AS (
        |  SELECT event_type, CAST(ts AS DATE) AS bar, value,
        |    row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
        |      ORDER BY ts ASC, event_id ASC) AS rn_first,
        |    row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
        |      ORDER BY ts DESC, event_id DESC) AS rn_last
        |  FROM events WHERE value IS NOT NULL)
        |SELECT event_type, bar,
        |  MAX(CASE WHEN rn_first = 1 THEN value END) AS open,
        |  MAX(value) AS high,
        |  MIN(value) AS low,
        |  MAX(CASE WHEN rn_last = 1 THEN value END) AS close,
        |  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS volume,
        |  COUNT(*) AS n_ticks
        |FROM ticks GROUP BY event_type, bar
        |ORDER BY event_type, bar""".stripMargin,

    "q60_token_packing" ->
      """WITH toks AS (
        |  SELECT source, doc_id,
        |    CAST(len(regexp_split_to_array(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |packed AS (
        |  SELECT source, n_tokens,
        |    CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens) / 4096) AS BIGINT) AS batch_id
        |  FROM toks)
        |SELECT source, batch_id, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS batch_tokens
        |FROM packed GROUP BY source, batch_id
        |ORDER BY source, batch_id""".stripMargin,

    "q61_quality_audit" ->
      """SELECT * FROM (
        |  SELECT 'docs_nchars_match' AS check_name,
        |    (SELECT COUNT(*) FROM documents
        |     WHERE NOT COALESCE(n_chars = length(text), FALSE)) AS violations
        |  UNION ALL
        |  SELECT 'events_user_ts_unique',
        |    (SELECT COUNT(*) FROM events) -
        |    (SELECT COUNT(*) FROM (SELECT DISTINCT user_id, ts FROM events))
        |  UNION ALL
        |  SELECT 'events_value_nulls',
        |    (SELECT COUNT(*) FROM events WHERE value IS NULL)
        |  UNION ALL
        |  SELECT 'lineitem_order_orphans',
        |    (SELECT COUNT(*) FROM lineitem
        |     WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey))
        |  UNION ALL
        |  SELECT 'orders_cust_orphans',
        |    (SELECT COUNT(*) FROM orders
        |     WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)))
        |ORDER BY check_name""".stripMargin,

    "q62_merge_upsert" ->
      """SELECT event_id, user_id, value FROM (
        |  SELECT event_id, user_id, value FROM events
        |  WHERE event_id % 3 <> 0 AND event_id % 2 <> 0
        |  UNION ALL
        |  SELECT event_id, user_id, value + 1000.0 AS value FROM events
        |  WHERE event_id % 2 = 0)
        |ORDER BY event_id""".stripMargin,

    "q63_dup_clusters" ->
      s"""WITH RECURSIVE $shingleCte,
        |$jacPairsCte,
        |$ccWalkCte
        |SELECT node AS doc_id, MIN(comp) AS cluster_id,
        |  node = MIN(comp) AS is_canonical
        |FROM walk GROUP BY node ORDER BY doc_id""".stripMargin,

    "q64_token_chunks" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS w
        |  FROM documents),
        |starts AS (
        |  SELECT doc_id, w, unnest(range(0, len(w), 48)) AS s
        |  FROM toks WHERE NOT (len(w) = 1 AND w[1] = ''))
        |SELECT doc_id, CAST(s // 48 AS BIGINT) AS chunk_idx,
        |  array_to_string(list_slice(w, s + 1, s + 64), ' ') AS chunk_text,
        |  CAST(least(64, len(w) - s) AS BIGINT) AS n_tokens
        |FROM starts ORDER BY doc_id, chunk_idx""".stripMargin,

    "q65_decontaminate" ->
      s"""WITH $shingleCte,
        |ev AS (
        |  SELECT DISTINCT s.shingle FROM sh s
        |  JOIN documents d ON d.doc_id = s.doc_id WHERE d.source = 'src0'),
        |hits AS (
        |  SELECT s.doc_id, COUNT(*) AS n_shared FROM sh s
        |  JOIN ev USING (shingle) GROUP BY 1)
        |SELECT d.doc_id, CAST(COALESCE(h.n_shared, 0) AS BIGINT) AS n_shared,
        |  COALESCE(h.n_shared, 0) > 0 AS contaminated
        |FROM documents d LEFT JOIN hits h USING (doc_id)
        |WHERE d.source <> 'src0'
        |ORDER BY d.doc_id""".stripMargin,

    // identical oracle to q65 BY DESIGN: the Bloom pre-filter must not
    // change the exact result, and a shared oracle proves it doesn't
    "q93_bloom_decontaminate" ->
      s"""WITH $shingleCte,
        |ev AS (
        |  SELECT DISTINCT s.shingle FROM sh s
        |  JOIN documents d ON d.doc_id = s.doc_id WHERE d.source = 'src0'),
        |hits AS (
        |  SELECT s.doc_id, COUNT(*) AS n_shared FROM sh s
        |  JOIN ev USING (shingle) GROUP BY 1)
        |SELECT d.doc_id, CAST(COALESCE(h.n_shared, 0) AS BIGINT) AS n_shared,
        |  COALESCE(h.n_shared, 0) > 0 AS contaminated
        |FROM documents d LEFT JOIN hits h USING (doc_id)
        |WHERE d.source <> 'src0'
        |ORDER BY d.doc_id""".stripMargin,

    "q66_bigram_lm" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS w
        |  FROM documents),
        |words AS (
        |  SELECT doc_id, unnest(w) AS word, generate_subscripts(w, 1) AS i FROM toks),
        |bg AS (
        |  SELECT a.word || ' ' || b.word AS bigram
        |  FROM words a JOIN words b ON b.doc_id = a.doc_id AND b.i = a.i + 1
        |  UNION ALL
        |  SELECT array_to_string(w, ' ') FROM toks WHERE len(w) < 2),
        |counts AS (SELECT bigram, COUNT(*) AS n FROM bg GROUP BY 1)
        |SELECT bigram, n, ROUND(CAST(n AS DOUBLE) /
        |    CAST(SUM(n) OVER (PARTITION BY split_part(bigram, ' ', 1)) AS DOUBLE), 6) AS p_cond
        |FROM counts ORDER BY n DESC, bigram LIMIT 50""".stripMargin,

    "q67_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS w
        |  FROM documents),
        |words AS (SELECT doc_id, unnest(w) AS term FROM toks),
        |tf AS (SELECT doc_id, term, COUNT(*) AS n FROM words GROUP BY 1, 2),
        |tf2 AS (SELECT *, SUM(n) OVER (PARTITION BY doc_id) AS n_doc FROM tf),
        |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |tot AS (SELECT COUNT(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, term,
        |    ROUND((CAST(n AS DOUBLE) / n_doc) * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
        |  FROM tf2 JOIN dfreq USING (term) CROSS JOIN tot),
        |ranked AS (
        |  SELECT *, CAST(row_number() OVER (
        |    PARTITION BY doc_id ORDER BY tfidf DESC, term) AS BIGINT) AS rnk
        |  FROM scored)
        |SELECT doc_id, term, tfidf, rnk FROM ranked
        |WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,

    "q68_curation_pipeline" ->
      """WITH RECURSIVE feats AS (
        |  SELECT doc_id, lang, text,
        |    CAST(len(regexp_split_to_array(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) AS BIGINT) AS n_tokens,
        |    CAST(len(list_filter(
        |      regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
        |      t -> t IN ('the','a','and','of','to','in','is','on'))) AS BIGINT) AS n_stopwords
        |  FROM documents),
        |docs AS (
        |  SELECT doc_id, lang, text, n_tokens FROM feats
        |  WHERE n_tokens >= 25 AND CAST(n_stopwords AS DOUBLE) / n_tokens <= 0.15),
        |toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS w
        |  FROM docs),
        |words AS (
        |  SELECT doc_id, unnest(w) AS word, generate_subscripts(w, 1) AS i FROM toks),
        |sh AS (
        |  SELECT DISTINCT a.doc_id,
        |    a.word || ' ' || b.word || ' ' || c.word || ' ' || d.word || ' ' || e.word AS shingle
        |  FROM words a
        |  JOIN words b ON b.doc_id = a.doc_id AND b.i = a.i + 1
        |  JOIN words c ON c.doc_id = a.doc_id AND c.i = a.i + 2
        |  JOIN words d ON d.doc_id = a.doc_id AND d.i = a.i + 3
        |  JOIN words e ON e.doc_id = a.doc_id AND e.i = a.i + 4
        |  UNION
        |  SELECT doc_id, array_to_string(w, ' ') AS shingle
        |  FROM toks WHERE len(w) < 5),
        |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        |shared AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |jac AS (
        |  SELECT doc_a, doc_b FROM shared
        |  JOIN sizes sa ON sa.doc_id = doc_a
        |  JOIN sizes sb ON sb.doc_id = doc_b
        |  WHERE CAST(shared AS DOUBLE) / (sa.n_sh + sb.n_sh - shared) >= 0.5),
        |exact AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM docs a
        |  JOIN docs b ON md5(a.text) = md5(b.text) AND a.doc_id < b.doc_id),
        |edges AS (
        |  SELECT doc_a AS u, doc_b AS v FROM jac
        |  UNION SELECT doc_b, doc_a FROM jac
        |  UNION SELECT doc_a, doc_b FROM exact
        |  UNION SELECT doc_b, doc_a FROM exact),
        |walk(node, comp) AS (
        |  SELECT doc_id, doc_id FROM docs
        |  UNION
        |  SELECT e.v, w.comp FROM walk w
        |  JOIN edges e ON e.u = w.node WHERE w.comp < e.v),
        |lab AS (SELECT node AS doc_id, MIN(comp) AS cluster_id FROM walk GROUP BY node),
        |kept AS (
        |  SELECT d.* FROM docs d
        |  JOIN lab l ON l.doc_id = d.doc_id AND l.cluster_id = d.doc_id)
        |SELECT
        |  CASE WHEN doc_id % 10 < 8 THEN 'train'
        |       WHEN doc_id % 10 = 8 THEN 'val' ELSE 'test' END AS split,
        |  lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
        |FROM kept GROUP BY 1, 2 ORDER BY split, lang""".stripMargin,

    "q69_funnel" ->
      """WITH v AS (
        |  SELECT user_id, MIN(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
        |  JOIN v ON v.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
        |  JOIN c ON c.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1)
        |SELECT 'view' AS stage, (SELECT COUNT(*) FROM v) AS n_users
        |UNION ALL SELECT 'click', (SELECT COUNT(*) FROM c)
        |UNION ALL SELECT 'purchase', (SELECT COUNT(*) FROM p)""".stripMargin,

    "q70_cohort_retention" ->
      """WITH firsts AS (
        |  SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort_date
        |  FROM events GROUP BY 1)
        |SELECT cohort_date,
        |  CAST(datediff('day', cohort_date, CAST(e.ts AS DATE)) AS BIGINT) AS day_offset,
        |  COUNT(DISTINCT e.user_id) AS n_users
        |FROM events e JOIN firsts f ON f.user_id = e.user_id
        |WHERE datediff('day', cohort_date, CAST(e.ts AS DATE)) <= 7
        |GROUP BY 1, 2 ORDER BY cohort_date, day_offset""".stripMargin,

    "q71_label_centroids" ->
      """WITH ex AS (
        |  SELECT label, unnest(embedding) AS e,
        |    generate_subscripts(embedding, 1) AS i
        |  FROM embeddings)
        |SELECT label, CAST(i - 1 AS BIGINT) AS dim,
        |  ROUND(CAST(SUM(CAST(CAST(e AS DOUBLE) AS DECIMAL(27,10))) AS DOUBLE)
        |    / COUNT(*), 6) AS centroid
        |FROM ex GROUP BY 1, 2 ORDER BY label, dim""".stripMargin,

    "q72_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS w
        |  FROM documents),
        |words AS (
        |  SELECT doc_id, unnest(w) AS word, generate_subscripts(w, 1) AS i FROM toks),
        |g AS (
        |  SELECT a.doc_id, a.word || ' ' || b.word || ' ' || c.word AS sh
        |  FROM words a
        |  JOIN words b ON b.doc_id = a.doc_id AND b.i = a.i + 1
        |  JOIN words c ON c.doc_id = a.doc_id AND c.i = a.i + 2
        |  UNION ALL
        |  SELECT doc_id, array_to_string(w, ' ') FROM toks WHERE len(w) < 3)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
        |  ROUND((COUNT(*) - COUNT(DISTINCT sh)) / CAST(COUNT(*) AS DOUBLE), 6) AS dup_ratio
        |FROM g GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q73_doc_logprob" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS w
        |  FROM documents),
        |words AS (
        |  SELECT doc_id, unnest(w) AS word, generate_subscripts(w, 1) AS i FROM toks),
        |bg AS (
        |  SELECT a.doc_id, a.word || ' ' || b.word AS bigram
        |  FROM words a JOIN words b ON b.doc_id = a.doc_id AND b.i = a.i + 1
        |  UNION ALL
        |  SELECT doc_id, array_to_string(w, ' ') FROM toks WHERE len(w) < 2),
        |lm AS (
        |  SELECT bigram, COUNT(*) AS n FROM bg GROUP BY 1),
        |lm2 AS (
        |  SELECT bigram, n,
        |    SUM(n) OVER (PARTITION BY split_part(bigram, ' ', 1)) AS nw1
        |  FROM lm)
        |SELECT doc_id,
        |  ROUND(CAST(SUM(CAST(ROUND(ln(CAST(n AS DOUBLE) / nw1), 9) AS DECIMAL(20,9))) AS DOUBLE)
        |    / COUNT(*), 6) AS avg_logprob,
        |  COUNT(*) AS n_bigrams
        |FROM bg JOIN lm2 USING (bigram)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q74_source_mixture" ->
      """WITH w AS (
        |  SELECT doc_id, source,
        |    CASE WHEN source = 'src0' THEN 2.5
        |         WHEN source = 'src1' THEN 0.5 ELSE 1.0 END AS wt
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source,
        |    CAST(FLOOR(wt) + CASE WHEN doc_id % 100 <
        |      ROUND((wt - FLOOR(wt)) * 100) THEN 1 ELSE 0 END AS BIGINT) AS copies
        |  FROM w),
        |x AS (
        |  SELECT doc_id, source, unnest(range(0, copies)) AS epoch
        |  FROM c WHERE copies > 0)
        |SELECT source, COUNT(*) AS n_rows, COUNT(DISTINCT doc_id) AS n_docs
        |FROM x GROUP BY 1 ORDER BY 1""".stripMargin,

    "q75_knn_graph" ->
      """WITH e AS (
        |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings
        |  WHERE list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |    list_transform(embedding, x -> CAST(x AS DOUBLE))) > 0),
        |pairs AS (
        |  SELECT a.vec_id AS src, b.vec_id AS dst,
        |    round(list_dot_product(a.v, b.v) /
        |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cos_sim
        |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id),
        |ranked AS (
        |  SELECT *, CAST(row_number() OVER (
        |    PARTITION BY src ORDER BY cos_sim DESC, dst) AS BIGINT) AS rnk
        |  FROM pairs)
        |SELECT src, dst, cos_sim, rnk FROM ranked
        |WHERE rnk <= 5 ORDER BY src, rnk""".stripMargin,

    "q76_anomalies" ->
      """WITH sums AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    SUM(CAST(value AS DECIMAL(18,6))) AS s1,
        |    SUM(CAST(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)) AS DECIMAL(38,12))) AS s2
        |  FROM events WHERE value IS NOT NULL GROUP BY event_type),
        |m AS (
        |  SELECT event_type, CAST(s1 AS DOUBLE) / n AS mean_v,
        |    sqrt(greatest(0.0, (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (n - 1))) AS std_v
        |  FROM sums WHERE n > 1)
        |SELECT event_id, event_type, value,
        |  round((value - mean_v) / std_v, 4) AS z
        |FROM events JOIN m USING (event_type)
        |WHERE value IS NOT NULL AND std_v > 0
        |  AND abs(round((value - mean_v) / std_v, 4)) >= 3.0
        |ORDER BY event_id""".stripMargin,

    "q77_gap_fill" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_v
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |bounds AS (
        |  SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
        |  FROM events WHERE value IS NOT NULL),
        |grid AS (
        |  SELECT t.event_type, g.h AS hour
        |  FROM (SELECT DISTINCT event_type FROM events WHERE value IS NOT NULL) t
        |  CROSS JOIN (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds) g)
        |SELECT g.event_type, g.hour,
        |  last_value(h.avg_v IGNORE NULLS) OVER (
        |    PARTITION BY g.event_type ORDER BY g.hour
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
        |  h.avg_v IS NULL AS is_gap
        |FROM grid g LEFT JOIN hourly h
        |  ON h.event_type = g.event_type AND h.hour = g.hour
        |ORDER BY g.event_type, g.hour""".stripMargin,

    "q78_packed_sequences" ->
      """WITH toks AS (
        |  SELECT source, doc_id, text,
        |    CAST(len(regexp_split_to_array(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |packed AS (
        |  SELECT source, doc_id, text, n_tokens,
        |    CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens) / 4096) AS BIGINT) AS batch_id
        |  FROM toks)
        |SELECT source, batch_id, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS batch_tokens,
        |  string_agg(text, ' <eos> ' ORDER BY doc_id) AS packed_text
        |FROM packed GROUP BY source, batch_id
        |ORDER BY source, batch_id""".stripMargin,

    "q79_dataset_card" ->
      """WITH d AS (
        |  SELECT doc_id, lang, source,
        |    CAST(len(regexp_split_to_array(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) AS BIGINT) AS nt,
        |    md5(text) AS h
        |  FROM documents)
        |SELECT COUNT(*) AS n_docs,
        |  CAST(SUM(nt) AS BIGINT) AS total_tokens,
        |  COUNT(DISTINCT lang) AS n_langs,
        |  COUNT(DISTINCT source) AS n_sources,
        |  round(1.0 - COUNT(DISTINCT h) / CAST(COUNT(*) AS DOUBLE), 6) AS exact_dup_rate,
        |  round(CAST(SUM(nt) AS DOUBLE) / COUNT(*), 6) AS mean_tokens
        |FROM d""".stripMargin,

    "q80_source_quality" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS w
        |  FROM documents),
        |words AS (
        |  SELECT doc_id, unnest(w) AS word, generate_subscripts(w, 1) AS i FROM toks),
        |g AS (
        |  SELECT a.doc_id, a.word || ' ' || b.word || ' ' || c.word AS sh
        |  FROM words a
        |  JOIN words b ON b.doc_id = a.doc_id AND b.i = a.i + 1
        |  JOIN words c ON c.doc_id = a.doc_id AND c.i = a.i + 2
        |  UNION ALL
        |  SELECT doc_id, array_to_string(w, ' ') FROM toks WHERE len(w) < 3),
        |rep AS (
        |  SELECT doc_id,
        |    ROUND((COUNT(*) - COUNT(DISTINCT sh)) / CAST(COUNT(*) AS DOUBLE), 6) AS dup_ratio
        |  FROM g GROUP BY doc_id),
        |bg AS (
        |  SELECT a.doc_id, a.word || ' ' || b.word AS bigram
        |  FROM words a JOIN words b ON b.doc_id = a.doc_id AND b.i = a.i + 1
        |  UNION ALL
        |  SELECT doc_id, array_to_string(w, ' ') FROM toks WHERE len(w) < 2),
        |lm AS (SELECT bigram, COUNT(*) AS n FROM bg GROUP BY 1),
        |lm2 AS (
        |  SELECT bigram, n,
        |    SUM(n) OVER (PARTITION BY split_part(bigram, ' ', 1)) AS nw1
        |  FROM lm),
        |lp AS (
        |  SELECT doc_id,
        |    ROUND(CAST(SUM(CAST(ROUND(ln(CAST(n AS DOUBLE) / nw1), 9) AS DECIMAL(20,9))) AS DOUBLE)
        |      / COUNT(*), 6) AS avg_logprob
        |  FROM bg JOIN lm2 USING (bigram) GROUP BY doc_id)
        |SELECT d.source, COUNT(*) AS n_docs,
        |  round(CAST(SUM(CAST(rep.dup_ratio AS DECIMAL(18,6))) AS DOUBLE)
        |    / COUNT(*), 6) AS mean_dup_ratio,
        |  round(CAST(SUM(CAST(lp.avg_logprob AS DECIMAL(18,6))) AS DOUBLE)
        |    / COUNT(*), 6) AS mean_logprob
        |FROM documents d
        |JOIN rep ON rep.doc_id = d.doc_id
        |JOIN lp ON lp.doc_id = d.doc_id
        |GROUP BY d.source ORDER BY d.source""".stripMargin)
}
