package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ops.{Clean, Guards, Ingest, Joins, Risk, Stats, Windows}
import graft.text.{Dedup, TextStats}
import graft.text.Curation.FixedBpeMerges
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

  /** q241's per-CALL ANN index: the forget cycle mutates (purges), so
    * each call file-copies the pristine q196 base index to a fresh dir
    * — the forgetCycleIndexCopy discipline on the ANN tier.
    */
  private def forgetCycleAnnIndexCopy(s: SparkSession, dir: String): String = {
    val base = ivfAdcIndexFor(s, dir)
    val dst = java.nio.file.Files.createTempDirectory("graft_forgetannrun")
      .toString + "/index"
    val conf = s.sparkContext.hadoopConfiguration
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI("file:///"), conf)
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(base), fs,
      new org.apache.hadoop.fs.Path(dst), false, conf)
    dst
  }

  /** Build-once memo for the persisted per-source HLL register files
    * (the build/probe split applied to the sketch family, round-11):
    * registers derived once per sf dir; q228 estimates read the
    * 8 KB-per-source files alone — no corpus scan on the read path.
    */
  private val hllRegCache = scala.collection.concurrent.TrieMap.empty[String, String]
  private def hllRegistersFor(s: SparkSession, dir: String): String =
    hllRegCache.getOrElseUpdate(dir, {
      val path = java.nio.file.Files.createTempDirectory("graft_hllreg").toString + "/hll"
      text.TextStats.buildHllRegisters(t(s, dir, "documents"),
        "source", "text", n = 3, p = 10, path)
      path
    })

  /** Build-once memo for the persisted per-slice KMV bottom-k samples
    * (round-11, the register-file discipline for the overlap family):
    * k rows per slice on disk; q229 estimates read the samples alone.
    */
  private val kmvSampleCache = scala.collection.concurrent.TrieMap.empty[String, String]
  private def kmvSamplesFor(s: SparkSession, dir: String): String =
    kmvSampleCache.getOrElseUpdate(dir, {
      val path = java.nio.file.Files.createTempDirectory("graft_kmv").toString + "/kmv"
      text.TextStats.buildKmvSamples(t(s, dir, "documents"),
        "source", "text", n = 3, k = 64, path)
      path
    })

  /** Build-once memo for the persisted per-group quantile-sketch
    * samples (round-12; the sketch suite's fourth axis — quantiles
    * join counts/distincts/overlap): ≤ k rows per group on disk,
    * q233 estimates read the sample file alone.
    */
  private val quantileSketchCache = scala.collection.concurrent.TrieMap.empty[String, String]
  private def quantileSketchFor(s: SparkSession, dir: String): String =
    quantileSketchCache.getOrElseUpdate(dir, {
      val path = java.nio.file.Files.createTempDirectory("graft_qsk").toString + "/qsk"
      ops.Stats.buildQuantileSketch(t(s, dir, "events"),
        "event_type", "event_id", col("value"), k = 256, path)
      path
    })

  /** Build-once memo for the persisted CMS cell table (round-11; the
    * counting third of the sketch lifecycle trio).
    */
  private val cmsSketchCache = scala.collection.concurrent.TrieMap.empty[String, String]
  private def cmsSketchFor(s: SparkSession, dir: String): String =
    cmsSketchCache.getOrElseUpdate(dir, {
      val path = java.nio.file.Files.createTempDirectory("graft_cms").toString + "/cms"
      text.TextStats.buildCmsSketch(t(s, dir, "documents"),
        "text", n = 3, path)
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

  /** Build-once memo for the DELETED signature+edge index (round-12
    * deletion propagation, q235): the full-corpus two-tier index with
    * doc_id % 10 = 3 tombstoned via deleteFromSignatureIndex — its
    * manifest must answer exactly as an index built from the
    * remaining docs (the oracle replays q160's composition over the
    * filtered corpus). Built on its OWN path: deletes must never leak
    * into the shared q160/q161/q162 indexes.
    */
  private val delSigIndexCache = scala.collection.concurrent.TrieMap.empty[String, String]
  private def deletedSignatureIndexFor(s: SparkSession, dir: String): String =
    delSigIndexCache.getOrElseUpdate(dir, {
      val path = java.nio.file.Files.createTempDirectory("graft_delsig").toString + "/index"
      val docs = Tables.load(s, dir, "documents")
      multimodal.Curate.buildSignatureIndex(s, docs, "doc_id", "text", path)
      multimodal.Curate.buildEdgeIndex(s, path)
      multimodal.Curate.deleteFromSignatureIndex(s, path,
        docs.filter(col("doc_id") % 10 === 3).select("doc_id"), "doc_id")
      path
    })

  /** q240's per-CALL index: the forget cycle MUTATES its index (it
    * purges), so unlike the read-only q235 fixtures it cannot share a
    * per-JVM memo across calls — a second run would find the rows
    * already gone and report a different cycle. A pristine base index
    * builds once per JVM; each call file-copies it to a fresh dir
    * (megabytes at gate scale — far cheaper than a rebuild) and runs
    * the cycle there, so every invocation reports the same
    * deterministic first-cycle outcome.
    */
  private val forgetBaseCache = scala.collection.concurrent.TrieMap.empty[String, String]
  private def forgetCycleIndexCopy(s: SparkSession, dir: String): String = {
    val base = forgetBaseCache.getOrElseUpdate(dir, {
      val path = java.nio.file.Files.createTempDirectory("graft_forgetbase")
        .toString + "/index"
      multimodal.Curate.buildSignatureIndex(s, Tables.load(s, dir, "documents"),
        "doc_id", "text", path)
      path
    })
    val dst = java.nio.file.Files.createTempDirectory("graft_forgetrun")
      .toString + "/index"
    val conf = s.sparkContext.hadoopConfiguration
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI("file:///"), conf)
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(base), fs,
      new org.apache.hadoop.fs.Path(dst), false, conf)
    dst
  }

  /** Build-once memo for the DELETED IVFADC index (q236): the shared
    * build with vec_id % 7 = 2 tombstoned — probes must exclude the
    * deleted ids and refill the top-k from survivors under the same
    * frozen-codebook distance arithmetic.
    */
  private val delAdcIndexCache = scala.collection.concurrent.TrieMap.empty[String, String]
  private def deletedIvfAdcIndexFor(s: SparkSession, dir: String): String =
    delAdcIndexCache.getOrElseUpdate(dir, {
      val path = java.nio.file.Files.createTempDirectory("graft_deladc").toString + "/index"
      val emb = Tables.load(s, dir, "embeddings")
      graft.vector.Similarity.buildIvfAdcIndex(emb, "vec_id", "embedding", path)
      graft.vector.Similarity.deleteFromIvfAdcIndex(s, path,
        emb.filter(col("vec_id") % 7 === 2).select("vec_id"), "vec_id")
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
      // size via lshBandsForRecall's worst-case collision bound (67
      // bands at n=500, 75 at n=2000), replacing the 24-band constant
      // whose total recall was measured only at sf0.01 (it missed 3/66
      // at sf0.001 and 8/920 at sf0.1, pinning the oracle to one sf).
      // Measured with the derived counts (DevLshBands): 66/66, 59/59,
      // 920/920 — exact equality at ALL three testdata corpora, so the
      // full-registry sf0.1 sweep carries no rows-only row for q39;
      // precision stays exact via the cosine verify step
      Similarity.embedNearDupLsh(t(s, dir, "embeddings"), "vec_id", "embedding", 0.4,
          nBands = -1)
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
          "event_type", col("value"), pLo = 0.05, pHi = 0.95,
          // the scale degrade is WIRED (cuts fall back to the bottom-k
          // quantile-sketch sample past the distinct-count guard); at
          // gate scale the guard stays under, so the exact-percentile
          // oracle applies unchanged — the contamination fallback shape
          idCol = Some("event_id"))
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

    "q235_manifest_after_delete" -> ((s, dir) => {
      // right-to-be-forgotten propagation (round 12): the q160
      // manifest off a two-tier index where doc_id % 10 = 3 was
      // tombstoned AFTER the build — signatures AND persisted edges
      // anti-join the tombstones (delete-proportional; no data file
      // rewritten), components re-form over the survivors, and the
      // oracle replays the full q160 composition over the filtered
      // corpus, proving delete ≡ rebuild-on-remaining end to end.
      // The purge twin (fold tombstones into the files) is law-tested
      // byte-identical in DeleteSpec.
      multimodal.Curate.manifestFromEdgeIndex(s,
          deletedSignatureIndexFor(s, dir),
          Seq(("train", 80), ("val", 10), ("test", 10)))
        .orderBy("doc_id")
    }),

    "q237_delete_report" -> ((s, dir) => {
      // the delete family's operational surface (the q186 discipline):
      // per signature table, how many rows the tombstones currently
      // mask — the garbage ratio every read's anti-join pays, and the
      // signal a production pipeline purges on. Runs against the
      // PRE-PURGE q235 index; the oracle recomputes each table's total
      // and masked counts from the documents table (shingle counts via
      // the shared shingle CTE, one row per doc for the hash tables).
      multimodal.Curate.deletionReport(s, deletedSignatureIndexFor(s, dir))
    }),

    "q238_sig_fsck" -> ((s, dir) => {
      // index integrity audit over the TOMBSTONED q235 index: every
      // invariant must hold (the doc universe, md5 uniqueness, no
      // in-flight swaps) with the freq check correctly reporting its
      // documented stale-under-tombstones state and the pending
      // forget-request count surfaced. The checks are proven to FIRE
      // on corruption in FsckSpec (fault injection); this gate pins
      // the healthy-state contract and the report schema.
      multimodal.Curate.fsckSignatureIndex(s, deletedSignatureIndexFor(s, dir))
    }),

    "q241_forget_cycle_ann" -> ((s, dir) => {
      // the q240 cycle on the ANN tier: recovery → tombstone record
      // (vec_id % 7 = 2, the q236 delete set) → masked-fraction report
      // → policy purge (0.05 < the ~14% mask, so the purge fires) →
      // fsck, on a fresh copy of the pristine IVFADC index. The oracle
      // recomputes the report from the embeddings table: one code row
      // per vector, so the masked fraction is the plain id-set ratio,
      // and a completed purge must audit green with nothing pending.
      Similarity.forgetAndVerifyAnn(s, forgetCycleAnnIndexCopy(s, dir),
        t(s, dir, "embeddings").filter(col("vec_id") % 7 === 2)
          .select("vec_id"),
        "vec_id", purgeAboveMaskedFraction = 0.05)
    }),

    "q240_forget_cycle" -> ((s, dir) => {
      // the forget loop closed end to end (round 13): ONE
      // forgetAndVerify cycle — recovery, tombstone record (doc_id %
      // 10 = 3), deletion report, policy purge (0.05 < the ~10% mask,
      // so the purge FIRES inside the gated query), fsck — on a fresh
      // copy of the pristine index. The oracle recomputes the whole
      // report from first principles: request count and per-table
      // masked fractions from the documents table (shingle fraction
      // via the shared shingle CTE), the policy comparison, and the
      // audited end state (0 pending, 0 failing) that a completed
      // purge must reach.
      multimodal.Curate.forgetAndVerify(s, forgetCycleIndexCopy(s, dir),
        t(s, dir, "documents").filter(col("doc_id") % 10 === 3)
          .select("doc_id"),
        "doc_id", purgeAboveMaskedFraction = 0.05)
    }),

    "q239_ann_fsck" -> ((s, dir) => {
      // the ANN tier's integrity audit over the TOMBSTONED q236 index:
      // codes arity/decode/cluster/id invariants all hold, no swap
      // leftovers, and the tombstone bookkeeping reads zero
      // already-purged ids (the index was never purged).
      Similarity.fsckIvfAdcIndex(s, deletedIvfAdcIndexFor(s, dir))
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
      // compared column is the EXACT log-NAV (sum of 12-dp decimal
      // ln terms) — the sf0.1 sweep caught exp() divergence at
      // NAV ≈ 2e11 where a double ulp beats any rounding grid; the
      // presentation `nav` column stays in the API, not the gate
      Risk.portfolioNav(t(s, dir, "events").filter(col("value").isNotNull),
          "event_type", Seq(col("ts"), col("event_id")), col("value"),
          to_date(col("ts")))
        .drop("nav")
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
    }))
  /** Per-corpus oracle applicability — lives with the oracle map in
    * [[graft.oracles.Oracles]] since the round-11 split.
    */
  val oracleMeasuredOn: Map[String, Set[String]] = graft.oracles.Oracles.measuredOn

  /** The DuckDB oracle map — generation lives in [[graft.oracles]]
    * (shared CTE fragments in OracleCtes, base entries in
    * OraclesA/B/C, spliced composites in Oracles.all); same keys,
    * same SQL as before the split.
    */
  def oracleSql: Map[String, String] = graft.oracles.Oracles.all
}
