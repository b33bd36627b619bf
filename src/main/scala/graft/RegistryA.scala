package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ops.{Clean, Guards, Ingest, Joins, Risk, Stats, Windows}
import graft.text.{Dedup, TextStats}
import graft.text.Curation.FixedBpeMerges
import graft.vector.Similarity
import graft.Fixtures._

/** Registry shard: Reference parity (SURVEY §2) + the extended relational surface.
  *
  * Split VERBATIM from SparkEntry's single 3,200-line map (round 13,
  * the OraclesA/B/C precedent): entries and their comments are
  * unchanged; [[SparkEntry.queries]] concatenates the four shards and
  * asserts key-disjointness, so the driver contract (keys, closures,
  * oracle pairing) is byte-identical to the pre-split registry.
  * 28 entries.
  */
private[graft] object RegistryA {
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
  )
}
