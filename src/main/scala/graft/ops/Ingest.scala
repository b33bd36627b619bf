package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.util.Try

/** Ingestion sources (SURVEY §2.1 S1-S4, S7; §2.4 J1).
  *
  * The reference ingests from a REST API (driver-side HTTP →
  * `createDataFrame`, `extract_crypto_data.py:79-174`) or from a synthetic
  * generator (`data_generator.py:195-298`): a small coin catalogue
  * cross-joined (broadcast) with a dense hourly time index, with log-normal
  * price jitter `base × e^(randn()·σ)`.
  *
  * Re-expression: the generator takes an explicit seed so tests are
  * deterministic (SURVEY §7.4.4); the catalogue is generated
  * programmatically rather than a literal list; the REST source is an
  * interface fed from JSON strings in this offline environment (the
  * `fast_pipeline.py:24-25` inference path).
  *
  * Scale posture: `spark.range` is a parallel dense source; the catalogue
  * side is broadcast so the cross join is shuffle-free and scales linearly
  * in the time dimension (the big axis). Generating 10^9 ticks is
  * `range(hours) × broadcast(coins)` — no driver materialization.
  */
object Ingest {

  val bronzeSchema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("symbol", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("current_price", DoubleType, nullable = true),
    StructField("market_cap", LongType, nullable = true),
    StructField("total_volume", LongType, nullable = true),
    StructField("last_updated", StringType, nullable = true)))

  /** S4: deterministic coin catalogue (analog of the reference's 157-entry
    * literal list, `data_generator.py:33-191`). Base price/cap derived from
    * the index with a power-law-ish spread like real market caps.
    */
  def coinCatalogue(spark: SparkSession, numCoins: Int): DataFrame = {
    spark.range(numCoins.toLong).select(
      concat(lit("coin_"), col("id")).as("id"),
      concat(lit("c"), col("id")).as("symbol"),
      concat(lit("Coin "), col("id")).as("name"),
      (lit(50000.0) / (col("id") + lit(1))).as("base_price"),
      (lit(1000000000000L) / (col("id") + lit(1))).cast(LongType).as("base_market_cap"))
  }

  /** S3 + J1 + jitter: synthetic hourly tick table. `startEpoch` is an
    * explicit parameter (the reference anchors to now(),
    * `data_generator.py:256-261` — nondeterministic, so injectable here).
    * Emits the 9-column enriched Bronze schema (`data_generator.py:276-292`).
    */
  def generate(spark: SparkSession, numCoins: Int, days: Int,
               startEpoch: Long, seed: Long = 42L): DataFrame = {
    val hours = days * 24
    val coins = coinCatalogue(spark, numCoins)
    val time = spark.range(hours.toLong).select(
      (lit(startEpoch) + col("id") * 3600L).as("epoch_seconds"))
    // broadcast the small side; hourly index is the unbounded axis
    val grid =
      if (hours <= 1440) time.crossJoin(broadcast(coins))
      else time.crossJoin(coins)
    grid
      .withColumn("last_updated_ts", from_unixtime(col("epoch_seconds")))
      .select(
        col("id"), col("symbol"), col("name"),
        (col("base_price") * exp(randn(seed) * lit(0.08))).as("current_price"),
        (col("base_market_cap") * exp(randn(seed + 1) * lit(0.05))).cast(LongType).as("market_cap"),
        (col("base_market_cap") / lit(100) * exp(randn(seed + 2) * lit(0.4))).cast(LongType).as("total_volume"),
        date_format(to_timestamp(col("last_updated_ts")), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("last_updated"),
        to_timestamp(col("last_updated_ts")).as("_ingested_at"),
        to_date(col("last_updated_ts")).as("partition_date"))
  }

  /** S1: paged REST-style source. The reference fetches top-N coins page
    * by page (sequential GETs, stop on empty page, raise on malformed
    * payload — `extract_crypto_data.py:79-107`). The transport is
    * injected (`fetchPage: pageNumber => rows`) so the same driver logic
    * runs against a live HTTP client or, in this offline environment, a
    * fixture; rows then flow through the S2 coercion path. Driver-side by
    * design, like the reference: the result is a small head table (N ≤
    * pages × perPage), parallelized to executors by `createDataFrame`.
    */
  def fetchPaged(spark: SparkSession,
                 fetchPage: Int => Seq[Map[String, Any]],
                 maxPages: Int): DataFrame = {
    val rows = Iterator.from(1).take(maxPages)
      .map(fetchPage)
      .takeWhile(_.nonEmpty)
      .foldLeft(Seq.empty[Map[String, Any]])(_ ++ _)
    rowsFromMaps(spark, rows)
  }

  /** S2: local collection → DataFrame with safe per-field coercion
    * (`extract_crypto_data.py:124-174`): defaults for unparsable numerics,
    * drop rows missing any of id/symbol/name.
    */
  def rowsFromMaps(spark: SparkSession, raw: Seq[Map[String, Any]]): DataFrame = {
    def s(m: Map[String, Any], k: String): String =
      m.get(k).filter(_ != null).map(_.toString).orNull
    def d(m: Map[String, Any], k: String): java.lang.Double =
      m.get(k).filter(_ != null)
        .flatMap(v => Try(v.toString.toDouble).toOption)
        .map(java.lang.Double.valueOf).getOrElse(java.lang.Double.valueOf(0.0))
    def l(m: Map[String, Any], k: String): java.lang.Long =
      m.get(k).filter(_ != null)
        .flatMap(v => Try(v.toString.toDouble.toLong).toOption)
        .map(java.lang.Long.valueOf).getOrElse(java.lang.Long.valueOf(0L))
    val rows = raw
      .filter(m => s(m, "id") != null && s(m, "symbol") != null && s(m, "name") != null)
      .map(m => Row(s(m, "id"), s(m, "symbol"), s(m, "name"),
        d(m, "current_price"), l(m, "market_cap"), l(m, "total_volume"),
        s(m, "last_updated")))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), bronzeSchema)
  }

  /** S7: JSON-lines ingestion with schema inference (`fast_pipeline.py:24-25`). */
  def fromJson(spark: SparkSession, json: Dataset[String]): DataFrame =
    spark.read.json(json)

  /** CSV ingestion with an explicit schema — the read half of the
    * reference's CSV round trip (it only exports,
    * `silver_to_gold_crypto_stats.py:104-111`). PERMISSIVE mode keeps
    * malformed rows observable instead of dying mid-scan: fields that
    * fail to parse come back null and the raw line is preserved in
    * `_corrupt_record` for quarantine — the pattern a 100 TB ingest of
    * third-party CSV needs (fail-fast only on schema you control).
    * Caveat: corruption is judged against the columns a query actually
    * reads (column pruning reaches the CSV parser), so quarantine
    * passes should cache or select the full schema before filtering on
    * `_corrupt_record`.
    */
  def fromCsv(spark: SparkSession, path: String,
              schema: org.apache.spark.sql.types.StructType,
              header: Boolean = true): DataFrame = {
    require(!schema.fieldNames.contains("_corrupt_record"),
      "schema must not predeclare _corrupt_record — fromCsv appends it")
    spark.read
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema.add("_corrupt_record", "string"))
      .csv(path)
  }

  /** ORC scan — the second columnar format a complete engine must read
    * (Spark's built-in vectorized ORC reader: predicate pushdown, column
    * pruning, and stripe-level min/max skipping all apply exactly as for
    * parquet). The write half is [[graft.engine.Layout.writeOrc]]; q87
    * proves the round trip byte-faithful against the DuckDB oracle.
    */
  def fromOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** JSON-lines directory scan with schema inference — [[fromJson]]'s
    * S7 inference applied to a written corpus directory (the write half
    * is [[graft.engine.Layout.writeJsonl]]). Inference costs one extra
    * pass over the files; production readers at 100 TB pass an explicit
    * schema via `spark.read.schema(...).json` — this entry point is the
    * schema-discovery convenience the reference's JSON ingestion
    * implies, and q173 gates its fidelity.
    */
  def fromJsonDir(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** Seeded per-stratum sampling (training-data curation: down-weight
    * over-represented sources). `fractions` maps stratum value → keep
    * fraction; strata absent from the map are dropped. Map-side only —
    * each executor samples its partitions with the shared seed, no
    * shuffle, no driver materialization.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String,
                       fractions: Map[String, Double], seed: Long): DataFrame =
    df.stat.sampleBy(stratumCol, fractions, seed)
}
