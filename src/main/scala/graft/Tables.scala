package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the deterministic testdata tables (TESTDATA.md).
  *
  * Each table is a single parquet file per scale factor; at cluster scale
  * these would be partitioned directories — `spark.read.parquet` handles
  * both transparently (partition discovery + pruning).
  *
  * `events.ts` has shipped in three physical encodings across testdata
  * generations, so the loader normalizes ALL of them to session-TZ
  * TIMESTAMP here — once, at the boundary — rather than making every
  * downstream operator tolerate each encoding (the reference pipeline
  * applies the same normalize-then-compute discipline to `last_updated`,
  * `src/processing/bronze_to_silver_crypto.py:68`):
  *   - parquet TIMESTAMP(NANOS): Spark's vectorized reader rejects it;
  *     read via the `nanosAsLong` legacy conf and converted with
  *     `ts div 1000` — integer division, not `/`, because epoch-nanos
  *     exceed double mantissa precision;
  *   - plain `timestamp[us]` (isAdjustedToUTC=false): Spark 4 infers
  *     TIMESTAMP_NTZ; cast to TIMESTAMP — lossless because the session
  *     timezone is pinned to UTC ([[graft.engine.Sessions.tune]]);
  *   - `timestamp[us, UTC]`: already TIMESTAMP, passed through.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Schema-inference cache (guide §1.2 fixed overheads): every
  // un-schema'd parquet read runs a footer-inference Spark job (~40 ms
  // of scheduler round-trip, measured by DevLoadTrace), and the bench
  // session calls load() thousands of times over IMMUTABLE files. The
  // cache holds metadata only (the file's schema, keyed by path) — on
  // a mutable production table this is the same staleness contract as
  // Spark's own per-session file-listing cache.
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[
      String, org.apache.spark.sql.types.StructType]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val cached = schemaCache.get(path)
    val df =
      if (cached != null) spark.read.schema(cached).parquet(path)
      else {
        val d = spark.read.parquet(path)
        schemaCache.put(path, d.schema)
        d
      }
    if (name == "events") normalizeTs(df, "ts") else df
  }

  /** Normalize a timestamp column of any of the three shipped physical
    * encodings (nanos-as-Long, NTZ, LTZ) to session-TZ TIMESTAMP. */
  def normalizeTs(df: DataFrame, c: String): DataFrame =
    df.schema(c).dataType match {
      case LongType =>
        df.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
      case TimestampNTZType =>
        df.withColumn(c, col(c).cast(TimestampType))
      case _ => df
    }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
