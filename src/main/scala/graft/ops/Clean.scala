package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Bronze → Silver cleaning stage (SURVEY §2.3 P1-P9, §2.6 W1).
  *
  * Reference semantics re-expressed:
  *   - enrichment: `_ingested_at = current_timestamp()`, `last_updated`
  *     backfill via coalesce, `partition_date = to_date(last_updated)` —
  *     the load-bearing invariant (never the run date) —
  *     `extract_crypto_data.py:183-192`, `README.md:19,25`
  *   - typed casts: string→timestamp, double→Decimal(18,8),
  *     long→Decimal(20,2) — `bronze_to_silver_crypto.py:62-71`
  *   - dedup: `row_number()` over key, keep latest by version column —
  *     `bronze_to_silver_crypto.py:76-84` ("latest ingestion wins")
  *
  * Scale posture: the dedup window shuffles once on the key columns; the
  * same hash partitioning is reusable by any downstream per-key operator.
  * All expressions are codegen'd built-ins — no UDFs anywhere.
  */
object Clean {

  val Iso8601 = "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"

  /** P3: enrichment — ingestion timestamp, backfilled event time, derived
    * partition date. `ingestedAt` is injectable so tests/verification are
    * deterministic (SURVEY §7.4.4).
    */
  def enrich(df: DataFrame, tsCol: String,
             ingestedAt: Option[java.sql.Timestamp] = None): DataFrame = {
    val ing = ingestedAt.map(t => lit(t)).getOrElse(current_timestamp())
    val tsType = df.schema(tsCol).dataType
    df.withColumn("_ingested_at", ing)
      .withColumn(tsCol, coalesce(col(tsCol),
        date_format(ing, Iso8601).cast(tsType)))
      .withColumn("partition_date", to_date(col(tsCol)))
  }

  /** P8: Silver typed casts — price → Decimal(18,8), cap → Decimal(20,2),
    * event-time string → timestamp (`bronze_to_silver_crypto.py:62-71`).
    */
  def silverCasts(df: DataFrame, priceCol: String, capCol: String,
                  tsStringCol: Option[String] = None): DataFrame = {
    val typed = df
      .withColumn(priceCol, col(priceCol).cast(DecimalType(18, 8)))
      .withColumn(capCol, col(capCol).cast(DecimalType(20, 2)))
    tsStringCol.fold(typed)(c => typed.withColumn(c, to_timestamp(col(c))))
  }

  /** W1: keep exactly one row per `keys`, the one with max `versionCol`
    * (ties broken by the optional extra columns for determinism —
    * SURVEY §7.4.3). Single shuffle on `keys`.
    */
  def dedupLatest(df: DataFrame, keys: Seq[String], versionCol: String,
                  tiebreak: Seq[String] = Nil): DataFrame = {
    val order = (versionCol +: tiebreak).map(c => col(c).desc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }
}
