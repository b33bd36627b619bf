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

  /** Flagship: the full medallion pipeline (Bronze enrich → Silver dedup →
    * Gold per-day top-10 stats) over `events`. Driver smoke-checks rows>0
    * on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q09_pipeline_gold")(spark, "/root/testdata/sf0.001")

  /** The registry, split across four domain shards (round 13; the
    * OraclesA/B/C precedent applied to the query map — SparkEntry was
    * back above 3,200 lines). Keys, closures, and oracle pairing are
    * byte-identical to the pre-split single map; the require makes a
    * cross-shard key collision (which ++ would silently resolve by
    * dropping an entry) a loud failure instead.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val shards = Seq(RegistryA.queries, RegistryB.queries,
      RegistryC.queries, RegistryD.queries)
    val merged = shards.reduce(_ ++ _)
    require(merged.size == shards.map(_.size).sum,
      "registry shards share a query id — fix the duplicate before it drops an entry")
    merged
  }

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
