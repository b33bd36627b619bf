package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of grouped aggregates from a CDC feed — the
  * materialized-view pattern that makes a 100 TB rollup affordable:
  * once `base = groupAgg(snapshot_v)` exists, the v+1 state is
  * `applyDelta(base, aggDelta(changeCaptureCdf(v, v+1)))` — the delta
  * aggregation shuffles ONLY the changed rows and the merge joins two
  * AGGREGATE-sized frames (dimension cardinality), so maintenance cost
  * scales with the churn, never with the base table.
  *
  * Exactness contract: counts and any measure built from exact types
  * (longs, decimals) are maintained bit-identically — signed sums are
  * order-independent — so `groupAgg(after) === applyDelta(groupAgg(
  * before), aggDelta(feed))` is a LAW (ScalaCheck-proven over random
  * before/after pairs, and oracle-proven by q105). Double measures
  * would reintroduce order-dependent rounding; cast to decimal first,
  * as every exact-sum operator in this engine does.
  *
  * Null contract: a NULL measure value contributes 0 (the coalesced
  * merge cannot represent "no non-null value seen"), so a group whose
  * measure is entirely null sums to 0 here where a fresh `groupAgg`
  * yields NULL. Feed non-null measures — `coalesce` upstream — when
  * bit-parity with direct aggregation matters (q105 filters nulls for
  * exactly this reason).
  *
  * Reference analog: the reference recomputes its gold aggregates from
  * silver on every run (src/processing/silver_to_gold_crypto.py) — this
  * is the incremental form its Delta CDC surface enables.
  */
object Incremental {

  /** The maintained shape: per-`dims` row count `n` plus one exact SUM
    * per named measure. (avg/stddev derive from maintained power sums —
    * add `x·x` as another measure; min/max are NOT incrementally
    * maintainable under deletes and are refused by omission.)
    */
  def groupAgg(df: DataFrame, dims: Seq[String],
               measures: Seq[(String, Column)]): DataFrame = {
    require(dims.nonEmpty, "groupAgg requires at least one dimension")
    val aggs = count(lit(1)).as("n") +:
      measures.map { case (name, c) => sum(c).as(name) }
    df.groupBy(dims.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Strict-null wrapper for measures entering a delta feed: the null
    * contract above (NULL contributes 0) is a documented, deliberate
    * divergence from fresh aggregation — but it is SILENT, and a feed
    * that starts carrying unexpected nulls would drift the rollup with
    * no error. `strictNulls = true` makes that loud: any null measure
    * value fails the job at scan time, executor-side, via the same
    * `raise_error` posture as the unknown-change_type guard.
    */
  private def guarded(name: String, c: Column, strictNulls: Boolean): Column =
    if (!strictNulls) c
    else when(c.isNull, raise_error(lit(
      s"incremental feed: NULL measure '$name' under strictNulls — an " +
        "all-null group maintains 0 where fresh aggregation yields NULL; " +
        "coalesce/filter upstream or opt into the documented null " +
        "contract with strictNulls=false"))).otherwise(c)

  /** Signed aggregation of a [[Upsert.changeCaptureCdf]] feed: inserts
    * and update post-images contribute +1/+measure, deletes and update
    * pre-images −1/−measure. A feed row with any other `change_type`
    * (e.g. plain `update`, which lacks the pre-image needed to retract
    * the old contribution) fails the job loudly via `raise_error` —
    * silently skipping it would corrupt the maintained aggregate.
    * `strictNulls` extends the same loud-failure posture to null
    * measure values (see [[guarded]]).
    */
  def aggDelta(feed: DataFrame, dims: Seq[String],
               measures: Seq[(String, Column)],
               strictNulls: Boolean = false): DataFrame = {
    require(dims.nonEmpty, "aggDelta requires at least one dimension")
    val sign = when(
        col("change_type").isin("insert", "update_postimage"), lit(1L))
      .when(col("change_type").isin("delete", "update_preimage"), lit(-1L))
      .otherwise(raise_error(concat(
        lit("aggDelta: change_type without a defined sign: "),
        col("change_type"))).cast("long"))
    val aggs = sum(col("_sign")).as("n_delta") +: measures.map {
      case (name, c) => sum(guarded(name, c, strictNulls) * col("_sign"))
        .as(s"${name}_delta")
    }
    feed.withColumn("_sign", sign)
      .groupBy(dims.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Delta of an APPEND-ONLY increment (a streaming micro-batch, a new
    * ingest partition): every row is an insert, so the delta is just the
    * increment's own [[groupAgg]] in delta-column dress — no CDC join
    * needed. The common case of rollup maintenance over immutable
    * event streams.
    */
  def insertDelta(df: DataFrame, dims: Seq[String],
                  measures: Seq[(String, Column)],
                  strictNulls: Boolean = false): DataFrame = {
    val gm = measures.map { case (n, c) => (n, guarded(n, c, strictNulls)) }
    measures.foldLeft(
      groupAgg(df, dims, gm).withColumnRenamed("n", "n_delta")) {
      case (acc, (name, _)) => acc.withColumnRenamed(name, s"${name}_delta")
    }
  }

  /** COUNT-DISTINCT rollup via mergeable HyperLogLog sketches (Spark's
    * DataSketches `hll_sketch_agg`/`hll_union`): the rollup stores one
    * compact sketch per group, a new increment's sketches merge in with
    * a join of two aggregate-sized frames, and `hll_sketch_estimate`
    * reads the estimate out. Exact distinct counting cannot be
    * maintained incrementally without keeping the full value set per
    * group — the sketch trades a ~2% error for O(kB)/group state, the
    * standard lambda-architecture move. INSERT-ONLY by nature: a sketch
    * cannot retract, so this pairs with append streams (the
    * [[graft.streaming.EventStream.sinkRollup]] case), not CDC deletes
    * — delete-bearing feeds need [[aggDelta]]'s exact measures.
    * Determinism: HLL sketches are order-insensitive (a merge of
    * per-partition sketches equals the sequential sketch), so estimates
    * are stable across partitionings and replay.
    */
  def sketchAgg(df: DataFrame, dims: Seq[String],
                distinctCol: Column, lgK: Int = 12): DataFrame = {
    require(dims.nonEmpty, "sketchAgg requires at least one dimension")
    df.groupBy(dims.map(col): _*)
      .agg(count(lit(1)).as("n"),
        hll_sketch_agg(distinctCol, lit(lgK)).as("distinct_sketch"))
  }

  /** Merge an increment's [[sketchAgg]] into the maintained rollup:
    * groups present on both sides `hll_union`; one-sided groups carry
    * their sketch through unchanged.
    */
  def applySketchDelta(base: DataFrame, delta: DataFrame,
                       dims: Seq[String]): DataFrame = {
    val d = delta.withColumnRenamed("n", "n_delta")
      .withColumnRenamed("distinct_sketch", "sketch_delta")
    base.join(d, dims, "full_outer")
      .select(dims.map(col) ++ Seq(
        (coalesce(col("n"), lit(0L)) + coalesce(col("n_delta"), lit(0L)))
          .as("n"),
        when(col("distinct_sketch").isNotNull && col("sketch_delta").isNotNull,
            hll_union(col("distinct_sketch"), col("sketch_delta")))
          .otherwise(coalesce(col("distinct_sketch"), col("sketch_delta")))
          .as("distinct_sketch")): _*)
  }

  /** Read the distinct-count estimates out of a sketch rollup. */
  def sketchEstimates(rollup: DataFrame, dims: Seq[String]): DataFrame =
    rollup.select(dims.map(col) ++ Seq(col("n"),
      hll_sketch_estimate(col("distinct_sketch")).as("approx_distinct")): _*)

  /** Derive per-key (mean, std) from a maintained power-sum rollup —
    * the incremental face of [[graft.ops.Stats.keyMoments]], closing
    * the loop for the broadcast-scorer path: maintain `n`, `s1 = Σv`,
    * `s2 = Σv²` as [[groupAgg]] measures (exact decimals), and the
    * scorer's reference moments derive from the AGGREGATE-sized rollup
    * at read time — refreshing anomaly levels after a CDC batch costs
    * churn-shaped work, never a history rescan. Identical math and
    * guards to keyMoments: variance clamped at 0 (decimal→double −ε),
    * keys with n ≤ 1 or zero variance drop out as unscorable.
    *
    * PRECONDITION: maintain the rollup over NULL-FILTERED measure rows
    * (keyMoments applies `value IS NOT NULL` internally; a rollup's `n`
    * counts every row while its sums skip nulls, so null-bearing input
    * would deflate the derived mean/std with no error raised). Filter
    * at [[groupAgg]]/feed time, as q105 does.
    */
  def momentsFromSums(rollup: DataFrame, keyCols: Seq[String],
                      s1Col: String, s2Col: String): DataFrame = {
    val s1d = col(s1Col).cast("double")
    val varExpr = greatest(lit(0.0),
      (col(s2Col).cast("double") - s1d * s1d / col("n")) / (col("n") - 1))
    rollup.filter(col("n") > 1)
      .select(keyCols.map(col) ++ Seq(
        (s1d / col("n")).as("_mean"), sqrt(varExpr).as("_std")): _*)
      .filter(col("_std") > 0)
  }

  /** Merge a delta into the maintained aggregate: ONE full-outer join
    * on the dimensions (both sides aggregate-sized), null-coalesced
    * sums, groups whose count nets to zero vanish — exactly the rows a
    * fresh [[groupAgg]] of the after-state would produce.
    *
    * Each merged measure (and `n`) is cast back to the BASE column's
    * type: decimal addition otherwise widens precision by one on every
    * merge (decimal(28,6) → (29,6) → …), so a rollup maintained across
    * many commits would drift its schema version-to-version until the
    * 38 cap and break [[Snapshots.changeFeed]]'s schema-equality check.
    * The cast cannot overflow silently: values stay within the base
    * type by the same argument that makes a fresh groupAgg fit it, and
    * ANSI mode (Spark 4's default) errors loudly if one ever doesn't.
    */
  def applyDelta(base: DataFrame, delta: DataFrame, dims: Seq[String],
                 measureNames: Seq[String]): DataFrame = {
    val joined = base.join(delta, dims, "full_outer")
    val n = (coalesce(col("n"), lit(0L)) + coalesce(col("n_delta"), lit(0L)))
      .cast(base.schema("n").dataType)
    val meas = measureNames.map { m =>
      (coalesce(col(m), lit(0)) + coalesce(col(s"${m}_delta"), lit(0)))
        .cast(base.schema(m).dataType).as(m)
    }
    joined
      .select(dims.map(col) ++ (n.as("n") +: meas): _*)
      .filter(col("n") > 0)
  }
}
