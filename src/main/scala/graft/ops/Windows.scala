package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Analytic window operators beyond the reference's two ranking windows
  * (SURVEY §2.6): lag/lead, aggregate-over-frame, and batch
  * sessionization. All single-shuffle per partition key.
  */
object Windows {

  /** lag/lead of `valueCol` per key, deterministically ordered. */
  def lagLead(df: DataFrame, keys: Seq[String], order: Seq[String],
              valueCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(col): _*)
    df.withColumn("prev_value", lag(col(valueCol), 1).over(w))
      .withColumn("next_value", lead(col(valueCol), 1).over(w))
  }

  /** Moving frame aggregate: decimal running sum over the trailing
    * `frame`+1 rows plus position. Decimal per-row cast keeps the sum
    * exact (order-independent — oracle parity and distributed
    * reproducibility).
    */
  def movingAgg(df: DataFrame, keys: Seq[String], order: Seq[String],
                valueCol: String, frame: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(col): _*)
    val framed = w.rowsBetween(-frame, Window.currentRow)
    df.withColumn("moving_sum",
        // exact decimal frame sum internally; rounded-double presentation
        // (engine-independent canonical form)
        round(sum(col(valueCol).cast(DecimalType(18, 2))).over(framed).cast("double"), 2))
      .withColumn("pos_in_key", row_number().over(w))
  }

  /** Batch sessionization: a new session starts when the gap to the
    * previous event of the same key exceeds `gapSeconds`. Session id is
    * the running count of session starts — the standard single-pass,
    * single-shuffle formulation (same semantics as Structured Streaming's
    * `session_window`, which [[graft.streaming.EventStream]] uses on the
    * live path).
    */
  def sessionize(df: DataFrame, keys: Seq[String], tsCol: String,
                 tiebreak: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol), col(tiebreak))
    val gap = unix_timestamp(col(tsCol)) - unix_timestamp(lag(col(tsCol), 1).over(w))
    df.withColumn("is_new_session",
        when(lag(col(tsCol), 1).over(w).isNull || gap > gapSeconds, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("is_new_session")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("is_new_session")
  }

  /** Session-level rollup over [[sessionize]] output. */
  def sessionStats(sessions: DataFrame, keys: Seq[String], tsCol: String): DataFrame =
    sessions.groupBy((keys :+ "session_id").map(col): _*)
      .agg(
        count(lit(1)).as("n_events"),
        (unix_timestamp(max(col(tsCol))) - unix_timestamp(min(col(tsCol)))).as("duration_sec"))
      .orderBy((keys :+ "session_id").map(col): _*)

  /** Hourly resample + forward fill: bucket each key's observations to
    * the hour, build the full key × hour grid between the corpus bounds
    * (tiny: one `sequence` explode against the distinct keys, bounds
    * broadcast), left-join the observed means, and carry the last
    * non-null value forward per key. Gaps before a key's first
    * observation stay null. One window per key over the GRID (bounded:
    * hours × keys), never over the raw event stream — so a sparse
    * 100 TB stream forward-fills with a shuffle proportional to the
    * grid, not the data.
    *
    * The grid is "tiny" only while the time span is: keys × hours grows
    * with the corpus' calendar coverage, not its row count, so a
    * decade-span stream with many keys silently explodes it. The
    * operator measures both factors in ONE scalar agg (bounds + key
    * count together — no extra pass over the data) and refuses past
    * `maxGridCells`, naming the numbers, rather than letting the
    * explode run away; chunk the time range or coarsen the grain
    * deliberately instead. The collected bounds then feed the grid as
    * literals, so the agg never re-executes inside the join.
    */
  def gapFillHourly(df: DataFrame, keyCol: String, tsCol: String,
                    valueCol: String,
                    maxGridCells: Long = 100000000L): DataFrame = {
    val present = df.filter(col(valueCol).isNotNull)
    val hourly = present
      .groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("hour"))
      .agg(round(sum(col(valueCol).cast(DecimalType(18, 6))).cast("double") /
        count(lit(1)), 6).as("avg_v"))
    val b = present.agg(
      date_trunc("hour", min(col(tsCol))).as("lo"),
      date_trunc("hour", max(col(tsCol))).as("hi"),
      // count_distinct skips a null key, but the grid's distinct() keeps
      // it as a row — count it back in or the guard undercounts by one
      count_distinct(col(keyCol)).as("nk"),
      max(col(keyCol).isNull.cast("long")).as("nullKey")).head()
    if (!b.isNullAt(0)) { // null bounds = empty input: grid is empty anyway
      val hours = (b.getTimestamp(1).getTime - b.getTimestamp(0).getTime) /
        3600000L + 1
      val nKeys = b.getLong(2) + b.getLong(3)
      // division, not multiplication: corrupt far-future timestamps can
      // push hours x keys past Long range, and an overflowed product
      // would slip the guard
      require(nKeys == 0 || hours <= maxGridCells / nKeys,
        s"gapFillHourly: grid would be $nKeys keys x $hours hours " +
          s"(> maxGridCells=$maxGridCells); the forward-fill " +
          "window shuffles the whole grid, so an unbounded span explodes " +
          "it regardless of row count. Chunk the time range, coarsen the " +
          "grain, or raise maxGridCells deliberately")
    }
    val (lo, hi) =
      if (b.isNullAt(0)) (lit(null).cast("timestamp"), lit(null).cast("timestamp"))
      else (lit(b.getTimestamp(0)), lit(b.getTimestamp(1)))
    val grid = present.select(col(keyCol)).distinct()
      .select(col(keyCol),
        explode(sequence(lo, hi, expr("INTERVAL 1 HOUR"))).as("hour"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq(keyCol, "hour"), "left")
      .withColumn("filled", last(col("avg_v"), ignoreNulls = true).over(w))
      .withColumn("is_gap", col("avg_v").isNull)
      .select(col(keyCol), col("hour"), col("filled"), col("is_gap"))
  }

  /** Longest underwater spell per key: the maximum number of
    * CONSECUTIVE ticks strictly below the running peak — drawdown
    * DURATION, the time-axis complement of [[graft.ops.Stats
    * .maxDrawdown]]'s depth (how long capital sat below high-water,
    * not how far). Gaps-and-islands like [[longestUpStreak]]: island
    * id = cumulative count of at-peak ticks, spell length = underwater
    * ticks per island. All-exact arithmetic (decimal compare, integer
    * counts — no doubles anywhere), keys that never dip emit 0. Both
    * windows and both aggregations cluster on the key, so the whole
    * plan rides ONE hash Exchange.
    */
  def longestUnderwaterSpell(df: DataFrame, keyCol: String,
                             orderCols: Seq[Column],
                             valueCol: Column): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(_.asc): _*)
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val v = valueCol.cast(DecimalType(18, 6))
    df.withColumn("_rm", max(v).over(cum)) // running peak incl. current
      .withColumn("_uw", when(v < col("_rm"), lit(1)).otherwise(lit(0)))
      .withColumn("_isl", sum(lit(1) - col("_uw")).over(cum))
      .groupBy(col(keyCol), col("_isl"))
      .agg(sum(col("_uw")).as("_len")) // peak tick in-island counts 0
      .groupBy(col(keyCol))
      .agg(max(col("_len")).as("max_underwater_ticks"))
  }

  /** Longest run of strictly rising ticks per key — gaps-and-islands
    * without generating island ids by subtraction-of-row-numbers: a
    * cumulative count of NON-up ticks is constant exactly while a streak
    * runs, so it IS the island id. Deltas in exact decimals (rising is a
    * sign test — no float epsilon), two windows over one partition-by-
    * key shuffle, then two hash aggs. Keys that never rise report 0.
    */
  def longestUpStreak(df: DataFrame, keyCol: String, orderCols: Seq[Column],
                      valueCol: Column): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(_.asc): _*)
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val v = valueCol.cast(DecimalType(18, 6))
    val deltas = df
      .withColumn("_up", (v - lag(v, 1).over(w)) > 0) // null on first tick
      .withColumn("_isl",
        sum(when(col("_up"), lit(0)).otherwise(lit(1))).over(cum))
    val streaks = deltas.filter(col("_up"))
      .groupBy(col(keyCol), col("_isl"))
      .agg(count(lit(1)).as("_len"))
      .groupBy(col(keyCol))
      .agg(max(col("_len")).as("max_streak"))
    df.select(col(keyCol)).distinct()
      .join(streaks, Seq(keyCol), "left")
      .select(col(keyCol), coalesce(col("max_streak"), lit(0L)).as("max_streak"))
  }

  /** Interval union (the classic gaps-and-islands merge): given one
    * interval [startUs, endUs] per row, coalesce every overlapping or
    * TOUCHING (end == next start) group per key into one island and
    * report, per key, the event count, island count, and exact covered
    * microseconds — coverage/uptime analysis (market sessions, feed
    * availability, sensor windows) in its canonical distributed form.
    *
    * Determinism: pure long arithmetic end to end. Plan: one
    * key-partitioned window pass (running max of end over the sorted
    * starts decides island breaks; the running sum of breaks labels
    * islands) and two keyed aggs riding the same clustering — islands
    * never materialize per-pair state, so a key with millions of
    * intervals costs one sort, exactly the [[sessionize]] economics.
    */
  def mergeIntervals(df: DataFrame, keys: Seq[String], startUs: Column,
                     endUs: Column, tiebreak: Column): DataFrame = {
    val keyCols = keys.map(col)
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(startUs.asc, tiebreak.asc)
    val prevMaxEnd = max(col("_e"))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val base = df
      .withColumn("_s", startUs.cast("long"))
      .withColumn("_e", endUs.cast("long"))
      .filter(col("_s").isNotNull && col("_e").isNotNull &&
        col("_s") <= col("_e"))
    val islanded = base
      .withColumn("_brk",
        when(prevMaxEnd.isNull || col("_s") > prevMaxEnd, 1L).otherwise(0L))
      .withColumn("_isl", sum(col("_brk"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    islanded
      .groupBy(keyCols :+ col("_isl"): _*)
      .agg(count(lit(1)).as("_n"), min(col("_s")).as("_is"),
        max(col("_e")).as("_ie"))
      .groupBy(keyCols: _*)
      .agg(sum(col("_n")).as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("_ie") - col("_is")).as("covered_us"))
  }
}
