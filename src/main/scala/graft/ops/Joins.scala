package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators: the reference's cross join (SURVEY §2.4 J1) plus the
  * extended surface a market-data engine needs — broadcast dimension
  * joins, semi/anti, range (interval) joins, and an as-of join.
  *
  * Scale posture:
  *   - dimension joins broadcast the small side (no shuffle of the fact);
  *   - the as-of join is ONE shuffle + ONE sort over the union of both
  *     sides — it never builds the (left × right-per-key) blowup a naive
  *     inequality join would, so it survives keys with millions of ticks;
  *   - range joins keep an equi component so Catalyst plans a hash join
  *     with the range as a post-filter, never a nested-loop cross product.
  */
object Joins {

  /** As-of join: for each left row, attach `valueCols` from the
    * nearest right row with the same `keys` on the chosen side of the
    * timeline — `direction = "backward"` (default, the market-data
    * convention): the LATEST right row with right.ts <= left.ts (ties:
    * greatest tiebreak wins); `"forward"`: the EARLIEST right row with
    * right.ts >= left.ts (ties: smallest tiebreak). Right rows at
    * equal ts ARE visible to the left row in both directions.
    * `tolerance` (same units as a double-cast of the ts column —
    * seconds for timestamps, the column's own units for numeric ts)
    * bounds the match's staleness: a right row farther than that
    * yields NULL, exactly pandas `merge_asof`'s tolerance.
    *
    * Implementation: tag and union both sides, then a single running
    * `last(struct(ts, value), ignoreNulls)` window per value column,
    * ordered (ts, side, tiebreak) in the direction's orientation —
    * right rows sort before left rows at equal ts, and carrying the
    * source ts in the struct lets the tolerance cut test the exact row
    * that supplied each value. This is the scalable formulation: one
    * hash shuffle on the key, one sort, ZERO row blowup (a naive
    * inequality join builds left × right-per-key), and it streams
    * through Spark's window operator.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               valueCols: Seq[(String, String)], // (rightCol, outName)
               leftTiebreak: Option[String] = None,
               rightTiebreak: Option[String] = None,
               direction: String = "backward",
               tolerance: Option[Double] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    require(tolerance.forall(_ >= 0), s"tolerance must be >= 0, got $tolerance")
    val back = direction == "backward"
    val keyCols = keys.map(col)
    val tieL = leftTiebreak.map(col(_)).getOrElse(lit(0L))
    val tieR = rightTiebreak.map(col(_)).getOrElse(lit(0L))

    val l = left.withColumn("_ts", col(leftTs)).withColumn("_side", lit(1))
      .withColumn("_tie", tieL.cast("long"))
      .withColumns(valueCols.map { case (_, out) => out -> lit(null) }.toMap)
    val r = right.select(
      keyCols ++ Seq(col(rightTs).as("_ts"), lit(0).as("_side"), tieR.cast("long").as("_tie")) ++
        valueCols.map { case (rc, out) => col(rc).as(out) }: _*)

    // align schemas: left carries its full payload, right rows carry nulls
    val lCols = l.columns
    val rAligned = lCols.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null))
    }.select(lCols.map(col): _*)

    val w = Window.partitionBy(keyCols: _*)
      .orderBy(
        if (back) col("_ts").asc else col("_ts").desc,
        col("_side").asc,
        if (back) col("_tie").asc else col("_tie").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // the struct is captured for EVERY right row, value null or not
    // (a struct with a null field is itself non-null, so ignoreNulls
    // only skips LEFT rows): the nearest right row wins even when its
    // value is NULL — exactly pandas merge_asof and the correlated-
    // subquery oracle. Skipping null-valued right rows would
    // substitute an older/farther row's value and measure tolerance
    // staleness against the substitute (round-8 advice).
    val filled = valueCols.foldLeft(l.unionByName(rAligned)) { case (df, (_, out)) =>
      df.withColumn("_s_" + out,
        last(when(col("_side") === 0,
          struct(col("_ts").as("t"), col(out).as("v"))), ignoreNulls = true)
          .over(w))
    }
    val cut = valueCols.foldLeft(filled) { case (df, (_, out)) =>
      val s = col("_s_" + out)
      val ok = tolerance match {
        case None => s.isNotNull
        case Some(tol) => s.isNotNull &&
          abs(col("_ts").cast("double") - s.getField("t").cast("double")) <= tol
      }
      df.withColumn(out, when(ok, s.getField("v"))).drop("_s_" + out)
    }
    cut.filter(col("_side") === 1).drop("_ts", "_side", "_tie")
  }

  /** Range (interval) join: equi keys + a time-window predicate. The equi
    * component keeps this a hash/sort-merge join; the range is a
    * post-join filter.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                leftTs: Column, lo: Column, hi: Column): DataFrame =
    left.join(right, keys.map(k => left(k) === right(k)).reduce(_ && _)
      && leftTs >= lo && leftTs <= hi)

  /** Skew diagnostic — the visibility primitive behind [[saltedJoin]]:
    * per hot key its row count, share of the table, and imbalance
    * factor (count / mean-rows-per-key — how many "fair shares" of a
    * reducer the key occupies; a key with imbalance 50 makes the
    * straggler task 50× the average, the number that decides whether
    * to salt, broadcast, or filter). ONE keyed count plus a broadcast
    * of the 2-value global aggregate; the hot keys come off the count
    * table via orderBy+limit — `TakeOrderedAndProject`, the distributed
    * top-k that keeps k rows per partition and merges k, never a global
    * sort or a single-partition window over the (billions-of-keys at
    * 100 TB) count table; the rank window then runs over ≤ k rows. Run
    * it BEFORE shipping a join at 100 TB — the engine's own hot-bucket
    * guards (knnGraphBucketed, fuzzyPairs) are this check made
    * mandatory.
    */
  def skewReport(df: DataFrame, keys: Seq[String], topK: Int): DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(sum(col("cnt")).as("_total"),
      count(lit(1)).as("_nkeys"))
    val top = counts
      .orderBy(col("cnt").desc +: keys.map(col(_).asc): _*)
      .limit(topK)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc +: keys.map(col(_).asc): _*)
    top.crossJoin(broadcast(totals))
      .withColumn("rank", row_number().over(w)) // ≤ topK rows by now
      // UNROUNDED doubles on purpose: the inputs (cnt, nkeys, total)
      // are exact integers, so the IEEE quotient is bit-deterministic
      // across engines — while round() on a x.xx5-epsilon double is NOT
      // (string-vs-binary rounding diverges). Doubles up front:
      // cnt·nkeys in longs overflows ANSI at scale.
      .withColumn("share", col("cnt").cast("double") / col("_total"))
      .withColumn("imbalance",
        col("cnt").cast("double") * col("_nkeys") / col("_total"))
      .drop("_total", "_nkeys")
  }

  /** Skew-safe equi join by key salting: the skewed (big) side gets a
    * uniform random salt in [0, salts); the other side is replicated once
    * per salt value; the join runs on (keys, salt). Row-for-row identical
    * to the plain join, but a hot key's rows spread over `salts` reducer
    * partitions instead of one straggler task. Complements AQE's skew
    * handling, which only splits sort-merge join partitions — salting
    * also covers the cases AQE misses (e.g. skewed shuffled hash joins,
    * or skew into a following aggregation). The salt is nondeterministic
    * (rand), which is safe: it never affects results, only placement.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    // salting replicates `small` once per salt value, so only join types
    // that never EMIT unmatched small-side rows are result-identical to
    // the plain join; right/full outer would duplicate them `salts` times
    val preserving = Set("inner", "cross", "left", "leftouter",
      "leftsemi", "leftanti")
    require(preserving.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports only join types that never emit unmatched " +
        s"small-side rows (inner/cross/left_outer/left_semi/left_anti), got $joinType")
    val saltedBig = big.withColumn("_salt", (rand() * salts).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicated, keys :+ "_salt", joinType).drop("_salt")
  }

  /** Broadcast star-dimension join chain: fact ⋈ small dims, each dim
    * explicitly broadcast (reference advice,
    * `silver_to_gold_crypto_stats.py:68`; threshold `spark_manager.py:192`).
    * `dims` entries are (dimension, factKey, dimKey).
    */
  def starJoin(fact: DataFrame, dims: Seq[(DataFrame, String, String)]): DataFrame =
    dims.foldLeft(fact) { case (acc, (dim, fk, dk)) =>
      acc.join(broadcast(dim), col(fk) === col(dk))
    }

  /** Blocked fuzzy self-linkage (entity resolution): candidate pairs
    * share a `blockKey` (the standard ER blocking step — first token,
    * phonetic code, sorted-neighborhood key, …), are ordered `a.id <
    * b.id`, and survive only with `levenshtein(a, b) <= maxDist`.
    * Matching is exact *given the blocker*: a pair split across blocks
    * is unseen by construction (the recall/cost dial every blocking
    * scheme trades on), so results are fully deterministic and
    * oracle-reproducible — no similarity sampling involved.
    *
    * Scale posture: one shuffle of each (tiny: id+name+block) side on
    * the block key; in-block cost is Σ block², the [[graft.text.Dedup]]
    * prefix-filter / knnGraphBucketed cost model. As there, a single hot
    * block silently reintroduces n² — so the operator counts blocks
    * first and refuses any above `maxBlock`, naming the offenders.
    * `levenshtein` is a codegen'd built-in: the verify stays inside
    * WholeStageCodegen, no UDF.
    */
  def fuzzyPairs(df: DataFrame, idCol: String, nameCol: String,
                 blockKey: Column, maxDist: Int,
                 maxBlock: Long = graft.ops.GuardBounds.MaxFuzzyBlock): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    // null block keys can never equi-join: drop them up front so they
    // neither trip the hot-block guard nor ride the shuffle.
    // Cache contract: the guard count materializes `side` for the join's
    // two scans; tracked in Caches — caller releases (releaseAll), as
    // Bench and Verify do per rep/query; same contract as
    // Similarity.normed.
    val side = graft.engine.Caches.persisted("fuzzyPairs.side",
      df.select(col(idCol).as("id"), col(nameCol).as("name"),
        blockKey.as("blk")).filter(col("blk").isNotNull))
    val hot = side.groupBy("blk").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > maxBlock)
      .orderBy(col("cnt").desc).limit(5).collect()
    if (hot.nonEmpty) {
      // refusal diagnostics: the key's whole distribution (block count +
      // Σblock², i.e. the candidate-pair cost), so the caller can judge
      // the key, not just the top offenders. Only ever runs on refusal.
      // double, not long: a ~3e9-row hot block squares past Long.Max
      // and would report a negative pair count in the very regime the
      // message exists to diagnose
      val dist = side.groupBy("blk").agg(count(lit(1)).as("cnt"))
        .agg(count(lit(1)).as("nblk"),
          sum(col("cnt").cast("double") * col("cnt")).as("sumsq")).head()
      side.unpersist()
      throw new IllegalArgumentException(
        s"fuzzyPairs: block(s) exceed maxBlock=$maxBlock " +
          hot.map(r => s"${r.get(0)}=${r.getLong(1)}").mkString("(", ", ", ")") +
          s"; the key yields ${dist.getLong(0)} blocks with " +
          f"sum(block^2)=${dist.getDouble(1)}%.4g candidate pairs. A hot block " +
          "reintroduces the quadratic blowup blocking exists to avoid. " +
          "Use a more selective blockKey (more blocks, flatter counts — " +
          "e.g. more tokens, or match on DISTINCT values and carry " +
          "multiplicities) or raise maxBlock deliberately")
    }
    val a = side.select(col("id").as("a_id"), col("name").as("a_name"), col("blk"))
    val b = side.select(col("id").as("b_id"), col("name").as("b_name"), col("blk"))
    a.join(b, Seq("blk")).filter(col("a_id") < col("b_id"))
      // lossless prefilter: levenshtein(x, y) >= |len(x) - len(y)|, so a
      // pair failing this can never pass the distance cut — and length()
      // is a few codegen'd instructions vs levenshtein's DP, so the
      // expensive verify runs only on length-compatible pairs
      .filter(abs(length(col("a_name")) - length(col("b_name"))) <= maxDist)
      // BANDED DP: the three-arg levenshtein stops at maxDist and
      // returns -1 past it — O(maxDist·min(m,n)) per pair instead of
      // O(m·n), and the -1 sentinel rows are exactly the > maxDist
      // pairs the filter drops. (The same rewrite LevenshteinPrefilter
      // applies to user predicates automatically.)
      .withColumn("edit_dist",
        levenshtein(col("a_name"), col("b_name"), maxDist))
      .filter(col("edit_dist") >= 0)
      .select("a_id", "b_id", "a_name", "b_name", "edit_dist")
  }
}
