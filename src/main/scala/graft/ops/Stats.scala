package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Silver → Gold statistics stage (SURVEY §2.5 A1, §2.6 W2, §2.7).
  *
  * Reference semantics: per-day top-10-by-volume via `rank()` (ties at
  * rank 10 all survive and feed the aggregates —
  * `silver_to_gold_crypto_stats.py:71-75`), then
  * `groupBy(partition_date).agg(sum, avg)` ordered by date
  * (`silver_to_gold_crypto_stats.py:77-84`).
  *
  * Scale posture: `repartition(dateCol)` first (reference Y1,
  * `silver_to_gold_crypto_stats.py:69`) so the rank window and the
  * aggregate share ONE shuffle — Catalyst sees the child partitioning
  * satisfies both distributions. Partial (map-side) aggregation then makes
  * the final agg tiny regardless of input size. Aggregates run on per-row
  * decimal casts, never raw doubles, so results are order-independent —
  * required both for distributed determinism and for oracle parity.
  */
object Stats {

  /** W2 + P5: rank rows within `dateCol` by `volume` desc, keep rank <= k.
    * `rank()` (not row_number) is load-bearing: ties admit >k rows.
    */
  def topKPerDay(df: DataFrame, dateCol: String, volume: Column, k: Int): DataFrame = {
    val w = Window.partitionBy(col(dateCol)).orderBy(volume.desc)
    df.withColumn("volume_rank", rank().over(w))
      .filter(col("volume_rank") <= k)
  }

  /** A1 + O1: Gold daily stats over the top-k rows. Sum is exact decimal;
    * avg is exact-sum / count so it is reproducible under any partial-agg
    * order.
    */
  def dailyStats(topK: DataFrame, dateCol: String,
                 capCol: String, priceCol: String): DataFrame =
    topK.groupBy(col(dateCol))
      .agg(
        // exact decimal sum internally; presented as a rounded double so the
        // output canonicalizes identically across engines (decimal
        // trailing-zero rendering is engine-specific)
        round(sum(col(capCol).cast(DecimalType(18, 2))).cast("double"), 2).as("total_market_cap"),
        (sum(col(priceCol).cast(DecimalType(18, 6))).cast("double") / count(lit(1))).as("avg_price"),
        count(lit(1)).as("n_rows"))
      .orderBy(col(dateCol))

  /** The full Gold stage: repartition → rank → filter → agg → sort. */
  def dailyTopKStats(silver: DataFrame, dateCol: String, volume: Column,
                     capCol: String, priceCol: String, k: Int = 10): DataFrame =
    dailyStats(
      topKPerDay(silver.repartition(col(dateCol)), dateCol, volume, k),
      dateCol, capCol, priceCol)

  /** P7/A3: distinct partition dates (touched-partition discovery,
    * `extract_crypto_data.py:226-229`). Kept as a DataFrame — collect only
    * at the call site that genuinely needs driver-side values.
    */
  def distinctDates(df: DataFrame, dateCol: String): DataFrame =
    df.select(col(dateCol)).distinct().orderBy(col(dateCol))

  /** O2: global top-1 by a column with deterministic tiebreak
    * (`fast_pipeline.py:43`). Catalyst plans TakeOrderedAndProject — no
    * global sort materialization.
    */
  def top1(df: DataFrame, by: Column, tiebreak: Seq[Column]): DataFrame =
    df.orderBy(by.desc +: tiebreak: _*).limit(1)

  /** Scale path for quantile bucketing (the 100 TB replacement for an
    * unpartitioned `ntile`, which is a single-reducer global sort): one
    * sketch pass computes approximate cut points (driver gets `buckets-1`
    * doubles — same footprint as AQE stats), which become a literal
    * sum-of-comparisons bucket expression — codegen'd, map-side only,
    * embarrassingly parallel. Bucket populations are approximately equal
    * (sketch error `relErr`), unlike ntile's exact-but-serial split.
    */
  def bucketByCutpoints(df: DataFrame, valueCol: String, buckets: Int,
                        relErr: Double = 0.001): DataFrame = {
    val nonNull = df.filter(col(valueCol).isNotNull)
    val cuts = nonNull.stat.approxQuantile(valueCol,
      (1 until buckets).map(_.toDouble / buckets).toArray, relErr)
    val bucket = cuts.foldLeft(lit(1)) { (acc, c) =>
      acc + when(col(valueCol) > c, 1).otherwise(0)
    }
    nonNull.withColumn("bucket", bucket.cast("long"))
  }

  /** OHLC bar resampling — the canonical tick→bar market-data aggregate:
    * per (key, bar) open/high/low/close/volume. Open/close are picked by
    * a deterministic total order (time + tiebreak) via two row_number
    * passes over ONE window partitioning (same shuffle), then a grouped
    * agg on the same key — Catalyst reuses the partitioning, so the whole
    * thing is a single exchange. `min_by`/`max_by` would be shorter but
    * tie-break nondeterministically on equal timestamps.
    */
  def ohlcBars(df: DataFrame, keys: Seq[String], barCol: Column,
               tsOrder: Seq[Column], valueCol: String): DataFrame = {
    val grouped = df.withColumn("bar", barCol)
    val wAsc = Window.partitionBy(keys.map(col) :+ col("bar"): _*)
      .orderBy(tsOrder.map(_.asc): _*)
    val wDesc = Window.partitionBy(keys.map(col) :+ col("bar"): _*)
      .orderBy(tsOrder.map(_.desc): _*)
    grouped
      .withColumn("_first", row_number().over(wAsc))
      .withColumn("_last", row_number().over(wDesc))
      .groupBy(keys.map(col) :+ col("bar"): _*)
      .agg(
        max(when(col("_first") === 1, col(valueCol))).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max(when(col("_last") === 1, col(valueCol))).as("close"),
        round(sum(col(valueCol).cast(DecimalType(18, 2))).cast("double"), 2).as("volume"),
        count(lit(1)).as("n_ticks"))
  }

  /** VWAP (volume-weighted average price) per group: Σ(price·qty)/Σ(qty)
    * from exact decimal sums, presented as a rounded double — the
    * canonical market-data aggregate the reference's Gold stats family
    * implies (`silver_to_gold_crypto_stats.py:77-84` computes plain
    * averages; volume weighting is the standard refinement). One hash
    * aggregation with map-side partials; groups with zero total quantity
    * yield a NULL vwap (ANSI-safe) instead of dividing by zero.
    */
  def vwap(df: DataFrame, keys: Seq[String],
           priceCol: Column, qtyCol: Column): DataFrame = {
    val p = priceCol.cast(DecimalType(18, 6))
    val q = qtyCol.cast(DecimalType(18, 6))
    // rows missing price or qty drop first (the Risk.flowImbalance
    // convention): they carry no consideration, would inflate n_trades
    // past the sums' support, and vwapStream filters identically — so
    // the batch/stream prefix-equality law holds on feeds with gaps
    df.filter(priceCol.isNotNull && qtyCol.isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_trades"),
        sum(q).as("_qty"),
        sum((p * q).cast(DecimalType(38, 12))).as("_pv"))
      .withColumn("total_qty", round(col("_qty").cast("double"), 6))
      .withColumn("vwap", when(col("_qty") =!= 0,
        round(col("_pv").cast("double") / col("_qty").cast("double"), 6)))
      .drop("_qty", "_pv")
  }

  /** Trailing-window moments per key: rolling mean and sample stddev of
    * the last `window` rows (current inclusive), from exact decimal
    * power sums over the frame — the window-frame twin of [[keyMoments]]
    * (built-in stddev over a frame streams doubles and is summation-
    * order-dependent; power sums in decimal are order-independent, so
    * the same rows give the same answer on any partitioning AND in the
    * oracle engine). The frame never materializes beyond the window, so
    * cost is one shuffle by key + an O(window) running frame per row.
    * Rows with a single-row frame have no sample stddev (NULL); the
    * variance is clamped at 0 before sqrt to absorb double rounding on
    * near-constant windows.
    */
  def rollingStats(df: DataFrame, keyCol: String, orderCols: Seq[Column],
                   valueCol: Column, window: Int): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(_.asc): _*)
      .rowsBetween(-(window - 1), Window.currentRow)
    val v = valueCol.cast(DecimalType(18, 6))
    val s1d = col("_s1").cast("double")
    val varExpr = greatest(lit(0.0),
      (col("_s2").cast("double") - s1d * s1d / col("_n")) / (col("_n") - 1))
    df.withColumn("_s1", sum(v).over(w))
      .withColumn("_s2", sum((v * v).cast(DecimalType(38, 12))).over(w))
      .withColumn("_n", count(lit(1)).over(w))
      .withColumn("roll_n", col("_n"))
      .withColumn("roll_mean", round(s1d / col("_n"), 6))
      .withColumn("roll_std", when(col("_n") > 1, round(sqrt(varExpr), 6)))
      .drop("_s1", "_s2", "_n")
  }

  /** Bollinger bands per instrument: the trailing-window mean ± k·std
    * envelope plus %B = (price − lower)/(upper − lower), the normalized
    * band position traders act on (0 = at lower band, 1 = at upper).
    * Pure composition over [[rollingStats]] — the bands are derived
    * map-side from the already-exact rolling moments, so the whole
    * operator still rides rollingStats' single partition-by-key shuffle
    * and adds zero new passes. Band arithmetic runs on the ROUNDED
    * mean/std (6 dp presentation values): two engines that agree on the
    * moments then agree bit-for-bit on the bands, which keeps the
    * oracle exact without widening any decimal. Rows whose frame has no
    * sample std (first tick) emit NULL bands; %B guards on the ROUNDED
    * band width, not the std — with a small k, a positive rounded std
    * can still collapse both bands onto the mid (k·std rounds away), and
    * a std-based guard would then divide by zero on valid data (ANSI
    * failure). Zero-width bands ⇒ %B undefined ⇒ NULL.
    */
  def bollinger(df: DataFrame, keyCol: String, orderCols: Seq[Column],
                valueCol: Column, window: Int, k: Double = 2.0): DataFrame = {
    require(k > 0, s"band width multiple must be positive, got $k")
    val vd = valueCol.cast(DecimalType(18, 6)).cast("double")
    // null-priced ticks drop before the frame (the Risk.flowImbalance
    // convention): a null row would otherwise occupy a frame slot and
    // skew roll_mean's divisor — and bollingerStream drops them, so the
    // tick-for-tick equality law holds on feeds with gaps. rollingStats
    // itself keeps its general enrich-every-row contract; the filter is
    // this operator's, matching its stream twin.
    rollingStats(df.filter(valueCol.isNotNull), keyCol, orderCols, valueCol, window)
      .withColumn("bb_mid", col("roll_mean"))
      .withColumn("bb_upper",
        when(col("roll_std").isNotNull,
          round(col("roll_mean") + lit(k) * col("roll_std"), 6)))
      .withColumn("bb_lower",
        when(col("roll_std").isNotNull,
          round(col("roll_mean") - lit(k) * col("roll_std"), 6)))
      .withColumn("pct_b",
        when(col("bb_upper") > col("bb_lower"),
          round((vd - col("bb_lower")) /
            (col("bb_upper") - col("bb_lower")), 6)))
  }

  /** RSI (relative strength index) per instrument over a trailing
    * `period`-tick frame: tick-over-tick deltas split into gains and
    * losses, RSI = 100·Σgain / (Σgain + Σloss) — algebraically
    * 100 − 100/(1+RS) with RS = Σgain/Σloss, but this form needs no
    * division-by-zero special case for loss-free frames. Sums are exact
    * decimals over the frame (q49/q83 moment discipline: order-
    * independent partials, bit-reproducible under any partitioning);
    * only the final presentation divides in double. The first tick of
    * each instrument has no delta and contributes to no frame; frames
    * where every delta is zero (flat price) have no signal ⇒ NULL RSI.
    *
    * One shuffle (partition by instrument), both window passes share it.
    */
  def rsi(df: DataFrame, keyCol: String, orderCols: Seq[Column],
          valueCol: Column, period: Int = 14): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(_.asc): _*)
    val fr = w.rowsBetween(-(period - 1), Window.currentRow)
    val v = valueCol.cast(DecimalType(18, 6))
    val delta = col("_d") // materialized first: window fns don't nest
    // when/when (no otherwise): a null delta stays null ⇒ sum skips it
    val gain = when(delta > 0, delta).when(delta <= 0, lit(0).cast(DecimalType(19, 6)))
    val loss = when(delta < 0, -delta).when(delta >= 0, lit(0).cast(DecimalType(19, 6)))
    // null-priced ticks drop first (the Risk.flowImbalance convention):
    // a null would void TWO deltas via the lag chain and still emit a
    // row — rsiStream drops them, so parity holds on gapped feeds
    df.filter(valueCol.isNotNull)
      .withColumn("_d", v - lag(v, 1).over(w))
      .withColumn("_g", sum(gain).over(fr))
      .withColumn("_l", sum(loss).over(fr))
      .withColumn("n_deltas", count(delta).over(fr))
      .withColumn("rsi",
        when(col("_g") + col("_l") > 0,
          round(lit(100.0) * col("_g").cast("double") /
            (col("_g") + col("_l")).cast("double"), 6)))
      .drop("_d", "_g", "_l")
  }

  /** EWMA (exponentially weighted moving average) per instrument over a
    * trailing `window`-tick frame: the frame's values are folded oldest→
    * newest as `acc·(1−α) + α·x`, seeded with the frame's first value —
    * the textbook recursive EWMA restarted at the frame edge (bounding
    * the frame bounds the state, which is what makes this a single
    * window pass instead of a sequential scan; with (1−α)^window ≈ 0 the
    * truncation is below presentation precision).
    *
    * The fold runs over `collect_list` of the frame — bounded by
    * `window` elements, never the partition — via the native codegen'd
    * [[graft.functions.EwmaFold]] expression (an interpreted `aggregate`
    * HOF lambda re-dispatches per element and becomes the slow path at
    * wide windows; the native loop is flat in the window width). Doubles
    * end to end: IEEE arithmetic in a FIXED order (frame order) is
    * deterministic on any cluster, and the oracle folds the identical
    * expression, so results are bit-reproducible without decimals here.
    * Null-valued ticks drop first (the Risk.flowImbalance convention —
    * collect_list would silently skip them INSIDE frames while their
    * rows still emitted, exactly the batch/stream divergence
    * ewmaStream's drop-null contract forbids).
    */
  def ewma(df: DataFrame, keyCol: String, orderCols: Seq[Column],
           valueCol: Column, alpha: Double, window: Int): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    require(window > 0, s"window must be positive, got $window")
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(_.asc): _*)
      .rowsBetween(-(window - 1), Window.currentRow)
    val fold = org.apache.spark.sql.GraftColumn(graft.functions.EwmaFold(
      org.apache.spark.sql.GraftColumn.expr(col("_l")),
      org.apache.spark.sql.GraftColumn.expr(lit(alpha))))
    df.filter(valueCol.isNotNull)
      .withColumn("_l", collect_list(valueCol.cast("double")).over(w))
      .withColumn("ewma", round(fold, 6)) // EwmaFold: empty frame → null
      .drop("_l")
  }

  /** Per-instrument beta against the cross-instrument market mean: the
    * market series is the per-`bucket` mean of ALL instruments (exact
    * decimal sum / count, presented once as a rounded DECIMAL(21,9) so
    * both engines join the identical series — 21 digits because a mean
    * of DECIMAL(18,6) inputs can itself reach 1e12), and beta follows the q54
    * correlation discipline — per-(instrument,bucket) decimal power
    * sums, double only in the final slope formula
    * β = (n·Σxm − Σx·Σm) / (n·Σmm − (Σm)²).
    *
    * Shape: one agg per bucket (market), one agg per (key,bucket), a
    * broadcast-sized join on bucket (buckets ≪ rows by construction),
    * final per-key agg. Nothing driver-side; skew-free (buckets are
    * time, uniform by construction).
    */
  def betaVsMarket(df: DataFrame, keyCol: String, bucketCol: Column,
                   valueCol: Column): DataFrame = {
    val v = valueCol.cast(DecimalType(18, 6))
    val base = df.select(col(keyCol), bucketCol.as("bucket"), v.as("v"))
    val market = base.groupBy("bucket")
      .agg(sum(col("v")).as("_ms"), count(lit(1)).as("_mn"))
      .select(col("bucket"),
        round(col("_ms").cast("double") / col("_mn"), 9)
          .cast(DecimalType(21, 9)).as("m"))
    val perKey = base.groupBy(col(keyCol), col("bucket"))
      .agg(sum(col("v")).as("_xs"), count(lit(1)).as("_xn"))
      .select(col(keyCol), col("bucket"),
        round(col("_xs").cast("double") / col("_xn"), 9)
          .cast(DecimalType(21, 9)).as("x"))
    val joined = perKey.join(broadcast(market), "bucket")
    val sums = joined.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("m")).as("sm"),
        sum((col("x") * col("m")).cast(DecimalType(38, 18))).as("sxm"),
        sum((col("m") * col("m")).cast(DecimalType(38, 18))).as("smm"))
    def d(c: String) = col(c).cast("double")
    sums.select(col(keyCol), col("n"),
      when(col("n") * d("smm") - d("sm") * d("sm") > 0,
        round((col("n") * d("sxm") - d("sx") * d("sm")) /
          (col("n") * d("smm") - d("sm") * d("sm")), 6)).as("beta"))
  }

  /** Trailing-window beta per (instrument, bucket): [[betaVsMarket]]'s
    * OLS slope re-estimated over the last `nBuckets` observed buckets —
    * the time-varying exposure series a risk desk monitors (a name
    * drifting from β≈1 toward 2 changed character; the static beta
    * averages that away). Market = cross-sectional mean of the bucket
    * means, exactly the static operator's construction.
    *
    * Rows with an incomplete trailing frame (fewer than nBuckets
    * buckets yet) or a degenerate market variance carry a NULL beta —
    * present but unclaiming, the [[graft.ops.Risk.atrChannels]]
    * warm-up convention. All frame sums are exact decimals over the
    * same 9-dp-fixed bucket means as the static path; doubles only in
    * the final guarded quotient.
    *
    * Plan/scale: ticks reduce ONCE to the per-(key, bucket) mean frame
    * (the only corpus-scale pass); the market frame broadcasts; all
    * five trailing sums ride ONE key-partitioned window over the
    * aggregate-sized frame (buckets × keys rows — calendar-bounded,
    * never tick-bounded).
    */
  def rollingBeta(df: DataFrame, keyCol: String, bucketCol: Column,
                  valueCol: Column, nBuckets: Int): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    val v = valueCol.cast(DecimalType(18, 6))
    val base = df.select(col(keyCol), bucketCol.as("bucket"), v.as("v"))
    val market = base.groupBy("bucket")
      .agg(sum(col("v")).as("_ms"), count(lit(1)).as("_mn"))
      .select(col("bucket"),
        round(col("_ms").cast("double") / col("_mn"), 9)
          .cast(DecimalType(21, 9)).as("m"))
    val perKey = base.groupBy(col(keyCol), col("bucket"))
      .agg(sum(col("v")).as("_xs"), count(lit(1)).as("_xn"))
      .select(col(keyCol), col("bucket"),
        round(col("_xs").cast("double") / col("_xn"), 9)
          .cast(DecimalType(21, 9)).as("x"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket").asc)
      .rowsBetween(-(nBuckets - 1), Window.currentRow)
    def d(c: String) = col(c).cast("double")
    val den = col("_n") * d("_smm") - d("_sm") * d("_sm")
    perKey.join(broadcast(market), "bucket")
      .withColumn("_n", count(lit(1)).over(w))
      .withColumn("_sx", sum(col("x")).over(w))
      .withColumn("_sm", sum(col("m")).over(w))
      .withColumn("_sxm",
        sum((col("x") * col("m")).cast(DecimalType(38, 18))).over(w))
      .withColumn("_smm",
        sum((col("m") * col("m")).cast(DecimalType(38, 18))).over(w))
      .select(col(keyCol), col("bucket"), col("_n").as("n_window"),
        when(col("_n") === nBuckets && den > 0,
          round((col("_n") * d("_sxm") - d("_sx") * d("_sm")) / den, 6))
          .as("rolling_beta"))
  }

  /** Tick-over-tick simple return per row, as a ROUNDED DECIMAL(16,9):
    * (v − prev)/prev computed in double (one map-side division —
    * deterministic per row on any cluster), rounded to 9 dp and fixed
    * as a decimal so every DOWNSTREAM aggregate over returns is an
    * exact order-independent power sum (the [[betaVsMarket]] bucket-
    * mean trick applied to the return series). First tick of a key and
    * ticks following a non-positive price (return undefined) are NULL.
    * Shares the caller's partition-by-key window — no extra shuffle.
    *
    * Precision 16, NOT wider: the consumers square these — (16,9)² is
    * decimal(33,18), which fits precision 38 EXACTLY, whereas a wider
    * return type forces Spark to silently reduce the product's scale
    * (a (21,9)² wants precision 43, so Spark truncates to 13 dp —
    * measured: Σr² then disagrees with an exact-arithmetic engine at
    * the 14th decimal). The cost is a 10^7 cap on a single tick-to-tick
    * return, which on real data is corrupt input — ANSI mode fails the
    * job loudly there instead of shipping a silently-truncated sum.
    */
  private[ops] def tickReturn(w: org.apache.spark.sql.expressions.WindowSpec,
                              valueCol: Column): Column = {
    val v = valueCol.cast(DecimalType(18, 6))
    val prev = lag(v, 1).over(w)
    when(prev > 0,
      round((v - prev).cast("double") / prev.cast("double"), 9)
        .cast(DecimalType(16, 9)))
  }

  /** Per-instrument Sharpe ratio over tick returns: mean(r)/std(r), the
    * risk-adjusted-return summary every desk report leads with (Sharpe
    * 1966; rf = 0 — subtracting a constant risk-free return is a caller
    * concern). Returns via [[tickReturn]] (exact decimals after one
    * rounded division), then ONE hash aggregation of exact power sums
    * per instrument — n, Σr, Σr² — and the only double math is the
    * final guarded quotient, rounded to 6 dp. Keys with fewer than two
    * returns or zero variance have no defined ratio ⇒ NULL, not a
    * divide-by-zero. Plan: one window shuffle by key, the aggregation
    * clusters on the same key — AQE rides the existing partitioning.
    */
  def sharpe(df: DataFrame, keyCol: String, orderCols: Seq[Column],
             valueCol: Column): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(_.asc): _*)
    // null-priced ticks drop BEFORE the lag chain (the Risk.flowImbalance
    // convention): a null price carries no information and must not void
    // the NEXT tick's return — and sharpeStream filters identically, so
    // the batch/stream prefix-equality law holds on feeds with gaps
    val sums = df.filter(valueCol.isNotNull)
      .withColumn("_r", tickReturn(w, valueCol))
      .filter(col("_r").isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_returns"),
        sum(col("_r")).as("_s1"),
        sum((col("_r") * col("_r")).cast(DecimalType(38, 18))).as("_s2"))
    val s1d = col("_s1").cast("double")
    val varExpr = greatest(lit(0.0),
      (col("_s2").cast("double") - s1d * s1d / col("n_returns")) /
        (col("n_returns") - 1))
    sums.select(col(keyCol), col("n_returns"),
      round(s1d / col("n_returns"), 9).as("mean_return"),
      when(col("n_returns") > 1 && varExpr > 0,
        round((s1d / col("n_returns")) / sqrt(varExpr), 6)).as("sharpe"))
  }

  /** Realized variance / volatility per (key, bucket): RV = Σ r² over
    * the tick returns inside each bucket (daily realized vol is THE
    * risk number a desk quotes; cf. Andersen & Bollerslev's realized
    * volatility literature). Returns via [[tickReturn]] — note the
    * return STRADDLING a bucket boundary belongs to the bucket of its
    * later tick, the market-open-vs-prior-close convention, and
    * bucketing happens AFTER the lag so overnight gaps count. Σr² is
    * an exact decimal power sum (order-independent); the only double
    * math is the final presentation sqrt. One window shuffle by key;
    * the (key, bucket) aggregation clusters on a superset of the same
    * key, so AQE plans it without a second wide exchange.
    */
  def realizedVariance(df: DataFrame, keyCol: String,
                       orderCols: Seq[Column], valueCol: Column,
                       bucketCol: Column): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(_.asc): _*)
    // null-priced ticks drop BEFORE the lag chain (the Risk.flowImbalance
    // convention): a null price must not void the next tick's return —
    // and realizedVarianceStream filters identically, so the
    // batch/stream prefix-equality law holds on feeds with gaps
    df.filter(valueCol.isNotNull)
      .withColumn("_r", tickReturn(w, valueCol))
      .withColumn("_b", bucketCol)
      .filter(col("_r").isNotNull)
      .groupBy(col(keyCol), col("_b").as("bucket"))
      .agg(count(lit(1)).as("n_returns"),
        sum((col("_r") * col("_r")).cast(DecimalType(38, 18))).as("_rv"))
      .select(col(keyCol), col("bucket"), col("n_returns"),
        col("_rv").cast("double").as("realized_variance"),
        round(sqrt(col("_rv").cast("double")), 9).as("realized_vol"))
  }

  /** Amihud illiquidity per (key, bucket): mean of |return| per unit of
    * traded value — ILLIQ = avg(|rₜ| / (pₜ·qₜ)) over the bucket's ticks
    * (Amihud 2002, "Illiquidity and stock returns"), THE standard
    * price-impact proxy when order-book depth isn't available: a large
    * price move on thin volume = illiquid. Per-row math is one double
    * quotient rounded to 12 dp and fixed as DECIMAL(32,12): the ratio's
    * true domain ceiling is |r| ≤ 10⁷ ([[tickReturn]]) over p·q ≥ 10⁻¹²
    * (both sides DECIMAL(18,6), so the smallest positive consideration
    * is one micro-unit squared) = 10¹⁹, and 32−12 = 20 integer digits
    * hold it — a narrower type would ANSI-fail on a legitimate
    * thin-consideration tick. The bucket mean is then an exact decimal
    * sum / count — order-independent, presented as one rounded double.
    * Zero-value ticks (p·q = 0 — no trade consideration) contribute
    * nothing, like undefined returns. Same one-Exchange shape as
    * [[realizedVariance]].
    */
  def amihudIlliquidity(df: DataFrame, keyCol: String,
                        orderCols: Seq[Column], valueCol: Column,
                        qtyCol: Column, bucketCol: Column): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(_.asc): _*)
    val dollar = (valueCol.cast(DecimalType(18, 6)) *
      qtyCol.cast(DecimalType(18, 6))).cast(DecimalType(38, 12))
    df.withColumn("_r", tickReturn(w, valueCol))
      .withColumn("_dv", dollar)
      .withColumn("_b", bucketCol)
      .filter(col("_r").isNotNull && col("_dv") > 0)
      .withColumn("_il",
        round(abs(col("_r")).cast("double") / col("_dv").cast("double"), 12)
          .cast(DecimalType(32, 12)))
      .groupBy(col(keyCol), col("_b").as("bucket"))
      .agg(count(lit(1)).as("n_ticks"), sum(col("_il")).as("_s"))
      .select(col(keyCol), col("bucket"), col("n_ticks"),
        round(col("_s").cast("double") / col("n_ticks"), 12).as("illiq"))
  }

  /** Lag-1 autocorrelation of tick returns per instrument — the
    * momentum/mean-reversion diagnostic (positive: trends persist;
    * negative: reverts). Pearson correlation of (rₜ, rₜ₋₁) pairs in the
    * q54 power-sum discipline: both series are [[tickReturn]] decimals,
    * the five sums (Σx, Σy, Σxy, Σx², Σy²) are exact and order-
    * independent, doubles appear only in the final guarded quotient.
    * Two window passes (return, then its lag) share ONE partition-by-
    * key shuffle; the aggregation clusters on the same key. Pairs where
    * either return is NULL (first two ticks, undefined returns) drop
    * out, exactly as SQL corr() skips null pairs.
    */
  def returnAutocorr(df: DataFrame, keyCol: String,
                     orderCols: Seq[Column], valueCol: Column): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(_.asc): _*)
    val pairs = df.withColumn("_r", tickReturn(w, valueCol))
      .withColumn("_rp", lag(col("_r"), 1).over(w))
      .filter(col("_r").isNotNull && col("_rp").isNotNull)
    val sums = pairs.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("_r")).as("sx"), sum(col("_rp")).as("sy"),
        sum((col("_r") * col("_rp")).cast(DecimalType(38, 18))).as("sxy"),
        sum((col("_r") * col("_r")).cast(DecimalType(38, 18))).as("sxx"),
        sum((col("_rp") * col("_rp")).cast(DecimalType(38, 18))).as("syy"))
    def d(c: String) = col(c).cast("double")
    val dx = col("n_pairs") * d("sxx") - d("sx") * d("sx")
    val dy = col("n_pairs") * d("syy") - d("sy") * d("sy")
    sums.select(col(keyCol), col("n_pairs"),
      when(dx > 0 && dy > 0,
        round((col("n_pairs") * d("sxy") - d("sx") * d("sy")) /
          sqrt(dx * dy), 6)).as("autocorr"))
  }

  /** Ljung–Box portmanteau statistic per instrument:
    *   Q = n(n+2) Σ_{k=1..h} ρ̂_k² / (n−k)
    * over the first `maxLag` sample autocorrelations of the tick
    * returns (Ljung & Box 1978) — the standard "is there ANY serial
    * correlation" test behind white-noise/efficiency checks, the
    * h-lag generalization of [[returnAutocorr]]'s single ρ̂₁. ρ̂_k uses
    * the classic ACF estimator (global mean, lag-0 denominator):
    * ρ̂_k = Σ_{t>k}(r_t−r̄)(r_{t−k}−r̄) / Σ_t(r_t−r̄)². Under H₀ Q is
    * asymptotically χ²(h); the operator reports Q and leaves the
    * p-value cut to the caller (no χ² inverse in either engine).
    *
    * Numerics: returns via [[tickReturn]] (exact (16,9) decimals); all
    * power/cross sums per lag are exact decimals from ONE hash
    * aggregation; every double appears in a pinned operation order and
    * each ρ̂_k and Q-term fixes to the 12-dp grid, so both engines
    * agree bit-for-bit. Keys need n > maxLag returns and non-zero
    * return variance for a defined Q — else NULL, loudly typed.
    *
    * Plan/scale: the lag stack is h extra lag() exprs riding the SAME
    * key-partitioned window pass as the return computation, and the
    * whole reduction is one keyed agg sharing that clustering — ONE
    * tick-scale Exchange total, per-key state bounded by h power sums.
    */
  def ljungBox(df: DataFrame, keyCol: String, orderCols: Seq[Column],
               valueCol: Column, maxLag: Int = 5): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(_.asc): _*)
    val rets = df.filter(valueCol.isNotNull)
      .withColumn("_r", tickReturn(w, valueCol))
      .filter(col("_r").isNotNull)
    val withLags = (1 to maxLag).foldLeft(rets) { (acc, k) =>
      acc.withColumn(s"_l$k", lag(col("_r"), k).over(w))
    }
    val aggs: Seq[Column] = Seq(
      count(lit(1)).as("n"),
      sum(col("_r")).as("s1"),
      sum((col("_r") * col("_r")).cast(DecimalType(38, 18))).as("s2")) ++
      (1 to maxLag).flatMap { k =>
        val lk = col(s"_l$k")
        Seq(
          count(lk).as(s"cnt$k"),
          sum(when(lk.isNotNull,
            (col("_r") * lk).cast(DecimalType(38, 18)))).as(s"p$k"),
          sum(when(lk.isNotNull, col("_r"))).as(s"a$k"),
          sum(lk).as(s"b$k"))
      }
    val sums = withLags.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
    def d(c: String) = col(c).cast("double")
    val n = col("n")
    val rbar = d("s1") / n
    val c0n = d("s2") - d("s1") * rbar
    val terms = (1 to maxLag).map { k =>
      val ckn = d(s"p$k") - rbar * (d(s"a$k") + d(s"b$k")) +
        d(s"cnt$k") * (rbar * rbar)
      val rho = round(ckn / c0n, 12)
      round(rho * rho / (n - lit(k)), 12)
    }
    val qsum = terms.reduce(_ + _)
    sums.select(col(keyCol), n.cast("long").as("n_returns"),
      lit(maxLag).as("n_lags"),
      when(n > lit(maxLag) && c0n > 0,
        round(n * (n + lit(2)) * qsum, 6)).as("q_stat"))
  }

  /** Pairwise correlation matrix across instruments over bucket-aligned
    * mean values — the cross-sectional dependence pass of a market
    * analytics stack (portfolio construction, regime detection), and
    * [[betaVsMarket]]'s k×k generalization.
    *
    * Scale posture: the tick stream first reduces to the per-(key,
    * bucket) mean frame — ONE keyed aggregation, buckets × k rows, the
    * only pass that touches raw data. The k(k−1)/2 pair expansion is a
    * broadcast self-join of that AGGREGATE-sized frame (never the tick
    * table), and each pair's Pearson terms are exact decimal power sums
    * (order-independent, engine-reproducible — the q54/q98 discipline);
    * doubles appear only in the final guarded quotient, rounded to 6 dp.
    * Pairs are emitted once (`key_a < key_b`); undefined correlations
    * (either side constant over the co-observed buckets) are null, not
    * a divide-by-zero. The two sides of the self-join read the SAME
    * persisted bucket-mean frame (aggregate-sized; the guard count
    * doubles as the cache materializer), so the tick stream is scanned
    * exactly once regardless of exchange-reuse behavior.
    *
    * Guarded: the pair expansion is k(k−1)/2 in INSTRUMENT count (flat
    * in tick count — BASELINE.md's measured envelope), so past
    * `maxInstruments` keys the operator refuses with the count named
    * instead of silently broadcasting a quadratic frame — the
    * refuse-don't-melt posture of [[graft.vector.Similarity.semanticDedup]]
    * / knnGraphBucketed. The count is one aggregate scalar off the
    * bucket-mean frame the operator builds anyway. The BUCKET axis
    * (calendar span) is guarded separately: past `maxBroadcastRows`
    * frame rows the pair join falls back broadcast→shuffle-hash
    * ([[pairJoinSide]]) instead of broadcasting a span-sized frame.
    */
  /** Shared bucket-mean alignment frame of the k² pair family
    * ([[corrMatrix]], [[graft.ops.Risk.pairSpread]],
    * [[graft.ops.Risk.leadLagCorr]]) — ONE place owns the numeric
    * contract: DECIMAL(21,9), not (18,9), because input values are
    * DECIMAL(18,6) (up to ~1e12) so a bucket MEAN can reach 1e12 too —
    * 9 fractional digits then need 21 of precision or the cast
    * overflows (ANSI error) on valid data. Oracle CTEs mirror the
    * width.
    */
  private[ops] def bucketMeans(df: DataFrame, keyCol: String,
                               bucketCol: Column, valueCol: Column): DataFrame =
    df.select(col(keyCol), bucketCol.as("bucket"),
        valueCol.cast(DecimalType(18, 6)).as("v"))
      .groupBy(col(keyCol), col("bucket"))
      .agg(sum(col("v")).as("_s"), count(lit(1)).as("_n"))
      .select(col(keyCol), col("bucket"),
        round(col("_s").cast("double") / col("_n"), 9)
          .cast(DecimalType(21, 9)).as("x"))

  /** Persist-and-guard for the pair family: caches the aggregate-sized
    * frame (the guard count doubles as the materializer and both pair
    * sides then read the cache — ticks scanned once), refusing past
    * `maxInstruments` distinct keys with the expansion named. On the
    * REFUSAL path the cache is released before the throw — a refused
    * call must not leak storage that only a later clearCache would
    * reclaim. On success, release follows the caller's clearCache
    * contract (Bench/Verify per-query).
    */
  private[ops] def guardInstruments(frame: DataFrame, keyCol: String,
                                    maxInstruments: Long, opName: String,
                                    expansion: Long => String): DataFrame =
    guardInstrumentsCounted(frame, keyCol, maxInstruments, opName,
      expansion)._1

  /** [[guardInstruments]] returning the key count it already computed,
    * so callers sizing downstream advisories (the leadLagCorr stack
    * projection) don't pay a second distinct-count job.
    */
  private[ops] def guardInstrumentsCounted(frame: DataFrame, keyCol: String,
                                           maxInstruments: Long, opName: String,
                                           expansion: Long => String)
      : (DataFrame, Long) = {
    val cached = graft.engine.Caches.persisted(s"$opName.guarded", frame)
    val k = cached.select(col(keyCol)).distinct().count()
    if (k > maxInstruments) {
      cached.unpersist()
      throw new IllegalArgumentException(
        s"$opName: $k instruments would expand to ${expansion(k)} " +
          s"(maxInstruments=$maxInstruments); restrict the universe " +
          "or raise the bound deliberately")
    }
    (cached, k)
  }

  /** Join-side chooser for the pair family's aggregate frame
    * ([[corrMatrix]], [[graft.ops.Risk.pairSpread]],
    * [[graft.ops.Risk.leadLagCorr]]). [[guardInstruments]] bounds the
    * KEY axis, but the broadcast side is the bucket-mean frame whose
    * row count is Σ_k buckets_k — it grows with the CALENDAR SPAN, not
    * the key count: 200 instruments × one year of minute buckets is
    * ~105M rows (× (maxLag+1) for the lead-lag stack), far past any
    * broadcast budget, and at 100× span a forced broadcast OOMs an
    * executor. The frame is already persisted by [[guardInstruments]],
    * so the row count is one cached scan; at or under
    * `maxBroadcastRows` the side broadcasts (the fast path at every
    * tested scale), past it the join degrades to shuffle-hash — never
    * sort-merge, the build side is still an aggregate-sized frame —
    * exactly [[graft.text.Curation.contamination]]'s
    * broadcast→shuffle-hash fallback.
    */
  private[ops] def pairJoinSide(side: DataFrame, frameRows: Long,
                                maxBroadcastRows: Long): DataFrame =
    if (frameRows <= maxBroadcastRows) broadcast(side)
    else side.hint("shuffle_hash")

  def corrMatrix(df: DataFrame, keyCol: String, bucketCol: Column,
                 valueCol: Column, maxInstruments: Long = graft.ops.GuardBounds.MaxInstruments,
                 maxBroadcastRows: Long = 500000L): DataFrame = {
    val perKey = guardInstruments(
      bucketMeans(df, keyCol, bucketCol, valueCol), keyCol,
      maxInstruments, "corrMatrix", k => s"${k * (k - 1) / 2} pairs")
    val a = perKey.select(col(keyCol).as("key_a"), col("bucket"),
      col("x").as("xa"))
    val b = perKey.select(col(keyCol).as("key_b"), col("bucket"),
      col("x").as("xb"))
    val pairs = a.join(pairJoinSide(b, perKey.count(), maxBroadcastRows),
        Seq("bucket"))
      .filter(col("key_a") < col("key_b"))
    val sums = pairs.groupBy("key_a", "key_b")
      .agg(count(lit(1)).as("n"),
        sum(col("xa")).as("sa"), sum(col("xb")).as("sb"),
        sum((col("xa") * col("xb")).cast(DecimalType(38, 18))).as("sab"),
        sum((col("xa") * col("xa")).cast(DecimalType(38, 18))).as("saa"),
        sum((col("xb") * col("xb")).cast(DecimalType(38, 18))).as("sbb"))
    def d(c: String) = col(c).cast("double")
    val da = col("n") * d("saa") - d("sa") * d("sa")
    val db = col("n") * d("sbb") - d("sb") * d("sb")
    sums.select(col("key_a"), col("key_b"), col("n"),
      when(da > 0 && db > 0,
        round((col("n") * d("sab") - d("sa") * d("sb")) / sqrt(da * db), 6))
        .as("corr"))
  }

  /** Winsorized per-key moments: values clipped at the key's own exact
    * [pLo, pHi] interpolated percentiles before averaging — the
    * outlier-robust mean a market-data quality pipeline reports when a
    * fat-fingered tick would poison the plain mean. Two passes, both
    * key-clustered: the cut-point aggregation reduces the ticks to an
    * AGGREGATE-sized frame (exact `percentile` state is bounded by
    * distinct values per key, the q104 argument), which broadcast-joins
    * back onto the ticks for the clip + one final aggregation.
    *
    * Exactness: cut points are the interpolated percentiles fixed as
    * DECIMAL(18,8) — 8 digits because a linear interpolation between
    * two 6-dp decimals with a 2-dp interpolation fraction IS an 8-dp
    * grid value in exact arithmetic, so the double→decimal conversion
    * merely snaps an ε-off double back onto its grid point and both
    * engines land identically (rounding at 6 dp instead hits TRUE
    * .xx5 ties, where Spark's decimal-repr rounding and DuckDB's
    * binary rounding diverge — measured on this data). The clip then
    * compares decimal to decimal (no float epsilon at the boundary)
    * and the winsorized sum is an exact order-independent decimal sum;
    * doubles appear only in the final mean quotient. Clip counts use
    * the same decimal compares, so `n = n_clipped_lo + kept +
    * n_clipped_hi` exactly.
    *
    * Scale degrade (round 12): exact `percentile` state is the per-key
    * DISTINCT-VALUE set — bounded for token lengths (the q104
    * premise) but GROWING with data on continuous tick values, so past
    * `maxExactDistinct` distinct values on the hottest key the cut
    * derivation degrades onto the bottom-k quantile-sketch sample
    * ([[quantileSampleFrame]] — state k rows per key, the
    * contamination broadcast→shuffle-hash fallback pattern). The
    * sketch path needs a row identity to sample by: pass `idCol`, or
    * the guard REFUSES loudly rather than silently paying unbounded
    * state. With `sampleK` ≥ the group size the sample IS the group
    * and the cuts are bit-identical to the exact path (spec-pinned).
    */
  def winsorizedStats(df: DataFrame, keyCol: String, valueCol: Column,
                      pLo: Double = 0.01, pHi: Double = 0.99,
                      idCol: Option[String] = None,
                      maxExactDistinct: Long =
                        graft.ops.GuardBounds.MaxExactPercentileDistinct,
                      sampleK: Int = 8192): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi,
      s"need 0 <= pLo < pHi <= 1, got ($pLo, $pHi)")
    val v = valueCol.cast(DecimalType(18, 6))
    val base = df.select(col(keyCol), v.as("_v")).filter(col("_v").isNotNull)
    val hottest = base.groupBy(col(keyCol))
      .agg(count_distinct(col("_v")).as("_nd"))
      .agg(max(col("_nd"))).head().getLong(0)
    val cuts =
      if (hottest <= maxExactDistinct)
        base.groupBy(col(keyCol)).agg(
          percentile(col("_v"), lit(pLo))
            .cast(DecimalType(18, 8)).as("lo_cut"),
          percentile(col("_v"), lit(pHi))
            .cast(DecimalType(18, 8)).as("hi_cut"))
      else {
        require(idCol.nonEmpty,
          s"winsorizedStats: hottest key has $hottest distinct values > " +
            s"maxExactDistinct=$maxExactDistinct — exact percentile state " +
            s"is unbounded here; pass idCol to degrade onto the bottom-k " +
            s"quantile-sketch cuts (sampleK=$sampleK)")
        quantileSampleFrame(df.filter(valueCol.isNotNull), keyCol,
            idCol.get, valueCol, sampleK)
          .groupBy(col("grp").as(keyCol)).agg(
            percentile(col("v"), lit(pLo))
              .cast(DecimalType(18, 8)).as("lo_cut"),
            percentile(col("v"), lit(pHi))
              .cast(DecimalType(18, 8)).as("hi_cut"))
      }
    val clipped = base.join(broadcast(cuts), Seq(keyCol))
      .withColumn("_w", least(greatest(col("_v"), col("lo_cut")), col("hi_cut")))
    clipped.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum((col("_v") < col("lo_cut")).cast("long")).as("n_clipped_lo"),
        sum((col("_v") > col("hi_cut")).cast("long")).as("n_clipped_hi"),
        first(col("lo_cut")).as("lo_cut"),
        first(col("hi_cut")).as("hi_cut"),
        sum(col("_w")).as("_ws"))
      .select(col(keyCol), col("n"), col("n_clipped_lo"), col("n_clipped_hi"),
        col("lo_cut").cast("double").as("lo_cut"),
        col("hi_cut").cast("double").as("hi_cut"),
        round(col("_ws").cast("double") / col("n"), 6).as("winsorized_mean"))
  }

  /** Volume-concentration (Herfindahl–Hirschman) index per group: how
    * concentrated activity is across `keyCol` members — HHI = Σ share²
    * ∈ (1/k, 1], 1 when one member owns everything. Computed as
    * (Σ wᵢ²) / (Σ wᵢ)² so both aggregates stay EXACT integers/decimals
    * (a per-share quotient first would sum doubles, order-dependently);
    * the single final division is bit-deterministic from exact inputs,
    * hence emitted unrounded (the q107 discipline). The raw table
    * shuffles once (per-member sums); the second aggregation reshuffles
    * only the AGGREGATE-sized member frame. Zero-total groups are
    * undefined (null), not a divide-by-zero.
    */
  def concentration(df: DataFrame, groupCols: Seq[String], keyCol: String,
                    weight: Column): DataFrame = {
    require(groupCols.nonEmpty, "concentration requires a group column")
    val byKey = df
      .groupBy((groupCols :+ keyCol).map(col): _*)
      .agg(sum(weight.cast("long")).as("_w"))
    val sq = (col("_w").cast(DecimalType(19, 0)) *
      col("_w").cast(DecimalType(19, 0))).cast(DecimalType(38, 0))
    byKey.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_members"),
        sum(col("_w")).as("total_weight"),
        sum(sq).as("_sumsq"))
      .withColumn("hhi",
        when(col("total_weight") =!= 0,
          col("_sumsq").cast("double") /
            (col("total_weight").cast("double") *
              col("total_weight").cast("double"))))
      .drop("_sumsq")
  }

  /** TWAP (time-weighted average price) per group: each tick's price is
    * weighted by the microseconds until the NEXT tick in the group
    * (`lead` — one window pass), so a quote that stood for an hour
    * counts 3600× one that stood a second; the group's last tick has no
    * holding interval and drops out. Exact decimal Σ(p·Δt)/ΣΔt; groups
    * whose ticks all share one timestamp (zero total interval) are
    * excluded rather than divided by zero. The interval-weighting twin
    * of [[vwap]].
    */
  def twap(df: DataFrame, keys: Seq[String], tsCol: Column,
           tiebreak: Column, priceCol: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(tsCol.asc, tiebreak.asc)
    val p = priceCol.cast(DecimalType(18, 6))
    df.withColumn("_tu", unix_micros(tsCol))
      .withColumn("_nxt", lead(col("_tu"), 1).over(w))
      .filter(col("_nxt").isNotNull)
      .withColumn("_dt", col("_nxt") - col("_tu"))
      .groupBy(keys.map(col): _*)
      .agg(sum((p * col("_dt")).cast(DecimalType(38, 6))).as("_pdt"),
        sum(col("_dt")).as("_t"),
        count(lit(1)).as("n_intervals"))
      .filter(col("_t") > 0)
      .withColumn("twap",
        round(col("_pdt").cast("double") / col("_t").cast("double"), 6))
      .drop("_pdt", "_t")
  }

  /** Maximum drawdown per key over an ordered price series: the largest
    * peak-to-trough decline observed so far, on exact decimals end to
    * end (running peak = expanding max window — one shuffle by key, no
    * self-join, no driver state). Reported as an absolute decline plus
    * the peak it fell from, rounded for presentation.
    */
  def maxDrawdown(df: DataFrame, keyCol: String, orderCols: Seq[Column],
                  priceCol: Column): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(_.asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val p = priceCol.cast(DecimalType(18, 6))
    // priceless ticks drop first (the Risk.flowImbalance convention):
    // they cannot move the peak or the trough, and counting them in
    // n_ticks would break tick-for-tick parity with drawdownStream
    df.filter(priceCol.isNotNull)
      .withColumn("_peak", max(p).over(w))
      .withColumn("_dd", col("_peak") - p)
      .groupBy(col(keyCol))
      .agg(round(max(col("_dd")).cast("double"), 6).as("max_drawdown"),
        round(max(col("_peak")).cast("double"), 6).as("peak"),
        count(lit(1)).as("n_ticks"))
  }

  /** Per-bucket distribution stats over [[bucketByCutpoints]]. */
  def bucketStats(df: DataFrame, valueCol: String, buckets: Int): DataFrame =
    bucketByCutpoints(df, valueCol, buckets)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        min(col(valueCol)).as("lo"), max(col(valueCol)).as("hi"),
        round(sum(col(valueCol).cast(DecimalType(18, 2))).cast("double"), 2).as("total"))
      .orderBy("bucket")

  /** Per-key mean/stddev from exact decimal power sums — the reusable
    * half of [[zScoreAnomalies]], also consumable as the static side of
    * a streaming scorer. Degenerate groups (single row, zero variance)
    * have no defined z-score and are dropped — which also avoids the
    * ANSI-mode DIVIDE_BY_ZERO that (n-1) = 0 or stddev = 0 would throw.
    */
  def keyMoments(df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    val v = col(valueCol).cast(DecimalType(18, 6))
    val s1d = col("s1").cast("double")
    // clamped at 0 (the rollingStats discipline): decimal→double cast
    // rounding can push a constant-valued key's variance to -ε, whose
    // sqrt is NaN — and NaN compares GREATER than 0, so it would slip
    // the _std > 0 filter and flood the scorer with NaN z-scores
    val varExpr = greatest(lit(0.0),
      (col("s2").cast("double") - s1d * s1d / col("n")) / (col("n") - 1))
    df.filter(col(valueCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"), sum(v).as("s1"),
        sum((v * v).cast(DecimalType(38, 12))).as("s2"))
      .filter(col("n") > 1)
      .select(col(keyCol), (s1d / col("n")).as("_mean"), sqrt(varExpr).as("_std"))
      .filter(col("_std") > 0)
  }

  /** Score rows against precomputed [[keyMoments]] — broadcast join, so
    * it runs unchanged on a static frame or a live stream (no streaming
    * state; the moment table rides along to every executor).
    */
  def scoreAgainstMoments(df: DataFrame, moments: DataFrame,
                          keyCol: String, valueCol: String, idCol: String,
                          threshold: Double): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .join(broadcast(moments), keyCol)
      .withColumn("z", round((col(valueCol) - col("_mean")) / col("_std"), 4))
      .filter(abs(col("z")) >= threshold)
      .select(col(idCol), col(keyCol), col(valueCol), col("z"))

  /** Z-score outliers per group: [[keyMoments]] broadcast back onto the
    * same frame, cut applied to the ROUNDED z so the boundary is
    * engine-portable.
    */
  def zScoreAnomalies(df: DataFrame, keyCol: String, valueCol: String,
                      idCol: String, threshold: Double): DataFrame =
    scoreAgainstMoments(df, keyMoments(df, keyCol, valueCol),
      keyCol, valueCol, idCol, threshold)

  /** Static per-instrument reference levels for live-tick scoring: the
    * session VWAP, the latest EWMA (smoothed level), the latest RSI
    * (momentum regime), and [[keyMoments]]' stddev — ONE row per key,
    * broadcast-sized by construction. The static half of the
    * keyMoments/scoreAgainstMoments split applied to the market
    * analytics battery: build once on history (bounded frames, keyed
    * shuffles — nothing driver-side), broadcast onto the live stream
    * via [[scoreAgainstLevels]]. Keys without a defined level (fewer
    * than 2 ticks, zero variance, zero traded qty) drop out — they are
    * unscorable, matching keyMoments' contract.
    *
    * Deliberately four parallel subtrees (EWMA window, RSI window, VWAP
    * agg, moments agg), NOT one pre-repartitioned base: column pruning
    * gives each family a scan and shuffle of ONLY its columns (moments
    * moves 2, vwap 3), and the two aggregate families keep map-side
    * partial aggregation — a shared `repartition(key)` was measured to
    * defeat both (it shuffles raw wide rows before the partials and its
    * per-family pruned Exchanges cannot canonically match for
    * ReuseExchange). Bytes moved ≈ one wide shuffle, split across
    * narrow ones.
    */
  def keyLevels(df: DataFrame, keyCol: String, orderCols: Seq[Column],
                valueCol: String, qtyCol: Column,
                alpha: Double = 0.25, window: Int = 20,
                rsiPeriod: Int = 14): DataFrame = {
    val wLast = Window.partitionBy(col(keyCol))
      .orderBy(orderCols.map(_.desc): _*)
    def latest(d: DataFrame, c: String, as: String) =
      d.withColumn("_rn", row_number().over(wLast))
        .filter(col("_rn") === 1)
        .select(col(keyCol), col(c).as(as))
    val e = latest(ewma(df, keyCol, orderCols, col(valueCol), alpha, window),
      "ewma", "ewma_ref")
    val r = latest(rsi(df, keyCol, orderCols, col(valueCol), rsiPeriod),
      "rsi", "rsi_ref")
    val vw = vwap(df.filter(col(valueCol).isNotNull), Seq(keyCol),
        col(valueCol), qtyCol)
      .filter(col("vwap").isNotNull && col("vwap") =!= 0)
      .select(col(keyCol), col("vwap").as("vwap_ref"))
    keyMoments(df, keyCol, valueCol)
      .select(col(keyCol), col("_std"))
      .join(e, keyCol).join(r, keyCol).join(vw, keyCol)
  }

  /** Score live ticks against precomputed [[keyLevels]] — broadcast
    * join + stateless projections only, so it runs unchanged on a
    * static frame or a live stream (batch-equivalence spec'd): z vs the
    * EWMA smoothed level, percent deviation from session VWAP, and the
    * RSI regime tag; a tick surfaces when either deviation trips its
    * threshold.
    */
  def scoreAgainstLevels(df: DataFrame, levels: DataFrame, keyCol: String,
                         valueCol: String, idCol: String,
                         zThreshold: Double,
                         vwapDevPct: Double): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .join(broadcast(levels), keyCol)
      .withColumn("z_vs_ewma",
        round((col(valueCol) - col("ewma_ref")) / col("_std"), 4))
      .withColumn("vwap_dev_pct",
        round((col(valueCol) - col("vwap_ref")) / col("vwap_ref") * 100, 4))
      .withColumn("regime",
        when(col("rsi_ref") >= 70, "overbought")
          .when(col("rsi_ref") <= 30, "oversold")
          .otherwise("neutral"))
      .filter(abs(col("z_vs_ewma")) >= zThreshold ||
        abs(col("vwap_dev_pct")) >= vwapDevPct)
      .select(col(idCol), col(keyCol), col(valueCol),
        col("z_vs_ewma"), col("vwap_dev_pct"), col("regime"))

  /** Progressive conversion funnel: users counted at stage k only if
    * their first stage-k event strictly follows their first qualifying
    * stage-(k-1) event. One keyed aggregation per stage, each reusing
    * the user partitioning (Exchange reuse) — no windows over the full
    * event stream, no driver loop over stages' DATA (the fold is over
    * the stage NAMES, fixed and tiny).
    */
  def funnel(df: DataFrame, userCol: String, typeCol: String, tsCol: String,
             stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "need at least one funnel stage")
    val head = df.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("_t"))
    val perStage = stages.tail.scanLeft(head) { (prev, stage) =>
      df.filter(col(typeCol) === stage)
        .join(prev.select(col(userCol), col("_t").as("_tp")), userCol)
        .filter(col(tsCol) > col("_tp"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("_t"))
    }
    stages.zip(perStage).map { case (stage, d) =>
      d.agg(count(lit(1)).as("n_users"))
        .select(lit(stage).as("stage"), col("n_users"))
    }.reduce(_.unionAll(_))
  }

  // ─── Mergeable quantile sketch (round 12: the sketch suite's fourth
  // axis — counts CMS, distincts HLL, overlap KMV, now QUANTILES) ───

  /** The default probe grid every quantile-sketch face reports. All
    * probs are 2-dp, which is load-bearing for oracle parity: the
    * interpolation fraction p·(n−1) mod 1 then lives on a 2-dp grid,
    * so a linear interpolation between two 6-dp decimal values IS an
    * 8-dp grid value and the double→DECIMAL(18,8) snap lands both
    * engines on the same point (the q119 winsorized-cut argument).
    */
  val QuantileProbs: Seq[Double] = Seq(0.05, 0.25, 0.5, 0.75, 0.95)

  private[graft] def probName(p: Double): String =
    f"q${Math.round(p * 100)}%02d"

  /** The deterministic per-group uniform row sample every quantile
    * face consumes: bottom-`k` rows per group ranked by the md5-prefix
    * hash of the ROW ID (hashing the id, not the value, keeps the
    * sample uniform over ROWS when values repeat — hashing values
    * would sample the distinct-value set instead and bias every
    * quantile toward rare values). Ties (32-bit prefix collisions)
    * break on the id string, so the sample is a pure function of the
    * row set — order-independent, rebuild-reproducible, and the merge
    * law holds exactly as for KMV: bottom-k(A ∪ B) ⊆ bottom-k(A) ∪
    * rows(B), so a standing sample plus a batch re-ranked IS the
    * union's sample ([[appendQuantileSketch]]).
    */
  private def quantileSampleFrame(df: DataFrame, keyCol: String,
                                  idCol: String, valueCol: Column,
                                  k: Int): DataFrame = {
    val base = df.select(col(keyCol).as("grp"),
        col(idCol).cast("string").as("id"),
        valueCol.cast(DecimalType(18, 6)).as("v"))
      .filter(col("v").isNotNull)
      .withColumn("h",
        conv(substring(md5(col("id")), 1, 8), 16, 10).cast("long"))
    val byG = Window.partitionBy(col("grp"))
      .orderBy(col("h"), col("id"))
    base.withColumn("_rn", row_number().over(byG))
      .filter(col("_rn") <= k)
      .select(col("grp"), col("h"), col("id"), col("v"))
  }

  /** The estimate frame every face shares (the kmvEstimateFrame
    * discipline — ONE definition so the self-deriving sweep, the
    * persisted read path, and the audit cannot drift): re-rank
    * bottom-k (a no-op on an already-bottom-k sample), then per group
    * k_eff and the interpolated percentile of the SAMPLE at each prob,
    * snapped to the DECIMAL(18,8) grid (kept as decimal internally so
    * the audit's error column is an EXACT decimal difference, no
    * rounding ties).
    */
  private def quantileEstimateFrame(sample: DataFrame, k: Int,
                                    probs: Seq[Double]): DataFrame = {
    val byG = Window.partitionBy(col("grp")).orderBy(col("h"), col("id"))
    val bk = sample.withColumn("_rn", row_number().over(byG))
      .filter(col("_rn") <= k)
    bk.groupBy(col("grp")).agg(
      count(lit(1)).as("k_eff"),
      probs.map(p => percentile(col("v"), lit(p))
        .cast(DecimalType(18, 8)).as(probName(p) + "_d")): _*)
  }

  private def estToDouble(est: DataFrame, probs: Seq[Double]): DataFrame =
    est.select(col("grp") +: col("k_eff") +:
      probs.map(p => col(probName(p) + "_d").cast("double")
        .as(probName(p))): _*)

  /** PRODUCTION self-deriving quantile sweep: per-group sketch
    * quantile estimates `(grp, k_eff, q05..q95)` from the bottom-k
    * row sample alone. Sampling error is the binomial bound
    * √(p(1−p)/k) on the rank — ~3% of the group at k=256's median —
    * which [[quantileSketchAudit]] grades against exact `percentile`
    * on an audit cadence. Scale shape: ONE window over a (grp, h)
    * shuffle (WindowGroupLimit prunes to k per partition before the
    * shuffle), then a k-row-per-group aggregate; exact-percentile
    * state (bounded by DISTINCT VALUES per key, which GROWS with data
    * on continuous tick values — the premise that erodes at 100 TB,
    * r11 verdict missing #1) never appears.
    */
  def quantileSketch(df: DataFrame, keyCol: String, idCol: String,
                     valueCol: Column, k: Int = 256,
                     probs: Seq[Double] = QuantileProbs): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    estToDouble(
      quantileEstimateFrame(
        quantileSampleFrame(df, keyCol, idCol, valueCol, k), k, probs), probs)
  }

  /** Sketch-vs-exact audit (the q224 discipline): every sketch
    * estimate next to the exact interpolated percentile of the FULL
    * group and the EXACT decimal error `err_qXX = |est − exact|`
    * (both operands live on the 8-dp decimal grid, so the difference
    * is exact — no rounding, no .xx5 ties). Run on an audit cadence
    * to certify the k the production sweep uses on THIS distribution;
    * the exact half pays the distinct-value-bounded percentile state
    * the sketch exists to avoid, which is why it is the cadence path
    * and not the production path.
    */
  def quantileSketchAudit(df: DataFrame, keyCol: String, idCol: String,
                          valueCol: Column, k: Int = 256,
                          probs: Seq[Double] = QuantileProbs): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val base = df.select(col(keyCol).as("grp"),
        valueCol.cast(DecimalType(18, 6)).as("v"))
      .filter(col("v").isNotNull)
    val est = quantileEstimateFrame(
      quantileSampleFrame(df, keyCol, idCol, valueCol, k), k, probs)
    val exact = base.groupBy(col("grp")).agg(
      count(lit(1)).as("n"),
      probs.map(p => percentile(col("v"), lit(p))
        .cast(DecimalType(18, 8)).as("exact_" + probName(p) + "_d")): _*)
    est.join(exact, Seq("grp"))
      .select(col("grp") +: col("n") +: col("k_eff") +:
        probs.flatMap(p => Seq(
          col(probName(p) + "_d").cast("double").as(probName(p)),
          col("exact_" + probName(p) + "_d").cast("double")
            .as("exact_" + probName(p)),
          abs(col(probName(p) + "_d") - col("exact_" + probName(p) + "_d"))
            .cast("double").as("err_" + probName(p)))): _*)
  }

  /** Persist the per-group bottom-k sample — the quantile sketch's
    * OPERATIONAL lifecycle (the buildHllRegisters / buildKmvSamples
    * discipline, r11 verdict missing #1): state is ≤ k rows per group
    * on disk, appends fold a batch in WITHOUT rescanning the corpus
    * ([[appendQuantileSketch]]), and estimates read the sample file
    * alone ([[quantileFromSketch]]) — identical to the self-deriving
    * [[quantileSketch]] by construction (one shared estimate frame).
    * Layout: `samples (grp, h, id, v)` + `meta (k)`.
    */
  def buildQuantileSketch(df: DataFrame, keyCol: String, idCol: String,
                          valueCol: Column, k: Int, path: String): Unit = {
    require(k >= 2, s"k must be >= 2, got $k")
    val spark = df.sparkSession
    quantileSampleFrame(df, keyCol, idCol, valueCol, k)
      .repartition(1)
      .write.mode("overwrite").parquet(s"$path/samples")
    spark.range(1).select(lit(k).as("k"))
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  private[graft] def quantileSketchMeta(
      spark: org.apache.spark.sql.SparkSession, path: String): Int =
    spark.read.parquet(s"$path/meta").head().getInt(0)

  /** Fold a committed batch INTO the persisted sample: hash the BATCH
    * only, union with the standing ≤ k-row-per-group sample, distinct
    * (re-delivered rows collapse), re-rank bottom-k, crash-safe
    * staged rewrite ([[graft.engine.Layout.stagedReplace]]) of the
    * sample-sized file — constant standing-state work per commit plus
    * one scan of the batch. After the call the sample equals a
    * rebuild on corpus ∪ batch (spec-pinned), by the KMV merge law.
    */
  def appendQuantileSketch(spark: org.apache.spark.sql.SparkSession,
                           batch: DataFrame, keyCol: String, idCol: String,
                           valueCol: Column, path: String): Unit = {
    val k = quantileSketchMeta(spark, path)
    val merged = spark.read.parquet(s"$path/samples")
      .unionByName(quantileSampleFrame(batch, keyCol, idCol, valueCol, k))
      .distinct()
    val byG = Window.partitionBy(col("grp")).orderBy(col("h"), col("id"))
    val reRanked = merged.withColumn("_rn", row_number().over(byG))
      .filter(col("_rn") <= k)
      .select(col("grp"), col("h"), col("id"), col("v"))
    graft.engine.Layout.stagedReplace(spark, s"$path/samples") { stg =>
      reRanked.repartition(1).write.mode("overwrite").parquet(stg)
    }
  }

  /** Quantile estimates from the PERSISTED sample alone — no corpus
    * scan: the [[quantileSketch]] estimate frame fed the stored
    * sample (its internal bottom-k window is a no-op there), so the
    * output is bit-identical to the self-deriving form on the same
    * corpus and the SAME oracle gates both (the q160–q162 indexed ≡
    * inline discipline).
    */
  def quantileFromSketch(spark: org.apache.spark.sql.SparkSession,
                         path: String,
                         probs: Seq[Double] = QuantileProbs): DataFrame = {
    val k = quantileSketchMeta(spark, path)
    graft.engine.Layout.healStagedReplace(spark, s"$path/samples")
    estToDouble(
      quantileEstimateFrame(
        spark.read.parquet(s"$path/samples"), k, probs), probs)
  }

  /** Per-key interpolated percentiles with the SAME scale degrade as
    * [[winsorizedStats]] (round 12 — the r11 verdict named q46 and
    * q119 as the two exact-percentile sites whose distinct-value
    * state grows with data on continuous ticks; this closes the
    * second): below `maxExactDistinct` per-key distinct values, exact
    * `percentile` (state bounded by distinct values — the q104
    * premise); above it, the interpolated percentile of the bottom-k
    * row sample ([[quantileSampleFrame]] — k rows of state per key),
    * REFUSING loudly when no `idCol` offers a row identity to sample
    * by. With `sampleK` ≥ the key's row count the sample IS the key's
    * rows and the output is bit-identical to the exact path
    * (spec-pinned). Output: one row per key, one `pXX` double column
    * per prob, 6-dp rounded (the q46 grid).
    */
  def percentilesGuarded(df: DataFrame, keyCol: String, valueCol: Column,
                         probs: Seq[Double], idCol: Option[String] = None,
                         maxExactDistinct: Long =
                           graft.ops.GuardBounds.MaxExactPercentileDistinct,
                         sampleK: Int = 8192): DataFrame = {
    require(probs.nonEmpty, "probs must be non-empty")
    def pName(p: Double) = f"p${Math.round(p * 100)}%02d"
    val base = df.select(col(keyCol),
        valueCol.cast(DecimalType(18, 6)).as("_v"))
      .filter(col("_v").isNotNull)
    val hottest = base.groupBy(col(keyCol))
      .agg(count_distinct(col("_v")).as("_nd"))
      .agg(max(col("_nd"))).head()
    val maxDistinct = if (hottest.isNullAt(0)) 0L else hottest.getLong(0)
    def aggsOver(v: Column) = probs.map(p =>
      round(percentile(v, lit(p)), 6).as(pName(p)))
    if (maxDistinct <= maxExactDistinct) {
      val a = aggsOver(col("_v"))
      base.groupBy(col(keyCol)).agg(a.head, a.tail: _*)
    } else {
      require(idCol.nonEmpty,
        s"percentilesGuarded: hottest key has $maxDistinct distinct " +
          s"values > maxExactDistinct=$maxExactDistinct — exact " +
          s"percentile state is unbounded here; pass idCol to degrade " +
          s"onto the bottom-k sample quantiles (sampleK=$sampleK)")
      val a = aggsOver(col("v"))
      quantileSampleFrame(df.filter(valueCol.isNotNull), keyCol,
          idCol.get, valueCol, sampleK)
        .groupBy(col("grp").as(keyCol)).agg(a.head, a.tail: _*)
    }
  }

  /** Quantile drift between a CURRENT slice and a BASELINE corpus —
    * the distribution-shape axis of the drift family (q147 watches
    * bucket shares, q148 vocabulary, q149 centroids; this watches
    * WHERE the value mass sits): both sides reduce to their bottom-k
    * row-sample sketches through the ONE shared estimate frame, then
    * per group each prob reports the current estimate, the baseline
    * estimate, and the EXACT decimal shift `cur − base` (both
    * operands on the 8-dp grid — no rounding ties, oracle-exact).
    * Inner join on groups present in BOTH sides (a group appearing or
    * vanishing is q148's churn axis, not a shift). Scale shape: two
    * independent sample windows, each k·groups rows downstream —
    * never a corpus-sized join; the streaming face
    * ([[graft.streaming.EventStream.quantileDriftSink]]) runs THIS
    * operator verbatim per micro-batch.
    */
  def quantileDrift(current: DataFrame, baseline: DataFrame,
                    keyCol: String, idCol: String, valueCol: Column,
                    k: Int = 256,
                    probs: Seq[Double] = QuantileProbs): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val cur = quantileEstimateFrame(
      quantileSampleFrame(current, keyCol, idCol, valueCol, k), k, probs)
    val base = quantileEstimateFrame(
      quantileSampleFrame(baseline, keyCol, idCol, valueCol, k), k, probs)
      .select(col("grp") +: col("k_eff").as("base_k_eff") +:
        probs.map(p => col(probName(p) + "_d")
          .as("base_" + probName(p) + "_d")): _*)
    cur.join(broadcast(base), Seq("grp")) // both sides aggregate-sized
      .select(col("grp") +: col("k_eff").as("cur_k_eff") +:
        col("base_k_eff") +:
        probs.flatMap(p => Seq(
          col(probName(p) + "_d").cast("double").as("cur_" + probName(p)),
          col("base_" + probName(p) + "_d").cast("double")
            .as("base_" + probName(p)),
          (col(probName(p) + "_d") - col("base_" + probName(p) + "_d"))
            .cast("double").as("shift_" + probName(p)))): _*)
  }

  /** [[quantileDrift]] with the BASELINE side read from a PERSISTED
    * [[buildQuantileSketch]] sample file — the production monitor
    * shape: the standing corpus is never rescanned per comparison
    * (k·groups rows from disk), only the current slice derives its
    * sample fresh. Bit-identical to [[quantileDrift]] on the corpus
    * the sketch was built from (one shared estimate frame; the stored
    * sample's re-rank is a no-op) — spec-pinned, the indexed ≡ inline
    * discipline.
    */
  def quantileDriftFromSketch(spark: org.apache.spark.sql.SparkSession,
                              current: DataFrame, baselinePath: String,
                              keyCol: String, idCol: String,
                              valueCol: Column,
                              probs: Seq[Double] = QuantileProbs): DataFrame = {
    val k = quantileSketchMeta(spark, baselinePath)
    graft.engine.Layout.healStagedReplace(spark, s"$baselinePath/samples")
    val cur = quantileEstimateFrame(
      quantileSampleFrame(current, keyCol, idCol, valueCol, k), k, probs)
    val base = quantileEstimateFrame(
        spark.read.parquet(s"$baselinePath/samples"), k, probs)
      .select(col("grp") +: col("k_eff").as("base_k_eff") +:
        probs.map(p => col(probName(p) + "_d")
          .as("base_" + probName(p) + "_d")): _*)
    cur.join(broadcast(base), Seq("grp"))
      .select(col("grp") +: col("k_eff").as("cur_k_eff") +:
        col("base_k_eff") +:
        probs.flatMap(p => Seq(
          col(probName(p) + "_d").cast("double").as("cur_" + probName(p)),
          col("base_" + probName(p) + "_d").cast("double")
            .as("base_" + probName(p)),
          (col(probName(p) + "_d") - col("base_" + probName(p) + "_d"))
            .cast("double").as("shift_" + probName(p)))): _*)
  }

  /** Cohort retention: cohort = date of each user's first event;
    * a (cohort_date, day_offset) cell counts distinct users of that
    * cohort active offset days later. Two keyed shuffles (first-event
    * per user, then the cell aggregation) — the per-user firsts join
    * back co-partitioned with the groupBy that produced them.
    */
  def cohortRetention(df: DataFrame, userCol: String, tsCol: String,
                      maxOffset: Int): DataFrame = {
    val firsts = df.groupBy(col(userCol))
      .agg(to_date(min(col(tsCol))).as("cohort_date"))
    df.select(col(userCol), to_date(col(tsCol)).as("_d"))
      .join(firsts, userCol)
      .withColumn("day_offset", datediff(col("_d"), col("cohort_date")).cast("long"))
      .filter(col("day_offset") <= maxOffset)
      .groupBy("cohort_date", "day_offset")
      .agg(count_distinct(col(userCol)).as("n_users"))
      .orderBy("cohort_date", "day_offset")
  }
}
