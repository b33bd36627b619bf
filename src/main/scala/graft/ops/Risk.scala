package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Tail-risk and microstructure analytics over the tick stream — the
  * risk-desk counterpart to [[Stats]]'s return/volatility family
  * (reference anchor: the Gold statistics stage,
  * `silver_to_gold_crypto_stats.py:77-84`, computes the per-day mean
  * family; VaR/ES, Sortino, and order-flow are the standard
  * refinements a market-data platform layers on the same tick feed).
  *
  * Numeric discipline is the house rule ([[Stats.tickReturn]]): every
  * per-row value is fixed as a rounded decimal, every aggregate is an
  * exact order-independent decimal sum, and doubles appear only in the
  * final guarded presentation quotient. Plan discipline: each operator
  * is ONE shuffle wide — the partition-by-key window and the keyed
  * aggregation share their clustering, so AQE never inserts a second
  * wide exchange.
  */
object Risk {

  /** Historical Value-at-Risk and Expected Shortfall (CVaR) per key at
    * tail level `alpha`, by ORDER STATISTIC — not interpolation:
    * k = ⌈α·n⌉, VaR is the k-th smallest tick return and ES the exact
    * decimal mean of those k tail returns (the discrete/historical
    * convention; Acerbi & Tasche 2002 for ES). The order-statistic
    * definition is deliberate: it depends only on the return MULTISET,
    * so ties among equal returns cannot change the answer on any
    * cluster, and there is no interpolation arithmetic to diverge
    * between engines. k comes from an exact decimal α·n (a double
    * 0.05·n can land one ulp above the integer and ceil past it).
    *
    * Both values are reported in RETURN space (negative = loss) —
    * negating into "loss units" would manufacture a −0.0 on keys whose
    * cutoff return is exactly zero, and −0.0 vs 0.0 is a
    * representation difference, not a value difference.
    *
    * Plan: the return window, the rank-by-return window, and the
    * partition count() all partition by the key — one Exchange, three
    * Window operators riding it — then the tail filter and the final
    * keyed agg cluster on the same key. Scale: per-key state is the
    * sort of that key's returns inside its partition (Spark's external
    * window sort spills); no driver collection, no global sort.
    */
  def varCvar(df: DataFrame, keyCol: String, orderCols: Seq[Column],
              valueCol: Column, alpha: Double): DataFrame = {
    // lower bound 1e-6, not 0: alpha quantizes through DECIMAL(10,6)
    // (exactness over a double alpha*n — see below), so anything
    // smaller would round to decimal zero, make k = 0, and silently
    // emit an EMPTY result instead of the k = 1 minimum
    require(alpha >= 1e-6 && alpha < 1,
      s"alpha must be in [1e-6, 1) — it is fixed at 6 dp — got $alpha")
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(_.asc): _*)
    val byReturn = Window.partitionBy(col(keyCol)).orderBy(col("_r").asc)
    val whole = Window.partitionBy(col(keyCol))
    df.filter(valueCol.isNotNull)
      .withColumn("_r", Stats.tickReturn(w, valueCol))
      .filter(col("_r").isNotNull)
      .withColumn("_rn", row_number().over(byReturn))
      .withColumn("_n", count(lit(1)).over(whole))
      .withColumn("_k",
        ceil(lit(alpha).cast(DecimalType(10, 6)) * col("_n")).cast("long"))
      .filter(col("_rn") <= col("_k"))
      .groupBy(col(keyCol))
      .agg(max(col("_n")).as("n_returns"),
        max(col("_k")).as("_kk"),
        max(col("_r")).as("_var"),
        sum(col("_r")).as("_tail"))
      .select(col(keyCol), col("n_returns"),
        round(col("_var").cast("double"), 9).as("var_return"),
        round(col("_tail").cast("double") / col("_kk"), 9).as("es_return"))
  }

  /** Sortino ratio per key: mean(r) / downside deviation, where the
    * downside deviation is √(Σ min(r,0)² / n) against a zero target
    * (Sortino & Price 1994) — the Sharpe variant that only penalizes
    * losses, so a right-skewed book isn't punished for upside. Same
    * single-aggregation shape as [[Stats.sharpe]]: n, Σr, Σ(r⁻)² as
    * exact decimal power sums ((16,9)² = (33,18) fits precision 38
    * exactly), doubles only in the final guarded quotients. Keys with
    * no losing tick have zero downside deviation ⇒ NULL ratio, not a
    * division blow-up.
    */
  def sortino(df: DataFrame, keyCol: String, orderCols: Seq[Column],
              valueCol: Column): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(_.asc): _*)
    val down = when(col("_r") < 0, col("_r"))
      .otherwise(lit(0).cast(DecimalType(16, 9)))
    val sums = df.filter(valueCol.isNotNull)
      .withColumn("_r", Stats.tickReturn(w, valueCol))
      .filter(col("_r").isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_returns"),
        sum(col("_r")).as("_s1"),
        sum((down * down).cast(DecimalType(38, 18))).as("_sd2"))
    val mean = col("_s1").cast("double") / col("n_returns")
    val dd = sqrt(col("_sd2").cast("double") / col("n_returns"))
    sums.select(col(keyCol), col("n_returns"),
      round(mean, 9).as("mean_return"),
      round(dd, 9).as("downside_dev"),
      when(col("_sd2") > 0, round(mean / dd, 6)).as("sortino"))
  }

  /** The Lee-Ready tick-rule sign over a key window: +1 on an uptick,
    * −1 on a downtick, a zero tick inherits the last non-zero change
    * (`last(..ignoreNulls..)`), NULL until any non-zero change exists.
    * Shared by [[flowImbalance]] and [[kyleLambda]] so the carry
    * semantics cannot drift between them. Callers must have dropped
    * null-priced rows first — a NULL price would otherwise produce a
    * NULL change, inherit a stale sign, and classify a priceless tick.
    */
  private def tickRuleSign(w: org.apache.spark.sql.expressions.WindowSpec,
                           v: Column): Column = {
    val dv = v - lag(v, 1).over(w)
    last(when(dv > 0, 1).when(dv < 0, -1), ignoreNulls = true)
      .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
  }

  /** Order-flow imbalance per (key, bucket) by the TICK RULE (Lee &
    * Ready 1991's price test): each tick is signed by its price change —
    * uptick buys, downtick sells — and a zero tick inherits the sign of
    * the last non-zero change ([[tickRuleSign]]; no sign yet ⇒ the tick
    * is unclassifiable and drops, like an undefined first return).
    * Null-priced ticks are dropped BEFORE the sign windows — they carry
    * no price information, must not be classified by a stale sign, and
    * [[graft.streaming.EventStream.flowImbalanceStream]] filters them
    * identically, so the batch/stream prefix-equality law holds on
    * feeds with missing prices. OFI = Σ(sign·qty) / Σqty ∈
    * [−1, 1] — the classic buy/sell pressure proxy when the feed has no
    * side flag. Quantities sum as exact decimals (a LONG qty stream at
    * 100 TB overflows int64 partial sums); the imbalance quotient is
    * the only double. One Exchange: sign windows and the (key, bucket)
    * aggregation all cluster by key.
    */
  def flowImbalance(df: DataFrame, keyCol: String, orderCols: Seq[Column],
                    valueCol: Column, qtyCol: Column,
                    bucketCol: Column): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(_.asc): _*)
    val v = valueCol.cast(DecimalType(18, 6))
    df.filter(valueCol.isNotNull)
      .withColumn("_sgn", tickRuleSign(w, v))
      .withColumn("_q", qtyCol.cast(DecimalType(28, 6)))
      .filter(col("_sgn").isNotNull && col("_q").isNotNull)
      .withColumn("_b", bucketCol)
      .groupBy(col(keyCol), col("_b").as("bucket"))
      // sign applied via CASE, not multiplication: int × DECIMAL(28,6)
      // wants precision 39 and Spark would silently narrow it back to 38
      .agg(count(lit(1)).as("n_ticks"),
        sum(when(col("_sgn") === 1, col("_q")).otherwise(-col("_q")))
          .as("_signed"),
        sum(col("_q")).as("_total"))
      .select(col(keyCol), col("bucket"), col("n_ticks"),
        round(col("_signed").cast("double"), 6).as("signed_qty"),
        round(col("_total").cast("double"), 6).as("total_qty"),
        when(col("_total") > 0,
          round(col("_signed").cast("double") /
            col("_total").cast("double"), 6)).as("ofi"))
  }

  /** Event study per (key, horizon): for every tick where `signal`
    * fires on the tick return, the forward return h ticks ahead —
    * n_events, exact-decimal mean forward return, and the hit rate
    * (fraction positive) — the MacKinlay 1997 shape that answers "did
    * the signal predict anything", run against the same alert
    * primitives the anomaly/level queries emit. `signal` receives the
    * per-row tick-return column so return-based triggers (spikes,
    * reversals) express naturally; rows whose forward window runs off
    * the series drop, exactly like undefined returns.
    *
    * Plan: the return column, every horizon's forward return (lead
    * over the SAME window spec — one Window operator), the
    * horizon-stack explode, and the (key, horizon) aggregation all
    * ride ONE hash(key) Exchange (the [[volCone]] stack argument).
    */
  def eventStudy(df: DataFrame, keyCol: String, orderCols: Seq[Column],
                 valueCol: Column, horizons: Seq[Int],
                 signal: Column => Column): DataFrame = {
    require(horizons.nonEmpty && horizons.forall(_ >= 1) &&
      horizons.distinct.size == horizons.size,
      s"horizons must be positive and distinct, got $horizons")
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(_.asc): _*)
    val v = valueCol.cast(DecimalType(18, 6))
    val withFwd = horizons.foldLeft(
      df.filter(valueCol.isNotNull)
        .withColumn("_r", Stats.tickReturn(w, valueCol))
    ) { (acc, h) =>
      val fv = lead(v, h).over(w)
      acc.withColumn(s"_f$h", when(fv.isNotNull && v > 0,
        round((fv - v).cast("double") / v.cast("double"), 9)
          .cast(DecimalType(16, 9))))
    }
    withFwd
      .filter(signal(col("_r")))
      .select(col(keyCol), explode(array(horizons.map(h =>
        struct(lit(h).as("horizon"), col(s"_f$h").as("fwd"))): _*)).as("_z"))
      .select(col(keyCol), col("_z.horizon").as("horizon"),
        col("_z.fwd").as("_fwd"))
      .filter(col("_fwd").isNotNull)
      .groupBy(col(keyCol), col("horizon"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("_fwd")).as("_s"),
        count(when(col("_fwd") > 0, 1)).as("_hits"))
      .select(col(keyCol), col("horizon"), col("n_events"),
        round(col("_s").cast("double") / col("n_events"), 9)
          .as("mean_fwd_return"),
        round(col("_hits").cast("double") / col("n_events"), 6)
          .as("hit_rate"))
  }

  /** Kyle's lambda per key: the slope of price change on signed volume —
    * Δpₜ = λ·(signₜ·qₜ) + ε (Kyle 1985), THE price-impact coefficient a
    * desk uses to cost a parent order. Signs come from the same tick
    * rule as [[flowImbalance]] ([[tickRuleSign]] — zero ticks inherit
    * the last non-zero sign; unsignable and null-priced ticks drop,
    * the latter BEFORE the windows so a stale sign never classifies a
    * priceless row). Both regression inputs are fixed as
    * DECIMAL(16,6) — that caps |Δp| and qty at 10¹⁰, which on real
    * data is corrupt input and ANSI-fails loudly, while keeping the
    * cross product at (33,12), exactly inside precision 38 (the
    * [[Stats.tickReturn]] sizing argument) — so the five power sums
    * are exact and order-independent; λ is the one double quotient.
    * One Exchange: sign windows and the keyed agg cluster on the key.
    */
  def kyleLambda(df: DataFrame, keyCol: String, orderCols: Seq[Column],
                 valueCol: Column, qtyCol: Column): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(_.asc): _*)
    val v = valueCol.cast(DecimalType(18, 6))
    val dv = (v - lag(v, 1).over(w)).cast(DecimalType(16, 6))
    val sums = df.filter(valueCol.isNotNull)
      .withColumn("_dp", dv)
      .withColumn("_sgn", tickRuleSign(w, v))
      .withColumn("_q", qtyCol.cast(DecimalType(16, 6)))
      .filter(col("_dp").isNotNull && col("_sgn").isNotNull &&
        col("_q").isNotNull)
      .withColumn("_x",
        when(col("_sgn") === 1, col("_q")).otherwise(-col("_q")))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_ticks"),
        sum(col("_dp")).as("_sy"), sum(col("_x")).as("_sx"),
        sum((col("_x") * col("_dp")).cast(DecimalType(38, 12))).as("_sxy"),
        sum((col("_x") * col("_x")).cast(DecimalType(38, 12))).as("_sxx"))
    def d(c: String) = col(c).cast("double")
    val den = col("n_ticks") * d("_sxx") - d("_sx") * d("_sx")
    sums.select(col(keyCol), col("n_ticks"),
      when(col("n_ticks") >= 2 && den > 0,
        round((col("n_ticks") * d("_sxy") - d("_sx") * d("_sy")) / den, 9))
        .as("kyle_lambda"))
  }

  /** Roll's implied effective spread per key: 2·√(−cov₁(Δp)) where cov₁
    * is the lag-1 autocovariance of price changes (Roll 1984) — the
    * bid-ask bounce estimator that recovers a spread from trade prices
    * alone. A POSITIVE autocovariance means the model doesn't apply
    * (trending microstructure), so the spread is NULL while the
    * autocovariance is still reported. Price changes fix as
    * DECIMAL(16,6) (the [[kyleLambda]] domain cap), consecutive-pair
    * products as exact (33,12) decimals; population covariance over the
    * pairs, doubles only at the end. One Exchange for both lag windows
    * and the keyed aggregation.
    */
  def rollSpread(df: DataFrame, keyCol: String, orderCols: Seq[Column],
                 valueCol: Column): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(_.asc): _*)
    val v = valueCol.cast(DecimalType(18, 6))
    val dv = (v - lag(v, 1).over(w)).cast(DecimalType(16, 6))
    // null-priced rows drop BEFORE the lag chain: a NULL price would
    // void two consecutive Δp values instead of differencing across it
    val sums = df.filter(valueCol.isNotNull)
      .withColumn("_dp", dv)
      .withColumn("_dpp", lag(col("_dp"), 1).over(w))
      .filter(col("_dp").isNotNull && col("_dpp").isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("_dp")).as("_sa"), sum(col("_dpp")).as("_sb"),
        sum((col("_dp") * col("_dpp")).cast(DecimalType(38, 12))).as("_sab"))
    def d(c: String) = col(c).cast("double")
    val cov = (d("_sab") - d("_sa") * d("_sb") / col("n_pairs")) /
      col("n_pairs")
    sums.select(col(keyCol), col("n_pairs"),
      round(cov, 9).as("dp_autocov"),
      when(cov < 0, round(lit(2.0) * sqrt(-cov), 6)).as("roll_spread"))
  }

  /** Lo-MacKinlay variance ratio per key: VR(q) = Var(r_q) / (q·Var(r₁))
    * over OVERLAPPING q-period returns (Lo & MacKinlay 1988) — the
    * random-walk diagnostic: VR ≈ 1 under a random walk, > 1 when
    * returns trend (positive serial correlation compounds), < 1 when
    * they mean-revert. The q-period return is a rolling window sum of
    * the 1-period decimal returns, fixed as DECIMAL(18,9) — wider than
    * tickReturn's (16,9) because the sum's true range is q× the
    * single-return cap (a (16,9) recap would ANSI-fail on legal input
    * at q·10⁷), and 18 is the widest scale-9 type whose square (37,18)
    * still fits precision 38 exactly; both variances come from exact power
    * sums gathered in ONE aggregation (n, Σr, Σr², m, Σr_q, Σr_q²),
    * population form. One Exchange: the return window, the rolling-sum
    * window, and the keyed agg all cluster by key. Degenerate keys
    * (fewer than q+1 returns, or zero 1-period variance) yield NULL.
    */
  def varianceRatio(df: DataFrame, keyCol: String, orderCols: Seq[Column],
                    valueCol: Column, q: Int): DataFrame = {
    require(q >= 2, s"q must be >= 2, got $q")
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(_.asc): _*)
    val rFrame = w.rowsBetween(-(q - 1), Window.currentRow)
    val withR = df.filter(valueCol.isNotNull)
      .withColumn("_r", Stats.tickReturn(w, valueCol))
      .filter(col("_r").isNotNull)
      .withColumn("_nq", count(col("_r")).over(rFrame))
      .withColumn("_rq", when(col("_nq") === q,
        sum(col("_r")).over(rFrame).cast(DecimalType(18, 9))))
    val sums = withR.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_returns"),
        sum(col("_r")).as("_s1"),
        sum((col("_r") * col("_r")).cast(DecimalType(38, 18))).as("_s2"),
        count(col("_rq")).as("n_q"),
        sum(col("_rq")).as("_t1"),
        sum((col("_rq") * col("_rq")).cast(DecimalType(38, 18))).as("_t2"))
    def d(c: String) = col(c).cast("double")
    val var1 = d("_s2") / col("n_returns") -
      (d("_s1") / col("n_returns")) * (d("_s1") / col("n_returns"))
    val varQ = d("_t2") / col("n_q") -
      (d("_t1") / col("n_q")) * (d("_t1") / col("n_q"))
    sums.select(col(keyCol), col("n_returns"), col("n_q"),
      when(col("n_q") >= 2 && var1 > 0,
        round(varQ / (lit(q) * var1), 6)).as("variance_ratio"))
  }

  /** Cross-sectional momentum rank: each key's bucket return (close
    * over open, by deterministic first/last tick like
    * [[Windows.ohlcBars]]) ranked ACROSS keys within the bucket —
    * winners-vs-losers decile membership, the Jegadeesh & Titman 1993
    * sort that portfolio-formation pipelines run nightly. Rank is
    * row_number with the key as tiebreak (fully deterministic), decile
    * is pure integer arithmetic ((rank−1)·10 ÷ n + 1 — no ntile, whose
    * tie placement is engine-defined). Two shuffles by NATURE, not
    * waste: the first/last picks cluster by key, the cross-sectional
    * rank clusters by bucket — a transpose. The second exchange moves
    * one row per (key, bucket), i.e. the aggregated frame, not ticks.
    */
  def momentumRank(df: DataFrame, keyCol: String, orderCols: Seq[Column],
                   valueCol: Column, bucketCol: Column): DataFrame = {
    // the open/close extraction IS the OHLC first/last pick — reuse it
    // (one source of truth for the deterministic tick tiebreak); the
    // cast to decimal commutes with picking, since the pick is decided
    // by the time order alone
    val bars = Stats.ohlcBars(
        df.filter(valueCol.isNotNull).withColumn("_mv", valueCol),
        Seq(keyCol), bucketCol, orderCols, "_mv")
      .select(col(keyCol), col("bar").as("bucket"),
        col("open").cast(DecimalType(18, 6)).as("_open"),
        col("close").cast(DecimalType(18, 6)).as("_close"))
      .filter(col("_open") > 0)
      .withColumn("_ret",
        round((col("_close") - col("_open")).cast("double") /
          col("_open").cast("double"), 9).cast(DecimalType(16, 9)))
    val xs = Window.partitionBy(col("bucket"))
      .orderBy(col("_ret").desc, col(keyCol).asc)
    val nw = Window.partitionBy(col("bucket"))
    bars
      .withColumn("rank_in_bucket", row_number().over(xs))
      .withColumn("n_keys", count(lit(1)).over(nw))
      .select(col("bucket"), col(keyCol),
        col("_ret").cast("double").as("bucket_return"),
        col("rank_in_bucket"), col("n_keys"),
        // floor, not a bare int cast: Spark's double->int cast truncates
        // while DuckDB's rounds — floor() agrees everywhere
        (floor(((col("rank_in_bucket") - 1) * 10) / col("n_keys")) + 1)
          .cast("int").as("decile"))
  }

  /** Equal-weight portfolio NAV over the bucket frame: each bucket's
    * portfolio return is the equal-weight mean of the per-key
    * close-over-open returns ([[momentumRank]]'s bar path), and the
    * NAV compounds them as exp(Σ ln(1+r̄)) — the log-sum form because a
    * running PRODUCT of decimals has no exact distributed shape, while
    * a running SUM of decimal-fixed ln values does (each ln rounded to
    * 12 dp and fixed as DECIMAL(16,12), so the cumulative sum is exact
    * and order-independent; exp only at presentation). The cumulative
    * window is deliberately UNPARTITIONED: it runs over the aggregated
    * bucket frame, whose row count is bounded by the calendar (days,
    * not ticks — ~10⁴ rows for decades), never the tick stream; the
    * tick-scale work is the same two-Exchange bar transpose as
    * [[momentumRank]]. Buckets where every instrument return is
    * undefined drop; a bucket return of exactly −100% (NAV wiped to
    * zero) yields NULL ln ⇒ NULL NAV from that bucket on, loudly.
    *
    * Round 12: the compared NAV column is `log_nav` — the EXACT
    * decimal cumulative Σ ln(1+r̄) — not exp of it. The sf0.1 sweep
    * caught why: compounded synthetic returns reach NAV ≈ 2·10¹¹,
    * where a double's ulp (~3·10⁻⁵) exceeds any absolute rounding
    * grid, so the JVM-vs-libm exp disagreement survives rounding (the
    * q184 12-dp rule only works for O(1) values). log_nav is a sum of
    * 12-dp decimals — exact, order-independent, portable; NAV = e^x
    * at presentation. `nav` (exp, rounded 6 dp) remains for small-
    * magnitude uses and the wipeout-NULL contract but is derived, not
    * the portable column.
    */
  def portfolioNav(df: DataFrame, keyCol: String, orderCols: Seq[Column],
                   valueCol: Column, bucketCol: Column): DataFrame = {
    val bars = Stats.ohlcBars(
        df.filter(valueCol.isNotNull).withColumn("_mv", valueCol),
        Seq(keyCol), bucketCol, orderCols, "_mv")
      .select(col(keyCol), col("bar").as("bucket"),
        col("open").cast(DecimalType(18, 6)).as("_open"),
        col("close").cast(DecimalType(18, 6)).as("_close"))
      .filter(col("_open") > 0)
      .withColumn("_ret",
        round((col("_close") - col("_open")).cast("double") /
          col("_open").cast("double"), 9).cast(DecimalType(16, 9)))
    val daily = bars.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_keys"), sum(col("_ret")).as("_sr"))
      .withColumn("_pr",
        round(col("_sr").cast("double") / col("n_keys"), 9)
          .cast(DecimalType(16, 9)))
      .withColumn("_lnr", when(col("_pr") > -1,
        round(log(lit(1.0) + col("_pr").cast("double")), 12)
          .cast(DecimalType(16, 12))))
    val cum = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("_hasNull", max(col("_lnr").isNull.cast("int")).over(cum))
      .withColumn("_cln", sum(col("_lnr")).over(cum))
      .select(col("bucket"), col("n_keys"),
        col("_pr").cast("double").as("port_return"),
        // the portable column: exact decimal Σ ln(1+r̄) (see scaladoc)
        when(col("_hasNull") === 0,
          col("_cln").cast("double")).as("log_nav"),
        when(col("_hasNull") === 0,
          round(exp(col("_cln").cast("double")), 6)).as("nav"))
  }

  /** Intraday seasonality profile per (key, hour-of-day): tick count,
    * mean |return| (the U-shaped volatility smile every venue shows at
    * open/close), and the hour's share of the key's total traded
    * quantity. Return magnitudes and quantities aggregate as exact
    * decimal sums; the share divides by a per-key total computed with a
    * window over the ALREADY-AGGREGATED frame (keys × 24 rows — the
    * second window is over a tiny frame, not the tick stream). One wide
    * Exchange by key for returns + the keyed agg; the share window
    * re-partitions only the 24-row-per-key result. `tsCol` is the
    * explicit hour source — unlike the sibling operators, this one
    * needs a timestamp, and inferring it from the ordering tuple would
    * silently bucket garbage for a caller ordering by (id, ts).
    */
  def intradayProfile(df: DataFrame, keyCol: String, orderCols: Seq[Column],
                      tsCol: Column, valueCol: Column,
                      qtyCol: Column): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(_.asc): _*)
    val hourly = df.filter(valueCol.isNotNull)
      .withColumn("_r", Stats.tickReturn(w, valueCol))
      .withColumn("_q", qtyCol.cast(DecimalType(28, 6)))
      .withColumn("_h", hour(tsCol))
      .groupBy(col(keyCol), col("_h").as("hour_of_day"))
      .agg(count(lit(1)).as("n_ticks"),
        count(col("_r")).as("_nr"),
        sum(abs(col("_r"))).as("_sar"),
        sum(col("_q")).as("_sq"))
    val keyTotal = Window.partitionBy(col(keyCol))
    hourly
      .withColumn("_tq", sum(col("_sq")).over(keyTotal))
      .select(col(keyCol), col("hour_of_day"), col("n_ticks"),
        when(col("_nr") > 0,
          round(col("_sar").cast("double") / col("_nr"), 9))
          .as("mean_abs_return"),
        when(col("_tq") > 0,
          round(col("_sq").cast("double") / col("_tq").cast("double"), 6))
          .as("qty_share"))
  }

  /** Pairs-trading spread monitor: for every unordered instrument pair,
    * an OLS hedge of a on b over bucket-aligned mean values (the
    * [[Stats.corrMatrix]] alignment), then the z-score of the LATEST
    * bucket's residual spread a − (α + β·b) against the fit's residual
    * σ = √(RSS/(n−2)) — the Gatev et al. 2006 divergence signal that
    * decides when a pair trade opens. Everything after the one
    * tick-level aggregation runs on the buckets × k frame; the pair
    * expansion is a broadcast self-join of that aggregate, and ALL pair
    * statistics — the five power sums AND the latest bucket's values
    * (max_by over the unique-bucket frame, tie-free by construction) —
    * come out of ONE grouped aggregation. RSS uses the closed form
    * Saa_c − β·Sab_c, so no second pass over residuals. Doubles appear
    * only after the exact decimal sums; degenerate pairs (n < 3, flat
    * b leg, or a perfect fit) yield NULL z rather than a blow-up.
    *
    * Guarded: the pair expansion is k(k−1)/2 in INSTRUMENT count (flat
    * in tick count — BASELINE.md's measured envelope), so past
    * `maxInstruments` keys the operator refuses with the count named
    * instead of silently broadcasting a quadratic frame — the
    * refuse-don't-melt posture of [[graft.vector.Similarity.semanticDedup]]
    * / knnGraphBucketed, matching [[Stats.corrMatrix]]. The BUCKET
    * axis (calendar span × keys) is guarded separately: past
    * `maxBroadcastRows` frame rows the pair join falls back
    * broadcast→shuffle-hash ([[Stats.pairJoinSide]]).
    */
  def pairSpread(df: DataFrame, keyCol: String, bucketCol: Column,
                 valueCol: Column, zThreshold: Double = 2.0,
                 maxInstruments: Long = 2000L,
                 maxBroadcastRows: Long = 500000L): DataFrame = {
    val perKey = Stats.guardInstruments(
      Stats.bucketMeans(df.filter(valueCol.isNotNull), keyCol, bucketCol,
        valueCol),
      keyCol, maxInstruments, "pairSpread",
      k => s"${k * (k - 1) / 2} pairs")
    val a = perKey.select(col(keyCol).as("key_a"), col("bucket"),
      col("x").as("xa"))
    val b = perKey.select(col(keyCol).as("key_b"), col("bucket"),
      col("x").as("xb"))
    val sums = a.join(
        Stats.pairJoinSide(b, perKey.count(), maxBroadcastRows), Seq("bucket"))
      .filter(col("key_a") < col("key_b"))
      .groupBy("key_a", "key_b")
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("xa")).as("sa"), sum(col("xb")).as("sb"),
        sum((col("xa") * col("xb")).cast(DecimalType(38, 18))).as("sab"),
        sum((col("xa") * col("xa")).cast(DecimalType(38, 18))).as("saa"),
        sum((col("xb") * col("xb")).cast(DecimalType(38, 18))).as("sbb"),
        max(col("bucket")).as("last_bucket"),
        max_by(col("xa"), col("bucket")).as("_la"),
        max_by(col("xb"), col("bucket")).as("_lb"))
    def d(c: String) = col(c).cast("double")
    val n = col("n_buckets")
    val sbbC = d("sbb") - d("sb") * d("sb") / n
    val sabC = d("sab") - d("sa") * d("sb") / n
    val saaC = d("saa") - d("sa") * d("sa") / n
    val beta = sabC / sbbC
    val alpha = (d("sa") - beta * d("sb")) / n
    val rss = saaC - beta * sabC
    val sigma = sqrt(rss / (n - 2))
    val lastZ = (d("_la") - alpha - beta * d("_lb")) / sigma
    sums.select(col("key_a"), col("key_b"), n, col("last_bucket"),
      when(n >= 3 && sbbC > 0, round(beta, 6)).as("beta"),
      when(n >= 3 && sbbC > 0, round(alpha, 6)).as("alpha"),
      when(n >= 3 && sbbC > 0 && rss > 0, round(lastZ, 6)).as("last_z"),
      when(n >= 3 && sbbC > 0 && rss > 0,
        (abs(lastZ) >= zThreshold).cast("int")).as("diverged"))
  }

  /** Lead-lag cross-correlation per instrument pair: Pearson corr of
    * a's bucket-mean RETURN against b's return ℓ buckets earlier, for
    * every ℓ ∈ −maxLag..maxLag, reporting each pair's best lag — the
    * price-discovery question ("which leg moves first") behind the
    * lead-lag literature (Hayashi-Yoshida 2005's problem in its
    * synchronized-grid form; cf. de Jong & Nijman 1997). A positive
    * `best_lag` means the LARGER key (key_b) leads by that many
    * observed buckets; negative means key_a leads; 0 means they move
    * together. Lags count each key's OWN observed buckets (the SQL
    * `lag(r, ℓ)` convention — calendar gaps are not interpolated).
    *
    * Scale posture: ticks reduce once to the bucket-mean frame (the
    * shared [[Stats.bucketMeans]] alignment); returns are decimal
    * DIFFERENCES of that frame rounded to the 6-dp grid (Pearson is
    * scale-invariant, so differences carry the same correlation as pct
    * returns without a division; the 6-dp fix keeps every product
    * inside precision 38 — exact in both engines); the lag stack rides
    * ONE window pass (an array of lag
    * exprs over the same spec); and the pair expansion broadcast-joins
    * aggregate-sized frames with all (pair, lag) power sums from one
    * grouped aggregation. Exact decimal sums, doubles only in the
    * final guarded quotient (the q106 discipline). The best lag per
    * pair is a deterministic argmax: |corr| desc, then |lag| asc, then
    * lag asc, on the 6-dp-rounded corr both engines agree on.
    * Degenerate (pair, lag) cells — under 3 co-observations or a
    * constant side — drop before the argmax; a pair with no defined
    * cell at any lag is absent.
    *
    * Guarded like [[pairSpread]]: k(k−1)/2 · (2·maxLag+1) cells, so
    * past `maxInstruments` keys the operator refuses with the count
    * named; on the BUCKET axis the exploded lag frame (span × keys ×
    * (maxLag+1) rows) falls back broadcast→shuffle-hash past
    * `maxBroadcastRows` ([[Stats.pairJoinSide]]).
    *
    * Cost-ceiling ADVISORY (not a refusal — the shuffle-hash fallback
    * completes; measured 124 s for a ~1.9B-row stack at 100× span):
    * before launching the pair join the operator projects its
    * intermediate row count, `returns × keys × (maxLag+1)` — the
    * per-bucket k² blowup summed over the span — and past
    * `adviseStackRows` reports it through `advisor` (default: one
    * stderr line) with the contributing axes named, so an operator
    * launching a span×keys combination with a nine-figure stack knows
    * the bill BEFORE the stages run and can narrow the span, thin the
    * universe, or accept the cost deliberately. The projection reuses
    * the guard's cached key count and the frame count the join-side
    * budget already needs — the advisory itself launches no job.
    */
  def leadLagCorr(df: DataFrame, keyCol: String, bucketCol: Column,
                  valueCol: Column, maxLag: Int = 3,
                  maxInstruments: Long = 2000L,
                  maxBroadcastRows: Long = 500000L,
                  adviseStackRows: Long = 100000000L,
                  advisor: String => Unit =
                    m => System.err.println(s"[advise] $m")): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val perKey = Stats.bucketMeans(df.filter(valueCol.isNotNull), keyCol,
      bucketCol, valueCol)
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket").asc)
    // Return = bucket-mean difference ROUNDED TO 6 DP and fixed as
    // DECIMAL(18,6) — not the raw (22,9) difference: a (22,9)² product
    // needs precision 45, which Spark silently truncates to scale 11
    // while DuckDB routes through doubles (the repo's measured
    // decimal-parity hazard), and q144's argmax would amplify any
    // sub-6dp divergence into a whole-row flip. (18,6)² = (37,12) is
    // EXACT in both engines; the 6-dp return grid is the operator's
    // defined statistic (rounding a decimal is itself exact and
    // engine-identical). DOMAIN CEILING — a stated contract, like
    // tickReturn's 1e7 input cap: (18,6) holds 12 integer digits, and
    // a return is the DIFFERENCE of two bucket means each up to ~1e12
    // (bucketMeans' documented range), so a per-return magnitude past
    // ~5e11 can ANSI-overflow this cast on valid extreme data.
    // Widening is deliberately NOT free: (18,6) was sized so the
    // squared product (37,12) stays inside precision 38 — a wider
    // return type reopens the silent-truncation hazard the 6-dp grid
    // exists to close. Series whose LEVELS exceed ~5e11 per bucket
    // step should be rescaled (or converted to pct returns) upstream.
    // The frame persists because it feeds BOTH pair
    // sides (the banded-LSH compute-once convention) — the guard count
    // doubles as materializer and counts exactly the keys that can
    // enter the pair join (a key needs >= 2 buckets to have a return).
    val (rets, nKeys) = Stats.guardInstrumentsCounted(
      perKey
        .withColumn("r", round(col("x") - lag(col("x"), 1).over(w), 6)
          .cast(DecimalType(18, 6)))
        .filter(col("r").isNotNull),
      keyCol, maxInstruments, "leadLagCorr",
      k => s"${k * (k - 1) / 2 * (2 * maxLag + 1)} pair-lag cells")
    val nRets = rets.count() // cached scan; reused as the join-side budget
    // stack projection: each return row meets every key's (maxLag+1)
    // lagged returns in its bucket ⇒ ~ nRets × keys × (maxLag+1) cells
    val projected = nRets * nKeys * (maxLag + 1)
    if (projected > adviseStackRows) advisor(
      s"leadLagCorr: projected lag-stack ~$projected rows " +
        s"($nRets returns × $nKeys keys × ${maxLag + 1} lags; " +
        s"adviseStackRows=$adviseStackRows) — the shuffle-hash join " +
        "completes but is the family's cost ceiling; narrow the " +
        "calendar span or the instrument universe if unintended")
    // leader side: returns at lags 0..maxLag — the lag columns ride ONE
    // Window operator (same spec), then the stack explodes map-side
    // (generators cannot hold window exprs directly)
    val withLags = rets.select(col(keyCol) +: col("bucket") +: col("r") +:
      (1 to maxLag).map(l => lag(col("r"), l).over(w).as(s"_l$l")): _*)
    val lagged = withLags.select(col(keyCol).as("key_b"), col("bucket"),
      explode(array((0 to maxLag).map { l =>
        struct(lit(l).as("l"),
          (if (l == 0) col("r") else col(s"_l$l")).as("rb"))
      }: _*)).as("e"))
      .select(col("key_b"), col("bucket"),
        col("e.l").as("l"), col("e.rb").as("rb"))
      .filter(col("rb").isNotNull)
    val a = rets.select(col(keyCol).as("key_a"), col("bucket"),
      col("r").as("ra"))
    // ordered (follower=key_a, leader=key_b); ℓ=0 kept once per pair.
    // The lagged side is the return frame exploded ×(maxLag+1), so its
    // broadcast budget is counted at that multiplier off the persisted
    // frame (one cached scan — the contamination fallback pattern).
    val cells = a.join(
        Stats.pairJoinSide(lagged, nRets * (maxLag + 1),
          maxBroadcastRows), Seq("bucket"))
      .filter(col("key_a") =!= col("key_b"))
      .filter(col("l") > 0 || col("key_a") < col("key_b"))
      .groupBy("key_a", "key_b", "l")
      .agg(count(lit(1)).as("n"),
        sum(col("ra")).as("sa"), sum(col("rb")).as("sb"),
        // (18,6)² = (37,12): the product itself is exact — the cast
        // only widens for the sum, never truncates
        sum((col("ra") * col("rb")).cast(DecimalType(38, 12))).as("sab"),
        sum((col("ra") * col("ra")).cast(DecimalType(38, 12))).as("saa"),
        sum((col("rb") * col("rb")).cast(DecimalType(38, 12))).as("sbb"))
    def d(c: String) = col(c).cast("double")
    val da = col("n") * d("saa") - d("sa") * d("sa")
    val db = col("n") * d("sbb") - d("sb") * d("sb")
    val scored = cells
      .withColumn("corr", when(col("n") >= 3 && da > 0 && db > 0,
        round((col("n") * d("sab") - d("sa") * d("sb")) / sqrt(da * db), 6)))
      .filter(col("corr").isNotNull)
      .select(least(col("key_a"), col("key_b")).as("ka"),
        greatest(col("key_a"), col("key_b")).as("kb"),
        when(col("key_a") < col("key_b"), col("l"))
          .otherwise(-col("l")).as("lag"),
        col("n"), col("corr"))
    val rank = Window.partitionBy(col("ka"), col("kb"))
      .orderBy(abs(col("corr")).desc, abs(col("lag")).asc, col("lag").asc)
    scored.withColumn("_rn", row_number().over(rank))
      .filter(col("_rn") === 1)
      .select(col("ka").as("key_a"), col("kb").as("key_b"),
        col("lag").as("best_lag"), col("n").as("n_obs"), col("corr"))
  }

  /** Volatility cone per instrument: for each horizon h, the
    * distribution (min / mean / max) of √(Σ RV / h) over ALL complete
    * h-day rolling windows of the daily realized-variance frame — the
    * term-structure envelope a vol desk plots to judge whether today's
    * vol is rich or cheap for its horizon (Burghardt & Lane 1990).
    * Consumes [[Stats.realizedVariance]]'s (key, bucket) output, so the
    * tick stream is touched once upstream; every window here rolls over
    * the DAY frame (rows, not ticks). Per-window vol is one sqrt,
    * rounded to 9 dp and fixed as a decimal, so the per-(key, horizon)
    * mean is an exact decimal sum / count and min/max compare exactly.
    * One window pass per horizon over the same key partitioning — the
    * horizons list is tiny and each pass rides the same single shuffle
    * of the day frame.
    */
  def volCone(dailyRv: DataFrame, keyCol: String, bucketCol: String,
              rvCol: String, horizons: Seq[Int]): DataFrame = {
    require(horizons.nonEmpty && horizons.forall(_ >= 1) &&
      horizons.distinct.size == horizons.size,
      s"horizons must be positive and distinct, got $horizons")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol).asc)
    // all horizons in ONE pass: a union of per-horizon branches would
    // recompute and re-shuffle the upstream frame once per horizon
    // (measured: 3 hash Exchanges for 3 horizons); rolling every frame
    // over the same window partitioning and stacking the columns into
    // rows keeps the whole cone on a single Exchange
    val rolled = horizons.foldLeft(
      dailyRv
        // round THEN fix as decimal: casting a raw double at scale 18
        // puts ~1% of values inside the window where Spark's shortest-
        // repr rounding and an exact engine's binary rounding diverge;
        // after round(·,12) the double IS (within half an ulp) a 12-dp
        // grid value, so the cast just snaps it back — both engines
        // recover the identical decimal (the q119 cut-point argument)
        .withColumn("_rvd", round(col(rvCol), 12).cast(DecimalType(30, 12)))
    ) { (acc, h) =>
      val frame = w.rowsBetween(-(h - 1), Window.currentRow)
      acc.withColumn(s"_c$h", count(col("_rvd")).over(frame))
        .withColumn(s"_s$h", sum(col("_rvd")).over(frame))
    }
    rolled
      .select(col(keyCol), explode(array(horizons.map(h =>
        struct(lit(h).as("horizon"), col(s"_c$h").as("cnt"),
          col(s"_s$h").as("roll"))): _*)).as("_z"))
      .select(col(keyCol), col("_z.horizon").as("horizon"),
        col("_z.cnt").as("_cnt"), col("_z.roll").as("_roll"))
      .filter(col("_cnt") === col("horizon"))
      .withColumn("_vol",
        round(sqrt(col("_roll").cast("double") / col("horizon")), 9)
          .cast(DecimalType(16, 9)))
      .groupBy(col(keyCol), col("horizon"))
      .agg(count(lit(1)).as("n_windows"),
        min(col("_vol")).as("_min"), max(col("_vol")).as("_max"),
        sum(col("_vol")).as("_sum"))
      .select(col(keyCol), col("horizon"), col("n_windows"),
        col("_min").cast("double").as("min_vol"),
        round(col("_sum").cast("double") / col("n_windows"), 9)
          .as("mean_vol"),
        col("_max").cast("double").as("max_vol"))
  }

  /** ATR and Donchian-channel breakout flags over an OHLC bar frame
    * (the [[Windows.ohlcBars]] output): true range = max(high−low,
    * |high−prevClose|, |low−prevClose|) (Wilder 1978), ATR its
    * `nBars`-bar rolling mean — NULL until a full window of true
    * ranges exists, matching the charting convention — and the
    * Donchian breakout compares close against the max high / min low
    * of the PRIOR `nBars` bars (current bar excluded: a bar always
    * breaches its own high). All channel arithmetic is decimal-exact
    * comparisons; the ATR mean is the one presentation double. Bars
    * per key are tiny (days, not ticks) — a single partition-by-key
    * window pass over an already-aggregated frame, no tick-stream
    * shuffle at all.
    */
  def atrChannels(bars: DataFrame, keyCol: String, orderCol: Column,
                  nBars: Int): DataFrame = {
    require(nBars >= 1, s"nBars must be >= 1, got $nBars")
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCol.asc)
    val high = col("high").cast(DecimalType(18, 6))
    val low = col("low").cast(DecimalType(18, 6))
    val close = col("close").cast(DecimalType(18, 6))
    val prevClose = lag(close, 1).over(w)
    val tr = when(prevClose.isNotNull,
      greatest(high - low, abs(high - prevClose), abs(low - prevClose)))
      .otherwise(high - low)
    val trail = w.rowsBetween(-(nBars - 1), Window.currentRow)
    val prior = w.rowsBetween(-nBars, -1)
    bars
      // bars with any null OHLC field drop first (the Risk.flowImbalance
      // convention): they carry no range information, must not occupy a
      // TR/Donchian frame slot or void the prev-close chain — and
      // atrStream filters identically, so the bar-for-bar parity law
      // holds on gapped feeds
      .filter(col("high").isNotNull && col("low").isNotNull &&
        col("close").isNotNull)
      .withColumn("_tr", tr.cast(DecimalType(20, 6)))
      .withColumn("_trn", count(col("_tr")).over(trail))
      .withColumn("atr", when(col("_trn") === nBars,
        round(sum(col("_tr")).over(trail).cast("double") / nBars, 6)))
      .withColumn("_dh", max(high).over(prior))
      .withColumn("_dl", min(low).over(prior))
      .select(col(keyCol), orderCol.as("bar"),
        high.cast("double").as("high"), low.cast("double").as("low"),
        close.cast("double").as("close"), col("atr"),
        col("_dh").cast("double").as("donchian_high"),
        col("_dl").cast("double").as("donchian_low"),
        when(col("_dh").isNotNull, (close > col("_dh")).cast("int"))
          .as("breakout_up"),
        when(col("_dl").isNotNull, (close < col("_dl")).cast("int"))
          .as("breakout_down"))
  }

  /** Range-based daily variance estimators per instrument — Parkinson
    * (1980), Garman–Klass (1980), and Rogers–Satchell (1991) — the
    * standard refinement of close-to-close realized variance
    * ([[Stats]]'s q121 family; reference anchor: the Gold stats stage
    * `silver_to_gold_crypto_stats.py:77-84` already reduces ticks to
    * per-day min/max/first/last, which is exactly the OHLC input these
    * estimators consume). Per bar, with u = ln(H/L), c = ln(C/O):
    *   parkinson        = u² / (4 ln 2)
    *   garman_klass     = u²/2 − (2 ln 2 − 1) c²
    *   rogers_satchell  = ln(H/C)·ln(H/O) + ln(L/C)·ln(L/O)
    * and the operator reports each estimator's MEAN over the key's
    * bars (the per-bar values are daily variance estimates; callers
    * annualize by their own convention).
    *
    * Numeric discipline: bars come from the shared deterministic
    * [[Stats.ohlcBars]] (first/last by the caller's total tick order);
    * each per-bar estimator is a double (ln has no decimal form) FIXED
    * to the 12-dp grid before an exact DECIMAL(28,12) sum, so the
    * cross-bar aggregation is order-independent and both engines agree
    * bit-for-bit; the only double division is the final mean, rounded
    * to 6 dp. Bars with a non-positive low (log domain) drop with the
    * same posture as [[Stats]]'s return guards.
    *
    * Plan: ONE window shuffle (the OHLC first/last windows and the
    * per-(key, bar) agg share their clustering), then the per-key agg
    * reduces ~365 bars/key/year — map-side partials make the second
    * Exchange carry one row per (key, bar). At 100 TB the tick→bar
    * reduction IS the operator; nothing downstream sees ticks.
    */
  def rangeVolatility(df: DataFrame, keyCol: String, barCol: Column,
                      tsOrder: Seq[Column], valueCol: String): DataFrame = {
    val bars = Stats.ohlcBars(df, Seq(keyCol), barCol, tsOrder, valueCol)
    def d(c: String) = col(c).cast("double")
    val u = log(d("high") / d("low"))
    val c0 = log(d("close") / d("open"))
    val ln2 = math.log(2.0)
    val park = (u * u) / lit(4.0 * ln2)
    val gk = u * u * lit(0.5) - lit(2.0 * ln2 - 1.0) * (c0 * c0)
    val rs = log(d("high") / d("close")) * log(d("high") / d("open")) +
      log(d("low") / d("close")) * log(d("low") / d("open"))
    def fix(x: Column) = round(x, 12).cast(DecimalType(28, 12))
    def mean6(c: String) =
      round(sum(col(c)).cast("double") / count(lit(1)), 6)
    bars
      .filter(col("low") > 0)
      .select(col(keyCol), fix(park).as("_p"), fix(gk).as("_g"),
        fix(rs).as("_r"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_bars"),
        mean6("_p").as("parkinson"),
        mean6("_g").as("garman_klass"),
        mean6("_r").as("rogers_satchell"))
  }

  /** One-table research profile per instrument: Sharpe + mean return,
    * the three range-variance estimators, the Hurst exponent, the
    * Ljung–Box Q, and the max drawdown — the columns a desk's
    * instrument screen shows side by side, composed from the SAME
    * operators that pass each gate individually (the oracle splices
    * those operators' own SQL, so the composite is certified as a
    * composition, not re-derived).
    *
    * Plan/scale: five independent passes over the tick table, each the
    * operator's own optimal single-shuffle shape; the five per-key
    * aggregate frames (rows = instrument count) then join broadcast.
    * Deliberately NOT fused into one pass — the components' window
    * shapes differ (lag chains, bars, block explosion, running peak)
    * and entangling them would trade five clean scans for one
    * many-branch shuffle; callers batching many reports should
    * `persist()` the filtered tick frame first (cache contract:
    * caller releases).
    */
  def instrumentProfile(df: DataFrame, keyCol: String,
                        orderCols: Seq[Column], valueName: String,
                        barCol: Column): DataFrame = {
    val v = col(valueName)
    val filtered = df.filter(v.isNotNull)
    val sh = Stats.sharpe(filtered, keyCol, orderCols, v)
    val rv = rangeVolatility(filtered, keyCol, barCol, orderCols, valueName)
    val hu = hurstExponent(filtered, keyCol, orderCols, v)
      .select(col(keyCol), col("hurst"))
    val lb = Stats.ljungBox(filtered, keyCol, orderCols, v)
      .select(col(keyCol), col("q_stat"))
    val dd = Stats.maxDrawdown(filtered, keyCol, orderCols, v)
      .select(col(keyCol), col("n_ticks"), col("max_drawdown"))
    sh.join(rv, Seq(keyCol)).join(hu, Seq(keyCol))
      .join(lb, Seq(keyCol)).join(dd, Seq(keyCol))
      .select(col(keyCol), col("n_ticks"), col("n_returns"),
        col("mean_return"), col("sharpe"), col("n_bars"), col("parkinson"),
        col("garman_klass"), col("rogers_satchell"), col("hurst"),
        col("q_stat"), col("max_drawdown"))
  }

  /** Corwin–Schultz (2012) high–low spread estimator per instrument:
    * from each consecutive-bar pair,
    *   β = ln(H₁/L₁)² + ln(H₂/L₂)²,  γ = ln(max(H)/min(L))²,
    *   α = (√(2β) − √β)/(3 − 2√2) − √(γ/(3 − 2√2)),
    *   S = 2(eᵅ − 1)/(1 + eᵅ)
    * — the bid-ask spread inferred from ranges alone (no quote data),
    * the liquidity complement to [[rollSpread]]'s covariance estimator.
    * Reported as the per-key mean over pairs with the standard
    * negative-to-zero correction, plus `neg_pairs` (how often the raw
    * estimate went negative — the diagnostic the paper reports).
    *
    * Numerics: the q163 discipline — bars from the shared
    * deterministic [[Stats.ohlcBars]], per-pair doubles in one pinned
    * operation order fixed to the 12-dp grid, exact decimal mean,
    * 6-dp presentation. Bars with non-positive lows drop (log domain).
    *
    * Plan/scale: tick→bar reduction once, then ONE key-partitioned
    * lag over the calendar-bounded bar frame and a keyed agg riding
    * the same clustering.
    */
  def corwinSchultz(df: DataFrame, keyCol: String, barCol: Column,
                    tsOrder: Seq[Column], valueCol: String): DataFrame = {
    val bars = Stats.ohlcBars(df, Seq(keyCol), barCol, tsOrder, valueCol)
      .filter(col("low") > 0)
      .select(col(keyCol), col("bar"), col("high"), col("low"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bar").asc)
    def dd(c: Column) = c.cast("double")
    val h0 = dd(col("high")); val l0 = dd(col("low"))
    val h1 = dd(col("_ph")); val l1 = dd(col("_pl"))
    val lr1 = log(h1 / l1); val lr0 = log(h0 / l0)
    val beta = lr1 * lr1 + lr0 * lr0
    val g = log(greatest(h1, h0) / least(l1, l0))
    val gamma = g * g
    val den = lit(3.0 - 2.0 * math.sqrt(2.0))
    val alpha = (sqrt(lit(2.0) * beta) - sqrt(beta)) / den -
      sqrt(gamma / den)
    val sRaw = lit(2.0) * (exp(alpha) - lit(1.0)) / (lit(1.0) + exp(alpha))
    bars
      .withColumn("_ph", lag(col("high"), 1).over(w))
      .withColumn("_pl", lag(col("low"), 1).over(w))
      .filter(col("_ph").isNotNull)
      .select(col(keyCol),
        round(greatest(sRaw, lit(0.0)), 12).cast(DecimalType(28, 12))
          .as("_s"),
        when(sRaw < 0, 1L).otherwise(0L).as("_neg"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_pairs"),
        round(sum(col("_s")).cast("double") / count(lit(1)), 6)
          .as("cs_spread"),
        sum(col("_neg")).as("neg_pairs"))
  }

  /** Hurst exponent per instrument by the aggregated-variance method:
    * for each block size m ∈ `scales`, sum the tick-return series into
    * non-overlapping m-blocks and take the population variance of the
    * block sums; under self-similarity Var(m) ∝ m^{2H}, so H is half
    * the slope of ln Var(m) on ln m (Beran 1994's variance plot; the
    * long-memory diagnostic behind volatility-persistence work —
    * H ≈ 0.5 is a random walk, > 0.5 trending, < 0.5 mean-reverting).
    *
    * Determinism: returns are exact DECIMAL(18,6) differences of the
    * 6-dp-fixed tick values (the [[leadLagCorr]] convention — the
    * variance plot is translation-invariant, so differences carry the
    * same H as pct returns without a division); block sums and their
    * squares aggregate as exact decimals; ln Var and ln m are doubles
    * fixed to the 12-dp grid before the exact decimal regression sums,
    * so the ≤|scales|-point least-squares slope is order-independent.
    * Only complete blocks (exactly m returns) count — a ragged tail
    * block would bias Var(m) low. Scales with fewer than 2 complete
    * blocks or zero variance drop from the regression; a key keeps a
    * defined `hurst` iff ≥ 2 scale points survive.
    *
    * Plan/scale: the returns frame explodes by |scales| (≤ 5 here) and
    * immediately collapses in a map-side partial agg on
    * (key, m, block) — the shuffle carries one row per block, not per
    * tick; the per-(key, m) variance and the per-key regression ride
    * keyed aggs of a few hundred rows. No windows beyond the single
    * lag pass, no driver state.
    */
  def hurstExponent(df: DataFrame, keyCol: String, orderCols: Seq[Column],
                    valueCol: Column,
                    scales: Seq[Int] = Seq(1, 2, 4, 8, 16)): DataFrame = {
    require(scales.nonEmpty && scales.forall(_ >= 1) &&
      scales.distinct.size == scales.size,
      s"scales must be distinct positive ints, got $scales")
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(_.asc): _*)
    val v6 = valueCol.cast(DecimalType(18, 6))
    val rets = df.filter(valueCol.isNotNull)
      .withColumn("_r", v6 - lag(v6, 1).over(w))
      .filter(col("_r").isNotNull)
      .withColumn("_j", row_number().over(w) - 1)
      .select(col(keyCol), col("_j"), col("_r"))
    val blocks = rets
      .withColumn("m", explode(array(scales.map(lit): _*)))
      .groupBy(col(keyCol), col("m"),
        floor(col("_j") / col("m")).as("_blk"))
      // block sums re-fix to (18,6): exact (|s| ≤ m·max|ret| ≪ 10¹²)
      // and keeps s·s inside decimal precision 38 in BOTH engines
      .agg(sum(col("_r")).cast(DecimalType(18, 6)).as("_s"),
        count(lit(1)).as("_cnt"))
      .filter(col("_cnt") === col("m"))
    def dd(c: Column) = c.cast("double")
    val nB = count(lit(1))
    val varM = (dd(sum((col("_s") * col("_s")).cast(DecimalType(38, 12)))) -
      dd(sum(col("_s"))) * dd(sum(col("_s"))) / nB) / nB
    // (14,12): |ln m| and |ln Var| stay two-digit on any 6-dp-grid
    // input, and (14,12)² = (29,24) fits precision 38 exactly in both
    // engines — no engine-specific overflow-adjustment rounding
    def fix(x: Column) = round(x, 12).cast(DecimalType(14, 12))
    val points = blocks.groupBy(col(keyCol), col("m"))
      .agg(varM.as("_var"))
      .filter(col("_var") > 0)
      .select(col(keyCol), fix(log(col("m"))).as("_x"),
        fix(log(col("_var"))).as("_y"))
    val k = count(lit(1))
    val sxx = dd(sum((col("_x") * col("_x")).cast(DecimalType(38, 24)))) -
      dd(sum(col("_x"))) * dd(sum(col("_x"))) / k
    val sxy = dd(sum((col("_x") * col("_y")).cast(DecimalType(38, 24)))) -
      dd(sum(col("_x"))) * dd(sum(col("_y"))) / k
    points.groupBy(col(keyCol))
      .agg(k.cast("long").as("n_scales"),
        when(k >= 2 && sxx > 0, round(sxy / sxx / 2.0, 6)).as("hurst"))
  }
}
