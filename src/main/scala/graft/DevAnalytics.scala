package graft

import org.apache.spark.sql.functions._

/** Scale-stress driver for the market-analytics battery (q82-q99's
  * operator families): generates a deterministic synthetic tick stream
  * at `scale` × 1.44M rows (the DevPipeline 10× stress volume) and
  * times each family end-to-end, so BASELINE.md can record whether the
  * single-shuffle claims hold as data grows — wall-clock should scale
  * sub-linearly (fixed session/job overhead amortizes; every family is
  * one keyed shuffle + windows/aggs, none driver-bounded).
  *
  * Usage: `runMain graft.DevAnalytics [scale] [spanX]` (defaults 1, 1).
  * `spanX` stretches the CALENDAR at fixed row count (the clock
  * advances spanX seconds per instrument-row): the axis the round-6
  * review flagged — the pair family's bucket-mean frame grows with
  * span × keys, not tick count, so `spanX = 100` is the 100× stress
  * that must land on the shuffle-hash fallback instead of a broadcast
  * OOM. Span mode runs only the bucket-frame-bound families (pair
  * family at minute grain + the bucket-window representatives); the
  * full battery runs at spanX = 1.
  */
object DevAnalytics {
  def main(args: Array[String]): Unit = {
    val scale = args.headOption.map(_.toInt).getOrElse(1)
    val spanX = args.drop(1).headOption.map(_.toInt).getOrElse(1)
    val spanOnly = spanX > 1
    val nInstruments = 200
    val rows = 1440000L * scale
    val spark = engine.Sessions.local("graft-analytics", cores = 32)
    spark.sparkContext.setLogLevel("WARN")

    // deterministic pseudo-random walk per instrument: value mixes a
    // slow sine trend with a hash-derived jitter, qty is hash-bounded —
    // no rand() (reruns must measure the same workload)
    val ticks = spark.range(rows)
      .select(col("id").as("event_id"),
        concat(lit("ins_"), pmod(col("id"), lit(nInstruments.toLong)))
          .as("event_type"),
        timestamp_seconds(lit(1704067200L) + (col("id") / nInstruments)
          .cast("long") * spanX).as("ts"),
        (lit(100.0) + lit(10.0) * sin(col("id") / lit(97.0))
          + pmod(xxhash64(col("id")), lit(1000L)).cast("double") / 100.0)
          .as("value"),
        (lit(1L) + pmod(xxhash64(col("id") + 1), lit(50L))).as("qty"))
      .persist()
    ticks.count() // materialize: families time the OPERATOR, not the generator

    val ord = Seq(col("ts"), col("event_id"))
    // force EVERY output column through a checksum: a bare count() lets
    // ColumnPruning drop unreferenced window/agg expressions, timing a
    // scan instead of the operator. pmod before sum — ANSI mode
    // overflows a raw sum(xxhash64).
    def time(tag: String)(body: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val df = body
      val forced = df.select(
        count(lit(1)).as("n"),
        sum(pmod(xxhash64(struct(df.columns.map(col): _*)),
          lit(1000000007L))).as("chk")).head()
      println(f"[family] $tag%-16s ${(System.nanoTime() - t0) / 1e9}%7.2f s" +
        f"  (${forced.getLong(0)} rows, chk=${forced.getLong(1)})")
    }
    if (spanOnly) {
      // 100×-span battery: fixed 1.44M·scale ticks over a spanX-stretched
      // calendar. The minute-bucket frame is keys × span-minutes —
      // 2.4M rows at spanX=100 — which MUST trip the pair family's
      // broadcast→shuffle-hash fallback (maxBroadcastRows 500k) instead
      // of broadcasting a span-sized frame; the bucket-window families
      // below it are the O(frame) sanity rows.
      val minuteBucket = date_trunc("minute", col("ts"))
      time("corr_matrix_min")(ops.Stats.corrMatrix(ticks,
        "event_type", minuteBucket, col("value")))
      time("pair_spread")(ops.Risk.pairSpread(ticks,
        "event_type", minuteBucket, col("value"), 2.0))
      time("leadlag_corr")(ops.Risk.leadLagCorr(ticks,
        "event_type", minuteBucket, col("value"), maxLag = 3))
      time("portfolio_nav")(ops.Risk.portfolioNav(ticks,
        "event_type", ord, col("value"), minuteBucket))
      time("momentum_rank")(ops.Risk.momentumRank(ticks,
        "event_type", ord, col("value"), minuteBucket))
      time("vol_cone") {
        val rv = ops.Stats.realizedVariance(ticks,
          "event_type", ord, col("value"), minuteBucket)
        ops.Risk.volCone(rv, "event_type", "bucket", "realized_variance",
          Seq(5, 10, 21))
      }
      println(s"[done] scale=$scale spanX=$spanX rows=$rows " +
        s"instruments=$nInstruments")
      spark.stop()
      return
    }
    time("vwap")(ops.Stats.vwap(ticks,
      Seq("event_type"), col("value"), col("qty")))
    time("rolling_stats")(ops.Stats.rollingStats(ticks,
      "event_type", ord, col("value"), 20))
    time("drawdown")(ops.Stats.maxDrawdown(ticks,
      "event_type", ord, col("value")))
    time("twap")(ops.Stats.twap(ticks,
      Seq("event_type"), col("ts"), col("event_id"), col("value")))
    time("rsi")(ops.Stats.rsi(ticks,
      "event_type", ord, col("value"), 14))
    time("ewma")(ops.Stats.ewma(ticks,
      "event_type", ord, col("value"), 0.25, 20))
    time("beta")(ops.Stats.betaVsMarket(ticks,
      "event_type", date_trunc("hour", col("ts")), col("value")))
    time("up_streaks")(ops.Windows.longestUpStreak(ticks,
      "event_type", ord, col("value")))
    time("level_alerts") {
      val levels = ops.Stats.keyLevels(ticks, "event_type", ord,
        "value", col("qty"))
      ops.Stats.scoreAgainstLevels(ticks, levels, "event_type", "value",
        "event_id", 1.5, 3.0)
    }
    // 200 instruments ⇒ 19,900 pairs from a bucket-mean frame of
    // (hours × 200) rows — the tick table is touched only by the mean agg
    time("corr_matrix")(ops.Stats.corrMatrix(ticks,
      "event_type", date_trunc("hour", col("ts")), col("value")))
    time("bollinger")(ops.Stats.bollinger(ticks,
      "event_type", ord, col("value"), 20, 2.0))
    time("sharpe")(ops.Stats.sharpe(ticks,
      "event_type", ord, col("value")))
    time("autocorr")(ops.Stats.returnAutocorr(ticks,
      "event_type", ord, col("value")))
    time("realized_var")(ops.Stats.realizedVariance(ticks,
      "event_type", ord, col("value"), to_date(col("ts"))))
    time("amihud")(ops.Stats.amihudIlliquidity(ticks,
      "event_type", ord, col("value"), col("qty"), to_date(col("ts"))))
    time("winsorized")(ops.Stats.winsorizedStats(ticks,
      "event_type", col("value"), 0.01, 0.99))
    // round-5 session-2 battery. Bucket grain is MINUTE, not day: the
    // generator's clock advances one second per instrument-row, so the
    // whole run spans ~2 h × scale — day buckets would collapse to one
    // and the rolling-window families would have nothing to roll over.
    val minuteBucket = date_trunc("minute", col("ts"))
    time("var_cvar")(ops.Risk.varCvar(ticks,
      "event_type", ord, col("value"), 0.05))
    time("sortino")(ops.Risk.sortino(ticks,
      "event_type", ord, col("value")))
    time("flow_imbalance")(ops.Risk.flowImbalance(ticks,
      "event_type", ord, col("value"), col("qty"), minuteBucket))
    time("kyle_lambda")(ops.Risk.kyleLambda(ticks,
      "event_type", ord, col("value"), col("qty")))
    time("roll_spread")(ops.Risk.rollSpread(ticks,
      "event_type", ord, col("value")))
    time("variance_ratio")(ops.Risk.varianceRatio(ticks,
      "event_type", ord, col("value"), 5))
    time("event_study")(ops.Risk.eventStudy(ticks,
      "event_type", ord, col("value"), Seq(1, 5), r => r > 0.02))
    time("portfolio_nav")(ops.Risk.portfolioNav(ticks,
      "event_type", ord, col("value"), minuteBucket))
    time("momentum_rank")(ops.Risk.momentumRank(ticks,
      "event_type", ord, col("value"), minuteBucket))
    time("intraday_profile")(ops.Risk.intradayProfile(ticks,
      "event_type", ord, col("ts"), col("value"), col("qty")))
    time("atr_channels") {
      val bars = ops.Stats.ohlcBars(ticks, Seq("event_type"),
        minuteBucket, ord, "value")
      ops.Risk.atrChannels(bars, "event_type", col("bar"), 14)
    }
    // 19,900 pairs expand from the minute-mean frame, never the ticks
    time("pair_spread")(ops.Risk.pairSpread(ticks,
      "event_type", minuteBucket, col("value"), 2.0))
    time("vol_cone") {
      val rv = ops.Stats.realizedVariance(ticks,
        "event_type", ord, col("value"), minuteBucket)
      ops.Risk.volCone(rv, "event_type", "bucket", "realized_variance",
        Seq(5, 10, 21))
    }
    // round-8 session-2 battery: the econometrics tail
    time("range_vol")(ops.Risk.rangeVolatility(ticks,
      "event_type", minuteBucket, ord, "value"))
    time("hurst")(ops.Risk.hurstExponent(ticks,
      "event_type", ord, col("value")))
    time("ljung_box")(ops.Stats.ljungBox(ticks,
      "event_type", ord, col("value")))
    time("rolling_beta")(ops.Stats.rollingBeta(ticks,
      "event_type", minuteBucket, col("value"), 10))
    time("corwin_schultz")(ops.Risk.corwinSchultz(ticks,
      "event_type", minuteBucket, ord, "value"))
    time("instr_profile")(ops.Risk.instrumentProfile(ticks,
      "event_type", ord, "value", minuteBucket))

    // round-6 family: 19,900 pairs × 7 lags from the persisted
    // minute-mean return frame — ticks are scanned once for the whole
    // lag stack
    time("leadlag_corr")(ops.Risk.leadLagCorr(ticks,
      "event_type", minuteBucket, col("value"), maxLag = 3))

    // rollup maintenance: churn = 1% of rows updated + 0.5% inserted;
    // the delta path must cost churn-shaped work, not base-shaped
    time("incremental_agg") {
      val base0 = ticks.select(col("event_id"), col("event_type"),
        col("value").cast("decimal(18,6)").as("value"))
      val before = base0.filter(pmod(col("event_id"), lit(200)) =!= 0)
      val after = base0.withColumn("value",
        when(pmod(col("event_id"), lit(100)) === 0, col("value") * 2)
          .otherwise(col("value")).cast("decimal(18,6)"))
      val feed = engine.Upsert.changeCaptureCdf(before, after, Seq("event_id"))
      val base = engine.Incremental.groupAgg(before, Seq("event_type"),
        Seq("total" -> col("value")))
      engine.Incremental.applyDelta(base,
        engine.Incremental.aggDelta(feed, Seq("event_type"),
          Seq("total" -> col("value"))),
        Seq("event_type"), Seq("total"))
    }
    println(s"[done] scale=$scale rows=$rows instruments=$nInstruments")
    spark.stop()
  }
}
