package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Risk

/** Tail-risk / microstructure operator semantics (hand-computed
  * fixtures): VaR/ES order statistics, Sortino downside deviation, the
  * tick-rule sign carry, ATR/Donchian windows, cross-sectional deciles,
  * and the intraday profile shares.
  */
class RiskSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  def ts(s: String) = Timestamp.valueOf(s)

  // returns for A: 100→80 −0.2, 80→88 +0.1, 88→66 −0.25, 66→72.6 +0.1
  private def tickFixture = Seq(
    ("A", ts("2024-01-01 10:00:00"), 1L, 100.0),
    ("A", ts("2024-01-01 10:01:00"), 2L, 80.0),
    ("A", ts("2024-01-01 10:02:00"), 3L, 88.0),
    ("A", ts("2024-01-01 10:03:00"), 4L, 66.0),
    ("A", ts("2024-01-01 10:04:00"), 5L, 72.6)
  ).toDF("k", "t", "id", "v")

  test("varCvar: k = ceil(alpha*n) order statistic and exact tail mean") {
    // sorted returns: −0.25, −0.2, 0.1, 0.1; alpha=0.5 ⇒ k=2 ⇒
    // VaR = 2nd smallest = −0.2, ES = (−0.25 − 0.2)/2 = −0.225
    val out = Risk.varCvar(tickFixture, "k", Seq(col("t"), col("id")),
      col("v"), alpha = 0.5).collect().head
    assert(out.getAs[Long]("n_returns") === 4L)
    assert(out.getAs[Double]("var_return") === -0.2)
    assert(out.getAs[Double]("es_return") === -0.225)
  }

  test("varCvar: alpha small enough that k=1 takes the minimum") {
    val out = Risk.varCvar(tickFixture, "k", Seq(col("t"), col("id")),
      col("v"), alpha = 0.25).collect().head
    assert(out.getAs[Double]("var_return") === -0.25)
    assert(out.getAs[Double]("es_return") === -0.25)
  }

  test("sortino: downside deviation counts only losses") {
    // mean = −0.0625; Σ(r⁻)² = 0.04 + 0.0625 = 0.1025; dd = √(0.1025/4)
    val out = Risk.sortino(tickFixture, "k", Seq(col("t"), col("id")),
      col("v")).collect().head
    val dd = math.sqrt(0.1025 / 4)
    assert(out.getAs[Long]("n_returns") === 4L)
    assert(out.getAs[Double]("mean_return") === -0.0625)
    assert(out.getAs[Double]("downside_dev") ===
      BigDecimal(dd).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out.getAs[Double]("sortino") ===
      BigDecimal(-0.0625 / dd).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("sortino: a key with no losing tick has NULL ratio") {
    val up = Seq(
      ("U", ts("2024-01-01 10:00:00"), 1L, 100.0),
      ("U", ts("2024-01-01 10:01:00"), 2L, 110.0)
    ).toDF("k", "t", "id", "v")
    val out = Risk.sortino(up, "k", Seq(col("t"), col("id")), col("v"))
      .collect().head
    assert(out.getAs[Double]("downside_dev") === 0.0)
    assert(out.isNullAt(out.fieldIndex("sortino")))
  }

  test("flowImbalance: tick rule signs, zero ticks inherit, unsignable drop") {
    // 10 (first: no sign), 10 (zero change, nothing to inherit: drop),
    // 11 (+1, qty 3), 11 (zero: inherits +1, qty 4), 10 (−1, qty 5)
    val df = Seq(
      ("A", ts("2024-01-01 09:00:00"), 1L, 10.0, 1L),
      ("A", ts("2024-01-01 09:01:00"), 2L, 10.0, 2L),
      ("A", ts("2024-01-01 09:02:00"), 3L, 11.0, 3L),
      ("A", ts("2024-01-01 09:03:00"), 4L, 11.0, 4L),
      ("A", ts("2024-01-01 09:04:00"), 5L, 10.0, 5L)
    ).toDF("k", "t", "id", "v", "q")
    val out = Risk.flowImbalance(df, "k", Seq(col("t"), col("id")),
      col("v"), col("q"), to_date(col("t"))).collect().head
    assert(out.getAs[Long]("n_ticks") === 3L)
    assert(out.getAs[Double]("signed_qty") === 2.0)   // 3 + 4 − 5
    assert(out.getAs[Double]("total_qty") === 12.0)
    assert(out.getAs[Double]("ofi") === 0.166667)     // round(2/12, 6)
  }

  test("atrChannels: Wilder TR, rolling ATR, prior-window Donchian") {
    val bars = Seq(
      ("A", "2024-01-01", 10.0, 8.0, 9.0),
      ("A", "2024-01-02", 12.0, 9.0, 11.0),
      ("A", "2024-01-03", 11.0, 7.0, 8.0)
    ).toDF("k", "bar", "high", "low", "close")
    val rows = Risk.atrChannels(bars, "k", col("bar"), nBars = 2)
      .orderBy("bar").collect()
    // TRs: d1 = 2 (no prev close), d2 = max(3,3,0) = 3, d3 = max(4,0,4) = 4
    assert(rows(0).isNullAt(rows(0).fieldIndex("atr")))  // window not full
    assert(rows(1).getAs[Double]("atr") === 2.5)         // (2+3)/2
    assert(rows(2).getAs[Double]("atr") === 3.5)         // (3+4)/2
    // Donchian vs PRIOR 2 bars: d2 sees only d1 (dh=10) ⇒ close 11 breaks up
    assert(rows(0).isNullAt(rows(0).fieldIndex("donchian_high")))
    assert(rows(1).getAs[Double]("donchian_high") === 10.0)
    assert(rows(1).getAs[Int]("breakout_up") === 1)
    assert(rows(2).getAs[Double]("donchian_high") === 12.0)
    assert(rows(2).getAs[Int]("breakout_up") === 0)
    assert(rows(2).getAs[Double]("donchian_low") === 8.0)
    assert(rows(2).getAs[Int]("breakout_down") === 0)    // 8 < 8 is false
  }

  test("momentumRank: deterministic cross-sectional rank and decile") {
    val df = Seq(
      ("A", ts("2024-01-01 09:00:00"), 1L, 100.0),
      ("A", ts("2024-01-01 16:00:00"), 2L, 110.0),  // +0.1
      ("B", ts("2024-01-01 09:00:00"), 3L, 100.0),
      ("B", ts("2024-01-01 16:00:00"), 4L, 90.0),   // −0.1
      ("C", ts("2024-01-01 09:00:00"), 5L, 50.0),
      ("C", ts("2024-01-01 16:00:00"), 6L, 50.0)    // 0
    ).toDF("k", "t", "id", "v")
    val out = Risk.momentumRank(df, "k", Seq(col("t"), col("id")),
      col("v"), to_date(col("t")))
      .collect().map(r => r.getAs[String]("k") ->
        ((r.getAs[Int]("rank_in_bucket"), r.getAs[Int]("decile")))).toMap
    assert(out("A") === ((1, 1)))   // floor(0·10/3)+1
    assert(out("C") === ((2, 4)))   // floor(10/3)+1
    assert(out("B") === ((3, 7)))   // floor(20/3)+1
  }

  test("momentumRank: equal returns rank by key tiebreak") {
    val df = Seq(
      ("B", ts("2024-01-01 09:00:00"), 1L, 100.0),
      ("B", ts("2024-01-01 16:00:00"), 2L, 110.0),
      ("A", ts("2024-01-01 09:00:00"), 3L, 200.0),
      ("A", ts("2024-01-01 16:00:00"), 4L, 220.0)
    ).toDF("k", "t", "id", "v")
    val out = Risk.momentumRank(df, "k", Seq(col("t"), col("id")),
      col("v"), to_date(col("t")))
      .collect().map(r => r.getAs[String]("k") ->
        r.getAs[Int]("rank_in_bucket")).toMap
    assert(out === Map("A" -> 1, "B" -> 2))
  }

  test("kyleLambda: price impact slope over tick-rule signed volume") {
    // prices 10,11,11,10 / qtys 1,2,3,4 ⇒ (x,Δp) points (2,1),(3,0)
    // (zero tick inherits +1),(−4,−1); λ = (3·6 − 1·0)/(3·29 − 1) = 18/86
    val df = Seq(
      ("A", ts("2024-01-01 09:00:00"), 1L, 10.0, 1L),
      ("A", ts("2024-01-01 09:01:00"), 2L, 11.0, 2L),
      ("A", ts("2024-01-01 09:02:00"), 3L, 11.0, 3L),
      ("A", ts("2024-01-01 09:03:00"), 4L, 10.0, 4L)
    ).toDF("k", "t", "id", "v", "q")
    val out = Risk.kyleLambda(df, "k", Seq(col("t"), col("id")),
      col("v"), col("q")).collect().head
    assert(out.getAs[Long]("n_ticks") === 3L)
    assert(out.getAs[Double]("kyle_lambda") ===
      BigDecimal(18.0 / 86.0).setScale(9,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("rollSpread: bounce gives 2*sqrt(-cov); trending tape gives NULL") {
    // bouncing 10,11,10,11,10 ⇒ Δp pairs all (−1,+1)-ish: cov = −8/9
    val bounce = Seq(10.0, 11.0, 10.0, 11.0, 10.0).zipWithIndex.map {
      case (v, i) => ("A", ts(f"2024-01-01 09:0$i%d:00"), i.toLong, v) }
    // trending 1,2,4,8,16 ⇒ Δp accelerates: cov > 0, spread undefined
    val trend = Seq(1.0, 2.0, 4.0, 8.0, 16.0).zipWithIndex.map {
      case (v, i) => ("B", ts(f"2024-01-01 09:0$i%d:00"), i.toLong, v) }
    val rows = Risk.rollSpread((bounce ++ trend).toDF("k", "t", "id", "v"),
      "k", Seq(col("t"), col("id")), col("v")).orderBy("k").collect()
    val a = rows(0)
    assert(a.getAs[Long]("n_pairs") === 3L)
    assert(a.getAs[Double]("dp_autocov") === -0.888888889)
    assert(a.getAs[Double]("roll_spread") ===
      BigDecimal(2.0 * math.sqrt(-(-3.0 - (-1.0 * 1.0) / 3.0) / 3.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val b = rows(1)
    assert(b.getAs[Double]("dp_autocov") > 0)
    assert(b.isNullAt(b.fieldIndex("roll_spread")))
  }

  test("tickReturn's domain cap fails LOUDLY on corrupt input, never truncates") {
    // a 10^11 tick-to-tick return cannot fit DECIMAL(16,9) — the scaladoc
    // claims ANSI mode turns that into a job failure rather than a
    // silently truncated sum; this pins the claim
    val df = Seq(
      ("A", ts("2024-01-01 09:00:00"), 1L, 0.000001),
      ("A", ts("2024-01-01 09:01:00"), 2L, 100000.0)
    ).toDF("k", "t", "id", "v")
    val e = intercept[Exception] {
      Risk.sortino(df, "k", Seq(col("t"), col("id")), col("v")).collect()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).mkString
    assert(msg.contains("NUMERIC_VALUE_OUT_OF_RANGE") ||
      msg.contains("cannot be represented"), msg)
  }

  test("portfolioNav: equal-weight compounding; a wipeout nulls NAV loudly") {
    val df = Seq(
      // day 1: A +10%, B −10% ⇒ r̄ = 0, NAV 1.0
      ("A", ts("2024-01-01 09:00:00"), 1L, 100.0),
      ("A", ts("2024-01-01 16:00:00"), 2L, 110.0),
      ("B", ts("2024-01-01 09:00:00"), 3L, 50.0),
      ("B", ts("2024-01-01 16:00:00"), 4L, 45.0),
      // day 2: A +10%, B +20% ⇒ r̄ = 0.15, NAV 1.15
      ("A", ts("2024-01-02 09:00:00"), 5L, 110.0),
      ("A", ts("2024-01-02 16:00:00"), 6L, 121.0),
      ("B", ts("2024-01-02 09:00:00"), 7L, 45.0),
      ("B", ts("2024-01-02 16:00:00"), 8L, 54.0),
      // day 3: only C trades, 100 → 0: −100%, ln undefined ⇒ NULL NAV
      ("C", ts("2024-01-03 09:00:00"), 9L, 100.0),
      ("C", ts("2024-01-03 16:00:00"), 10L, 0.0)
    ).toDF("k", "t", "id", "v")
    val rows = graft.ops.Risk.portfolioNav(df, "k",
        Seq(col("t"), col("id")), col("v"), to_date(col("t")))
      .orderBy("bucket").collect()
    assert(rows.map(_.getAs[Long]("n_keys")).toSeq === Seq(2L, 2L, 1L))
    assert(rows(0).getAs[Double]("port_return") === 0.0)
    assert(rows(0).getAs[Double]("nav") === 1.0)
    assert(rows(1).getAs[Double]("port_return") === 0.15)
    assert(rows(1).getAs[Double]("nav") === 1.15)
    assert(rows(2).getAs[Double]("port_return") === -1.0)
    assert(rows(2).isNullAt(rows(2).fieldIndex("nav")))
  }

  test("eventStudy: forward returns after signals; off-series windows drop") {
    def walk(k: String, vs: Seq[Double]) = vs.zipWithIndex.map {
      case (v, i) => (k, ts(f"2024-01-01 09:${i / 60}%02d:${i % 60}%02d"), i.toLong, v) }
    // A: the 100→103 jump signals; fwd1 = 1/103, fwd5 = 5/103. The
    // final 108→111 jump also signals but has no forward ticks — drops.
    // B: 100→103 signals into a reversal; fwd1 < 0, fwd5 undefined.
    val df = (walk("A", Seq(100, 103, 104, 105, 106, 107, 108, 111)) ++
      walk("B", Seq(100, 103, 100))).toDF("k", "t", "id", "v")
    def r9(x: Double) = BigDecimal(x).setScale(9,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val out = graft.ops.Risk.eventStudy(df, "k", Seq(col("t"), col("id")),
        col("v"), horizons = Seq(1, 5), signal = r => r > 0.02)
      .collect()
      .map(r => (r.getAs[String]("k"), r.getAs[Int]("horizon")) ->
        ((r.getAs[Long]("n_events"), r.getAs[Double]("mean_fwd_return"),
          r.getAs[Double]("hit_rate")))).toMap
    assert(out.keySet === Set(("A", 1), ("A", 5), ("B", 1)))
    assert(out(("A", 1)) === ((1L, r9(1.0 / 103), 1.0)))
    assert(out(("A", 5)) === ((1L, r9(5.0 / 103), 1.0)))
    assert(out(("B", 1)) === ((1L, r9(-3.0 / 103), 0.0)))
  }

  test("varianceRatio: reverting tape -> 0, trending tape -> >1, flat -> NULL") {
    def walk(k: String, vs: Seq[Double]) = vs.zipWithIndex.map {
      case (v, i) => (k, ts(f"2024-01-01 09:0$i%d:00"), i.toLong, v) }
    // A: returns +.1,−.1,+.1,−.1 — every 2-period return is 0 ⇒ VR = 0
    // B: returns +.1,+.1,−.1,−.1 — VR = ((0.04+0.04)/3) / (2·0.01) = 4/3
    // C: constant +.1 returns — Var(r₁) = 0 ⇒ NULL
    val df = (walk("A", Seq(100, 110, 99, 108.9, 98.01)) ++
      walk("B", Seq(100, 110, 121, 108.9, 98.01)) ++
      walk("C", Seq(100, 110, 121, 133.1, 146.41))).toDF("k", "t", "id", "v")
    val out = Risk.varianceRatio(df, "k", Seq(col("t"), col("id")),
      col("v"), q = 2).collect()
      .map(r => r.getAs[String]("k") ->
        Option(r.getAs[Any]("variance_ratio"))).toMap
    assert(out("A") === Some(0.0))
    assert(out("B") === Some(1.333333))
    assert(out("C") === None)
  }

  test("pairSpread: OLS hedge, closed-form residual sigma, latest z") {
    // A on B over 4 days: B = 1,2,3,4; A = 10,20,30,45 ⇒ β=11.5,
    // α=−2.5, RSS=7.5, σ=√3.75; last resid = 45−(−2.5+46) = 1.5
    val df = Seq(
      ("A", ts("2024-01-01 10:00:00"), 10.0), ("B", ts("2024-01-01 10:00:00"), 1.0),
      ("A", ts("2024-01-02 10:00:00"), 20.0), ("B", ts("2024-01-02 10:00:00"), 2.0),
      ("A", ts("2024-01-03 10:00:00"), 30.0), ("B", ts("2024-01-03 10:00:00"), 3.0),
      ("A", ts("2024-01-04 10:00:00"), 45.0), ("B", ts("2024-01-04 10:00:00"), 4.0)
    ).toDF("k", "t", "v")
    val out = graft.ops.Risk.pairSpread(df, "k", to_date(col("t")),
      col("v"), zThreshold = 2.0).collect().head
    assert(out.getAs[Long]("n_buckets") === 4L)
    assert(out.getAs[java.sql.Date]("last_bucket").toString === "2024-01-04")
    assert(out.getAs[Double]("beta") === 11.5)
    assert(out.getAs[Double]("alpha") === -2.5)
    assert(out.getAs[Double]("last_z") ===
      BigDecimal(1.5 / math.sqrt(7.5 / 2)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out.getAs[Int]("diverged") === 0)
  }

  test("pairSpread: flat hedge leg and short pairs yield NULLs") {
    val df = Seq(
      ("A", ts("2024-01-01 10:00:00"), 10.0), ("C", ts("2024-01-01 10:00:00"), 5.0),
      ("A", ts("2024-01-02 10:00:00"), 20.0), ("C", ts("2024-01-02 10:00:00"), 5.0),
      ("A", ts("2024-01-03 10:00:00"), 30.0), ("C", ts("2024-01-03 10:00:00"), 5.0),
      ("D", ts("2024-01-01 10:00:00"), 7.0),
      ("D", ts("2024-01-02 10:00:00"), 8.0)
    ).toDF("k", "t", "v")
    val rows = graft.ops.Risk.pairSpread(df, "k", to_date(col("t")),
      col("v")).collect()
      .map(r => (r.getAs[String]("key_a"), r.getAs[String]("key_b")) -> r).toMap
    val ac = rows(("A", "C"))          // flat C leg: no regression
    assert(ac.isNullAt(ac.fieldIndex("beta")))
    assert(ac.isNullAt(ac.fieldIndex("last_z")))
    val ad = rows(("A", "D"))          // only 2 shared buckets
    assert(ad.getAs[Long]("n_buckets") === 2L)
    assert(ad.isNullAt(ad.fieldIndex("beta")))
  }

  test("pairSpread refuses past maxInstruments, naming the instrument count") {
    val df = Seq(("A", ts("2024-01-01 10:00:00"), 1.0),
      ("B", ts("2024-01-01 10:00:00"), 2.0),
      ("C", ts("2024-01-01 10:00:00"), 3.0)).toDF("k", "t", "v")
    val e = intercept[IllegalArgumentException] {
      graft.ops.Risk.pairSpread(df, "k", to_date(col("t")), col("v"),
        maxInstruments = 2L)
    }
    assert(e.getMessage.contains("3 instruments") &&
      e.getMessage.contains("maxInstruments=2"))
    // at the bound: runs
    assert(graft.ops.Risk.pairSpread(df.filter(col("k") =!= "C"), "k",
      to_date(col("t")), col("v"), maxInstruments = 2L).count() === 1L)
  }

  test("leadLagCorr: a constructed leader is found at its lag with corr 1") {
    // xb follows f, xa follows f delayed one bucket ⇒ ra_t == rb_{t-1}
    // exactly, so the (follower=a, leader=b, ℓ=1) cell is corr 1.0 and
    // best_lag = +1 (positive ⇒ the larger key leads)
    val f = Seq(10.0, 13.0, 11.0, 17.0, 12.0, 19.0, 14.0, 22.0)
    val rows =
      f.zipWithIndex.map { case (v, t) => ("b", t.toLong, v) } ++
      f.zipWithIndex.map { case (v, t) => ("a", t.toLong + 1, v) }
    val got = graft.ops.Risk.leadLagCorr(rows.toDF("k", "t", "v"),
        "k", col("t"), col("v"), maxLag = 3)
      .as[(String, String, Int, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got(("a", "b")) === ((1, 6L, 1.0)))
  }

  test("leadLagCorr: a long calendar span trips the bucket-axis fallback, same answer") {
    // 4 keys × 600 buckets ⇒ 2,396 returns; the exploded lag side is
    // ×(maxLag+1) = 9,584 rows, past a 5,000-row budget — the fallback
    // must trigger off the FRAME size even though 4 keys is far under
    // maxInstruments (the round-6 weak mark: the hazard axis is the
    // calendar span, not the key count)
    val rows = for (k <- Seq("a", "b", "c", "d"); i <- 0 until 600)
      yield (k, i.toLong, 100.0 + 7.0 * math.sin(0.37 * i + k.hashCode % 5) +
        (if (k == "a") 0.11 * i else 0.09 * i))
    val df = rows.toDF("k", "t", "v")
    val fb = graft.ops.Risk.leadLagCorr(df, "k", col("t"), col("v"),
      maxLag = 3, maxBroadcastRows = 5000L)
    val p = fb.queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin") && !p.contains("BroadcastHashJoin"), p)
    val fbRows = fb.collect().toSet
    spark.catalog.clearCache()
    val viaBroadcast = graft.ops.Risk.leadLagCorr(df, "k", col("t"),
      col("v"), maxLag = 3)
    assert(viaBroadcast.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
    assert(fbRows === viaBroadcast.collect().toSet)
    spark.catalog.clearCache()
  }

  test("leadLagCorr: the stack-size advisory fires on a long span, with the axes named") {
    // same 100×-flavored fixture as the fallback test: 4 keys × 600
    // buckets ⇒ 2,396 returns, projected stack 2,396 × 4 × 4 = 38,336 —
    // past a 10,000-row advisory threshold the message must report the
    // projection and its axes; the computation still completes
    val rows = for (k <- Seq("a", "b", "c", "d"); i <- 0 until 600)
      yield (k, i.toLong, 100.0 + 7.0 * math.sin(0.37 * i + k.hashCode % 5) +
        (if (k == "a") 0.11 * i else 0.09 * i))
    val df = rows.toDF("k", "t", "v")
    val heard = scala.collection.mutable.ArrayBuffer.empty[String]
    val out = graft.ops.Risk.leadLagCorr(df, "k", col("t"), col("v"),
      maxLag = 3, adviseStackRows = 10000L, advisor = heard += _)
    assert(out.collect().nonEmpty)
    assert(heard.size === 1, heard)
    assert(heard.head.contains("38336 rows") &&
      heard.head.contains("2396 returns") &&
      heard.head.contains("4 keys"), heard.head)
    spark.catalog.clearCache()
    // under the default nine-figure threshold the same call is silent
    val quiet = scala.collection.mutable.ArrayBuffer.empty[String]
    graft.ops.Risk.leadLagCorr(df, "k", col("t"), col("v"),
      maxLag = 3, advisor = quiet += _).collect()
    assert(quiet.isEmpty, quiet)
    spark.catalog.clearCache()
  }

  test("leadLagCorr refuses past maxInstruments, naming the cell count") {
    // two buckets per key: the guard counts keys that actually carry a
    // return (a single-bucket key can never enter the pair join)
    val df = Seq("A", "B", "C").flatMap(k =>
      Seq((k, 1L, 1.0), (k, 2L, 2.0))).toDF("k", "t", "v")
    val e = intercept[IllegalArgumentException] {
      graft.ops.Risk.leadLagCorr(df, "k", col("t"), col("v"),
        maxLag = 3, maxInstruments = 2L)
    }
    assert(e.getMessage.contains("3 instruments") &&
      e.getMessage.contains("21 pair-lag cells"), e.getMessage)
  }

  test("volCone: rolling-window vol envelope, incomplete windows dropped") {
    val rv = Seq(
      ("A", "2024-01-01", 0.01), ("A", "2024-01-02", 0.04),
      ("A", "2024-01-03", 0.09), ("A", "2024-01-04", 0.16)
    ).toDF("k", "bucket", "rv")
    val rows = graft.ops.Risk.volCone(rv, "k", "bucket", "rv",
      horizons = Seq(2, 5)).orderBy("horizon").collect()
    assert(rows.length === 1)                        // h=5 has no full window
    val r = rows.head
    def v(x: Double) = BigDecimal(math.sqrt(x)).setScale(9,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Int]("horizon") === 2)
    assert(r.getAs[Long]("n_windows") === 3L)
    assert(r.getAs[Double]("min_vol") === v(0.025))  // (0.01+0.04)/2
    assert(r.getAs[Double]("max_vol") === v(0.125))  // (0.09+0.16)/2
    // mirror the operator exactly: exact 9-dp decimal sum → double → /3
    val volSum = Seq(0.025, 0.065, 0.125)
      .map(x => BigDecimal(math.sqrt(x)).setScale(9, BigDecimal.RoundingMode.HALF_UP))
      .sum
    assert(r.getAs[Double]("mean_vol") ===
      BigDecimal(volSum.toDouble / 3).setScale(9,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("intradayProfile: per-hour |return| mean and quantity share") {
    val df = Seq(
      ("A", ts("2024-01-01 10:00:00"), 1L, 100.0, 2L),
      ("A", ts("2024-01-01 10:30:00"), 2L, 110.0, 3L),  // r = +0.1, hour 10
      ("A", ts("2024-01-01 11:00:00"), 3L, 99.0, 5L)    // r = −0.1, hour 11
    ).toDF("k", "t", "id", "v", "q")
    val rows = Risk.intradayProfile(df, "k", Seq(col("t"), col("id")),
      col("t"), col("v"), col("q")).orderBy("hour_of_day").collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[Int]("hour_of_day") === 10)
    assert(rows(0).getAs[Long]("n_ticks") === 2L)
    assert(rows(0).getAs[Double]("mean_abs_return") === 0.1)
    assert(rows(0).getAs[Double]("qty_share") === 0.5)  // 5 of 10
    assert(rows(1).getAs[Int]("hour_of_day") === 11)
    assert(rows(1).getAs[Double]("mean_abs_return") === 0.1)
    assert(rows(1).getAs[Double]("qty_share") === 0.5)
  }

  test("rangeVolatility: Parkinson/GK/RS match the closed forms on one bar") {
    // ticks 100,110,90,105 in one bar ⇒ O=100 H=110 L=90 C=105
    val df = Seq(
      ("A", ts("2024-01-01 10:00:00"), 1L, 100.0),
      ("A", ts("2024-01-01 10:01:00"), 2L, 110.0),
      ("A", ts("2024-01-01 10:02:00"), 3L, 90.0),
      ("A", ts("2024-01-01 10:03:00"), 4L, 105.0)
    ).toDF("k", "t", "id", "v")
    val r = Risk.rangeVolatility(df, "k", to_date(col("t")),
      Seq(col("t"), col("id")), "v").collect().head
    def r6(x: Double) =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val u = math.log(110.0 / 90.0)
    val c = math.log(105.0 / 100.0)
    val ln2 = math.log(2.0)
    assert(r.getAs[Long]("n_bars") === 1L)
    assert(r.getAs[Double]("parkinson") === r6(u * u / (4.0 * ln2)))
    assert(r.getAs[Double]("garman_klass") ===
      r6(u * u * 0.5 - (2.0 * ln2 - 1.0) * (c * c)))
    assert(r.getAs[Double]("rogers_satchell") ===
      r6(math.log(110.0 / 105.0) * math.log(110.0 / 100.0) +
         math.log(90.0 / 105.0) * math.log(90.0 / 100.0)))
  }

  test("rangeVolatility: a bar with non-positive low drops (log domain)") {
    val df = Seq(
      ("B", ts("2024-01-01 10:00:00"), 1L, 5.0),
      ("B", ts("2024-01-01 10:01:00"), 2L, 0.0)  // low = 0 ⇒ bar dropped
    ).toDF("k", "t", "id", "v")
    assert(Risk.rangeVolatility(df, "k", to_date(col("t")),
      Seq(col("t"), col("id")), "v").count() === 0L)
  }

  test("hurstExponent: period-4 alternation gives H = 1 over scales 1,2") {
    // returns +1,+1,−1,−1,+1,+1,−1,−1: Var(1)=1, Var(2)=4, m=4 blocks
    // sum to 0 (zero variance point drops) ⇒ slope ln4/ln2 = 2 ⇒ H = 1
    val vs = Seq(10.0, 11.0, 12.0, 11.0, 10.0, 11.0, 12.0, 11.0, 10.0)
    val df = vs.zipWithIndex.map { case (v, i) =>
      ("A", ts(f"2024-01-01 10:${i}%02d:00"), i.toLong, v)
    }.toDF("k", "t", "id", "v")
    val r = Risk.hurstExponent(df, "k", Seq(col("t"), col("id")), col("v"),
      scales = Seq(1, 2, 4)).collect().head
    assert(r.getAs[Long]("n_scales") === 2L)  // m=4 dropped: Var = 0
    assert(r.getAs[Double]("hurst") === 1.0)
  }

  test("corwinSchultz: zero-range days give zero spread; known pair matches the closed form") {
    // key Z: two days with H = L ⇒ β = γ = 0 ⇒ α = 0 ⇒ S = 0
    val z = Seq(
      ("Z", ts("2024-01-01 10:00:00"), 1L, 5.0),
      ("Z", ts("2024-01-02 10:00:00"), 2L, 5.0))
    // key A: day1 (H 102, L 100), day2 (H 103, L 99)
    val a = Seq(
      ("A", ts("2024-01-01 10:00:00"), 3L, 100.0),
      ("A", ts("2024-01-01 11:00:00"), 4L, 102.0),
      ("A", ts("2024-01-02 10:00:00"), 5L, 99.0),
      ("A", ts("2024-01-02 11:00:00"), 6L, 103.0))
    val out = Risk.corwinSchultz((z ++ a).toDF("k", "t", "id", "v"),
        "k", to_date(col("t")), Seq(col("t"), col("id")), "v")
      .orderBy("k").as[(String, Long, Double, Long)].collect()
    val x1 = math.log(102.0 / 100.0); val x0 = math.log(103.0 / 99.0)
    val beta = x1 * x1 + x0 * x0
    val g = math.log(103.0 / 99.0); val gamma = g * g
    val den = 3.0 - 2.0 * math.sqrt(2.0)
    val al = (math.sqrt(2.0 * beta) - math.sqrt(beta)) / den -
      math.sqrt(gamma / den)
    val sRaw = 2.0 * (math.exp(al) - 1.0) / (1.0 + math.exp(al))
    def fix(x: Double) =
      BigDecimal(math.max(x, 0.0)).setScale(12, BigDecimal.RoundingMode.HALF_UP)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.toSeq === Seq(
      ("A", 1L, fix(sRaw), if (sRaw < 0) 1L else 0L),
      ("Z", 1L, 0.0, 0L)))
  }

  test("instrumentProfile: every column equals its source operator's own output") {
    import graft.ops.Stats
    val prof = Risk.instrumentProfile(tickFixture, "k",
      Seq(col("t"), col("id")), "v", to_date(col("t"))).collect().head
    val sh = Stats.sharpe(tickFixture, "k", Seq(col("t"), col("id")),
      col("v")).collect().head
    val dd = Stats.maxDrawdown(tickFixture, "k", Seq(col("t"), col("id")),
      col("v")).collect().head
    val rv = Risk.rangeVolatility(tickFixture, "k", to_date(col("t")),
      Seq(col("t"), col("id")), "v").collect().head
    assert(prof.getAs[Long]("n_returns") === sh.getAs[Long]("n_returns"))
    assert(prof.getAs[Double]("mean_return") === sh.getAs[Double]("mean_return"))
    assert(prof.getAs[Double]("sharpe") === sh.getAs[Double]("sharpe"))
    assert(prof.getAs[Double]("max_drawdown") === dd.getAs[Double]("max_drawdown"))
    assert(prof.getAs[Long]("n_ticks") === dd.getAs[Long]("n_ticks"))
    assert(prof.getAs[Double]("parkinson") === rv.getAs[Double]("parkinson"))
    // 4 returns < 5 lags: the composite surfaces ljungBox's honest NULL
    assert(prof.isNullAt(prof.fieldIndex("q_stat")))
    // scales 1 and 2 both have >= 2 complete blocks on 4 returns, so
    // hurst is defined — and must be the standalone operator's number
    val hu = Risk.hurstExponent(tickFixture, "k", Seq(col("t"), col("id")),
      col("v")).collect().head
    assert(prof.getAs[Double]("hurst") === hu.getAs[Double]("hurst"))
  }

  test("hurstExponent: single surviving scale point yields NULL hurst") {
    // 3 returns: m=2 has exactly 1 complete block ⇒ Var undefined (0,
    // drops); only m=1 survives ⇒ k = 1 < 2 ⇒ hurst NULL
    val df = Seq(
      ("A", ts("2024-01-01 10:00:00"), 1L, 1.0),
      ("A", ts("2024-01-01 10:01:00"), 2L, 3.0),
      ("A", ts("2024-01-01 10:02:00"), 3L, 2.0),
      ("A", ts("2024-01-01 10:03:00"), 4L, 5.0)
    ).toDF("k", "t", "id", "v")
    val r = Risk.hurstExponent(df, "k", Seq(col("t"), col("id")), col("v"),
      scales = Seq(1, 2)).collect().head
    assert(r.getAs[Long]("n_scales") === 1L)
    assert(r.isNullAt(r.fieldIndex("hurst")))
  }
}
