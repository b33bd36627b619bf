package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Joins, Stats, Windows}

/** As-of join, range join, and analytic window semantics. */
class OpsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  def ts(s: String) = Timestamp.valueOf(s)

  test("asOfJoin picks the latest right row at or before each left row") {
    val quotes = Seq( // (sym, ts, bid)
      ("A", ts("2024-01-01 10:00:00"), 1L, 100.0),
      ("A", ts("2024-01-01 10:05:00"), 2L, 101.0),
      ("A", ts("2024-01-01 10:10:00"), 3L, 102.0),
      ("B", ts("2024-01-01 10:02:00"), 4L, 50.0)
    ).toDF("sym", "qts", "qid", "bid")
    val trades = Seq( // (sym, ts, qty)
      ("A", ts("2024-01-01 10:04:59"), 10L), // → bid 100
      ("A", ts("2024-01-01 10:05:00"), 11L), // equal ts visible → 101
      ("A", ts("2024-01-01 10:30:00"), 12L), // → latest 102
      ("B", ts("2024-01-01 10:00:00"), 13L), // before any quote → null
      ("C", ts("2024-01-01 10:00:00"), 14L)  // no quotes at all → null
    ).toDF("sym", "tts", "tid")
    val out = Joins.asOfJoin(trades, quotes, Seq("sym"), "tts", "qts",
        Seq(("bid", "last_bid")),
        leftTiebreak = Some("tid"), rightTiebreak = Some("qid"))
      .select("tid", "last_bid").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(10L) === Some(100.0))
    assert(out(11L) === Some(101.0))
    assert(out(12L) === Some(102.0))
    assert(out(13L) === None)
    assert(out(14L) === None)
  }

  test("asOfJoin ties at equal right ts resolve to the greatest tiebreak") {
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 1L, 1.0),
      ("A", ts("2024-01-01 10:00:00"), 2L, 2.0) // same ts, higher id wins
    ).toDF("sym", "qts", "qid", "bid")
    val trades = Seq(("A", ts("2024-01-01 10:00:00"), 9L)).toDF("sym", "tts", "tid")
    val out = Joins.asOfJoin(trades, quotes, Seq("sym"), "tts", "qts",
        Seq(("bid", "last_bid")), rightTiebreak = Some("qid"))
      .select("last_bid").as[Double].head()
    assert(out === 2.0)
  }

  test("rangeJoin matches only rows inside the interval") {
    val left = Seq(("k", ts("2024-01-05 00:00:00")), ("k", ts("2024-02-01 00:00:00")))
      .toDF("k1", "lts")
    val right = Seq(("k", ts("2024-01-01 00:00:00"), ts("2024-01-10 00:00:00")))
      .toDF("k2", "lo", "hi")
    val out = Joins.rangeJoin(left.withColumnRenamed("k1", "k"),
      right.withColumnRenamed("k2", "k"), Seq("k"), col("lts"), col("lo"), col("hi"))
    assert(out.count() === 1)
  }

  test("sessionize splits on gaps greater than the threshold") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:10:00"), 2L), // same session (10 min)
      (1L, ts("2024-01-01 11:00:00"), 3L), // 50 min gap → new session
      (2L, ts("2024-01-01 10:00:00"), 4L)
    ).toDF("user_id", "ts", "event_id")
    val sess = Windows.sessionize(df, Seq("user_id"), "ts", "event_id", 1800)
    val stats = Windows.sessionStats(sess, Seq("user_id"), "ts")
      .select("user_id", "session_id", "n_events", "duration_sec")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(stats === Set((1L, 1L, 2L, 600L), (1L, 2L, 1L, 0L), (2L, 1L, 1L, 0L)))
  }

  test("movingAgg sums exactly the trailing frame") {
    val df = Seq((1L, 1L, 10.0), (1L, 2L, 20.0), (1L, 3L, 30.0), (1L, 4L, 40.0))
      .toDF("k", "seq", "v")
    val out = Windows.movingAgg(df, Seq("k"), Seq("seq"), "v", 2)
      .select("seq", "moving_sum").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out === Map(1L -> 10.0, 2L -> 30.0, 3L -> 60.0, 4L -> 90.0))
  }

  test("ohlcBars: deterministic open/close under same-timestamp ties") {
    val df = Seq(
      // (sym, ts, seq, price) — two ticks share the opening timestamp:
      // the one with lower seq must be the open
      ("A", ts("2024-01-01 09:00:00"), 1L, 10.0),
      ("A", ts("2024-01-01 09:00:00"), 2L, 99.0),
      ("A", ts("2024-01-01 15:59:00"), 3L, 7.0),
      ("A", ts("2024-01-01 16:00:00"), 4L, 12.0),
      ("B", ts("2024-01-01 10:00:00"), 5L, 5.0)
    ).toDF("sym", "t", "seq", "price")
    val bars = graft.ops.Stats.ohlcBars(df, Seq("sym"),
        to_date(col("t")), Seq(col("t"), col("seq")), "price")
      .select("sym", "open", "high", "low", "close", "n_ticks")
      .as[(String, Double, Double, Double, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(bars("A") === (("A", 10.0, 99.0, 7.0, 12.0, 4L)))
    assert(bars("B") === (("B", 5.0, 5.0, 5.0, 5.0, 1L)))
  }

  test("bucketByCutpoints: near-equal populations, ordered non-overlapping ranges") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val n = ev.filter($"value".isNotNull).count()
    val stats = graft.ops.Stats.bucketStats(ev, "value", 10)
      .select("bucket", "n", "lo", "hi")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(stats.map(_._1).toSeq === (1L to 10L))
    assert(stats.map(_._2).sum === n)
    // sketch relErr 0.001 at this n → each decile within ±20% of n/10
    stats.foreach { case (b, cnt, _, _) =>
      assert(math.abs(cnt - n / 10.0) <= n / 10.0 * 0.2, s"bucket $b count $cnt")
    }
    // ranges are ordered: bucket k's max <= bucket k+1's min
    stats.sliding(2).foreach {
      case Array((_, _, _, hi1), (_, _, lo2, _)) => assert(hi1 <= lo2)
      case _ => ()
    }
  }

  test("funnel is progressive: later-stage events before the prior stage don't count") {
    import graft.ops.Stats
    val ev = Seq(
      // u1 completes in order
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:01:00")),
      (1L, "purchase", ts("2024-01-01 10:02:00")),
      // u2 clicked BEFORE viewing — conversion must not count the click
      (2L, "click", ts("2024-01-01 09:00:00")),
      (2L, "view", ts("2024-01-01 10:00:00")),
      // u3 views only
      (3L, "view", ts("2024-01-01 11:00:00")),
      // u4 never views — appears in no stage
      (4L, "purchase", ts("2024-01-01 11:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val got = Stats.funnel(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
      .as[(String, Long)].collect().toMap
    assert(got === Map("view" -> 3L, "click" -> 1L, "purchase" -> 1L))
  }

  test("cohortRetention offsets are anchored to each user's first event date") {
    import graft.ops.Stats
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-02 10:00:00")),
      (2L, ts("2024-01-01 23:00:00")), (2L, ts("2024-01-02 01:00:00")),
      (3L, ts("2024-01-02 10:00:00")), (3L, ts("2024-01-12 10:00:00")) // beyond window
    ).toDF("user_id", "ts")
    val got = Stats.cohortRetention(ev, "user_id", "ts", 7)
      .as[(java.sql.Date, Long, Long)].collect()
      .map(r => (r._1.toString, r._2) -> r._3).toMap
    assert(got === Map(
      ("2024-01-01", 0L) -> 2L, ("2024-01-01", 1L) -> 2L,
      ("2024-01-02", 0L) -> 1L))
  }

  test("zScoreAnomalies flags only the outlier, z from exact moments") {
    import graft.ops.Stats
    // 10 values at 10.0 plus one at 100.0: the spike is the only |z|>=3
    val rows = (1L to 10L).map(i => (i, "a", 10.0)) :+ (11L, "a", 100.0)
    val got = Stats.zScoreAnomalies(rows.toDF("event_id", "event_type", "value"),
        "event_type", "value", "event_id", 3.0)
      .as[(Long, String, Double, Double)].collect()
    assert(got.map(_._1).toSeq === Seq(11L))
    assert(got.head._4 > 3.0)
    // degenerate groups (one row, or zero variance) are excluded, not a
    // DIVIDE_BY_ZERO crash under ANSI mode
    val degenerate = Seq((1L, "single", 5.0), (2L, "flat", 7.0), (3L, "flat", 7.0))
      .toDF("event_id", "event_type", "value")
    assert(Stats.zScoreAnomalies(degenerate,
      "event_type", "value", "event_id", 3.0).isEmpty)
  }

  test("gapFillHourly carries the last observation across missing hours") {
    import graft.ops.Windows
    val ev = Seq(
      ("a", ts("2024-01-01 00:10:00"), 1.0),
      ("a", ts("2024-01-01 00:50:00"), 3.0), // hour 0 avg = 2.0
      ("a", ts("2024-01-01 03:00:00"), 7.0), // hours 1-2 are gaps
      ("b", ts("2024-01-01 02:00:00"), 5.0)  // leading gap for b
    ).toDF("event_type", "ts", "value")
    val got = Windows.gapFillHourly(ev, "event_type", "ts", "value")
      .as[(String, Timestamp, Option[Double], Boolean)].collect()
      .map(r => (r._1, r._2.toString) -> (r._3, r._4)).toMap
    assert(got(("a", "2024-01-01 00:00:00.0")) === ((Some(2.0), false)))
    assert(got(("a", "2024-01-01 01:00:00.0")) === ((Some(2.0), true)))  // filled
    assert(got(("a", "2024-01-01 02:00:00.0")) === ((Some(2.0), true)))
    assert(got(("a", "2024-01-01 03:00:00.0")) === ((Some(7.0), false)))
    assert(got(("b", "2024-01-01 00:00:00.0")) === ((None, true)))       // pre-first
    assert(got(("b", "2024-01-01 02:00:00.0")) === ((Some(5.0), false)))
    assert(got.size === 8) // 2 keys × hours 0..3
  }

  test("gapFillHourly refuses a grid past maxGridCells, naming both factors") {
    import graft.ops.Windows
    val ev = Seq(
      ("a", ts("2024-01-01 00:00:00"), 1.0),
      ("a", ts("2024-01-02 00:00:00"), 2.0), // 25 hours of span
      ("b", ts("2024-01-01 12:00:00"), 3.0)
    ).toDF("event_type", "ts", "value")
    val err = intercept[IllegalArgumentException] {
      Windows.gapFillHourly(ev, "event_type", "ts", "value", maxGridCells = 10L)
    }
    assert(err.getMessage.contains("2 keys x 25 hours"), err.getMessage)
    // at the default bound the same input fills fine
    assert(Windows.gapFillHourly(ev, "event_type", "ts", "value").count() === 50)
  }

  test("vwap weights by quantity and yields NULL on zero total volume") {
    import org.apache.spark.sql.functions.col
    val ticks = Seq(
      ("a", 10.0, 1L), ("a", 20.0, 3L),   // vwap = (10 + 60) / 4 = 17.5
      ("z", 5.0, 0L), ("z", 7.0, 0L)      // zero volume → NULL vwap
    ).toDF("sym", "price", "qty")
    val got = Stats.vwap(ticks, Seq("sym"), col("price"), col("qty"))
      .as[(String, Long, Double, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(got("a") === (("a", 2L, 4.0, Some(17.5))))
    assert(got("z") === (("z", 2L, 0.0, None)))
  }

  test("rollingStats: exact trailing moments, NULL stddev on one-row frames") {
    import org.apache.spark.sql.functions.col
    val ticks = Seq(("a", 1L, 2.0), ("a", 2L, 4.0), ("a", 3L, 6.0))
      .toDF("sym", "seq", "price")
    val got = Stats.rollingStats(ticks, "sym", Seq(col("seq")), col("price"), 2)
      .select("seq", "roll_n", "roll_mean", "roll_std")
      .as[(Long, Long, Double, Option[Double])].collect().sortBy(_._1)
    assert(got(0) === ((1L, 1L, 2.0, None)))                  // frame = [2]
    assert(got(1) === ((2L, 2L, 3.0, Some(1.414214))))        // [2,4], round 6
    assert(got(2)._3 === 5.0)                                 // [4,6]
  }

  test("twap weights each price by its holding interval; last tick drops out") {
    import org.apache.spark.sql.functions.col
    // price 10 held 3 s, price 20 held 1 s → twap (30+20)/4 = 12.5;
    // the 99.0 tick at the end has no next tick and contributes nothing
    val ticks = Seq(
      ("a", ts("2024-01-01 00:00:00"), 1L, 10.0),
      ("a", ts("2024-01-01 00:00:03"), 2L, 20.0),
      ("a", ts("2024-01-01 00:00:04"), 3L, 99.0)
    ).toDF("sym", "t", "seq", "price")
    val got = Stats.twap(ticks, Seq("sym"), col("t"), col("seq"), col("price"))
      .as[(String, Long, Double)].collect()
    assert(got.toSeq === Seq(("a", 2L, 12.5)))
  }

  test("maxDrawdown finds the deepest peak-to-trough decline per key") {
    import org.apache.spark.sql.functions.col
    // a: 10 → 4 (dd 6) → 12 → 9 (dd 3): max 6 from peak 12
    val ticks = Seq(("a", 1L, 10.0), ("a", 2L, 4.0), ("a", 3L, 12.0),
        ("a", 4L, 9.0), ("b", 1L, 5.0))
      .toDF("sym", "seq", "price")
    val got = Stats.maxDrawdown(ticks, "sym", Seq(col("seq")), col("price"))
      .as[(String, Double, Double, Long)].collect().map(r => r._1 -> r).toMap
    assert(got("a") === (("a", 6.0, 12.0, 4L)))
    assert(got("b") === (("b", 0.0, 5.0, 1L)))
  }

  test("rsi: all-gain frame hits 100, mixed frame splits exactly, flat frame is NULL") {
    import org.apache.spark.sql.functions.col
    val ticks = Seq(("a", 1L, 10.0), ("a", 2L, 12.0), ("a", 3L, 11.0),
        ("a", 4L, 11.0), ("b", 1L, 5.0), ("b", 2L, 5.0))
      .toDF("sym", "seq", "price")
    val got = Stats.rsi(ticks, "sym", Seq(col("seq")), col("price"), 2)
      .select("sym", "seq", "n_deltas", "rsi")
      .as[(String, Long, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got(("a", 1L)) === ((0L, None)))            // no delta yet
    assert(got(("a", 2L)) === ((1L, Some(100.0))))     // frame {+2}: all gain
    assert(got(("a", 3L)) === ((2L, Some(66.666667)))) // {+2,-1}: 100·2/3
    assert(got(("a", 4L)) === ((2L, Some(0.0))))       // {-1,0}: all loss
    assert(got(("b", 2L)) === ((1L, None)))            // flat: no signal
  }

  test("ewma folds the frame oldest-to-newest from the frame's first value") {
    import org.apache.spark.sql.functions.col
    val ticks = Seq(("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 30.0),
        ("a", 4L, 40.0)).toDF("sym", "seq", "price")
    val got = Stats.ewma(ticks, "sym", Seq(col("seq")), col("price"),
        alpha = 0.25, window = 3)
      .select("seq", "ewma").as[(Long, Double)].collect().toMap
    assert(got(1L) === 10.0)
    assert(got(2L) === 12.5)     // 10·0.75 + 20·0.25
    assert(got(3L) === 16.875)   // 12.5·0.75 + 30·0.25
    assert(got(4L) === 26.875)   // frame slides: 20 → 22.5 → 26.875
  }

  test("bollinger: bands at mean ± k·std, %B positions the price, flat frame has no %B") {
    import org.apache.spark.sql.functions.col
    // a: [1,2,3] window 3 → at seq 3 mean 2, sample std 1, k=2 bands [0,4],
    // %B = (3-0)/4; b flat → std 0 → degenerate bands, %B undefined
    val ticks = Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0),
        ("b", 1L, 5.0), ("b", 2L, 5.0), ("b", 3L, 5.0))
      .toDF("sym", "seq", "price")
    val got = Stats.bollinger(ticks, "sym", Seq(col("seq")), col("price"),
        window = 3, k = 2.0)
      .select("sym", "seq", "bb_mid", "bb_upper", "bb_lower", "pct_b")
      .as[(String, Long, Double, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    assert(got(("a", 3L)) === ((2.0, Some(4.0), Some(0.0), Some(0.75))))
    assert(got(("a", 1L)) === ((1.0, None, None, None))) // one-row frame
    assert(got(("b", 3L)) === ((5.0, Some(5.0), Some(5.0), None))) // flat
  }

  test("bollinger: a small k collapsing the rounded bands yields NULL %B, not divide-by-zero") {
    import org.apache.spark.sql.functions.col
    // std rounds to 0.000001 (> 0) but k·std rounds AWAY at 6 dp, so
    // both bands land on the mid — a std-based %B guard would divide by
    // zero (ANSI failure) on this valid data
    val ticks = Seq(("a", 1L, 5.0), ("a", 2L, 5.0), ("a", 3L, 5.000001))
      .toDF("sym", "seq", "price")
    val got = Stats.bollinger(ticks, "sym", Seq(col("seq")), col("price"),
        window = 3, k = 0.4)
      .filter(col("seq") === 3L)
      .select("bb_upper", "bb_lower", "pct_b")
      .as[(Option[Double], Option[Double], Option[Double])].collect().head
    assert(got._1 === got._2)   // rounded bands collapsed
    assert(got._3 === None)     // %B undefined, no error
  }

  test("sharpe: symmetric returns score 0, a single return has no ratio") {
    import org.apache.spark.sql.functions.col
    // a: 100→110→99 gives returns +0.1, -0.1 (exact at 9 dp): mean 0 ⇒
    // sharpe 0; b has one return ⇒ NULL ratio; c's first price is 0 so
    // its only return is undefined ⇒ c absent entirely
    val ticks = Seq(("a", 1L, 100.0), ("a", 2L, 110.0), ("a", 3L, 99.0),
        ("b", 1L, 100.0), ("b", 2L, 100.0), ("c", 1L, 0.0), ("c", 2L, 5.0))
      .toDF("sym", "seq", "price")
    val got = Stats.sharpe(ticks, "sym", Seq(col("seq")), col("price"))
      .select("sym", "n_returns", "mean_return", "sharpe")
      .as[(String, Long, Double, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("a") === ((2L, 0.0, Some(0.0))))
    assert(got("b") === ((1L, 0.0, None)))
    assert(!got.contains("c"))
  }

  test("returnAutocorr: alternating returns are -1, constant returns undefined") {
    import org.apache.spark.sql.functions.col
    // a: 100,200,100,200,100 → returns 1,-0.5,1,-0.5 — perfectly
    // alternating ⇒ lag-1 autocorr −1 over 3 pairs; b: steady +10%
    // growth ⇒ zero return variance ⇒ NULL
    val ticks = Seq(("a", 1L, 100.0), ("a", 2L, 200.0), ("a", 3L, 100.0),
        ("a", 4L, 200.0), ("a", 5L, 100.0),
        ("b", 1L, 100.0), ("b", 2L, 110.0), ("b", 3L, 121.0))
      .toDF("sym", "seq", "price")
    val got = Stats.returnAutocorr(ticks, "sym", Seq(col("seq")), col("price"))
      .select("sym", "n_pairs", "autocorr")
      .as[(String, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(("a")) === ((3L, Some(-1.0))))
    assert(got(("b")) === ((1L, None)))
  }

  test("realizedVariance: day's Σr² exactly, boundary return lands in the later day") {
    import org.apache.spark.sql.functions.{col, to_date}
    // day 1: 100→110 (+0.1); day 2 opens 110→99 (−0.1, the OVERNIGHT
    // return belongs to day 2) then 99→108.9 (+0.1): RV₁ = 0.01,
    // RV₂ = 0.02 exactly (returns are exact 9dp decimals)
    val ticks = Seq(
      ("a", ts("2024-01-01 10:00:00"), 1L, 100.0),
      ("a", ts("2024-01-01 11:00:00"), 2L, 110.0),
      ("a", ts("2024-01-02 09:00:00"), 3L, 99.0),
      ("a", ts("2024-01-02 10:00:00"), 4L, 108.9)
    ).toDF("sym", "t", "seq", "price")
    val got = Stats.realizedVariance(ticks, "sym",
        Seq(col("t"), col("seq")), col("price"), to_date(col("t")))
      .select("sym", "bucket", "n_returns", "realized_variance")
      .as[(String, java.sql.Date, Long, Double)].collect()
      .map(r => r._2.toString -> ((r._3, r._4))).toMap
    assert(got("2024-01-01") === ((1L, 0.01)))
    assert(got("2024-01-02") === ((2L, 0.02)))
  }

  test("amihudIlliquidity: |return| per traded value, zero-consideration ticks drop") {
    import org.apache.spark.sql.functions.{col, to_date}
    // tick 2: r = +0.1, traded value 110·5 = 550 → il = 0.1/550 rounded
    // to 12 dp; tick 3 has qty 0 (no consideration) and contributes
    // nothing even though its return is defined
    val ticks = Seq(
      ("a", ts("2024-01-01 10:00:00"), 1L, 100.0, 5L),
      ("a", ts("2024-01-01 11:00:00"), 2L, 110.0, 5L),
      ("a", ts("2024-01-01 12:00:00"), 3L, 120.0, 0L)
    ).toDF("sym", "t", "seq", "price", "qty")
    val got = Stats.amihudIlliquidity(ticks, "sym",
        Seq(col("t"), col("seq")), col("price"), col("qty"), to_date(col("t")))
      .select("sym", "n_ticks", "illiq")
      .as[(String, Long, Double)].collect()
    assert(got.toSeq === Seq(("a", 1L, 0.000181818182)))
  }

  test("winsorizedStats clips at the key's interpolated percentiles, counts both tails") {
    import org.apache.spark.sql.functions.col
    // a: 1..9 plus outlier 1000. p10 over 10 sorted values interpolates
    // to 1.9, p90 to 9 + 0.1·(1000−9) = 108.1; clip 1→1.9, 1000→108.1 ⇒
    // winsorized mean (1.9 + 44 + 108.1)/10 = 15.4 exactly
    val ticks = ((1 to 9).map(i => ("a", i.toDouble)) :+ (("a", 1000.0)))
      .toDF("sym", "price")
    val got = Stats.winsorizedStats(ticks, "sym", col("price"), 0.1, 0.9)
      .select("sym", "n", "n_clipped_lo", "n_clipped_hi",
        "lo_cut", "hi_cut", "winsorized_mean")
      .as[(String, Long, Long, Long, Double, Double, Double)].collect()
    assert(got.toSeq === Seq(("a", 10L, 1L, 1L, 1.9, 108.1, 15.4)))
  }

  test("betaVsMarket: self-identical series has beta 1, scaled series scales beta") {
    import org.apache.spark.sql.functions.col
    // two instruments: b moves 2× a. market m_t = (a_t + b_t)/2 = 1.5·a_t
    // ⇒ beta(a) = cov(a, 1.5a)/var(1.5a) = 1/1.5, beta(b) = 2/1.5
    val ticks = Seq(("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 40.0),
        ("b", 1L, 20.0), ("b", 2L, 40.0), ("b", 3L, 80.0))
      .toDF("sym", "bkt", "price")
    val got = Stats.betaVsMarket(ticks, "sym", col("bkt"), col("price"))
      .select("sym", "beta").as[(String, Double)].collect().toMap
    assert(math.abs(got("a") - 1.0 / 1.5) < 1e-6, got)
    assert(math.abs(got("b") - 2.0 / 1.5) < 1e-6, got)
  }

  test("longestUpStreak counts strictly-rising runs; flat keys report 0") {
    import org.apache.spark.sql.functions.col
    // a: 1,2,3 (streak 2), 2, 3,4 (streak 2) → max 2; c: 5,5 → 0
    val ticks = Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0),
        ("a", 4L, 2.0), ("a", 5L, 3.0), ("a", 6L, 4.0),
        ("c", 1L, 5.0), ("c", 2L, 5.0))
      .toDF("sym", "seq", "price")
    val got = Windows.longestUpStreak(ticks, "sym", Seq(col("seq")), col("price"))
      .as[(String, Long)].collect().toMap
    assert(got === Map("a" -> 2L, "c" -> 0L))
  }

  test("fuzzyPairs links within blocks only and refuses a hot block") {
    import org.apache.spark.sql.functions.{col, element_at, split, lit}
    val names = Seq((1L, "red widget"), (2L, "red widgit"), (3L, "red gear"),
        (4L, "blue widget"), (5L, "blue widgets"))
      .toDF("id", "name")
    val blk = element_at(split(col("name"), " "), 1)
    val got = Joins.fuzzyPairs(names, "id", "name", blk, 2)
      .select("a_id", "b_id", "edit_dist").as[(Long, Long, Int)].collect().toSet
    // (1,2) dist 1; (4,5) dist 1; (1,4)/(2,5) cross blocks — unseen;
    // (1,3) "widget"→"gear" dist > 2 — verified away
    assert(got === Set((1L, 2L, 1), (4L, 5L, 1)))
    val err = intercept[IllegalArgumentException] {
      Joins.fuzzyPairs(names, "id", "name", lit("all"), 2, maxBlock = 3).count()
    }
    assert(err.getMessage.contains("maxBlock"))
  }

  test("dupShingleFraction: shared shingles count, unique ones do not") {
    import graft.text.Dedup
    val docs = Seq(
      (1L, "a b c d e f"),      // shingles: "a b c d e", "b c d e f"
      (2L, "a b c d e zzz"),    // shares "a b c d e"
      (3L, "totally different") // short doc → whole-text shingle, unique
    ).toDF("doc_id", "text")
    val got = Dedup.dupShingleFraction(docs, "doc_id", "text", 5)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 2L, 1L, 0.5)))
    assert(got(2L) === ((2L, 2L, 1L, 0.5)))
    assert(got(3L) === ((3L, 1L, 0L, 0.0)))
  }

  test("labelCentroids averages each dimension per label") {
    import graft.vector.Similarity
    val emb = Seq(
      (1L, Seq(1.0f, 2.0f), 0), (2L, Seq(3.0f, 6.0f), 0),
      (3L, Seq(10.0f, 0.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.labelCentroids(emb, "label", "embedding")
      .as[(Int, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got === Map(
      (0, 0L) -> 2.0, (0, 1L) -> 4.0, (1, 0L) -> 10.0, (1, 1L) -> 0.0))
  }

  test("skewReport ranks hot keys with exact share and imbalance") {
    // 10 rows: key h has 6, a has 3, b has 1 → 3 keys, mean 10/3
    val df = (Seq.fill(6)("h") ++ Seq.fill(3)("a") ++ Seq("b"))
      .zipWithIndex.map { case (k, i) => (k, i) }.toDF("key", "payload")
    val got = graft.ops.Joins.skewReport(df, Seq("key"), topK = 2)
      .select("key", "cnt", "rank", "share", "imbalance")
      .as[(String, Long, Int, Double, Double)].collect()
    assert(got.toSeq === Seq(
      ("h", 6L, 1, 0.6, 6.0 * 3 / 10), // imbalance 1.8: ~2 fair shares
      ("a", 3L, 2, 0.3, 3.0 * 3 / 10)))
    intercept[IllegalArgumentException] {
      graft.ops.Joins.skewReport(df, Seq("key"), topK = 0)
    }
  }

  test("longestUnderwaterSpell counts consecutive below-peak ticks; rising keys emit 0") {
    // u: 5,3,4,6,2,1,3 → peaks 5,5,5,6,6,6,6 → underwater spells 2 then 3
    // r: strictly rising → never below peak → 0
    val ticks = (Seq(5, 3, 4, 6, 2, 1, 3).zipWithIndex.map {
      case (v, i) => ("u", i.toLong, v.toDouble)
    } ++ Seq(("r", 0L, 1.0), ("r", 1L, 2.0), ("r", 2L, 3.0)))
      .toDF("sym", "seq", "price")
    val got = graft.ops.Windows.longestUnderwaterSpell(
        ticks, "sym", Seq(col("seq")), col("price"))
      .as[(String, Long)].collect().toMap
    assert(got === Map("u" -> 3L, "r" -> 0L))
  }

  test("concentration: monopoly day scores 1, even split 1/k, zero volume is null") {
    val rows = Seq(
      ("d1", "a", 10L), ("d1", "b", 0L), // monopoly: a owns everything
      ("d2", "a", 5L), ("d2", "b", 5L), // even 2-way split → 0.5
      ("d3", "a", 0L), ("d3", "b", 0L)) // no volume → undefined
      .toDF("day", "sym", "qty")
    val got = graft.ops.Stats.concentration(rows, Seq("day"), "sym", col("qty"))
      .as[(String, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("d1") === ((2L, 10L, Some(1.0))))
    assert(got("d2") === ((2L, 10L, Some(0.5))))
    assert(got("d3") === ((2L, 0L, None)))
  }

  test("corrMatrix: affine series correlate ±1, constant series are null, pairs emit once") {
    // b = 2a+1 (corr 1), c = -a (corr -1), d constant (undefined)
    val ticks = (1 to 8).flatMap { h =>
      val v = h.toDouble
      Seq(("a", h, v), ("b", h, 2 * v + 1), ("c", h, -v), ("d", h, 5.0))
    }.toDF("sym", "bkt", "price")
    val got = Stats.corrMatrix(ticks, "sym", col("bkt"), col("price"))
      .as[(String, String, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    assert(got.size === 6) // 4 choose 2, each pair exactly once, a<b order
    assert(got(("a", "b")) === Some(1.0))
    assert(got(("a", "c")) === Some(-1.0))
    assert(got(("b", "c")) === Some(-1.0))
    assert(got(("a", "d")) === None) // constant side: undefined, not ÷0
    // co-observation: keys never sharing a bucket produce no pair row
    val sparse = Seq(("x", 1, 1.0), ("y", 2, 2.0)).toDF("sym", "bkt", "price")
    assert(Stats.corrMatrix(sparse, "sym", col("bkt"), col("price")).count() === 0)
  }

  test("corrMatrix refuses past maxInstruments, naming the instrument count") {
    val ticks = Seq(("a", 1, 1.0), ("b", 1, 2.0), ("c", 1, 3.0))
      .toDF("sym", "bkt", "price")
    val e = intercept[IllegalArgumentException] {
      Stats.corrMatrix(ticks, "sym", col("bkt"), col("price"),
        maxInstruments = 2L)
    }
    assert(e.getMessage.contains("3 instruments") &&
      e.getMessage.contains("maxInstruments=2"))
  }

  test("mergeIntervals: overlap and touch coalesce, invalid intervals drop") {
    // A: [0,10]+[5,15] overlap, [15,20] touches ⇒ island [0,20];
    // [30,40] stands alone; [50,45] is invalid (s > e) and drops
    val df = Seq(
      ("A", 0L, 10L, 1L), ("A", 5L, 15L, 2L), ("A", 15L, 20L, 3L),
      ("A", 30L, 40L, 4L), ("A", 50L, 45L, 5L),
      ("B", 7L, 7L, 6L) // zero-length interval: one island, zero cover
    ).toDF("k", "s", "e", "id")
    val out = graft.ops.Windows.mergeIntervals(df, Seq("k"),
        col("s"), col("e"), col("id"))
      .orderBy("k").as[(String, Long, Long, Long)].collect()
    assert(out.toSeq === Seq(("A", 4L, 2L, 30L), ("B", 1L, 1L, 0L)))
  }

  test("rollingBeta: unit slope vs self-driven market, zero for a flat name, NULL warm-up") {
    // market m_t = (a_t + 5)/2 ⇒ A's slope vs market is exactly 2,
    // B (constant 5) has zero covariance ⇒ beta 0; first bucket of each
    // key has an incomplete 2-frame ⇒ NULL
    val ticks = Seq(
      ("A", 1, 1.0), ("A", 2, 2.0), ("A", 3, 4.0),
      ("B", 1, 5.0), ("B", 2, 5.0), ("B", 3, 5.0)
    ).toDF("sym", "bkt", "price")
    val out = Stats.rollingBeta(ticks, "sym", col("bkt"), col("price"), 2)
      .orderBy("sym", "bucket")
      .as[(String, Int, Long, Option[Double])].collect()
    assert(out.toSeq === Seq(
      ("A", 1, 1L, None), ("A", 2, 2L, Some(2.0)), ("A", 3, 2L, Some(2.0)),
      ("B", 1, 1L, None), ("B", 2, 2L, Some(0.0)), ("B", 3, 2L, Some(0.0))))
  }

  test("ljungBox: Q matches the pinned-order reference on an alternating series") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // values 1,2,1,2,… ⇒ returns +1, −0.5 alternating (exact binary
    // doubles, so the reference power sums below are exact too)
    val vals = Seq.tabulate(10)(i => if (i % 2 == 0) 1.0 else 2.0)
    val df = vals.zipWithIndex.map { case (v, i) => ("A", ts(i), i.toLong, v) }
      .toDF("k", "t", "id", "v")
    val got = graft.ops.Stats.ljungBox(df, "k", Seq(col("t"), col("id")),
      col("v"), maxLag = 5).collect().head
    // reference mirrors the operator's operation order exactly
    val r = Seq.tabulate(9)(i => if (i % 2 == 0) 1.0 else -0.5)
    val n = r.size
    def r12(x: Double) =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val s1 = r.sum; val s2 = r.map(x => x * x).sum
    val rbar = s1 / n
    val c0n = s2 - s1 * rbar
    val terms = (1 to 5).map { k =>
      val pairs = (k until n).map(t => (r(t), r(t - k)))
      val p = pairs.map { case (a, b) => a * b }.sum
      val a = pairs.map(_._1).sum; val b = pairs.map(_._2).sum
      val cnt = pairs.size
      val rho = r12((p - rbar * (a + b) + cnt * (rbar * rbar)) / c0n)
      r12(rho * rho / (n - k))
    }
    val want = BigDecimal(n.toLong * (n + 2) * terms.sum)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getAs[Long]("n_returns") === 9L)
    assert(got.getAs[Int]("n_lags") === 5)
    assert(got.getAs[Double]("q_stat") === want)
  }

  test("ljungBox: constant series (zero variance) and short series yield NULL Q") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val const = Seq.tabulate(8)(i => ("C", ts(i), i.toLong, 5.0))
      .toDF("k", "t", "id", "v")
    val c = graft.ops.Stats.ljungBox(const, "k", Seq(col("t"), col("id")),
      col("v")).collect().head
    assert(c.isNullAt(c.fieldIndex("q_stat"))) // c0n = 0
    val short = Seq.tabulate(4)(i => ("S", ts(i), i.toLong, (i + 1).toDouble))
      .toDF("k", "t", "id", "v")
    val s = graft.ops.Stats.ljungBox(short, "k", Seq(col("t"), col("id")),
      col("v")).collect().head
    assert(s.getAs[Long]("n_returns") === 3L) // n <= maxLag
    assert(s.isNullAt(s.fieldIndex("q_stat")))
  }
}
