package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{NearestJoin, Seasonality, SpotCorr, TextAnalysis}

/** Round-10 third batch: nearest-temporal join (j7), streaming merge
  * totals (st11 — oracle-gated; batch semantics here), Zipf fit,
  * hour-of-day seasonality, rolling beta. */
class Round10cSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(epochSec: Long) = java.sql.Timestamp.from(
    java.time.Instant.ofEpochSecond(epochSec))

  private def nearestOf(lefts: Seq[Long], rights: Seq[(Long, Double)])
      : Map[Long, (Option[Double], Option[Long])] = {
    val l = lefts.map(t => ("K", ts(t), t)).toDF("k", "t", "id")
    val r = rights.map { case (t, v) => ("K", ts(t), v) }
      .toDF("k", "t", "v")
    NearestJoin.nearest(l, r, "k", "t", "t", "v", "nv", "d")
      .collect().map(row => row.getAs[Long]("id") ->
        ((Option(row.getAs[java.lang.Double]("nv")).map(_.doubleValue),
          Option(row.getAs[java.lang.Long]("d")).map(_.longValue))))
      .toMap
  }

  test("nearest join picks the closer side, ties backward") {
    val got = nearestOf(Seq(10L, 20L, 35L, 15L),
      Seq((8L, 1.0), (22L, 2.0), (30L, 3.0)))
    assert(got(10L) == ((Some(1.0), Some(2000000L))))  // 8 at d2 vs 22 at d12
    assert(got(20L) == ((Some(2.0), Some(2000000L))))  // 22 at d2
    assert(got(35L) == ((Some(3.0), Some(5000000L))))  // only backward
    assert(got(15L) == ((Some(1.0), Some(7000000L))))  // 8/22 tie -> backward
  }

  test("nearest join: exact-timestamp match has zero delta") {
    val got = nearestOf(Seq(22L), Seq((8L, 1.0), (22L, 2.0)))
    assert(got(22L) == ((Some(2.0), Some(0L))))
  }

  test("nearest join carries across day buckets in both directions") {
    val day = 86400L
    // rights on day 0 and day 5; lefts on days 1 and 4 have no
    // same-day right rows at all
    val got = nearestOf(Seq(day + 100L, 4 * day + 100L),
      Seq((10L, 1.0), (5 * day + 10L, 5.0)))
    assert(got(day + 100L)._1 == Some(1.0))      // day-0 carry-forward
    assert(got(4 * day + 100L)._1 == Some(5.0))  // day-5 carry-back
  }

  test("nearest join: keys with no right rows yield nulls") {
    val l = Seq(("A", ts(10), 1L), ("B", ts(10), 2L))
      .toDF("k", "t", "id")
    val r = Seq(("A", ts(12), 7.0)).toDF("k", "t", "v")
    val got = NearestJoin.nearest(l, r, "k", "t", "t", "v", "nv", "d")
      .collect().map(row => row.getAs[Long]("id") ->
        Option(row.getAs[java.lang.Double]("nv"))).toMap
    assert(got(1L) == Some(7.0))
    assert(got(2L).isEmpty)
  }

  test("nearest join dedups right rows per microsecond with max value") {
    val got = nearestOf(Seq(10L), Seq((10L, 1.0), (10L, 9.0)))
    assert(got(10L) == ((Some(9.0), Some(0L))))
  }

  // ---- Zipf fit ----

  test("zipf fit recovers the OLS of a planted frequency curve") {
    // counts 24/r at ranks 1..4 — an exact power law (alpha = 1)
    val words = Seq.fill(24)("a") ++ Seq.fill(12)("b") ++
      Seq.fill(8)("c") ++ Seq.fill(6)("d")
    val df = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val r = TextAnalysis.zipfFit(df, topK = 500).head()
    assert(r.getAs[Long]("n_vocab") == 4L)
    assert(r.getAs[Long]("n_fit") == 4L)
    // reference OLS on the same 6-dp-quantized points
    def q(x: Double) = math.rint(x * 1e6) / 1e6
    val xs = (1 to 4).map(i => q(math.log(i)))
    val ys = Seq(24, 12, 8, 6).map(c => q(math.log(c)))
    val n = 4.0
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(r.getAs[Double]("alpha") - (-slope)) < 1e-4)
    assert(math.abs(r.getAs[Double]("alpha") - 1.0) < 1e-4)
    assert(r.getAs[Double]("r2") > 0.999999) // exact power law
  }

  // ---- hour profile ----

  test("hour profile: shares sum to 1 and peak is the busiest hour") {
    val df = Seq(
      ("BTC", ts(3600L + 5), "i1", 1.0),
      ("BTC", ts(3600L + 9), "i1", 2.0),
      ("BTC", ts(5 * 3600L), "i2", 3.0))
      .toDF("underlying", "timestamp", "instrument_name", "amount")
    val got = Seasonality.hourProfile(df).collect()
      .map(r => r.getAs[Int]("hour") -> r).toMap
    assert(got(1).getAs[Long]("n_trades") == 2L)
    assert(got(1).getAs[Boolean]("is_peak"))
    assert(!got(5).getAs[Boolean]("is_peak"))
    assert(math.abs(got(1).getAs[Double]("volume_share") - 0.5) < 1e-12)
    assert(math.abs(got(5).getAs[Double]("volume_share") - 0.5) < 1e-12)
  }

  // ---- Heaps fit ----

  test("heaps fit recovers a planted linear vocabulary growth") {
    // doc i = "w<i> w<i>": V(n) = n/2 exactly -> beta 1, lnK = -ln 2
    val df = (1 to 20).map(i => (i.toLong, s"w$i w$i"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.heapsFit(df, nBuckets = 10).head()
    assert(r.getAs[Long]("n_points") == 10L)
    assert(r.getAs[Long]("n_tokens") == 40L)
    assert(r.getAs[Long]("n_vocab") == 20L)
    assert(math.abs(r.getAs[Double]("heaps_beta") - 1.0) < 1e-3)
    assert(math.abs(r.getAs[Double]("ln_k") + math.log(2.0)) < 1e-2)
    assert(r.getAs[Double]("r2") > 0.999999)
  }

  test("heaps fit: saturated vocabulary gives beta ~0 and null r2") {
    val df = (1 to 20).map(i => (i.toLong, "same words every time"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.heapsFit(df, nBuckets = 10).head()
    assert(math.abs(r.getAs[Double]("heaps_beta")) < 1e-6)
    assert(r.get(r.fieldIndex("r2")) == null) // zero variance -> undefined
  }

  // ---- daily anomalies ----

  test("daily anomalies z-score against the trailing week") {
    import graft.operators.EventsAnalytics
    // days 0..6 alternate 9/11 events, day 7 has 30
    def rows(day: Int, n: Int) = (1 to n).map(i =>
      ((day * 100 + i).toLong, day.toLong * 10 + i,
        ts(day * 86400L + i), "view", 1.0))
    val perDay = Seq(9, 11, 9, 11, 9, 11, 9)
    val df = (perDay.zipWithIndex.flatMap { case (n, d) => rows(d, n) } ++
      rows(7, 30))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = EventsAnalytics.dailyAnomalies(df)
      .collect().map(r => r.getAs[Long]("day") -> r).toMap
    assert(got.keySet == Set(7L)) // only day 7 has a full trailing week
    val r = got(7L)
    val mean = perDay.sum / 7.0
    assert(math.abs(r.getAs[Double]("mean7") - mean) < 1e-12)
    assert(r.getAs[Boolean]("is_anomaly"))
    assert(r.getAs[Double]("z") > 2.0)
  }

  test("daily anomalies: zero-variance baseline gives null z, no flag") {
    import graft.operators.EventsAnalytics
    val df = (0 to 7).flatMap(d => Seq(
      (d.toLong * 2, 1L, ts(d * 86400L), "view", 1.0),
      (d.toLong * 2 + 1, 2L, ts(d * 86400L + 9), "view", 1.0)))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val r = EventsAnalytics.dailyAnomalies(df).head()
    assert(r.get(r.fieldIndex("z")) == null)
    assert(!r.getAs[Boolean]("is_anomaly"))
  }

  // ---- attribution ----

  test("attribution credits first and last preceding touch") {
    import graft.operators.EventsAnalytics
    val df = Seq(
      // user 1: view, click, purchase(10), purchase(5)
      (1L, 1L, ts(10), "view", 0.0),
      (2L, 1L, ts(20), "click", 0.0),
      (3L, 1L, ts(30), "purchase", 10.0),
      (4L, 1L, ts(40), "purchase", 5.0),
      // user 2: purchase with no preceding touch
      (5L, 2L, ts(50), "purchase", 3.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = EventsAnalytics.touchAttribution(df).collect()
      .map(r => (Option(r.getAs[String]("first_touch")),
        Option(r.getAs[String]("last_touch"))) -> r).toMap
    val vc = got((Some("view"), Some("click")))
    assert(vc.getAs[Long]("n_conversions") == 2L)
    assert(vc.getAs[Double]("revenue") == 15.0)
    val none = got((None, None))
    assert(none.getAs[Long]("n_conversions") == 1L)
    assert(none.getAs[Double]("revenue") == 3.0)
  }

  // ---- volume profile ----

  test("volume profile bins prices and marks the POC") {
    import graft.operators.Liquidity
    val df = Seq(
      ("BTC", 0.5, 1.0), ("BTC", 0.9, 2.0),  // bin 0, vol 3
      ("BTC", 1.5, 2.0),                      // bin 1, vol 2
      ("BTC", 2.5, 3.0))                      // bin 2, vol 3 (tie -> 0)
      .map { case (u, p, a) => (u, p, a, ts(60L)) }
      .toDF("underlying", "price", "amount", "timestamp")
    val got = Liquidity.volumeProfile(df).collect()
      .map(r => r.getAs[Long]("bin") -> r).toMap
    assert(got(0L).getAs[Boolean]("is_poc"))   // tie at vol 3 -> lowest bin
    assert(!got(2L).getAs[Boolean]("is_poc"))
    assert(math.abs(got(1L).getAs[Double]("volume_share") - 0.25) < 1e-12)
  }

  // ---- CUSUM ----

  test("cusum accumulates a planted level shift exactly") {
    import graft.operators.EventsAnalytics
    // 10 days at 100 events, 10 days at 130: mu = 115, sigma = 15;
    // z = -/+15 exactly, so the cusum paths are exact decimals
    def rows(day: Int, n: Int) = (1 to n).map(i =>
      ((day * 1000 + i).toLong, i.toLong, ts(day * 86400L + i), "view", 1.0))
    val df = ((0 until 10).flatMap(rows(_, 100)) ++
      (10 until 20).flatMap(rows(_, 130)))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = EventsAnalytics.cusumDays(df)
      .collect().map(r => r.getAs[Long]("day") -> r).toMap
    assert(got(9L).getAs[Double]("cusum_down") == 150.0)  // 10 x 15
    assert(got(9L).getAs[Boolean]("is_shift"))            // 150 > 5*15
    assert(got(19L).getAs[Double]("cusum_up") == 150.0)
    assert(got(19L).getAs[Boolean]("is_shift"))
    assert(got(10L).getAs[Double]("cusum_up") == 15.0)    // first high day
    assert(got(10L).getAs[Double]("cusum_down") == 135.0) // down path decays
    assert(got(0L).getAs[Double]("cusum_up") == 0.0)
    assert(!got(0L).getAs[Boolean]("is_shift"))
  }

  // ---- Kyle lambda ----

  test("kyle lambda recovers a planted linear price impact") {
    import graft.operators.OrderFlow
    // four 15-min bars in one day: flow f, price move exactly 0.5 f
    val rows = (0 until 4).flatMap { k =>
      val f = 2.0 * (k + 1)
      Seq(
        (s"o$k", "BTC", ts(k * 900L), 100.0, f, "buy"),
        (s"c$k", "BTC", ts(k * 900L + 10), 100.0 + 0.5 * f, 0.0, "sell"))
    }
    val df = rows.toDF("trade_id", "underlying", "timestamp", "price",
      "amount", "direction")
    val r = OrderFlow.kyleLambda(df).head()
    assert(r.getAs[Long]("n_bars") == 4L)
    assert(math.abs(r.getAs[Double]("kyle_lambda") - 0.5) < 1e-9)
    assert(r.getAs[Double]("r2") > 1.0 - 1e-9)
  }

  // ---- winnowing ----

  test("winnow: exact fingerprint count on a minimal doc") {
    import graft.operators.TextDedup
    // 6 words -> 4 3-gram shingles -> exactly one length-4 window
    val df = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val r = TextDedup.winnow(df, k = 3, window = 4).head()
    assert(r.getAs[Long]("n_grams") == 4L)
    assert(r.getAs[Long]("n_fingerprints") == 1L)
    assert(r.getAs[Double]("density") == 1.0)
  }

  test("winnow: identical docs share the full fingerprint profile; short docs drop") {
    import graft.operators.TextDedup
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val df = Seq((1L, text), (2L, text), (3L, "too short"))
      .toDF("doc_id", "text")
    val got = TextDedup.winnow(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(!got.contains(3L))
    assert(got(1L).getAs[Long]("n_fingerprints") ==
      got(2L).getAs[Long]("n_fingerprints"))
    assert(got(1L).getAs[Long]("min_fp") == got(2L).getAs[Long]("min_fp"))
    // winnowing selects at most one fingerprint per window position
    val r = got(1L)
    assert(r.getAs[Long]("n_fingerprints") <= r.getAs[Long]("n_grams") - 3)
  }

  // ---- Amihud ----

  test("amihud matches the hand-computed single-bar ratio") {
    import graft.operators.OrderFlow
    val df = Seq(
      ("t0", "BTC", ts(0L), 100.0, 1.0, "buy"),
      ("t1", "BTC", ts(10L), 110.0, 1.0, "sell"))
      .toDF("trade_id", "underlying", "timestamp", "price", "amount",
        "direction")
    val r = OrderFlow.amihudIlliq(df).head()
    assert(r.getAs[Long]("n_bars") == 1L)
    val expect = math.abs(110.0 / 100.0 - 1.0) / 210.0 * 1e9
    assert(math.abs(r.getAs[Double]("amihud_e9") - expect) < 1e-5)
  }

  // ---- top paths ----

  test("top paths counts 3-step sequences per user order") {
    import graft.operators.EventsAnalytics
    val df = Seq(
      (1L, 1L, ts(10), "view", 0.0), (2L, 1L, ts(20), "click", 0.0),
      (3L, 1L, ts(30), "purchase", 1.0), (4L, 2L, ts(5), "view", 0.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = EventsAnalytics.topPaths(df).collect()
    assert(got.length == 1)
    assert(got.head.getString(0) == "view>click>purchase")
    assert(got.head.getLong(1) == 1L)
  }

  // ---- IV surface grid ----

  test("surface grid fills interior midpoints and extends edges") {
    import graft.operators.SurfaceGrid
    val expiry = java.sql.Date.valueOf("2026-01-06")
    def row(m: Double, iv: Double) =
      ("BTC", expiry, ts(1767225600L), m, iv) // 2026-01-01 -> dte 5
    val df = Seq(row(1.0, 0.2), row(1.2, 0.4))
      .toDF("underlying", "expiry", "timestamp", "moneyness", "iv")
    val got = SurfaceGrid.ivSurface(df).collect()
      .map(r => r.getAs[String]("m_bucket") -> r).toMap
    assert(got.size == 5)
    assert(got("atm").getAs[String]("fill_src") == "obs")
    assert(got("deep_otm_call").getAs[String]("fill_src") == "obs")
    val oc = got("otm_call")
    assert(oc.getAs[String]("fill_src") == "interp")
    assert(math.abs(oc.getAs[Double]("iv_filled") - 0.3) < 1e-12)
    val op = got("otm_put")
    assert(op.getAs[String]("fill_src") == "edge")
    assert(op.getAs[Double]("iv_filled") == 0.2)
    assert(got("deep_otm_put").getAs[Double]("iv_filled") == 0.2)
  }

  // ---- hedged PnL ----

  test("hedged pnl: option leg minus prior-delta hedge leg") {
    import graft.operators.Greeks
    val expiry = java.sql.Date.valueOf("2026-06-26")
    def row(id: String, t: Long, p: Double, s0: Double, d: Double) =
      (id, "I1", "BTC", expiry, ts(t), p, s0, d)
    val df = Seq(
      row("1", 10L, 10.0, 100.0, 0.5),
      row("2", 20L, 12.0, 110.0, 0.6)) // dv=2, hedge=0.5*10=5
      .toDF("trade_id", "instrument_name", "underlying", "expiry",
        "timestamp", "price", "spot_price", "adjusted_delta")
    val r = Greeks.hedgedPnl(df).head()
    assert(r.getAs[Long]("n_steps") == 1L)
    assert(r.getAs[Double]("option_pnl") == 2.0)
    assert(r.getAs[Double]("hedge_pnl") == 5.0)
    assert(r.getAs[Double]("hedged_pnl") == -3.0)
  }

  // ---- rolling beta ----

  test("rolling beta: exact 2x return relation gives beta 2, corr 1") {
    // BTC alternates +1%/+2%, ETH +2%/+4% -> y ~= 2x every day
    var (b, e) = (100.0, 100.0)
    val rows = (0 to 9).flatMap { d =>
      val out = Seq(("BTC", ts(d * 86400L + 60), b),
        ("ETH", ts(d * 86400L + 60), e))
      val (rb, re) = if (d % 2 == 0) (1.01, 1.02) else (1.02, 1.04)
      b *= rb; e *= re
      out
    }
    val got = SpotCorr.rollingBeta(rows.toDF("symbol", "timestamp", "close"))
      .collect()
    assert(got.length == 3) // 9 aligned return days, 7-day windows
    for (r <- got) {
      assert(math.abs(r.getAs[Double]("beta_w") - 2.0) < 1e-4)
      assert(math.abs(r.getAs[Double]("corr_w") - 1.0) < 1e-6)
    }
  }
}
