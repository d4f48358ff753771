package graft

import java.sql.{Date, Timestamp}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators._

/** Unit layer for the alpha-feature operators, mirroring the
  * reference's structural/bounded-range assertions (SURVEY §5.1). */
class FeatureOperatorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)
  private def d(s: String) = Date.valueOf(s)

  /** 4 trades in one 15-min bar (10:00-10:15), two underlyings. */
  private lazy val trades: DataFrame = {
    import spark.implicits._
    Seq(
      // trade_id, underlying, ts, expiry(dte), strike, ot, iv, price, amount, index_price
      ("1", "BTC", "2024-01-10 10:01:00", "2024-01-15", 42000.0, "C", 0.5, 0.01, 5.0, Some(42100.0)),
      ("2", "BTC", "2024-01-10 10:05:00", "2024-01-12", 43000.0, "P", 0.6, 0.02, 8.0, Some(42000.0)),
      ("3", "BTC", "2024-01-10 10:07:00", "2024-03-20", 50000.0, "C", 0.7, 0.03, 2.0, None),
      ("4", "ETH", "2024-01-10 10:09:00", "2024-01-11", 2200.0, "P", 0.9, 0.04, 3.0, Some(2250.0)))
      .map { case (id, u, t, e, k, ot, iv, p, a, ip) =>
        (id, u, ts(t), d(e), k, ot, iv, p, a, ip, s"$u-X-${k.toLong}-$ot",
          "buy")
      }
      .toDF("trade_id", "underlying", "timestamp", "expiry", "strike",
        "option_type", "iv", "price", "amount", "index_price",
        "instrument_name", "direction")
  }

  test("A1 front-month picks the min-DTE row per (bar, underlying)") {
    val fm = ContractSelector.frontMonth(trades, col("trade_id"))
    val byU = fm.collect().map(r =>
      r.getAs[String]("underlying") -> r.getAs[String]("instrument_name"))
      .toMap
    // dte 2 (trade 2) < 5 < 70 for BTC; ETH has only trade 4
    assert(byU == Map("BTC" -> "BTC-X-43000-P", "ETH" -> "ETH-X-2200-P"))
  }

  test("A1 groups per 15-min bar, not globally") {
    import spark.implicits._
    val two = trades.unionAll(
      Seq(("5", "BTC", ts("2024-01-10 10:20:00"), d("2024-01-11"), 41000.0,
        "C", 0.4, 0.02, 1.0, Option(42050.0), "BTC-X-41000-C", "buy"))
        .toDF(trades.columns: _*))
    val fm = ContractSelector.frontMonth(two, col("trade_id"))
    assert(fm.filter(col("underlying") === "BTC").count() == 2) // 2 bars
  }

  test("F6 ATM filter keeps |strike/spot - 1| <= 5% and drops null spot") {
    val fm = ContractSelector.frontMonth(trades, col("trade_id"))
    val atm = ContractSelector.atmFilter(fm)
    // BTC sel: strike 43000 / 42000 = 1.0238 -> kept; ETH: 2200/2250=0.978 kept
    assert(atm.count() == 2)
    // widen nothing: row 3 (null index_price) can never pass
    val all = ContractSelector.atmFilter(trades)
    assert(!all.collect().exists(_.getAs[String]("trade_id") == "3"))
  }

  test("J1 liquidity filter thresholds on daily instrument volume") {
    val liq = ContractSelector.liquidityFilter(
      trades.withColumn("bucket_start",
        ContractSelector.bucketS(col("timestamp"), 900)),
      minVolume = 4.0)
    val kept = liq.collect().map(_.getAs[String]("trade_id")).toSet
    assert(kept == Set("1", "2")) // amounts 5, 8; trades 3 (2.0), 4 (3.0) drop
    assert(liq.collect().forall(_.getAs[Double]("daily_volume") >= 4.0))
  }

  test("A17 spot bars keep the last tick per (symbol, bucket)") {
    import spark.implicits._
    val ticks = Seq(
      ("BTC", ts("2024-01-10 10:01:00"), 42000.0),
      ("BTC", ts("2024-01-10 10:14:59"), 42500.0), // last in bar
      ("BTC", ts("2024-01-10 10:15:00"), 42700.0), // next bar
      ("ETH", ts("2024-01-10 10:10:00"), 2200.0))
      .toDF("symbol", "timestamp", "close")
    val bars = SpotProvider.spotBars(ticks)
    val m = bars.collect()
      .map(r => (r.getAs[String]("symbol"), r.getAs[Long]("ts_bucket")) ->
        r.getAs[Double]("close")).toMap
    val b0 = ts("2024-01-10 10:00:00").getTime / 1000
    assert(m(("BTC", b0)) == 42500.0)
    assert(m(("BTC", b0 + 900)) == 42700.0)
    assert(m(("ETH", b0)) == 2200.0)
  }

  test("J2 enrich: hybrid spot prefers index_price, falls back to bars") {
    import spark.implicits._
    val ticks = Seq(("BTC", ts("2024-01-10 10:01:00"), 40000.0))
      .toDF("symbol", "timestamp", "close")
    val enriched = SpotProvider.enrichWithSpot(
      trades, SpotProvider.spotBars(ticks))
    val rows = enriched.collect()
      .map(r => r.getAs[String]("trade_id") ->
        (Option(r.getAs[java.lang.Double]("spot_price")),
          Option(r.getAs[java.lang.Double]("moneyness")))).toMap
    assert(rows("1")._1.contains(42100.0)) // index_price wins
    assert(rows("3")._1.contains(40000.0)) // fallback to bar close
    assert(rows("4")._1.contains(2250.0))  // no ETH bar, index_price
    assert(math.abs(rows("3")._2.get - 50000.0 / 40000.0) < 1e-12)
  }

  test("P6 moneyness buckets split at 0.90/0.95/1.05/1.10") {
    import spark.implicits._
    val m = Seq(0.85, 0.92, 1.0, 1.07, 1.2).toDF("m")
      .select(SpotProvider.moneynessBucket(col("m")).as("b"))
      .collect().map(_.getString(0)).toSeq
    assert(m == Seq("deep_otm_put", "otm_put", "atm", "otm_call",
      "deep_otm_call"))
  }

  test("A6 PCR = put volume / call volume, null on zero calls") {
    val pcr = Pcr.pcrByTenor(trades).collect()
      .map(r => r.getAs[String]("dte_bucket") ->
        (r.getAs[Double]("put_volume"), r.getAs[Double]("call_volume"),
          Option(r.getAs[java.lang.Double]("pcr")))).toMap
    // bucket 0_7: trades 1(C,5.0,dte5), 2(P,8.0,dte2), 4(P,3.0,dte1)
    assert(pcr("pcr_0_7d")._1 == 11.0 && pcr("pcr_0_7d")._2 == 5.0)
    assert(math.abs(pcr("pcr_0_7d")._3.get - 2.2) < 1e-12)
    // trade 3: dte 70 -> 61_90 bucket, call only -> pcr 0/2 = 0
    assert(pcr("pcr_61_90d")._3.contains(0.0) && pcr("pcr_61_90d")._1 == 0.0)
    // put-only bucket -> zero calls -> null PCR (pandas replace(0, nan))
    import spark.implicits._
    val putOnly = Seq(("9", "BTC", ts("2024-01-10 10:01:00"),
      d("2024-01-30"), 42000.0, "P", 0.5, 0.01, 6.0, Option(42100.0),
      "BTC-X-42000-P", "buy")).toDF(trades.columns: _*)
    val row = Pcr.pcrByTenor(putOnly).collect().head
    assert(row.getAs[String]("dte_bucket") == "pcr_15_30d")
    assert(row.getAs[Double]("put_volume") == 6.0)
    assert(row.isNullAt(row.fieldIndex("pcr")))
  }

  test("A7 term structure keeps only bars with both near and far IV") {
    val out = TermStructure.termStructure(trades).collect()
    assert(out.length == 1) // one bar has near (1,2,4) and far (3)
    val r = out.head
    val near = (0.5 + 0.6 + 0.9) / 3
    assert(math.abs(r.getAs[Double]("near_iv") - near) < 1e-9)
    assert(math.abs(r.getAs[Double]("far_iv") - 0.7) < 1e-9)
    assert(math.abs(r.getAs[Double]("slope") - (near - 0.7)) < 1e-9)
    assert(math.abs(r.getAs[Double]("ratio") - near / 0.7) < 1e-9)
  }

  test("A9 wide smile metrics null-propagate when a wing is missing") {
    import spark.implicits._
    // one bar: atm + otm_put trades only
    val enriched = Seq(
      (ts("2024-01-10 10:01:00"), 1.00, 0.5, 1.0, "C"),
      (ts("2024-01-10 10:02:00"), 0.93, 0.7, 2.0, "P"))
      .toDF("timestamp", "moneyness", "iv", "amount", "option_type")
    val wide = Moneyness.aggregateWide(enriched).collect().head
    assert(wide.getAs[Long]("atm_count") == 1)
    assert(wide.getAs[Double]("otm_put_volume") == 2.0)
    assert(wide.getAs[Double]("otm_call_volume") == 0.0) // sumIf empty -> 0
    assert(wide.isNullAt(wide.fieldIndex("otm_call_iv_mean")))
    assert(wide.isNullAt(wide.fieldIndex("put_call_skew"))) // null - x
    assert(math.abs(wide.getAs[Double]("smile_slope_put")
      - (0.7 - 0.5) / 0.05) < 1e-9)
  }
}
