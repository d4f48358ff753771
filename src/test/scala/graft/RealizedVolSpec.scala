package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

import graft.operators.RealizedVol

/** Hand-computed checks for the realized-variance estimators. */
class RealizedVolSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def trades(rows: (Long, Double)*) = {
    import spark.implicits._
    rows.map { case (t, p) => ("BTC", ts(t), p) }
      .toDF("underlying", "timestamp", "price")
  }

  test("two-bar day: OHLC and every estimator match hand math") {
    val df = trades(
      // bar 1 [0, 900): o=100 h=110 l=90 c=105
      (0L, 100.0), (60L, 110.0), (120L, 90.0), (180L, 105.0),
      // bar 2 [900, 1800): o=105 h=120 l=100 c=110
      (900L, 105.0), (960L, 120.0), (1020L, 100.0), (1080L, 110.0))
    val bars = RealizedVol.priceBars(df).orderBy("bucket_start").collect()
    assert(bars.map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3),
      r.getDouble(4), r.getDouble(5))).toSeq == Seq(
      (0L, 100.0, 110.0, 90.0, 105.0),
      (900L, 105.0, 120.0, 100.0, 110.0)))

    val row = RealizedVol.dailyEstimators(df).head()
    val out = row.getValuesMap[Any](row.schema.fieldNames)
    assert(out("n_bars") == 2L && out("n_returns") == 1L)
    val r = math.log(110.0 / 105.0)
    assert(math.abs(out("rv_cc").asInstanceOf[Double] - r * r) < 1e-6)
    val lhl1 = math.log(110.0 / 90.0); val lhl2 = math.log(120.0 / 100.0)
    val park = (lhl1 * lhl1 + lhl2 * lhl2) / 2 * RealizedVol.ParkinsonCoef
    assert(math.abs(out("parkinson").asInstanceOf[Double] - park) < 1e-5)
    val lco1 = math.log(105.0 / 100.0); val lco2 = math.log(110.0 / 105.0)
    val gk = (0.5 * lhl1 * lhl1 - RealizedVol.GkCoef * lco1 * lco1
      + 0.5 * lhl2 * lhl2 - RealizedVol.GkCoef * lco2 * lco2) / 2
    assert(math.abs(out("garman_klass").asInstanceOf[Double] - gk) < 1e-5)
    def rs(h: Double, l: Double, o: Double, c: Double) =
      math.log(h / c) * math.log(h / o) + math.log(l / c) * math.log(l / o)
    val rsv = (rs(110, 90, 100, 105) + rs(120, 100, 105, 110)) / 2
    assert(math.abs(out("rogers_satchell").asInstanceOf[Double] - rsv) < 1e-5)
    assert(math.abs(out("rv_vol").asInstanceOf[Double]
      - math.sqrt(out("rv_cc").asInstanceOf[Double])) < 1e-12)
  }

  test("single-bar day: rv_cc 0, no returns; zero prices dropped") {
    val row = RealizedVol.dailyEstimators(
      trades((0L, 100.0), (60L, 0.0), (120L, 104.0))).head()
    val out = row.getValuesMap[Any](row.schema.fieldNames)
    assert(out("n_bars") == 1L && out("n_returns") == 0L)
    assert(out("rv_cc") == 0.0 && out("rv_vol") == 0.0)
    // the zero-price tick must not have become the bar low
    val bar = RealizedVol.priceBars(
      trades((0L, 100.0), (60L, 0.0), (120L, 104.0))).head()
    assert(bar.getDouble(4) == 100.0) // low
  }

  test("ewmaSeries matches the recursive EWMA definition") {
    val lambda = 0.94
    // one day, five bars -> four returns
    val prices = Seq(100.0, 104.0, 101.0, 107.0, 103.0)
    val df = trades(prices.zipWithIndex.map {
      case (p, i) => (i * 900L, p) }: _*)
    val rows = graft.operators.RealizedVol.ewmaSeries(df, lambda)
      .orderBy("bar_rn").collect()
    assert(rows.length == 4)
    // reference: truncated-weight normalized EWMA, recursive form
    val rs = prices.sliding(2).map { case Seq(a, b) =>
      val r = math.log(b / a); r * r }.toSeq
    for ((row, t) <- rows.zipWithIndex) {
      val num = (0 to t).map(i => math.pow(lambda, t - i) * rs(i)).sum
      val den = (0 to t).map(i => math.pow(lambda, i.toDouble)).sum
      assert(math.abs(row.getAs[Double]("ewma_var") - num / den) < 1e-4,
        s"bar ${t + 1}")
    }
    // t=1 is exactly r^2 (quantized)
    assert(math.abs(rows(0).getAs[Double]("ewma_var") - rs(0)) < 1e-5)
  }

  test("flowImbalance: conditional sums and the signed ratio") {
    import spark.implicits._
    val df = Seq(
      ("BTC", ts(0L), 3.0, "buy"),
      ("BTC", ts(60L), 1.0, "sell"),
      ("BTC", ts(120L), 2.0, "buy"),
      ("ETH", ts(0L), 4.0, "sell"))
      .toDF("underlying", "timestamp", "amount", "direction")
    val m = graft.operators.OrderFlow.flowImbalance(df).collect()
      .map(r => r.getString(0) -> r).toMap
    val btc = m("BTC")
    assert(btc.getAs[Long]("n_buys") == 2L &&
      btc.getAs[Long]("n_sells") == 1L)
    assert(btc.getAs[Double]("buy_volume") == 5.0)
    assert(btc.getAs[Double]("imbalance") == (5.0 - 1.0) / 6.0)
    assert(m("ETH").getAs[Double]("imbalance") == -1.0)
  }

  test("vwapSeries: running notional/volume ratio resets per day") {
    import spark.implicits._
    val df = Seq(
      ("BTC", ts(0L), 100.0, 2.0),
      ("BTC", ts(900L), 110.0, 1.0),
      ("BTC", ts(86400L), 200.0, 1.0)) // next day: cumulative resets
      .toDF("underlying", "timestamp", "price", "amount")
    val rows = graft.operators.OrderFlow.vwapSeries(df)
      .orderBy("bucket_start")
      .select("bucket_start", "cum_pv", "cum_volume", "vwap")
      .as[(Long, Double, Double, Double)].collect().toSeq
    assert(rows == Seq(
      (0L, 200.0, 2.0, 100.0),
      (900L, 310.0, 3.0, 310.0 / 3.0),
      (86400L, 200.0, 1.0, 200.0)))
  }

  test("sizeQuantiles picks the exact ceil(q*n) element") {
    import spark.implicits._
    // amounts 1..10 for BTC: p50 = 5th = 5.0, p90 = 9th, p99 = 10th
    val df = (1 to 10).map(i => ("BTC", i.toDouble, i.toString))
      .toDF("underlying", "amount", "trade_id")
    val r = graft.operators.OrderFlow.sizeQuantiles(df).head()
    assert(r.getAs[Long]("n_trades") == 10L)
    assert(r.getAs[Double]("p50") == 5.0)
    assert(r.getAs[Double]("p90") == 9.0)
    assert(r.getAs[Double]("p99") == 10.0)
    // single row: every quantile is that row
    val one = graft.operators.OrderFlow.sizeQuantiles(
      Seq(("ETH", 7.0, "1")).toDF("underlying", "amount", "trade_id"))
      .head()
    assert(one.getAs[Double]("p50") == 7.0 &&
      one.getAs[Double]("p99") == 7.0)
  }

  test("returns never cross a day boundary") {
    val df = trades((86400L - 900L, 100.0), (86400L, 200.0))
    val days = RealizedVol.dailyEstimators(df)
      .orderBy("day_start").collect()
    assert(days.length == 2)
    assert(days.forall(_.getAs[Long]("n_returns") == 0L))
    assert(days.forall(_.getAs[Double]("rv_cc") == 0.0))
  }
}
