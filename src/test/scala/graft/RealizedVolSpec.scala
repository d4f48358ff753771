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

  test("returns never cross a day boundary") {
    val df = trades((86400L - 900L, 100.0), (86400L, 200.0))
    val days = RealizedVol.dailyEstimators(df)
      .orderBy("day_start").collect()
    assert(days.length == 2)
    assert(days.forall(_.getAs[Long]("n_returns") == 0L))
    assert(days.forall(_.getAs[Double]("rv_cc") == 0.0))
  }
}
